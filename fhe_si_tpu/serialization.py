"""Serialization of contexts, keys, and ciphertexts (checkpoint/resume).

Replaces the reference's hand-rolled little-endian binary streams
(Serialization.h:11-81, Serialization.cpp:3-119; FHEContext.cpp:45-81)
with flat-array npz archives — the TPU-native durable state is exactly
the device arrays.  Reference behaviors preserved:
  - contexts persist the prime chain AND the per-prime roots, so the
    NTT transforms rebuild identically on import (FHEContext.cpp:62-81);
  - ciphertexts are forced through ScaleDown before export
    (Serialization.cpp:109-114): only non-tensored limb parts are stored.
"""
from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from .context import FheContext
from .scheme import Ciphertext, FhePublicKey, FheSecretKey, KeySwitch


def export_context(ctx: FheContext, path: str):
    params = dict(m=ctx.m, log_q=ctx.log_q, p=ctx.p, generator=ctx.generator,
                  decomp_size=ctx.decomp_size, xi=ctx.xi, stdev=ctx.stdev)
    np.savez(path, params=json.dumps(params),
             primes=np.asarray(ctx.primes), roots=np.asarray(ctx.roots))


def import_context(path: str) -> FheContext:
    z = np.load(path, allow_pickle=False)
    params = json.loads(str(z['params']))
    return FheContext(primes=[int(q) for q in z['primes']],
                      roots=[int(r) for r in z['roots']], **params)


def export_secret_key(sk: FheSecretKey, path: str):
    np.savez(path, sk_evals=np.asarray(sk.sk_evals))


def import_secret_key(ctx: FheContext, path: str) -> FheSecretKey:
    z = np.load(path)
    return FheSecretKey(ctx, jnp.asarray(z['sk_evals']))


def export_public_key(pk: FhePublicKey, path: str):
    np.savez(path, pk_evals=np.asarray(pk.pk_evals),
             pk_limbs=np.asarray(pk.pk_limbs))


def import_public_key(ctx: FheContext, path: str) -> FhePublicKey:
    z = np.load(path)
    return FhePublicKey(ctx, jnp.asarray(z['pk_evals']),
                        jnp.asarray(z['pk_limbs']))


def export_keyswitch(ksw: KeySwitch, path: str):
    np.savez(path, matrix_evals=np.asarray(ksw.matrix_evals))


def import_keyswitch(ctx: FheContext, path: str) -> KeySwitch:
    z = np.load(path)
    return KeySwitch(ctx, jnp.asarray(z['matrix_evals']))


def export_ciphertext(ct: Ciphertext, path: str):
    ct = ct.relinearized_view()  # ScaleDown-then-write (Serialization.cpp:109-114)
    np.savez(path, parts=np.asarray(ct.parts))


def import_ciphertext(ctx: FheContext, path: str) -> Ciphertext:
    z = np.load(path)
    return Ciphertext(ctx, parts=jnp.asarray(z['parts']))
