"""Multi-process distributed run: the shard_map mul+relin pipeline over a
(dp=processes, limb=local_devices) global mesh with jax.distributed
(SURVEY §2 axis 4: cross-host = DCN analog; Gloo collectives on CPU).

Each process hosts `--local` virtual CPU devices forming one 'dp' row;
the CRT-limb axis stays inside a process (ICI analog) and the only
cross-process collective is the additive block-reduce psum over 'dp'
(Regression.h:102-149 semantics — sufficient statistics are additive
across data shards, README:78-84).

Usage (one invocation per process):
  python3 tools/run_distributed.py <process_id> <num_processes>
      [--port 39731] [--local 4] [--batch 8] [--steps 4] [--out FILE]

Writes a JSON artifact from process 0: result checksum + bytes, wall
time, and per-step throughput — compared for bit-equality with a
single-process run by tests/test_distributed.py.
"""
import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("process_id", type=int)
    ap.add_argument("num_processes", type=int)
    ap.add_argument("--port", type=int, default=39731)
    ap.add_argument("--local", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local}").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.num_processes, process_id=args.process_id)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fhe_si_tpu import sampling, scheme
    from fhe_si_tpu.context import FheContext
    from fhe_si_tpu.device import device_context
    from fhe_si_tpu.parallel.shard import ShardedPipelines

    n_limb = args.local
    mesh = Mesh(np.array(jax.devices()).reshape(args.num_processes, n_limb),
                ("dp", "limb"))

    # identical deterministic setup on every process
    ctx = FheContext(m=22, log_q=80, p=23, generator=7,
                     num_primes_multiple=n_limb)
    dev = device_context(ctx)
    src = sampling.RandomSource(7)
    sk, pk = scheme.keygen(ctx, src)
    ksw = scheme.KeySwitch.for_relinearization(sk, src)
    c1 = pk.encrypt(scheme.Plaintext(ctx, src.uniform_mod_p(ctx.phim, ctx.p)), src)
    c2 = pk.encrypt(scheme.Plaintext(ctx, src.uniform_mod_p(ctx.phim, ctx.p)), src)
    B = args.batch
    a_host = np.broadcast_to(np.asarray(c1.parts)[None],
                             (B,) + c1.parts.shape).copy()
    b_host = np.broadcast_to(np.asarray(c2.parts)[None],
                             (B,) + c2.parts.shape).copy()
    # make the batch rows distinct (roll along phim) so the reduce is
    # a real merge, not B copies of one product
    for i in range(B):
        a_host[i] = np.roll(a_host[i], i, axis=-2)

    def put(host, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(host.shape, sh,
                                            lambda idx: host[idx])

    pipe = ShardedPipelines(dev, mesh)
    # distribute the table pytree per its specs (each process holds the
    # full host copy; make_array_from_callback slices its shards)
    C_global = jax.tree.map(
        lambda t, s: put(np.asarray(t), s), pipe.C, pipe.Cspec)
    pipe.C = C_global

    a = put(a_host, P("dp"))
    b = put(b_host, P("dp"))
    matrix = put(np.asarray(ksw.matrix_evals), P(None, None, "limb", None))

    step = pipe.mul_relin_block_reduce()
    out = step(a, b, matrix)          # replicated [2, phim, n_ct]
    out.block_until_ready()

    # throughput: repeated batched calls, best of 3 after warmup
    batched = pipe.batched_mul_relin()
    t0 = time.perf_counter()
    r = batched(a, b, matrix)
    jax.block_until_ready(r)
    dt_first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = batched(a, b, matrix)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)

    out_np = np.asarray(jax.device_get(out))
    digest = hashlib.sha256(out_np.tobytes()).hexdigest()
    rate = B / best
    print(f"proc {args.process_id}/{args.num_processes}: devices "
          f"{jax.device_count()} global ({jax.local_device_count()} local), "
          f"reduce sha256 {digest[:16]}, {rate:.1f} mults/s", flush=True)

    if args.process_id == 0 and args.out:
        with open(args.out, "w") as f:
            json.dump(dict(
                num_processes=args.num_processes,
                local_devices=n_limb,
                global_devices=int(jax.device_count()),
                batch=B,
                sha256=digest,
                reduce_result=out_np.tolist(),
                mults_per_s=rate,
                first_call_s=dt_first,
            ), f)


if __name__ == "__main__":
    main()
