"""Two-process jax.distributed run (SURVEY §2 axis 4): the shard_map
mul+relin + additive block reduce over a (dp=2, limb=4) global mesh,
with the 'dp' psum crossing PROCESS boundaries (Gloo — the DCN-path
analog), must be bit-identical to the single-process run."""
import json
import os
import socket
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tools", "run_distributed.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env() -> dict:
    env = dict(os.environ)
    # workers set their own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


def _run(num_processes: int, out: str, local: int, timeout: int = 600):
    port = _free_port()
    procs = []
    for pid in range(num_processes):
        cmd = [sys.executable, WORKER, str(pid), str(num_processes),
               "--port", str(port), "--local", str(local), "--batch", "8"]
        if pid == 0:
            cmd += ["--out", out]
        procs.append(subprocess.Popen(cmd, env=_clean_env(),
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    for pr in procs:
        stdout, _ = pr.communicate(timeout=timeout)
        assert pr.returncode == 0, stdout.decode()[-2000:]


def test_two_process_matches_single(tmp_path):
    one = str(tmp_path / "one.json")
    two = str(tmp_path / "two.json")
    _run(1, one, local=8)          # single process, same 8 global devices
    _run(2, two, local=4)          # two processes x 4 devices
    with open(one) as f:
        r1 = json.load(f)
    with open(two) as f:
        r2 = json.load(f)
    assert r1["global_devices"] == r2["global_devices"] == 8
    assert r2["num_processes"] == 2
    assert r1["sha256"] == r2["sha256"], \
        "cross-process block reduce differs from single-process"
    assert np.array_equal(np.asarray(r1["reduce_result"]),
                          np.asarray(r2["reduce_result"]))
    eff = r2["mults_per_s"] / max(r1["mults_per_s"], 1e-9)
    print(f"2-process/1-process throughput ratio {eff:.2f} "
          f"({r2['mults_per_s']:.0f} vs {r1['mults_per_s']:.0f} mults/s; "
          "both share 2 physical CPU cores — a wall-clock sanity number, "
          "not an ICI/DCN scaling claim)")
