"""CLI mirror of Test_Regression_x (Test_Regression.cpp:69-131).

usage: python -m fhe_si_tpu.cli.test_regression datafile p generator [seed]
           [--trace DIR] [--m=M]

--m=M overrides the ring index (default m = p-1, the reference's only
mode, Test_Regression.cpp); any m with slots
(m | p-1 or extension slots) works, e.g. a power-of-two or 2^a*q^b ring
riding the Cooley-Tukey scaling family.

--trace DIR captures an XLA/TPU profiler timeline of the regression
phase (view with xprof/TensorBoard).
"""
import contextlib
import sys
import time

from .. import sampling
from ..apps import regression as reg
from ..context import FheContext
from ..profiling import PhaseProfiler, device_trace


def main(argv):
    argv = list(argv)
    trace_dir = None
    if "--trace" in argv:
        i = argv.index("--trace")
        trace_dir = argv[i + 1]
        del argv[i:i + 2]
    m_override = None
    for a in list(argv):
        if a.startswith("--m="):
            m_override = int(a.split("=", 1)[1])
            argv.remove(a)
    if len(argv) < 4:
        print("usage: test_regression datafile p generator [seed] [--trace DIR]")
        return 1
    datafile, p, g = argv[1], int(argv[2]), int(argv[3])
    seed = int(argv[4]) if len(argv) > 4 else int(time.time())

    raw, labels, dim = reg.load_data(datafile)
    log_q, xi = reg.derive_log_q(len(labels), dim, p)

    print("=" * 48)
    print("Running regression tests using Brakerski system.")
    print("=" * 48)
    print(f"Parameters:\n  data file: {datafile}\n  logQ: {log_q}\n  p: {p}"
          f"\n  generator: {g}")

    theta_pt, det_pt = reg.regress_pt(raw, labels)
    print("Expected values:")
    for i, t in enumerate(theta_pt):
        print(f"  theta[{i}] = {t % p}")
    print(f"  Determinant: {det_pt % p}\n")

    # structured phase timing, reference phase names (SURVEY §5 row 1)
    prof = PhaseProfiler()
    with prof.phase("setup"):
        ctx = FheContext(m=m_override if m_override else p - 1,
                         log_q=log_q, p=p, generator=g, xi=xi)
        source = sampling.RandomSource(seed)
        model = reg.Regression(ctx, source)
        # overlap pipeline compiles with the host-bound batch/embed work
        n_blocks = (raw.num_rows() + ctx.usable_slots - 1) // ctx.usable_slots
        model.prewarm_async(dim, n_blocks)
    print(f"Setup time: {prof.times['setup']:.2f}")

    with prof.phase("batch"):
        ptxt_data, ptxt_labels = reg.batch_data(ctx, raw, labels)
    print(f"Batch time: {prof.times['batch']:.2f}")

    with prof.phase("encryption"):
        model.add_data(ptxt_data, ptxt_labels)
    print(f"Encryption time: {prof.times['encryption']:.2f}")

    tr = device_trace(trace_dir) if trace_dir else contextlib.nullcontext()
    with prof.phase("regression"), tr:
        theta_enc, det_enc = model.regress()
    print(f"Regression time: {prof.times['regression']:.2f}")

    with prof.phase("decryption"):
        print("\nComputed values:")
        ok = True
        # one fused device dispatch for every decryption
        pts = model.secret_key.decrypt_batch(list(theta_enc) + [det_enc])
        for i, pt in enumerate(pts[:-1]):
            got = int(pt.decode_slots()[0])
            print(f"  theta[{i}] = {got}")
            ok &= got == theta_pt[i] % p
        det_got = int(pts[-1].decode_slots()[0])
        print(f"  Determinant: {det_got}\n")
        ok &= det_got == det_pt % p
    print(f"Decryption time: {prof.times['decryption']:.2f}")
    print(f"Total time: {prof.total():.2f}")
    print(f"[phases] {prof.as_json()}", file=sys.stderr)
    print("MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
