"""CLI mirror of Test_Statistics_x (Test_Statistics.cpp:178-244).

usage: python -m fhe_si_tpu.cli.test_statistics datafile p generator [seed]
           [--trace DIR] [--m=M]

--m=M overrides the ring index (default m = p-1, the reference's only
mode, Test_Statistics.cpp); any m with slots
(m | p-1 or extension slots) works, e.g. a power-of-two or 2^a*q^b ring
riding the Cooley-Tukey scaling family.
"""
import contextlib
import sys
import time

from .. import sampling
from ..apps import statistics as st
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
        print("usage: test_statistics datafile p generator [seed] [--trace DIR]")
        return 1
    datafile, p, g = argv[1], int(argv[2]), int(argv[3])
    seed = int(argv[4]) if len(argv) > 4 else int(time.time())

    data, dim = st.load_data(datafile)
    n_rows = data.num_rows()
    log_q, xi = st.derive_log_q(n_rows, dim, p)

    print("=" * 48)
    print("Running statistics test using Brakerski system.")
    print("=" * 48)
    print(f"Parameters:\n  data file: {datafile}\n  logQ: {log_q}\n  p: {p}"
          f"\n  generator: {g}")

    mean_pt = st.compute_nth_moment_pt(data, 1)
    cov_pt = st.compute_covariance_pt(data)
    print("Expected values:")
    print("  Mean:", ", ".join(str(v % p) for v in mean_pt))
    print(f"  N: {n_rows % p}")
    print("  Covariance:")
    for i in range(cov_pt.num_rows()):
        print("   ", " ".join(str(cov_pt.at(i, j) % p)
                              for j in range(cov_pt.num_cols())))
    print(f"  N^2: {(n_rows % p) ** 2 % p}\n")

    prof = PhaseProfiler()
    with prof.phase("setup"):
        ctx = FheContext(m=m_override if m_override else p - 1,
                         log_q=log_q, p=p, generator=g, xi=xi)
        source = sampling.RandomSource(seed)
        stats = st.Statistics(ctx, source)
        # compile every batched pipeline shape in the background while
        # the host batches/embeds data (the remote compiler is idle
        # otherwise; cold per-shape compiles used to land serially in
        # the computation/decryption phases)
        n_blocks = (n_rows + ctx.usable_slots - 1) // ctx.usable_slots
        stats.prewarm_async(dim, n_blocks)
    print(f"Setup time: {prof.times['setup']:.2f}")

    with prof.phase("batch"):
        blocks, block_sizes = st.batch_data(ctx, data)
    print(f"Batch time: {prof.times['batch']:.2f}")

    with prof.phase("encryption"):
        stats.add_data(blocks, block_sizes)
    print(f"Encryption time: {prof.times['encryption']:.2f}")

    tr = device_trace(trace_dir) if trace_dir else contextlib.nullcontext()
    with prof.phase("computation"), tr:
        cov_enc, mu_enc, n_enc, n2_enc = stats.compute_covariance()
    print(f"Computation time: {prof.times['computation']:.2f}")

    sk = stats.secret_key
    prof_dec = prof.phase("decryption")
    prof_dec.__enter__()
    ok = True
    print("\nComputed values:")
    # one fused device dispatch for every decryption (scheme.decrypt_batch)
    d = cov_enc.num_rows()
    cts = list(mu_enc) + [n_enc] + [cov_enc.at(i, j)
                                    for i in range(d) for j in range(d)]
    cts.append(n2_enc)
    pts = sk.decrypt_batch(cts)
    vals = [int(pt.decode_slots()[0]) for pt in pts]
    mean_got, rest = vals[:len(mu_enc)], vals[len(mu_enc):]
    n_got, cov_got, n2_got = rest[0], rest[1:1 + d * d], rest[-1]
    print("  Mean:", ", ".join(map(str, mean_got)))
    ok &= mean_got == [v % p for v in mean_pt]
    print(f"  N: {n_got}")
    ok &= n_got == n_rows % p
    print("  Covariance:")
    for i in range(d):
        row = cov_got[i * d:(i + 1) * d]
        for j in range(d):
            ok &= row[j] == cov_pt.at(i, j) % p
        print("   ", " ".join(map(str, row)))
    print(f"  N^2: {n2_got}")
    ok &= n2_got == (n_rows % p) ** 2 % p
    prof_dec.__exit__(None, None, None)
    print(f"Decryption time: {prof.times['decryption']:.2f}")
    print(f"Total time: {prof.total():.2f}")
    print(f"[phases] {prof.as_json()}", file=sys.stderr)
    print("MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
