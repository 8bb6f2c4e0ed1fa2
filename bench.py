"""Benchmark: aligned chain-pairs/sec on the q100 all-vs-all sensitive
search (full pipeline: DSS encode + self-rev + Mu filter + SW + LDDT/TS),
single chip.

Baseline: the reference C++ binary (AVX2, 1 thread) on this host completes
the same search (reseek -search q100.bca -sensitive -threads 1) in 4.59 s
= 1100 pairs/s (measured 2026-08-17 on the round-1 runner; 5050 pairs).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_PAIRS_PER_SEC = 1100.0  # reference binary, 1 thread, this host
Q100 = "/root/reference/test_data/q100.bca"


def run_once(chains, params):
    """Full search through the production driver (device engine + host MKF
    for long chains), writing rows like the CLI."""
    import io
    from reseek_tpu.align.output import parse_columns
    from reseek_tpu.search.driver import SearchOptions, self_search
    opts = SearchOptions(
        columns=parse_columns("query+target+qlo+qhi+tlo+thi+evalue+cigar"),
        max_evalue=10.0, mode="sensitive")
    buf = io.StringIO()
    drv = self_search(chains, params, opts, buf, engine="device")
    return buf.getvalue().splitlines()


def main():
    from reseek_tpu.search.engine import configure_jax
    configure_jax()
    from reseek_tpu.constants import DSSParams
    from reseek_tpu.io.bca import read_bca

    params = DSSParams.create("sensitive")
    chains = read_bca(Q100)
    n = len(chains)
    n_pairs = n * (n + 1) // 2

    # warmup pass: triggers compilation (cached in-process) + encoder JIT
    t_warm = time.time()
    hits_warm = run_once(chains, params)
    warm_s = time.time() - t_warm

    # measured passes: full pipeline including encode; median of 3 (the
    # shared TPU link's latency fluctuates run to run)
    times = []
    for _ in range(3):
        t0 = time.time()
        hits = run_once(chains, params)
        times.append(time.time() - t0)
    dt = sorted(times)[1]

    pairs_per_sec = n_pairs / dt
    result = {
        "metric": "aligned_pairs_per_sec_q100_sensitive",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / REF_PAIRS_PER_SEC, 3),
    }
    print(json.dumps(result))
    print(f"# warmup {warm_s:.1f}s, measured {dt:.2f}s "
          f"(runs {['%.2f' % t for t in times]}), "
          f"hits {len(hits)} (warm {len(hits_warm)})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
