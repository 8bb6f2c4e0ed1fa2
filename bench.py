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


def run_once(ecs, params):
    from reseek_tpu.search.engine import (BatchedEngine, DeviceDB,
                                          batched_self_search)
    db = DeviceDB(ecs, params, with_rev_profiles=True)
    eng = BatchedEngine(db)
    srs = eng.self_rev_scores()
    for ec, s in zip(ecs, srs):
        ec.self_rev_score = float(s)
    return batched_self_search(ecs, params, db=db)


def main():
    from reseek_tpu.search.engine import configure_jax
    configure_jax()
    from reseek_tpu.align.pipeline import encode_for_search
    from reseek_tpu.constants import DSSParams
    from reseek_tpu.io.bca import read_bca

    params = DSSParams.create("sensitive")
    chains = read_bca(Q100)
    n = len(chains)
    n_pairs = n * (n + 1) // 2

    # warmup pass: triggers compilation (cached persistently) + encoder JIT
    t_warm = time.time()
    ecs = [encode_for_search(c, params, with_self_rev=False) for c in chains]
    hits_warm = run_once(ecs, params)
    warm_s = time.time() - t_warm

    # measured pass: full pipeline including encode
    t0 = time.time()
    ecs = [encode_for_search(c, params, with_self_rev=False) for c in chains]
    hits = run_once(ecs, params)
    dt = time.time() - t0

    pairs_per_sec = n_pairs / dt
    result = {
        "metric": "aligned_pairs_per_sec_q100_sensitive",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / REF_PAIRS_PER_SEC, 3),
    }
    print(json.dumps(result))
    print(f"# warmup {warm_s:.1f}s, measured {dt:.1f}s, "
          f"hits {len(hits)} (warm {len(hits_warm)})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
