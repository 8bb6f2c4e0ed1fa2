"""Benchmark: aligned chain-pairs/sec on the q100 all-vs-all sensitive
search (full pipeline: DSS encode + self-rev + Mu filter + SW + LDDT/TS),
single chip.

Baseline: the reference C++ binary (AVX2, 1 thread) on this host completes
the same search (reseek -search q100.bca -sensitive -threads 1) in 4.59 s
= 1100 pairs/s (measured 2026-08-17 on the round-1 runner; 5050 pairs).
With all cores (-threads 2 on this 2-core host) the reference takes
1.76 s = ~2870 pairs/s (measured 2026-08-21); the per-chip vs per-core
framing is discussed in PROFILE.md.

Dedup hardening: this runtime dedups identical (computation, args)
dispatches server-side (PROFILE.md), so a naive loop over bit-identical
passes can be served from cache.  Every pass here appends one DECOY chain
whose coordinates are re-jittered per pass.  All chains live in single
packed device arrays (mu_db / prof_db / coords_db), so changing the decoy
changes the argument buffers of EVERY device dispatch in the pass — no
dispatch can be dedup-served — while real-pair results stay bit-identical
(pairs are scored independently).  Decoy rows are filtered by label and
the surviving row set is asserted equal across all passes.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_PAIRS_PER_SEC = 1100.0  # reference binary, 1 thread, this host
Q100 = "/root/reference/test_data/q100.bca"
DECOY_LABEL = "__bench_decoy__"


def make_decoy(chains, seed):
    """Jittered copy of the shortest chain: same length every pass (stable
    compiled shapes), different coordinates every pass (different encoded
    letters -> different device argument buffers everywhere)."""
    import numpy as np
    from reseek_tpu.chain import Chain
    src = min(chains, key=lambda c: len(c.seq))
    rng = np.random.default_rng(1000 + seed)
    coords = src.coords + rng.normal(0.0, 0.8, src.coords.shape)
    return Chain(DECOY_LABEL, src.seq, coords.astype(np.float32))


def run_once(chains, params, seed):
    """Full search through the production driver (device engine + host MKF
    for long chains), writing rows like the CLI.  Returns the row set with
    decoy rows removed."""
    import io
    from reseek_tpu.align.output import parse_columns
    from reseek_tpu.search.driver import SearchOptions, self_search
    opts = SearchOptions(
        columns=parse_columns("query+target+qlo+qhi+tlo+thi+evalue+cigar"),
        max_evalue=10.0, mode="sensitive")
    buf = io.StringIO()
    self_search(chains + [make_decoy(chains, seed)], params, opts, buf,
                engine="device")
    rows = [r for r in buf.getvalue().splitlines()
            if DECOY_LABEL not in r.split("\t", 2)[:2]]
    return frozenset(rows), len(rows)


def main():
    from reseek_tpu.search.engine import configure_jax
    configure_jax()
    from reseek_tpu.constants import DSSParams
    from reseek_tpu.io.bca import read_bca

    params = DSSParams.create("sensitive")
    chains = read_bca(Q100)
    n = len(chains) + 1  # + decoy (its pairs are real work, so counted)
    n_pairs = n * (n + 1) // 2

    # warmup pass: triggers compilation (cached in-process) + encoder JIT
    t_warm = time.time()
    hits_warm, n_warm = run_once(chains, params, seed=0)
    warm_s = time.time() - t_warm

    # measured passes: full pipeline including encode; median of 3 (the
    # shared TPU link's latency fluctuates run to run).  Each pass uses a
    # fresh decoy jitter so no device dispatch repeats warmup's args.
    times = []
    for p in range(3):
        t0 = time.time()
        hits, n_hits = run_once(chains, params, seed=1 + p)
        times.append(time.time() - t0)
        assert hits == hits_warm, (
            "non-decoy hit rows changed between passes: "
            f"{n_hits} vs {n_warm}")
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
          f"hits {n_hits} (warm {n_warm}), inputs varied per pass",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
