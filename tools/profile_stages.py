"""Per-stage wall-time profile of the q100 sensitive self-search
(the bench.py workload) on the attached device.

Runs the pipeline twice (cold, warm) and prints one line per stage.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q100 = os.environ.get("PROFILE_BCA", "/root/reference/test_data/q100.bca")


def run(chains, params, tag):
    import numpy as np
    from reseek_tpu.align.pipeline import encode_for_search, self_rev_score
    from reseek_tpu.search.driver import SearchDriver, SearchOptions
    from reseek_tpu.align.output import parse_columns
    from reseek_tpu.search.engine import DeviceSelfSearch

    t = {}

    def mark(name, t0):
        t[name] = time.time() - t0
        return time.time()

    t0 = time.time()
    ecs = [encode_for_search(c, params, with_self_rev=False) for c in chains]
    t0 = mark("encode", t0)

    pipe = DeviceSelfSearch(ecs, params, with_rev_profiles=True)
    t0 = mark("devinit(rev-encode+upload)", t0)

    srs = pipe.self_rev_scores_device()
    for ec, s in zip(ecs, srs):
        ec.self_rev_score = (self_rev_score(ec, params)
                             if len(ec) >= params.mkfl else float(s))
    t0 = mark("selfrev", t0)

    survivors = pipe.stage1_survivors()
    t0 = mark(f"stage1({len(survivors)} pairs)", t0)

    by_pair = pipe.align_survivors(survivors)
    t0 = mark(f"stage3+4({len(by_pair)} res)", t0)

    import io
    opts = SearchOptions(
        columns=parse_columns("query+target+qlo+qhi+tlo+thi+evalue+cigar"),
        max_evalue=10.0, mode="sensitive")
    drv = SearchDriver(params, opts, io.StringIO())
    n = len(ecs)
    lens = np.array([len(ec) for ec in ecs])
    long_set = np.flatnonzero(lens >= params.mkfl)
    seen = set()
    for j in long_set:
        for i in range(n):
            a, b = (i, int(j)) if i <= j else (int(j), i)
            if (a, b) in seen:
                continue
            seen.add((a, b))
            res = drv.aligner.align(ecs[a], ecs[b])
            if res is not None and res.path:
                by_pair[(a, b)] = res
    t0 = mark(f"hostMKF({len(seen)} pairs)", t0)

    for (i, j) in sorted(by_pair):
        res = by_pair[(i, j)]
        q, tt = ecs[i], ecs[j]
        drv.emit(res, q, tt, True)
        if i != j:
            drv.emit(res, q, tt, False)
    t0 = mark("emit", t0)

    total = sum(t.values())
    print(f"--- {tag}: total {total:.2f}s, hits {drv.hit_count}")
    for k, v in t.items():
        print(f"  {k:34s} {v:8.2f}s  {100*v/total:5.1f}%")
    sys.stdout.flush()
    return total


def main():
    from reseek_tpu.search.engine import configure_jax
    configure_jax()
    from reseek_tpu.constants import DSSParams
    from reseek_tpu.io.bca import read_bca

    params = DSSParams.create(os.environ.get("PROFILE_MODE", "sensitive"))
    chains = read_bca(Q100)
    n = len(chains)
    print(f"chains={n} pairs={n*(n+1)//2}")
    run(chains, params, "cold")
    run(chains, params, "warm")
    run(chains, params, "warm2")


if __name__ == "__main__":
    main()
