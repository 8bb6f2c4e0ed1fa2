"""Device-engine throughput at ~1k-chain scale (VERDICT r4 item 1).

All-vs-all self-search on N chains through the production driver
(engine="device"): the scale where per-launch tunnel latency amortizes
and the chip does sustained work — the q100 bench (5,050 pairs) is
latency-bound, this one is not.

DB construction: q100 base chains with length < MKFL (the device-path
population; long chains route to the host MKF path by design and are
benchmarked in bench.py), replicated with per-PASS Gaussian coordinate
noise.  A fresh noise seed per measured pass means every pass is a new
DB — no device dispatch can be served from the runtime's dedup cache
(PROFILE.md measurement rules), and the noise level (default 1.25 A)
decorrelates replicas enough that survivor rates stay realistic.

Prints per-pass walls, pairs/s, per-stage splits for the final pass, and
a kernel-utilization estimate computed from the engine's own stage-1
block plan (DeviceSelfSearch.stage1_block_plan).

Usage: python tools/bench_device_scale.py [N=1024] [NOISE=1.25]
"""

import io
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

Q100 = "/root/reference/test_data/q100.bca"
# v5-lite-class peaks used for the utilization estimate (PROFILE.md)
VPU_PEAK = 3.9e12     # f32 op/s
MXU_PEAK = 197e12     # bf16 FLOP/s
HBM_PEAK = 819e9      # B/s


def build_chains(n, noise, seed):
    from reseek_tpu.chain import Chain
    from reseek_tpu.constants import DSSParams
    from reseek_tpu.io.bca import read_bca
    params = DSSParams.create("sensitive")
    base = [c for c in read_bca(Q100) if len(c) < params.mkfl]
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        c = base[i % len(base)]
        nz = rng.normal(0, noise, c.coords.shape).astype(np.float32)
        out.append(Chain(f"{c.label}/r{i // len(base)}", c.seq,
                         c.coords + nz))
    return out


def run_driver(chains, params):
    from reseek_tpu.align.output import parse_columns
    from reseek_tpu.search.driver import SearchOptions, self_search
    opts = SearchOptions(
        columns=parse_columns("query+target+qlo+qhi+tlo+thi+evalue+cigar"),
        max_evalue=10.0, mode="sensitive")
    buf = io.StringIO()
    self_search(chains, params, opts, buf, engine="device")
    return buf.getvalue().count("\n")


def stage_split(chains, params):
    """Per-stage device_get-bounded walls + stage-1 cell accounting."""
    from reseek_tpu.align.pipeline import encode_for_search, self_rev_score
    from reseek_tpu.search.engine import DeviceSelfSearch
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=os.cpu_count() or 2) as tp:
        ecs = list(tp.map(
            lambda c: encode_for_search(c, params, with_self_rev=False),
            chains))
    t_enc = time.time() - t0

    t0 = time.time()
    pipe = DeviceSelfSearch(ecs, params, with_rev_profiles=False)
    t_init = time.time() - t0

    # stage-1 work accounting from the engine's own launch plan
    plan = pipe.stage1_block_plan()
    n_blocks = sum(len(v) for v in plan.values())
    n_launches = len(plan)
    cells = sum(len(v) * ca * cb * 2 * lea * leb  # fwd+rev per slot
                for (lea, leb, ca, cb), v in plan.items())

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=os.cpu_count() or 2) as tp:
        futs = [tp.submit(self_rev_score, ec, params) for ec in ecs]
        survivors = pipe.stage1_survivors()
        t_s1 = time.time() - t0
        t0 = time.time()
        for ec, f in zip(ecs, futs):
            ec.self_rev_score = f.result()
    t_srv = time.time() - t0

    t0 = time.time()
    by_pair = pipe.align_survivors(survivors, evalue_gate=10.0)
    t_s3 = time.time() - t0
    return dict(t_enc=t_enc, t_init=t_init, t_s1=t_s1, t_srv=t_srv,
                t_s3=t_s3, n_sur=len(survivors), n_res=len(by_pair),
                cells=cells, n_blocks=n_blocks, n_launches=n_launches)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    noise = float(sys.argv[2]) if len(sys.argv) > 2 else 1.25
    from reseek_tpu.search.engine import configure_jax
    configure_jax()
    from reseek_tpu.constants import DSSParams
    params = DSSParams.create("sensitive")
    n_pairs = n * (n + 1) // 2

    print(f"# N={n} chains (q100 short-chain replicas, noise={noise} A), "
          f"{n_pairs} pairs, sensitive, engine=device")
    t0 = time.time()
    hits = run_driver(build_chains(n, noise, seed=0), params)
    print(f"# warmup (compile): {time.time()-t0:.1f}s, {hits} hits",
          flush=True)

    walls = []
    for p in range(3):
        chains = build_chains(n, noise, seed=1 + p)  # fresh DB per pass
        t0 = time.time()
        hits = run_driver(chains, params)
        walls.append(time.time() - t0)
        print(f"# pass {p}: {walls[-1]:.2f}s, {hits} hits, "
              f"{n_pairs / walls[-1]:,.0f} pairs/s", flush=True)
    dt = sorted(walls)[1]

    st = stage_split(build_chains(n, noise, seed=9), params)
    s1_cellrate = st["cells"] / st["t_s1"]
    print(f"# stages (seed 9): encode {st['t_enc']:.2f}s  "
          f"init+upload {st['t_init']:.2f}s  "
          f"stage1 {st['t_s1']:.2f}s ({st['n_blocks']} blocks / "
          f"{st['n_launches']} launches)  selfrev-drain {st['t_srv']:.2f}s  "
          f"stage3 {st['t_s3']:.2f}s ({st['n_sur']} survivors, "
          f"{st['n_res']} results)")
    print(f"# stage1: {st['cells'] / 1e9:.1f} G lane-cells @ "
          f"{s1_cellrate / 1e9:.1f} Gcell/s -> "
          f"VPU ~{15 * s1_cellrate / VPU_PEAK:.1%}, "
          f"MXU(smx) ~{74 * s1_cellrate / MXU_PEAK:.1%}, "
          f"HBM(smx 2-pass) ~{8 * s1_cellrate / HBM_PEAK:.1%} of peak")
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    import json
    print(json.dumps({
        "metric": f"aligned_pairs_per_sec_{n}chain_sensitive",
        "value": round(n_pairs / dt, 1), "unit": "pairs/s/chip",
        "vs_baseline": round(n_pairs / dt / 1100.0, 3),
        "median_wall_s": round(dt, 2), "rss_mb": round(rss, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
