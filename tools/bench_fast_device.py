"""Many-query -fast search at scale with the DEVICE stage 2 (VERDICT r4
item 4): 100 real queries (q100) vs a 10k-chain DB — the candidate set
(~top-1500 per query) is far above RESEEK_FAST_DEVICE_MIN, so the
production auto-routing itself engages the device path; this is the
flagship PostMuFilter-analog workload with the TPU doing the stage-2
alignment work.

Runs the identical search on the host path and (if the reference binary
exists) the reference, reports wall/RSS, and asserts device == host rows
byte-for-byte.

Prereq: python tools/make_scale_db.py /tmp/scale10k 10000
Usage:  python tools/bench_fast_device.py [DB_PREFIX=/tmp/scale10k]
"""

import io
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q100 = "/root/reference/test_data/q100.bca"
REF_BIN = "/tmp/refbuild/reseek"


def run(engine, prefix):
    from reseek_tpu.align.output import parse_columns
    from reseek_tpu.constants import DSSParams
    from reseek_tpu.io.bca import read_bca
    from reseek_tpu.search.driver import SearchOptions, fast_search
    queries = read_bca(Q100)
    opts = SearchOptions(columns=parse_columns("std"),
                         max_evalue=10.0, mode="fast")
    buf = io.StringIO()
    t0 = time.time()
    drv = fast_search(queries, prefix + ".bca", DSSParams.create("fast"),
                      opts, buf, dbmu=prefix + ".mu.fa", engine=engine)
    wall = time.time() - t0
    return buf.getvalue(), wall, drv


def main():
    prefix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10k"
    from reseek_tpu.search.engine import configure_jax
    configure_jax()

    rows_dev, warm, _ = run("device", prefix)  # warmup (compiles)
    print(f"# device warmup (compile): {warm:.1f}s, "
          f"{rows_dev.count(chr(10))} rows", flush=True)
    rows_dev, t_dev, drv = run("device", prefix)
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    n_cand = sum(1 for _ in rows_dev)  # placeholder len
    print(f"# device: {t_dev:.1f}s, RSS {rss:.0f} MB, "
          f"{rows_dev.count(chr(10))} rows", flush=True)

    rows_host, t_host, _ = run("host", prefix)
    print(f"# host:   {t_host:.1f}s, {rows_host.count(chr(10))} rows",
          flush=True)
    assert rows_dev == rows_host, "device stage-2 rows != host rows"
    print("# device == host: BYTE-IDENTICAL", flush=True)

    t_ref = None
    if os.path.exists(REF_BIN):
        t0 = time.time()
        try:
            subprocess.run(
                [REF_BIN, "-search", Q100, "-db", prefix + ".bca",
                 "-fast", "-dbmu", prefix + ".mu.fa", "-threads", "2",
                 "-output", "/tmp/ref_fast_scale.tsv",
                 "-log", "/dev/null"],
                check=True, capture_output=True)
            t_ref = time.time() - t0
            n_ref = sum(1 for _ in open("/tmp/ref_fast_scale.tsv"))
            print(f"# reference (2 threads): {t_ref:.1f}s, {n_ref} rows",
                  flush=True)
        except subprocess.CalledProcessError:
            # the reference binary dies on this workload: one of the
            # 100q x 10k pairs trips its own always-on x-drop sanity
            # assert (src/xdropfwd.cpp:382 `Score2 + 0.1 >= BestScore`;
            # asserta is not NDEBUG-guarded, src/myutils.h:104).  See
            # PROFILE.md for the 50-query subset where it survives:
            # reference 158.6s (1 thread) / 88s (2 threads) vs our
            # device 44.0s, all common pairs byte-identical.
            print("# reference: CRASHED (xdropfwd.cpp:382 asserta — "
                  "reference-internal; see PROFILE.md)", flush=True)

    import json
    print(json.dumps({
        "metric": "fast_100q_vs_10k_device_stage2_wall",
        "value": round(t_dev, 2), "unit": "s",
        "vs_baseline": round(t_ref / t_dev, 2) if t_ref else None,
        "host_wall_s": round(t_host, 2),
        "rows": rows_dev.count("\n"), "rss_mb": round(rss, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
