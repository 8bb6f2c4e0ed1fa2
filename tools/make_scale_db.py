"""Build a synthetic large-scale structure DB for the pdb90-class perf
demo (BASELINE.md: 1 query vs 329k-chain pdb90.bca, <=10 s / <=700 MB,
reference test_scripts/check_idxqt_speed.py).

pdb90.bca is not available locally, so this replicates the q100 chains
with Gaussian coordinate noise (0.25 A per axis, deterministic seed) to a
target chain count; noise decorrelates Mu letters enough that replicas
score like homologs rather than byte-duplicates.  Writes:

  <out>.bca     — the chain DB (random-access stage-2 source)
  <out>.mu.fa   — Mu-letter FASTA (the -dbmu stage-1 artifact; the
                  reference supports exactly this to skip DB re-encoding,
                  src/search.cpp:96-99)

Usage: python tools/make_scale_db.py OUT_PREFIX [N_CHAINS=300000]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    out = sys.argv[1]
    n_target = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    from concurrent.futures import ThreadPoolExecutor

    from reseek_tpu.chain import Chain
    from reseek_tpu.encoder.dss import encode_chain, feature_string
    from reseek_tpu.io.bca import BCAWriter, read_bca

    base = read_bca("/root/reference/test_data/q100.bca")
    rng = np.random.default_rng(17)
    t0 = time.time()
    n = 0
    with BCAWriter(out + ".bca") as w, open(out + ".mu.fa", "w") as fa:
        buf = []
        while n < n_target:
            c = base[n % len(base)]
            noise = rng.normal(0, 0.25, c.coords.shape).astype(np.float32)
            cc = Chain(f"{c.label}/r{n//len(base)}", c.seq,
                       c.coords + noise)
            buf.append(cc)
            n += 1
            if len(buf) >= 512 or n == n_target:
                with ThreadPoolExecutor(
                        max_workers=os.cpu_count() or 2) as tp:
                    mus = list(tp.map(
                        lambda x: feature_string(encode_chain(x), "Mu"),
                        buf))
                for cc, mu in zip(buf, mus):
                    w.write_chain(cc)
                    fa.write(f">{cc.label}\n{mu}\n")
                buf = []
                if n % 25600 == 0:
                    rate = n / (time.time() - t0)
                    print(f"{n}/{n_target} chains ({rate:.0f}/s)",
                          flush=True)
    print(f"built {n} chains in {time.time()-t0:.1f}s -> {out}.bca, "
          f"{out}.mu.fa")


if __name__ == "__main__":
    main()
