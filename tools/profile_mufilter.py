"""Chunk-by-chunk timing of mu_filter_scores on q100."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from reseek_tpu.search.engine import configure_jax
configure_jax()
import jax, jax.numpy as jnp, numpy as np
from reseek_tpu.constants import DSSParams
from reseek_tpu.io.bca import read_bca
from reseek_tpu.align.pipeline import encode_for_search
from reseek_tpu.search.engine import DeviceDB, BatchedEngine

params = DSSParams.create("sensitive")
chains = read_bca("/root/reference/test_data/q100.bca")
ecs = [encode_for_search(c, params, with_self_rev=False) for c in chains]
lens = np.array([len(ec) for ec in ecs])
print("length histogram:", np.percentile(lens, [0, 25, 50, 75, 90, 100]))
db = DeviceDB(ecs, params, with_rev_profiles=False)
eng = BatchedEngine(db)
n = len(ecs)
iu = np.triu_indices(n)
pairs = np.stack(iu, axis=1).astype(np.int64)

p = params
o, e = -float(p.para_mu_gap_open), -float(p.para_mu_gap_ext)

for rep in range(2):
    print(f"--- rep {rep} ---")
    t_all = time.time()
    chunks = []
    for bucket, chunk, nn, rows in eng._bucketed(pairs):
        t0 = time.time()
        sc = eng.k["stage1_mu"](
            db.mu, db.mu_rev, jnp.asarray(chunk[:, 0]),
            jnp.asarray(chunk[:, 1]), db.mumx, float(p.omega_fwd),
            bucket, o, e)
        t_disp = time.time() - t0
        sc.block_until_ready()
        print(f"bucket {bucket:5d} B={len(chunk):5d} n={nn:5d} "
              f"dispatch {t_disp*1000:7.1f}ms total {(time.time()-t0)*1000:8.1f}ms")
        chunks.append(sc[:nn])
    t0 = time.time()
    allsc = np.asarray(jnp.concatenate(chunks))
    print(f"fetch {(time.time()-t0)*1000:.1f}ms; grand total {time.time()-t_all:.3f}s")
