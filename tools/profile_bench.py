"""Stage-level profile of the q100 sensitive self-search (device engine)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reseek_tpu.search.engine import configure_jax
configure_jax()
import numpy as np
from reseek_tpu.constants import DSSParams
from reseek_tpu.io.bca import read_bca

params = DSSParams.create("sensitive")
chains = read_bca("/root/reference/test_data/q100.bca")

import jax

def t(label, f, *a, **kw):
    t0 = time.time()
    r = f(*a, **kw)
    jax.block_until_ready(r)  # accepts arbitrary pytrees
    print(f"{label:30s} {time.time()-t0:8.3f}s")
    return r

for rep in range(2):
    print(f"--- pass {rep} ---")
    t0 = time.time()
    from reseek_tpu.align.pipeline import encode_for_search
    ecs = t("encode_all", lambda: [
        encode_for_search(c, params, with_self_rev=False) for c in chains])
    from reseek_tpu.search.engine import DeviceDB, BatchedEngine
    db = t("DeviceDB build+upload", DeviceDB, ecs, params, with_rev_profiles=True)
    eng = BatchedEngine(db)
    srs = t("self_rev_scores", eng.self_rev_scores)
    for ec, s in zip(ecs, np.asarray(srs)):
        ec.self_rev_score = float(s)
    n = len(ecs)
    iu = np.triu_indices(n)
    pairs = np.stack(iu, axis=1).astype(np.int64)
    mu = t("mu_filter_scores", eng.mu_filter_scores, pairs)
    pairs2 = pairs[mu >= params.omega]
    print(f"  pairs {len(pairs)} -> after omega {len(pairs2)}")
    fwd = t("full_scores", eng.full_scores, pairs2)
    pairs3 = pairs2[fwd >= params.min_fwd_score]
    print(f"  after min_fwd {len(pairs3)}")
    res = t("full_alignments", eng.full_alignments, pairs3)
    print(f"total {time.time()-t0:.3f}s, hits {sum(1 for r in res if r and r.path)}")
