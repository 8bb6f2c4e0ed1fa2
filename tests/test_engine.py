"""Batched engine (device pipeline) parity vs the host pair pipeline,
running on CPU via conftest's platform override."""

import numpy as np
import pytest

from reseek_tpu.align.pipeline import PairAligner, encode_for_search
from reseek_tpu.constants import DSSParams


@pytest.fixture(scope="module")
def q10_encoded(q100_chains):
    params = DSSParams.create("sensitive")
    chains = q100_chains[:8]
    ecs = [encode_for_search(c, params, with_self_rev=False) for c in chains]
    return params, ecs


def test_engine_matches_host_pipeline(q10_encoded):
    from reseek_tpu.search.engine import (BatchedEngine, DeviceDB,
                                          batched_self_search)
    params, ecs = q10_encoded
    db = DeviceDB(ecs, params, with_rev_profiles=True)
    eng = BatchedEngine(db)
    srs = eng.self_rev_scores()
    from reseek_tpu.align.pipeline import self_rev_score
    host_srs = np.float32([self_rev_score(ec, params) for ec in ecs])
    assert np.array_equal(host_srs, srs)
    for ec, s in zip(ecs, srs):
        ec.self_rev_score = float(s)

    results = {(r.query, r.target): r
               for r in batched_self_search(ecs, params, db=db)}

    pa = PairAligner(params)
    n_checked = 0
    for i in range(len(ecs)):
        for j in range(i, len(ecs)):
            res = pa.align(ecs[i], ecs[j])
            key = (ecs[i].label, ecs[j].label)
            if res is None or not res.path or res.evalue > 10.0:
                assert key not in results
                continue
            got = results[key]
            assert got.path == res.path
            assert got.lo_a == res.lo_a and got.lo_b == res.lo_b
            assert np.float32(got.fwd_score) == np.float32(res.fwd_score)
            assert np.float32(got.lddt) == np.float32(res.lddt)
            assert np.float32(got.ts) == np.float32(res.ts)
            n_checked += 1
    assert n_checked >= 3


def test_device_walk_fuzz():
    import jax
    import jax.numpy as jnp
    from reseek_tpu.ops.postalign_jax import (PD, PI, PM,
                                              walk_traceback_batch)
    from reseek_tpu.ops.sw_jax import sw_traceback_batch
    from reseek_tpu.ops.sw_np import sw_align

    code_char = {PM: "M", PD: "D", PI: "I"}
    rng = np.random.default_rng(3)
    tb_jit = jax.jit(sw_traceback_batch, static_argnames=("open_", "ext"))
    walk_jit = jax.jit(walk_traceback_batch)
    for _ in range(6):
        la = int(rng.integers(3, 28))
        lb = int(rng.integers(3, 28))
        s = rng.normal(0.3, 1.2, (3, la, lb)).astype(np.float32)
        o, e = -0.685533, -0.051881
        best, bi, bj, tbs = tb_jit(jnp.asarray(s), o, e)
        lo_a, lo_b, plen, prev = walk_jit(tbs, best, bi, bj)
        best, lo_a, lo_b, plen, prev = map(np.asarray,
                                           (best, lo_a, lo_b, plen, prev))
        for b in range(3):
            ref = sw_align(s[b], o, e)
            if best[b] <= 0:
                assert ref[0] == 0.0
                continue
            path = "".join(code_char[c] for c in prev[b, : plen[b]][::-1])
            assert (float(best[b]), int(lo_a[b]), int(lo_b[b]), path) == ref


def test_device_lddt_matches_host(q10_encoded):
    import jax.numpy as jnp
    from reseek_tpu.align.pipeline import _path_positions
    from reseek_tpu.ops.lddt import lddt_mu_fast
    from reseek_tpu.ops.postalign_jax import lddt_batch
    from reseek_tpu.ops.substmx import build_smx
    from reseek_tpu.ops.sw_np import sw_align

    params, ecs = q10_encoded
    q, t = ecs[0], ecs[1]
    smx = build_smx(params, q.profile, t.profile)
    _sc, lo_a, lo_b, path = sw_align(smx, params.gap_open, params.gap_ext)
    pos_q, pos_t = _path_positions(lo_a, lo_b, path)
    host = lddt_mu_fast(q.chain.coords, t.chain.coords, pos_q, pos_t)

    m = 256
    cq = np.zeros((1, m, 3), np.float32)
    ct = np.zeros((1, m, 3), np.float32)
    valid = np.zeros((1, m), bool)
    nc = len(pos_q)
    cq[0, :nc] = q.chain.coords[pos_q]
    ct[0, :nc] = t.chain.coords[pos_t]
    valid[0, :nc] = True
    dev = np.asarray(lddt_batch(jnp.asarray(cq), jnp.asarray(ct),
                                jnp.asarray(valid),
                                jnp.asarray([nc], np.int32)))[0]
    assert np.float32(dev) == np.float32(host)
