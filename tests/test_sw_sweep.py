"""Row-sweep SW (ops/sw_sweep.py) vs the exact reference kernel
(ops/sw_np.py) on integer matrices — scores must be bit-identical."""

import numpy as np
import pytest

from reseek_tpu.ops.sw_np import sw_score
from reseek_tpu.ops.sw_sweep import (mu_filter_mask_sweep, mu_scores_sweep,
                                     sw_score_sweep)

NEG = np.float32(-9e9)


def _pad_batch(mats, la, lb):
    s = np.full((len(mats), la, lb), NEG, np.float32)
    for k, m in enumerate(mats):
        s[k, :m.shape[0], :m.shape[1]] = m
    return s


def test_sweep_matches_reference_random_int():
    rng = np.random.default_rng(7)
    mats = []
    for _ in range(24):
        a, b = rng.integers(3, 60, 2)
        mats.append(rng.integers(-7, 5, (a, b)).astype(np.float32))
    s = _pad_batch(mats, 64, 64)
    got = np.asarray(sw_score_sweep(s, -2.0, -1.0))
    for k, m in enumerate(mats):
        assert got[k] == sw_score(m, -2.0, -1.0)


def test_sweep_rectangular_and_gap_params():
    rng = np.random.default_rng(3)
    mats = [rng.integers(-9, 6, (17, 83)).astype(np.float32),
            rng.integers(-9, 6, (40, 128)).astype(np.float32)]
    s = _pad_batch(mats, 40, 128)
    got = np.asarray(sw_score_sweep(s, -11.0, -1.0))
    for k, m in enumerate(mats):
        assert got[k] == sw_score(m, -11.0, -1.0)


def test_mu_filter_mask_matches_pair_aligner():
    """Gate decisions equal the host PairAligner on real encoded chains."""
    import jax.numpy as jnp

    from reseek_tpu.align.pipeline import PairAligner, encode_for_search
    from reseek_tpu.constants import DSSParams
    from reseek_tpu.io.bca import read_bca
    from reseek_tpu.search.engine import _mu_matrix_padded

    params = DSSParams.create("sensitive")
    chains = read_bca("/root/reference/test_data/q10.bca")
    ecs = [encode_for_search(c, params, with_self_rev=False) for c in chains]
    lens = np.array([len(e) for e in ecs])
    lmax = int(lens.max())
    n = len(ecs)
    mu = np.full((n, lmax), 36, np.uint8)
    mu_rev = np.full((n, lmax), 36, np.uint8)
    for i, e in enumerate(ecs):
        mu[i, :len(e)] = e.mu_letters
        mu_rev[i, :len(e)] = e.mu_letters[::-1]
    mumx = jnp.asarray(_mu_matrix_padded())
    pa = PairAligner(params)
    o, e_ = -float(params.para_mu_gap_open), -float(params.para_mu_gap_ext)

    pairs = [(i, j) for i in range(n) for j in range(i, n)]
    # canonical orientation: shorter chain on the A side
    ia = np.array([i if lens[i] <= lens[j] else j for i, j in pairs])
    ib = np.array([j if lens[i] <= lens[j] else i for i, j in pairs])
    la = int(lens[ia].max())
    lb = int(lens[ib].max())
    mask = np.asarray(mu_filter_mask_sweep(
        jnp.asarray(mu), jnp.asarray(mu_rev), jnp.asarray(ia),
        jnp.asarray(ib), mumx, la, lb, o, e_,
        float(params.omega_fwd), float(params.omega)))
    fwd, rev = mu_scores_sweep(
        jnp.asarray(mu), jnp.asarray(mu_rev), jnp.asarray(ia),
        jnp.asarray(ib), mumx, la, lb, o, e_)
    fwd, rev = np.asarray(fwd), np.asarray(rev)
    for k, (i, j) in enumerate(pairs):
        want = pa.mu_filter(ecs[i], ecs[j])
        assert bool(mask[k]) == want, (i, j, fwd[k], rev[k])
        # scores match the host kernel (with parasail saturation) exactly
        exact = pa.mu_filter_score(ecs[i], ecs[j])
        fe = 777.0 if fwd[k] > 250.0 else float(fwd[k])
        re_ = 255.0 if rev[k] > 250.0 else float(rev[k])
        if exact != 0.0:  # 0 means rejected before rev in the host path
            assert fe - re_ == exact


def test_sweep_pallas_matches_scan():
    """Pallas row-sweep (interpret mode on CPU) == lax.scan sweep."""
    import jax.numpy as jnp
    from reseek_tpu.ops.sw_sweep import sw_score_sweep_pallas
    rng = np.random.default_rng(11)
    mats = []
    for _ in range(10):
        a, b = rng.integers(3, 120, 2)
        mats.append(rng.integers(-7, 5, (a, b)).astype(np.float32))
    s = _pad_batch(mats, 120, 128)
    got = np.asarray(sw_score_sweep_pallas(jnp.asarray(s), -2.0, -1.0))
    want = np.asarray(sw_score_sweep(jnp.asarray(s), -2.0, -1.0))
    assert np.array_equal(got, want)
    for k, m in enumerate(mats):
        assert got[k] == sw_score(m, -2.0, -1.0)


def test_fused_smx_pallas_matches_materialized():
    """Fused-smx Pallas sweep (substitution rows built in-kernel) ==
    materialize-then-sweep, on real Mu letters from q10 chains."""
    import jax.numpy as jnp

    from reseek_tpu.constants import DSSParams
    from reseek_tpu.encoder.dss import encode_chain
    from reseek_tpu.io.bca import read_bca
    from reseek_tpu.ops.sw_sweep import (mu_smx_onehot,
                                         mu_sw_score_fused_pallas)
    from reseek_tpu.search.engine import _mu_matrix_padded

    params = DSSParams.create("sensitive")
    chains = read_bca("/root/reference/test_data/q10.bca")
    mus = [encode_chain(c).mu_letters for c in chains]
    la = 128 * (-(-max(len(m) for m in mus) // 128))
    n = len(mus)
    mu = np.full((n, la), 36, np.uint8)
    for i, m in enumerate(mus):
        mu[i, :len(m)] = m
    mumx = jnp.asarray(_mu_matrix_padded())
    rng = np.random.default_rng(5)
    ia = rng.integers(0, n, 24)
    ib = rng.integers(0, n, 24)
    a = jnp.asarray(mu[ia].astype(np.int32))
    b = jnp.asarray(mu[ib].astype(np.int32))
    o, e = -float(params.para_mu_gap_open), -float(params.para_mu_gap_ext)
    got = np.asarray(mu_sw_score_fused_pallas(a, b, mumx, o, e))
    want = np.asarray(sw_score_sweep(mu_smx_onehot(a, b, mumx), o, e))
    assert np.array_equal(got, want)


def test_fused_smx_ragged_rows():
    """Row-count not a K_ROWS multiple + batch not a tile multiple."""
    import jax.numpy as jnp
    from reseek_tpu.ops.sw_sweep import (mu_smx_onehot,
                                         mu_sw_score_fused_pallas)
    from reseek_tpu.search.engine import _mu_matrix_padded
    rng = np.random.default_rng(6)
    a = rng.integers(0, 36, (3, 45)).astype(np.int32)
    b = rng.integers(0, 36, (3, 128)).astype(np.int32)
    mumx = jnp.asarray(_mu_matrix_padded())
    got = np.asarray(mu_sw_score_fused_pallas(
        jnp.asarray(a), jnp.asarray(b), mumx, -2.0, -1.0))
    want = np.asarray(sw_score_sweep(
        mu_smx_onehot(jnp.asarray(a), jnp.asarray(b), mumx), -2.0, -1.0))
    assert np.array_equal(got, want)


def test_sweep_pallas_bf16_matches_f32():
    """bf16 substitution blocks (the TPU default: halves smx HBM traffic)
    sweep to the identical scores — integer Mu values are bf16-exact and
    DP math stays f32 in-kernel."""
    import jax.numpy as jnp
    from reseek_tpu.ops.sw_sweep import sw_score_sweep_pallas
    rng = np.random.default_rng(12)
    mats = []
    for _ in range(9):
        a, b = rng.integers(3, 150, 2)
        mats.append(rng.integers(-7, 5, (a, b)).astype(np.float32))
    s = _pad_batch(mats, 150, 256)
    got16 = np.asarray(sw_score_sweep_pallas(
        jnp.asarray(s).astype(jnp.bfloat16), -2.0, -1.0))
    got32 = np.asarray(sw_score_sweep_pallas(jnp.asarray(s), -2.0, -1.0))
    assert np.array_equal(got16, got32)
    for k, m in enumerate(mats):
        assert got16[k] == sw_score(m, -2.0, -1.0)


def test_mu_sw_scores_paths_agree():
    """mu_sw_scores' three paths (scan, bf16 pallas, fused pallas) agree
    bit-for-bit on real Mu letters (pallas paths in interpret mode)."""
    import jax.numpy as jnp

    from reseek_tpu.encoder.dss import encode_chain
    from reseek_tpu.io.bca import read_bca
    from reseek_tpu.ops.sw_sweep import (mu_smx_onehot,
                                         mu_sw_score_fused_pallas,
                                         sw_score_sweep,
                                         sw_score_sweep_pallas)
    from reseek_tpu.search.engine import _mu_matrix_padded

    chains = read_bca("/root/reference/test_data/q10.bca")[:6]
    mus = [encode_chain(c).mu_letters for c in chains]
    la = 128 * (-(-max(len(m) for m in mus) // 128))
    mu = np.full((len(mus), la), 36, np.uint8)
    for i, m in enumerate(mus):
        mu[i, :len(m)] = m
    a = jnp.asarray(mu.astype(np.int32))
    b = jnp.asarray(mu[::-1].copy().astype(np.int32))
    mumx = jnp.asarray(_mu_matrix_padded())
    s = mu_smx_onehot(a, b, mumx)
    want = np.asarray(sw_score_sweep(s, -2.0, -1.0))
    got_bf16 = np.asarray(sw_score_sweep_pallas(
        s.astype(jnp.bfloat16), -2.0, -1.0))
    got_fused = np.asarray(mu_sw_score_fused_pallas(a, b, mumx,
                                                    -2.0, -1.0))
    assert np.array_equal(got_bf16, want)
    assert np.array_equal(got_fused, want)
