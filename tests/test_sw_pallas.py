"""Pallas SW kernels vs the exact numpy kernel (tie-prone integer scores)."""
import numpy as np
import pytest

import jax.numpy as jnp

from reseek_tpu.ops.sw_np import NEG, sw_align, sw_score
from reseek_tpu.ops.sw_pallas import skew, sw_score_pallas, sw_traceback_pallas
from reseek_tpu.ops.sw_jax import _skew as skew_gather
from reseek_tpu.ops.sw_jax import walk_traceback


def _random_batch(rng, b, la, lb, integer=True):
    """NEG-padded batch with ragged valid regions."""
    s = np.full((b, la, lb), NEG, np.float32)
    las = rng.integers(3, la + 1, b)
    lbs = rng.integers(3, lb + 1, b)
    for k in range(b):
        if integer:
            v = rng.integers(-3, 4, (las[k], lbs[k])).astype(np.float32)
        else:
            v = rng.normal(0, 2, (las[k], lbs[k])).astype(np.float32)
        s[k, :las[k], :lbs[k]] = v
    return s, las, lbs


def test_skew_matches_gather():
    rng = np.random.default_rng(0)
    s, _, _ = _random_batch(rng, 4, 17, 23)
    np.testing.assert_array_equal(np.asarray(skew(jnp.asarray(s))),
                                  np.asarray(skew_gather(jnp.asarray(s))))


@pytest.mark.parametrize("integer", [True, False])
def test_score_parity(integer):
    rng = np.random.default_rng(1)
    s, las, lbs = _random_batch(rng, 9, 40, 56, integer)
    got = np.asarray(sw_score_pallas(jnp.asarray(s), -2.0, -0.5))
    for k in range(9):
        want = sw_score(s[k, :las[k], :lbs[k]], -2.0, -0.5)
        assert got[k] == np.float32(want), (k, got[k], want)


def test_traceback_parity():
    rng = np.random.default_rng(2)
    b = 8
    s, las, lbs = _random_batch(rng, b, 33, 41, integer=True)
    best, bi, bj, tb = sw_traceback_pallas(jnp.asarray(s), -1.5, -0.25)
    best = np.asarray(best)
    bi = np.asarray(bi)
    bj = np.asarray(bj)
    tb = np.asarray(tb)
    for k in range(b):
        want_score, lo_a, lo_b, path = sw_align(
            s[k, :las[k], :lbs[k]], -1.5, -0.25)
        if want_score <= 0:
            assert best[k] <= 0
            continue
        assert best[k] == np.float32(want_score)
        got_lo_a, got_lo_b, got_path = walk_traceback(
            tb[:, k, :], int(bi[k]), int(bj[k]))
        assert (got_lo_a, got_lo_b, got_path) == (lo_a, lo_b, path)
