"""Pallas TPU Smith-Waterman: wavefront DP with state resident in VMEM.

Same per-cell float32 arithmetic and tie rules as reseek_tpu/ops/sw_np.py
(itself a replica of the reference kernel, src/sw.cpp:79-212), so scores,
traceback bits and best-cell selection are bit-identical to the lax.scan
implementation in reseek_tpu/ops/sw_jax.py.

Why Pallas: the lax.scan wavefront round-trips its [B, LA] carry through
HBM every anti-diagonal (~50-170 us/step measured through the axon tunnel),
so long buckets are dominated by scan overhead.  Here the grid iterates
(batch-tile, diagonal-block); the DP state vectors live in VMEM scratch
that persists across the sequential diagonal grid steps, each grid step
processes K diagonals from one DMA'd block, and Pallas double-buffers the
substitution blocks from HBM automatically.

The skewed substitution tensor is built with a pad+reshape shear (no
gather): flat index i*(D+1) + j  ==  i*D + (i+j), so padding rows from LB
to D+1, flattening, truncating to LA*D and reshaping to [LA, D] places
S[i, j] at [i, i+j].
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = np.float32(-9e9)

# diagonals per grid step (amortizes grid + DMA fixed costs)
K_DIAGS = 8
# Per-(pair, residue) VMEM bytes: score = double-buffered f32 input block
# (8K) + 6 f32 scratch (24); trace adds the double-buffered uint8 tb
# output block (2K).  Budget leaves headroom under the 16 MB VMEM limit.
_VMEM_BUDGET = 10 * 1024 * 1024
_SCORE_CELL_BYTES = 8 * K_DIAGS + 24
_TRACE_CELL_BYTES = 10 * K_DIAGS + 24


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def skew(s: jnp.ndarray, d_pad: int = 0) -> jnp.ndarray:
    """S [B, LA, LB] -> [Dp, B, LA] with out[d, b, i] = S[b, i, d-i]
    (NEG outside), Dp = LA+LB-1 rounded up by d_pad, via pad+reshape."""
    b, la, lb = s.shape
    d = la + lb - 1
    dp = d if d_pad == 0 else -(-d // d_pad) * d_pad
    p = jnp.pad(s, ((0, 0), (0, 0), (0, dp + 1 - lb)), constant_values=NEG)
    p = p.reshape(b, la * (dp + 1))[:, : la * dp].reshape(b, la, dp)
    return jnp.transpose(p, (2, 0, 1))


def _shift1(x, neg):
    """Shift toward higher lane index by 1, filling lane 0 with NEG."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < 1, neg, jnp.roll(x, 1, axis=1))


def _shift2(x, neg):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < 2, neg, jnp.roll(x, 2, axis=1))


def _step(h1, h2, h3, e1, f1, s_diag, open_, ext):
    """One wavefront step (identical math to sw_jax._step_core)."""
    neg = NEG
    e_open = _shift2(h3, neg) + open_
    e_ext = _shift1(e1, neg) + ext
    e_pref = e_open >= e_ext
    e = jnp.where(e_pref, e_open, e_ext)

    f_open = _shift1(h3, neg) + open_
    f_ext = f1 + ext
    f_pref = f_open >= f_ext
    f = jnp.where(f_pref, f_open, f_ext)

    m = _shift1(h2, neg)
    src = jnp.zeros(m.shape, jnp.int32)
    be = e > m
    m = jnp.where(be, e, m)
    src = jnp.where(be, 1, src)
    bf = f > m
    m = jnp.where(bf, f, m)
    src = jnp.where(bf, 2, src)
    rs = np.float32(0.0) >= m
    m = jnp.where(rs, np.float32(0.0), m)
    src = jnp.where(rs, 3, src)

    h = m + s_diag
    return h, e, f, src, e_pref, f_pref


def _bt_for(b: int, la: int, cell_bytes: int) -> Tuple[int, int]:
    """(batch tile, number of tiles) under the VMEM byte budget; accounts
    for lane padding of la to a multiple of 128."""
    la_pad = -(-la // 128) * 128
    bt_cap = max(8, (_VMEM_BUDGET // (cell_bytes * la_pad)) // 8 * 8)
    if bt_cap >= b:
        bt, nb = -(-b // 8) * 8, 1
    else:
        n = -(-b // bt_cap)
        bt = -(-(-(-b // n)) // 8) * 8
        nb = -(-b // bt)
    # cell_bytes covers the per-(pair, residue) state; fixed per-tile
    # overheads (trace scratches, double-buffered output block) add
    # ~(K_DIAGS+2)*4 bytes/pair-residue at most — assert total headroom
    # under the 16 MB hardware VMEM limit rather than trusting the budget.
    total = bt * la_pad * (cell_bytes + (K_DIAGS + 2) * 4)
    assert total < 15 * 1024 * 1024, (
        f"sw_pallas tile VMEM estimate {total} exceeds limit "
        f"(bt={bt}, la={la})")
    return bt, nb


def _score_kernel(s_ref, out_ref, h1, h2, h3, e1, f1, bestv,
                  *, open_, ext, k):
    db = pl.program_id(1)
    ndb = pl.num_programs(1)

    @pl.when(db == 0)
    def _():
        for r in (h1, h2, h3, e1, f1):
            r[:] = jnp.full_like(r, NEG)
        bestv[:] = jnp.zeros_like(bestv)

    for kk in range(k):
        h, e, f, _src, _ep, _fp = _step(h1[:], h2[:], h3[:], e1[:], f1[:],
                                        s_ref[kk], open_, ext)
        h3[:] = h2[:]
        h2[:] = h1[:]
        h1[:] = h
        e1[:] = e
        f1[:] = f
        bestv[:] = jnp.maximum(bestv[:], h)

    @pl.when(db == ndb - 1)
    def _():
        out_ref[0, 0, :] = jnp.max(bestv[:], axis=1)


@functools.partial(jax.jit, static_argnames=("open_", "ext"))
def sw_score_pallas(s: jnp.ndarray, open_: float, ext: float) -> jnp.ndarray:
    """s: [B, LA, LB] f32 (NEG-padded).  Returns best scores [B] (>= 0).

    Bit-identical to sw_jax.sw_score_batch (extra NEG diagonals from the
    K-alignment padding can never raise the 0-floored best)."""
    b, la, lb = s.shape
    k = K_DIAGS
    s_skew = skew(s, d_pad=k)
    dp = s_skew.shape[0]
    bt, nb = _bt_for(b, la, _SCORE_CELL_BYTES)
    bpad = nb * bt
    if bpad != b:
        s_skew = jnp.pad(s_skew, ((0, 0), (0, bpad - b), (0, 0)),
                         constant_values=NEG)

    kern = functools.partial(_score_kernel, open_=np.float32(open_),
                             ext=np.float32(ext), k=k)
    out = pl.pallas_call(
        kern,
        grid=(nb, dp // k),
        in_specs=[pl.BlockSpec((k, bt, la), lambda ib, dd: (dd, ib, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, bt), lambda ib, dd: (ib, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 8, bt), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, la), jnp.float32)
                        for _ in range(6)],
        interpret=_interpret(),
    )(s_skew)
    return out[:, 0, :].reshape(bpad)[:b]


def _trace_kernel(s_ref, tb_ref, best_ref, bi_ref, bj_ref,
                  h1, h2, h3, e1, f1, bests, bis, bjs,
                  *, open_, ext, k):
    db = pl.program_id(1)
    ndb = pl.num_programs(1)

    @pl.when(db == 0)
    def _():
        for r in (h1, h2, h3, e1, f1):
            r[:] = jnp.full_like(r, NEG)
        bests[:] = jnp.zeros_like(bests)
        bis[:] = jnp.zeros_like(bis)
        bjs[:] = jnp.zeros_like(bjs)

    for kk in range(k):
        h, e, f, src, ep, fp = _step(h1[:], h2[:], h3[:], e1[:], f1[:],
                                     s_ref[kk], open_, ext)
        h3[:] = h2[:]
        h2[:] = h1[:]
        h1[:] = h
        e1[:] = e
        f1[:] = f

        # best-cell tie rules of sw_jax.sw_traceback_batch: strict
        # improvement across diagonals, first-i on equal values
        d = db * k + kk
        dmax = jnp.max(h, axis=1)
        # first-index max (jnp.argmax tie-breaking differs under Mosaic)
        lane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
        di = jnp.min(jnp.where(h == dmax[:, None], lane, h.shape[1]),
                     axis=1).astype(jnp.int32)
        prev = bests[0, :]
        pi = bis[0, :]
        take = (dmax > prev) | ((dmax == prev) & (di < pi) & (prev > 0))
        bests[0, :] = jnp.where(take, dmax, prev)
        bis[0, :] = jnp.where(take, di, pi)
        bjs[0, :] = jnp.where(take, d - di, bjs[0, :])

        tb_ref[kk] = (src | jnp.where(ep, 4, 0)
                      | jnp.where(fp, 8, 0)).astype(jnp.uint8)

    @pl.when(db == ndb - 1)
    def _():
        best_ref[0, 0, :] = bests[0, :]
        bi_ref[0, 0, :] = bis[0, :]
        bj_ref[0, 0, :] = bjs[0, :]


@functools.partial(jax.jit, static_argnames=("open_", "ext"))
def sw_traceback_pallas(s: jnp.ndarray, open_: float, ext: float):
    """Returns (best [B], bi [B], bj [B], tb [D, B, LA] uint8), identical
    to sw_jax.sw_traceback_batch (tb in skewed layout; rows beyond
    LA+LB-1 are padding)."""
    b, la, lb = s.shape
    k = K_DIAGS
    s_skew = skew(s, d_pad=k)
    dp = s_skew.shape[0]
    bt, nb = _bt_for(b, la, _TRACE_CELL_BYTES)
    bpad = nb * bt
    if bpad != b:
        s_skew = jnp.pad(s_skew, ((0, 0), (0, bpad - b), (0, 0)),
                         constant_values=NEG)

    kern = functools.partial(_trace_kernel, open_=np.float32(open_),
                             ext=np.float32(ext), k=k)
    out_shapes = (
        jax.ShapeDtypeStruct((dp, bpad, la), jnp.uint8),
        jax.ShapeDtypeStruct((nb, 8, bt), jnp.float32),
        jax.ShapeDtypeStruct((nb, 8, bt), jnp.int32),
        jax.ShapeDtypeStruct((nb, 8, bt), jnp.int32),
    )
    tb, best, bi, bj = pl.pallas_call(
        kern,
        grid=(nb, dp // k),
        in_specs=[pl.BlockSpec((k, bt, la), lambda ib, dd: (dd, ib, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((k, bt, la), lambda ib, dd: (dd, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bt), lambda ib, dd: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bt), lambda ib, dd: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bt), lambda ib, dd: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((bt, la), jnp.float32)
                        for _ in range(5)]
        + [pltpu.VMEM((8, bt), jnp.float32),
           pltpu.VMEM((8, bt), jnp.int32),
           pltpu.VMEM((8, bt), jnp.int32)],
        interpret=_interpret(),
    )(s_skew)
    return (best[:, 0, :].reshape(bpad)[:b], bi[:, 0, :].reshape(bpad)[:b],
            bj[:, 0, :].reshape(bpad)[:b], tb[:, :b, :])
