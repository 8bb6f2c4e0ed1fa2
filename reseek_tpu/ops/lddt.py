"""LDDT over aligned columns, exact replica of GetLDDT_mu_fast
(src/lddt.cpp:63-124): R0=15, thresholds {0.5, 1, 2, 4}, per-column
preserved/considered counts, averaged over all columns."""

from __future__ import annotations

import numpy as np

R0 = np.float32(15.0)
R0_SQ = R0 * R0
THRESHOLDS = (np.float32(0.5), np.float32(1.0), np.float32(2.0),
              np.float32(4.0))


def lddt_mu_fast(coords_q: np.ndarray, coords_t: np.ndarray,
                 pos_q: np.ndarray, pos_t: np.ndarray) -> float:
    """coords_*: float32 [L,3]; pos_*: int arrays of aligned column positions.

    Column pairs (i<j): considered if either chain's distance^2 <= R0^2;
    each of 4 thresholds adds preserved if |d1-d2| <= t.  Column score =
    preserved/considered (f32), final = mean of column scores over ALL
    columns (src/lddt.cpp:110-123)."""
    n = len(pos_q)
    if n == 0:
        return 0.0
    cq = coords_q[pos_q]  # [n,3] f32
    ct = coords_t[pos_t]

    def d2mat(c):
        # GetDist2 (src/pdbchain.cpp:320-340) as compiled with GCC FMA
        # contraction: dy*dy rounded, then two fused multiply-adds:
        # d2 = fma(dz, dz, fma(dx, dx, f32(dy*dy)))
        from reseek_tpu.fp import fma32
        d = c[:, None, :] - c[None, :, :]
        dy2 = d[..., 1] * d[..., 1]
        return fma32(d[..., 2], d[..., 2], fma32(d[..., 0], d[..., 0], dy2))

    d1_sq = d2mat(cq)
    d2_sq = d2mat(ct)
    iu, ju = np.triu_indices(n, k=1)
    a1 = d1_sq[iu, ju]
    a2 = d2_sq[iu, ju]
    consider = ~((a1 > R0_SQ) & (a2 > R0_SQ))

    d1 = np.sqrt(a1[consider])
    d2 = np.sqrt(a2[consider])
    diff = np.abs(d1 - d2)
    npres = sum((diff <= t).astype(np.int64) for t in THRESHOLDS)

    considered = np.zeros(n, np.int64)
    preserved = np.zeros(n, np.int64)
    ic = iu[consider]
    jc = ju[consider]
    np.add.at(considered, ic, 4)
    np.add.at(considered, jc, 4)
    np.add.at(preserved, ic, npres)
    np.add.at(preserved, jc, npres)

    scores = np.where(considered > 0,
                      preserved.astype(np.float32)
                      / considered.astype(np.float32),
                      np.float32(0.0)).astype(np.float32)
    total = np.cumsum(scores, dtype=np.float32)[-1]  # sequential f32 sum
    return float(np.float32(total) / np.float32(n))
