"""MKF (seeded x-drop) path tests.

The x-drop cases mirror the reference's own `reseek -test_xdrop` harness
(src/test_xdrop.cpp): BLOSUM62, Open=-3, Ext=-1, X=8; expected values were
produced by the reference binary."""

import numpy as np
import pytest

from reseek_tpu.align import mkf
from reseek_tpu.ops.sw_np import sw_align

BLOSUM62_ALPHA = "ARNDCQEGHILKMFPSTWYVBZX*"
# standard NCBI BLOSUM62 (same values as src/blosum62.cpp)
_B62 = """
 4 -1 -2 -2  0 -1 -1  0 -2 -1 -1 -1 -1 -2 -1  1  0 -3 -2  0 -2 -1  0 -4
-1  5  0 -2 -3  1  0 -2  0 -3 -2  2 -1 -3 -2 -1 -1 -3 -2 -3 -1  0 -1 -4
-2  0  6  1 -3  0  0  0  1 -3 -3  0 -2 -3 -2  1  0 -4 -2 -3  3  0 -1 -4
-2 -2  1  6 -3  0  2 -1 -1 -3 -4 -1 -3 -3 -1  0 -1 -4 -3 -3  4  1 -1 -4
 0 -3 -3 -3  9 -3 -4 -3 -3 -1 -1 -3 -1 -2 -3 -1 -1 -2 -2 -1 -3 -3 -2 -4
-1  1  0  0 -3  5  2 -2  0 -3 -2  1  0 -3 -1  0 -1 -2 -1 -2  0  3 -1 -4
-1  0  0  2 -4  2  5 -2  0 -3 -3  1 -2 -3 -1  0 -1 -3 -2 -2  1  4 -1 -4
 0 -2  0 -1 -3 -2 -2  6 -2 -4 -4 -2 -3 -3 -2  0 -2 -2 -3 -3 -1 -2 -1 -4
-2  0  1 -1 -3  0  0 -2  8 -3 -3 -1 -2 -1 -2 -1 -2 -2  2 -3  0  0 -1 -4
-1 -3 -3 -3 -1 -3 -3 -4 -3  4  2 -3  1  0 -3 -2 -1 -3 -1  3 -3 -3 -1 -4
-1 -2 -3 -4 -1 -2 -3 -4 -3  2  4 -2  2  0 -3 -2 -1 -2 -1  1 -4 -3 -1 -4
-1  2  0 -1 -3  1  1 -2 -1 -3 -2  5 -1 -3 -1  0 -1 -3 -2 -2  0  1 -1 -4
-1 -1 -2 -3 -1  0 -2 -3 -2  1  2 -1  5  0 -2 -1 -1 -1 -1  1 -3 -1 -1 -4
-2 -3 -3 -3 -2 -3 -3 -3 -1  0  0 -3  0  6 -4 -2 -2  1  3 -1 -3 -3 -1 -4
-1 -2 -2 -1 -3 -1 -1 -2 -2 -3 -3 -1 -2 -4  7 -1 -1 -4 -3 -2 -2 -1 -2 -4
 1 -1  1  0 -1  0  0  0 -1 -2 -2  0 -1 -2 -1  4  1 -3 -2 -2  0  0  0 -4
 0 -1  0 -1 -1 -1 -1 -2 -2 -1 -1 -1 -1 -2 -1  1  5 -2 -2  0 -1 -1  0 -4
-3 -3 -4 -4 -2 -2 -3 -2 -2 -3 -2 -3 -1  1 -4 -3 -2 11  2 -3 -4 -3 -2 -4
-2 -2 -2 -3 -2 -1 -2 -3  2 -1 -1 -2 -1  3 -3 -2 -2  2  7 -1 -3 -2 -1 -4
 0 -3 -3 -3 -1 -2 -2 -3 -3  3  1 -2  1 -1 -2 -2  0 -3 -1  4 -3 -2 -1 -4
-2 -1  3  4 -3  0  1 -1  0 -3 -4  0 -3 -3 -2  0 -1 -4 -3 -3  4  1 -1 -4
-1  0  0  1 -3  3  4 -2  0 -3 -3  1 -1 -3 -1  0 -1 -3 -2 -2  1  4 -1 -4
 0 -1 -1 -1 -2 -1 -1 -1 -1 -1 -1 -1 -1 -1 -2  0  0 -2 -1 -1 -1 -1 -1 -4
-4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4 -4  1
"""
_MAT = np.array([float(v) for v in _B62.split()], np.float32).reshape(24, 24)
_IDX = {c: i for i, c in enumerate(BLOSUM62_ALPHA)}


def _smx(a: str, b: str) -> np.ndarray:
    return np.array([[_MAT[_IDX[x], _IDX[y]] for y in b] for x in a],
                    np.float32)


class _MatScorer:
    def __init__(self, s):
        self.s = s

    def __call__(self, a, b):
        return np.float32(self.s[a, b])


# (A, B, expected fwd score, fwd path, bwd score, bwd path) from
# `reseek -test_xdrop` on the reference binary
CASES = [
    ("DVLGYLRFLTKGERQANLNF", "WVLGLRFLTKGERQANLNF",
     47.0, "MMMMMMMMM", 40.0, "MMMDMMMMMM"),
    ("DVLGYLRFLTERQANLNF", "WVLGLRFLTKGERQANLNF",
     32.0, "MMMMMMM", 36.0, "MMMDMMMMMM"),
    ("DVLGYLRFLTKGERQANLNF", "WVLGLINSRFLTKGERQANLNF",
     52.0, "MMMMMMMMMM", 31.0, "MMMMMIIMMMM"),
]


@pytest.mark.parametrize("a,b,fs,fp,bs,bp", CASES)
def test_xdrop_matches_reference_binary(a, b, fs, fp, bs, bp):
    s = _smx(a, b)
    la, lb = len(a), len(b)
    open_, ext, x = -3.0, -1.0, 8.0
    _score, lo_a, lo_b, path = sw_align(s, open_, ext)
    mid_a, mid_b = lo_a, lo_b
    for c in path[: len(path) // 2]:
        if c in "MD":
            mid_a += 1
        if c in "MI":
            mid_b += 1
    sc = _MatScorer(s)
    got_fs, got_fp = mkf.xdrop_fwd(sc, x, open_, ext, mid_a + 1, la,
                                   mid_b + 1, lb)
    assert (got_fs, got_fp) == (fs, fp)
    got_bs, got_bp = mkf.xdrop_bwd(sc, x, open_, ext, mid_a, la, mid_b, lb)
    assert (got_bs, got_bp) == (bs, bp)


def test_mu_xdrop_simple():
    mx = np.zeros((36, 36), np.int32)
    np.fill_diagonal(mx, 2)
    mx[mx == 0] = -3
    lets = np.array([1, 2, 3, 4, 5, 6, 7, 8], np.uint8)
    score, lo_i, lo_j, ln = mkf.mu_xdrop(mx, lets, lets, 4, 4, 8)
    assert score == 16 and lo_i == 0 and lo_j == 0 and ln == 8


def test_chain_hsps():
    # two non-overlapping intervals chain; the overlapping one is excluded
    score, idxs = mkf.chain_hsps([0, 5, 20], [10, 15, 30],
                                 [5.0, 4.0, 7.0])
    assert score == 12.0
    assert sorted(idxs) == [0, 2]


def test_kmer_hash_first_positions():
    kmers = np.array([7, 7, 7, 7, 7, 3], np.int64)
    ht = mkf.build_kmer_hash(kmers, 10)
    assert list(ht[7]) == [0, 1, 2, 3]  # first HASHW positions only
    assert ht[3, 0] == 5 and ht[3, 1] == mkf.NO_POS
