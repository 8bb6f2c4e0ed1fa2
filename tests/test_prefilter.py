"""Mu k-mer prefilter tests (candidate selection semantics)."""

import numpy as np

from reseek_tpu.data.tables import get_tables
from reseek_tpu.search.prefilter import (MASK14, MIN_KMER_PAIR_SCORE,
                                         diag_hsp_scores, neighborhoods,
                                         prefilter_search, spaced_kmers)


def test_spaced_kmer_codes():
    mu = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9], np.uint8)
    kms = spaced_kmers(mu)
    assert len(kms) == 3
    # pattern offsets 0,1,2,5,6 -> letters (1,2,3,6,7) at pos 0
    want = ((((1 * 36 + 2) * 36 + 3) * 36 + 6) * 36 + 7)
    s = get_tables().mu_prefilter_mx_int8
    self_score = sum(int(s[x, x]) for x in (1, 2, 3, 6, 7))
    if self_score >= MIN_KMER_PAIR_SCORE:
        assert kms[0] == want
    else:
        assert kms[0] == -1


def test_neighborhood_contains_self_and_scores():
    s = get_tables().mu_prefilter_mx_int8.astype(np.int64)
    km = ((((1 * 36 + 2) * 36 + 3) * 36 + 6) * 36 + 7)
    hood = neighborhoods([km])[km]
    lets = [1, 2, 3, 6, 7]
    if sum(int(s[x, x]) for x in lets) >= MIN_KMER_PAIR_SCORE:
        assert km in set(int(x) for x in hood)
    # every member scores >= threshold
    for nb in hood[:50]:
        nl = []
        v = int(nb)
        for _ in range(5):
            nl.append(v % 36)
            v //= 36
        nl.reverse()
        sc = sum(int(s[a, b]) for a, b in zip(lets, nl))
        assert sc >= MIN_KMER_PAIR_SCORE


def test_diag_hsp_kadane_matches_loop():
    rng = np.random.default_rng(0)
    s = get_tables().mu_prefilter_mx_int8.astype(np.int64)
    for _ in range(20):
        q = rng.integers(0, 36, 50).astype(np.uint8)
        t = rng.integers(0, 36, 60).astype(np.uint8)
        d = int(rng.integers(0, 100))
        got = diag_hsp_scores(get_tables().mu_prefilter_mx_int8, q, t,
                              np.array([d]))[0]
        # direct loop (FindHSP, src/prefiltermu.cpp:27-47)
        ql, tl = len(q), len(t)
        i = max(ql - d - 1, 0)
        j = max(d - ql + 1, 0)
        b = f = 0
        while i < ql and j < tl:
            f += int(s[q[i], t[j]])
            if f > b:
                b = f
            elif f < 0:
                f = 0
            i += 1
            j += 1
        assert got == b


def test_self_prefilter_selects_self():
    rng = np.random.default_rng(1)
    mus = [rng.integers(0, 36, 80).astype(np.uint8) for _ in range(3)]
    res = prefilter_search(mus, list(enumerate(mus)))
    for qi in range(3):
        assert qi in [t for t, _s in res.query_targets[qi]]
