"""Mu k-mer two-hit-diagonal prefilter for big-DB searches.

Reimplements the reference's MMseqs2-style prefilter
(src/prefiltermu.cpp, src/mudex.cpp, src/mermx.cpp, src/muprefilter.cpp,
src/rankedscoresbag.cpp) with vectorized numpy:

  - spaced 5-mers, pattern "1110011" (offsets 0,1,2,5,6), dict 36^5
  - k-mers whose self-score < 36 are masked out
  - query k-mer index expanded with the score>=36 neighborhood of each
    query k-mer (idxq mode); neighborhoods enumerated with a
    meet-in-the-middle sweep instead of the reference's per-k-mer
    branch-and-bound (identical sets, vector-friendly)
  - target k-mer hits -> (query, diagonal) pairs; diagonals above the
    14-bit cap are skipped; diagonals hit >=2 times are extended to
    ungapped diagonal HSPs (Kadane max-subarray with the reference's
    reset rule); per (query, target) best diagonal score is kept
  - per-query top-B (1500) target lists

The TPU engine consumes the selected (query, target) candidate pairs for
the sensitive-parameter alignment phase (PostMuFilter equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from reseek_tpu.data.tables import get_tables

PATTERN = "1110011"
OFFSETS = np.array([0, 1, 2, 5, 6], np.int64)
K_SPAN = 7
K = 5
DICT_SIZE = 36 ** 5
MIN_KMER_PAIR_SCORE = 36
RSB_SIZE = 1500
MASK14 = (1 << 14) - 1
MAX_QUERY_CHAINS_FOR_QUERY_NEIGHBORHOOD = 100


def spaced_kmers(mu_letters: np.ndarray) -> np.ndarray:
    """Spaced 5-mer codes at each start position, int64 [L-6] (first letter
    most significant, src/mudex.cpp:45-53); -1 where the k-mer's
    self-score is below MIN_KMER_PAIR_SCORE (src/mudex.cpp:533-537)."""
    L = len(mu_letters)
    n = L - K_SPAN + 1
    if n <= 0:
        return np.zeros(0, np.int64)
    lets = mu_letters.astype(np.int64)
    cols = np.stack([lets[o: o + n] for o in OFFSETS])  # [5, n]
    kmers = np.zeros(n, np.int64)
    for c in cols:
        kmers = kmers * 36 + c
    s = get_tables().mu_prefilter_mx_int8
    self_diag = np.diag(s).astype(np.int64)
    self_scores = np.zeros(n, np.int64)
    for c in cols:
        self_scores += self_diag[c]
    return np.where(self_scores >= MIN_KMER_PAIR_SCORE, kmers, -1)


def kmer_letters(kmers: np.ndarray) -> np.ndarray:
    """int64 [N] -> uint8 [N, 5] letters, most significant first."""
    out = np.empty((len(kmers), K), np.uint8)
    k = np.asarray(kmers, np.int64)
    for i in range(K - 1, -1, -1):
        out[:, i] = k % 36
        k = k // 36
    return out


def neighborhoods(kmers: Sequence[int], min_score: int = MIN_KMER_PAIR_SCORE
                  ) -> Dict[int, np.ndarray]:
    """For each unique k-mer, all 5-mers with pair score >= min_score
    (the reference's GetHighScoringKmers sets, src/mermx.cpp:616).

    Meet-in-the-middle: pair scores decompose as A(first 2 letters) +
    B(last 3); enumerate 36^2 x sorted-36^3 with a threshold cut."""
    s = get_tables().mu_prefilter_mx_int8.astype(np.int64)
    uniq = np.unique([k for k in kmers if k >= 0]).astype(np.int64)
    out: Dict[int, np.ndarray] = {}
    if len(uniq) == 0:
        return out
    lets = kmer_letters(uniq)

    # precompute suffix sums table for all 36^3 suffixes once per distinct
    # (l2, l3, l4) triple of the queries
    a1 = np.arange(36, dtype=np.int64)
    for km, (l0, l1, l2, l3, l4) in zip(uniq, lets):
        # A[m0, m1] = s[l0, m0] + s[l1, m1]  (36^2)
        A = (s[l0][:, None] + s[l1][None, :]).reshape(-1)  # [1296]
        # B[m2, m3, m4] = s[l2,m2]+s[l3,m3]+s[l4,m4]  (36^3)
        B = (s[l2][:, None, None] + s[l3][None, :, None]
             + s[l4][None, None, :]).reshape(-1)  # [46656]
        order = np.argsort(-B, kind="stable")
        b_sorted = B[order]
        # for each a, take suffixes with b >= min_score - a
        need = min_score - A  # [1296]
        counts = np.searchsorted(-b_sorted, -need + 1, side="left")
        # counts[i] = number of b >= need[i]
        total = int(counts.sum())
        res = np.empty(total, np.int64)
        pos = 0
        prefix_codes = np.arange(1296, dtype=np.int64) * (36 ** 3)
        for i in np.flatnonzero(counts):
            c = counts[i]
            res[pos: pos + c] = prefix_codes[i] + order[:c]
            pos += c
        out[int(km)] = res[:pos]
    return out


class QueryKmerIndex:
    """kmer -> [(query idx, query pos)] with optional query-side
    neighborhood expansion (MuDex with m_AddNeighborhood,
    src/mudex.cpp:125-227)."""

    def __init__(self, query_mu: List[np.ndarray],
                 add_neighborhood: bool = True):
        self.n_queries = len(query_mu)
        self.query_mu = query_mu
        kmer_list = []
        qidx_list = []
        qpos_list = []
        all_kmers = []
        per_query = []
        for qi, mu in enumerate(query_mu):
            km = spaced_kmers(mu)
            per_query.append(km)
            all_kmers.append(km[km >= 0])
        hoods = neighborhoods(np.concatenate(all_kmers)
                              if all_kmers else []) if add_neighborhood \
            else {}
        for qi, km in enumerate(per_query):
            for pos in np.flatnonzero(km >= 0):
                kmer = int(km[pos])
                # the direct entry is always added, and the neighborhood
                # INCLUDES the k-mer itself (self-score >= threshold), so
                # each query k-mer is indexed twice under its own code —
                # a single exact target match is already a "two-hit"
                # (src/mudex.cpp:125-176 adds Kmer then its full hood)
                if add_neighborhood:
                    nb = hoods[kmer]
                    kmer_list.append(np.concatenate(([kmer], nb)))
                    qidx_list.append(np.full(len(nb) + 1, qi, np.int64))
                    qpos_list.append(np.full(len(nb) + 1, pos, np.int64))
                else:
                    kmer_list.append(np.array([kmer], np.int64))
                    qidx_list.append(np.array([qi], np.int64))
                    qpos_list.append(np.array([pos], np.int64))
        if kmer_list:
            kmers = np.concatenate(kmer_list)
            qidx = np.concatenate(qidx_list)
            qpos = np.concatenate(qpos_list)
        else:
            kmers = np.zeros(0, np.int64)
            qidx = np.zeros(0, np.int64)
            qpos = np.zeros(0, np.int64)
        order = np.argsort(kmers, kind="stable")
        self.kmers_sorted = kmers[order]
        self.qidx_sorted = qidx[order].astype(np.int32)
        self.qpos_sorted = qpos[order].astype(np.int32)
        self.qlens = np.array([len(m) for m in query_mu], np.int64)

    def lookup_many(self, target_kmers: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """For target k-mers at positions [0..n), return flat arrays
        (tpos, qidx, qpos) of all index hits."""
        valid = np.flatnonzero(target_kmers >= 0)
        tk = target_kmers[valid]
        lo = np.searchsorted(self.kmers_sorted, tk, side="left")
        hi = np.searchsorted(self.kmers_sorted, tk, side="right")
        counts = hi - lo
        total = int(counts.sum())
        tpos = np.repeat(valid, counts)
        # ranges [lo_i, hi_i) concatenated
        idx = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi)
                              if h > l]) if total else np.zeros(0, np.int64)
        return tpos, self.qidx_sorted[idx], self.qpos_sorted[idx]


def diag_hsp_scores(mu_prefilter_mx: np.ndarray, qseq: np.ndarray,
                    tseq: np.ndarray, diags: np.ndarray) -> np.ndarray:
    """Best ungapped segment score on each diagonal (FindHSP,
    src/prefiltermu.cpp:12-48).  diag d: i starts at max(QL-d-1, 0),
    j at max(d-QL+1, 0)."""
    ql, tl = len(qseq), len(tseq)
    out = np.zeros(len(diags), np.int64)
    for n, d in enumerate(diags):
        i = max(ql - int(d) - 1, 0)
        j = max(int(d) - ql + 1, 0)
        ln = min(ql - i, tl - j)
        if ln <= 0:
            continue
        s = mu_prefilter_mx[qseq[i: i + ln], tseq[j: j + ln]].astype(np.int64)
        cum = np.cumsum(s)
        run_min = np.minimum.accumulate(np.concatenate(([0], cum[:-1])))
        out[n] = max(0, int((cum - np.minimum(run_min, 0)).max()))
    return out


@dataclasses.dataclass
class PrefilterResult:
    """Per query: top-B candidate target indices (and diag scores)."""

    query_targets: List[List[Tuple[int, int]]]  # per query [(tidx, score)]

    def target_to_queries(self) -> Dict[int, List[int]]:
        out: Dict[int, List[int]] = {}
        for qi, lst in enumerate(self.query_targets):
            for tidx, _s in lst:
                out.setdefault(tidx, []).append(qi)
        return out


# The reference's g_CharToLetterMu maps 'K'->11 and 'L'->10 (swapped,
# src/alpha.cpp:3291+ rows 75-76), and the search pipeline round-trips
# QUERY Mu sequences through ASCII (MuSeqSource m_ASCII=true + ToLetters)
# while targets stay numeric — so reference queries have letters 10 and 11
# exchanged.  Replicated here for selection parity.
_KL_SWAP = np.arange(36, dtype=np.uint8)
_KL_SWAP[10], _KL_SWAP[11] = 11, 10


def _swap_kl(mu: np.ndarray) -> np.ndarray:
    return _KL_SWAP[mu]


class MuPrefilter:
    def __init__(self, query_mu: List[np.ndarray],
                 add_neighborhood: Optional[bool] = None,
                 top_b: int = RSB_SIZE):
        if add_neighborhood is None:
            add_neighborhood = (len(query_mu)
                                <= MAX_QUERY_CHAINS_FOR_QUERY_NEIGHBORHOOD)
        query_mu = [_swap_kl(m) for m in query_mu]
        # idxt mode (target-side neighborhoods) selects the same hit pairs;
        # we always index the query side and expand query neighborhoods.
        self.index = QueryKmerIndex(query_mu, add_neighborhood=True)
        self.query_mu = query_mu
        self.top_b = top_b
        self.s = get_tables().mu_prefilter_mx_int8
        # per query: list of (score, tidx)
        self._scores: List[List[Tuple[int, int]]] = [
            [] for _ in range(len(query_mu))]

    def add_target(self, tidx: int, t_mu: np.ndarray) -> None:
        tk = spaced_kmers(t_mu)
        if len(tk) == 0:
            return
        tpos, qidx, qpos = self.index.lookup_many(tk)
        if len(tpos) == 0:
            return
        qlens = self.index.qlens[qidx]
        diags = (qlens + tpos) - qpos - 1
        keep = diags <= MASK14
        qidx = qidx[keep]
        diags = diags[keep]
        if len(qidx) == 0:
            return
        # two-hit: (qidx, diag) seen at least twice
        pairs = qidx.astype(np.int64) * (MASK14 + 1) + diags
        uniq, counts = np.unique(pairs, return_counts=True)
        dup = uniq[counts >= 2]
        if len(dup) == 0:
            return
        dq = (dup // (MASK14 + 1)).astype(np.int64)
        dd = dup % (MASK14 + 1)
        # best HSP per query over its two-hit diagonals
        for qi in np.unique(dq):
            sel = dq == qi
            scores = diag_hsp_scores(self.s, self.query_mu[qi], t_mu,
                                     dd[sel])
            best = int(scores.max())
            if best > 0:
                self._scores[qi].append((best, tidx))

    def finish(self) -> PrefilterResult:
        out: List[List[Tuple[int, int]]] = []
        for lst in self._scores:
            lst_sorted = sorted(lst, key=lambda p: -p[0])[: self.top_b]
            out.append([(tidx, score) for score, tidx in lst_sorted])
        return PrefilterResult(query_targets=out)


def prefilter_search(query_mu: List[np.ndarray],
                     target_mu_iter: Iterable[Tuple[int, np.ndarray]],
                     top_b: int = RSB_SIZE) -> PrefilterResult:
    pf = MuPrefilter(query_mu, top_b=top_b)
    for tidx, t_mu in target_mu_iter:
        pf.add_target(tidx, t_mu)
    return pf.finish()
