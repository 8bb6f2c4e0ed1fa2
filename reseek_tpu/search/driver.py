"""Search drivers: all-vs-all self search and query-vs-DB search.

Host reference implementation mirroring DBSearcher semantics
(src/dbsearcher.cpp, src/runself.cpp, src/runquery.cpp): pair enumeration,
E-value acceptance, dual-orientation output rows.  The batched TPU engine
(reseek_tpu/search/engine_jax.py) produces the same hits from padded
length-bucketed batches.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Iterable, List, Optional, TextIO

from reseek_tpu.align.output import format_row
from reseek_tpu.align.pipeline import (AlignResult, EncodedChain, PairAligner,
                                       encode_for_search)
from reseek_tpu.chain import Chain
from reseek_tpu.constants import DSSParams


@dataclasses.dataclass
class SearchOptions:
    columns: List[str]
    max_evalue: float = 10.0     # DBSearcher::m_MaxEvalue default
    no_self: bool = False
    mode: str = "sensitive"
    global_aln: bool = False     # -global (src/runself.cpp:48-56)
    scores_are_not_evalues: bool = False  # disable the E-value gate
                                          # (src/dbsearcher.cpp:260)


class SearchDriver:
    def __init__(self, params: DSSParams, options: SearchOptions,
                 out: TextIO = sys.stdout):
        self.params = params
        self.options = options
        self.out = out
        self.aligner = PairAligner(params)
        self.hit_count = 0

    def _reject(self, res: AlignResult) -> bool:
        if self.options.scores_are_not_evalues:
            return False
        return res.evalue > self.options.max_evalue

    def emit(self, res: AlignResult, q: EncodedChain, t: EncodedChain,
             up: bool) -> None:
        if self._reject(res):
            return
        if self.options.no_self and q.label == t.label:
            return
        self.hit_count += 1
        self.out.write(format_row(self.options.columns, res, q, t, up))
        self.out.write("\n")

    def align_and_emit(self, q: EncodedChain, t: EncodedChain,
                      both_orientations: bool = True) -> Optional[AlignResult]:
        res = self.aligner.align(q, t)
        if res is None or not res.path:
            return res
        self.emit(res, q, t, True)
        if both_orientations:
            self.emit(res, q, t, False)
        return res


def _tpu_available() -> bool:
    try:
        import jax
        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False


def self_search(chains: List[Chain], params: DSSParams,
                options: SearchOptions, out: TextIO,
                engine: str = "auto", mesh=None) -> SearchDriver:
    """All-vs-all (src/runself.cpp): pairs (i, j >= i), self pair emitted
    once, other pairs in both orientations.

    engine: "auto" uses the batched device engine when a TPU is attached,
    "device" forces it, "host" runs the per-pair numpy path.
    mesh: optional jax.sharding.Mesh; stage-1 pair blocks and survivor
    alignment batches are sharded over its devices (SURVEY §2.8 items
    1-3), with bit-identical results to single-device."""
    if engine == "auto":
        engine = "device" if (_tpu_available() or mesh is not None) \
            else "host"
    if options.global_aln:
        return _self_search_global(chains, params, options, out)
    if engine == "device":
        return _self_search_device(chains, params, options, out, mesh=mesh)
    ecs = [encode_for_search(c, params, with_self_rev=True)
           for c in chains]
    drv = SearchDriver(params, options, out)
    n = len(ecs)
    for i in range(n):
        for j in range(i, n):
            if options.no_self and i == j:
                continue
            drv.align_and_emit(ecs[i], ecs[j], both_orientations=(i != j))
    return drv


def _self_search_global(chains: List[Chain], params: DSSParams,
                        options: SearchOptions, out: TextIO) -> SearchDriver:
    """-global all-vs-all (src/runself.cpp:48-56 +
    AlignQueryTarget_Global, src/global.cpp:7-33): Mu filter, then global
    Viterbi with free terminal gaps; no E-value is computed, so rows are
    only emitted with scores_are_not_evalues."""
    from reseek_tpu.ops.nw import nw_align
    from reseek_tpu.ops.substmx import build_smx
    ecs = [encode_for_search(c, params, with_self_rev=False)
           for c in chains]
    drv = SearchDriver(params, options, out)
    n = len(ecs)
    for i in range(n):
        for j in range(i, n):
            if options.no_self and i == j:
                continue
            q, t = ecs[i], ecs[j]
            if params.omega > 0 and not drv.aligner.mu_filter(q, t):
                continue
            smx = build_smx(params, q.profile, t.profile)
            score, path = nw_align(smx)
            if not path:
                continue
            res = AlignResult(query=q.label, target=t.label,
                              fwd_score=0.0, lo_a=0, lo_b=0, path=path,
                              global_score=score)
            n_m = path.count("M")
            res.hi_a = res.lo_a + n_m + path.count("D") - 1
            res.hi_b = res.lo_b + n_m + path.count("I") - 1
            res.ids = n_m
            res.gaps = len(path) - n_m
            drv.emit(res, q, t, True)
            if i != j:
                drv.emit(res, q, t, False)
    return drv


def _self_search_device(chains: List[Chain], params: DSSParams,
                        options: SearchOptions, out: TextIO,
                        mesh=None) -> SearchDriver:
    """Batched all-vs-all on the sorted-DB rectangular device pipeline
    (engine.DeviceSelfSearch); long-chain (MKF-routed) pairs run on the
    host path for reference parity."""
    import numpy as np
    from reseek_tpu.search.engine import DeviceSelfSearch, configure_jax
    configure_jax()
    ecs = [encode_for_search(c, params, with_self_rev=False) for c in chains]
    pipe = DeviceSelfSearch(ecs, params, with_rev_profiles=True, mesh=mesh)
    # self-rev: device for short chains, host MKF quirk path for long ones
    srs = pipe.self_rev_scores_device()
    from reseek_tpu.align.pipeline import self_rev_score
    for ec, s in zip(ecs, srs):
        ec.self_rev_score = (self_rev_score(ec, params)
                             if len(ec) >= params.mkfl else float(s))

    drv = SearchDriver(params, options, out)
    survivors = pipe.stage1_survivors()
    by_pair = pipe.align_survivors(survivors)
    # pairs with max length >= mkfl were excluded from the device path;
    # align them on the host (PairAligner routes MKF vs full SW itself)
    n = len(ecs)
    lens = np.array([len(ec) for ec in ecs])
    long_set = np.flatnonzero(lens >= params.mkfl)
    seen = set()
    for j in long_set:
        for i in range(n):
            a, b = (i, int(j)) if i <= j else (int(j), i)
            if (a, b) in seen:
                continue
            seen.add((a, b))
            res = drv.aligner.align(ecs[a], ecs[b])
            if res is not None and res.path:
                by_pair[(a, b)] = res
    # the muscore column is not produced by the bitmask stage-1; backfill
    # it for emitted pairs from the host filter (same saturation rules)
    if "muscore" in options.columns:
        for (i, j), res in by_pair.items():
            if res.mu_score == 0.0 and not (lens[i] >= params.mkfl
                                            or lens[j] >= params.mkfl):
                res.mu_score = drv.aligner.mu_filter_score(ecs[i], ecs[j])
    # emit in the reference's single-thread order: (i, j >= i) ascending,
    # Up row then Down row (src/runself.cpp:53-66)
    for (i, j) in sorted(by_pair):
        if options.no_self and i == j:
            continue
        res = by_pair[(i, j)]
        q, t = ecs[i], ecs[j]
        drv.emit(res, q, t, True)
        if i != j:
            drv.emit(res, q, t, False)
    return drv


def query_search(queries: Iterable[Chain], db_chains: List[Chain],
                 params: DSSParams, options: SearchOptions,
                 out: TextIO) -> SearchDriver:
    """Query-vs-DB in-memory scan (src/runquery.cpp, note the role
    inversion: each streamed chain becomes the 'A' side, the loaded set is
    scanned as targets, output orientation flipped back)."""
    db_ecs = [encode_for_search(c, params) for c in db_chains]
    drv = SearchDriver(params, options, out)
    for qc in queries:
        q = encode_for_search(qc, params)
        for t in db_ecs:
            res = drv.aligner.align(q, t)
            if res is None or not res.path:
                continue
            drv.emit(res, q, t, True)
    return drv


def fast_search(queries: List[Chain], db_chains: List[Chain],
                params: DSSParams, options: SearchOptions,
                out: TextIO) -> SearchDriver:
    """Big-DB prefilter pipeline (-fast -db, src/search.cpp:62-112):
    (1) Mu k-mer two-hit prefilter keeps top-1500 targets per query,
    (2) survivors are aligned with SENSITIVE parameters
    (PostMuFilter, src/postmufilter.cpp:211; one output row per hit)."""
    from reseek_tpu.constants import DSSParams as _P
    from reseek_tpu.encoder.dss import encode_chain
    from reseek_tpu.search.prefilter import prefilter_search

    q_mu = [encode_chain(c).mu_letters for c in queries]
    pf = prefilter_search(
        q_mu, ((i, encode_chain(c).mu_letters)
               for i, c in enumerate(db_chains)))

    sens = _P.create("sensitive")
    q_ecs = [encode_for_search(c, sens) for c in queries]
    drv = SearchDriver(sens, options, out)
    t2q = pf.target_to_queries()
    for tidx in sorted(t2q):
        t_ec = encode_for_search(db_chains[tidx], sens)
        for qi in t2q[tidx]:
            res = drv.aligner.align(q_ecs[qi], t_ec)
            if res is None or not res.path:
                continue
            drv.emit(res, q_ecs[qi], t_ec, True)
    return drv
