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


class SearchDriver:
    def __init__(self, params: DSSParams, options: SearchOptions,
                 out: TextIO = sys.stdout):
        self.params = params
        self.options = options
        self.out = out
        self.aligner = PairAligner(params)
        self.hit_count = 0

    def _reject(self, res: AlignResult) -> bool:
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
                engine: str = "auto") -> SearchDriver:
    """All-vs-all (src/runself.cpp): pairs (i, j >= i), self pair emitted
    once, other pairs in both orientations.

    engine: "auto" uses the batched device engine when a TPU is attached,
    "device" forces it, "host" runs the per-pair numpy path."""
    if engine == "auto":
        engine = "device" if _tpu_available() else "host"
    if engine == "device":
        return _self_search_device(chains, params, options, out)
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


def _self_search_device(chains: List[Chain], params: DSSParams,
                        options: SearchOptions, out: TextIO) -> SearchDriver:
    """Batched all-vs-all on the device engine; long-chain (MKF) pairs run
    on the host path for reference parity."""
    import numpy as np
    from reseek_tpu.align.mkf import should_use_mkf
    from reseek_tpu.search.engine import (BatchedEngine, DeviceDB,
                                          batched_self_search, configure_jax)
    configure_jax()
    ecs = [encode_for_search(c, params, with_self_rev=False) for c in chains]
    db = DeviceDB(ecs, params, with_rev_profiles=True)
    eng = BatchedEngine(db)
    # self-rev: device for short chains, host MKF quirk path for long ones
    srs = eng.self_rev_scores()
    from reseek_tpu.align.pipeline import self_rev_score
    for ec, s in zip(ecs, srs):
        ec.self_rev_score = (self_rev_score(ec, params)
                             if len(ec) >= params.mkfl else float(s))
    drv = SearchDriver(params, options, out)
    mkf_pairs = []
    kept_pairs = []
    results = batched_self_search(
        ecs, params, max_evalue=options.max_evalue, db=db,
        skip_pair=lambda i, j: should_use_mkf(ecs[i], ecs[j], params)
        or (options.no_self and i == j),
        skipped=mkf_pairs, kept_pairs=kept_pairs)
    by_pair = {tuple(pr): r for pr, r in zip(kept_pairs, results)}
    for i, j in mkf_pairs:
        if options.no_self and i == j:
            continue
        res = drv.aligner.align(ecs[i], ecs[j])
        if res is not None and res.path:
            by_pair[(i, j)] = res
    # emit in the reference's single-thread order: (i, j >= i) ascending,
    # Up row then Down row (src/runself.cpp:53-66)
    for (i, j) in sorted(by_pair):
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
