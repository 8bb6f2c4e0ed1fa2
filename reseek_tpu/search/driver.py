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


def self_search(chains: List[Chain], params: DSSParams,
                options: SearchOptions, out: TextIO) -> SearchDriver:
    """All-vs-all (src/runself.cpp): pairs (i, j >= i), self pair emitted
    once, other pairs in both orientations."""
    with_selfrev = True
    ecs = [encode_for_search(c, params, with_self_rev=with_selfrev)
           for c in chains]
    drv = SearchDriver(params, options, out)
    n = len(ecs)
    for i in range(n):
        for j in range(i, n):
            if options.no_self and i == j:
                continue
            drv.align_and_emit(ecs[i], ecs[j], both_orientations=(i != j))
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
