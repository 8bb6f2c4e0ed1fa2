"""SEPQ on real hits: the SCOP40-style evaluator measured on real
structures (q100 + palms, 139 chains) with reference-derived homology
labels, cross-checked against the reference binary's -scop40bench output
on the identical relabeled set:

  reference: SEPQ0.1=0.3831 SEPQ1=0.6057 SEPQ10=0.6405 (sensitive)

(The SCOP40 structure set itself is not available locally — only
scop40.mu.fa — so BASELINE.md's SCOP40 floors cannot be measured here;
this exercises the same evaluator end-to-end on real alignments and
pins it to the reference's numbers.  See tools/make_sepq_set.py-style
construction in the git history: clusters = connected components of
reference self-search hits at E <= 1e-10, palms as one family.)
"""

import io
import os

from conftest import GOLDEN


import pytest


@pytest.mark.parametrize("engine", ["host", "device"])
def test_sepq_real_hits_matches_reference(engine):
    """Both engines (host per-pair path; batched device engine on the
    CPU backend) reproduce the reference SEPQs."""
    from reseek_tpu.align.output import parse_columns
    from reseek_tpu.benchmarks.scop40 import Scop40Eval, read_dom_scopid
    from reseek_tpu.constants import DSSParams
    from reseek_tpu.io.cal import read_cal
    from reseek_tpu.search.driver import SearchOptions, self_search

    chains = read_cal(os.path.join(GOLDEN, "sepq_set.cal"))
    assert len(chains) == 139
    params = DSSParams.create("sensitive")
    options = SearchOptions(columns=parse_columns("query+target+evalue"),
                            max_evalue=10.0, mode="sensitive")
    buf = io.StringIO()
    self_search(chains, params, options, buf, engine=engine)
    ev = Scop40Eval(read_dom_scopid(os.path.join(GOLDEN,
                                                 "sepq_set.lookup")))

    def gen():
        buf.seek(0)
        for line in buf:
            q, t, e = line.rstrip("\n").split("\t")
            yield q, t, float(e)

    res = ev.evaluate(gen())
    assert abs(res.sepq0_1 - 0.3831) < 5e-4
    assert abs(res.sepq1 - 0.6057) < 5e-4
    assert abs(res.sepq10 - 0.6405) < 5e-4
