"""scop40bit ecosystem: binary .bit hit dumps (reference WriteBit format,
src/scop40bench.cpp:543-585).  The golden sepq_hits.bit was written by the
reference binary's -scop40bit from this exact hit list; our writer must
reproduce it byte-for-byte, and the round trip + ROC must match the
pinned SEPQ values."""

import io
import os
from contextlib import redirect_stderr, redirect_stdout

from conftest import GOLDEN


def _hits(tmp_path):
    from reseek_tpu.align.output import parse_columns
    from reseek_tpu.constants import DSSParams
    from reseek_tpu.io.cal import read_cal
    from reseek_tpu.search.driver import SearchOptions, self_search
    chains = read_cal(os.path.join(GOLDEN, "sepq_set.cal"))
    params = DSSParams.create("sensitive")
    opts = SearchOptions(columns=parse_columns("query+target+evalue"),
                         max_evalue=10.0, mode="sensitive")
    buf = io.StringIO()
    self_search(chains, params, opts, buf, engine="host")
    p = tmp_path / "hits.tsv"
    p.write_text(buf.getvalue())
    return str(p)


def test_scop40bit_roundtrip(tmp_path):
    from reseek_tpu.cli import main
    hits = _hits(tmp_path)
    lookup = os.path.join(GOLDEN, "sepq_set.lookup")
    bit = tmp_path / "h.bit"
    with redirect_stderr(io.StringIO()):
        assert main(["scop40bit", hits, "--lookup", lookup,
                     "--output", str(bit)]) == 0
    with open(os.path.join(GOLDEN, "sepq_hits.bit"), "rb") as f:
        assert bit.read_bytes() == f.read()

    tsv = tmp_path / "h.tsv"
    with redirect_stderr(io.StringIO()):
        assert main(["scop40bit2tsv", str(bit), "--lookup", lookup,
                     "--output", str(tsv)]) == 0
    first = tsv.read_text().splitlines()[0].split("\t")
    assert "/" in first[0]  # dom/SF labels like the reference

    out = io.StringIO()
    with redirect_stdout(out):
        assert main(["scop40bit-roc", str(bit),
                     "--lookup", lookup]) == 0
    assert "SEPQ0.1=0.3831" in out.getvalue()

    out2 = io.StringIO()
    with redirect_stdout(out2):
        assert main(["scop40bench-tsv", hits, "--lookup", lookup]) == 0
    assert out2.getvalue() == out.getvalue()
