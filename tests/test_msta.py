"""msta-score / msta-scores parity: goldens generated with the reference
binary (-msta_score / -msta_scores) on a 3-row MSA of coordinate+sequence
perturbed replicas of a q100 chain (fixture msta.afa / msta_set.cal)."""

import os

from conftest import GOLDEN


def test_msta_score_golden(tmp_path):
    from reseek_tpu.cli import main
    out = tmp_path / "m.tsv"
    rc = main(["msta-score", os.path.join(GOLDEN, "msta.afa"),
               "--input", os.path.join(GOLDEN, "msta_set.cal"),
               "--output", str(out)])
    assert rc == 0
    with open(os.path.join(GOLDEN, "msta_score.tsv")) as f:
        assert out.read_text() == f.read()


def test_msta_scores_golden(tmp_path):
    from reseek_tpu.cli import main
    testdir = tmp_path / "aln"
    testdir.mkdir()
    import shutil
    shutil.copy(os.path.join(GOLDEN, "msta.afa"), testdir / "fam1")
    accs = tmp_path / "accs.txt"
    accs.write_text("fam1\nmissing_fam\n")
    out = tmp_path / "m.tsv"
    rc = main(["msta-scores", str(accs),
               "--input", os.path.join(GOLDEN, "msta_set.cal"),
               "--testdir", str(testdir),
               "--output", str(out)])
    assert rc == 0
    with open(os.path.join(GOLDEN, "msta_scores.tsv")) as f:
        golden = f.read()
    # the golden's absolute paths differ; compare after path
    # normalization
    mine = out.read_text().replace(str(testdir) + "/", "DIR/")
    golden = golden.replace("/tmp/msta_dir/", "DIR/")
    assert mine == golden
