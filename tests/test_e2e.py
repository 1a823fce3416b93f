"""End-to-end golden gate: full pipeline on the bundled example produces
bit-identical artifacts vs the reference pipeline (FASTQ invocation,
reference: trust-example-test.sh, README.md:192).  Note the reference's
report line order is nondeterministic (Perl hash randomization), so the
report gate is on sorted content — the same gate the reference uses."""

import os

import pytest

from trust4_tpu.pipeline.run import run_trust4

GOLDEN = os.path.join(os.path.dirname(__file__), "data")
EXAMPLE = "/root/reference/example"


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    prefix = str(tmp_path / "ex")
    run_trust4(
        "/root/reference/hg38_bcrtcr.fa",
        "/root/reference/human_IMGT+C.fa",
        read1_files=[os.path.join(EXAMPLE, "example_1.fq")],
        read2_files=[os.path.join(EXAMPLE, "example_2.fq")],
        output_prefix=prefix,
    )
    for name, golden in [
        ("_final.out", "gold_final.out"),
        ("_annot.fa", "gold_annot.fa"),
        ("_cdr3.out", "gold_cdr3.out"),
    ]:
        assert (
            open(prefix + name).read()
            == open(os.path.join(GOLDEN, golden)).read()
        ), name
    report = sorted(open(prefix + "_report.tsv").read().splitlines())
    gold_report = sorted(
        open(os.path.join(GOLDEN, "gold_report.tsv")).read().splitlines()
    )
    assert report == gold_report
