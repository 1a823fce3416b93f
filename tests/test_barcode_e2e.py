"""Single-cell (barcoded) pipeline parity: synthetic 10x-like data built
from the bundled example + random cell barcodes with errors; goldens from
the reference binaries (fastq-extractor --barcode --barcodeWhitelist,
trust4 --barcode, annotator --barcode, trust-barcoderep.pl)."""

import os

import pytest

from trust4_tpu.pipeline.run import run_trust4

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "bc")
EXAMPLE = "/root/reference/example"


@pytest.mark.slow
def test_barcoded_pipeline(tmp_path):
    prefix = str(tmp_path / "bc")
    run_trust4(
        "/root/reference/hg38_bcrtcr.fa",
        "/root/reference/human_IMGT+C.fa",
        read1_files=[os.path.join(EXAMPLE, "example_1.fq")],
        read2_files=[os.path.join(EXAMPLE, "example_2.fq")],
        barcode_files=[os.path.join(GOLDEN, "bc.fq")],
        barcode_whitelist=os.path.join(GOLDEN, "bc_wl.txt"),
        output_prefix=prefix,
    )
    assert (
        open(prefix + "_cdr3.out").read()
        == open(os.path.join(GOLDEN, "gold_cdr3.out")).read()
    )
    for name, golden in [
        ("_barcode_report.tsv", "gold_barcode_report.tsv"),
        ("_report.tsv", "gold_report.tsv"),
        ("_barcode_airr.tsv", "gold_barcode_airr.tsv"),
    ]:
        got = sorted(open(prefix + name).read().splitlines())
        gold = sorted(open(os.path.join(GOLDEN, golden)).read().splitlines())
        assert got == gold, name
