"""End-to-end extractor parity: byte-identical *_toassemble FASTQs.

Golden files were produced by the reference fastq-extractor on the bundled
example (run-trust4 stage 0).  This exercises the full candidate path:
k-mer probes, skip limits, hit bucketing, LIS chaining, overlap filters.
"""

import filecmp
import os

from trust4_tpu.pipeline.extract import run_extractor

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_extractor_matches_reference(reference_dir, tmp_path):
    p1, p2 = run_extractor(
        os.path.join(reference_dir, "hg38_bcrtcr.fa"),
        os.path.join(reference_dir, "example", "example_1.fq"),
        os.path.join(reference_dir, "example", "example_2.fq"),
        out_prefix=str(tmp_path / "ext"),
    )
    assert filecmp.cmp(p1, os.path.join(DATA, "gold_toassemble_1.fq"), shallow=False)
    assert filecmp.cmp(p2, os.path.join(DATA, "gold_toassemble_2.fq"), shallow=False)
