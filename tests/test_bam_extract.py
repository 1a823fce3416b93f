"""BAM extractor parity: byte-identical *_toassemble FASTQs on example.bam
(reference: BamExtractor.cpp; pure-Python BGZF/BAM reader in io/bam.py)."""

import os

import pytest

from trust4_tpu.pipeline.bam_extract import run_bam_extractor

GOLDEN = os.path.join(os.path.dirname(__file__), "data")


def test_bam_extractor_parity(tmp_path):
    prefix = str(tmp_path / "ex_toassemble")
    run_bam_extractor(
        "/root/reference/hg38_bcrtcr.fa",
        "/root/reference/example/example.bam",
        prefix,
    )
    # The BAM path must produce the same candidate set as the reference's
    # bam-extractor; goldens captured from the reference binary.
    for s in ("_1.fq", "_2.fq"):
        got = open(prefix + s).read()
        gold = open(os.path.join(GOLDEN, "gold_bam_toassemble" + s)).read()
        assert got == gold
