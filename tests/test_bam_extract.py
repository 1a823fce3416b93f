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


def test_native_bam_reader_parity():
    """Native BAM scanner fields match the pure-Python reader record for
    record (flags, coords, oriented seq/qual, CIGAR segments)."""
    from trust4_tpu.io import bam_native
    from trust4_tpu.io.bam import BamReader

    if not bam_native.available():
        import pytest

        pytest.skip("native BAM scanner unavailable")
    a = BamReader("/root/reference/example/example.bam")
    b = bam_native.NativeBamReader("/root/reference/example/example.bam")
    assert a.chrom_names == b.chrom_names
    assert a.header_text == b.header_text
    n = 0
    for ra, rb in zip(a, b):
        assert (
            ra.name, ra.flag, ra.tid, ra.pos, ra.mtid, ra.mpos, ra.tlen,
        ) == (rb.name, rb.flag, rb.tid, rb.pos, rb.mtid, rb.mpos, rb.tlen)
        assert ra.read_seq() == rb.read_seq()
        assert ra.qual() == rb.qual()
        assert ra.ref_segments() == rb.ref_segments()
        n += 1
    assert n == 908


def test_barcoded_bam_pipeline(tmp_path):
    """BAM input with --barcode CB --UMI UB aux tags: extraction and the
    barcoded assembly/annotation chain match the reference goldens."""
    import os

    from trust4_tpu.pipeline.run import run_trust4

    data = os.path.join(os.path.dirname(__file__), "data", "bambc")
    prefix = str(tmp_path / "bb")
    run_trust4(
        "/root/reference/hg38_bcrtcr.fa",
        "/root/reference/human_IMGT+C.fa",
        bam_file=os.path.join(data, "bc.bam"),
        output_prefix=prefix,
        bam_barcode_field="CB",
        bam_umi_field="UB",
    )
    for suffix, gold in (
        ("_toassemble_bc.fa", "gold_bc.fa"),
        ("_toassemble_umi.fa", "gold_umi.fa"),
        ("_toassemble_1.fq", "gold_1.fq"),
        ("_final.out", "gold_final.out"),
        ("_cdr3.out", "gold_cdr3.out"),
    ):
        got = open(prefix + suffix).read()
        want = open(os.path.join(data, gold)).read()
        assert got == want, suffix
