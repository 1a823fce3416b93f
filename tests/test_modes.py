"""Mode coverage: --repseq (trimLevel 2) and long-read assembly paths are
byte-identical to the reference binaries (goldens captured from the
reference; reference: main.cpp:1224-1235 pseudo-barcoding,
main.cpp:1467-1481 long-read gating)."""

import os

import pytest

from trust4_tpu.pipeline.assembler import Assembler
from trust4_tpu.pipeline.extract import run_extractor

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "modes")


@pytest.mark.slow
def test_repseq_mode(tmp_path):
    run_extractor(
        "/root/reference/hg38_bcrtcr.fa",
        [os.path.join(GOLDEN, "repseq.fq")],
        None,
        str(tmp_path / "toassemble"),
    )
    asm = Assembler(
        "/root/reference/hg38_bcrtcr.fa",
        output_prefix=str(tmp_path / "rs"),
        trim_level=2,
        skip_mate_extension=True,
    )
    asm.run([str(tmp_path / "toassemble.fq")])
    assert (
        (tmp_path / "rs_final.out").read_text()
        == open(os.path.join(GOLDEN, "gold_repseq_final.out")).read()
    )


@pytest.mark.slow
def test_longread_mode(tmp_path):
    run_extractor(
        "/root/reference/hg38_bcrtcr.fa",
        [os.path.join(GOLDEN, "longreads.fq")],
        None,
        str(tmp_path / "toassemble"),
    )
    asm = Assembler(
        "/root/reference/hg38_bcrtcr.fa",
        output_prefix=str(tmp_path / "lr"),
    )
    asm.run([str(tmp_path / "toassemble.fq")])
    assert (
        (tmp_path / "lr_final.out").read_text()
        == open(os.path.join(GOLDEN, "gold_longread_final.out")).read()
    )


def test_skip_read_realign_mode(tmp_path):
    """--skipReadRealign: CDR3s from consensus coverage (run-trust4:521-524)."""
    from trust4_tpu.pipeline.run import run_trust4

    prefix = str(tmp_path / "skip")
    run_trust4(
        "/root/reference/hg38_bcrtcr.fa",
        "/root/reference/human_IMGT+C.fa",
        read1_files=["/root/reference/example/example_1.fq"],
        read2_files=["/root/reference/example/example_2.fq"],
        output_prefix=prefix,
        skip_read_realign=True,
    )
    got = open(prefix + "_cdr3.out").read()
    want = open(os.path.join(GOLDEN, "skiprealign_cdr3.out")).read()
    assert got == want


def test_jellyfish_count_file(tmp_path):
    """-c: pre-computed k-mer counts replace the counting pass."""
    from trust4_tpu.pipeline.assembler import Assembler

    prefix = str(tmp_path / "jf")
    asm = Assembler(
        "/root/reference/hg38_bcrtcr.fa",
        output_prefix=prefix,
        kmer_count_file=os.path.join(GOLDEN, "jellyfish_counts.fa"),
    )
    asm.run(
        [os.path.join(GOLDEN, "..", "gold_toassemble_1.fq")],
        [os.path.join(GOLDEN, "..", "gold_toassemble_2.fq")],
    )
    got = open(prefix + "_final.out").read()
    want = open(os.path.join(GOLDEN, "jellyfish_final.out")).read()
    assert got == want


def test_not_imgt_annotation(tmp_path):
    """Annotation with a non-IMGT -f reference (annotator --notIMGT)."""
    from trust4_tpu.pipeline.run import run_trust4

    prefix = str(tmp_path / "ni")
    run_trust4(
        "/root/reference/hg38_bcrtcr.fa",
        "/root/reference/hg38_bcrtcr.fa",
        read1_files=["/root/reference/example/example_1.fq"],
        read2_files=["/root/reference/example/example_2.fq"],
        output_prefix=prefix,
        ref_is_imgt=False,
    )
    got = open(prefix + "_annot.fa").read()
    want = open(os.path.join(GOLDEN, "notimgt_annot.fa")).read()
    assert got == want


@pytest.mark.slow
def test_contig_min_cov_release(tmp_path):
    """--contigMinCov drops shallow contigs: the per-barcode release
    during assembly AND the final ReleaseShallowContigs pass before the
    raw output (main.cpp:1951-1954) — the final pass was missing until a
    round-2 at-scale differential caught it (19 vs 99 contigs on this
    corpus)."""
    from trust4_tpu.pipeline.run import run_trust4

    run_trust4(
        "/root/reference/hg38_bcrtcr.fa",
        "/root/reference/human_IMGT+C.fa",
        single_files=[os.path.join(GOLDEN, "mincov_r1.fq")],
        barcode_files=[os.path.join(GOLDEN, "mincov_bc.fq")],
        read_format="bc:0:15",
        contig_min_cov=4,
        output_prefix=str(tmp_path / "mc"),
    )
    assert (
        (tmp_path / "mc_final.out").read_text()
        == open(os.path.join(GOLDEN, "gold_mincov_final.out")).read()
    )
