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
