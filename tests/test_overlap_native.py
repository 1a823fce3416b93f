"""Native overlap engine differential gate: run the example assembly with
TRUST4_TPU_OVERLAP_CHECK=1 so every query executes both the C++ and host
paths and asserts identical overlap lists (incl. hit coordinates)."""

import os

import pytest

from trust4_tpu.engine import overlap_native

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.mark.skipif(
    not overlap_native.available(), reason="native overlap engine unavailable"
)
def test_example_assembly_differential(tmp_path, monkeypatch):
    monkeypatch.setenv("TRUST4_TPU_OVERLAP_CHECK", "1")
    from trust4_tpu.pipeline.assembler import Assembler

    out = str(tmp_path / "chk")
    a = Assembler(ref_fa="/root/reference/hg38_bcrtcr.fa", output_prefix=out)
    a.run(
        [os.path.join(DATA, "gold_toassemble_1.fq")],
        [os.path.join(DATA, "gold_toassemble_2.fq")],
    )
    got = open(out + "_final.out").read()
    want = open(os.path.join(DATA, "gold_final.out")).read()
    assert got == want
