"""End-to-end assembler parity: _raw.out byte-identical to the reference
assembler on the bundled example (golden captured from the reference binary;
reference: main.cpp, trust-example-test.sh)."""

import os
import subprocess

import pytest

from trust4_tpu.pipeline.assembler import Assembler

GOLDEN = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def assembled(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("asm")
    asm = Assembler(
        os.path.join(GOLDEN, "..", "..", ".refbuild", "hg38_bcrtcr.fa")
        if os.path.exists(
            os.path.join(GOLDEN, "..", "..", ".refbuild", "hg38_bcrtcr.fa")
        )
        else "/root/reference/hg38_bcrtcr.fa",
        output_prefix=str(tmp / "t"),
    )
    sr = asm.ingest(
        [os.path.join(GOLDEN, "gold_toassemble_1.fq")],
        [os.path.join(GOLDEN, "gold_toassemble_2.fq")],
    )
    sr = asm.prepare(sr)
    idx = asm.assemble(sr)
    return asm, sr, idx


def test_raw_out_parity(assembled, tmp_path):
    asm, sr, idx = assembled
    out = tmp_path / "raw.out"
    with open(out, "w") as fp:
        asm.output_seqset(asm.seq_set, fp)
    golden = open(os.path.join(GOLDEN, "gold_raw.out")).read()
    assert out.read_text() == golden


def test_assembled_reads_parity(assembled, tmp_path):
    asm, sr, idx = assembled
    out = tmp_path / "reads.fa"
    with open(out, "w") as fp:
        asm.output_assembled_reads(sr, idx, fp)
    golden = open(os.path.join(GOLDEN, "gold_assembled_reads.fa")).read()
    assert out.read_text() == golden


def test_final_out_parity(assembled, tmp_path):
    """Full mate-extension path: _final.out byte-identical (main.cpp:2048-2312,
    SeqSet.hpp:9735-10806)."""
    asm, sr, idx = assembled
    asm.output_prefix = str(tmp_path / "t")
    asm.mate_extension(sr, idx)
    golden = open(os.path.join(GOLDEN, "gold_final.out")).read()
    assert (tmp_path / "t_final.out").read_text() == golden


def test_speculative_rounds_parity(tmp_path, monkeypatch):
    """Round-based speculative assembly (TRUST4_TPU_SPEC=1) produces a
    byte-identical _raw.out: phase A batch-queries are replayed only when
    the mutated-key Bloom + contig-epoch validation proves the serial
    query would return the same overlaps (overlap_engine.cpp SpecState)."""
    monkeypatch.setenv("TRUST4_TPU_SPEC", "1")
    asm = Assembler(
        os.path.join(GOLDEN, "..", "..", ".refbuild", "hg38_bcrtcr.fa")
        if os.path.exists(
            os.path.join(GOLDEN, "..", "..", ".refbuild", "hg38_bcrtcr.fa")
        )
        else "/root/reference/hg38_bcrtcr.fa",
        output_prefix=str(tmp_path / "t"),
    )
    sr = asm.ingest(
        [os.path.join(GOLDEN, "gold_toassemble_1.fq")],
        [os.path.join(GOLDEN, "gold_toassemble_2.fq")],
    )
    sr = asm.prepare(sr)
    asm.assemble(sr)
    spec, replayed, invalid = asm.seq_set.spec_stats()
    assert spec > 0  # the speculative phase actually ran
    out = tmp_path / "raw.out"
    with open(out, "w") as fp:
        asm.output_seqset(asm.seq_set, fp)
    golden = open(os.path.join(GOLDEN, "gold_raw.out")).read()
    assert out.read_text() == golden
