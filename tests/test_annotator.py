"""Annotator stage parity: _annot.fa and _cdr3.out byte-identical
(reference: Annotator.cpp; goldens from the reference pipeline run)."""

import os

import pytest

from trust4_tpu.pipeline.annotator import Annotator

GOLDEN = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def annotated(tmp_path_factory):
    ann = Annotator("/root/reference/human_IMGT+C.fa")
    ann.load_assembly(os.path.join(GOLDEN, "gold_final.out"))
    ann.annotate_all()
    return ann


def test_annot_fa_parity(annotated, tmp_path):
    out = tmp_path / "annot.fa"
    with open(out, "w") as fp:
        annotated.write_annotation_fasta(fp)
    assert out.read_text() == open(os.path.join(GOLDEN, "gold_annot.fa")).read()


def test_cdr3_out_parity(annotated, tmp_path):
    out = tmp_path / "cdr3.out"
    annotated.realign_and_write_cdr3(
        os.path.join(GOLDEN, "gold_assembled_reads.fa"), str(out)
    )
    assert out.read_text() == open(os.path.join(GOLDEN, "gold_cdr3.out")).read()
