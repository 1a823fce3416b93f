"""Differential tests: InputRefFa vs reference SeqSet golden dumps.

Goldens were produced by the reference InputRefFa (SeqSet.hpp:2673-2984) on
the bundled human coordinate FASTA, human IMGT FASTA, and the mouse IMGT
FASTA with --imgtAdditionalGap TRAV:7,83 (exercising the extra-gap shifts).
Each row: name, degapped consensus, CDR1 a,b, CDR2 a,b, CDR3 a,b.
"""

import os

import pytest

from trust4_tpu.engine.seqset import SeqSet, get_gene_type

DATA = os.path.join(os.path.dirname(__file__), "data")


def _load_golden(path):
    rows = []
    with open(path) as f:
        for line in f:
            p = line.rstrip("\n").split("\t")
            rows.append((p[0], p[1], [int(x) for x in p[2:8]]))
    return rows


def _check(fasta, golden_file, is_imgt, gap=None):
    ss = SeqSet(9)
    ss.input_ref_fa(fasta, is_imgt=is_imgt, imgt_additional_gap=gap)
    golden = _load_golden(os.path.join(DATA, golden_file))
    assert len(ss.seqs) == len(golden)
    for sw, (name, cons, info) in zip(ss.seqs, golden):
        assert sw.name == name
        assert sw.consensus == cons, name
        got = [
            sw.info[0][0],
            sw.info[0][1],
            sw.info[1][0],
            sw.info[1][1],
            sw.info[2][0],
            sw.info[2][1],
        ]
        if is_imgt and get_gene_type(name.split("|")[0]) == 2:
            # The reference leaves info[0..1] uninitialized for J genes
            # (only the CDR3 anchor is set, SeqSet.hpp:2836-2860); the golden
            # dump therefore holds garbage there.  Compare info[2] only.
            assert got[4:] == info[4:], (name, got, info)
        else:
            assert got == info, (name, got, info)


def test_human_imgt_loader(reference_dir):
    _check(
        os.path.join(reference_dir, "human_IMGT+C.fa"),
        "imgt_ref_golden.tsv",
        is_imgt=True,
    )


def test_human_bcrtcr_loader(reference_dir):
    _check(
        os.path.join(reference_dir, "hg38_bcrtcr.fa"),
        "bcrtcr_ref_golden.tsv",
        is_imgt=False,
    )


def test_mouse_imgt_loader_with_additional_gap(reference_dir):
    path = os.path.join(reference_dir, "mouse", "mouse_IMGT+C.fa")
    if not os.path.exists(path):
        pytest.skip("mouse reference not present")
    _check(path, "mouse_imgt_golden.tsv", is_imgt=True, gap="TRAV:7,83")
