"""TCR CDR3 imputation parity (reference: SeqSet.hpp:5478-5903, ImputeCDR3)
against goldens captured from an instrumented reference build on synthetic
TCR contigs with missing/gap-interrupted anchors."""

import os

import pytest

from trust4_tpu.engine.seqset import SeqSet

GOLDEN = os.path.join(os.path.dirname(__file__), "data")


def test_impute_cdr3_parity():
    ss = SeqSet(7)
    ss.input_ref_fa("/root/reference/human_IMGT+C.fa", True)
    ss.set_hit_len_required(17)
    reads = [
        l.strip() for l in open(os.path.join(GOLDEN, "tcr_impute_cases.txt"))
    ]
    golden = [
        l.rstrip("\n")
        for l in open(os.path.join(GOLDEN, "tcr_impute_golden.tsv"))
    ]
    n_imputed = 0
    for read, gold in zip(reads, golden):
        secondary = []
        ret, go, cdr = ss.annotate_read(read, 2, secondary)
        nr = ss.impute_cdr3(read, go, cdr, secondary)
        fields = ["IMPUTED\t" + nr if nr is not None else "NOIMPUTE\t*"]
        if nr is not None:
            n_imputed += 1
        fields.append(f"ret={ret}")
        for i in range(4):
            g = go[i]
            fields.append(
                "*"
                if g.seq_idx == -1
                else f"{ss.seqs[g.seq_idx].name},{g.read_start},{g.read_end},"
                f"{g.seq_start},{g.seq_end},{g.match_cnt},{g.similarity:.6f}"
            )
        for i in range(3):
            c = cdr[i]
            fields.append(
                "*"
                if c.seq_idx == -1
                else f"{c.read_start},{c.read_end},{c.similarity:.6f}"
            )
        fields.append(str(len(secondary)))
        assert "\t".join(fields) == gold
    assert n_imputed > 0
