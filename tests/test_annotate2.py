"""Detail-2 annotation parity: V/D/J/C + CDR1/2/3 bit-exact against the
reference AnnotateRead (golden captured from an instrumented reference build;
reference: SeqSet.hpp:6016-8500)."""

import os

import pytest

from trust4_tpu.engine.seqset import SeqSet

GOLDEN = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def imgt_set():
    ss = SeqSet(7)
    ss.input_ref_fa("/root/reference/human_IMGT+C.fa", True)
    ss.set_hit_len_required(17)
    return ss


def test_detail2_parity(imgt_set):
    ss = imgt_set
    reads = [l.strip() for l in open(os.path.join(GOLDEN, "annot2_contigs.txt"))]
    golden = [
        l.rstrip("\n")
        for l in open(os.path.join(GOLDEN, "annot2_contigs_golden.tsv"))
    ]
    for read, gold in zip(reads, golden):
        secondary = []
        ret, go, cdr = ss.annotate_read(read, 2, secondary)
        fields = [f"ret={ret}"]
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


def test_native_annotate2_check_mode(monkeypatch):
    """The native detail-2 batch (native/annotate2.inc) must field-match the
    host oracle on every example contig; TRUST4_TPU_ANN2_CHECK asserts
    per-contig equality inside annotate_all."""
    from trust4_tpu.pipeline.annotator import Annotator

    monkeypatch.setenv("TRUST4_TPU_ANN2_CHECK", "1")
    ann = Annotator("/root/reference/human_IMGT+C.fa")
    ann.load_assembly(os.path.join(GOLDEN, "gold_final.out"))
    ann.annotate_all()  # raises on any native-vs-host divergence
    assert ann.annotations
