"""SMART-seq per-cell driver golden test (reference: trust-smartseq.pl).

The reference's own report row order is nondeterministic (Perl hash
iteration inside run-trust4's reporters), so the gate is sorted-line
equality — the same gate the reference's example test uses.
"""

import os

from trust4_tpu.pipeline.smartseq import run_smartseq

DATA = os.path.join(os.path.dirname(__file__), "data", "smartseq")


def test_smartseq_two_cells(tmp_path):
    list1 = tmp_path / "list1.txt"
    list2 = tmp_path / "list2.txt"
    list1.write_text(
        os.path.join(DATA, "cell1_1.fq") + "\n"
        + os.path.join(DATA, "cell2_1.fq") + "\n"
    )
    list2.write_text(
        os.path.join(DATA, "cell1_2.fq") + "\n"
        + os.path.join(DATA, "cell2_2.fq") + "\n"
    )
    prefix = str(tmp_path / "ss")
    run_smartseq(
        "/root/reference/hg38_bcrtcr.fa",
        "/root/reference/human_IMGT+C.fa",
        str(list1),
        str(list2),
        output_prefix=prefix,
        tmp_dir=str(tmp_path),
    )
    for suffix, gold in (
        ("_report.tsv", "gold_report_sorted.tsv"),
        ("_annot.fa", "gold_annot_sorted.txt"),
        ("_airr.tsv", "gold_airr_sorted.tsv"),
    ):
        got = sorted(open(prefix + suffix).read().splitlines())
        want = open(os.path.join(DATA, gold)).read().splitlines()
        assert got == want, suffix
