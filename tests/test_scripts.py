"""Post-analysis script parity (reference: scripts/*, L8) against outputs
captured from the reference Perl/Python scripts on the example pipeline."""

import io
import os

from trust4_tpu.scripts.stats import trust_stats
from trust4_tpu.scripts.cluster import trust_cluster
from trust4_tpu.scripts.barcode_utils import (
    add_sequence_to_cdr3_file,
    get_full_length_assembly,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "data")


def test_stats_runs():
    buf = io.StringIO()
    trust_stats(os.path.join(GOLDEN, "gold_report.tsv"), out=buf)
    lines = buf.getvalue().splitlines()
    assert lines[0].startswith("#chain")
    assert len(lines) == 17
    # IGH row aggregates all isotypes
    igh = lines[1].split("\t")
    assert igh[0] == "IGH" and int(igh[1]) > 0


def test_cluster_runs():
    buf = io.StringIO()
    trust_cluster(os.path.join(GOLDEN, "gold_cdr3.out"), out=buf)
    lines = buf.getvalue().splitlines()
    assert lines
    assert all(l.split("\t")[0].startswith("cluster_") for l in lines)


def test_add_seq_substitutes_cdr3():
    buf = io.StringIO()
    add_sequence_to_cdr3_file(
        os.path.join(GOLDEN, "gold_cdr3.out"),
        os.path.join(GOLDEN, "gold_annot.fa"),
        out=buf,
    )
    for line in buf.getvalue().splitlines():
        cols = line.split("\t")
        assert cols[8] in cols[-1]
