"""Barcode-report utilities: diffusion filtering, secondary-chain expansion,
10X conversion, annotation filtering (reference: scripts/barcoderep-filter.py,
scripts/barcoderep-expand.py, scripts/trust-barcoderep-to-10X.pl,
FilterAnnotatedAssembly.pl, scripts/GetFullLengthAssembly.pl,
scripts/AddSequenceToCDR3File.pl).
"""

from __future__ import annotations

import re
import sys


def barcoderep_filter(
    barcode_report, out=sys.stdout, annot=None, high_abund=50.0,
    diffuse_frac=0.02,
):
    """Cross-cell contamination filter (scripts/barcoderep-filter.py)."""
    barcode_info = {}
    high_abund_cdr3 = {}
    assembly = {}
    with open(barcode_report) as fp:
        for line in fp:
            if line[0] == "#":
                continue
            cols = line.rstrip().split()
            c1 = cols[2].split(",")
            c2 = cols[3].split(",")
            if len(c1) > 1 and float(c1[6]) >= high_abund:
                high_abund_cdr3.setdefault(c1[4], {})[cols[0]] = [0, float(c1[6])]
            if len(c1) > 1:
                assembly[c1[7]] = c1[4]
            if len(c2) > 1 and float(c2[6]) >= high_abund:
                high_abund_cdr3.setdefault(c2[4], {})[cols[0]] = [1, float(c2[6])]
            if len(c2) > 1:
                assembly[c2[7]] = c2[4]
            barcode_info[cols[0]] = {
                "chain1": c1[:],
                "chain2": c2[:],
            }
    if annot is not None:
        with open(annot) as fp:
            lines = fp.read().splitlines()
        for i in range(0, len(lines) - 1, 2):
            aid = lines[i].split()[0][1:]
            if aid in assembly:
                assembly[aid] = lines[i + 1]

    with open(barcode_report) as fp:
        for line in fp:
            if line[0] == "#":
                out.write(line.rstrip() + "\n")
                continue
            cols = line.rstrip().split()
            c1 = cols[2].split(",")
            c2 = cols[3].split(",")
            test_against = {}
            if (
                len(c1) > 1
                and float(c1[6]) < high_abund
                and c1[4] in high_abund_cdr3
            ):
                for bc, (side, abund) in high_abund_cdr3[c1[4]].items():
                    if side == 0 and abund * diffuse_frac > float(c1[6]):
                        test_against[bc] = 1
            if (
                len(c2) > 1
                and float(c2[6]) < high_abund
                and c2[4] in high_abund_cdr3
            ):
                for bc, (side, abund) in high_abund_cdr3[c2[4]].items():
                    if side == 1 and abund * diffuse_frac > float(c2[6]):
                        test_against[bc] = 1
            flag = 0
            for bc in test_against:
                t1 = barcode_info[bc]["chain1"]
                t2 = barcode_info[bc]["chain2"]
                for i, (ca, cb) in enumerate(((c1, t1), (c2, t2)), start=1):
                    if len(ca) > 1 and len(cb) > 1:
                        if (
                            float(cb[6]) * diffuse_frac > float(ca[6])
                            and assembly[ca[7]] in assembly[cb[7]]
                        ):
                            flag |= i
                    elif len(cb) > 1:
                        flag |= i
            if flag != 3:
                out.write(line.rstrip() + "\n")


def _chain_type_10x(v, j, c):
    """trust-barcoderep-to-10X.pl GetDetailChainType: scan (v, j, c) IN
    ORDER and return the first gene whose PREFIX matches a known chain —
    unlike barcoderep-expand.py's GetChainType below, which prefers
    c-then-j-then-v and classifies only that single gene.  The two
    reference scripts genuinely disagree (e.g. TRDV1 + TRAJ56: 10X says
    TRD, expand says TRA)."""
    table = {
        "IGH": 0, "IGK": 1, "IGL": 2, "TRA": 3, "TRB": 4, "TRG": 5,
        "TRD": 6,
    }
    for g in (v, j, c):
        t = table.get(g[:3])
        if t is not None:
            return t
    return 7


def _chain_type_star(v, j, c):
    s = ""
    if c not in ("*", "."):
        s = c
    elif j not in ("*", "."):
        s = j
    elif v not in ("*", "."):
        s = v
    else:
        return 7
    return {
        "IGH": 0, "IGK": 1, "IGL": 2, "TRA": 3, "TRB": 4, "TRG": 5, "TRD": 6,
    }.get(s[:3], 7)


def barcoderep_expand(barcode_report, out=sys.stdout, chain=1, frac=0.1):
    """Expand secondary chains into new barcode entries
    (scripts/barcoderep-expand.py)."""

    def cell_type(v, j, c, default="*"):
        t = _chain_type_star(v, j, c)
        if t <= 2:
            return "B"
        if t <= 4:
            return "abT"
        if t <= 6:
            return "gdT"
        return default

    with open(barcode_report) as fp:
        for line in fp:
            if line[0] == "#":
                out.write(line.rstrip() + "\n")
                continue
            cols = line.rstrip().split()
            barcode = cols[0]
            output_cols = cols[:]
            output_cols[0] = barcode + "_0"
            out.write("\t".join(output_cols) + "\n")
            secondary = cols[3 + chain]
            if cols[1 + chain] == "*" or secondary == "*":
                continue
            primary_abund = float(cols[1 + chain].split(",")[6])
            for i in range(2, len(output_cols)):
                output_cols[i] = "*"
            k = 0
            for c in secondary.split(";"):
                output_cols[0] = f"{barcode}_{k + 1}"
                output_cols[chain + 1] = c
                sub = c.split(",")
                abund = float(sub[6])
                output_cols[1] = cell_type(sub[0], sub[2], sub[3], cols[1])
                if abund < primary_abund * frac:
                    continue
                out.write("\t".join(output_cols) + "\n")
                k += 1


_CHAIN_NAMES = ["IGH", "IGK", "IGL", "TRA", "TRB", "TRG", "TRD", "None"]


def barcoderep_to_10x(barcode_report, out_prefix):
    """Convert a barcode report to 10X contig csv format
    (scripts/trust-barcoderep-to-10X.pl)."""

    def is_productive(aa):
        return not (aa == "partial" or "_" in aa or "?" in aa)

    header = (
        "barcode,is_cell,contig_id,high_confidence,length,chain,v_gene,"
        "d_gene,j_gene,c_gene,full_length,productive,cdr3,cdr3_nt,reads,"
        "umis,raw_clonotype_id,raw_consensus_id\n"
    )
    with open(barcode_report) as fp, open(
        out_prefix + "_t.csv", "w"
    ) as fp_t, open(out_prefix + "_b.csv", "w") as fp_b:
        fp_t.write(header)
        fp_b.write(header)
        fp.readline()
        for line in fp:
            cols = line.split()
            for i in (2, 3):
                if cols[i] == "*":
                    continue
                c = cols[i].split(",")
                row = [
                    cols[0], "True", c[7], "True", "None",
                    _CHAIN_NAMES[_chain_type_10x(c[0], c[2], c[3])],
                    "None" if c[0] == "*" else c[0],
                    "None" if c[1] == "*" else c[1],
                    "None" if c[2] == "*" else c[2],
                    "None" if c[3] == "*" else c[3],
                    "True" if float(c[9]) == 1 else "False",
                    "True" if is_productive(c[5]) else "False",
                    c[5], c[4], c[6], c[6], "None", "None",
                ]
                target = fp_t if cols[1].endswith("T") else fp_b
                target.write(",".join(row) + "\n")


_COORD_RE = re.compile(
    r"\(([0-9]+?)\):\(([0-9]+?)-([0-9]+?)\):\(([0-9]+?)-([0-9]+?)\)"
)


def filter_annotated_assembly(annot_path, out=sys.stdout):
    """FilterAnnotatedAssembly.pl: keep confident/full CDR3 entries."""
    with open(annot_path) as fp:
        lines = fp.read().splitlines()
    for li in range(0, len(lines) - 1, 2):
        header = lines[li]
        seq = lines[li + 1]
        if "null" in header:
            continue
        cols = header.split()
        if "* " in header:
            m = re.search(r"\):(.+?)=", cols[6])
            if not m:
                raise ValueError(f"Wrong format {header}")
            if float(m.group(1)) >= 100:
                out.write(f"{header}\n{seq}\n")
            continue
        mv = _COORD_RE.search(cols[3])
        mj = _COORD_RE.search(cols[4])
        mc = _COORD_RE.search(cols[5])
        if not (mv and mj and mc):
            raise ValueError(f"Wrong format {header}")
        v = [int(x) for x in mv.groups()]
        j = [int(x) for x in mj.groups()]
        c = [int(x) for x in mc.groups()]
        cdr3 = cols[6].split("=")[1]
        if v[2] > j[1] or j[2] > c[1] + 6:
            continue
        if (
            v[4] < v[0] - len(cdr3)
            or j[3] > len(cdr3)
            or j[4] < j[0] - 20
            or c[3] > 20
        ):
            continue
        out.write(f"{header}\n{seq}\n")


def get_full_length_assembly(annot_path, out=sys.stdout):
    """scripts/GetFullLengthAssembly.pl."""
    with open(annot_path) as fp:
        lines = fp.read().splitlines()
    for li in range(0, len(lines) - 1, 2):
        header = lines[li]
        seq = lines[li + 1]
        cols = header.split()
        if cols[3] == "*" or cols[5] == "*" or cols[6] == "*":
            continue
        mv = _COORD_RE.search(cols[3])
        mj = _COORD_RE.search(cols[5])
        mc = _COORD_RE.search(cols[6])
        if not (mv and mj and mc):
            raise ValueError(f"Wrong format {header}")
        v = [int(x) for x in mv.groups()]
        j = [int(x) for x in mj.groups()]
        c = [int(x) for x in mc.groups()]
        if ":0.00" in cols[9]:
            continue
        m = re.search(r"CDR3\(([0-9]+?)-([0-9]+?)\)", cols[9])
        if not m:
            raise ValueError(f"Wrong format {header}")
        cdr3_coord = [int(x) for x in m.groups()]
        if v[2] > j[1] + 3 or j[2] > c[1] + 6:
            continue
        if v[3] >= 10 or v[2] < cdr3_coord[0]:
            continue
        if j[1] > cdr3_coord[1] or j[4] < j[0] - 3:
            continue
        if c[3] > 10:
            continue
        if "N" in seq:
            continue
        out.write(f"{header}\n{seq}\n")


def add_sequence_to_cdr3_file(cdr3_path, annot_path, out=sys.stdout):
    """scripts/AddSequenceToCDR3File.pl: append the consensus (with the
    row's CDR3 substituted in) to each cdr3.out row."""
    cdr3_range = {}
    all_seq = {}
    with open(annot_path) as fp:
        lines = fp.read().splitlines()
    for li in range(0, len(lines) - 1, 2):
        header = lines[li][1:]
        seq = lines[li + 1]
        cols = header.split()
        m = re.search(r"CDR3\(([0-9]+?)-([0-9]+?)\)", cols[9])
        if not m:
            raise ValueError(f"Unknown format {header}")
        cdr3_range[cols[0]] = (int(m.group(1)), int(m.group(2)))
        all_seq[cols[0]] = seq
    with open(cdr3_path) as fp:
        for line in fp:
            cols = line.split()
            cdr3 = cols[8]
            seq_id = cols[0]
            a, b = cdr3_range[seq_id]
            if a == 0 and b == 0:
                cols.append(all_seq[seq_id])
            else:
                s = all_seq[seq_id]
                cols.append(s[:a] + cdr3 + s[b + 1 :])
            out.write("\t".join(cols) + "\n")
