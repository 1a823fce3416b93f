"""Clonotype report writers: simplerep and AIRR tables.

Python ports of the reference Perl reporters (reference:
trust-simplerep.pl, trust-airr.pl).  The Perl scripts iterate hash keys,
whose order is randomized per process — the reference's own line order for
equal-count clonotypes is nondeterministic, and its test gate diffs sorted
output (trust-example-test.sh:11).  We emit a deterministic order (count
desc, then insertion order) and guarantee sorted-file parity.
"""

from __future__ import annotations

import re
import sys
from typing import Dict, List, Optional, Tuple

from trust4_tpu.dna import dna_to_aa

_PERL_CODON = {}


def _fill() -> None:
    # trust-simplerep.pl's table has no N handling: undefined codons -> '?'.
    bases = "TCAG"
    aas = (
        "SSSSFFLLYY__CC_W"
    )
    # Build from dna_to_aa over pure ACGT codons (identical table).
    for a in "ACGT":
        for b in "ACGT":
            for c in "ACGT":
                _PERL_CODON[a + b + c] = dna_to_aa(a, b, c)


_fill()


def translate_perl(s: str) -> str:
    """Per-codon translation, '?' for non-ACGT codons (trust-simplerep.pl)."""
    out = []
    s = s.upper()
    for i in range(0, len(s) - len(s) % 3, 3):
        out.append(_PERL_CODON.get(s[i : i + 3], "?"))
    return "".join(out)


def get_detail_chain_type(*genes) -> Optional[int]:
    for g in genes:
        if g.startswith("IGH"):
            return 0
        if g.startswith("IGK"):
            return 1
        if g.startswith("IGL"):
            return 2
        if g.startswith("TRA"):
            return 3
        if g.startswith("TRB"):
            return 4
        if g.startswith("TRG"):
            return 5
        if g.startswith("TRD"):
            return 6
    return None


def infer_constant_gene(v: str, j: str, c: str) -> str:
    """trust-simplerep.pl:146-186 (InferConstantGene)."""
    ret = c
    if c != ".":
        ret = ret.split("*")[0]
        for g in (v, j):
            if g == ".":
                continue
            if not g.startswith("IGH"):
                ret = ret[:4]
                break
        return ret
    if re.match(r"^TR[AD]", v) or j == ".":
        return ret
    for g in (j, v):
        if g == ".":
            continue
        if g.startswith("IGH"):
            return ret
        return g[:3] + "C"
    return ret


def simple_rep(
    cdr3_path: str,
    out_fp,
    annot_path: Optional[str] = None,
    tcr_error_filter: float = 0.05,
    bcr_error_filter: float = 0.0,
    round_down_count: bool = True,
    report_partial: bool = False,
) -> None:
    """trust-simplerep.pl main flow."""
    junction_info: Dict[str, List] = {}
    if annot_path is not None:
        junction_info = _collect_junction_info(annot_path)

    # Max EM count per assembly.
    assembly_most_reads: Dict[str, float] = {}
    rows = []
    with open(cdr3_path) as fp:
        for line in fp:
            cols = line.split()
            rows.append(cols)
            aid = cols[0]
            cnt = float(cols[10])
            if aid not in assembly_most_reads or cnt > assembly_most_reads[aid]:
                assembly_most_reads[aid] = cnt

    cdr3: Dict[Tuple, List] = {}
    order: Dict[Tuple, int] = {}
    total_cnt: Dict[int, float] = {}
    assembly_full_length: Dict[str, str] = {}
    for cols in rows:
        if not report_partial and float(cols[9]) == 0:
            continue
        aid = cols[0]
        genes = ["." if cols[i] == "*" else cols[i] for i in range(2, 6)]
        vgene = genes[0].split(",")[0]
        dgene = genes[1].split(",")[0]
        jgene = genes[2].split(",")[0]
        cgene = genes[3].split(",")[0]
        cgene = infer_constant_gene(vgene, jgene, cgene)
        key = (vgene, dgene, jgene, cgene, cols[8])
        ctype = get_detail_chain_type(vgene, jgene, cgene)
        cnt = float(cols[10])
        if ctype is not None and ctype > 2:
            if cnt < assembly_most_reads[aid] * tcr_error_filter:
                continue
        else:
            # Perl: undef <= 2 is true, so unknown chains take the BCR
            # branch and count toward type 0.
            if cnt < assembly_most_reads[aid] * bcr_error_filter:
                continue
            if ctype == 2:
                ctype = 1
        if len(cols[8]) >= 180:
            continue

        score = float(cols[9])
        if key in cdr3:
            val = cdr3[key]
            if score > val[0]:
                val[0] = score
            if cnt > val[3]:
                val[2] = aid
                val[3] = cnt
            val[1] += cnt
        else:
            cdr3[key] = [score, cnt, aid, cnt]
            order[key] = len(order)
        eff_type = ctype if ctype is not None else 0
        total_cnt[eff_type] = total_cnt.get(eff_type, 0.0) + cnt
        assembly_full_length[aid] = cols[12]

    out_fp.write("#count\tfrequency\tCDR3nt\tCDR3aa\tV\tD\tJ\tC\tcid\tcid_full_length")
    if annot_path is not None:
        out_fp.write("\tjunction")
    out_fp.write("\n")

    for key in sorted(cdr3, key=lambda k: (-cdr3[k][1], order[k])):
        val = cdr3[key]
        vgene, dgene, jgene, cgene, cdr3nt = key
        if val[0] == 0:
            aa = "partial"
        elif len(cdr3nt) % 3 != 0:
            aa = "out_of_frame"
        else:
            aa = translate_perl(cdr3nt)
        ctype = get_detail_chain_type(vgene, jgene, cgene)
        if ctype == 2:
            ctype = 1
        eff_type = ctype if ctype is not None else 0
        freq = (
            val[1] / total_cnt[eff_type]
            if ctype is not None and total_cnt.get(eff_type)
            else 0
        )
        if round_down_count:
            cnt = int(val[1])
            if cnt == 0:
                continue
            out_fp.write(
                f"{cnt}\t{freq:e}\t{cdr3nt}\t{aa}\t{vgene}\t{dgene}\t{jgene}\t"
                f"{cgene}\t{val[2]}\t{int(assembly_full_length[val[2]])}"
            )
        else:
            out_fp.write(
                f"{val[1]:.2f}\t{freq:e}\t{cdr3nt}\t{aa}\t{vgene}\t{dgene}\t"
                f"{jgene}\t{cgene}\t{val[2]}\t{int(assembly_full_length[val[2]])}"
            )
        if annot_path is not None:
            if val[2] in junction_info:
                out_fp.write("\t" + ",".join(str(x) for x in junction_info[val[2]]))
            else:
                out_fp.write("\t*")
        out_fp.write("\n")


_COORD_RE = re.compile(
    r"\(([0-9]+?)\):\(([0-9]+?)-([0-9]+?)\):\(([0-9]+?)-([0-9]+?)\)"
)


def _collect_junction_info(annot_path: str) -> Dict[str, List]:
    """trust-simplerep.pl:249-335."""
    junction: Dict[str, List] = {}
    with open(annot_path) as fp:
        for line in fp:
            if not line.startswith(">"):
                continue
            cols = line.split()
            m = _COORD_RE.search(cols[3])
            if not m:
                continue
            v = [int(x) for x in m.groups()]
            m = _COORD_RE.search(cols[4])
            d = [int(x) for x in m.groups()] if m else [-1] * 5
            m = _COORD_RE.search(cols[5])
            if not m:
                continue
            j = [int(x) for x in m.groups()]
            if v[2] >= j[1]:
                continue
            if ":0.00" in cols[9]:
                continue
            m = re.search(r"CDR3\(([0-9]+?)-([0-9]+?)\)", cols[9])
            if not m:
                continue
            cdr3 = [int(x) for x in m.groups()]
            if v[2] < cdr3[0] or j[1] > cdr3[1]:
                continue
            chain = cols[3][:3]
            info: List = [v[2] - cdr3[0], v[0] - v[4] - 1]
            if chain in ("IGH", "TRB", "TRD"):
                if d[0] == -1 or d[1] <= v[2] or d[2] >= j[1]:
                    info += ["*"] * 6
                else:
                    info += [
                        d[1] - v[2] - 1,
                        d[3],
                        d[1] - cdr3[0],
                        d[2] - cdr3[0],
                        d[0] - d[4] - 1,
                        j[1] - d[2] - 1,
                    ]
            else:
                info += [j[1] - v[2] - 1, "*", "*", "*", "*", "*"]
            info += [j[3], j[1] - cdr3[0]]
            junction[cols[0][1:]] = info
    return junction


# ----------------------------------------------------------------------
# AIRR rearrangement table (trust-airr.pl)
# ----------------------------------------------------------------------


def _translate_airr(s: str) -> str:
    """trust-airr.pl Translate: '' if frameshift, stop, or ?"""
    if len(s) % 3 != 0:
        return ""
    aa = translate_perl(s)
    if "?" in aa or "_" in aa:
        return ""
    return aa


def get_locus_name(*genes) -> str:
    for g in genes:
        for locus in ("IGH", "IGK", "IGL", "TRA", "TRB", "TRG", "TRD"):
            if g.startswith(locus):
                return locus
    return ""


def _coord_to_cigar(c: List[int]) -> str:
    cigar = ""
    if c[1] > 0:
        cigar = f"{c[1]}S"
    cigar += f"{c[2] - c[1] + 1}M"
    if c[5] - c[2] - 1 > 0:
        cigar += f"{c[5] - c[2] - 1}S"
    return cigar


def airr_report(
    report_path: str,
    annot_path: str,
    out_fp,
    fmt: str = "simplerep",
    airr_align_path: Optional[str] = None,
) -> None:
    """trust-airr.pl main flow."""
    seq_cdr3s: Dict[str, List] = {}
    with open(report_path) as fp:
        for line in fp:
            if fmt == "simplerep":
                if line.startswith("#"):
                    continue
                cols = line.split()
                if cols[3] == "partial":
                    continue
                seq_cdr3s.setdefault(cols[8], []).extend(
                    [cols[2], int(float(cols[0])), "T" if cols[9] == "1" else "F"]
                )
            elif fmt == "cdr3":
                cols = line.split()
                if float(cols[9]) <= 0:
                    continue
                seq_cdr3s.setdefault(cols[0], []).extend(
                    [cols[8], int(float(cols[10])), "T" if cols[12] == "1" else "F"]
                )
            else:
                raise ValueError(f"unsupported format {fmt}")

    seq_airrs: Dict[str, List[str]] = {}
    if airr_align_path:
        with open(airr_align_path) as fp:
            for line in fp:
                cols = line.rstrip("\n").split("\t")
                seq_airrs[cols[0]] = cols[1:]

    out_fp.write(
        "sequence_id\tsequence\trev_comp\tproductive\tlocus\tv_call\td_call\t"
        "j_call\tc_call\tsequence_alignment\tgermline_alignment\tcdr1\tcdr2\t"
        "junction\tjunction_aa\tv_cigar\td_cigar\tj_cigar\tc_cigar\t"
        "v_identity\tj_identity\tcell_id\tcomplete_vdj\tconsensus_count\n"
    )

    with open(annot_path) as fp:
        lines = fp.read().splitlines()
    for li in range(0, len(lines) - 1, 2):
        header = lines[li]
        seq = lines[li + 1]
        cols = header[1:].split()
        seq_id = cols[0]
        if seq_id not in seq_cdr3s:
            continue

        coords = []
        calls = []
        cigars = []
        identities = ["", ""]
        for gi, col_idx in enumerate((3, 4, 5, 6)):
            m = _COORD_RE.search(cols[col_idx])
            if m:
                call = cols[col_idx].split("(")[0]
                coord = [int(x) for x in m.groups()] + [len(seq)]
                cig = _coord_to_cigar(coord) if col_idx != 6 else ""
                if col_idx == 3:
                    identities[0] = cols[col_idx].split(":")[-1]
                if col_idx == 5:
                    identities[1] = cols[col_idx].split(":")[-1]
                calls.append(call)
                coords.append(coord)
                cigars.append(cig)
            else:
                calls.append("")
                coords.append([-1, -1, -1, -1, -1])
                cigars.append("")
        vcall, dcall, jcall, ccall = calls
        vcigar, dcigar, jcigar, _ = cigars
        ccigar = ""
        locus = get_locus_name(ccall, jcall, vcall)

        if ":0.00" in cols[9]:
            continue
        cdr1 = ""
        cdr2 = ""
        m = re.search(r"=(\w+?)$", cols[7])
        if m and m.group(1) != "null":
            cdr1 = m.group(1)
        m = re.search(r"=(\w+?)$", cols[8])
        if m and m.group(1) != "null":
            cdr2 = m.group(1)
        m = re.search(r"CDR3\(([0-9]+?)-([0-9]+?)\)", cols[9])
        if not m:
            continue
        cdr3_coord = [int(x) for x in m.groups()]

        cdr3s = seq_cdr3s[seq_id]
        cell_id = ""

        sequence_alignment = ""
        germline_alignment = ""
        alignment_cdr3_start = alignment_cdr3_end = -1
        if seq_id in seq_airrs:
            a = seq_airrs[seq_id]
            vcigar, dcigar, jcigar, ccigar = a[0], a[1], a[2], a[3]
            sequence_alignment = a[4]
            germline_alignment = a[5]
            alignment_cdr3_start = int(a[6])
            alignment_cdr3_end = int(a[7])
            if alignment_cdr3_start == -1 or alignment_cdr3_end == -1:
                sequence_alignment = ""
                germline_alignment = ""

        for i in range(0, len(cdr3s), 3):
            cdr3_nt = cdr3s[i]
            cdr3_aa = _translate_airr(cdr3_nt)
            productive = "T" if cdr3_aa else "F"
            out_seq = (
                seq[: cdr3_coord[0]] + cdr3_nt + seq[cdr3_coord[1] + 1 :]
            )
            out_sa = sequence_alignment
            out_ga = germline_alignment
            if out_sa:
                sa = list(out_sa)
                ga = list(out_ga)
                j = alignment_cdr3_start
                l = 0
                mm = cdr3_coord[0]
                v_c, d_c, j_c = coords[0], coords[1], coords[2]
                while l < len(cdr3_nt):
                    if ga[j] != "-":
                        outside = not (
                            (v_c[0] >= 0 and v_c[1] <= mm <= v_c[2])
                            or (d_c[0] >= 0 and d_c[1] <= mm <= d_c[2])
                            or (j_c[0] >= 0 and j_c[1] <= mm <= j_c[2])
                        )
                        if outside:
                            ga[j] = cdr3_nt[l]
                    if sa[j] != "-":
                        sa[j] = cdr3_nt[l]
                        l += 1
                        mm += 1
                    j += 1
                out_sa = "".join(sa)
                out_ga = "".join(ga)

            out_seq_id = seq_id
            if fmt in ("cdr3", "simplerep"):
                out_seq_id += f"_{i // 3}"
            out_fp.write(
                "\t".join(
                    [
                        out_seq_id, out_seq, "F", productive, locus,
                        vcall, dcall, jcall, ccall, out_sa, out_ga,
                        cdr1, cdr2, cdr3_nt, cdr3_aa,
                        vcigar, dcigar, jcigar, ccigar,
                        identities[0], identities[1], cell_id,
                        cdr3s[i + 2], str(cdr3s[i + 1]),
                    ]
                )
                + "\n"
            )
