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
    use_barcode_cnt: bool = False,
    filter_barcoderep: Optional[str] = None,
    filter_barcoderep_read_cnt: float = 0.0,
) -> None:
    """trust-simplerep.pl main flow."""
    junction_info: Dict[str, List] = {}
    if annot_path is not None:
        junction_info = _collect_junction_info(annot_path)

    barcode_rep_cdr3 = set()
    if filter_barcoderep:
        # trust-simplerep.pl:356-380: restrict to primary CDR3s from the
        # barcode report.
        with open(filter_barcoderep) as fp:
            for line in fp:
                if line.startswith("#"):
                    continue
                cols = line.split()
                for i in (2, 3):
                    if cols[i] != "*":
                        c2 = cols[i].split(",")
                        if float(c2[6]) < filter_barcoderep_read_cnt:
                            continue
                        t = get_detail_chain_type(c2[0], c2[2], c2[3])
                        barcode_rep_cdr3.add(f"{t}_{c2[4]}_{cols[0]}")

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
    _seen_barcode_cdr3 = set()
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

        if use_barcode_cnt:
            # trust-simplerep.pl:436-456: one count per distinct barcode.
            barcode = aid[: aid.rfind("_")]
            t = get_detail_chain_type(vgene, jgene, cgene)
            tmp = f"{t}_{cols[8]}_{barcode}"
            if filter_barcoderep and tmp not in barcode_rep_cdr3:
                continue
            if tmp in _seen_barcode_cdr3:
                continue
            _seen_barcode_cdr3.add(tmp)
            cnt = 1.0

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
    seq_impute_barcode_list: Dict[str, List[str]] = {}
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
            elif fmt == "barcoderep":
                if line.startswith("#"):
                    continue
                cols = line.split()
                for i in (2, 3):
                    if cols[i] == "*":
                        continue
                    c2 = cols[i].split(",")
                    seq_id = c2[7]
                    if not seq_id.startswith("impute"):
                        seq_cdr3s[seq_id] = [
                            c2[4],
                            int(float(c2[6])),
                            "T" if c2[9] == "1" else "F",
                        ]
                    else:
                        # "impute_from_" is 12 characters.
                        seq_impute_barcode_list.setdefault(
                            seq_id[12:], []
                        ).append(cols[0])
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
        if fmt == "barcoderep":
            cell_id = seq_id[: seq_id.rfind("_")]

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
            if fmt == "barcoderep" and seq_id in seq_impute_barcode_list:
                for imp_cell in seq_impute_barcode_list[seq_id]:
                    out_fp.write(
                        "\t".join(
                            [
                                f"{imp_cell}_impute_from_{seq_id}",
                                out_seq, "F", productive, locus,
                                vcall, dcall, jcall, ccall, out_sa, out_ga,
                                cdr1, cdr2, cdr3_nt, cdr3_aa,
                                vcigar, dcigar, jcigar, ccigar,
                                identities[0], identities[1], imp_cell,
                                cdr3s[i + 2], str(cdr3s[i + 1]),
                            ]
                        )
                        + "\n"
                    )


# ----------------------------------------------------------------------
# Per-cell barcode report (trust-barcoderep.pl)
# ----------------------------------------------------------------------


def _detail_chain_from_gene(g: str) -> int:
    for i, p in enumerate(("IGH", "IGK", "IGL", "TRA", "TRB", "TRG", "TRD")):
        if g.startswith(p):
            return i
    return -1


def _detail_chain_type_vjc(v: str, j: str, c: str) -> int:
    """trust-barcoderep.pl GetDetailChainType: J, C first, then V."""
    for g in (j, c):
        t = _detail_chain_from_gene(g)
        if t != -1:
            return t
    return _detail_chain_from_gene(v)


def _get_cell_type(*genes) -> int:
    for g in genes:
        if g.startswith("IG"):
            return 0
        if g.startswith("TR"):
            return 1
    return -1


def _infer_constant_gene_star(v: str, j: str, c: str) -> str:
    """trust-barcoderep.pl InferConstantGene ('*' sentinel variant)."""
    ret = c
    if c != "*":
        ret = ret.split("*")[0]
        for g in (v, j):
            if g == "*":
                continue
            if not g.startswith("IGH"):
                ret = ret[:4]
                break
        return ret
    if re.match(r"^TR[AD]", v) or j == "*":
        return ret
    for g in (j, v):
        if g == "*":
            continue
        if g.startswith("IGH"):
            return ret
        return g[:3] + "C"
    return ret


def _aa_type(a: str) -> int:
    if a == "partial":
        return 0
    if a == "out_of_frame" or "_" in a:
        return 1
    return 2


def _is_a_compatible_to_b(a: str, b: str, partial: bool) -> bool:
    ca = a.split(",")
    cb = b.split(",")
    if _get_cell_type(ca[0], ca[2], ca[3]) != _get_cell_type(cb[0], cb[2], cb[3]):
        return False
    for i in (0, 2, 3):
        if ca[i] != "*" and cb[i] != "*" and ca[i] != cb[i]:
            return False
    pattern = ca[4]
    if partial:
        return cb[4].startswith(pattern) or cb[4].endswith(pattern)
    return cb[4] == pattern


def barcode_rep(
    cdr3_path: str,
    out_fp,
    annot_path: Optional[str] = None,
    report_partial: bool = False,
    impute: bool = True,
    impute_bcr: bool = False,
    chains_in_barcode: int = 2,
) -> None:
    """trust-barcoderep.pl main flow.  Output order is deterministic
    (barcode first-seen order); the reference's own order is Perl-hash
    random, so comparisons should sort."""
    chains_in_barcode = min(chains_in_barcode, 2)

    barcode_chain_in_annot: Dict[str, float] = {}
    if annot_path:
        coord_re = re.compile(
            r"\(([0-9]+?)\):\(([0-9]+?)-([0-9]+?)\):\(([0-9]+?)-([0-9]+?)\):([0-9.]+)"
        )
        with open(annot_path) as fp:
            for line in fp:
                if not line.startswith(">"):
                    continue
                cols = line.split()
                m = coord_re.search(cols[3])
                v = (
                    [int(x) for x in m.groups()[:5]] + [float(m.group(6))]
                    if m
                    else [-1, -1, -1, -1, -1, 0.0]
                )
                m = coord_re.search(cols[5])
                j = (
                    [int(x) for x in m.groups()[:5]] + [float(m.group(6))]
                    if m
                    else [-1, -1, -1, -1, -1, 0.0]
                )
                cdr3_score = 0.0
                m = re.search(r":(.+?)=", cols[9])
                if m:
                    cdr3_score = float(m.group(1))
                chain_type = -1
                if (v[2] - v[1] >= 50 and v[5] >= 0.95) or (
                    cdr3_score > 0 and v[0] != -1
                ):
                    chain_type = _detail_chain_from_gene(cols[3][:3])
                elif (j[2] - j[1] >= j[0] * 0.66 and j[5] >= 0.95) or (
                    cdr3_score > 0 and j[0] != -1
                ):
                    chain_type = _detail_chain_from_gene(cols[5][:3])
                if chain_type != -1:
                    name = cols[0][1:]
                    barcode = name[: name.rfind("_")]
                    key = f"{barcode}_{chain_type}"
                    barcode_chain_in_annot[key] = barcode_chain_in_annot.get(
                        key, 0.0
                    ) + float(cols[2])

    chain_abund: Dict[str, float] = {}
    chain_represent: Dict[str, str] = {}
    chain_represent_abund: Dict[str, float] = {}
    chain_aa: Dict[str, str] = {}
    chain_other: Dict[str, List[str]] = {}
    chain_partial: Dict[str, List[str]] = {}
    barcode_list: List[str] = []
    barcode_seen = set()

    with open(cdr3_path) as fp:
        for line in fp:
            cols = line.split()
            assembly_id = cols[0]
            vgene = cols[2].split(",")[0]
            dgene = cols[3].split(",")[0]
            jgene = cols[4].split(",")[0]
            cgene = cols[5].split(",")[0]
            barcode = assembly_id[: assembly_id.rfind("_")]
            key = f"{barcode}_{_detail_chain_type_vjc(vgene, jgene, cgene)}"
            if barcode not in barcode_seen:
                barcode_seen.add(barcode)
                barcode_list.append(barcode)
            if float(cols[9]) == 0:
                aa = "partial"
            elif len(cols[8]) % 3 != 0:
                aa = "out_of_frame"
            else:
                aa = translate_perl(cols[8])
            info = ",".join(
                [vgene, dgene, jgene, cgene, cols[8], aa, cols[10], cols[0],
                 cols[11], cols[12]]
            )
            if aa == "partial":
                t = _detail_chain_type_vjc(vgene, jgene, cgene)
                t = 0 if t in (0, 4, 6) else 1
                chain_partial.setdefault(f"{barcode}_{t}", []).append(info)
                if not report_partial:
                    continue
            chain_abund[key] = chain_abund.get(key, 0.0) + float(cols[10])
            if _aa_type(aa) < chains_in_barcode:
                chain_other.setdefault(key, []).append(info)
                continue
            if key in chain_represent:
                better = _aa_type(aa) - _aa_type(chain_aa[key])
                if better > 0 or (
                    float(cols[10]) > chain_represent_abund[key] and better == 0
                ):
                    chain_other.setdefault(key, []).append(chain_represent[key])
                    chain_represent_abund[key] = float(cols[10])
                    chain_aa[key] = aa
                    chain_represent[key] = info
                else:
                    chain_other.setdefault(key, []).append(info)
            else:
                chain_represent_abund[key] = float(cols[10])
                chain_aa[key] = aa
                chain_represent[key] = info

    if annot_path:
        for key in chain_abund:
            if key in barcode_chain_in_annot:
                chain_abund[key] = barcode_chain_in_annot[key]

    # Deduplicate secondary chains by aa (trust-barcoderep.pl:478-520).
    for key in list(chain_other):
        others = chain_other.get(key)
        if not others or key not in chain_represent:
            continue
        cols = chain_represent[key].split(",")
        abund_aa = {cols[5]: float(cols[6])}
        aa_assembly = {cols[5]: cols[7]}
        for info in others:
            cols = info.split(",")
            if cols[5] not in abund_aa or float(cols[6]) > abund_aa[cols[5]]:
                abund_aa[cols[5]] = float(cols[6])
                aa_assembly[cols[5]] = cols[7]
        new_infos = [
            info for info in others if aa_assembly[info.split(",")[5]] == info.split(",")[7]
        ]
        if new_infos:
            chain_other[key] = new_infos
        else:
            del chain_other[key]

    barcode_output: Dict[str, List[str]] = {}
    for barcode in barcode_list:
        mx = -1.0
        max_tag = -1
        chain1 = chain2 = "*"
        secondary1 = secondary2 = "*"
        for i in range(7):
            key = f"{barcode}_{i}"
            if i >= 5 and max_tag != -1:
                break
            if key in chain_abund and chain_abund[key] > mx:
                mx = chain_abund[key]
                max_tag = i
        if max_tag >= 5 and annot_path:
            tag = 0
            for i in range(5):
                if f"{barcode}_{i}" in barcode_chain_in_annot:
                    tag |= 1 << i
            if (tag & 3) == 3 or (tag & 5) == 5 or (tag & 24) == 24:
                continue
        other_list = list(range(7))
        representative_used = [0] * 8
        if max_tag <= 2:
            cell_type = "B"
            key_h = f"{barcode}_0"
            key_k = f"{barcode}_1"
            key_l = f"{barcode}_2"
            if key_h in chain_represent:
                chain1 = chain_represent[key_h]
            representative_used[0] = 1
            if key_k in chain_represent and key_l in chain_represent:
                if chain_abund[key_k] >= chain_abund[key_l]:
                    chain2 = chain_represent[key_k]
                    representative_used[1] = 1
                else:
                    chain2 = chain_represent[key_l]
                    representative_used[2] = 1
            elif key_k in chain_represent:
                chain2 = chain_represent[key_k]
                representative_used[1] = 1
            elif key_l in chain_represent:
                chain2 = chain_represent[key_l]
                representative_used[2] = 1
        else:
            if max_tag <= 4:
                key1 = f"{barcode}_4"
                key2 = f"{barcode}_3"
                cell_type = "abT"
                other_list = [3, 4, 5, 6, 0, 1, 2]
                representative_used[3] = representative_used[4] = 1
            else:
                key1 = f"{barcode}_6"
                key2 = f"{barcode}_5"
                cell_type = "gdT"
                other_list = [5, 6, 3, 4, 0, 1, 2]
                representative_used[5] = representative_used[6] = 1
            if key1 in chain_represent:
                chain1 = chain_represent[key1]
            if key2 in chain_represent:
                chain2 = chain_represent[key2]

        for i in other_list:
            key = f"{barcode}_{i}"
            if key in chain_represent:
                addition = ""
                if representative_used[i] == 0:
                    addition = chain_represent[key]
                if addition:
                    if key in chain_other:
                        addition = addition + ";" + ";".join(chain_other[key])
                else:
                    if key in chain_other:
                        addition = ";".join(chain_other[key])
                if not addition:
                    continue
                if i in (0, 4, 6):
                    secondary1 = (
                        addition
                        if secondary1 == "*"
                        else secondary1 + ";" + addition
                    )
                else:
                    secondary2 = (
                        addition
                        if secondary2 == "*"
                        else secondary2 + ";" + addition
                    )
        if chain1 == "*" and chain2 == "*":
            continue
        if chains_in_barcode == 1:
            if chain1 == "*" and chain2 != "*":
                chain1, chain2 = chain2, "*"
                secondary1, secondary2 = secondary2, "*"
            elif chain1 != "*" and chain2 != "*":
                abund1 = float(chain1.split(",")[6])
                abund2 = float(chain2.split(",")[6])
                if abund2 > abund1:
                    secondary2 = (
                        f"{secondary2};{chain1}" if secondary2 != "*" else chain1
                    )
                    if secondary1 != "*":
                        secondary2 += f";{secondary1}"
                    chain1 = chain2
                    secondary1 = secondary2
                else:
                    secondary1 = (
                        f"{secondary1};{chain2}" if secondary1 != "*" else chain2
                    )
                    if secondary2 != "*":
                        secondary1 += f";{secondary2}"
                chain2 = "*"
                secondary2 = "*"
        barcode_output[barcode] = [cell_type, chain1, chain2, secondary1, secondary2]

    # Partial-CDR3 imputation across cells (trust-barcoderep.pl:746-818).
    if impute:
        cdr3_to_barcodes: Dict[str, List[str]] = {}
        for barcode, cols in barcode_output.items():
            if cols[1] == "*" and cols[2] == "*":
                continue
            for i in range(2):
                if cols[i + 1] != "*":
                    cdr3 = cols[i + 1].split(",")[4]
                    cdr3_to_barcodes.setdefault(f"{cdr3}_{i}", []).append(barcode)
        for barcode in list(barcode_output):
            cols = barcode_output[barcode]
            if cols[1] == "*" and cols[2] == "*":
                continue
            if cols[1] != "*" and cols[2] != "*":
                continue
            if cols[0] == "B" and not impute_bcr:
                continue
            missing = 1 if cols[2] == "*" else 0
            partials = chain_partial.get(f"{barcode}_{missing}")
            if not partials:
                continue
            cdr3 = cols[2 - missing].split(",")[4]
            candidate = ""
            multiple = False
            for other in cdr3_to_barcodes.get(f"{cdr3}_{1 - missing}", []):
                other_cols = barcode_output[other]
                if other_cols[missing + 1] == "*":
                    continue
                if not _is_a_compatible_to_b(
                    cols[2 - missing], other_cols[2 - missing], False
                ):
                    continue
                for pinfo in partials:
                    if _is_a_compatible_to_b(
                        pinfo, other_cols[missing + 1], True
                    ):
                        if candidate:
                            if _is_a_compatible_to_b(
                                barcode_output[candidate][missing + 1],
                                other_cols[missing + 1],
                                False,
                            ):
                                multiple = True
                        candidate = other
                        break
                if multiple:
                    break
            if not candidate:
                continue
            s = barcode_output[candidate][missing + 1]
            parts = s.split(",")
            if "impute" not in parts[7]:
                parts[7] = "impute_from_" + parts[7]
            barcode_output[barcode][missing + 1] = ",".join(parts)

    out_fp.write(
        "#barcode\tcell_type\tchain1\tchain2\tsecondary_chain1\tsecondary_chain2\n"
    )
    for barcode in barcode_list:
        if barcode in barcode_output:
            out_fp.write(barcode + "\t" + "\t".join(barcode_output[barcode]) + "\n")
