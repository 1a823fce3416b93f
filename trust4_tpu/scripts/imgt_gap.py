"""Re-gap AIRR alignments with IMGT '.' positions
(reference: scripts/airr-imgtgap.py)."""

from __future__ import annotations

import re
import sys


def _parse_cigar(cigar):
    return [(int(f[:-1]), f[-1]) for f in re.findall(r"\d+\w", cigar)]


def _insert_gap(seq, gaps):
    if len(gaps) <= 1:
        return seq
    subseqs = [seq[: gaps[0][0] + 1]]
    for i in range(1, len(gaps)):
        subseqs.append(seq[gaps[i - 1][0] + 1 : gaps[i][0] + 1])
    subseqs.append(seq[gaps[-1][0] + 1 :])
    out = []
    for i in range(len(gaps)):
        out.append(subseqs[i] + "." * gaps[i][1])
    out.append(subseqs[-1])
    return "".join(out)


def airr_imgt_gap(imgt_path, airr_path, out=sys.stdout):
    imgt_seq = {}
    gene = ""
    seq = ""
    with open(imgt_path) as fp:
        for line in fp:
            line = line.rstrip()
            if line.startswith(">"):
                if gene:
                    imgt_seq[gene] = seq
                gene = line[1:].split()[0]
                seq = ""
            else:
                seq += line
    if gene:
        imgt_seq[gene] = seq

    wo_gap = {}
    gap_info = {}
    for g, s in imgt_seq.items():
        gap_info[g] = []
        wo_gap[g] = s.replace(".", "")
        psum = 0
        for m in re.finditer(r"(\.+)", s):
            span = m.span()
            gap_info[g].append((span[0] - psum - 1, span[1] - span[0]))
            psum += span[1] - span[0]

    with open(airr_path) as fp:
        header = fp.readline().rstrip()
        cols = header.split("\t")
        col_id = {c: i for i, c in enumerate(cols)}
        out.write(header + "\n")
        for line in fp:
            cols = line.rstrip().split("\t")
            if (
                len(cols[col_id["v_call"]]) >= 4
                and len(cols[col_id["v_cigar"]]) > 0
            ):
                seq = cols[col_id["sequence_alignment"]]
                germline = cols[col_id["germline_alignment"]]
                gene = cols[col_id["v_call"]]
                gene_length = len(wo_gap[gene])
                fields = _parse_cigar(cols[col_id["v_cigar"]])
                germline_start = 0
                for i in (0, 1):
                    if len(fields) <= i:
                        continue
                    if fields[i][1] == "N":
                        germline_start = fields[i][0]
                tag = 0
                gaps = gap_info[gene]
                for tag in range(len(gaps)):
                    if gaps[tag][0] >= germline_start:
                        break
                i = 0
                j = germline_start
                insert_gaps = []
                while i < len(germline) - 1 and j < gene_length and tag < len(gaps):
                    if germline[i] != "-":
                        if j == gaps[tag][0]:
                            insert_gaps.append((i, gaps[tag][1]))
                            tag += 1
                        j += 1
                    i += 1
                cols[col_id["sequence_alignment"]] = _insert_gap(seq, insert_gaps)
                cols[col_id["germline_alignment"]] = _insert_gap(
                    germline, insert_gaps
                )
            out.write("\t".join(cols) + "\n")
