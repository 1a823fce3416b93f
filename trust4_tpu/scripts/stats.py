"""Repertoire diversity statistics (reference: scripts/trust-stats.py).

Clonality, entropy, richness, CPK per chain, with IGH split by isotype.
"""

from __future__ import annotations

import math
import sys

ISOTYPE_RANKS = {
    "IGHM": 0, "IGHD": 1, "IGHG3": 2, "IGHG1": 3, "IGHA1": 4,
    "IGHG2": 5, "IGHG4": 6, "IGHE": 7, "IGHA2": 8, "*": 9, ".": 9,
}
ISOTYPE_ORDER = [
    "IGHM", "IGHD", "IGHG3", "IGHG1", "IGHA1", "IGHG2", "IGHG4", "IGHE",
    "IGHA2",
]
CHAIN_ORDER = ["IGH", "IGK", "IGL", "TRA", "TRB", "TRG", "TRD"]


def get_chain_type(v, j, c):
    s = ""
    if c not in ("*", "."):
        s = c
    elif j not in ("*", "."):
        s = j
    elif v not in ("*", "."):
        s = v
    else:
        return -1
    p = s[:3]
    if p == "IGH":
        return (0, ISOTYPE_RANKS[c])
    return {"IGK": 1, "IGL": 2, "TRA": 3, "TRB": 4, "TRG": 5, "TRD": 6}.get(
        p, -1
    )


def _entropy(rep):
    if not rep:
        return "NA"
    total = sum(rep.values())
    return sum(-x / total * math.log(x / total) for x in rep.values())


def _clonality(rep):
    if len(rep) <= 1:
        return "NA"
    return 1 - _entropy(rep) / math.log(len(rep))


def _cpk(rep):
    if not rep:
        return "NA"
    return len(rep) / sum(rep.values()) * 1000


def _output_chain(rep, name, out):
    row = [
        name,
        sum(rep.values()),
        len(rep),
        _cpk(rep),
        _entropy(rep),
        _clonality(rep),
    ]
    out.write("\t".join(str(x) for x in row) + "\n")


def trust_stats(rep_path, fmt="TRUST4_report", out=sys.stdout):
    immrep = {}
    for i in range(10):
        immrep[(0, i)] = {}
    for i in range(1, 7):
        immrep[i] = {}

    with open(rep_path) as fp:
        if fmt == "TRUST4_report":
            for line in fp:
                if line[0] == "#" or line[:5] == "count":
                    continue
                cols = line.rstrip().split()
                chain = get_chain_type(cols[4], cols[6], cols[7])
                if (
                    "_" in cols[3]
                    or cols[3] == "partial"
                    or "?" in cols[3]
                    or chain == -1
                ):
                    continue
                immrep[chain][cols[3]] = immrep[chain].get(cols[3], 0) + int(
                    cols[0]
                )
        elif fmt == "TRUST4_barcode_report":
            for line in fp:
                if line[0] == "#" or line[:5] == "count":
                    continue
                main_cols = line.rstrip().split()
                for i in (2, 3):
                    if main_cols[i] == "*":
                        continue
                    cols = main_cols[i].split(",")
                    chain = get_chain_type(cols[0], cols[2], cols[3])
                    if (
                        "_" in cols[5]
                        or cols[5] == "partial"
                        or "?" in cols[5]
                        or chain == -1
                    ):
                        continue
                    immrep[chain][cols[5]] = immrep[chain].get(cols[5], 0) + 1
        else:
            raise ValueError(f"Unknown format {fmt}")

    out.write(
        "\t".join(
            ["#chain", "Abundance", "Richness", "CPK", "Entropy", "Clonality"]
        )
        + "\n"
    )
    tmp = {}
    for i in range(10):
        for c, v in immrep[(0, i)].items():
            tmp[c] = tmp.get(c, 0) + v
    _output_chain(tmp, "IGH", out)
    for i in range(9):
        _output_chain(immrep[(0, i)], ISOTYPE_ORDER[i], out)
    for i in range(1, 7):
        _output_chain(immrep[i], CHAIN_ORDER[i], out)
