"""CDR3 similarity clustering (reference: scripts/trust-cluster.py).

Set-union clustering of clonotypes whose V/J genes agree and whose CDR3s
exceed a similarity cutoff ("aggressive" all-pairs mode, or "center" mode
comparing against the cluster representative).
"""

from __future__ import annotations

import math
import sys


def _chain_type(v, j, c):
    s = ""
    if v != "*":
        s = v
    elif c != "*":
        s = c
    elif j != "*":
        s = j
    else:
        return -1
    p = s[:3]
    return {
        "IGH": 0, "IGK": 1, "IGL": 2, "TRA": 3, "TRB": 4, "TRG": 5, "TRD": 6,
    }.get(p, -1)


def _similarity(a, b):
    if len(a) != len(b):
        return 0
    return sum(1 for x, y in zip(a, b) if x == y) / len(a)


def _compatible_seq(a, b, similarity):
    if len(a) != len(b):
        return False
    diff_max = len(a) - int(math.ceil(len(a) * similarity))
    diff = 0
    for x, y in zip(a, b):
        if x != y:
            diff += 1
            if diff > diff_max:
                return False
    return True


def _find(tag, father):
    if father[tag] != tag:
        father[tag] = _find(father[tag], father)
    return father[tag]


def larger_cluster(
    raw_cdr3_list, similarity, prefix, use_representative, mode, out
):
    if not raw_cdr3_list:
        return
    cdr3_list = sorted(raw_cdr3_list, key=lambda x: (x[0], x[8]))

    cluster_name_to_id = {}
    cluster_id_to_name = []
    representative_id = {}
    representative_abund = {}
    abund = cdr3_list[0][10]
    for i in range(1, len(cdr3_list) + 1):
        prev_key = (cdr3_list[i - 1][0], cdr3_list[i - 1][8])
        key = "*"
        if i < len(cdr3_list):
            key = (cdr3_list[i][0], cdr3_list[i][8])
        if key == prev_key:
            abund += cdr3_list[i][10]
        else:
            cdr3 = cdr3_list[i - 1]
            if cdr3[0] not in cluster_name_to_id:
                cluster_name_to_id[cdr3[0]] = len(cluster_id_to_name)
                cluster_id_to_name.append(cdr3[0])
                representative_id[cdr3[0]] = i - 1
                representative_abund[cdr3[0]] = abund
            elif abund > representative_abund[cdr3[0]]:
                representative_id[cdr3[0]] = i - 1
                representative_abund[cdr3[0]] = abund
            if i < len(cdr3_list):
                abund = cdr3_list[i][10]

    vj_len_list = {}
    for i, cdr3 in enumerate(cdr3_list):
        if use_representative and representative_id[cdr3[0]] != i:
            continue
        key = (cdr3[2].split("*")[0], cdr3[4].split("*")[0], len(cdr3[8]))
        vj_len_list.setdefault(key, []).append(i)

    father = [representative_id[cdr3[0]] for cdr3 in cdr3_list]

    if mode == "aggressive":
        for ids in vj_len_list.values():
            size = len(ids)
            for i in range(size):
                fi = _find(ids[i], father)
                for j in range(i + 1, size):
                    fj = _find(ids[j], father)
                    if fi != fj and _compatible_seq(
                        cdr3_list[ids[i]][8], cdr3_list[ids[j]][8], similarity
                    ):
                        father[fj] = fi
    elif mode == "center":
        for raw_ids in vj_len_list.values():
            ids = sorted(
                raw_ids,
                key=lambda x: (
                    representative_abund[cdr3_list[x][0]],
                    cdr3_list[x][10],
                ),
                reverse=True,
            )
            for i in range(1, len(ids)):
                max_fj = 0
                max_sim = -1
                fi = _find(ids[i], father)
                for j in range(i):
                    fj = _find(ids[j], father)
                    if fi == fj:
                        continue
                    s = _similarity(cdr3_list[fi], cdr3_list[fj])
                    if s > max_sim:
                        max_sim = s
                        max_fj = fj
                if max_sim >= similarity:
                    father[fi] = max_fj

    larger_to_id = []
    root_to_larger = {}
    for i, cdr3 in enumerate(cdr3_list):
        root = _find(i, father)
        if root not in root_to_larger:
            root_to_larger[root] = len(larger_to_id)
            larger_to_id.append([])
        larger_to_id[root_to_larger[root]].append(i)

    for i, members in enumerate(larger_to_id):
        for j, cid in enumerate(members):
            row = cdr3_list[cid]
            row.append(row[0])
            row.append(row[1])
            row[0] = f"{prefix}_{i}"
            row[1] = j
            out.write("\t".join(str(x) for x in row) + "\n")


def trust_cluster(
    path,
    similarity=0.8,
    prefix="cluster",
    use_representative=False,
    mode="aggressive",
    input_format="cdr3",
    out=sys.stdout,
):
    cdr3_list = []
    line_cnt = 0
    with open(path) as fp:
        for line in fp:
            line = line.rstrip()
            cols = line.split("\t")
            if input_format == "cdr3":
                cols[1] = int(cols[1])
                if cols[2] == "*" or cols[4] == "*":
                    continue
                if float(cols[9]) == 0:
                    continue
                for g in (2, 3, 4, 5):
                    cols[g] = cols[g].split(",")[0]
                cols[9] = float(cols[9])
                cols[10] = float(cols[10])
            elif input_format == "simplerep":
                if line[0] == "#":
                    continue
                if "_" in cols[3] or "?" in cols[3]:
                    continue
                reformat = [0] * 11
                reformat[0] = "line" + str(line_cnt)
                reformat[1] = 0
                for g in (4, 5, 6, 7):
                    reformat[g - 2] = cols[g]
                reformat[6] = reformat[7] = "*"
                reformat[8] = cols[2]
                reformat[9] = 1
                reformat[10] = cols[0]
                cols = reformat[:]
            else:
                raise ValueError(f"Unknown format: {input_format}")
            cdr3_list.append(cols)
            line_cnt += 1
    larger_cluster(cdr3_list, similarity, prefix, use_representative, mode, out)
