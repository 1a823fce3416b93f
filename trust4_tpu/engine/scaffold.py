"""Mate-pair scaffolding and redundancy removal.

Re-implements ExtendSeqFromReads (reference: SeqSet.hpp:9735-10806),
BuildBranchGraph (:2312-2463), and RemoveRedundantSeq (:2127-2250,
4965-4985).  Tie orders from std::sort matter here (mate edges tie on
support count; assigned reads tie on id), so all sorts go through
cxx_sort, a faithful libstdc++ introsort.
"""

from __future__ import annotations
from dataclasses import replace as _dc_replace

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from trust4_tpu.align import host as align_host
from trust4_tpu.dna import revcomp, nuc_num, seq_to_codes
from trust4_tpu.engine.types import Overlap
from trust4_tpu.ops.kmer import kmer_codes
from trust4_tpu.utils.cxxsort import cxx_sort


# Optional file-like sink replicating the reference's #ifdef DEBUG prints in
# ExtendSeqFromReads — set scaffold.TRACE to a file object to enable.
TRACE = None


@dataclass(slots=True)
class AssignedRead:
    """reference: struct _assignRead.  (slots via the decorator below:
    one instance per realigned read — ~10^6 at single-cell scale.)"""

    id: str
    read: str
    barcode: int = -1
    umi: int = -1
    info: int = -1
    overlap: Optional[Overlap] = None


def _overlap_less(a: Overlap, b: Overlap) -> bool:
    return a.sort_key() < b.sort_key()


def is_pos_weight_compatible(a: np.ndarray, b: np.ndarray) -> bool:
    """SeqSet.hpp:292-304: >=1/3-majority agreement on some base."""
    sum_a = int(a.sum())
    sum_b = int(b.sum())
    if sum_a == 0 or sum_b == 0:
        return True
    for j in range(4):
        if sum_a < 3 * int(a[j]) and sum_b < 3 * int(b[j]):
            return True
    return False


def _vote_extend(wa: np.ndarray, wb: np.ndarray) -> tuple:
    """Vectorized posWeight-compatibility voting walk (the per-position
    loop at SeqSet.hpp:2376-2414): returns (extend, 2 * match_cnt at that
    extend) for the LAST k where match_cnt > 0.75 * k — identical to the
    serial walk, which records every k that satisfies the ratio and keeps
    the final one."""
    n = min(len(wa), len(wb))
    if n == 0:
        return 0, 0
    A = wa[:n]
    B = wb[:n]
    sa = A.sum(axis=1)
    sb = B.sum(axis=1)
    compat = (
        ((sa[:, None] < 3 * A) & (sb[:, None] < 3 * B)).any(axis=1)
        | (sa == 0)
        | (sb == 0)
    )
    cum = np.cumsum(compat)
    # The serial walk tests the ratio only at compat positions.
    ok = compat & (cum > np.arange(1, n + 1) * 0.75)
    if not ok.any():
        return 0, 0
    k = int(np.nonzero(ok)[0][-1]) + 1
    return k, 2 * int(cum[k - 1])


class ScaffoldMixin:
    # ------------------------------------------------------------------
    # Branch graph (SeqSet.hpp:2312-2463)
    # ------------------------------------------------------------------

    def build_branch_graph(
        self,
        least_overlap_len: int,
        prev_adj: Optional[List[List[Overlap]]] = None,
        next_adj: Optional[List[List[Overlap]]] = None,
    ) -> List[List[Overlap]]:
        seq_cnt = len(self.seqs)
        adj: List[List[Overlap]] = [[] for _ in range(seq_cnt)]
        use = [False] * seq_cnt
        restricted = prev_adj is not None and next_adj is not None

        for i in range(seq_cnt):
            sw = self.seqs[i]
            if sw is None or sw.consensus is None:
                continue
            if restricted and len(prev_adj[i]) + len(next_adj[i]) == 0:
                continue
            if restricted:
                for o in prev_adj[i]:
                    use[o.seq_idx] = True
                for o in next_adj[i]:
                    use[o.seq_idx] = True

            overlaps: List[Overlap] = []
            backup = self.novel_seq_similarity
            self.novel_seq_similarity = self.repeat_similarity
            overlap_cnt = self.get_overlaps_from_read(
                sw.consensus, 1, sw.barcode, 1, False, overlaps, use
            )
            self.novel_seq_similarity = backup

            for j, o in enumerate(overlaps if overlap_cnt > 0 else []):
                if o.strand == -1:
                    continue
                if i == o.seq_idx or not use[o.seq_idx]:
                    continue
                seq_idx = o.seq_idx
                other = self.seqs[seq_idx]
                # posWeight-compatibility voting extension
                # (SeqSet.hpp:2376-2414).
                right_extend, right_extend_match = _vote_extend(
                    sw.pos_weight[o.read_end + 1 :],
                    other.pos_weight[o.seq_end + 1 :],
                )
                left_extend, left_extend_match = _vote_extend(
                    sw.pos_weight[o.read_start - 1 :: -1]
                    if o.read_start >= 1
                    else sw.pos_weight[:0],
                    other.pos_weight[o.seq_start - 1 :: -1]
                    if o.seq_start >= 1
                    else other.pos_weight[:0],
                )

                ext = _dc_replace(o)
                ext.read_start -= left_extend
                ext.seq_start -= left_extend
                ext.read_end += right_extend
                ext.seq_end += right_extend
                ext.match_cnt += right_extend_match + left_extend_match
                ext.similarity = ext.match_cnt / (
                    ext.read_end - ext.read_start + 1
                    + ext.seq_end - ext.seq_start + 1
                )
                if ext.read_end - ext.read_start + 1 < least_overlap_len:
                    continue
                if ext.similarity < self.repeat_similarity:
                    ext = _dc_replace(o)
                if ext.similarity >= self.repeat_similarity:
                    adj[i].append(ext)
                    if TRACE:
                        TRACE.write(
                            "branch %d %d: %d %d %d %d %d %f\n"
                            % (
                                i, j, ext.seq_idx, ext.read_start,
                                ext.read_end, ext.seq_start, ext.seq_end,
                                ext.similarity,
                            )
                        )

            if restricted:
                for o in prev_adj[i]:
                    use[o.seq_idx] = False
                for o in next_adj[i]:
                    use[o.seq_idx] = False

        for i in range(seq_cnt):
            cxx_sort(adj[i], _overlap_less)
        return adj

    # ------------------------------------------------------------------
    # Mate adjacency helpers (SeqSet.hpp:9209-9733)
    # ------------------------------------------------------------------

    @staticmethod
    def _update_mate_adj_graph(
        from_, from_start, from_end, to, to_start, to_end, read_id, mate_adj
    ) -> None:
        for o in mate_adj[from_]:
            if o.seq_idx == to:
                o.read_start = min(o.read_start, from_start)
                o.read_end = max(o.read_end, from_end)
                o.seq_start = min(o.seq_start, to_start)
                o.seq_end = max(o.seq_end, to_end)
                o.match_cnt += 1
                o.info.append(read_id)
                return
        na = Overlap(
            seq_idx=to,
            read_start=from_start,
            read_end=from_end,
            seq_start=to_start,
            seq_end=to_end,
            strand=0,
            match_cnt=1,
        )
        na.similarity = 0
        na.info = [read_id]
        mate_adj[from_].append(na)

    def _get_extend_seq_coord(
        self, from_, mate_info: Overlap, direction: int, branch_adj, aggressive
    ) -> Tuple[int, Overlap]:
        """SeqSet.hpp:9424-9508.  Returns (ret, coord)."""
        coord = Overlap()
        coord.seq_idx = -1
        to = mate_info.seq_idx
        overhang = 5
        adj = branch_adj[from_]
        k = -1
        for i, o in enumerate(adj):
            if direction == 1:
                if (
                    o.seq_idx == to
                    and o.read_end >= self.seqs[from_].consensus_len - overhang
                ):
                    k = i
                    break
            elif direction == -1:
                if o.seq_idx == to and o.read_start <= overhang - 1:
                    k = i
                    break
        if k == -1:
            return 0, coord
        o = adj[k]
        if direction == 1 and mate_info.seq_end <= o.seq_end:
            return 0, coord
        if direction == -1 and mate_info.seq_start >= o.seq_start:
            return 0, coord

        coord.seq_idx = to
        coord.match_cnt = o.read_end - o.read_start + 1
        ret = 1
        if direction == 1:
            coord.read_start = 0
            coord.read_end = o.read_end
            coord.seq_start = o.seq_end + 1
            coord.seq_end = (
                self.seqs[to].consensus_len - 1 if aggressive else mate_info.seq_end
            )
            if o.seq_start <= overhang - 1:
                ret = 2
        else:
            coord.read_start = o.read_start
            coord.read_end = self.seqs[from_].consensus_len - 1
            coord.seq_start = 0 if aggressive else mate_info.seq_start
            coord.seq_end = o.seq_start - 1
            if o.seq_end >= self.seqs[o.seq_idx].consensus_len - overhang:
                ret = 2
        return ret, coord

    def _can_gap_extend(self, from_, mate_info: Overlap, direction, branch_adj) -> bool:
        """SeqSet.hpp:9510-9579."""
        for o in branch_adj[from_]:
            if o.seq_idx == mate_info.seq_idx:
                bs, be = o.seq_start, o.seq_end
                ms, me = mate_info.seq_start, mate_info.seq_end
                if bs <= ms and be >= me:
                    return False
                if ms <= bs and me >= be:
                    return False
                if be <= ms or bs >= me:
                    continue
                if bs <= ms and be <= me and be - ms + 1 >= 17:
                    return False
                elif bs >= ms and be >= me and me - bs + 1 >= 17:
                    return False

        seqs = self.seqs
        if direction == -1:
            if mate_info.read_start < 50:
                return True
            i = 0
            while i < 3 and seqs[from_].info[i][0] == -1:
                i += 1
            if i < 3:
                to = mate_info.seq_idx
                j = 0
                while j < 3 and not (seqs[to].info[j][1] + 3 >= mate_info.seq_end):
                    j += 1
                if j < i:
                    return True
        else:
            if mate_info.read_end >= seqs[from_].consensus_len - 50:
                return True
            i = 2
            while i >= 0 and seqs[from_].info[i][0] == -1:
                i -= 1
            if i >= 0:
                to = mate_info.seq_idx
                j = 2
                while j >= 0 and not (
                    seqs[to].info[j][0] >= 0
                    and seqs[to].info[j][0] - 3 <= mate_info.seq_start
                ):
                    j -= 1
                if i < j:
                    return True
        return False

    def _get_gap_extend_seq_coord(self, from_, mate_info: Overlap, direction):
        """SeqSet.hpp:9582-9602."""
        coord = _dc_replace(mate_info)
        coord.read_start = 0
        coord.read_end = self.seqs[from_].consensus_len - 1
        coord.match_cnt = 0
        return 1, coord

    # ------------------------------------------------------------------
    # ExtendSeqFromReads (SeqSet.hpp:9735-10806)
    # ------------------------------------------------------------------

    def extend_seq_from_reads(
        self, reads: List[AssignedRead], least_overlap_len: int, ref_set
    ) -> None:
        seq_cnt = len(self.seqs)
        seqs = self.seqs
        backup_novel_similarity = self.novel_seq_similarity
        self.novel_seq_similarity = 1.00

        next_adj: List[List[Overlap]] = [[] for _ in range(seq_cnt)]
        prev_adj: List[List[Overlap]] = [[] for _ in range(seq_cnt)]
        use_in_branch = [False] * seq_cnt

        for i in range(seq_cnt):
            seqs[i].info[0][0] = seqs[i].info[0][1] = i

        cxx_sort(reads, lambda a, b: a.id < b.id)

        read_cnt = len(reads)
        i = 0
        while i < read_cnt:
            paired = i < read_cnt - 1 and reads[i].id == reads[i + 1].id
            if paired:
                oa = reads[i].overlap
                ob = reads[i + 1].overlap
                if (
                    oa is None
                    or ob is None
                    or oa.seq_idx == -1
                    or ob.seq_idx == -1
                    or oa.strand == ob.strand
                    or (oa.similarity < 1 and ob.similarity < 1)
                    or oa.seq_idx == ob.seq_idx
                ):
                    i += 2
                    continue
                if oa.strand == 1:
                    from_, f_start, f_end = oa.seq_idx, oa.seq_start, oa.seq_end
                    to, t_start, t_end = ob.seq_idx, ob.seq_start, ob.seq_end
                    valid_next = oa.similarity >= 1
                    valid_prev = ob.similarity >= 1
                else:
                    to, t_start, t_end = oa.seq_idx, oa.seq_start, oa.seq_end
                    from_, f_start, f_end = ob.seq_idx, ob.seq_start, ob.seq_end
                    valid_next = ob.similarity >= 1
                    valid_prev = oa.similarity >= 1
                use_in_branch[from_] = True
                use_in_branch[to] = True
                if valid_next:
                    self._update_mate_adj_graph(
                        from_, f_start, f_end, to, t_start, t_end, i, next_adj
                    )
                if valid_prev:
                    self._update_mate_adj_graph(
                        to, t_start, t_end, from_, f_start, f_end, i, prev_adj
                    )
                i += 2
            else:
                i += 1

        for i in range(seq_cnt):
            cxx_sort(prev_adj[i], _overlap_less)
            cxx_sort(next_adj[i], _overlap_less)

        # Rough V/J/C annotation of used contigs (SeqSet.hpp:9855-9891);
        # one threaded native batch when available (per-contig serial
        # queries otherwise).
        used_idx = [i for i in range(seq_cnt) if use_in_branch[i]]
        for i in range(seq_cnt):
            if not use_in_branch[i]:
                for k in range(3):
                    seqs[i].info[k] = [-1, -1, -1]
        nat = ref_set._native_sync() if used_idx else None
        if nat is not None:
            import os as _os

            if _os.environ.get("TRUST4_TPU_SCORED", "1") == "0" or _os.environ.get(
                "TRUST4_TPU_SCORED_CHECK", "0"
            ) == "1":
                nat = None
        if nat is not None:
            from trust4_tpu.utils.parallel import internal_threads

            rows, _sims = nat.annotate0_batch(
                [seqs[i].consensus for i in used_idx],
                internal_threads(getattr(self, "threads", 1) or 1),
                ref_set.radius, ref_set.hit_len_required,
                ref_set.is_long_seq_set, ref_set.nomatch_gap_limit,
                ref_set.novel_seq_similarity, ref_set.ref_seq_similarity,
                ref_set.repeat_similarity, ref_set.gap_n,
            )
            rows_l = rows.tolist()
            for at, i in enumerate(used_idx):
                for j in (0, 2, 3):
                    k = j if j <= 1 else j - 1
                    r8 = rows_l[at][j]
                    if r8[0] == -1:
                        seqs[i].info[k] = [-1, -1, -1]
                    else:
                        seqs[i].info[k] = [r8[1], r8[2], r8[0]]
        else:
            for i in used_idx:
                _, gene_overlap, _ = ref_set.annotate_read(
                    seqs[i].consensus, 0
                )
                for j in (0, 2, 3):
                    k = j if j <= 1 else j - 1
                    if gene_overlap[j].seq_idx == -1:
                        seqs[i].info[k] = [-1, -1, -1]
                    else:
                        seqs[i].info[k] = [
                            gene_overlap[j].read_start,
                            gene_overlap[j].read_end,
                            gene_overlap[j].seq_idx,
                        ]

        backup_hlr = self.hit_len_required
        self.hit_len_required = least_overlap_len
        branch_adj = self.build_branch_graph(least_overlap_len, prev_adj, next_adj)
        self.hit_len_required = backup_hlr

        if TRACE:
            for i in range(seq_cnt):
                TRACE.write(
                    "%d (V:%d-%d) (J:%d-%d) (C:%d-%d)\n%s\n"
                    % (
                        i,
                        seqs[i].info[0][0], seqs[i].info[0][1],
                        seqs[i].info[1][0], seqs[i].info[1][1],
                        seqs[i].info[2][0], seqs[i].info[2][1],
                        seqs[i].consensus,
                    )
                )

        # Pick the heaviest mate edge per side (SeqSet.hpp:9919-9976).
        mate_prev_next = [[-1, -1] for _ in range(seq_cnt)]
        mate_prev_next_type = [[0, 0] for _ in range(seq_cnt)]
        for i in range(seq_cnt):
            for adj, slot in ((prev_adj[i], 0), (next_adj[i], 1)):
                tag = -1
                mx = -1
                for j, o in enumerate(adj):
                    if o.seq_idx == i:
                        continue
                    if o.match_cnt > mx:
                        tag = j
                        mx = o.match_cnt
                    elif o.match_cnt >= mx * 0.9:
                        if (
                            o.seq_end - o.seq_start
                            > adj[tag].seq_end - adj[tag].seq_start
                        ):
                            tag = j
                    if TRACE:
                        TRACE.write(
                            "%s %d: %d %d. %d %d %d %d\n"
                            % (
                                "<=" if slot == 0 else "=>",
                                i, o.seq_idx, o.match_cnt,
                                o.read_start, o.read_end,
                                o.seq_start, o.seq_end,
                            )
                        )
                mate_prev_next[i][slot] = tag

        extension_type = [[0, 0] for _ in range(seq_cnt)]
        unique_successor_of = [-1] * seq_cnt

        # Classify extensions (SeqSet.hpp:9987-10082).
        for i in range(seq_cnt):
            prev_tag = mate_prev_next[i][0]
            next_tag = mate_prev_next[i][1]
            left_extend = Overlap()
            left_extend.seq_idx = -1
            right_extend = Overlap()
            right_extend.seq_idx = -1
            extension_type[i][0] = extension_type[i][1] = 0
            mate_prev_next_type[i][0] = mate_prev_next_type[i][1] = -1
            if prev_tag >= 0:
                extension_type[i][0], left_extend = self._get_extend_seq_coord(
                    i, prev_adj[i][prev_tag], -1, branch_adj, False
                )
                if left_extend.seq_idx != -1:
                    mate_prev_next_type[i][0] = 1
                elif self._can_gap_extend(i, prev_adj[i][prev_tag], -1, branch_adj):
                    mate_prev_next_type[i][0] = 2
                else:
                    # int truncation in the reference (SeqSet.hpp:10012)
                    threshold = int(prev_adj[i][0].match_cnt * 0.5)
                    found = False
                    for j, o in enumerate(prev_adj[i]):
                        if o.match_cnt < threshold:
                            break
                        extension_type[i][0], left_extend = (
                            self._get_extend_seq_coord(
                                i, o, -1, branch_adj, False
                            )
                        )
                        if left_extend.seq_idx != -1:
                            mate_prev_next_type[i][0] = 1
                            mate_prev_next[i][0] = j
                            found = True
                            break
                        elif self._can_gap_extend(i, o, -1, branch_adj):
                            mate_prev_next_type[i][0] = 2
                            mate_prev_next[i][0] = j
                            found = True
                            break
                    if not found:
                        mate_prev_next[i][0] = -1
            if next_tag >= 0:
                extension_type[i][1], right_extend = self._get_extend_seq_coord(
                    i, next_adj[i][next_tag], 1, branch_adj, False
                )
                if right_extend.seq_idx != -1:
                    mate_prev_next_type[i][1] = 1
                elif self._can_gap_extend(i, next_adj[i][next_tag], 1, branch_adj):
                    mate_prev_next_type[i][1] = 2
                else:
                    threshold = int(next_adj[i][0].match_cnt * 0.5)
                    found = False
                    for j, o in enumerate(next_adj[i]):
                        if o.match_cnt < threshold:
                            break
                        extension_type[i][1], right_extend = (
                            self._get_extend_seq_coord(i, o, 1, branch_adj, False)
                        )
                        # Reference quirk (SeqSet.hpp:10063): tests the LEFT
                        # extension variable here, not the right one.
                        if left_extend.seq_idx != -1:
                            mate_prev_next_type[i][1] = 1
                            mate_prev_next[i][1] = j
                            found = True
                            break
                        elif self._can_gap_extend(i, o, 1, branch_adj):
                            mate_prev_next_type[i][1] = 2
                            mate_prev_next[i][1] = j
                            found = True
                            break
                    if not found:
                        mate_prev_next[i][1] = -1

        # Rescue reciprocal end-to-end links (SeqSet.hpp:10086-10137).
        for i in range(seq_cnt):
            prev_tag = mate_prev_next[i][0]
            next_tag = mate_prev_next[i][1]
            if prev_tag >= 0:
                seq_idx = prev_adj[i][prev_tag].seq_idx
                if (
                    mate_prev_next[seq_idx][1] == -1
                    or mate_prev_next_type[seq_idx][1] == 2
                ) and extension_type[i][0] == 2:
                    for j, o in enumerate(next_adj[seq_idx]):
                        if o.seq_idx == i:
                            extension_type[seq_idx][1], _ = (
                                self._get_extend_seq_coord(
                                    seq_idx, o, 1, branch_adj, False
                                )
                            )
                            if extension_type[seq_idx][1] == 2:
                                mate_prev_next[seq_idx][1] = j
                                mate_prev_next_type[seq_idx][1] = 1
                            break
            if next_tag >= 0:
                seq_idx = next_adj[i][next_tag].seq_idx
                if (
                    mate_prev_next[seq_idx][0] == -1
                    or mate_prev_next_type[seq_idx][0] == 2
                ) and extension_type[i][1] == 2:
                    for j, o in enumerate(prev_adj[seq_idx]):
                        if o.seq_idx == i:
                            extension_type[seq_idx][0], _ = (
                                self._get_extend_seq_coord(
                                    seq_idx, o, -1, branch_adj, False
                                )
                            )
                            if extension_type[seq_idx][0] == 2:
                                mate_prev_next[seq_idx][0] = j
                                mate_prev_next_type[seq_idx][0] = 1
                            break

        # Short overlaps between "gapped" partners (SeqSet.hpp:10140-10224).
        short_overlap_seq_idx: List[Tuple[int, int]] = []
        for i in range(seq_cnt):
            min_overlap = 10
            if mate_prev_next_type[i][0] == 2:
                prev_seq_idx = prev_adj[i][mate_prev_next[i][0]].seq_idx
                overlap_size, offset, best_match = align_host.is_mate_overlap(
                    seqs[prev_seq_idx].consensus, seqs[i].consensus, min_overlap
                )
                if overlap_size >= 0:
                    mate_prev_next_type[i][0] = 1
                    extension_type[i][0] = 2
                    o = Overlap(
                        seq_idx=prev_seq_idx,
                        read_start=0,
                        read_end=overlap_size - 1,
                        seq_start=offset,
                        seq_end=seqs[prev_seq_idx].consensus_len - 1,
                        match_cnt=2 * best_match,
                    )
                    o.similarity = best_match / overlap_size
                    branch_adj[i].append(o)
                    short_overlap_seq_idx.append((i, -1))
            if mate_prev_next_type[i][1] == 2:
                next_seq_idx = next_adj[i][mate_prev_next[i][1]].seq_idx
                overlap_size, offset, best_match = align_host.is_mate_overlap(
                    seqs[i].consensus, seqs[next_seq_idx].consensus, min_overlap
                )
                if overlap_size >= 0:
                    mate_prev_next_type[i][1] = 1
                    extension_type[i][1] = 2
                    o = Overlap(
                        seq_idx=next_seq_idx,
                        read_start=offset,
                        read_end=seqs[i].consensus_len - 1,
                        seq_start=0,
                        seq_end=overlap_size - 1,
                        match_cnt=2 * best_match,
                    )
                    o.similarity = best_match / overlap_size
                    branch_adj[i].append(o)
                    short_overlap_seq_idx.append((i, 1))
        for seq_idx, side in short_overlap_seq_idx:
            if side == -1:
                prev_tag = mate_prev_next[seq_idx][0]
                extension_type[seq_idx][0], _ = self._get_extend_seq_coord(
                    seq_idx, prev_adj[seq_idx][prev_tag], -1, branch_adj, False
                )
            else:
                next_tag = mate_prev_next[seq_idx][1]
                extension_type[seq_idx][1], _ = self._get_extend_seq_coord(
                    seq_idx, next_adj[seq_idx][next_tag], 1, branch_adj, False
                )

        # Unique successor detection (SeqSet.hpp:10248-10288).
        for i in range(seq_cnt):
            prev_tag = mate_prev_next[i][0]
            if prev_tag >= 0:
                if extension_type[i][0] == 2 or mate_prev_next_type[i][0] == 2:
                    seq_idx = prev_adj[i][prev_tag].seq_idx
                    if (
                        mate_prev_next[seq_idx][1] >= 0
                        and next_adj[seq_idx][mate_prev_next[seq_idx][1]].seq_idx
                        == i
                        and (
                            extension_type[seq_idx][1] == 2
                            or mate_prev_next_type[seq_idx][1] == 2
                        )
                    ):
                        unique_successor_of[i] = seq_idx

        # The extension splice (SeqSet.hpp:10310-10707).
        to_remove: List[int] = []
        shift_seq = [[i, 0] for i in range(seq_cnt)]
        gap_n = self.gap_n
        for i in range(seq_cnt):
            if unique_successor_of[i] != -1:
                to_remove.append(i)
                continue
            last = i
            last_next_tag = mate_prev_next[i][1]
            chain = [i]
            while True:
                if (
                    last_next_tag >= 0
                    and unique_successor_of[
                        next_adj[last][last_next_tag].seq_idx
                    ]
                    == last
                ):
                    last = next_adj[last][last_next_tag].seq_idx
                    last_next_tag = mate_prev_next[last][1]
                    chain.append(last)
                else:
                    break
            chain_size = len(chain)
            new_consensus_len = 0
            offset = [0] * chain_size
            rng = [[0, 0] for _ in range(chain_size)]
            orig_range_b = [0] * chain_size
            gap_pos: List[Tuple[int, int]] = []
            left_most = Overlap()
            left_most.seq_idx = -1
            right_most = Overlap()
            right_most.seq_idx = -1

            for j in range(chain_size):
                cj = chain[j]
                prev_tag = mate_prev_next[cj][0]
                next_tag = mate_prev_next[cj][1]
                left_extend = Overlap()
                left_extend.seq_idx = -1
                right_extend = Overlap()
                right_extend.seq_idx = -1
                if prev_tag >= 0 and mate_prev_next_type[cj][0] == 1:
                    aggressive = j != 0
                    _, left_extend = self._get_extend_seq_coord(
                        cj, prev_adj[cj][prev_tag], -1, branch_adj, aggressive
                    )
                if next_tag >= 0 and mate_prev_next_type[cj][1] == 1:
                    aggressive = True
                    if j == chain_size - 1:
                        aggressive = False
                        nxt = next_adj[cj][next_tag]
                        if (
                            seqs[cj].info[2][2] == -1
                            and seqs[nxt.seq_idx].info[2][2] != -1
                        ):
                            if nxt.seq_end < seqs[nxt.seq_idx].info[2][0]:
                                for k2, o2 in enumerate(next_adj[cj]):
                                    if (
                                        k2 == next_tag
                                        or seqs[o2.seq_idx].info[2][2] == -1
                                    ):
                                        continue
                                    if (
                                        seqs[o2.seq_idx].info[2][2]
                                        == seqs[nxt.seq_idx].info[2][2]
                                        and o2.seq_end
                                        > seqs[o2.seq_idx].info[2][0]
                                    ):
                                        aggressive = True
                                        break
                            else:
                                aggressive = True
                    _, right_extend = self._get_extend_seq_coord(
                        cj, next_adj[cj][next_tag], 1, branch_adj, aggressive
                    )
                if mate_prev_next_type[cj][0] == 2:
                    _, left_extend = self._get_gap_extend_seq_coord(
                        cj, prev_adj[cj][prev_tag], -1
                    )
                if mate_prev_next_type[cj][1] == 2:
                    _, right_extend = self._get_gap_extend_seq_coord(
                        cj, next_adj[cj][next_tag], 1
                    )

                if j == 0 and left_extend.seq_idx != -1:
                    new_consensus_len += (
                        left_extend.seq_end - left_extend.seq_start + 1
                    )
                    if mate_prev_next_type[cj][0] == 2:
                        gap_pos.append((new_consensus_len, gap_n))
                        new_consensus_len += gap_n
                    left_most = left_extend
                offset[j] = new_consensus_len
                rng[j][0] = (
                    left_extend.read_start if left_extend.seq_idx != -1 else 0
                )
                rng[j][1] = (
                    right_extend.read_end
                    if right_extend.seq_idx != -1
                    else seqs[cj].consensus_len - 1
                )
                orig_range_b[j] = rng[j][1]
                if j < chain_size - 1:
                    rng[j][1] -= right_extend.match_cnt
                    if rng[j][1] < rng[j][0]:
                        rng[j][1] = rng[j][0] - 1
                new_consensus_len += rng[j][1] - rng[j][0] + 1
                if mate_prev_next_type[cj][1] == 2:
                    gap_pos.append((new_consensus_len, gap_n))
                    new_consensus_len += gap_n
                if j == chain_size - 1 and right_extend.seq_idx != -1:
                    new_consensus_len += (
                        right_extend.seq_end - right_extend.seq_start + 1
                    )
                    right_most = right_extend

            if new_consensus_len == seqs[i].consensus_len:
                continue

            buf = bytearray(b"\x00" * new_consensus_len)
            if left_most.seq_idx != -1:
                piece = seqs[left_most.seq_idx].consensus[
                    left_most.seq_start : left_most.seq_end + 1
                ]
                buf[0 : len(piece)] = piece.encode("ascii")
            for j in range(chain_size):
                piece = seqs[chain[j]].consensus[rng[j][0] : rng[j][1] + 1]
                buf[offset[j] : offset[j] + len(piece)] = piece.encode("ascii")
            if right_most.seq_idx != -1:
                last_offset = (
                    offset[chain_size - 1]
                    + rng[chain_size - 1][1]
                    - rng[chain_size - 1][0]
                    + 1
                )
                if mate_prev_next_type[chain[chain_size - 1]][1] == 2:
                    last_offset += gap_n
                piece = seqs[right_most.seq_idx].consensus[
                    right_most.seq_start : right_most.seq_end + 1
                ]
                buf[last_offset : last_offset + len(piece)] = piece.encode(
                    "ascii"
                )
            for ga, gb in gap_pos:
                for l in range(ga, ga + gb):
                    buf[l] = ord("N")
            new_consensus = buf.decode("ascii")

            from trust4_tpu.engine.types import SeqWrapper

            ns = SeqWrapper(
                name=seqs[i].name, consensus=new_consensus, is_ref=False
            )
            ns.barcode = seqs[i].barcode
            ns.pos_weight = np.zeros((new_consensus_len, 4), dtype=np.int32)
            ns.num_read = 0
            ns.info = [[0, 0, 0], [0, 0, 0], [0, 0, 0]]

            new_seq_idx = len(seqs)
            for j in range(chain_size):
                cj = chain[j]
                ns.num_read += seqs[cj].num_read
                l = rng[j][0]
                while (
                    l <= orig_range_b[j]
                    and offset[j] + l - rng[j][0] < new_consensus_len
                ):
                    ns.pos_weight[offset[j] + l - rng[j][0]] += seqs[
                        cj
                    ].pos_weight[l]
                    l += 1
                seqs[cj].info[0][1] = new_seq_idx
            ns.info[0][0] = ns.info[1][1] = new_seq_idx
            ns.info[1][0] = chain[0]
            ns.info[1][1] = chain[chain_size - 1]

            # Migrate overhang read weights (SeqSet.hpp:10572-10677).
            if left_most.seq_idx != -1:
                from_ = left_most.seq_idx
                to = chain[0]
                edge = next(
                    (o for o in next_adj[from_] if o.seq_idx == to), None
                )
                if edge is not None:
                    for rid in edge.info:
                        if reads[rid].overlap.seq_idx == from_:
                            ridx = rid
                        else:
                            ridx = rid + 1
                        ro = reads[ridx].overlap
                        if ro.seq_end > left_most.seq_end + left_most.match_cnt:
                            continue
                        rm = 0
                        for m in range(ro.seq_start, ro.seq_end + 1):
                            ch = reads[ridx].read[rm]
                            if ch != "N":
                                pos = m - left_most.seq_start
                                if 0 <= pos < new_consensus_len:
                                    ns.pos_weight[pos, nuc_num(ch)] += 1
                                spos = shift_seq[from_][1] + m
                                target = seqs[shift_seq[from_][0]]
                                if 0 <= spos < target.consensus_len:
                                    target.pos_weight[spos, nuc_num(ch)] -= 1
                            rm += 1
            if right_most.seq_idx != -1:
                from_ = chain[chain_size - 1]
                to = right_most.seq_idx
                edge = next(
                    (o for o in next_adj[from_] if o.seq_idx == to), None
                )
                if edge is not None:
                    last_offset = (
                        offset[chain_size - 1]
                        + rng[chain_size - 1][1]
                        - rng[chain_size - 1][0]
                        + 1
                    )
                    if mate_prev_next_type[chain[chain_size - 1]][1] == 2:
                        last_offset += gap_n
                    for rid in edge.info:
                        if reads[rid].overlap.seq_idx == from_:
                            ridx = rid + 1
                        else:
                            ridx = rid
                        ro = reads[ridx].overlap
                        if ro.seq_start < right_most.seq_start - right_most.match_cnt:
                            continue
                        s = reads[ridx].read
                        if ro.strand == -1:
                            s = revcomp(s)
                        rm = 0
                        for m in range(ro.seq_start, ro.seq_end + 1):
                            ch = s[rm]
                            if ch != "N":
                                adjust_m = m - right_most.seq_start + last_offset
                                if 0 <= adjust_m < new_consensus_len:
                                    ns.pos_weight[adjust_m, nuc_num(ch)] += 1
                                spos = shift_seq[to][1] + m
                                target = seqs[shift_seq[to][0]]
                                if 0 <= spos < target.consensus_len:
                                    target.pos_weight[spos, nuc_num(ch)] -= 1
                            rm += 1

            # Floor weight 1 for untouched positions (SeqSet.hpp:10680-10683).
            codes = seq_to_codes(new_consensus)
            untouched = ns.pos_weight.sum(axis=1) == 0
            not_n = (
                np.frombuffer(new_consensus.encode("ascii"), dtype=np.uint8)
                != ord("N")
            )
            sel = np.nonzero(untouched & not_n)[0]
            ns.pos_weight[sel, codes[sel].astype(np.int64)] = 1

            for j in range(chain_size):
                shift_seq[chain[j]][0] = len(seqs)
                shift_seq[chain[j]][1] = offset[j] - rng[j][0]

            if TRACE:
                if left_most.seq_idx != -1:
                    TRACE.write(
                        "left 0: %d %s\n"
                        % (left_most.seq_idx, seqs[left_most.seq_idx].consensus)
                    )
                for j in range(chain_size):
                    TRACE.write(
                        "chain %d: %d %s\n"
                        % (j + 1, chain[j], seqs[chain[j]].consensus)
                    )
                if right_most.seq_idx != -1:
                    TRACE.write(
                        "right %d: %d %s\n"
                        % (chain_size + 1, right_most.seq_idx,
                           seqs[right_most.seq_idx].consensus)
                    )
                TRACE.write("%d new %s\n" % (i, new_consensus))

            seqs.append(ns)
            to_remove.append(i)

        for idx in to_remove:
            self.release_seq(idx)

        # Negative-weight cleanup + end trimming (SeqSet.hpp:10748-10793).
        seq_cnt = len(seqs)
        for i in range(seq_cnt):
            sw = seqs[i]
            if sw is None or sw.consensus is None:
                continue
            np.clip(sw.pos_weight, 0, None, out=sw.pos_weight)
            sums = sw.pos_weight.sum(axis=1)
            nz = np.nonzero(sums > 0)[0]
            s = int(nz[0]) if len(nz) else -1
            e = int(nz[-1]) if len(nz) else 0
            zero_non_n = (sums == 0) & (
                np.frombuffer(sw.consensus.encode("ascii"), dtype=np.uint8)
                != ord("N")
            )
            sel = np.nonzero(zero_non_n)[0]
            codes = seq_to_codes(sw.consensus)
            sw.pos_weight[sel, codes[sel].astype(np.int64)] = 1
            if s + 10 > e:
                self.release_seq(i)
                continue
            if s > 0 or e < sw.consensus_len - 1:
                sw.pos_weight = sw.pos_weight[s : e + 1].copy()
                sw.consensus = sw.consensus[s : e + 1]

        self.clean(True)

        for i in range(len(self.seqs)):
            self.merge_overlapped_seq_contigs(i, False)
        self.novel_seq_similarity = backup_novel_similarity

        # Final resort by total weight (SeqSet.hpp:10804-10805).
        weights = {}
        for sw in self.seqs:
            weights[id(sw)] = int(sw.pos_weight.sum())

        def seq_less(a, b):
            wa, wb = weights[id(a)], weights[id(b)]
            if wa != wb:
                return wa > wb
            return a.consensus_len > b.consensus_len

        cxx_sort(self.seqs, seq_less)

    # ------------------------------------------------------------------
    # Contig-gap merge (SeqSet.hpp:5333-5394)
    # ------------------------------------------------------------------

    def merge_overlapped_seq_contigs(self, seq_idx: int, update_index: bool):
        sw = self.seqs[seq_idx]
        contigs = self.get_contig_intervals(sw.consensus)
        contig_cnt = len(contigs)
        if contig_cnt <= 1:
            return
        contig_overlaps: List[int] = []
        min_overlap = 10
        total_overlap = 0
        for i in range(contig_cnt - 1):
            a0, a1 = contigs[i]
            b0, b1 = contigs[i + 1]
            if a1 - a0 + 1 >= 75 and b1 - b0 + 1 >= 75:
                contig_overlaps.append(-1)
                continue
            overlap_size, offset, best_match = align_host.is_mate_overlap(
                sw.consensus[a0 : a1 + 1],
                sw.consensus[b0 : b1 + 1],
                min_overlap,
            )
            contig_overlaps.append(overlap_size)
            if overlap_size >= 0:
                total_overlap += overlap_size
        if total_overlap == 0:
            return

        cons = list(sw.consensus)
        w = sw.pos_weight
        move_left = 0
        for i in range(1, contig_cnt):
            need_move_gap = True
            if contig_overlaps[i - 1] >= 0:
                move_left += contig_overlaps[i - 1] + (
                    contigs[i][0] - contigs[i - 1][1] - 1
                )
                need_move_gap = False
            if move_left > 0:
                start = contigs[i][0]
                end = contigs[i][1]
                if need_move_gap:
                    start = contigs[i - 1][1] + 1
                for j in range(start, end + 1):
                    cons[j - move_left] = cons[j]
                    w[j - move_left] += w[j]
                    w[j] = 0
        new_len = sw.consensus_len - move_left
        sw.consensus = "".join(cons[:new_len])
        sw.pos_weight = w[:new_len].copy()
        self.update_consensus(seq_idx, update_index)

    # ------------------------------------------------------------------
    # Redundancy removal (SeqSet.hpp:2127-2250, 4965-4985)
    # ------------------------------------------------------------------

    def build_seq_substring_relation(self) -> List[Optional[Tuple[int, int]]]:
        """Returns per-seq (container_idx, start) or None.

        Dispatch: native single pass over the mirrored index
        (t4s_substring_relation) with this Python implementation as the
        oracle; TRUST4_TPU_SCORED=0 forces host,
        TRUST4_TPU_SUBSTR_CHECK=1 runs both and asserts equality."""
        import os as _os

        scored_on = _os.environ.get("TRUST4_TPU_SCORED", "1") != "0"
        check = _os.environ.get("TRUST4_TPU_SUBSTR_CHECK", "0") == "1"
        nat = self._native_sync() if scored_on else None
        if nat is not None:
            native_res = nat.substring_relation(len(self.seqs))
            if not check:
                return native_res
            host_res = self._bssr_host()
            assert native_res == host_res, (
                "substring-relation divergence: "
                f"native={native_res} host={host_res}"
            )
            return native_res
        return self._bssr_host()

    def _bssr_host(self) -> List[Optional[Tuple[int, int]]]:
        seq_cnt = len(self.seqs)
        subset_of: List[Optional[Tuple[int, int]]] = [None] * seq_cnt
        kl = self.kmer_length
        for k in range(seq_cnt):
            sw = self.seqs[k]
            if sw is None or sw.consensus is None:
                continue
            consensus = sw.consensus
            if len(consensus) < kl:
                return subset_of
            codes, valid = kmer_codes(consensus, kl)
            skip_limit = kl // 2
            skip_cnt = 0
            hit_cnt = 0
            seq_hit_cnt = {}
            first_seq_hit = {}
            n = len(codes)
            prev_code = 0
            for w in range(n):
                code = int(codes[w])
                if w == 1 or code != prev_code:
                    postings = (
                        self.seq_index.search(code, sw.barcode)
                        if valid[w]
                        else []
                    )
                    size = len(postings)
                    if size >= 100 and skip_cnt < skip_limit:
                        # continue skips the prev-code update, as in the
                        # reference (SeqSet.hpp:2172-2179).
                        skip_cnt += 1
                        continue
                    skip_cnt = 0
                    for idx, off in postings:
                        if idx == k or self.seqs[idx].barcode != sw.barcode:
                            continue
                        if idx in seq_hit_cnt:
                            if hit_cnt >= 50 and seq_hit_cnt[idx] < hit_cnt * 0.5:
                                del seq_hit_cnt[idx]
                            else:
                                seq_hit_cnt[idx] += 1
                        elif hit_cnt < 50:
                            seq_hit_cnt[idx] = 1
                            first_seq_hit[idx] = (w, off)
                    hit_cnt += 1
                prev_code = code

            # Reference iterates an ordered std::map (SeqSet.hpp:2209);
            # candidate order picks the container on ties (not output-
            # visible: remove_redundant_seq only tests None-ness).
            for idx in sorted(seq_hit_cnt):
                if seq_hit_cnt[idx] < hit_cnt * 0.6:
                    continue
                fa, fb = first_seq_hit[idx]
                if fb - fa < 0:
                    continue
                start = fb - fa
                if start + sw.consensus_len - 1 >= self.seqs[idx].consensus_len:
                    continue
                mismatch = 0
                other = self.seqs[idx].consensus
                ok = True
                for j in range(sw.consensus_len):
                    if consensus[j] != other[start + j]:
                        mismatch += 1
                    if mismatch >= 2:
                        ok = False
                        break
                if ok:
                    subset_of[k] = (idx, start)
                    break
        return subset_of

    def remove_redundant_seq(self) -> int:
        subset_of = self.build_seq_substring_relation()
        for i, sub in enumerate(subset_of):
            if sub is not None:
                self.release_seq(i)
        self.clean(True)
        return len(self.seqs)
