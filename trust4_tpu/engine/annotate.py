"""Annotation: align contigs/reads against the germline database and call
V/D/J/C genes (reference: SeqSet.hpp:6016-8500, AnnotateRead).

detail levels: 0 = gene overlaps only (assembler quick annotation);
1 = + cross-contig stitch, dominance cleanup, boundary extension;
2 = + CDR1/2/3 inference, D gene, secondary overlaps.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from trust4_tpu.align import host as align_host
from trust4_tpu.dna import dna_to_aa, revcomp
from trust4_tpu.engine.types import Overlap

EDIT_MATCH, EDIT_MISMATCH, EDIT_INSERT, EDIT_DELETE = 0, 1, 2, 3


class AnnotateMixin:
    # ------------------------------------------------------------------
    # Contig intervals (SeqSet.hpp:5289-5331)
    # ------------------------------------------------------------------

    def get_contig_intervals(self, read: str) -> List[Tuple[int, int]]:
        contigs: List[Tuple[int, int]] = []
        gap_n = self.gap_n
        n = len(read)
        i = 0
        while i < n:
            n_cnt = 0
            j = i + 1
            while j < n:
                if j >= i + gap_n and read[j - gap_n] == "N":
                    n_cnt -= 1
                if read[j] == "N":
                    n_cnt += 1
                if n_cnt >= gap_n:
                    break
                j += 1
            if j < n:
                contigs.append((i, j - gap_n))
            else:
                contigs.append((i, j - 1))
                break
            i = j + 1
        return contigs

    def get_contig_idx(self, pos: int, contigs) -> int:
        for i, (a, b) in enumerate(contigs):
            if a <= pos <= b:
                return i
        return 0

    def has_motif(self, read: str, strand: int) -> int:
        """YYC / [FW]GxG scan over 3 frames (SeqSet.hpp:5029-5074).

        Reference quirk: the reverse complement computed for strand -1 is
        never actually used — the scan always runs on the original read."""
        if strand == 0:
            return 0
        length = len(read)
        ret = 0
        for k in range(3):
            aa = [
                dna_to_aa(read[i], read[i + 1], read[i + 2])
                for i in range(k, length - 2, 3)
            ]
            j = len(aa)
            for i in range(j - 2):
                if aa[i] == "Y" and aa[i + 1] == "Y" and aa[i + 2] == "C":
                    ret |= 2
                    break
            for i in range(j - 3):
                if aa[i] in "FW" and aa[i + 1] == "G" and aa[i + 3] == "G":
                    ret |= 1
                    break
        return ret

    # ------------------------------------------------------------------
    # Gene ranking (SeqSet.hpp:5160-5287)
    # ------------------------------------------------------------------

    def is_better_gene_match(self, a: Overlap, b: Overlap, threshold: float) -> bool:
        from trust4_tpu.engine.seqset import (
            get_gene_type,
            is_same_gene_allele,
        )

        match_cnt = a.match_cnt
        gap_allow = self.kmer_length + 1
        if threshold >= 1:
            gap_allow = 3
        if a.seq_idx == -1:
            return False
        if b.seq_idx == -1:
            return True
        gene_type = get_gene_type(self.seqs[a.seq_idx].name)
        if gene_type == 2:
            a_len = self.seqs[a.seq_idx].consensus_len
            b_len = self.seqs[b.seq_idx].consensus_len
            if a.seq_end >= a_len - gap_allow and b.seq_end >= b_len - gap_allow:
                if a.similarity - 0.1 > b.similarity and a.match_cnt > b.match_cnt - 20:
                    directly_better = True
                    if a.seq_end - a.seq_start < b.seq_end - b.seq_start:
                        mismatch_cnt = 0
                        ca = self.seqs[a.seq_idx].consensus
                        cb = self.seqs[b.seq_idx].consensus
                        i, j = a.seq_end, b.seq_end
                        while i >= a.seq_start:
                            if ca[i] != cb[j]:
                                mismatch_cnt += 1
                            i -= 1
                            j -= 1
                        if mismatch_cnt <= 1:
                            directly_better = False
                    if directly_better:
                        return True
                elif a.similarity + 0.1 < b.similarity and a.match_cnt <= b.match_cnt - 20:
                    return False
            elif (
                a.seq_end >= a_len - gap_allow
                and a.read_end >= a_len
                and threshold < 1
            ):
                return True
        elif gene_type == 0:
            if threshold == 1:
                ia = self.seqs[a.seq_idx].info[2][0]
                ib = self.seqs[b.seq_idx].info[2][0]
                if (
                    a.seq_end >= ia
                    and b.seq_end >= ib
                    and ia != -1
                    and ib != -1
                    and abs(a.read_start - b.read_start) <= 5
                    and a.indel_cnt < b.indel_cnt
                    and (b.similarity < 0.9 or a.indel_cnt == 0)
                ):
                    if (
                        a.similarity > b.similarity + 0.03
                        or (a.similarity > b.similarity and a.read_start < b.read_start)
                    ) and (
                        a.match_cnt > b.match_cnt - 20 or a.seq_start <= b.seq_start
                    ):
                        return True
            else:
                if a.indel_cnt == 0 and b.indel_cnt > 0 and a.similarity > b.similarity:
                    return True

        if a.read_start == b.read_start and a.read_end == b.read_end:
            if a.similarity > b.similarity:
                return True
            elif a.similarity < b.similarity:
                return False
            else:
                name = self.seqs[b.seq_idx].name
                for i in range(len(name) - 1):
                    if (
                        (name[i + 1] == "-" or name[i + 1] == "*")
                        and not ("0" <= name[i] <= "9")
                        and gene_type != 3
                    ):
                        return True
                    if name[i] == "O" and name[i + 1] == "R":
                        return True

        if threshold == 1.0 and is_same_gene_allele(
            self.seqs[a.seq_idx].name, self.seqs[b.seq_idx].name
        ):
            if (
                (a.seq_end - a.seq_start + 1) / self.seqs[a.seq_idx].consensus_len
                >= (b.seq_end - b.seq_start + 1) / self.seqs[b.seq_idx].consensus_len
                and a.similarity > b.similarity
            ):
                return True

        if match_cnt > b.match_cnt * threshold:
            return True
        elif threshold < 1.0 and (
            a.match_cnt + 10 >= b.match_cnt
            or (
                a.similarity > b.similarity + 0.01
                and a.match_cnt + 2 * self.kmer_length >= b.match_cnt
            )
        ):
            return True
        return False

    # ------------------------------------------------------------------
    # AnnotateRead (SeqSet.hpp:6016-8500)
    # ------------------------------------------------------------------

    def annotate_read(
        self,
        read: str,
        detail_level: int,
        secondary_gene_overlaps: Optional[List[Overlap]] = None,
    ):
        """Returns (ret, gene_overlap[4], cdr[3], read) — read may be
        modified by detail>=1 gap handling in the reference; we return it
        unchanged (M-masking is internal)."""
        from trust4_tpu.engine.seqset import get_gene_type

        gene_overlap = [Overlap() for _ in range(4)]
        cdr = [Overlap() for _ in range(3)]
        for g in gene_overlap:
            g.seq_idx = -1
            g.strand = 1

        length = len(read)
        contigs = self.get_contig_intervals(read)
        contig_cnt = len(contigs)

        contig_overlaps: List[List[Overlap]] = []
        for (a, b) in contigs:
            sub = read[a : b + 1]
            ovs: List[Overlap] = []
            self.get_overlaps_from_read(
                sub, 0, -1, 0 if detail_level == 0 else 1, False, ovs
            )
            for o in ovs:
                o.read_start += a
                o.read_end += a
            ovs.sort(key=lambda o: o.sort_key())
            contig_overlaps.append(ovs)

        # Cross-contig overlap stitching (SeqSet.hpp:6070-6165).
        if detail_level >= 1:
            extended_overlaps = [
                [Overlap(**o.__dict__) for o in ovs] for ovs in contig_overlaps
            ]
            for k in range(contig_cnt):
                seq_used = {}
                ovs = extended_overlaps[k]
                for i in range(len(ovs)):
                    if seq_used.get(ovs[i].seq_idx) is not None or ovs[i].similarity < 0.95:
                        continue
                    effective_len = (
                        ovs[i].read_end - ovs[i].read_start + 1
                        + ovs[i].seq_end - ovs[i].seq_start + 1
                    )
                    extended_times = 0
                    for j in range(k - 1, -1, -1):
                        extended = False
                        for o in contig_overlaps[j]:
                            if o.seq_idx == ovs[i].seq_idx:
                                if (
                                    o.seq_end < ovs[i].seq_start + 31
                                    and ovs[i].read_start <= contigs[j + 1][0] + 10
                                    and o.read_end >= contigs[j][1] - 10
                                    and o.similarity >= 0.95
                                ):
                                    ovs[i].read_start = o.read_start
                                    ovs[i].seq_start = o.seq_start
                                    ovs[i].match_cnt += o.match_cnt
                                    effective_len += (
                                        o.read_end - o.read_start + 1
                                        + o.seq_end - o.seq_start + 1
                                    )
                                    extended = True
                                    extended_times += 1
                                    break
                        if not extended:
                            break
                    for j in range(k + 1, contig_cnt):
                        extended = False
                        for o in contig_overlaps[j]:
                            if o.seq_idx == ovs[i].seq_idx:
                                if (
                                    o.seq_start > ovs[i].seq_end - 31
                                    and ovs[i].read_end >= contigs[j - 1][1] - 10
                                    and o.read_start <= contigs[j][0] + 10
                                    and o.similarity >= 0.95
                                ):
                                    ovs[i].read_end = o.read_end
                                    ovs[i].seq_end = o.seq_end
                                    ovs[i].match_cnt += o.match_cnt
                                    effective_len += (
                                        o.read_end - o.read_start + 1
                                        + o.seq_end - o.seq_start + 1
                                    )
                                    extended = True
                                    extended_times += 1
                                    break
                        if not extended:
                            break
                    ovs[i].similarity = ovs[i].match_cnt / effective_len
                    if extended_times > 0:
                        seq_used[ovs[i].seq_idx] = i
            contig_overlaps = extended_overlaps

        overlaps: List[Overlap] = []
        for ovs in contig_overlaps:
            overlaps.extend(ovs)
        overlaps.sort(key=lambda o: o.sort_key())
        overlap_cnt = len(overlaps)

        gene_similarity = [0.8, 0.8, 0.8, 0.8]
        # Lower per-gene similarity cutoff when the best preliminary hit is
        # short (SeqSet.hpp:6181-6205).
        if detail_level >= 1:
            gene_used = [-1, -1, -1, -1]
            gene_compared = [0, 0, 0, 0]
            for i in range(overlap_cnt):
                gene_type = get_gene_type(self.seqs[overlaps[i].seq_idx].name)
                if gene_type < 0 or gene_compared[gene_type] == 1:
                    continue
                if gene_used[gene_type] == -1:
                    gene_used[gene_type] = i
                else:
                    if overlaps[i].similarity >= gene_similarity[gene_type]:
                        base = overlaps[gene_used[gene_type]]
                        if (
                            base.similarity < gene_similarity[gene_type]
                            and overlaps[i].match_cnt
                            <= base.match_cnt - 4 * self.hit_len_required
                        ):
                            gene_similarity[gene_type] = base.similarity
                        gene_compared[gene_type] = 1

        # Per-seq dominance filter + J-gene tie-break (SeqSet.hpp:6207-6248).
        seq_used = {}
        kept: List[Overlap] = []
        for i in range(overlap_cnt):
            o = overlaps[i]
            gene_type = get_gene_type(self.seqs[o.seq_idx].name)
            if gene_type < 0 or gene_type == 1:
                continue
            if (
                seq_used.get(o.seq_idx) is None
                and o.similarity >= gene_similarity[gene_type]
            ):
                seq_used[o.seq_idx] = len(kept)
                kept.append(o)
            elif seq_used.get(o.seq_idx) is not None and gene_type == 2:
                baseline = kept[seq_used[o.seq_idx]]
                if (
                    o.match_cnt == baseline.match_cnt
                    and o.similarity == baseline.similarity
                ):
                    cj = next(
                        (
                            j
                            for j in range(len(kept))
                            if get_gene_type(self.seqs[kept[j].seq_idx].name) == 3
                        ),
                        -1,
                    )
                    if cj != -1:
                        cstart = kept[cj].read_start
                        if o.read_end <= cstart + 3:
                            if baseline.read_end > cstart + 3 or abs(
                                o.read_end - cstart
                            ) < abs(baseline.read_end - cstart):
                                kept[seq_used[o.seq_idx]] = o
        overlaps = kept
        overlap_cnt = len(overlaps)
        if overlap_cnt == 0:
            return 0, gene_overlap, cdr

        # Gene coverage with B/T-cell + chain locking (SeqSet.hpp:6258-6304).
        all_overlaps: List[Overlap] = []
        bt = ""
        chain = ""
        for i in range(overlap_cnt):
            o = overlaps[i]
            name = self.seqs[o.seq_idx].name
            if bt and name[0] != bt:
                continue
            bt = name[0]
            if chain and not (
                name[2] == chain
                or (name[2] == "D" and chain == "A")
                or (name[2] == "A" and chain == "D")
            ):
                continue
            chain = name[2]
            gene_type = get_gene_type(name)
            if gene_type >= 0 and gene_overlap[gene_type].seq_idx == -1:
                gene_overlap[gene_type] = o
            if gene_type >= 0 and (
                self.is_better_gene_match(o, gene_overlap[gene_type], 0.95)
                or (
                    gene_overlap[gene_type].seq_idx != -1
                    and o.similarity - 0.1 > gene_overlap[gene_type].similarity
                )
            ):
                all_overlaps.append(o)
            elif (
                gene_type >= 0
                and gene_overlap[gene_type].seq_idx != -1
                and (
                    o.read_end < gene_overlap[gene_type].read_start
                    or o.read_start > gene_overlap[gene_type].read_end
                )
                and self.is_better_gene_match(o, gene_overlap[gene_type], 0.9)
            ):
                all_overlaps.append(o)
            elif (
                gene_type >= 0
                and gene_overlap[gene_type].seq_idx != -1
                and o.info_from_hits < gene_overlap[gene_type].info_from_hits
            ):
                all_overlaps.append(o)

        # Random C-gene match check (SeqSet.hpp:6307-6337).
        g3 = gene_overlap[3]
        if (
            g3.seq_idx != -1
            and g3.read_end - g3.read_start + 1 <= length / 2
            and g3.read_end - g3.read_start + 1 <= 50
        ):
            hit = -1
            for i in range(3):
                gi = gene_overlap[i]
                if (
                    gi.seq_idx >= 0
                    and (
                        gi.read_end - 17 > g3.read_start
                        or g3.read_end < gi.read_end
                    )
                    and g3.seq_start >= 100
                ):
                    gene_overlap[3] = Overlap()
                    gene_overlap[3].seq_idx = -1
                    hit = i
                    break
            if hit != -1 and detail_level >= 1:
                all_overlaps = [
                    o
                    for o in all_overlaps
                    if get_gene_type(self.seqs[o.seq_idx].name) != 3
                ]

        masked = read
        if detail_level >= 1:
            gene_overlap, all_overlaps, masked = self._annotate_detail1(
                read, contigs, gene_overlap, all_overlaps, detail_level
            )

        if detail_level >= 2:
            self._annotate_cdr(masked, contigs, gene_overlap, cdr, all_overlaps)
            if cdr[2].similarity > 0:
                self.annotate_read_d_gene(masked, gene_overlap, cdr, secondary_gene_overlaps)

        # Secondary assignments (SeqSet.hpp:8412-8476).
        if secondary_gene_overlaps is not None:
            from trust4_tpu.engine.seqset import is_same_gene_allele

            for i in (0, 2, 3):
                if gene_overlap[i].seq_idx == -1:
                    continue
                seq_idx = gene_overlap[i].seq_idx
                report_cnt = 0
                used_seq_idx: List[int] = []
                for o in all_overlaps:
                    if get_gene_type(self.seqs[o.seq_idx].name) != i:
                        continue
                    seq_idx2 = o.seq_idx
                    if seq_idx2 == seq_idx or not self.is_better_gene_match(
                        o, gene_overlap[i], 0.95
                    ):
                        continue
                    if is_same_gene_allele(
                        self.seqs[seq_idx].name, self.seqs[seq_idx2].name
                    ):
                        continue
                    if any(
                        is_same_gene_allele(
                            self.seqs[u].name, self.seqs[seq_idx2].name
                        )
                        for u in used_seq_idx
                    ):
                        continue
                    report_cnt += 1
                    secondary_gene_overlaps.append(o)
                    used_seq_idx.append(o.seq_idx)
                    if report_cnt >= 2:
                        break

        return 1, gene_overlap, cdr

    # -- detail>=1: inconsistency cleanup + boundary extension ----------

    def _annotate_detail1(
        self, read, contigs, gene_overlap, all_overlaps, detail_level
    ):
        from trust4_tpu.engine.seqset import get_gene_type

        length = len(read)
        contig_cnt = len(contigs)

        # Inconsistent gene hits (SeqSet.hpp:6339-6372).  The reference
        # clobbers the outer loop variable with the compaction loop, so after
        # a removal the outer scan resumes at old_allOverlaps_size + 1 — a
        # quirk we replicate exactly.
        i = 0
        while i < 4:
            if i == 1 or gene_overlap[i].seq_idx == -1:
                i += 1
                continue
            removed_resume = -1
            for j in range(4):
                if j == 1 or i == j or gene_overlap[j].seq_idx == -1:
                    continue
                if (
                    j < i and gene_overlap[j].read_end > gene_overlap[i].read_end
                ) or (j > i and gene_overlap[i].read_end > gene_overlap[j].read_end):
                    remove_type = i
                    if gene_overlap[j].similarity < gene_overlap[i].similarity:
                        remove_type = j
                    gene_overlap[remove_type] = Overlap()
                    gene_overlap[remove_type].seq_idx = -1
                    removed_resume = len(all_overlaps) + 1
                    all_overlaps = [
                        o
                        for o in all_overlaps
                        if get_gene_type(self.seqs[o.seq_idx].name) != remove_type
                    ]
                    break
            i = removed_resume if removed_resume >= 0 else i + 1

        all_overlaps = [
            o
            for o in all_overlaps
            if not (
                o.read_end
                <= gene_overlap[get_gene_type(self.seqs[o.seq_idx].name)].read_start
                or o.read_start
                >= gene_overlap[get_gene_type(self.seqs[o.seq_idx].name)].read_end
            )
        ]

        # Mask contig gaps with 'M' (SeqSet.hpp:6392-6397).
        chars = list(read)
        for i in range(contig_cnt - 1):
            for j in range(contigs[i][1] + 1, contigs[i + 1][0]):
                chars[j] = "M"
        masked = "".join(chars)

        # Boundary extension with one-end DP (SeqSet.hpp:6399-6523).
        for o in all_overlaps:
            seq_idx = o.seq_idx
            cons = self.seqs[seq_idx].consensus
            cons_len = self.seqs[seq_idx].consensus_len
            gene_type = get_gene_type(self.seqs[seq_idx].name)

            adjust = 0.25 if gene_type == 2 else 1.0
            _, align = align_host.global_alignment_one_end(
                cons[o.seq_end + 1 :],
                masked[o.read_end + 1 :],
                0,
                adjust,
            )
            for a in align:
                if o.read_end + 1 < length and masked[o.read_end + 1] == "M":
                    break
                if a in (EDIT_MATCH, EDIT_MISMATCH):
                    o.read_end += 1
                    o.seq_end += 1
                    if a == EDIT_MATCH:
                        o.match_cnt += 2
                elif self.radius > 0:
                    if a == EDIT_INSERT:
                        o.read_end += 1
                    elif a == EDIT_DELETE:
                        o.seq_end += 1
                    o.indel_cnt += 1
                else:
                    break

            # Forced small-gap right extension for J (SeqSet.hpp:6446-6461).
            if gene_type == 2 and cons_len - o.seq_end - 1 > 0 and (
                cons_len - o.seq_end - 1 < 5 or length - o.read_end - 1 < 5
            ):
                extend_len = cons_len - o.seq_end - 1
                j = 0
                while j < extend_len:
                    if o.read_end + j + 1 >= length:
                        break
                    if masked[o.read_end + j + 1] == cons[o.seq_end + j + 1]:
                        o.match_cnt += 2
                    j += 1
                o.read_end += j
                o.seq_end += j

            adjust = 0.25 if gene_type in (0, 3) else 1.0
            rvs = cons[: o.seq_start][::-1]
            rvr = masked[: o.read_start][::-1]
            _, align = align_host.global_alignment_one_end(rvs, rvr, 0, adjust)
            for a in align:
                if o.read_start >= 1 and masked[o.read_start - 1] == "M":
                    break
                if a in (EDIT_MATCH, EDIT_MISMATCH):
                    o.read_start -= 1
                    o.seq_start -= 1
                    if a == EDIT_MATCH:
                        o.match_cnt += 2
                elif self.radius > 0:
                    if a == EDIT_INSERT:
                        o.read_start -= 1
                    elif a == EDIT_DELETE:
                        o.seq_start -= 1
                    o.indel_cnt += 1
                else:
                    break

            # Forced small-gap left extension for V/C (SeqSet.hpp:6504-6518).
            if gene_type in (0, 3) and (o.seq_start < 5 or o.read_start < 5):
                extend_len = o.seq_start
                j = 0
                while j < extend_len:
                    if o.read_start - j - 1 < 0:
                        break
                    if masked[o.read_start - j - 1] == cons[o.seq_start - j - 1]:
                        o.match_cnt += 2
                    j += 1
                o.read_start -= j
                o.seq_start -= j

            o.similarity = o.match_cnt / (
                o.seq_end - o.seq_start + 1 + o.read_end - o.read_start + 1
            )

        # Cross-contig partial exact rescue (SeqSet.hpp:6529-6575).
        if detail_level >= 2:
            locate_min_len = 8
            for o in all_overlaps:
                seq_idx = o.seq_idx
                cons = self.seqs[seq_idx].consensus
                gene_type = get_gene_type(self.seqs[seq_idx].name)
                if (
                    gene_type == 0
                    and o.read_end + 1 < length
                    and masked[o.read_end + 1] == "M"
                ):
                    contig_idx = self.get_contig_idx(o.read_end, contigs) + 1
                    if contig_idx < len(contigs):
                        ca, cb = contigs[contig_idx]
                        gene_offset, match_len = (
                            align_host.locate_partial_suf_pref_exact_match(
                                cons[o.seq_end + 1 :],
                                masked[ca : cb + 1],
                                locate_min_len,
                            )
                        )
                        if gene_offset != -1:
                            tmp = (
                                o.seq_end - o.seq_start + 1
                                + o.read_end - o.read_start + 1
                            )
                            o.read_end = ca + match_len - 1
                            o.seq_end = o.seq_end + 1 + gene_offset + match_len - 1
                            o.match_cnt += 2 * match_len
                            o.similarity = o.match_cnt / (tmp + 2 * match_len)
                elif (
                    gene_type == 2
                    and o.read_start > 0
                    and masked[o.read_start - 1] == "M"
                ):
                    contig_idx = self.get_contig_idx(o.read_start, contigs) - 1
                    if contig_idx >= 0:
                        ca, cb = contigs[contig_idx]
                        gene_offset, match_len = (
                            align_host.locate_partial_suf_suf_exact_match(
                                cons[: o.seq_start],
                                masked[ca : cb + 1],
                                locate_min_len,
                            )
                        )
                        if gene_offset != -1:
                            tmp = (
                                o.seq_end - o.seq_start + 1
                                + o.read_end - o.read_start + 1
                            )
                            o.read_start = cb - match_len + 1
                            o.seq_start = gene_offset
                            o.match_cnt += 2 * match_len
                            o.similarity = o.match_cnt / (tmp + 2 * match_len)

        all_overlaps.sort(key=lambda o: o.sort_key())
        for i in range(4):
            gene_overlap[i] = Overlap()
            gene_overlap[i].seq_idx = -1
            gene_overlap[i].match_cnt = -1

        for o in all_overlaps:
            gene_type = get_gene_type(self.seqs[o.seq_idx].name)
            if self.is_better_gene_match(o, gene_overlap[gene_type], 1.0):
                gene_overlap[gene_type] = o

        # V-coordinate sanity override given good J,C (SeqSet.hpp:6662-6700).
        g0, g2, g3 = gene_overlap[0], gene_overlap[2], gene_overlap[3]
        if g0.seq_idx != -1 and g2.seq_idx != -1 and g3.seq_idx != -1:
            if (
                g2.read_end + 3 >= g3.read_start
                and g2.read_end - 3 <= g3.read_start
                and (
                    g0.read_end > g2.read_start + 6
                    or (
                        g0.read_end
                        + (
                            self.seqs[g0.seq_idx].consensus_len
                            - g0.seq_end
                            - 100
                        )
                        > g2.read_start + 6
                        and self.get_contig_idx(g0.read_end, contigs)
                        == self.get_contig_idx(g2.read_start, contigs)
                    )
                )
            ):
                gene_overlap[0] = Overlap()
                gene_overlap[0].seq_idx = -1
                gene_overlap[0].match_cnt = -1
                for o in all_overlaps:
                    if get_gene_type(self.seqs[o.seq_idx].name) != 0:
                        continue
                    if (
                        o.read_end <= g2.read_start + 6
                        and o.read_end
                        + (
                            self.seqs[o.seq_idx].consensus_len
                            - o.seq_end
                            - 100
                        )
                        <= g2.read_start + 6
                        and (
                            gene_overlap[0].seq_idx == -1
                            or self.is_better_gene_match(o, gene_overlap[0], 1.0)
                        )
                    ):
                        gene_overlap[0] = o
            elif (
                g2.read_end + 3 >= g3.read_start
                and g2.read_end - 3 <= g3.read_start
                and g0.seq_end + 100 < self.seqs[g0.seq_idx].consensus_len
                and g0.read_end - g0.read_start + 1 <= 50
            ):
                gene_overlap[0] = Overlap()
                gene_overlap[0].seq_idx = -1

        return gene_overlap, all_overlaps, masked

    def _annotate_cdr(self, read, contigs, gene_overlap, cdr, all_overlaps):
        raise NotImplementedError("detail level 2 lands with the annotator binary")

    def annotate_read_d_gene(self, read, gene_overlap, cdr, secondary):
        raise NotImplementedError("detail level 2 lands with the annotator binary")
