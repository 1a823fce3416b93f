"""Annotation: align contigs/reads against the germline database and call
V/D/J/C genes (reference: SeqSet.hpp:6016-8500, AnnotateRead).

detail levels: 0 = gene overlaps only (assembler quick annotation);
1 = + cross-contig stitch, dominance cleanup, boundary extension;
2 = + CDR1/2/3 inference, D gene, secondary overlaps.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
from dataclasses import replace as _dc_replace

from trust4_tpu.align import host as align_host
from trust4_tpu.dna import dna_to_aa, revcomp
from trust4_tpu.utils.cxxsort import cxx_sort
from trust4_tpu.engine.types import Overlap

EDIT_MATCH, EDIT_MISMATCH, EDIT_INSERT, EDIT_DELETE = 0, 1, 2, 3


class G8View:
    """Lazy ``gene_overlap[4]``: wraps one read's native annotate0 row
    block ((4,8) ints + (4,) sims as plain lists) and materializes the
    Overlap objects only on first element access.  Most bulk reads are
    only ever asked ``gene_overlap[0].seq_idx == -1`` (served by
    ``first_seq_idx`` without materializing) and marshaled back into the
    native greedy loop (served from the raw rows, vectorized across the
    batch) — skipping ~1s of object builds per 100k reads.  ``a0`` is
    the read's row index in the batch's stashed (n,4,8) array; ``dirty``
    is set by the germline trims when they mutate the materialized
    objects, telling the vectorized marshal to re-read that read the
    slow way."""

    __slots__ = ("rows", "sims", "a0", "_mat", "dirty")

    def __init__(self, rows, sims, a0: int):
        self.rows = rows
        self.sims = sims
        self.a0 = a0
        self._mat = None
        self.dirty = False

    def _materialize(self):
        if self._mat is None:
            self._mat = overlaps_from_g8(self.rows, self.sims)
        return self._mat

    def __getitem__(self, g):
        return self._materialize()[g]

    def __iter__(self):
        return iter(self._materialize())

    def __len__(self):
        return 4

    @property
    def first_seq_idx(self) -> int:
        if self._mat is not None:
            return self._mat[0].seq_idx
        return self.rows[0][0]


def overlaps_from_g8(rows, sims) -> List[Overlap]:
    """Build gene_overlap[4] from a native annotate0 (4,8)+(4,) result.

    __new__ + attribute stores skip the dataclass __init__ (~2x cheaper;
    this runs once per assembled read on the 100k corpora)."""
    out = []
    for g in range(4):
        r8 = rows[g]
        o = Overlap.__new__(Overlap)
        o.seq_idx = int(r8[0])
        o.read_start = int(r8[1])
        o.read_end = int(r8[2])
        o.strand = int(r8[3])
        o.seq_start = int(r8[4])
        o.seq_end = int(r8[5])
        o.match_cnt = int(r8[6])
        o.indel_cnt = int(r8[7])
        o.similarity = float(sims[g])
        o.hit_coords = None
        o.info = None
        o.info_from_hits = 0
        o.coord_ref = None
        out.append(o)
    return out


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
        """Returns (ret, gene_overlap[4], cdr[3]).

        Detail-0 (quick annotation) runs natively end-to-end
        (native/overlap_engine.cpp annotate_detail0); the host code in
        _annotate_read_host is the oracle (TRUST4_TPU_SCORED=0 forces it,
        TRUST4_TPU_SCORED_CHECK=1 runs both and asserts field equality)."""
        if detail_level == 0:
            import os as _os

            scored_on = _os.environ.get("TRUST4_TPU_SCORED", "1") != "0"
            check = _os.environ.get("TRUST4_TPU_SCORED_CHECK", "0") == "1"
            nat = self._native_sync() if scored_on else None
            if nat is not None:
                rows, sims = nat.annotate0(
                    read, self.radius, self.hit_len_required,
                    self.is_long_seq_set, self.nomatch_gap_limit,
                    self.novel_seq_similarity, self.ref_seq_similarity,
                    self.repeat_similarity, self.gap_n,
                )
                go = overlaps_from_g8(rows, sims)
                if check:
                    ret_h, go_h, cdr_h = self._annotate_read_host(
                        read, 0, secondary_gene_overlaps
                    )
                    got = [
                        (o.seq_idx, o.read_start, o.read_end, o.strand,
                         o.seq_start, o.seq_end, o.match_cnt, o.indel_cnt,
                         o.similarity)
                        for o in go_h
                    ]
                    want = [
                        (o.seq_idx, o.read_start, o.read_end, o.strand,
                         o.seq_start, o.seq_end, o.match_cnt, o.indel_cnt,
                         o.similarity)
                        for o in go
                    ]
                    assert got == want, (
                        f"annotate0 mismatch for {read[:40]}...: "
                        f"host={got} native={want}"
                    )
                    return ret_h, go_h, cdr_h
                return 1, go, [Overlap() for _ in range(3)]
        return self._annotate_read_host(
            read, detail_level, secondary_gene_overlaps
        )

    def _annotate_read_host(
        self,
        read: str,
        detail_level: int,
        secondary_gene_overlaps: Optional[List[Overlap]] = None,
    ):
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
            # std::sort (unstable): full-key ties between duplicate
            # cross-contig entries are ordered by libstdc++'s introsort,
            # which decides infoFromHits-based admissions downstream.
            # Keys are precomputed; the tie permutation depends only on
            # comparator outcomes, so pair-sorting is equivalent.
            keyed = [(o.sort_key(), o) for o in ovs]
            cxx_sort(keyed, lambda x, y: x[0] < y[0])
            ovs[:] = [o for _, o in keyed]
            contig_overlaps.append(ovs)

        # Cross-contig overlap stitching (SeqSet.hpp:6070-6165).
        if detail_level >= 1:
            extended_overlaps = [
                [_dc_replace(o) for o in ovs] for ovs in contig_overlaps
            ]
            for k in range(contig_cnt):
                seq_used = {}
                ovs = extended_overlaps[k]
                # Reference quirk (SeqSet.hpp:6081): extendedTimes is
                # declared per CONTIG, so once any entry extends, every
                # later entry in this contig marks seqUsed too.
                extended_times = 0
                for i in range(len(ovs)):
                    if seq_used.get(ovs[i].seq_idx) is not None or ovs[i].similarity < 0.95:
                        continue
                    effective_len = (
                        ovs[i].read_end - ovs[i].read_start + 1
                        + ovs[i].seq_end - ovs[i].seq_start + 1
                    )
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
        keyed = [(o.sort_key(), o) for o in overlaps]
        cxx_sort(keyed, lambda x, y: x[0] < y[0])
        overlaps = [o for _, o in keyed]
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
            and g3.read_end - g3.read_start + 1 <= length // 2
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

        keyed = [(o.sort_key(), o) for o in all_overlaps]
        cxx_sort(keyed, lambda x, y: x[0] < y[0])
        all_overlaps[:] = [o for _, o in keyed]
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

    # ------------------------------------------------------------------
    # CDR1/2/3 inference (SeqSet.hpp:6707-8392)
    # ------------------------------------------------------------------

    def _annotate_cdr(self, read, contigs, gene_overlap, cdr, all_overlaps):
        """Infer CDR1/2 via V alignment and CDR3 via the anchor/motif
        decision forest.  ``read`` is the M-masked consensus.  Mutates
        gene_overlap, cdr, and all_overlaps (short-anchor rescues)."""
        from trust4_tpu.engine.seqset import get_gene_type, is_same_chain_type

        length = len(read)
        seqs = self.seqs
        locate_partial_min_len = 8

        def ch(i: int) -> str:
            return read[i] if 0 <= i < length else "\0"

        def aa(i: int) -> str:
            return dna_to_aa(ch(i), ch(i + 1), ch(i + 2))

        v_align = None

        def get_v_align():
            nonlocal v_align
            if v_align is None:
                vg = gene_overlap[0]
                cons = seqs[vg.seq_idx].consensus
                _, v_align = align_host.global_alignment(
                    cons[vg.seq_start : vg.seq_end + 1],
                    read[vg.read_start : vg.read_end + 1],
                )
            return v_align

        # -- CDR1/2 (SeqSet.hpp:6713-6770) --
        if gene_overlap[0].seq_idx != -1 and (
            gene_overlap[2].seq_idx == -1
            or gene_overlap[0].read_start < gene_overlap[2].read_start
        ):
            vg = gene_overlap[0]
            va = get_v_align()
            for cdr_idx in (0, 1):
                info = seqs[vg.seq_idx].info[cdr_idx]
                seq_range_start, seq_range_end = info[0], info[1]
                if vg.seq_start <= seq_range_start and vg.seq_end >= seq_range_end:
                    i = vg.read_start - 1
                    j = vg.seq_start - 1
                    read_range_start = read_range_end = 0
                    match_cnt = 0
                    for a in va:
                        if a != EDIT_DELETE:
                            i += 1
                        if a != EDIT_INSERT:
                            j += 1
                        if j == seq_range_start:
                            read_range_start = i
                        if j >= seq_range_start and a == EDIT_MATCH:
                            match_cnt += 2
                        if j == seq_range_end:
                            read_range_end = i
                            break
                    cdr[cdr_idx].seq_idx = vg.seq_idx
                    cdr[cdr_idx].read_start = read_range_start
                    cdr[cdr_idx].read_end = read_range_end
                    cdr[cdr_idx].match_cnt = match_cnt
                    cdr[cdr_idx].similarity = match_cnt / (
                        read_range_end - read_range_start + 1
                        + seq_range_end - seq_range_start + 1
                    )

        # -- CDR3 (SeqSet.hpp:6775-8391) --
        cdr3_score = 0.0
        bound_s, bound_e = 0, length - 2
        rng = 37
        strong_locate_s = strong_locate_e = False
        contig_cnt = len(contigs)
        g0, g2, g3 = gene_overlap[0], gene_overlap[2], gene_overlap[3]

        def wfgxxg_at(i: int) -> bool:
            return (
                aa(i) in "WF" and aa(i + 3) == "G" and aa(i + 9) == "G"
            )

        if g0.seq_idx != -1 and g2.seq_idx != -1:
            if g2.read_end > g0.read_end:
                start_frame = g0.seq_start % 3
                ns = g0.read_end
                s = ns - (ns - g0.read_start + start_frame) % 3
                s = s + 6 if s + 6 < length else s
                e = g2.read_start
                e = e - 6 if e - 6 >= 0 else e
                locate = -1
                i = e
                while i < g2.read_end and i + 11 < length:
                    if wfgxxg_at(i):
                        locate = i
                        break
                    i += 1
                if locate != -1:
                    e = locate
                if e < s + 12:
                    rng += 15
                if s - rng > bound_s:
                    bound_s = s - rng
                if e + rng < bound_e:
                    bound_e = e + rng
                if locate != -1:
                    s = s + (e - s) % 3
                    if (
                        s < e - 18
                        and g0.seq_end < seqs[g0.seq_idx].consensus_len - 31
                    ):
                        s = e - 18
                far = any(ch(i) == "M" for i in range(s, e + 1))
                if far:
                    if (
                        seqs[g0.seq_idx].info[2][0] != -1
                        and g0.seq_end < seqs[g0.seq_idx].info[2][0]
                    ):
                        s = e - 18
                    if (
                        seqs[g2.seq_idx].info[2][0] != -1
                        and g2.seq_start > seqs[g0.seq_idx].info[2][0]
                    ):
                        e = s + 18
            else:
                s = 0
                e = length
                bound_s = 1
        elif g2.seq_idx != -1:
            e = g2.read_start
            e = e - 6 if e - 6 >= 0 else e
            s = e - 12
            if s - 31 > bound_s:
                bound_s = s - 31
            locate = -1
            i = e
            while i < bound_e and i + 11 < length:
                if wfgxxg_at(i):
                    locate = i
                    break
                i += 1
            if locate != -1:
                e = locate
                s = e - 12
                if s < 0:
                    s = 0
        elif (
            g0.seq_idx != -1
            and g0.seq_end >= seqs[g0.seq_idx].consensus_len - 50
        ):
            start_frame = g0.seq_start % 3
            s = g0.read_end + (g0.read_end - g0.read_start - start_frame) % 3
            s = s + 6 if s + 6 < length else s
            if s >= length:
                s -= 3
            e = s + 12
            if s - 31 > bound_s:
                bound_s = s - 31
            locate = -1
            if g3.seq_idx != -1:
                bound_e = g3.read_start - 2
            i = e
            while i < bound_e and i + 11 < length:
                if wfgxxg_at(i):
                    locate = i
                    break
                i += 1
            if locate != -1:
                e = locate
                s = e - 12
                if s < 0:
                    s = 0
        else:
            s = 0
            e = length
            bound_s = 1

        if g2.seq_idx != -1 and bound_e > g2.read_end:
            bound_e = g2.read_end
        if s >= bound_s:
            for i in range(s, bound_s - 1, -1):
                if ch(i) == "M":
                    bound_s = i + 1
                    break
        if e <= bound_e - 1:
            for i in range(e, bound_e):
                if ch(i) == "M":
                    bound_e = i
                    break

        locate_s = -1
        locate_e = -1
        extend_s = -1

        # IMGT-anchor walk along the V alignment (SeqSet.hpp:6981-7040).
        if g0.seq_idx != -1:
            dest = seqs[g0.seq_idx].info[2][0]
            if dest != -1:
                va = get_v_align()
                i = g0.read_start - 1
                j = g0.seq_start - 1
                k = 0
                n_ops = len(va)
                while k < n_ops:
                    if va[k] != EDIT_DELETE:
                        i += 1
                    if va[k] != EDIT_INSERT:
                        j += 1
                    if j >= dest:
                        break
                    k += 1
                if k >= n_ops:
                    k -= 1
                    if va[k] != EDIT_DELETE:
                        i -= 1
                    if va[k] != EDIT_INSERT:
                        j -= 1
                ambiguous = False
                for l in range(k, max(-1, k - 7), -1):
                    if l < n_ops and va[l] in (EDIT_INSERT, EDIT_DELETE):
                        ambiguous = True
                        break
                if k > 0 and not ambiguous:
                    if j == dest:
                        locate_s = i
                        strong_locate_s = True
                    elif j < dest:
                        extend_s = i + dest - j + 5

        if locate_s == -1:
            if s + 8 >= length:
                if (s - length + 9) % 3:
                    s = length - 12 + (s - length + 9) % 3
                else:
                    s = length - 9

        # YYC frame-locked then free (SeqSet.hpp:7055-7083).
        if locate_s == -1:
            for i in range(s, bound_s - 1, -3):
                if aa(i) == "Y" and aa(i + 3) == "Y" and aa(i + 6) == "C":
                    locate_s = i + 6
                    break
        if locate_s == -1:
            for i in range(s, bound_s - 1, -1):
                if aa(i) == "Y" and aa(i + 3) == "Y" and aa(i + 6) == "C":
                    locate_s = i + 6
                    break

        # Partial exact germline match at the Cys (SeqSet.hpp:7085-7108).
        if (
            locate_s == -1
            and g0.seq_idx != -1
            and seqs[g0.seq_idx].info[2][0] != -1
        ):
            seq = seqs[g0.seq_idx]
            for i in range(s, bound_s - 1, -1):
                if aa(i + 6) == "C":
                    gene_offset, match_len = (
                        align_host.locate_partial_suf_pref_exact_match(
                            seq.consensus[seq.info[2][0] :],
                            read[i + 6 :],
                            locate_partial_min_len,
                        )
                    )
                    if gene_offset != -1 and gene_offset == 0:
                        locate_s = i + 6
                        strong_locate_s = True
                        break

        # YxC variants (SeqSet.hpp:7110-7151).
        if locate_s == -1:
            for i in range(s, bound_s - 1, -3):
                if aa(i) == "Y" and aa(i + 6) == "C":
                    locate_s = i + 6
                    break
            if locate_s == -1:
                for i in range(s, bound_s - 1, -1):
                    if aa(i) == "Y" and aa(i + 6) == "C":
                        locate_s = i + 6
                        break
            if locate_s == -1 and g0.seq_idx != -1:
                for i in range(s, bound_s - 1, -1):
                    if aa(i) == "Y" and ch(i + 6) == "T" and ch(i + 7) == "G":
                        locate_s = i + 6
                        break

        # xYC variants (SeqSet.hpp:7153-7194).
        if locate_s == -1:
            for i in range(s, bound_s - 1, -3):
                if aa(i + 3) == "Y" and aa(i + 6) == "C":
                    locate_s = i + 6
                    break
            if locate_s == -1:
                for i in range(s, bound_s - 1, -1):
                    if aa(i + 3) == "Y" and aa(i + 6) == "C":
                        locate_s = i + 6
                        break
            if locate_s == -1 and g0.seq_idx != -1:
                for i in range(s, bound_s - 1, -1):
                    if aa(i + 3) == "Y" and ch(i + 6) == "T" and ch(i + 7) == "G":
                        locate_s = i + 6
                        break

        # C-only (SeqSet.hpp:7196-7206).
        if locate_s == -1 and (g0.seq_idx != -1 or s <= 18):
            for i in range(s, bound_s - 1, -3):
                if aa(i) == "C":
                    locate_s = i
                    break

        # Expanded C search (SeqSet.hpp:7209-7247).
        if locate_s == -1 and g0.seq_idx != -1 and g2.seq_idx != -1:
            new_s = e - 12
            if 0 <= extend_s < new_s:
                new_s = extend_s - (extend_s - s) % 3
            if new_s > s:
                for i in range(new_s, s, -3):
                    if aa(i) == "C":
                        locate_s = i
                        break
                if locate_s == -1:
                    for i in range(new_s, s, -3):
                        if aa(i) == "Y" and ch(i + 6) == "T" and ch(i + 7) == "G":
                            locate_s = i + 6
                            break

        # YYx (SeqSet.hpp:7259-7269).
        if locate_s == -1 and g0.seq_idx != -1:
            for i in range(s, bound_s - 1, -1):
                if aa(i) == "Y" and aa(i + 3) == "Y":
                    locate_s = i + 6
                    break

        # -- locateE (SeqSet.hpp:7271-7542) --
        adjust_e = e
        # J-gene IMGT anchor walk.
        if g2.seq_idx != -1:
            dest = seqs[g2.seq_idx].info[2][0]
            if dest != -1:
                jg = g2
                cons = seqs[jg.seq_idx].consensus
                _, jalign = align_host.global_alignment(
                    cons[jg.seq_start : jg.seq_end + 1],
                    read[jg.read_start : jg.read_end + 1],
                )
                n_ops = len(jalign)
                i = jg.read_end + 1
                j = jg.seq_end + 1
                # The reference walks from the -1 terminator itself, so the
                # sentinel consumes one (i,j) step (SeqSet.hpp:7291-7303).
                k = n_ops
                while k >= 0:
                    op = jalign[k] if k < n_ops else -1
                    if op != EDIT_DELETE:
                        i -= 1
                    if op != EDIT_INSERT:
                        j -= 1
                    if j <= dest:
                        break
                    k -= 1
                ambiguous = False
                l = k
                if k == -1:
                    l += 1
                    if n_ops > 0:
                        if jalign[0] != EDIT_DELETE:
                            i += 1
                        if jalign[0] != EDIT_INSERT:
                            j += 1
                while l < n_ops and l <= k + 6:
                    if jalign[l] in (EDIT_INSERT, EDIT_DELETE):
                        ambiguous = True
                        break
                    l += 1
                if not ambiguous:
                    if j == dest:
                        locate_e = i
                        strong_locate_e = True
                    elif j == dest + 1 and ch(i - (j - dest)) != "M":
                        locate_e = i - (j - dest)

        if locate_s != -1:
            adjust_e = e - (e - locate_s) % 3
        if locate_e == -1:
            i = adjust_e
            while i < bound_e and i + 11 < length:
                if wfgxxg_at(i):
                    locate_e = i
                    break
                i += 3
        if locate_e == -1:
            i = e
            while i < bound_e and i + 11 < length:
                if wfgxxg_at(i):
                    locate_e = i
                    break
                i += 1

        if locate_e == -1:
            # Weaker motifs (SeqSet.hpp:7375-7541).
            if locate_s != -1:
                adjust_e = e - (e - locate_s) % 3
                if adjust_e + 3 < locate_s + 18:
                    adjust_e = locate_s + 15

            i = adjust_e
            while i < bound_e and i + 11 < length:
                if ch(i) == "T" and aa(i + 3) == "G" and aa(i + 9) == "G":
                    locate_e = i
                    break
                i += 3

            if (
                locate_e == -1
                and g2.seq_idx != -1
                and seqs[g2.seq_idx].info[2][0] != -1
            ):
                seq = seqs[g2.seq_idx]
                for i in range(e, bound_e):
                    if aa(i) in "WF":
                        gene_offset, match_len = (
                            align_host.locate_partial_suf_suf_exact_match(
                                seq.consensus[: seq.info[2][0] + 1],
                                read[: i + 1],
                                locate_partial_min_len,
                            )
                        )
                        if (
                            gene_offset != -1
                            and gene_offset + match_len - 1 == seq.info[2][0]
                        ):
                            locate_e = i
                            strong_locate_e = True
                            break

            if locate_e == -1:
                i = adjust_e
                while i < bound_e and i + 11 < length:
                    if aa(i) in "WF" and (aa(i + 3) == "G" or aa(i + 9) == "G"):
                        locate_e = i
                        break
                    i += 3

            if locate_e == -1 and e + 40 > length and bound_e == length - 2:
                i = length - 11
                while i < bound_e and i + 5 < length:
                    if aa(i) in "WF" and aa(i + 3) == "G":
                        locate_e = i
                        break
                    i += 1
                if locate_e == -1 and g2.seq_idx == -1:
                    i = length - 5 - (length - 5 - locate_s) % 3
                    while i < bound_e:
                        if aa(i) in "WF":
                            locate_e = i
                            break
                        i += 3

            if locate_e == -1:
                i = adjust_e
                while i < bound_e:
                    if i + 5 >= bound_e and aa(i) == "W":
                        locate_e = i
                        break
                    i += 3
            if locate_e == -1:
                i = adjust_e
                while i < bound_e:
                    if i + 5 >= bound_e and aa(i) == "F":
                        locate_e = i
                        break
                    i += 3

        # Length sanity (SeqSet.hpp:7543-7556).
        if locate_s != -1 and locate_e != -1:
            if locate_e + 2 - locate_s + 1 < 18:
                if g0.seq_idx == -1 and g2.seq_idx != -1:
                    locate_s = -1
                elif g0.seq_idx != -1 and g2.seq_idx == -1:
                    locate_e = -1
            elif locate_e + 2 - locate_s + 1 >= 180 and (
                g0.seq_idx == -1 or g2.seq_idx == -1
            ):
                locate_s = locate_e = -1

        # Gap in the middle: pick a side (SeqSet.hpp:7559-7578).
        if (
            g0.seq_idx != -1
            and g2.seq_idx != -1
            and seqs[g0.seq_idx].info[2][0] != -1
            and seqs[g2.seq_idx].info[2][0] != -1
            and locate_s != -1
            and locate_e != -1
        ):
            for i in range(locate_s, locate_e + 3):
                c = ch(i)
                if c == "M" or c == "\0":
                    if (
                        strong_locate_e
                        and g0.seq_end < seqs[g0.seq_idx].info[2][0]
                    ):
                        locate_s = -1
                    if (
                        strong_locate_s
                        and g2.seq_start > seqs[g2.seq_idx].info[2][0]
                    ):
                        locate_e = -1
                if c == "\0":
                    break

        # Partial CDR3 completion (SeqSet.hpp:7580-7647).
        s_contig_idx = self.get_contig_idx(locate_s, contigs)
        e_contig_idx = self.get_contig_idx(locate_e, contigs)
        remove_locate_s = False
        remove_locate_e = False
        if (
            locate_s == -1
            and locate_e != -1
            and g0.seq_idx == -1
            and g2.seq_idx != -1
            and locate_e > 15 + contigs[e_contig_idx][0]
            and locate_e <= 60 + contigs[e_contig_idx][0]
        ):
            if strong_locate_e or (
                locate_e + 11 < length and wfgxxg_at(locate_e)
            ):
                locate_s = locate_e % 3
                s = locate_s
                e = locate_e + 2
                if e - s + 1 >= 18:
                    flag = False
                    i = s
                    while i <= s + 9 and e - i + 1 >= 18:
                        if aa(i) == "C":
                            locate_s = i
                            flag = True
                            break
                        i += 3
                    if not flag:
                        remove_locate_s = True
                else:
                    locate_s = -1
        elif (
            locate_s != -1
            and locate_e == -1
            and g0.seq_idx != -1
            and g2.seq_idx == -1
            and locate_s + 18 < contigs[s_contig_idx][1] + 1
            and locate_s + 2 + 60 > contigs[s_contig_idx][1] + 1
        ):
            if strong_locate_s or (
                locate_s - 6 >= 0
                and aa(locate_s) == "C"
                and aa(locate_s - 3) == "Y"
                and aa(locate_s - 6) == "Y"
            ):
                locate_e = (
                    (contigs[s_contig_idx][1] + 1)
                    - 3
                    - ((contigs[s_contig_idx][1] + 1) - 3 - locate_s) % 3
                )
                s = locate_s
                e = locate_e + 2
                if e - s + 1 >= 18:
                    flag = False
                    i = e
                    while i >= e - 9 and i - s + 1 >= 18:
                        if aa(i - 2) in "WF":
                            locate_e = i - 2
                            flag = True
                            break
                        i -= 3
                    if not flag:
                        remove_locate_e = True
                else:
                    locate_e = -1

        # Short V-anchor rescue by exact anchor match (SeqSet.hpp:7650-7785).
        s_contig_idx = self.get_contig_idx(locate_s, contigs)
        e_contig_idx = self.get_contig_idx(locate_e, contigs)
        force_partial = False
        if locate_s != -1 and locate_s <= 18 and g0.seq_idx == -1:
            anchor_seq_idx = -1
            anchor_type = -1
            if g2.seq_idx != -1:
                anchor_seq_idx = g2.seq_idx
                anchor_type = 2
            elif g3.seq_idx != -1:
                anchor_seq_idx = g3.seq_idx
                anchor_type = 3

            best_match_cnt = 0
            best_hit_len = 0
            read_start = 0
            best_tags = []
            for i_seq, seq in enumerate(seqs):
                if get_gene_type(seq.name) != 0 or seq.info[2][0] == -1:
                    continue
                match_cnt = 0
                hit_len = 0
                gene_offset, match_len = (
                    align_host.locate_partial_suf_pref_exact_match(
                        seq.consensus[seq.info[2][0] :],
                        read[locate_s:],
                        locate_partial_min_len,
                    )
                )
                if gene_offset == -1:
                    gene_offset = seq.info[2][0]
                else:
                    gene_offset += seq.info[2][0]
                k = locate_s - 1
                j = gene_offset - 1
                while k >= 0 and j >= 0:
                    if read[k] == "M":
                        break
                    if seq.consensus[j] == read[k]:
                        match_cnt += 1
                    hit_len += 1
                    k -= 1
                    j -= 1
                tmp = k + 1
                k = locate_s
                j = gene_offset
                while k < length and j < seq.consensus_len:
                    if seq.consensus[j] != read[k]:
                        break
                    match_cnt += 1
                    hit_len += 1
                    k += 1
                    j += 1
                if match_cnt > best_match_cnt or (
                    match_cnt == best_match_cnt and hit_len < best_hit_len
                ):
                    best_match_cnt = match_cnt
                    best_hit_len = hit_len
                    best_tags = [(i_seq, gene_offset)]
                    read_start = tmp
                elif match_cnt == best_match_cnt and hit_len == best_hit_len:
                    best_tags.append((i_seq, gene_offset))

            original_locate_s = locate_s
            if best_hit_len > 9 and best_match_cnt / best_hit_len >= 0.91:
                started = False
                for (tag_idx, tag_off) in best_tags:
                    no = Overlap(
                        seq_idx=tag_idx,
                        read_start=read_start,
                        read_end=read_start + best_hit_len - 1,
                        seq_start=tag_off - (original_locate_s - read_start),
                        match_cnt=2 * best_match_cnt,
                    )
                    no.seq_end = no.seq_start + best_hit_len - 1
                    no.similarity = best_match_cnt / best_hit_len
                    if anchor_seq_idx != -1:
                        if no.read_end > gene_overlap[
                            anchor_type
                        ].read_start or not is_same_chain_type(
                            seqs[no.seq_idx].name, seqs[anchor_seq_idx].name
                        ):
                            continue
                    if not started:
                        gene_overlap[0] = no
                        g0 = no
                        if seqs[tag_idx].info[2][0] != tag_off:
                            diff = tag_off - seqs[tag_idx].info[2][0]
                            if (
                                locate_s - diff >= no.read_start
                                and locate_s + diff <= no.read_end
                            ):
                                locate_s -= diff
                                remove_locate_s = False
                        if remove_locate_s and seqs[tag_idx].info[2][0] != tag_off:
                            force_partial = True
                        started = True
                    all_overlaps.append(no)
                remove_locate_s = False

        # Short J-anchor rescue (SeqSet.hpp:7788-7937).
        if locate_e != -1:
            dist_to_end = contigs[e_contig_idx][1] - locate_e
            if dist_to_end <= 18 and g2.seq_idx == -1:
                anchor_seq_idx = -1
                anchor_type = -1
                if g0.seq_idx != -1:
                    anchor_seq_idx = g0.seq_idx
                    anchor_type = 0
                elif g3.seq_idx != -1:
                    anchor_seq_idx = g3.seq_idx
                    anchor_type = 3

                best_match_cnt = 0
                best_tags = []
                best_hit_len = 0
                read_end = 0
                for i_seq, seq in enumerate(seqs):
                    if get_gene_type(seq.name) != 2 or seq.info[2][0] == -1:
                        continue
                    gene_offset = seq.info[2][0]
                    match_cnt = 0
                    hit_len = 0
                    if locate_e < length:
                        go2, match_len = (
                            align_host.locate_partial_suf_suf_exact_match(
                                seq.consensus[: seq.info[2][0] + 1],
                                read[: locate_e + 1],
                                locate_partial_min_len,
                            )
                        )
                        if go2 == -1:
                            gene_offset = seq.info[2][0]
                        else:
                            gene_offset = go2 + match_len - 1
                    k = locate_e + 1
                    j = gene_offset + 1
                    while k < length and j < seq.consensus_len:
                        if read[k] == "M":
                            break
                        if seq.consensus[j] == read[k]:
                            match_cnt += 1
                        hit_len += 1
                        k += 1
                        j += 1
                    tmp = k - 1
                    k = locate_e
                    j = gene_offset
                    while k >= 0 and j >= 0:
                        if seq.consensus[j] != read[k]:
                            break
                        match_cnt += 1
                        hit_len += 1
                        k -= 1
                        j -= 1
                    if match_cnt > best_match_cnt or (
                        match_cnt == best_match_cnt and hit_len < best_hit_len
                    ):
                        best_match_cnt = match_cnt
                        best_hit_len = hit_len
                        best_tags = [(i_seq, gene_offset)]
                        read_end = tmp
                    elif match_cnt == best_match_cnt and hit_len == best_hit_len:
                        best_tags.append((i_seq, gene_offset))

                if best_hit_len > 9 and best_match_cnt / best_hit_len >= 0.9:
                    started = False
                    original_locate_e = locate_e
                    for (tag_idx, tag_off) in best_tags:
                        no = Overlap(
                            seq_idx=tag_idx,
                            read_start=read_end - best_hit_len + 1,
                            read_end=read_end,
                            match_cnt=2 * best_match_cnt,
                        )
                        no.seq_end = tag_off + (read_end - original_locate_e)
                        no.seq_start = no.seq_end - best_hit_len + 1
                        no.similarity = best_match_cnt / best_hit_len
                        if anchor_seq_idx != -1:
                            if (
                                anchor_type == 0
                                and no.read_start
                                < gene_overlap[anchor_type].read_end
                            ) or not is_same_chain_type(
                                seqs[no.seq_idx].name, seqs[anchor_seq_idx].name
                            ):
                                continue
                        if not started:
                            gene_overlap[2] = no
                            g2 = no
                            if seqs[tag_idx].info[2][0] != tag_off:
                                diff = tag_off - seqs[tag_idx].info[2][0]
                                if (
                                    locate_e - diff >= no.read_start
                                    and locate_e + diff <= no.read_end
                                ):
                                    locate_e -= diff
                                    remove_locate_e = False
                            if (
                                remove_locate_e
                                and seqs[tag_idx].info[2][0] != tag_off
                            ):
                                force_partial = True
                            started = True
                        all_overlaps.append(no)
                    remove_locate_e = False

        if remove_locate_s:
            locate_s = -1
        if remove_locate_e:
            locate_e = -1

        s_contig_idx = self.get_contig_idx(locate_s, contigs)
        e_contig_idx = self.get_contig_idx(locate_e, contigs)
        if (
            locate_s != -1
            and locate_e != -1
            and 18 <= locate_e + 2 - locate_s + 1 < 7000
        ):
            s = locate_s
            e = locate_e + 2
            cdr[2].seq_idx = 0
            cdr[2].read_start = s
            cdr[2].read_end = e

            left_cnt = 0
            right_cnt = 0
            # Anchor motif scoring (SeqSet.hpp:7962-8030).
            if g0.seq_idx != -1 and seqs[g0.seq_idx].info[2][0] != -1:
                ref = seqs[g0.seq_idx].consensus
                offset = seqs[g0.seq_idx].info[2][0]

                def raa(p: int) -> str:
                    if p < 0 or p + 2 >= len(ref):
                        return dna_to_aa(
                            ref[p] if 0 <= p < len(ref) else "\0",
                            ref[p + 1] if 0 <= p + 1 < len(ref) else "\0",
                            ref[p + 2] if 0 <= p + 2 < len(ref) else "\0",
                        )
                    return dna_to_aa(ref[p], ref[p + 1], ref[p + 2])

                if locate_s - 6 > 0 and aa(locate_s - 6) == raa(offset - 6):
                    cdr3_score += 100.0 / 6
                    left_cnt += 1
                if locate_s - 3 > 0 and aa(locate_s - 3) == raa(offset - 3):
                    cdr3_score += 100.0 / 6
                    left_cnt += 1
                if aa(locate_s) == raa(offset):
                    cdr3_score += 100.0 / 6
                    left_cnt += 1
            else:
                if locate_s - 6 > 0 and aa(locate_s - 6) == "Y":
                    cdr3_score += 100.0 / 6
                    left_cnt += 1
                if locate_s - 3 > 0 and aa(locate_s - 3) == "Y":
                    cdr3_score += 100.0 / 6
                    left_cnt += 1
                if aa(locate_s) == "C":
                    cdr3_score += 100.0 / 6
                    left_cnt += 1
            if locate_e + 2 < length and aa(locate_e) in "WF":
                cdr3_score += 100.0 / 6
                right_cnt += 1
            if locate_e + 5 < length and aa(locate_e + 3) == "G":
                cdr3_score += 100.0 / 6
                right_cnt += 1
            if locate_e + 11 < length and aa(locate_e + 9) == "G":
                cdr3_score += 100.0 / 6
                right_cnt += 1

            if s < 0:
                s = e % 3
                cdr[2].read_start = s
                cdr3_score = 0
            if e >= length:
                e = length - 1 - (length - s) % 3
                cdr[2].read_end = e
                cdr3_score = 0

            # Sanity rules (SeqSet.hpp:8047-8097).
            if cdr3_score < 99 and (
                (left_cnt < 3 and g0.seq_idx == -1)
                or (right_cnt < 3 and g2.seq_idx == -1)
            ):
                cdr3_score = 0
            elif (
                e + 6 >= length
                and locate_e + 2 < length
                and aa(locate_e) not in "WF"
            ):
                cdr3_score = 0
            elif (
                cdr3_score < 99
                and g0.seq_idx != -1
                and g0.seq_start > 100
                and g0.read_start > 100
                and (not strong_locate_s or left_cnt < 3)
            ):
                cdr3_score = 0
            elif (
                cdr3_score < 99
                and g0.seq_idx != -1
                and (not strong_locate_s or left_cnt < 3)
                and self.get_contig_idx(g0.read_end, contigs)
                == self.get_contig_idx(s, contigs)
                and (
                    (
                        seqs[g0.seq_idx].info[2][0] != -1
                        and g0.seq_end + (s - g0.read_end) + 5
                        < seqs[g0.seq_idx].info[2][0]
                    )
                    or (
                        seqs[g0.seq_idx].info[2][0] != -1
                        and g0.seq_end + (s - g0.read_end) + 51
                        < seqs[g0.seq_idx].consensus_len
                    )
                )
            ):
                cdr3_score = 0
            elif (
                cdr3_score < 99
                and g2.seq_idx != -1
                and (not strong_locate_e or right_cnt < 3)
                and self.get_contig_idx(g2.read_start, contigs)
                == self.get_contig_idx(e, contigs)
                and seqs[g2.seq_idx].info[2][0] != -1
                and g2.seq_start + ((e - 2) - g2.read_start) - 5
                > seqs[g2.seq_idx].info[2][0]
            ):
                cdr3_score = 0
            elif g0.seq_idx == -1 and g2.seq_idx != -1 and s >= g2.read_start:
                cdr3_score = 0
            elif g0.seq_idx != -1 and g2.seq_idx == -1 and e <= g0.read_end:
                cdr3_score = 0
            elif g0.seq_idx == -1 and g2.seq_idx != -1:
                i = 0
                while i < contig_cnt and s > contigs[i][1]:
                    i += 1
                if i >= contig_cnt or s - 50 >= contigs[i][0]:
                    cdr3_score = 0
            elif g0.seq_idx != -1 and g2.seq_idx == -1:
                i = contig_cnt - 1
                while i >= 0 and e < contigs[i][0]:
                    i -= 1
                if i < 0 or (e + 50 <= contigs[i][1] and right_cnt < 3):
                    cdr3_score = 0
            elif force_partial:
                cdr3_score = 0

            if (
                strong_locate_s
                and strong_locate_e
                and cdr3_score < 50
                and locate_s >= 0
                and locate_e + 2 < length
            ):
                cdr3_score = 50

            # Gap adjustments (SeqSet.hpp:8104-8151).
            if cdr3_score > 0:
                n_cnt = 0
                if ch(s) == "M":
                    while ch(s) == "M" and s <= e:
                        s += 3
                    cdr[2].read_start = s
                    cdr3_score = 0
                    if s >= e:
                        cdr[2].seq_idx = -1
                        cdr[2].read_start = cdr[2].read_end = -1
                if ch(e) == "M":
                    while ch(e) == "M" and e >= s:
                        e -= 3
                    cdr[2].read_end = e
                    cdr3_score = 0
                    if e <= s:
                        cdr[2].seq_idx = -1
                        cdr[2].read_start = cdr[2].read_end = -1
                for i in range(s, e + 1):
                    if ch(i) == "N":
                        n_cnt += 1
                        if n_cnt >= 2:
                            cdr3_score = 0
                            break
                    elif ch(i) == "M":
                        cdr3_score = 0
                        break

            # Anchor-in-gap partial forcing (SeqSet.hpp:8155-8166).
            if g0.seq_idx != -1 and seqs[g0.seq_idx].info[2][0] != -1:
                if (
                    g0.seq_end >= seqs[g0.seq_idx].info[2][0] + 2
                    and s > g0.read_end
                ):
                    cdr3_score = 0
            if g2.seq_idx != -1 and seqs[g2.seq_idx].info[2][0] != -1:
                if (
                    g2.seq_start <= seqs[g2.seq_idx].info[2][0]
                    and e < g2.read_start
                ):
                    cdr3_score = 0

            # Cross-contig anchor verification (SeqSet.hpp:8169-8306).
            if cdr3_score < 100:
                for i in range(1, contig_cnt):
                    if contigs[i][0] <= s <= contigs[i][1]:
                        if (
                            g0.seq_idx != -1
                            and g0.read_end <= contigs[i - 1][1]
                            and left_cnt < 3
                            and not strong_locate_s
                        ):
                            match_cnt = 0
                            hit_len = 0
                            seq_idx = g0.seq_idx
                            if seqs[seq_idx].info[2][0] != -1:
                                cons = seqs[seq_idx].consensus
                                right_match = 0
                                j = s
                                k = seqs[seq_idx].info[2][0]
                                while j < length and k < len(cons):
                                    if read[j] == cons[k]:
                                        right_match += 1
                                        if right_match / (j - s + 1) >= 0.75:
                                            match_cnt = right_match
                                            hit_len = j - s + 1
                                    j += 1
                                    k += 1
                                j = s - 1
                                k = seqs[seq_idx].info[2][0] - 1
                                while j >= 0 and k >= 0:
                                    if read[j] == "M":
                                        break
                                    if read[j] == cons[k]:
                                        match_cnt += 1
                                    hit_len += 1
                                    j -= 1
                                    k -= 1
                            similarity = 0.9
                            if seqs[seq_idx].name[0] == "I":
                                similarity = 0.8
                            if hit_len <= 9 or match_cnt / hit_len < similarity:
                                cdr3_score = 0
                            break
                        break
                for i in range(contig_cnt - 2, 0, -1):
                    if contigs[i][0] <= e <= contigs[i][1]:
                        if (
                            g2.seq_idx != -1
                            and g2.read_start >= contigs[i + 1][0]
                            and right_cnt < 3
                            and not strong_locate_e
                        ):
                            match_cnt = 0
                            hit_len = 0
                            seq_idx = g2.seq_idx
                            if seqs[seq_idx].info[2][0] != -1:
                                cons = seqs[seq_idx].consensus
                                left_match = 0
                                j = e
                                k = seqs[seq_idx].info[2][0] + 2
                                while j >= 0 and k >= 0:
                                    if k < len(cons) and read[j] == cons[k]:
                                        left_match += 1
                                        if left_match / (e - j + 1) >= 0.75:
                                            match_cnt = left_match
                                            hit_len = e - j + 1
                                    j -= 1
                                    k -= 1
                                j = e + 1
                                k = seqs[seq_idx].info[2][0] + 3
                                while j < length and k < len(cons):
                                    if read[j] == "M":
                                        break
                                    if read[j] == cons[k]:
                                        match_cnt += 1
                                    hit_len += 1
                                    j += 1
                                    k += 1
                            similarity = 0.9
                            if seqs[seq_idx].name[0] == "I":
                                similarity = 0.8
                            if hit_len <= 9 or match_cnt / hit_len < similarity:
                                cdr3_score = 0
                            break
                        break

        # Trailing partial-CDR3 fallbacks (SeqSet.hpp:8309-8389).
        elif (
            locate_s == -1
            and locate_e != -1
            and g2.seq_idx != -1
            and (
                g0.seq_idx == -1
                or self.get_contig_idx(g0.read_start, contigs)
                != self.get_contig_idx(g2.read_start, contigs)
            )
            and locate_e > 15 + contigs[e_contig_idx][0]
            and locate_e <= 60 + contigs[e_contig_idx][0]
        ):
            if strong_locate_e or (
                locate_e + 11 < length and wfgxxg_at(locate_e)
            ):
                while locate_e + 2 >= length:
                    locate_e -= 3
                locate_s = (
                    contigs[e_contig_idx][0]
                    + (locate_e - contigs[e_contig_idx][0]) % 3
                )
                cdr3_score = 0
                s = locate_s
                e = locate_e + 2
                if e - s + 1 >= 18:
                    i = s
                    while i <= s + 9 and e - i + 1 >= 18:
                        if aa(i) == "C":
                            s = i
                            break
                        i += 3
                    if s + 2 < g2.read_start:
                        cdr[2].seq_idx = 0
                        cdr[2].read_start = s
                        cdr[2].read_end = e
        elif (
            locate_s != -1
            and locate_e == -1
            and g0.seq_idx != -1
            and (
                g2.seq_idx == -1
                or self.get_contig_idx(g0.read_start, contigs)
                != self.get_contig_idx(g2.read_start, contigs)
            )
            and locate_s + 18 < contigs[s_contig_idx][1] + 1
            and locate_s + 2 + 60 > contigs[s_contig_idx][1] + 1
        ):
            if strong_locate_s or (
                locate_s - 6 >= 0
                and aa(locate_s) == "C"
                and aa(locate_s - 3) == "Y"
                and aa(locate_s - 6) == "Y"
            ):
                while locate_s < 0:
                    locate_s += 3
                locate_e = (
                    contigs[s_contig_idx][1]
                    - 2
                    - (contigs[s_contig_idx][1] - 2 - locate_s) % 3
                )
                cdr3_score = 0
                s = locate_s
                e = locate_e + 2
                if e - s + 1 >= 18:
                    i = e
                    while i >= e - 9 and i - s + 1 >= 18:
                        if aa(i - 2) in "WF":
                            e = i
                            break
                        i -= 3
                    if e - 2 > g0.read_end:
                        cdr[2].seq_idx = 0
                        cdr[2].read_start = s
                        cdr[2].read_end = e

        cdr[2].similarity = cdr3_score / 100.0

    # ------------------------------------------------------------------
    # CDR3 imputation (SeqSet.hpp:5478-5903) — TCR only
    # ------------------------------------------------------------------

    def impute_cdr3(self, read, gene_overlap, cdr, secondary) -> Optional[str]:
        """Splice germline sequence to complete a partial TCR CDR3
        (SeqSet.hpp:5851-5903).  Returns the new consensus or None."""
        seqs = self.seqs
        self._impute_masked_leak = None
        g0, g2 = gene_overlap[0], gene_overlap[2]
        if (
            cdr[2].seq_idx == -1
            or cdr[2].similarity != 0
            or g0.seq_idx == -1
            or g2.seq_idx == -1
            or seqs[g0.seq_idx].info[2][0] == -1
            or seqs[g2.seq_idx].info[2][0] == -1
            or g0.read_end >= g2.read_start
        ):
            return None
        if seqs[g0.seq_idx].name[0] != "T":
            return None

        v_in_anchor = (
            seqs[g0.seq_idx].info[2][0] >= g0.seq_start
            and seqs[g0.seq_idx].info[2][0] + 2 <= g0.seq_end
        )
        j_in_anchor = (
            seqs[g2.seq_idx].info[2][0] >= g2.seq_start
            and seqs[g2.seq_idx].info[2][0] + 2 <= g2.seq_end
        )
        ret = None
        if v_in_anchor and j_in_anchor:
            has_gap = any(
                read[j] == "N" and j + 1 < len(read) and read[j + 1] == "N"
                for j in range(cdr[2].read_start, cdr[2].read_end + 1)
            )
            if has_gap:
                ret = self._impute_internal_cdr3(read, gene_overlap, cdr, secondary)
            else:
                ret = self._impute_anchor_cdr3(read, gene_overlap, cdr, secondary)
        elif v_in_anchor or j_in_anchor:
            for j in range(cdr[2].read_start, cdr[2].read_end + 1):
                if read[j] == "N":
                    return None
            ret = self._impute_anchor_cdr3(read, gene_overlap, cdr, secondary)

        if ret is not None:
            self.annotate_read_d_gene(ret, gene_overlap, cdr, secondary)
        return ret

    def _shift_annotations(
        self, at, shift, read_len, seq_idx, seq_start, seq_insert_len,
        base_change, gene_overlap, secondary,
    ):
        """SeqSet.hpp:11135+ (ShiftAnnotations)."""
        from trust4_tpu.engine.seqset import get_gene_type, is_same_chain_type

        seqs = self.seqs
        anchor_overlap = Overlap()
        anchor_overlap.seq_idx = -1
        for i in range(4):
            g = gene_overlap[i]
            if g.seq_idx == -1:
                continue
            if g.seq_idx == seq_idx:
                anchor_overlap = _dc_replace(g)
                if seq_start < g.seq_start:
                    g.seq_start = seq_start
                if g.seq_end < seq_start + seq_insert_len - 1:
                    g.seq_end = seq_start + seq_insert_len - 1
            if g.read_start <= at <= g.read_end:
                g.match_cnt += 2 * base_change
                g.similarity = g.match_cnt / (
                    g.read_end - g.read_start + 1 + shift
                    + g.seq_end - g.seq_start + 1
                )
            if g.read_start > at:
                g.read_start += shift
            if g.read_end >= at - 1:
                g.read_end += shift
        if secondary is not None:
            for o in secondary:
                if (
                    seq_idx != -1
                    and anchor_overlap.seq_idx != -1
                    and is_same_chain_type(
                        seqs[seq_idx].name, seqs[o.seq_idx].name
                    )
                    and get_gene_type(seqs[seq_idx].name)
                    == get_gene_type(seqs[o.seq_idx].name)
                    and anchor_overlap.seq_start == o.seq_start
                    and anchor_overlap.seq_end == o.seq_end
                ):
                    if seq_start < o.seq_start:
                        o.seq_start = seq_start
                    if o.seq_end < seq_start + seq_insert_len - 1:
                        o.seq_end = seq_start + seq_insert_len - 1
                if o.read_start <= at <= o.read_end:
                    o.match_cnt += 2 * base_change
                    o.similarity = o.match_cnt / (
                        o.read_end - o.read_start + 1 + shift
                        + o.seq_end - o.seq_start + 1
                    )
                if o.read_start > at:
                    o.read_start += shift
                if o.read_end >= at - 1:
                    o.read_end += shift

    def _impute_anchor_cdr3(self, read, gene_overlap, cdr, secondary):
        """SeqSet.hpp:5478-5734: splice germline sequence between the
        assembled fragment and the missing V/J anchor.  Returns the new
        consensus string or None."""
        seqs = self.seqs
        g0, g2 = gene_overlap[0], gene_overlap[2]
        length = len(read)
        insert_at = -1
        insert_len = -1
        seq_idx = -1
        seq_start_ins = -1
        new_start = cdr[2].read_start
        new_end = cdr[2].read_end

        v_in_anchor = (
            seqs[g0.seq_idx].info[2][0] >= g0.seq_start
            and seqs[g0.seq_idx].info[2][0] + 2 <= g0.seq_end
        )
        j_in_anchor = (
            seqs[g2.seq_idx].info[2][0] >= g2.seq_start
            and seqs[g2.seq_idx].info[2][0] + 2 <= g2.seq_end
        )
        contigs = self.get_contig_intervals(read)
        chars = list(read)
        for i in range(len(contigs) - 1):
            for j in range(contigs[i][1] + 1, contigs[i + 1][0]):
                chars[j] = "M"
        masked = "".join(chars)
        # Reference quirk (SeqSet.hpp:5510 vs 5564/5646): the gap bases
        # were changed to 'M' IN PLACE on the consensus buffer, and two
        # early-return paths skip the N-restore — leaking 'M's into the
        # stored consensus permanently.  We record the masked string so the
        # caller can adopt it on those paths.
        self._impute_masked_leak = None

        v_anchor_in_gap = False
        j_anchor_in_gap = False
        if v_in_anchor:
            dest = g0.read_end - (g0.seq_end - seqs[g0.seq_idx].info[2][0])
            for i in range(g0.read_end, max(dest, 0) - 1, -1):
                if masked[i] == "M":
                    v_in_anchor = False
                    v_anchor_in_gap = True
                    break
        if j_in_anchor:
            dest = g2.read_start + (
                seqs[g2.seq_idx].info[2][0] + 2 - g2.seq_start
            )
            i = g2.read_start
            while i <= dest and i < length:
                if masked[i] == "M":
                    j_in_anchor = False
                    j_anchor_in_gap = True
                    break
                i += 1

        if not v_in_anchor:
            seq_idx = g0.seq_idx
            seq = seqs[seq_idx]
            seq_offset = -1
            read_offset = -1
            if g0.seq_end < seq.info[2][0]:
                # V]...[CDR3]
                offset, match_len = align_host.locate_partial_suf_pref_exact_match(
                    seq.consensus[seq.info[2][0] :],
                    masked[cdr[2].read_start : cdr[2].read_end + 1],
                    5,
                )
                if offset != -1:
                    if offset == 0:
                        self._impute_masked_leak = masked
                        return None
                    seq_offset = offset + seq.info[2][0]
                    read_offset = cdr[2].read_start
            else:
                if v_anchor_in_gap:
                    contig_idx = self.get_contig_idx(g0.read_end, contigs)
                    read_offset = contigs[contig_idx][0]
                    seq_offset = g0.seq_end - (g0.read_end - read_offset)
                else:
                    seq_offset = g0.seq_start
                    read_offset = g0.read_start
            if seq_offset != -1:
                valid = True
                i = seq_offset - 1
                j = read_offset - 1
                while i >= seq.info[2][0] and j >= 0:
                    if masked[j] == "M":
                        break
                    if seq.consensus[i] != masked[j]:
                        valid = False
                    i -= 1
                    j -= 1
                if valid:
                    insert_at = j + 1
                    insert_len = i - seq.info[2][0] + 1
                    seq_start_ins = seq.info[2][0]
                    new_start = insert_at
                    new_end += insert_len
        elif not j_in_anchor:
            seq_idx = g2.seq_idx
            seq = seqs[seq_idx]
            seq_offset = -1
            read_offset = -1
            if g2.seq_start > seq.info[2][0]:
                # [CDR3]...[J
                offset, match_len = align_host.locate_partial_suf_suf_exact_match(
                    seq.consensus[: seq.info[2][0] + 3],
                    masked[cdr[2].read_start : cdr[2].read_end + 1],
                    5,
                )
                if offset != -1:
                    seq_offset = offset + match_len - 1
                    read_offset = cdr[2].read_end
                    if seq_offset == seq.info[2][0] + 2:
                        self._impute_masked_leak = masked
                        return None
            else:
                if j_anchor_in_gap:
                    contig_idx = self.get_contig_idx(g2.read_start, contigs)
                    read_offset = contigs[contig_idx][1]
                    seq_offset = g2.seq_start + (read_offset - g2.read_start)
                else:
                    read_offset = g2.read_end
                    seq_offset = g2.seq_end
            if seq_offset != -1:
                valid = True
                i = seq_offset + 1
                j = read_offset + 1
                while i <= seq.info[2][0] + 2 and j < length:
                    if masked[j] == "M":
                        break
                    if seq.consensus[i] != masked[j]:
                        valid = False
                    i += 1
                    j += 1
                if valid:
                    insert_at = j
                    seq_start_ins = i
                    insert_len = seq.info[2][0] + 2 - seq_start_ins + 1
                    new_end = insert_at + insert_len - 1

        if insert_len > 0:
            nr = (
                read[:insert_at]
                + seqs[seq_idx].consensus[
                    seq_start_ins : seq_start_ins + insert_len
                ]
                + read[insert_at:]
            )
            cdr[2].read_start = new_start
            cdr[2].read_end = new_end
            cdr[2].similarity = 0.01
            self._shift_annotations(
                insert_at, insert_len, length, seq_idx, seq_start_ins,
                insert_len, insert_len, gene_overlap, secondary,
            )
            return nr
        elif insert_len == 0:
            cdr[2].read_start = new_start
            cdr[2].read_end = new_end
            cdr[2].similarity = 0.5
            return None
        return None

    def _impute_internal_cdr3(self, read, gene_overlap, cdr, secondary):
        """SeqSet.hpp:5736-5849: fill a single N-gap inside CDR3."""
        seqs = self.seqs
        g0, g2 = gene_overlap[0], gene_overlap[2]
        if g0.seq_idx == -1 or g2.seq_idx == -1:
            return None
        v_seq_idx, j_seq_idx = g0.seq_idx, g2.seq_idx
        if seqs[v_seq_idx].info[2][0] == -1 or seqs[j_seq_idx].info[2][0] == -1:
            return None
        contigs = self.get_contig_intervals(read)
        gap_cnt = 0
        gap_start = gap_end = -1
        for i in range(len(contigs) - 1):
            if (
                cdr[2].read_start <= contigs[i][1] <= cdr[2].read_end
                and cdr[2].read_start <= contigs[i + 1][0] <= cdr[2].read_end
            ):
                gap_start = contigs[i][1] + 1
                gap_end = contigs[i + 1][0] - 1
                gap_cnt += 1
        if gap_cnt != 1:
            return None

        v_seq = seqs[v_seq_idx]
        j_seq = seqs[j_seq_idx]
        v_offset, v_match_len = align_host.locate_partial_suf_pref_exact_match(
            v_seq.consensus[v_seq.info[2][0] :],
            read[gap_end + 1 : cdr[2].read_end + 1],
            5,
        )
        j_offset, j_match_len = align_host.locate_partial_suf_suf_exact_match(
            j_seq.consensus[: j_seq.info[2][0] + 3],
            read[cdr[2].read_start : gap_start],
            5,
        )
        if (v_offset != -1 and j_offset != -1) or (
            v_offset == -1 and j_offset == -1
        ):
            return None

        # anchor[0]=(seq,read) left side, anchor[1] right side.
        if v_offset != -1:
            valid = True
            seq = v_seq
            i = seq.info[2][0]
            j = cdr[2].read_start
            while i < seq.consensus_len and j < gap_start:
                if seq.consensus[i] != read[j]:
                    valid = False
                i += 1
                j += 1
            if not valid or i >= seq.consensus_len:
                return None
            anchor = [
                (i - 1, j - 1),
                (v_offset + v_seq.info[2][0], gap_end + 1),
            ]
            seq_idx = v_seq_idx
        else:
            valid = True
            seq = j_seq
            i = seq.info[2][0] + 2
            j = cdr[2].read_end
            while i >= 0 and j > gap_end:
                if seq.consensus[i] != read[j]:
                    valid = False
                i -= 1
                j -= 1
            if not valid or i < 0:
                return None
            anchor = [(j_offset + j_match_len - 1, gap_start - 1), (i + 1, j + 1)]
            seq_idx = j_seq_idx

        seq_start_ins = -1
        base_change = 0
        if anchor[1][0] > anchor[0][0]:
            imputed = seqs[seq_idx].consensus[anchor[0][0] + 1 : anchor[1][0]]
            nr = read[: anchor[0][1] + 1] + imputed + read[anchor[1][1] :]
            shift_at = anchor[1][1]
            shift = (anchor[0][1] + 1 + len(imputed)) - anchor[1][1]
            base_change = anchor[1][0] - anchor[0][0] - 1
            seq_start_ins = anchor[0][0] + 1
        else:
            shift_at = anchor[1][1]
            overlap_len = anchor[0][0] - anchor[1][0] + 1
            shift = (anchor[0][1] - overlap_len + 1) - anchor[1][1]
            nr = read[: anchor[0][1] + 1] + read[anchor[1][1] + overlap_len :]
            base_change = -overlap_len
            seq_idx = -1
        cdr[2].read_end += shift
        cdr[2].similarity = 0.01
        self._shift_annotations(
            shift_at, shift, len(read), seq_idx, seq_start_ins, base_change,
            base_change, gene_overlap, secondary,
        )
        return nr

    # ------------------------------------------------------------------
    # D gene (SeqSet.hpp:5906-6009)
    # ------------------------------------------------------------------

    def annotate_read_d_gene(self, read, gene_overlap, cdr, secondary):
        from trust4_tpu.engine.seqset import get_gene_type

        seqs = self.seqs
        if cdr[2].seq_idx == -1 or cdr[2].similarity == 0:
            return -1
        if gene_overlap[0].seq_idx != -1:
            anchor_seq_idx = gene_overlap[0].seq_idx
        elif gene_overlap[2].seq_idx != -1:
            anchor_seq_idx = gene_overlap[2].seq_idx
        else:
            return -1
        aname = seqs[anchor_seq_idx].name
        if aname[2] not in "HBD":
            return -1

        d_overlaps: List[Overlap] = []
        cdr3 = read[cdr[2].read_start : cdr[2].read_end + 1]
        for i, sw in enumerate(seqs):
            if not (
                sw.is_ref
                and get_gene_type(sw.name) == 1
                and sw.name[0] == aname[0]
                and sw.name[2] == aname[2]
                and sw.name[1] == aname[1]
            ):
                continue
            score, seq_start, read_start, align = align_host.local_alignment(
                sw.consensus, cdr3
            )
            if score >= 5 * align_host.SCORE_MATCH_LOCAL:
                read_start += cdr[2].read_start
                read_end = read_start - 1
                seq_end = seq_start - 1
                match_cnt = 0
                for a in align:
                    if a != EDIT_INSERT:
                        seq_end += 1
                    if a != EDIT_DELETE:
                        read_end += 1
                    if a == EDIT_MATCH:
                        match_cnt += 1
                if (
                    gene_overlap[0].seq_idx != -1
                    and gene_overlap[0].read_end >= read_end
                ) or (
                    gene_overlap[2].seq_idx != -1
                    and gene_overlap[2].read_start <= read_start
                ):
                    continue
                no = Overlap(
                    seq_idx=i,
                    seq_start=seq_start,
                    seq_end=seq_end,
                    read_start=read_start,
                    read_end=read_end,
                    match_cnt=2 * match_cnt,
                )
                no.similarity = no.match_cnt / (
                    seq_end - seq_start + 1 + read_end - read_start + 1
                )
                d_overlaps.append(no)

        if not d_overlaps:
            return -1
        best = 0
        for i in range(1, len(d_overlaps)):
            if self.is_better_gene_match(d_overlaps[i], d_overlaps[best], 1.0):
                best = i
        gene_overlap[1] = d_overlaps[best]
        return d_overlaps[best].seq_idx
