"""Hit generation, chaining (LIS) and overlap scoring.

Host orchestration of the reference's overlap pipeline
(SeqSet.hpp:342-1501, 3144-3424): k-mer probes -> per-(seq,strand) grouping
-> diagonal clustering -> O(n log n) LIS chaining with divergence
tie-breaking -> gap-fill banded DP scoring -> similarity thresholds.

Every numeric rule (adaptive minHit thresholds, skip limits, the 10000-repeat
cutoff, the group-local repeat check that indexes the *global* hit array —
a reference quirk, SeqSet.hpp:929-935) is reproduced exactly: these filters
decide which contigs a read may join, so they are part of the output
contract.

The batched TPU path (align.tpu) accelerates the gap-fill DP; decisions stay
on host in reference order.
"""

from __future__ import annotations
from dataclasses import replace as _dc_replace

from typing import List, Optional, Tuple

from trust4_tpu.align import host as align_host
from trust4_tpu.align import native as align_native
from trust4_tpu.dna import revcomp
from trust4_tpu.engine.types import Overlap
from trust4_tpu.ops.kmer import kmer_codes


def _abs(x):
    return x if x >= 0 else -x


class OverlapMixin:
    """Overlap-path methods mixed into SeqSet."""

    # ------------------------------------------------------------------
    # LIS chaining (SeqSet.hpp:316-499)
    # ------------------------------------------------------------------

    @staticmethod
    def _binary_search_lis(top: List[int], size: int, val_a: int, hits) -> int:
        l, r = 0, size - 1
        while l <= r:
            m = (l + r) // 2
            if val_a == hits[top[m]][0]:
                return m
            if val_a < hits[top[m]][0]:
                r = m - 1
            else:
                l = m + 1
        return l - 1

    @classmethod
    def longest_increasing_subsequence(
        cls, hits: List[Tuple[int, int]]
    ) -> List[Tuple[int, int]]:
        """LIS on (readOffset, seqOffset) pairs sorted by seqOffset.

        Reference: SeqSet.hpp:342-499.  Includes the divergence-based repeat
        tie-breaking (avgDiff), the same-b dedup pass, and the replacement
        pass that swaps in less-divergent hits without changing chain length.
        """
        size = len(hits)
        if size == 0:
            return []
        avg_diff = 0.0
        for i in range(1, size):
            avg_diff += hits[i][0] - hits[i][1]
        avg_diff /= size

        top = [0] * size
        link = [-1] * size
        ret = 1
        for i in range(1, size):
            hi = hits[i]
            if hits[top[ret - 1]][0] <= hi[0]:
                tag = ret - 1
            else:
                tag = cls._binary_search_lis(top, ret, hi[0], hits)
            if tag == -1:
                top[0] = i
                link[i] = -1
            elif hi[0] > hits[top[tag]][0]:
                if tag == ret - 1:
                    top[ret] = i
                    ret += 1
                    link[i] = top[tag]
                elif hi[0] < hits[top[tag + 1]][0]:
                    top[tag + 1] = i
                    link[i] = top[tag]
            elif hi[0] == hits[top[tag]][0]:  # repeats
                if _abs(hi[0] - hi[1] - avg_diff) < _abs(
                    hits[top[tag]][0] - hits[top[tag]][1] - avg_diff
                ):
                    top[tag] = i
                    link[i] = top[tag - 1] if tag > 0 else -1

        lis: List[Tuple[int, int]] = []
        k = top[ret - 1]
        for _ in range(ret):
            lis.append(hits[k])
            k = link[k]
        lis.reverse()

        # Remove elements with the same seq offset, keep least divergence.
        out: List[Tuple[int, int]] = []
        i = 0
        while i < ret:
            j = i + 1
            while j < ret and lis[i][1] == lis[j][1]:
                j += 1
            if j == i + 1:
                out.append(lis[i])
            else:
                mintag = i
                min_diff = _abs(lis[i][0] - lis[i][1] - avg_diff)
                for l in range(i + 1, j):
                    d = _abs(lis[l][0] - lis[l][1] - avg_diff)
                    if d < min_diff:
                        min_diff = d
                        mintag = l
                out.append(lis[mintag])
            i = j
        lis = out
        ret = len(lis)

        # Replacement pass (same count, less divergent hits).
        if ret > 0:
            i = 0
            j = 0
            while i < ret and j < size:
                if hits[j][1] < lis[i][1]:
                    j += 1
                elif i + 1 < ret and lis[i + 1][1] <= hits[j][1]:
                    i += 1
                elif lis[i] == hits[j]:
                    j += 1
                else:
                    if (
                        lis[i][0] <= hits[j][0]
                        and (i == ret - 1 or hits[j][0] < lis[i + 1][0])
                        and _abs(hits[j][0] - hits[j][1] - avg_diff)
                        < _abs(lis[i][0] - lis[i][1] - avg_diff)
                    ):
                        lis[i] = hits[j]
                    j += 1
        return lis

    @staticmethod
    def remove_low_quality_hits_from_chain(
        chain: List[Tuple[int, int]]
    ) -> List[Tuple[int, int]]:
        """Drop short off-diagonal islands between long colinear runs
        (SeqSet.hpp:502-568)."""
        size = len(chain)
        if size == 0:
            return chain
        intervals = []  # (start, end, diagonal)
        i = 0
        while i < size:
            j = i + 1
            while j < size and chain[j][0] - chain[j][1] == chain[i][0] - chain[i][1]:
                j += 1
            intervals.append((i, j - 1, chain[i][0] - chain[i][1]))
            i = j
        stretch = 3
        isize = len(intervals)
        out = list(chain[: intervals[0][1] + 1])
        if isize > 1:
            a0, b0, c0 = intervals[0]
            if (
                c0 != intervals[1][2]
                and b0 - a0 + 1 < stretch
                and intervals[1][1] - a0 + 1 >= stretch
            ):
                out = []

        i = 1
        while i < isize - 1:
            a, b, c = intervals[i]
            pa, pb, pc = intervals[i - 1]
            na, nb, nc = intervals[i + 1]
            if (
                c != pc
                and pc == nc
                and b - a + 1 < stretch
                and pb - pa + 1 >= stretch
                and nb - na + 1 >= stretch
            ):
                i += 1
                continue
            if (
                c != pc
                and pc == nc
                and b - a + 1 < 2 * stretch
                and pb - pa + 1 >= 10 * stretch
                and nb - na + 1 >= 10 * stretch
            ):
                i += 1
                continue
            out.extend(chain[a : b + 1])
            i += 1

        if isize > 1:
            a, b, c = intervals[isize - 1]
            pa, pb, pc = intervals[isize - 2]
            if not (
                pc != c and b - a + 1 < stretch and pb - pa + 1 >= stretch
            ):
                out.extend(chain[a : b + 1])
        return out

    # ------------------------------------------------------------------
    # Hit generation (SeqSet.hpp:1341-1501) and sorting (1312-1339)
    # ------------------------------------------------------------------

    def get_hits_from_read(
        self,
        read: str,
        strand: int,
        barcode: int,
        allow_total_skip: bool,
        puse: Optional[List[bool]] = None,
    ) -> List[Tuple[int, int, int, int, int]]:
        """Probe the index with every k-mer of read (+RC).

        Returns hits as tuples (strand_key, seq_idx, read_offset, seq_offset,
        repeats) where strand_key is 0 for strand -1 and 1 for +1 — the
        bucket-sort order of the reference (SortHits, SeqSet.hpp:3159-3169
        uses tag = strand==1).  NOTE: the reference sorts -1 before +1.
        """
        kl = self.kmer_length
        length = len(read)
        hits: List[Tuple[int, int, int, int, int]] = []

        skip_limit = kl // 2
        if len(self.seqs) > 0 and self.seqs[0] is not None and self.seqs[0].is_ref:
            skip_limit = 0
        down_sample = 1
        if length > 200 and self.is_long_seq_set:
            down_sample = 1 + length // 200

        def scan(seq: str, st: int) -> None:
            codes, valid = kmer_codes(seq, kl)
            n = len(codes)
            skip_cnt = 0
            # prev code only advances on positions that complete the loop
            # body (skips bypass the update) — initial rolling state is 0.
            prev_code = 0
            for w in range(n):
                if down_sample > 1 and w % down_sample != 0:
                    continue
                code = int(codes[w])
                if w == 0 or code != prev_code:
                    postings = (
                        self.seq_index.search(code, barcode) if valid[w] else []
                    )
                    size = len(postings)
                    if (
                        size >= 100
                        and puse is None
                        and w != 0
                        and w != n - 1
                        and skip_cnt < skip_limit
                    ):
                        skip_cnt += 1
                        continue
                    if size >= 100 and allow_total_skip:
                        continue
                    skip_cnt = 0
                    if puse is not None:
                        repeats = sum(1 for idx, _ in postings if puse[idx])
                    else:
                        repeats = size
                    if barcode != -1:
                        repeats = 1
                    for idx, off in postings:
                        if puse is not None and not puse[idx]:
                            continue
                        if barcode != -1 and self.seqs[idx].barcode != barcode:
                            continue
                        hits.append((1 if st == 1 else 0, idx, w, off, repeats))
                prev_code = code

        if strand != -1:
            scan(read, 1)
        rc = revcomp(read)
        if strand != 1:
            scan(rc, -1)
        return hits

    def sort_hits(self, hits) -> List[Tuple[int, int, int, int, int]]:
        """Equivalent of SortHits (SeqSet.hpp:1312-1339).

        When hits > 2*seqCnt the reference bucket-sorts, preserving insertion
        order within each (strand, seq) bucket; otherwise std::sort orders by
        (strand, idx, readOffset, seqOffset).  The distinction matters
        because one downstream filter indexes the global hit array
        (SeqSet.hpp:929-935), so we replicate both paths: Python's sort is
        stable, so bucket order is a stable sort on (strand, idx).
        """
        if len(hits) > 2 * len(self.seqs):
            return sorted(hits, key=lambda h: (h[0], h[1]))
        return sorted(hits, key=lambda h: (h[0], h[1], h[2], h[3]))

    # ------------------------------------------------------------------
    # Overlap construction from hits (SeqSet.hpp:763-1063)
    # ------------------------------------------------------------------

    def _total_hit_length_on(self, offs: List[int]) -> int:
        kl = self.kmer_length
        ret = 0
        i = 0
        n = len(offs)
        while i < n:
            j = i + 1
            while j < n and offs[j] <= offs[j - 1] + kl - 1:
                j += 1
            ret += offs[j - 1] - offs[i] + kl
            i = j
        return ret

    def get_overlaps_from_hits(
        self,
        hits,
        hit_len_required: int,
        filter_: int,
        conservative_chain: bool,
        overlaps: List[Overlap],
    ) -> int:
        kl = self.kmer_length
        hit_size = len(hits)

        novel_min_hit = [3, 3]
        ref_min_hit = [3, 3]
        remove_only_repeats = [False, False]
        possible_overlap_cnt = [0, 0]
        if filter_ == 1:
            longest_hits = [0, 0]
            i = 0
            while i < hit_size:
                st = hits[i][0]
                j = i + 1
                while j < hit_size and hits[j][0] == st and hits[j][1] == hits[i][1]:
                    j += 1
                if not self.seqs[hits[i][1]].is_ref:
                    if j - i > novel_min_hit[st]:
                        possible_overlap_cnt[st] += 1
                    if j - i > longest_hits[st]:
                        longest_hits[st] = j - i
                if not remove_only_repeats[st]:
                    cnt = 0
                    for k in range(i, j):
                        if hits[k][4] <= 10000:
                            cnt += 1
                    if cnt >= novel_min_hit[st]:
                        remove_only_repeats[st] = True
                # Reference quirk (SeqSet.hpp:811 `i = j` inside a `++i`
                # for-loop): the scan resumes at j+1, counting each later
                # group one hit short and skipping single-hit groups,
                # which skews the novel_min_hit adaptation.
                i = j + 1
            for s in range(2):
                if possible_overlap_cnt[s] > 100000:
                    novel_min_hit[s] = int(longest_hits[s] * 0.75)
                elif possible_overlap_cnt[s] > 10000:
                    novel_min_hit[s] = longest_hits[s] // 2
                elif possible_overlap_cnt[s] > 1000:
                    novel_min_hit[s] = longest_hits[s] // 3
                elif possible_overlap_cnt[s] > 100:
                    novel_min_hit[s] = longest_hits[s] // 4

        i = 0
        while i < hit_size:
            st = hits[i][0]
            seq_idx = hits[i][1]
            j = i + 1
            while j < hit_size and hits[j][0] == st and hits[j][1] == seq_idx:
                j += 1

            min_hit_required = (
                ref_min_hit[st] if self.seqs[seq_idx].is_ref else novel_min_hit[st]
            )
            if j - i < min_hit_required:
                i = j
                continue
            if remove_only_repeats[st]:
                has_unique = any(hits[k][4] <= 10000 for k in range(i, j))
                if not has_unique:
                    i = j
                    continue

            # (readOffset, seqOffset, diff) sorted by (diff, seqOffset,
            # readOffset) — CompSortHitCoordDiff.
            hit_coord_diff = sorted(
                ((hits[k][2], hits[k][3], hits[k][2] - hits[k][3]) for k in range(i, j)),
                key=lambda t: (t[2], t[1], t[0]),
            )
            group_n = j - i
            adjust_radius = self.radius if self.seqs[seq_idx].is_ref else 0

            s = 0
            while s < group_n:
                e = s + 1
                while e < group_n:
                    diff = hit_coord_diff[e][2] - hit_coord_diff[e - 1][2]
                    if _abs(diff) > adjust_radius:
                        break
                    e += 1

                if e - s < min_hit_required or (e - s) * kl < hit_len_required:
                    s = e
                    continue
                if remove_only_repeats[st]:
                    # Reference quirk: this check indexes the GLOBAL hit
                    # array with the group-local positions s..e
                    # (SeqSet.hpp:929-935).
                    has_unique = any(
                        hits[k][4] <= 10000 for k in range(s, min(e, hit_size))
                    )
                    if not has_unique:
                        s = e
                        continue

                concordant = [(t[0], t[1]) for t in hit_coord_diff[s:e]]
                if adjust_radius > 0:
                    concordant.sort(key=lambda p: (p[1], p[0]))
                lis = self.longest_increasing_subsequence(concordant)
                if len(lis) * kl < hit_len_required:
                    s = e
                    continue
                if conservative_chain:
                    lis = self.remove_low_quality_hits_from_chain(lis)

                lis_start = 0
                lis_end = len(lis) - 1
                if self.is_long_seq_set:
                    max_gap = 2 * hit_len_required + 3 * kl
                    if filter_ == 0:
                        max_gap *= 4
                    if max_gap < 200:
                        max_gap = 200
                    best = -1
                    k = 0
                    n_lis = len(lis)
                    while k < n_lis:
                        l = k + 1
                        while l < n_lis and lis[l][0] - lis[l - 1][0] <= max_gap:
                            l += 1
                        if l - k > best:
                            best = l - k
                            lis_start = k
                            lis_end = l - 1
                        k = l

                final = lis[lis_start : lis_end + 1]
                read_offs = [p[0] for p in final]
                seq_offs = [p[1] for p in final]
                hit_len = self._total_hit_length_on(read_offs)
                if hit_len < hit_len_required:
                    s = e
                    continue
                if self._total_hit_length_on(seq_offs) < hit_len_required:
                    s = e
                    continue

                no = Overlap(
                    seq_idx=seq_idx,
                    read_start=final[0][0],
                    read_end=final[-1][0] + kl - 1,
                    strand=1 if st == 1 else -1,
                    seq_start=final[0][1],
                    seq_end=final[-1][1] + kl - 1,
                    match_cnt=2 * hit_len,
                    similarity=0.0,
                    hit_coords=final,
                )
                if (
                    not self.seqs[seq_idx].is_ref
                    and hit_len * 2 < no.seq_end - no.seq_start + 1
                ):
                    s = e
                    continue
                overlaps.append(no)
                s = e
            i = j
        return len(overlaps)

    def get_vj_overlaps_from_hits(self, hits, overlaps: List[Overlap]) -> int:
        """VJ-spanning rescue (SeqSet.hpp:1066-1161)."""
        vj_hits = []
        for h in hits:
            sw = self.seqs[h[1]]
            if not sw.is_ref:
                continue
            if len(sw.name) > 3 and sw.name[3] == "V" and h[3] >= sw.consensus_len - 31:
                vj_hits.append(h)
            elif len(sw.name) > 3 and sw.name[3] == "J" and h[3] < 31:
                vj_hits.append(h)

        tmp: List[Overlap] = []
        self.get_overlaps_from_hits(vj_hits, 17, 0, False, tmp)

        overlap_cnt = len(tmp)
        max_match = 0
        tagi = tagj = 0
        for i in range(overlap_cnt):
            for j in range(i + 1, overlap_cnt):
                ni = self.seqs[tmp[i].seq_idx].name
                nj = self.seqs[tmp[j].seq_idx].name
                if ni[:3] != nj[:3] or ni[3] == nj[3]:
                    continue
                if ni[3] == "V":
                    if tmp[i].read_start > tmp[j].read_start:
                        continue
                else:
                    if tmp[i].read_start < tmp[j].read_start:
                        continue
                if tmp[i].match_cnt + tmp[j].match_cnt > max_match:
                    max_match = tmp[i].match_cnt + tmp[j].match_cnt
                    tagi, tagj = i, j
        if max_match == 0:
            return 0
        overlaps.append(tmp[tagi])
        overlaps.append(tmp[tagj])
        return 2

    # ------------------------------------------------------------------
    # Overlap extension (SeqSet.hpp:1165-1277)
    # ------------------------------------------------------------------

    def extend_overlap(
        self, r: str, length: int, seq, mismatch_threshold_factor: float, overlap
    ) -> Tuple[int, Overlap]:
        """Extend an overlap to the read/seq boundaries with profile DP.

        Returns (ok, extended_overlap).  Any indel in an overhang voids full
        extension; the longest >75%-match prefix survives as the "good"
        extension (reference: ExtendOverlap).
        """
        w = seq.pos_weight
        if align_native.available() and w is not None:
            (ret, left, right, good_left, good_right, match_cnt,
             mismatch_cnt, indel_cnt) = align_native.extend_overlap_core(
                w, r.encode("ascii"), length, seq.consensus_len,
                overlap.read_start, overlap.read_end,
                overlap.seq_start, overlap.seq_end,
            )
            return self._finish_extend_overlap(
                ret, left, right, good_left, good_right, match_cnt,
                mismatch_cnt, mismatch_threshold_factor, overlap,
            )

        ret = 1
        left = min(overlap.read_start, overlap.seq_start)
        _, align = align_host.global_alignment_posweight(
            w[overlap.seq_start - left : overlap.seq_start],
            r[overlap.read_start - left : overlap.read_start],
        )
        match_cnt = mismatch_cnt = indel_cnt = 0
        for a in align:
            if a == 0:
                match_cnt += 1
            elif a == 1:
                mismatch_cnt += 1
            else:
                indel_cnt += 1
        if indel_cnt > 0:
            left = 0
            ret = 0
        good_left = 0
        tmp_match = 0
        k = 1
        for idx in range(len(align) - 1, -1, -1):
            a = align[idx]
            if a == 0:
                tmp_match += 1
                if tmp_match > 0.75 * k:
                    good_left = k
            elif a != 1:
                break
            k += 1

        right = min(length - 1 - overlap.read_end, seq.consensus_len - 1 - overlap.seq_end)
        _, align2 = align_host.global_alignment_posweight(
            w[overlap.seq_end + 1 : overlap.seq_end + 1 + right],
            r[overlap.read_end + 1 : overlap.read_end + 1 + right],
        )
        old_indel = indel_cnt
        for a in align2:
            if a == 0:
                match_cnt += 1
            elif a == 1:
                mismatch_cnt += 1
            else:
                indel_cnt += 1
        if indel_cnt > old_indel:
            right = 0
            ret = 0
        good_right = 0
        tmp_match = 0
        for idx in range(len(align2)):
            a = align2[idx]
            if a == 0:
                tmp_match += 1
                if tmp_match > 0.75 * (idx + 1):
                    good_right = idx + 1
            elif a != 1:
                break

        return self._finish_extend_overlap(
            ret, left, right, good_left, good_right, match_cnt,
            mismatch_cnt, mismatch_threshold_factor, overlap,
        )

    def _finish_extend_overlap(
        self, ret, left, right, good_left, good_right, match_cnt,
        mismatch_cnt, mismatch_threshold_factor, overlap
    ):
        mismatch_threshold = 2
        if left >= 2:
            mismatch_threshold += 1
        if right >= 2:
            mismatch_threshold += 1
        density_threshold = 1.5 / self.kmer_length
        mismatch_threshold *= mismatch_threshold_factor
        if mismatch_cnt > mismatch_threshold and (
            (left + right) != 0
            and mismatch_cnt / (left + right) > density_threshold
        ):
            ret = 0

        ext = Overlap(
            seq_idx=overlap.seq_idx,
            read_start=overlap.read_start - left,
            read_end=overlap.read_end + right,
            seq_start=overlap.seq_start - left,
            seq_end=overlap.seq_end + right,
            strand=overlap.strand,
            match_cnt=2 * match_cnt + overlap.match_cnt,
        )
        ext.similarity = (2 * match_cnt + overlap.match_cnt) / (
            ext.read_end - ext.read_start + 1 + ext.seq_end - ext.seq_start + 1
        )
        sw = self.seqs[ext.seq_idx]
        if (sw.is_ref and ext.similarity < self.ref_seq_similarity) or (
            not sw.is_ref and ext.similarity < self.novel_seq_similarity
        ):
            ext = _dc_replace(overlap)
            ret = 0

        if ret == 0:
            ext.read_start = overlap.read_start - good_left
            ext.read_end = overlap.read_end + good_right
            ext.seq_start = overlap.seq_start - good_left
            ext.seq_end = overlap.seq_end + good_right
        return ret, ext

    def is_overlap_low_complex(self, r: str, o: Overlap) -> bool:
        """SeqSet.hpp:590-617."""
        cnt = [0, 0, 0, 0]
        for i in range(o.read_start, o.read_end + 1):
            c = r[i]
            if c == "N":
                continue
            cnt["ACGT".index(c)] += 1
        low_cnt = 0
        low_total = 0
        for x in cnt:
            if x <= 2:
                low_cnt += 1
                low_total += x
        if low_total * 7 >= o.read_end - o.read_start + 1:
            return False
        return low_cnt >= 2

    def is_overlap_substring_of(
        self, a: Overlap, b: Overlap, strict: bool, max_mismatch: int
    ) -> bool:
        """SeqSet.hpp:1282-1308."""
        if a.seq_idx == -1 or b.seq_idx == -1:
            return False
        if a.read_start < b.read_start or a.read_end > b.read_end:
            return False
        if strict and a.read_end - a.read_start == b.read_end - b.read_start:
            return False
        offset = a.read_start - b.read_start
        mism = 0
        ca = self.seqs[a.seq_idx].consensus
        cb = self.seqs[b.seq_idx].consensus
        j = b.seq_start + offset
        for i in range(a.seq_start, a.seq_end + 1):
            if j >= len(cb) or ca[i] != cb[j]:
                mism += 1
            if mism > max_mismatch:
                return False
            j += 1
        return True

    # ------------------------------------------------------------------
    # GetOverlapsFromRead (SeqSet.hpp:1508-2124)
    # ------------------------------------------------------------------

    def get_overlaps_from_read(
        self,
        read: str,
        strand: int,
        barcode: int,
        read_type: int,
        skip_repeats: bool,
        overlaps: List[Overlap],
        puse: Optional[List[bool]] = None,
    ) -> int:
        """Dispatch: fully-native scored query (default) with the host
        implementation as oracle (TRUST4_TPU_SCORED=0 forces host,
        TRUST4_TPU_SCORED_CHECK=1 runs both and asserts equality)."""
        import os as _os

        import numpy as _np

        scored_on = _os.environ.get("TRUST4_TPU_SCORED", "1") != "0"
        check = _os.environ.get("TRUST4_TPU_SCORED_CHECK", "0") == "1"
        # Precomputed batch results (annotator phase-1; see
        # pipeline/annotator.py) keyed by the full query tuple.
        cache = getattr(self, "_scored_cache", None)
        if cache is not None and puse is None and not check:
            hit = cache.get((read, strand, barcode, read_type, skip_repeats))
            if hit is not None:
                n, rows, sims = hit
                if n > 0:
                    flat = rows.tolist()
                    fsims = sims.tolist()
                    for i in range(n):
                        r9 = flat[i]
                        overlaps.append(
                            Overlap(
                                seq_idx=r9[0], read_start=r9[1],
                                read_end=r9[2], strand=r9[3],
                                seq_start=r9[4], seq_end=r9[5],
                                match_cnt=r9[6], indel_cnt=r9[7],
                                similarity=fsims[i], info_from_hits=r9[8],
                            )
                        )
                return n if n < 0 else max(n, 0)
        nat = self._native_sync() if scored_on else None
        if nat is None:
            return self._gofr_host(
                read, strand, barcode, read_type, skip_repeats, overlaps,
                puse,
            )
        puse_arr = (
            _np.asarray(puse, dtype=_np.uint8) if puse is not None else None
        )
        n, rows, sims = nat.query_scored(
            read, strand, barcode, read_type, skip_repeats, puse_arr,
            self.radius, self.hit_len_required, self.is_long_seq_set,
            self.nomatch_gap_limit, self.novel_seq_similarity,
            self.ref_seq_similarity, self.repeat_similarity,
        )
        res: List[Overlap] = []
        if n > 0:
            flat = rows[:n].tolist()
            fsims = sims[:n].tolist()
            for i in range(n):
                r9 = flat[i]
                res.append(
                    Overlap(
                        seq_idx=r9[0], read_start=r9[1], read_end=r9[2],
                        strand=r9[3], seq_start=r9[4], seq_end=r9[5],
                        match_cnt=r9[6], indel_cnt=r9[7],
                        similarity=fsims[i], info_from_hits=r9[8],
                    )
                )
        if check:
            host: List[Overlap] = []
            host_n = self._gofr_host(
                read, strand, barcode, read_type, skip_repeats, host, puse
            )
            got = [
                (o.seq_idx, o.read_start, o.read_end, o.strand, o.seq_start,
                 o.seq_end, o.match_cnt, o.indel_cnt, o.similarity,
                 o.info_from_hits)
                for o in host
            ]
            want = [
                (o.seq_idx, o.read_start, o.read_end, o.strand, o.seq_start,
                 o.seq_end, o.match_cnt, o.indel_cnt, o.similarity,
                 o.info_from_hits)
                for o in res
            ]
            assert got == want and max(host_n, 0) == max(n, 0), (
                f"scored-query mismatch for read {read[:40]}...: "
                f"host_n={host_n} nat_n={n} host={got[:3]} nat={want[:3]}"
            )
        overlaps.extend(res)
        return n if n < 0 else len(res)

    def _gofr_host(
        self,
        read: str,
        strand: int,
        barcode: int,
        read_type: int,
        skip_repeats: bool,
        overlaps: List[Overlap],
        puse: Optional[List[bool]] = None,
    ) -> int:
        kl = self.kmer_length
        length = len(read)
        if length < kl:
            return -1

        native = self.seq_index.native
        native_overlaps = None
        if native is not None:
            import os as _os

            import numpy as _np2

            skip_limit = kl // 2
            if (
                len(self.seqs) > 0
                and self.seqs[0] is not None
                and self.seqs[0].is_ref
            ):
                skip_limit = 0
            down_sample = 1
            if length > 200 and self.is_long_seq_set:
                down_sample = 1 + length // 200
            puse_arr = (
                _np2.asarray(puse, dtype=_np2.uint8)
                if puse is not None
                else None
            )
            rows = native.query(
                read, strand, barcode, read_type, skip_repeats, puse_arr,
                self._native_meta(), self.radius, self.hit_len_required,
                self.is_long_seq_set, skip_limit, down_sample,
            )
            native_overlaps = [
                Overlap(
                    seq_idx=r0,
                    read_start=r1,
                    read_end=r2,
                    strand=r3,
                    seq_start=r4,
                    seq_end=r5,
                    match_cnt=r6,
                    similarity=0.0,
                    hit_coords=coords,
                    coord_ref=(cptr, ccnt),
                )
                for (r0, r1, r2, r3, r4, r5, r6, coords, cptr, ccnt) in rows
            ]
            if _os.environ.get("TRUST4_TPU_OVERLAP_CHECK", "0") != "1":
                if not native_overlaps:
                    return 0
                overlaps.extend(native_overlaps)

        if native is None or native_overlaps is None or not overlaps:
            overlap_cnt = 0
            if skip_repeats and puse is None:
                hits = self.get_hits_from_read(read, strand, barcode, True, puse)
                hits = self.sort_hits(hits)
                overlap_cnt = self.get_overlaps_from_hits(
                    hits, self.hit_len_required, 0, False, overlaps
                )
                if overlap_cnt == 0:
                    overlaps.clear()

            if overlap_cnt == 0:
                hits = self.get_hits_from_read(read, strand, barcode, False, puse)
                hits = self.sort_hits(hits)
                filter_hits = 1 if read_type == 0 else 0
                overlap_cnt = self.get_overlaps_from_hits(
                    hits,
                    self.hit_len_required,
                    filter_hits,
                    read_type != 0,
                    overlaps,
                )

            if overlap_cnt == 0:
                overlap_cnt = self.get_vj_overlaps_from_hits(hits, overlaps)

            if native_overlaps is not None:
                # Differential check mode: both paths ran; compare.
                got = [
                    (o.seq_idx, o.read_start, o.read_end, o.strand,
                     o.seq_start, o.seq_end, o.match_cnt, o.hit_coords)
                    for o in overlaps
                ]
                want = [
                    (o.seq_idx, o.read_start, o.read_end, o.strand,
                     o.seq_start, o.seq_end, o.match_cnt,
                     [tuple(int(v) for v in c) for c in o.hit_coords])
                    for o in native_overlaps
                ]
                assert got == want, (
                    f"native overlap mismatch for read {read[:40]}...: "
                    f"host={got[:3]} native={want[:3]}"
                )
            if overlap_cnt == 0:
                return 0

        overlaps.sort(key=lambda o: o.sort_key())
        overlap_cnt = len(overlaps)

        # Strand consistency filter.
        if read_type == 0:
            kept = [overlaps[0]]
            for i in range(1, overlap_cnt):
                if overlaps[i].strand == overlaps[0].strand:
                    kept.append(overlaps[i])
        else:
            kept = [o for o in overlaps if o.strand == 1]
        overlaps[:] = kept
        overlap_cnt = len(overlaps)

        rc_read = revcomp(read)
        read_bytes = read.encode("ascii")
        rc_read_bytes = rc_read.encode("ascii")

        # Prefix base counts for the O(1) low-complexity test (same result
        # as is_overlap_low_complex, SeqSet.hpp:590-617).  Built lazily —
        # the native chain scorer covers this check on the fast path.
        import numpy as _np

        def _base_prefix(s):
            b = _np.frombuffer(s.encode("ascii"), dtype=_np.uint8)
            p = _np.zeros((4, len(s) + 1), dtype=_np.int32)
            for ci, ch in enumerate("ACGT"):
                _np.cumsum(b == ord(ch), out=p[ci, 1:])
            return p

        _pfx = {}

        def _low_complex(strand, o):
            if strand not in _pfx:
                _pfx[strand] = _base_prefix(read if strand == 1 else rc_read)
            pfx = _pfx[strand]
            cnt = pfx[:, o.read_end + 1] - pfx[:, o.read_start]
            low = cnt <= 2
            low_total = int(cnt[low].sum())
            if low_total * 7 >= o.read_end - o.read_start + 1:
                return False
            return int(low.sum()) >= 2

        # Batch-score all overlap chains in one native call when no
        # dominance skip can fire (skips only exist for read_type==0 with
        # >50 overlaps, see the best_novel guard below); worthwhile from
        # ~8 overlaps (below that the marshaling beats the FFI savings).
        chain_batch = None
        # Precompute is exact unless a dominance skip could fire: skips
        # exist only for read_type==0 with >50 overlaps, and only ever
        # apply to NOVEL-seq overlaps (the is_ref branch above them never
        # skips), so all-ref overlap sets always qualify.
        if (
            align_native.available()
            and 8 <= overlap_cnt
            and (
                read_type != 0
                or overlap_cnt <= 50
                or not any(
                    not self.seqs[o.seq_idx].is_ref for o in overlaps
                )
            )
            and all(o.coord_ref is not None for o in overlaps)
        ):
            import numpy as _npb

            cptr_list = []
            sptr_list = []
            meta_flat = []
            keepalive = []
            batch_ok = True
            for bi, bo2 in enumerate(overlaps):
                cptr, ccnt = bo2.coord_ref
                if ccnt == 0:
                    batch_ok = False
                    break
                sw2 = self.seqs[bo2.seq_idx]
                if sw2.is_ref:
                    pc = sw2.ptr_cache
                    if pc is None:
                        cb2 = sw2.consensus.encode("ascii")
                        sw2.consensus_bytes_cache = cb2
                        view = _npb.frombuffer(cb2, dtype=_npb.uint8)
                        pc = (view, view.ctypes.data)
                        sw2.ptr_cache = pc
                    sptr_list.append(pc[1])
                else:
                    w2 = sw2.pos_weight
                    if w2.flags["C_CONTIGUOUS"] and w2.dtype == _npb.int32:
                        pc = sw2.ptr_cache
                        if pc is None or pc[0] is not w2:
                            pc = (w2, w2.ctypes.data)
                            sw2.ptr_cache = pc
                        sptr_list.append(pc[1])
                    else:
                        # never cache a converted copy: the source array
                        # could mutate in place afterwards
                        wc = _npb.ascontiguousarray(w2, dtype=_npb.int32)
                        keepalive.append(wc)
                        sptr_list.append(wc.ctypes.data)
                cptr_list.append(cptr)
                meta_flat.extend(
                    (ccnt, 1 if sw2.is_ref else 0, bo2.strand,
                     bo2.read_start, bo2.read_end)
                )
            if batch_ok:
                chain_batch = align_native.chain_score_batch(
                    _npb.array(cptr_list, dtype=_npb.int64),
                    _npb.array(meta_flat, dtype=_npb.int32),
                    _npb.array(sptr_list, dtype=_npb.int64),
                    kl, self.radius,
                    self.nomatch_gap_limit, read_bytes, rc_read_bytes,
                ).tolist()

        first_ref = -1
        best_novel = -1
        representatives: List[int] = []
        for i in range(overlap_cnt):
            o = overlaps[i]
            r = read if o.strand == 1 else rc_read
            o.info_from_hits = i
            hit_coords = o.hit_coords
            hit_cnt = len(hit_coords)
            match_cnt = 0
            mismatch_cnt = 0
            indel_cnt = 0
            similarity = 1.0
            native_low_complex = None

            sw = self.seqs[o.seq_idx]
            if sw.is_ref:
                if first_ref == -1:
                    first_ref = i
            elif best_novel != -1 and read_type == 0 and overlap_cnt > 50:
                bo = overlaps[best_novel]
                if bo.read_start == 0 and bo.read_end == length - 1:
                    if bo.similarity == 1:
                        o.similarity = 0
                        continue
                    elif (
                        bo.similarity > self.repeat_similarity
                        and o.match_cnt < 0.9 * bo.match_cnt
                    ):
                        o.similarity = 0
                        continue
                if bo.read_start + length - 1 - bo.read_end < self.radius:
                    if bo.similarity == 1 and o.match_cnt < 0.9 * bo.match_cnt:
                        o.similarity = 0
                        continue
                    elif (
                        bo.similarity > self.repeat_similarity
                        or self.is_long_seq_set
                    ) and o.match_cnt < 0.8 * bo.match_cnt:
                        o.similarity = 0
                        continue
                if (
                    o.seq_start - o.read_start >= self.radius
                    and o.seq_end + (length - 1 - o.read_end) + self.radius
                    < sw.consensus_len
                    and bo.match_cnt > 0.97 * (2 * length)
                    and bo.similarity > self.repeat_similarity
                    and o.match_cnt < 0.9 * bo.match_cnt
                ):
                    o.similarity = 0
                    continue
                if representatives and self.is_long_seq_set:
                    hit = False
                    for rk in representatives:
                        ro = overlaps[rk]
                        if (
                            o.read_start >= ro.read_start
                            and o.read_end <= ro.read_end
                            and (
                                o.match_cnt < 0.8 * ro.match_cnt
                                or self.is_overlap_substring_of(o, ro, True, 1)
                            )
                        ):
                            hit = True
                            break
                    if hit:
                        o.similarity = 0
                        continue
                if o.match_cnt < 0.4 * bo.match_cnt:
                    o.similarity = 0
                    continue
                if overlap_cnt > 1000 and o.match_cnt < 0.9 * bo.match_cnt:
                    o.similarity = 0
                    continue

            if chain_batch is not None:
                mc, mm, ind, sz, lowc = chain_batch[i]
                match_cnt = mc
                mismatch_cnt = mm
                indel_cnt = ind
                if sz:
                    similarity = 0
                native_low_complex = bool(lowc)
            elif align_native.available() and hit_cnt > 0:
                # Native chain walk: identical accumulation incl. gap-fill
                # DPs and break rules (native/align_kernels.cpp
                # t4_chain_score).
                if sw.is_ref:
                    cb = sw.consensus_bytes_cache
                    if cb is None:
                        cb = sw.consensus.encode("ascii")
                        sw.consensus_bytes_cache = cb
                else:
                    cb = None
                mc, mm, ind, sz, lowc = align_native.chain_score2(
                    hit_coords, kl, self.radius, self.nomatch_gap_limit,
                    sw.is_ref, cb,
                    None if sw.is_ref else sw.pos_weight,
                    read_bytes if o.strand == 1 else rc_read_bytes,
                    o.read_start, o.read_end,
                )
                match_cnt = mc
                mismatch_cnt = mm
                indel_cnt = ind
                if sz:
                    similarity = 0
                native_low_complex = bool(lowc)
            else:
                match_cnt += 2 * kl
                for j in range(1, hit_cnt):
                    pa, pb = hit_coords[j - 1]
                    ca, cb = hit_coords[j]
                    if pb - pa == cb - ca:
                        if pa + kl - 1 >= ca:
                            match_cnt += 2 * (ca - pa)
                        else:
                            match_cnt += 2 * kl
                            if (
                                cb - (pb + kl) > self.nomatch_gap_limit
                                or ca - (pa + kl) > self.nomatch_gap_limit
                            ):
                                similarity = 0
                                break
                            cnts = self._gap_fill_align(sw, pb + kl, cb, r, pa + kl, ca)
                            match_cnt += 2 * cnts[0]
                            mismatch_cnt += cnts[1]
                            indel_cnt += cnts[2]
                            if (self.radius == 0 or not sw.is_ref) and indel_cnt > 0:
                                similarity = 0
                                break
                    else:
                        if self.radius == 0 or not sw.is_ref:
                            similarity = 0
                            break
                        if pa + kl - 1 >= ca and pb + kl - 1 < cb:
                            match_cnt += 2 * (ca - pa)
                            indel_cnt += (cb - (pb + kl)) + (ca + kl - pa)
                        elif pa + kl - 1 < ca and pb + kl - 1 >= cb:
                            match_cnt += 2 * (cb - pb)
                            indel_cnt += (ca - (pa + kl)) + (cb + kl - pb)
                        elif pa + kl - 1 >= ca and pb + kl - 1 >= cb:
                            match_cnt += 2 * min(ca - pa, cb - pb)
                            indel_cnt += _abs((ca - cb) - (pa - pb))
                        else:
                            match_cnt += 2 * kl
                            if (
                                cb - (pb + kl) > self.nomatch_gap_limit
                                or ca - (pa + kl) > self.nomatch_gap_limit
                            ):
                                similarity = 0
                                break
                            cnts = self._gap_fill_align(sw, pb + kl, cb, r, pa + kl, ca)
                            match_cnt += 2 * cnts[0]
                            mismatch_cnt += cnts[1]
                            indel_cnt += cnts[2]
                            if not sw.is_ref and indel_cnt > 0:
                                similarity = 0
                                break


            o.match_cnt = match_cnt
            o.indel_cnt = indel_cnt
            if similarity == 1:
                o.similarity = match_cnt / (
                    o.seq_end - o.seq_start + 1 + o.read_end - o.read_start + 1
                )
            else:
                o.similarity = 0

            if native_low_complex is not None:
                if native_low_complex:
                    o.similarity = 0
            elif _low_complex(o.strand, o):
                o.similarity = 0

            if not sw.is_ref and o.similarity > 0:
                if best_novel == -1 or o.sort_key() < overlaps[best_novel].sort_key():
                    best_novel = i

            if not sw.is_ref and read_type == 1 and o.similarity < self.novel_seq_similarity:
                # Core high-identity rescue (SeqSet.hpp:2037-2076).
                max_len = 0
                max_s = max_e = 0
                j = 0
                while j < hit_cnt:
                    k = j + 1
                    while k < hit_cnt:
                        if (
                            hit_coords[k][0] > hit_coords[k - 1][0] + kl - 1
                            or hit_coords[k][0] - hit_coords[k][1]
                            != hit_coords[k - 1][0] - hit_coords[k - 1][1]
                        ):
                            break
                        k += 1
                    run_len = hit_coords[k - 1][0] - hit_coords[j][0] + kl
                    if run_len > max_len:
                        max_len = run_len
                        max_s, max_e = j, k - 1
                    j = k
                if max_len >= self.hit_len_required:
                    o.read_start = int(hit_coords[max_s][0])
                    o.read_end = int(hit_coords[max_e][0]) + kl - 1
                    o.seq_start = int(hit_coords[max_s][1])
                    o.seq_end = int(hit_coords[max_e][1]) + kl - 1
                    o.similarity = 1.0
                    o.match_cnt = 2 * max_len
                    o.indel_cnt = 0

            if o.similarity > 0:
                contained = False
                for rk in representatives:
                    ro = overlaps[rk]
                    if o.read_start >= ro.read_start and o.read_end <= ro.read_end:
                        contained = True
                        break
                if not contained:
                    representatives.append(i)

        for o in overlaps:
            o.hit_coords = None

        kept = []
        for o in overlaps:
            if self.seqs[o.seq_idx].is_ref:
                if o.similarity < self.ref_seq_similarity:
                    continue
            elif o.similarity < self.novel_seq_similarity:
                continue
            kept.append(o)
        overlaps[:] = kept
        return len(overlaps)

    def _gap_fill_align(
        self, sw, seq_from: int, seq_to: int, r: str, read_from: int, read_to: int
    ) -> Tuple[int, int, int]:
        """Banded DP over the inter-anchor gap; returns (match, mismatch,
        indel) counts from the edit script."""
        if align_native.available():
            if sw.is_ref:
                return align_native.global_alignment_counts(
                    sw.consensus[seq_from:seq_to], r[read_from:read_to]
                )
            return align_native.global_alignment_posweight_counts(
                sw.pos_weight[seq_from:seq_to], r[read_from:read_to]
            )
        if sw.is_ref:
            _, align = align_host.global_alignment(
                sw.consensus[seq_from:seq_to], r[read_from:read_to]
            )
        else:
            _, align = align_host.global_alignment_posweight(
                sw.pos_weight[seq_from:seq_to], r[read_from:read_to]
            )
        m = mm = ind = 0
        for a in align:
            if a == 0:
                m += 1
            elif a == 1:
                mm += 1
            else:
                ind += 1
        return m, mm, ind

    # ------------------------------------------------------------------
    # HasHitInSet — the extractor candidate test (SeqSet.hpp:3144-3327)
    # ------------------------------------------------------------------

    def has_hit_in_set(self, read: str, mode: int = 0) -> int:
        if len(read) < self.kmer_length:
            return 0
        hits = self.get_hits_from_read(read, 0, -1, False, None)
        if not hits:
            return 0

        # Bucket per (strand_key, seq).
        buckets: dict = {}
        for h in hits:
            buckets.setdefault((h[0], h[1]), []).append(h)

        kl = self.kmer_length
        max_cnt = [-1, -1]
        max_seq_idx = [-1, -1]
        # Iterate strand then ascending seq idx so the lowest idx wins ties
        # (reference scans dense per-seq bucket arrays, SeqSet.hpp:3172-3192).
        for k, idx in sorted(buckets.keys()):
            bh = buckets[(k, idx)]
            read_hit_count = 1
            for j in range(1, len(bh)):
                if bh[j][2] != bh[j - 1][2]:
                    read_hit_count += 1
            if read_hit_count > max_cnt[k]:
                max_cnt[k] = read_hit_count
                max_seq_idx[k] = idx

        overlaps: List[Overlap] = []
        if mode == 1 and (
            max_cnt[0] + kl - 1 >= self.hit_len_required
            and max_cnt[1] + kl - 1 >= self.hit_len_required
        ):
            max_tag = 1
            max_match_cnt = 0
            for k in range(2):
                seq_cnt = len(self.seqs)
                for idx in range(seq_cnt):
                    bh = buckets.get((k, idx))
                    if not bh:
                        continue
                    read_hit_count = 1
                    for j in range(1, len(bh)):
                        if bh[j][2] != bh[j - 1][2]:
                            read_hit_count += 1
                    if read_hit_count + kl - 1 < self.hit_len_required:
                        continue
                    tmp: List[Overlap] = []
                    self.get_overlaps_from_hits(
                        bh, self.hit_len_required, 1, False, tmp
                    )
                    for o in tmp:
                        if o.match_cnt > max_match_cnt:
                            overlaps = tmp
                            max_match_cnt = o.match_cnt
                            max_tag = 1 if o.strand == 1 else 0
                            break
        elif (
            max_cnt[0] + kl - 1 >= self.hit_len_required
            and max_cnt[1] + kl - 1 >= self.hit_len_required
        ):
            tmp0: List[Overlap] = []
            tmp1: List[Overlap] = []
            self.get_overlaps_from_hits(
                buckets.get((0, max_seq_idx[0]), []),
                self.hit_len_required,
                1,
                False,
                tmp0,
            )
            self.get_overlaps_from_hits(
                buckets.get((1, max_seq_idx[1]), []),
                self.hit_len_required,
                1,
                False,
                tmp1,
            )
            if tmp0 and tmp1:
                if tmp0[0].match_cnt >= tmp1[0].match_cnt:
                    max_tag, overlaps = 0, tmp0
                else:
                    max_tag, overlaps = 1, tmp1
            elif tmp0:
                max_tag, overlaps = 0, tmp0
            else:
                max_tag, overlaps = 1, tmp1
        else:
            max_tag = 1 if max_cnt[1] >= max_cnt[0] else 0
            self.get_overlaps_from_hits(
                buckets.get((max_tag, max_seq_idx[max_tag]), []),
                self.hit_len_required,
                1,
                False,
                overlaps,
            )

        if not overlaps:
            return 0
        return -1 if max_tag == 0 else 1
