"""Assembly operations for SeqSet: greedy seed-extend contig building.

Re-implements the reference's central AddRead operation and its supporting
mutations (reference: SeqSet.hpp:3426-4738).  The greedy commit order is the
serialization contract that makes outputs reproducible; batched TPU sweeps
feed candidates into this host-side commit logic.

Position weights are (L, 4) int32 numpy arrays; consensus strings are Python
str (host-side authority), mirrored into fixed-shape device arenas only for
the batched kernels.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from trust4_tpu.dna import revcomp, nuc_num, NUM_TO_NUC, seq_to_codes
from trust4_tpu.engine.types import SeqWrapper, Overlap


@dataclass
class PrevAddInfo:
    seq_idx: int = -1
    read_start: int = -1
    read_end: int = -1
    seq_start: int = -1
    seq_end: int = -1
    strand: int = 0


def accumulate_read(pos_weight: np.ndarray, offset: int, r: str) -> None:
    """posWeight[i+offset].count[nuc[r[i]]]++ for non-N bases
    (reference: SeqSet.hpp:2466-2474, UpdatePosWeightFromRead)."""
    codes = seq_to_codes(r)
    mask = np.frombuffer(r.encode("ascii"), dtype=np.uint8) != ord("N")
    idx = np.nonzero(mask)[0]
    # Each position appears once, so plain fancy-index increment is exact
    # (and several times faster than np.add.at's unbuffered path).
    pos_weight[idx + offset, codes[idx].astype(np.int64)] += 1


def new_pos_weight_from_seq(consensus: str) -> np.ndarray:
    """Weight 1 at each non-N consensus base (SeqSet.hpp:3056-3062)."""
    w = np.zeros((len(consensus), 4), dtype=np.int32)
    accumulate_read(w, 0, consensus)
    return w


def sort_overlap_on_ref_key(o: Overlap):
    """_sortOverlapOnRef comparator (SeqSet.hpp:139-160)."""
    return (
        -o.match_cnt,
        -o.similarity,
        -(o.read_end - o.read_start),
        o.strand,
        o.seq_start,
        o.seq_end,
        o.read_start,
        o.read_end,
    )


class AssembleMixin:
    """Mixed into SeqSet (see seqset.py)."""

    # ------------------------------------------------------------------
    # Sequence input (SeqSet.hpp:2986-3139)
    # ------------------------------------------------------------------

    def set_prev_add_info(self, seq_idx, read_start, read_end, seq_start, seq_end, strand):
        self.prev_add_info = PrevAddInfo(
            seq_idx, read_start, read_end, seq_start, seq_end, strand
        )

    def release_seq(self, idx: int) -> None:
        sw = self.seqs[idx]
        if sw is None or sw.consensus is None:
            return
        sw.name = None
        sw.consensus = None
        sw.pos_weight = None

    def input_ref_seq(self, name: str, read: str) -> int:
        sw = SeqWrapper(name=name, consensus=read, is_ref=True)
        sw.pos_weight = new_pos_weight_from_seq(read)
        sid = len(self.seqs)
        self.seqs.append(sw)
        self.seq_index.build_from_read(read, self.kmer_length, sid, -1)
        self.set_prev_add_info(sid, 0, len(read) - 1, 0, len(read) - 1, 1)
        return sid

    def input_novel_read(self, name: str, read: str, strand: int, barcode: int) -> int:
        if self.native_master:
            return self.seq_index.native.s_input_novel_read(
                name, read, strand, barcode
            )
        consensus = revcomp(read) if strand == -1 else read
        sw = SeqWrapper(name=name, consensus=consensus, is_ref=False)
        sw.barcode = barcode
        sw.num_read = 1
        sw.info = [[0, 0, 0], [0, 0, 0], [0, 0, 0]]
        sw.pos_weight = new_pos_weight_from_seq(consensus)
        sid = len(self.seqs)
        self.seqs.append(sw)
        self.seq_index.build_from_read(consensus, self.kmer_length, sid, barcode)
        self.set_prev_add_info(sid, 0, len(read) - 1, 0, len(read) - 1, strand)
        return sid

    def input_novel_seq(self, name: str, seq: str, pos_weight: np.ndarray,
                        defer_index: bool = False) -> int:
        """defer_index=True skips the per-seq index build so a bulk loader
        (annotator load_assembly) can run one batched rebuild after all
        seqs are in — only valid while no query runs in between."""
        sw = SeqWrapper(name=name, consensus=seq, is_ref=False)
        sw.info = [[0, 0, 0], [0, 0, 0], [0, 0, 0]]
        sw.pos_weight = pos_weight
        sid = len(self.seqs)
        self.seqs.append(sw)
        if not defer_index:
            self.seq_index.build_from_read(seq, self.kmer_length, sid, -1)
        self.set_prev_add_info(sid, 0, len(seq) - 1, 0, len(seq) - 1, 1)
        return sid

    def input_seq_set(self, other, input_ref: bool) -> None:
        """SeqSet.hpp:3108-3139."""
        for sw in other.seqs:
            if sw is None or sw.consensus is None:
                continue
            if not input_ref and sw.is_ref:
                continue
            ns = SeqWrapper(
                name=sw.name,
                consensus=sw.consensus,
                is_ref=sw.is_ref,
                barcode=sw.barcode,
                num_read=sw.num_read,
                min_left_ext_anchor=sw.min_left_ext_anchor,
                min_right_ext_anchor=sw.min_right_ext_anchor,
                index=sw.index,
            )
            ns.pos_weight = (
                None if sw.pos_weight is None else sw.pos_weight.copy()
            )
            sid = len(self.seqs)
            self.seqs.append(ns)
            if ns.index:
                self.seq_index.build_from_read(
                    ns.consensus, self.kmer_length, sid, ns.barcode
                )

    # ------------------------------------------------------------------
    # Consensus maintenance (SeqSet.hpp:4525-4629, 11058-11080)
    # ------------------------------------------------------------------

    def substitute_consensus_pos(
        self, seq_idx: int, pos: int, c: str, update_index: bool
    ) -> None:
        sw = self.seqs[seq_idx]
        if pos >= sw.consensus_len or sw.consensus[pos] == c:
            return
        kl = self.kmer_length
        start = max(0, pos - kl + 1)
        end = min(sw.consensus_len - 1, pos + kl - 1)
        if update_index:
            self.seq_index.remove_from_read(
                sw.consensus[start : end + 1], kl, seq_idx, sw.barcode, start
            )
        sw.consensus = sw.consensus[:pos] + c + sw.consensus[pos + 1 :]
        if update_index and sw.index:
            self.seq_index.build_from_read(
                sw.consensus[start : end + 1], kl, seq_idx, sw.barcode, start
            )

    def update_consensus(self, seq_idx: int, update_index: bool) -> None:
        sw = self.seqs[seq_idx]
        if sw.pos_weight_compressed:
            return
        w = sw.pos_weight
        cons = sw.consensus
        maxv = w.max(axis=1)
        argmax = w.argmax(axis=1)
        from trust4_tpu.dna import seq_to_codes

        cur = seq_to_codes(cons).astype(np.int64)
        cur_count = w[np.arange(len(cons)), cur]
        change = (maxv > 0) & (argmax != cur) & (cur_count < maxv)
        if not change.any():
            return
        if update_index and sw.index:
            self.seq_index.remove_from_read(
                cons, self.kmer_length, seq_idx, sw.barcode, 0
            )
        chars = list(cons)
        for i in np.nonzero(change)[0]:
            chars[i] = NUM_TO_NUC[argmax[i]]
        sw.consensus = "".join(chars)
        if update_index and sw.index:
            self.seq_index.build_from_read(
                sw.consensus, self.kmer_length, seq_idx, sw.barcode, 0
            )

    def update_all_consensus(self) -> None:
        if self.native_master:
            self.seq_index.native.s_update_all_consensus()
            return
        for i, sw in enumerate(self.seqs):
            if sw is None or sw.is_ref or sw.consensus is None:
                continue
            self.update_consensus(i, True)

    def clean(self, remove_ref_seq: bool) -> None:
        """Compact seqs and rebuild the index (SeqSet.hpp:4591-4622)."""
        self.seq_index.clear()
        self._native_reset()  # seq indices change below
        kept: List[SeqWrapper] = []
        batch: List[tuple] = []
        for sw in self.seqs:
            if sw is None or sw.consensus is None:
                continue
            if remove_ref_seq and sw.is_ref:
                continue
            k = len(kept)
            kept.append(sw)
            if sw.index:
                batch.append((sw.consensus, k, sw.barcode))
        if (
            batch
            and self.seq_index.native_only
            and self.seq_index.native is not None
        ):
            # One reserved-map FFI call instead of a per-seq rebuild loop.
            self.seq_index.native.build_batch(
                [b[0] for b in batch], self.kmer_length,
                [b[1] for b in batch], [b[2] for b in batch],
            )
        else:
            for cons, k, bc in batch:
                self.seq_index.build_from_read(
                    cons, self.kmer_length, k, bc, 0
                )
        self.seqs = kept
        self.set_prev_add_info(-1, -1, -1, -1, -1, 0)

    def change_kmer_length(self, kl: int) -> None:
        from trust4_tpu.engine.seqset import compute_nomatch_gap_limit

        self.kmer_length = kl
        self.nomatch_gap_limit = compute_nomatch_gap_limit(kl)
        if self.native_master:
            # Native clean: compaction + full reindex at the new k
            # (t4s_change_kmer_length also updates the engine's kmer_len).
            self.seq_index.native.s_change_kmer_length(kl)
            return
        if self.seq_index.native is not None:
            self.seq_index.native.set_kmer_len(kl)
        self.clean(False)

    # ------------------------------------------------------------------
    # AddRead (SeqSet.hpp:3426-4473)
    # ------------------------------------------------------------------

    def add_read(
        self,
        read: str,
        gene_name: str,
        strand: int,
        barcode: int,
        min_kmer_count: int,
        repetitive_data: bool,
        similarity_threshold: float,
    ) -> Tuple[int, int]:
        """Place a read: extend/merge/create contigs.

        Returns (ret, strand): ret is the contig idx, -1 on hard reject, -2
        when overlaps existed but no placement was possible (rescue queue).
        """
        if self.native_master:
            return self.seq_index.native.s_add_read(
                read, gene_name, strand, barcode, min_kmer_count,
                repetitive_data, similarity_threshold, self._sconf(),
            )
        length = len(read)
        self.set_prev_add_info(-1, -1, -1, -1, -1, 0)

        overlaps: List[Overlap] = []
        overlap_cnt = self.get_overlaps_from_read(
            read, strand, barcode, 0, repetitive_data, overlaps
        )
        if overlap_cnt <= 0:
            return -1, strand

        if gene_name:
            kept = []
            for o in overlaps:
                name = self.seqs[o.seq_idx].name
                j = 3
                if "A" <= name[0] <= "Z":
                    j = 0
                    while j < 3 and j < len(name) and name[j] == gene_name[j]:
                        j += 1
                if j == 3 or name == "Novel":
                    kept.append(o)
            overlaps = kept
            overlap_cnt = len(overlaps)
            if overlap_cnt <= 0:
                return -1, strand

        overlaps.sort(key=lambda o: o.sort_key())

        first_novel = 0
        while first_novel < overlap_cnt and self.seqs[overlaps[first_novel].seq_idx].is_ref:
            first_novel += 1

        extended: List[Overlap] = []
        failed_extended: List[Overlap] = []
        ret = -1
        add_new = True
        good_extended: Optional[Overlap] = None
        read_in_consensus_offset = 0
        seq_idx = -1
        tag = -1

        if first_novel < overlap_cnt:
            rc_read = revcomp(read)
            r = read if overlaps[0].strand == 1 else rc_read
            sort_extended = True
            old_min_ext_anchor = []
            mismatch_factor = 1.0 if (barcode == -1 and not repetitive_data) else 2.0

            for i in range(overlap_cnt):
                o = overlaps[i]
                sw = self.seqs[o.seq_idx]
                old_min_ext_anchor.append(
                    (sw.min_left_ext_anchor, sw.min_right_ext_anchor)
                )
                # Subset relation against already-extended overlaps
                # (SeqSet.hpp:3564-3589).
                skip = False
                for e in extended:
                    lrad = 0 if e.seq_start == 0 else self.radius
                    rrad = (
                        0
                        if e.seq_end == self.seqs[e.seq_idx].consensus_len - 1
                        else self.radius
                    )
                    if (
                        o.read_start >= e.read_start - lrad
                        and o.read_end <= e.read_end + rrad
                        and (
                            o.seq_start >= self.radius
                            or o.seq_end <= sw.consensus_len - self.radius - 1
                        )
                    ):
                        skip = True
                        break
                    lrad = 0 if o.seq_start == 0 else self.radius
                    rrad = 0 if o.seq_end == sw.consensus_len - 1 else self.radius
                    if (
                        e.read_start >= o.read_start - lrad
                        and e.read_end <= o.read_end + rrad
                    ):
                        skip = True
                        break
                if skip or sw.is_ref:
                    continue

                ok, ext = self.extend_overlap(r, length, sw, mismatch_factor, o)
                if ok == 1:
                    if ext.similarity < similarity_threshold:
                        if (
                            (min_kmer_count <= 1
                             or ext.similarity + 0.01 >= similarity_threshold)
                            and ext.read_start == 0
                            and ext.read_end == length - 1
                        ):
                            good_extended = ext
                        continue
                    # Double-check subset vs already extended
                    # (SeqSet.hpp:3615-3641).
                    skip = False
                    for e in extended:
                        lrad = 0 if e.seq_start == 0 else self.radius
                        rrad = (
                            0
                            if e.seq_end == self.seqs[e.seq_idx].consensus_len - 1
                            else self.radius
                        )
                        if (
                            ext.read_start >= e.read_start - lrad
                            and ext.read_end <= e.read_end + rrad
                            and (
                                o.seq_start > 0
                                or o.seq_end < sw.consensus_len - 1
                            )
                        ):
                            skip = True
                            break
                        if (
                            e.read_start >= ext.read_start - self.radius
                            and e.read_end <= ext.read_end + self.radius
                        ):
                            skip = True
                            break
                    if skip:
                        continue

                    # Extended portion subset of matched portions of earlier
                    # overlaps (SeqSet.hpp:3644-3677).
                    skip = False
                    for j in range(i):
                        oj = overlaps[j]
                        if self.seqs[oj.seq_idx].is_ref:
                            continue
                        if (
                            ext.seq_start == 0
                            and ext.seq_end
                            == self.seqs[ext.seq_idx].consensus_len - 1
                        ):
                            continue
                        if (
                            ext.read_start >= oj.read_start
                            and ext.read_end <= oj.read_end
                            and (
                                oj.read_end - oj.read_start
                                >= ext.read_end - ext.read_start + 10
                                or oj.similarity + 0.02 >= ext.similarity
                            )
                        ):
                            esw = self.seqs[ext.seq_idx]
                            span = ext.read_end - ext.read_start + 1
                            if ext.read_start > 0 and esw.min_left_ext_anchor < span:
                                esw.min_left_ext_anchor = span
                            if ext.read_end < length - 1 and esw.min_right_ext_anchor < span:
                                esw.min_right_ext_anchor = span
                            skip = True
                            break
                    if skip:
                        continue

                    # Previously failed extensions covering this one
                    # (SeqSet.hpp:3680-3708).
                    skip = False
                    for fe in failed_extended:
                        if (
                            ext.seq_start == 0
                            and ext.seq_end
                            == self.seqs[ext.seq_idx].consensus_len - 1
                        ):
                            continue
                        if (
                            ext.read_start >= fe.read_start
                            and ext.read_end <= fe.read_end
                        ):
                            esw = self.seqs[ext.seq_idx]
                            span = ext.read_end - ext.read_start + 1
                            if ext.read_start > 0 and esw.min_left_ext_anchor < span:
                                esw.min_left_ext_anchor = span
                            if ext.read_end < length - 1 and esw.min_right_ext_anchor < span:
                                esw.min_right_ext_anchor = span
                            skip = True
                            break
                    if skip:
                        continue

                    esw = self.seqs[ext.seq_idx]
                    span = ext.read_end - ext.read_start + 1
                    if ext.read_start > 0 and esw.min_left_ext_anchor >= span:
                        continue
                    if ext.read_end < length - 1 and esw.min_right_ext_anchor >= span:
                        continue

                    tag = i
                    extended.append(ext)
                else:
                    failed_extended.append(ext)

            # Possibly merge two contigs that already overlap each other
            # (SeqSet.hpp:3732-3793).
            if (
                len(extended) == 1
                and extended[0].read_start <= self.radius
                and extended[0].read_end >= length - self.radius
            ):
                jtag = -1
                for i in range(overlap_cnt):
                    if i == tag:
                        continue
                    sw = self.seqs[overlaps[i].seq_idx]
                    if sw.is_ref:
                        continue
                    ok, ext = self.extend_overlap(
                        r, length, sw, mismatch_factor, overlaps[i]
                    )
                    if ok == 1:
                        jtag = i
                        extended.append(ext)
                if len(extended) > 2:
                    extended = extended[:1]
                elif len(extended) == 2:
                    span1 = extended[1].read_end - extended[1].read_start + 1
                    if (
                        extended[1].read_start > 0
                        and old_min_ext_anchor[jtag][0] >= span1
                    ):
                        extended = extended[:1]
                    elif (
                        extended[1].read_end < length - 1
                        and old_min_ext_anchor[jtag][1] >= span1
                    ):
                        extended = extended[:1]
                    if len(extended) == 2:
                        if (
                            extended[0].seq_end
                            == self.seqs[extended[0].seq_idx].consensus_len - 1
                            and extended[1].seq_start == 0
                        ):
                            sort_extended = False
                        elif (
                            extended[0].seq_start == 0
                            and extended[1].seq_end
                            == self.seqs[extended[1].seq_idx].consensus_len - 1
                        ):
                            sort_extended = False
                            extended[0], extended[1] = extended[1], extended[0]
                        else:
                            extended = extended[:1]

            if similarity_threshold > self.novel_seq_similarity:
                extended = [
                    e for e in extended if e.similarity >= similarity_threshold
                ]

            if len(extended) == 0 and good_extended is not None:
                extended = [good_extended]

            if len(extended) > 1:
                # If all the merge candidates look bad, keep only the best.
                if all(e.similarity < 0.95 for e in extended):
                    extended = [min(extended, key=lambda e: e.sort_key())]

            if len(extended) > 1:
                ids = [e.seq_idx for e in extended]
                if len(set(ids)) != len(ids):
                    extended = []

            if len(extended) > 1:
                merged = self._merge_contigs_with_read(
                    r, length, extended, sort_extended, barcode
                )
                if merged is None:
                    return -1, strand
                seq_idx, read_in_consensus_offset = merged
                add_new = False
            elif len(extended) == 1:
                seq_idx, read_in_consensus_offset = self._extend_contig_with_read(
                    r, length, extended[0], overlaps, barcode, min_kmer_count
                )
                add_new = False

            if not add_new:
                ret = self._accumulate_into_contig(
                    r, length, seq_idx, read_in_consensus_offset, barcode,
                    overlaps[0].strand,
                )

        # Novel contig creation anchored on a reference overlap
        # (SeqSet.hpp:4370-4458).
        if add_new:
            anchor_seq_idx = -1
            for o in overlaps:
                if self.seqs[o.seq_idx].is_ref:
                    anchor_seq_idx = o.seq_idx
                    break
            if anchor_seq_idx == -1:
                add_new = False

        if add_new:
            idx = len(self.seqs)
            name = self.seqs[anchor_seq_idx].name
            # Reference quirk (SeqSet.hpp:4426): the strand test indexes the
            # overlap list with the *seq* index; out-of-range reads hit heap
            # garbage that in practice never equals -1, so no RC happens.
            consensus = read
            if anchor_seq_idx < len(overlaps) and overlaps[anchor_seq_idx].strand == -1:
                consensus = revcomp(read)
            ns = SeqWrapper(name=name, consensus=consensus, is_ref=False)
            ns.barcode = barcode
            ns.num_read = 1
            ns.pos_weight = new_pos_weight_from_seq(consensus)
            self.seqs.append(ns)
            self.seq_index.build_from_read(
                consensus, self.kmer_length, idx, barcode
            )
            self.set_prev_add_info(
                idx, 0, length - 1, 0, length - 1, overlaps[0].strand
            )
            ret = idx

        if ret == -1:
            self.set_prev_add_info(-2, -1, -1, -1, -1, 0)
            ret = -2

        if ret >= 0 and strand == 0:
            strand = overlaps[0].strand
        return ret, strand

    # -- AddRead helpers ------------------------------------------------

    def _merge_contigs_with_read(
        self,
        r: str,
        length: int,
        extended: List[Overlap],
        sort_extended: bool,
        barcode: int,
    ) -> Optional[Tuple[int, int]]:
        """Merge >=2 contigs bridged by one read (SeqSet.hpp:3878-4130)."""
        from trust4_tpu.engine.seqset import is_name_compatible

        if sort_extended:
            extended.sort(key=lambda e: e.read_start)

        n = len(extended)
        for i in range(n):
            for j in range(i + 1, n):
                if not is_name_compatible(
                    self.seqs[extended[i].seq_idx].name,
                    self.seqs[extended[j].seq_idx].name,
                ):
                    return None

        # Locations of each donor seq inside the merged consensus.
        seq_offset = [0] * n
        if extended[0].read_start > 0:
            for i in range(n):
                seq_offset[i] = extended[i].read_start
        else:
            seq_offset[0] = 0
            for i in range(1, n):
                seq_offset[i] = (
                    seq_offset[i - 1]
                    + self.seqs[extended[i - 1].seq_idx].consensus_len
                    - 1
                    + (extended[i].read_start - extended[i - 1].read_end)
                )

        # Consensus splice: read first, then donors from last to first so
        # the earliest overlap's bases win (SeqSet.hpp:3945-3955).
        total = sum(self.seqs[e.seq_idx].consensus_len for e in extended) + length
        buf = bytearray(b"\x00" * total)
        read_at = 0 if extended[0].read_start > 0 else extended[0].seq_start
        buf[read_at : read_at + length] = r.encode("ascii")
        for i in range(n - 1, -1, -1):
            cons = self.seqs[extended[i].seq_idx].consensus.encode("ascii")
            buf[seq_offset[i] : seq_offset[i] + len(cons)] = cons

        last_end_idx = n - 1
        k = 0
        for i in range(n):
            end = seq_offset[i] + self.seqs[extended[i].seq_idx].consensus_len
            if end > k:
                k = end
                last_end_idx = i
        if extended[last_end_idx].read_end < length:
            new_len = k + (length - extended[last_end_idx].read_end - 1)
        else:
            new_len = k
        new_consensus = buf[:new_len].decode("ascii")

        # posWeight arena: reuse the smallest seq idx (SeqSet.hpp:3979-4007).
        new_seq_idx = min(e.seq_idx for e in extended)
        k_at = next(i for i, e in enumerate(extended) if e.seq_idx == new_seq_idx)
        host = self.seqs[new_seq_idx]
        old_len = host.consensus_len
        w = np.zeros((new_len, 4), dtype=np.int32)
        w[seq_offset[k_at] : seq_offset[k_at] + old_len] = host.pos_weight[:old_len]
        for i, e in enumerate(extended):
            if e.seq_idx == new_seq_idx:
                continue
            donor = self.seqs[e.seq_idx]
            host.num_read += donor.num_read
            dl = donor.consensus_len
            w[seq_offset[i] : seq_offset[i] + dl] += donor.pos_weight[:dl]
        host.pos_weight = w

        for e in extended:
            sw = self.seqs[e.seq_idx]
            self.seq_index.remove_from_read(
                sw.consensus, self.kmer_length, e.seq_idx, barcode, 0
            )

        # Merge names with '+' (SeqSet.hpp:4064-4096).
        name_idx = next(
            (i for i, e in enumerate(extended)
             if self.seqs[e.seq_idx].name != "Novel"),
            0,
        )
        parts = [self.seqs[extended[name_idx].seq_idx].name]
        for i, e in enumerate(extended):
            if i == name_idx:
                continue
            if i > 0 and (
                self.seqs[e.seq_idx].name
                != self.seqs[extended[i - 1].seq_idx].name
            ):
                parts.append(self.seqs[e.seq_idx].name)
        host.name = "+".join(parts)

        for e in extended:
            if e.seq_idx != new_seq_idx:
                self.release_seq(e.seq_idx)

        host.consensus = new_consensus
        self.update_consensus(new_seq_idx, False)
        self.seq_index.build_from_read(
            host.consensus, self.kmer_length, new_seq_idx, barcode
        )
        # Reference reads the donor wrappers *after* release; released
        # wrappers keep their anchor ints (SeqSet.hpp:4118-4120).
        host.min_left_ext_anchor = self.seqs[extended[0].seq_idx].min_left_ext_anchor
        host.min_right_ext_anchor = self.seqs[
            extended[last_end_idx].seq_idx
        ].min_right_ext_anchor

        offset = extended[0].seq_start if extended[0].seq_start > 0 else 0
        return new_seq_idx, offset

    def _extend_contig_with_read(
        self,
        r: str,
        length: int,
        ext: Overlap,
        overlaps: List[Overlap],
        barcode: int,
        min_kmer_count: int,
    ) -> Tuple[int, int]:
        """Extend one contig with a read overhang (SeqSet.hpp:4131-4316)."""
        seq_idx = ext.seq_idx
        sw = self.seqs[seq_idx]
        sw.num_read += 1
        kl = self.kmer_length

        if ext.read_start > 0 or ext.read_end < length - 1:
            consensus_replacement: List[Tuple[int, str]] = []
            old_len = sw.consensus_len
            new_consensus = (
                r[: ext.read_start]
                + sw.consensus
                + r[ext.read_end + 1 :]
            )
            new_len = len(new_consensus)
            shift = ext.read_start

            if shift > 0:
                self.seq_index.build_from_read(
                    new_consensus[: ext.read_start + kl - 1],
                    kl, seq_idx, barcode,
                )
                self.seq_index.update_from_read(
                    sw.consensus, kl, barcode, shift, seq_idx, seq_idx
                )
            if ext.read_end < length - 1:
                start = ext.read_start + ext.seq_end - kl + 2
                self.seq_index.build_from_read(
                    new_consensus[start:], kl, seq_idx, barcode, start
                )

            w = np.zeros((new_len, 4), dtype=np.int32)
            w[shift : shift + old_len] = sw.pos_weight[:old_len]
            sw.pos_weight = w
            if shift > 0:
                # Demote boundary weights of the original prefix
                # (SeqSet.hpp:4192-4213).
                if barcode == -1 or min_kmer_count > 1:
                    for i in range(2):
                        p = i + shift
                        if p >= length or r[p] == "N":
                            continue
                        cbase = new_consensus[p]
                        if (
                            r[p] != cbase
                            and cbase != "N"
                            and w[p, nuc_num(cbase)] == 1
                        ):
                            consensus_replacement.append((p, r[p]))
                        for j in range(4):
                            if r[p] != NUM_TO_NUC[j] and w[p, j] > 1:
                                w[p, j] -= 1
                w[:shift] = 0

            if ext.read_end < length - 1:
                start = ext.read_start + old_len
                w[start : start + (length - ext.read_end - 1)] = 0
                if barcode == -1 or min_kmer_count > 1:
                    for i in range(old_len - 2, old_len):
                        pos = i - ext.seq_start
                        seq_pos = i + shift
                        if pos < 0 or r[pos] == "N":
                            continue
                        cbase = new_consensus[seq_pos]
                        if (
                            r[pos] != cbase
                            and cbase != "N"
                            and w[seq_pos, nuc_num(cbase)] == 1
                        ):
                            consensus_replacement.append((seq_pos, r[pos]))
                        for j in range(4):
                            if r[pos] != NUM_TO_NUC[j] and w[seq_pos, j] > 1:
                                w[seq_pos, j] -= 1

            if shift > 0:
                sw.min_left_ext_anchor = 0
            if ext.read_end < length - 1:
                sw.min_right_ext_anchor = 0

            # Attach the best reference gene name (SeqSet.hpp:4256-4296).
            ref_idx = -1
            for i, o in enumerate(overlaps):
                if not self.seqs[o.seq_idx].is_ref:
                    continue
                if ref_idx == -1 or (
                    o.read_end - o.read_start
                    > overlaps[ref_idx].read_end - overlaps[ref_idx].read_start
                ):
                    ref_idx = i
                if self.seqs[o.seq_idx].name in sw.name:
                    ref_idx = i
                    break
            if ref_idx != -1:
                ref_idx = overlaps[ref_idx].seq_idx
                if self.seqs[ref_idx].name not in sw.name:
                    if ext.read_start > 0:
                        sw.name = self.seqs[ref_idx].name + "+" + sw.name
                    else:
                        sw.name = sw.name + "+" + self.seqs[ref_idx].name

            offset = ext.seq_start if ext.seq_start > 0 else 0
            sw.consensus = new_consensus
            for p, c in consensus_replacement:
                self.substitute_consensus_pos(seq_idx, p, c, True)
            return seq_idx, offset

        return seq_idx, ext.seq_start

    def _accumulate_into_contig(
        self,
        r: str,
        length: int,
        seq_idx: int,
        offset: int,
        barcode: int,
        strand: int,
    ) -> int:
        """Add read counts + N repair (SeqSet.hpp:4320-4363)."""
        sw = self.seqs[seq_idx]
        kl = self.kmer_length
        accumulate_read(sw.pos_weight, offset, r)
        n_pos = [
            i
            for i in range(length)
            if r[i] != "N" and sw.consensus[i + offset] == "N"
        ]
        self.set_prev_add_info(
            seq_idx, 0, length - 1, offset, offset + length - 1, strand
        )
        i = 0
        size = len(n_pos)
        chars = None
        while i < size:
            j = i + 1
            while j < size and n_pos[j] <= n_pos[j - 1] + kl - 1:
                j += 1
            if chars is None:
                chars = list(sw.consensus)
            for l in range(i, j):
                chars[n_pos[l] + offset] = r[n_pos[l]]
            sw.consensus = "".join(chars)
            start = max(0, n_pos[i] - kl + 1 + offset)
            end = min(sw.consensus_len - 1, n_pos[j - 1] + kl - 1 + offset)
            self.seq_index.build_from_read(
                sw.consensus[start : end + 1], kl, seq_idx, barcode, start
            )
            i = j
        return seq_idx

    # ------------------------------------------------------------------
    # Barcode memory lifecycle (SeqSet.hpp:2484-2554, 10815-10937)
    # ------------------------------------------------------------------

    @staticmethod
    def decompress_pos_weight(consensus: str, flat: np.ndarray) -> np.ndarray:
        """Expand the run-length compressed posWeight (SeqSet.hpp:2484-2509).
        ``flat`` is the packed quarter-slot int array."""
        length = len(consensus)
        orig = np.zeros((length, 4), dtype=np.int32)
        k = 0
        vals = flat.reshape(-1)
        for j in range(length):
            v = int(vals[k]) if k < len(vals) else 0
            if v < 0:
                orig[j, nuc_num(consensus[j])] = -v
                k += 1
            else:
                for i in range(4):
                    orig[j, i] = int(vals[k]) if k < len(vals) else 0
                    k += 1
        return orig

    def is_contig_shallow(self, i: int, min_cov: int) -> bool:
        """SeqSet.hpp:2512-2554."""
        sw = self.seqs[i]
        if sw is None or sw.is_ref or sw.consensus is None:
            return False
        length = sw.consensus_len
        if sw.pos_weight is None or sw.pos_weight.size == 0:
            return sw.num_read < min_cov
        if sw.pos_weight_compressed:
            w = self.decompress_pos_weight(sw.consensus, sw.pos_weight)
        else:
            w = sw.pos_weight
        sums = w.sum(axis=1)
        j = 0
        while j < length and sums[j] < min_cov:
            j += 1
        start = j
        j = length - 1
        while j >= start and sums[j] < min_cov:
            j -= 1
        end = j
        for j in range(start, end + 1):
            if sums[j] < min_cov:
                return True
        if end < start:
            return True
        return False

    def release_shallow_contigs(self, min_cov: int) -> None:
        for i in range(len(self.seqs)):
            if self.seqs[i] is not None and self.is_contig_shallow(i, min_cov):
                self.release_seq(i)

    def release_finished_barcode_seq(
        self, barcodes, remove_from_index: bool, contig_min_cov: int,
        early_stop: bool,
    ) -> None:
        """Compress/release seqs of finished barcodes (SeqSet.hpp:10815-10924)."""
        if self.native_master:
            for bc in barcodes:
                self.seq_index.native.s_release_finished_barcode(
                    bc, remove_from_index, contig_min_cov, early_stop
                )
            return
        for i in range(len(self.seqs) - 1, -1, -1):
            sw = self.seqs[i]
            if sw is None or sw.consensus is None:
                continue
            if early_stop and (
                not sw.index
                or sw.pos_weight is None
                or sw.pos_weight.size == 0
            ):
                break
            if sw.barcode not in barcodes:
                if early_stop:
                    break
                continue
            if contig_min_cov > 0 and self.is_contig_shallow(i, contig_min_cov):
                self.seq_index.remove_from_read(
                    sw.consensus, self.kmer_length, i, sw.barcode, 0
                )
                self.release_seq(i)
                continue
            if remove_from_index:
                sw.index = False
                self.seq_index.remove_from_read(
                    sw.consensus, self.kmer_length, i, sw.barcode, 0
                )
            self.update_consensus(i, False)
            w = sw.pos_weight
            cons = sw.consensus
            length = sw.consensus_len
            # Even-coverage test, vectorized (same verdict as the scalar
            # scan: consensus column == cov everywhere, all other columns
            # zero; a non-ACGTN base demands an all-zero row).
            codes = seq_to_codes(cons).astype(np.int64)
            valid = codes >= 0
            sel = np.where(valid, codes, 0)
            at = w[np.arange(length), sel].astype(np.int64)
            row_sum = w.sum(axis=1, dtype=np.int64)
            others = row_sum - np.where(valid, at, 0)
            cov = int(at[0]) if length > 0 and valid[0] else 0
            broke = np.where(
                valid,
                (at == 0) | (others != 0) | (at != cov),
                row_sum != 0,
            )
            # empty consensus: the scalar loop never runs -> even
            even = not bool(broke.any())
            if not even:
                # Run-length quarter-slot compression
                # (SeqSet.hpp:10883-10915): rows with exactly one positive
                # count collapse to -count; others emit all four ints.
                single = (w > 0).sum(axis=1) == 1
                lens = np.where(single, 1, 4)
                offs = np.concatenate(
                    [[0], np.cumsum(lens)]
                ).astype(np.int64)
                total = int(offs[-1])
                pad = (-total) % 4
                res = np.zeros(total + pad, dtype=np.int32)
                if single.any():
                    res[offs[:-1][single]] = -w.max(axis=1)[single]
                quad = np.nonzero(~single)[0]
                if len(quad):
                    idx = offs[:-1][quad][:, None] + np.arange(4)
                    res[idx] = w[quad]
                sw.pos_weight = res
            else:
                sw.num_read = cov
                sw.pos_weight = np.zeros((0,), dtype=np.int32)
            sw.pos_weight_compressed = True

    # ------------------------------------------------------------------
    # Replay / assignment (SeqSet.hpp:4477-4738)
    # ------------------------------------------------------------------

    def repeat_add_read(self, read: str) -> int:
        if self.native_master:
            return self.seq_index.native.s_repeat_add_read(read)
        info = self.prev_add_info
        if info is None or info.seq_idx < 0:
            return info.seq_idx if info else -1
        r = revcomp(read) if info.strand == -1 else read
        sw = self.seqs[info.seq_idx]
        # Reference: posWeight[i + seqStart] += r[i] for i in [readStart,
        # readEnd] (SeqSet.hpp:4495-4500).
        accumulate_read(
            sw.pos_weight,
            info.read_start + info.seq_start,
            r[info.read_start : info.read_end + 1],
        )
        sw.num_read += 1
        return info.seq_idx

    def add_assigned_read(self, read: str, assign: Overlap) -> None:
        if assign.seq_idx == -1:
            return
        r = revcomp(read) if assign.strand == -1 else read
        sw = self.seqs[assign.seq_idx]
        accumulate_read(sw.pos_weight, assign.seq_start, r)
        sw.num_read += 1

    def assign_read(self, read: str, strand: int, barcode: int) -> Optional[Overlap]:
        """Find the contig a read belongs to (SeqSet.hpp:4632-4701)."""
        import os as _os

        if _os.environ.get("TRUST4_TPU_SCORED", "1") != "0":
            nat = self._native_sync()
            if nat is not None and len(read) >= self.kmer_length:
                rc, row, sim = nat.assign_read(
                    read, strand, barcode, *self._sconf()
                )
                if rc >= 0:
                    got = None
                    if rc == 1:
                        got = Overlap(
                            seq_idx=int(row[0]), read_start=int(row[1]),
                            read_end=int(row[2]), strand=int(row[3]),
                            seq_start=int(row[4]), seq_end=int(row[5]),
                            match_cnt=int(row[6]), indel_cnt=int(row[7]),
                            similarity=sim,
                        )
                    if _os.environ.get(
                        "TRUST4_TPU_SCORED_CHECK", "0"
                    ) == "1":
                        want = self._assign_read_host(read, strand, barcode)
                        gk = None if got is None else (
                            got.seq_idx, got.read_start, got.read_end,
                            got.strand, got.seq_start, got.seq_end,
                            got.match_cnt, got.similarity,
                        )
                        wk = None if want is None else (
                            want.seq_idx, want.read_start, want.read_end,
                            want.strand, want.seq_start, want.seq_end,
                            want.match_cnt, want.similarity,
                        )
                        assert gk == wk, f"assign mismatch {gk} vs {wk}"
                    return got
                # rc == -3: a hit seq lacks posWeight -> host fallback
        return self._assign_read_host(read, strand, barcode)

    def _assign_read_host(
        self, read: str, strand: int, barcode: int
    ) -> Optional[Overlap]:
        overlaps: List[Overlap] = []
        overlap_cnt = self._gofr_host(
            read, strand, barcode, 0, False, overlaps
        )
        if overlap_cnt <= 0 or len(self.seqs) == 0:
            return None
        if not self.seqs[0].is_ref:
            overlaps.sort(key=lambda o: o.sort_key())
        else:
            overlaps.sort(key=sort_overlap_on_ref_key)

        length = len(read)
        rc = revcomp(read)
        r = read if overlaps[0].strand == 1 else rc
        factor = 1.0 if barcode == -1 else 2.0
        for o in overlaps:
            ok, ext = self.extend_overlap(
                r, length, self.seqs[o.seq_idx], factor, o
            )
            if ok == 1 and ext.read_start == 0 and ext.read_end == length - 1:
                return ext
        return None

    def recompute_pos_weight(self, reads) -> None:
        """Zero and re-accumulate posWeight from assigned reads
        (SeqSet.hpp:4705-4738). ``reads`` is a list of (read, Overlap|None)."""
        for sw in self.seqs:
            if sw is not None and sw.pos_weight is not None:
                sw.pos_weight[:] = 0
        for read, ov in reads:
            if ov is None or ov.seq_idx == -1:
                continue
            r = read if ov.strand == 1 else revcomp(read)
            accumulate_read(self.seqs[ov.seq_idx].pos_weight, ov.seq_start, r)
        for sw in self.seqs:
            if sw is None or sw.pos_weight is None:
                continue
            # Floor of 1 for untouched consensus bases.
            codes = seq_to_codes(sw.consensus)
            untouched = sw.pos_weight.sum(axis=1) == 0
            mask = untouched & (
                np.frombuffer(sw.consensus.encode("ascii"), dtype=np.uint8)
                != ord("N")
            )
            idx = np.nonzero(mask)[0]
            sw.pos_weight[idx, codes[idx].astype(np.int64)] = 1
