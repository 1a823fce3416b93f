"""The annotator stage: contigs -> gene calls, CDR3s, read realignment, EM.

Re-implements the reference annotator binary (reference: Annotator.cpp) on
top of the SeqSet engine: IMGT realignment of every contig (detail 2),
global-abundance tie-breaking, read realignment with per-contig CDR3-variant
EM, and the _annot.fa/_cdr3.out writers.
"""

from __future__ import annotations
from dataclasses import replace as _dc_replace

import sys
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from trust4_tpu.align import host as align_host
from trust4_tpu.align import native as align_native
from trust4_tpu.dna import revcomp, nuc_num
from trust4_tpu.engine.seqset import SeqSet, get_gene_type
from trust4_tpu.engine.scaffold import AssignedRead
from trust4_tpu.engine.types import Overlap
from trust4_tpu.utils.cxxsort import cxx_sort


@dataclass
class Annotation:
    """reference: Annotator.cpp:69-81, struct _annotate."""

    gene_overlap: List[Overlap] = field(
        default_factory=lambda: [Overlap() for _ in range(4)]
    )
    cdr: List[Overlap] = field(
        default_factory=lambda: [Overlap() for _ in range(3)]
    )
    secondary: List[Overlap] = field(default_factory=list)
    is_full_length: int = 0


def log(msg: str) -> None:
    print(msg, file=sys.stderr)


def get_align_stats(align, update, stats=(0, 0, 0)):
    m, mm, ind = stats if update else (0, 0, 0)
    for a in align:
        if a == 0:
            m += 1
        elif a == 1:
            mm += 1
        else:
            ind += 1
    return m, mm, ind


def is_same_fragment(id1: str, id2: str, s1: str, s2: str) -> bool:
    """Annotator.cpp:168-185: same id, or merged-pair '.1' twin."""
    if id1 == id2:
        return True
    l1, l2 = len(id1), len(id2)
    if (l1 == l2 - 2 and id2.endswith(".1")) or (
        l2 == l1 - 2 and id1.endswith(".1")
    ):
        if s1 == s2:
            return True
    return False


def is_cdr3_compatible(r: AssignedRead, cdr3_seq: str, cdr3_coord: Overlap) -> bool:
    """Annotator.cpp:142-166."""
    o = r.overlap
    if o.seq_start <= cdr3_coord.read_start:
        r_offset = o.read_start + cdr3_coord.read_start - o.seq_start
        c_offset = 0
    else:
        r_offset = o.read_start
        c_offset = o.seq_start - cdr3_coord.read_start
    i = 0
    read = r.read
    while i + r_offset < len(read) and i + c_offset < len(cdr3_seq):
        if read[i + r_offset] != cdr3_seq[i + c_offset]:
            return False
        i += 1
    return True


def abundance_estimation(compat: List[List[int]], counts: List[float]) -> None:
    """Per-contig EM over CDR3 variants (Annotator.cpp:188-255).  ``counts``
    is updated in place."""
    end_d = 1e-6
    c_cnt = len(counts)
    r_cnt = len(compat)
    abundance = [0.0] * c_cnt
    for row in compat:
        if len(row) == 1:
            abundance[row[0]] += 1
    sum_ = sum(abundance)
    if sum_ == 0 and c_cnt > 0:
        counts[0] = r_cnt
        for i in range(1, c_cnt):
            counts[i] = 0
        return
    for i in range(c_cnt):
        abundance[i] /= sum_
    for _ in range(1000):
        d = 0.0
        for i in range(c_cnt):
            counts[i] = 0
        for row in compat:
            sum_ = sum(abundance[c] for c in row)
            if sum_ == 0:
                continue
            for c in row:
                counts[c] += abundance[c] / sum_
        sum_ = sum(counts)
        for i in range(c_cnt):
            tmp = abundance[i]
            abundance[i] = counts[i] / sum_
            diff = abs(tmp - abundance[i])
            if diff > d:
                d = diff
        if d < end_d:
            return


class Annotator:
    def __init__(
        self,
        imgt_fa: str,
        output_prefix: str = "trust",
        imgt_additional_gap: Optional[str] = None,
        is_imgt: bool = True,
        include_partial: bool = True,
        impute: bool = True,
        need_rc: bool = False,
        has_barcode: bool = False,
        has_umi: bool = False,
        threads: int = 1,
    ):
        self.ref_set = SeqSet(7)
        if not need_rc:
            # HasHitInSet (host path) is only queried in --needReverseComplement
            # mode; otherwise all ref queries go through the native engine.
            self.ref_set.set_native_only_index()
        self.ref_set.input_ref_fa(imgt_fa, is_imgt, imgt_additional_gap)
        self.ref_set.set_hit_len_required(17)
        self.ref_set.set_radius(10)
        self.seq_set = SeqSet(17)
        self.seq_set.set_native_only_index()
        self.output_prefix = output_prefix
        self.include_partial = include_partial
        self.impute = impute
        self.need_rc = need_rc
        self.has_barcode = has_barcode
        self.has_umi = has_umi
        self.barcode_str_to_int: Dict[str, int] = {}
        self.threads = threads
        self.annotations: List[Annotation] = []
        # sid -> consensus AT INDEX-BUILD TIME for seqs rewritten since
        # (impute / masked-leak); realign resyncs exactly these instead
        # of rebuilding the whole contig index (see realign_and_write_cdr3).
        self._changed_consensus: Dict[int, str] = {}

    # -- input ---------------------------------------------------------

    def load_assembly(self, final_out_path: str) -> None:
        """Parse trust4 _final.out (consensus + 4xL posWeight rows,
        Annotator.cpp:573-619).  The whole file parses in one native call
        (t4_parse_final_out); the line loop remains as fallback."""
        with open(final_out_path, "rb") as bfp:
            data = bfp.read()
        parsed = align_native.parse_final_out(data)
        if parsed is not None:
            rec_meta, row_cnt, counts = parsed
            meta_l = rec_meta.tolist()
            cnt_l = row_cnt.tolist()
            ci = 0
            for r in range(len(meta_l)):
                h_off, h_len, s_off, s_len = meta_l[r]
                header = data[h_off : h_off + h_len].decode("ascii")
                name = header.split(" ")[0]
                seq = data[s_off : s_off + s_len].decode("ascii")
                w = np.zeros((s_len, 4), dtype=np.int32)
                for k in range(4):
                    m = cnt_l[r][k]
                    w[:m, k] = counts[ci : ci + m]
                    ci += m
                self.seq_set.input_novel_seq(name, seq, w, defer_index=True)
        else:
            lines = data.decode("ascii").splitlines()
            i = 0
            while i < len(lines):
                header = lines[i]
                if not header.startswith(">"):
                    i += 1
                    continue
                name = header[1:].split(" ")[0]
                seq = lines[i + 1]
                w = np.zeros((len(seq), 4), dtype=np.int32)
                for k in range(4):
                    row = align_native.parse_i32(lines[i + 2 + k])
                    if row is None:
                        srow = lines[i + 2 + k].split()
                        row = np.array(
                            [int(x) for x in srow], dtype=np.int32
                        )
                    w[: len(row), k] = row
                self.seq_set.input_novel_seq(name, seq, w, defer_index=True)
                i += 6
        # One batched index build for all loaded contigs, in its FINAL
        # key space: barcodes + barcode hashing are applied first, so
        # this sid-ordered build is already the exact index the realign
        # stage queries (the reference's annotator Clean()-rebuild state)
        # and realign only resyncs impute-rewritten seqs.
        if self.has_barcode:
            self._set_barcode_from_seq_name()
            self.seq_set.set_consider_barcode_in_index_hash(True)
        ss = self.seq_set
        nat = ss.seq_index.native
        if ss.seq_index.native_only and nat is not None:
            from trust4_tpu.utils.parallel import internal_threads

            nat.build_batch(
                [sw.consensus for sw in ss.seqs], ss.kmer_length,
                list(range(len(ss.seqs))),
                [sw.barcode for sw in ss.seqs],
                threads=internal_threads(self.threads),
            )
        else:
            for sid, sw in enumerate(ss.seqs):
                ss.seq_index.build_from_read(
                    sw.consensus, ss.kmer_length, sid, sw.barcode
                )

    def _set_barcode_from_seq_name(self) -> None:
        """Recover barcodes from '{barcode}_{idx}' seq names
        (SeqSet.hpp:11087-11113, Annotator.cpp:631-636)."""
        for sw in self.seq_set.seqs:
            name = sw.name
            j = name.rfind("_")
            key = name[:j] if j >= 0 else name
            barcode = self.barcode_str_to_int.setdefault(
                key, len(self.barcode_str_to_int)
            )
            sw.barcode = barcode

    def load_fasta(self, path: str) -> None:
        from trust4_tpu.io.fastx import read_fastx

        for rec in read_fastx(path):
            self.seq_set.input_novel_read(rec.id, rec.seq, 1, -1)

    # -- annotation ----------------------------------------------------

    def _annotate_one(self, i: int) -> Annotation:
        """Per-contig annotation step (independent across contigs, so the
        block-parallel split reproduces the serial results exactly;
        Annotator.cpp:369-397 AnnotateReads_Thread)."""
        seq_set, ref_set = self.seq_set, self.ref_set
        ann = Annotation()
        if self.need_rc:
            strand = ref_set.has_hit_in_set(seq_set.seqs[i].consensus, 1)
            if strand == -1:
                self._reverse_complement_in_seq_set(i)
        _, ann.gene_overlap, ann.cdr = ref_set.annotate_read(
            seq_set.seqs[i].consensus, 2, ann.secondary
        )
        if self.impute:
            new_consensus = ref_set.impute_cdr3(
                seq_set.seqs[i].consensus,
                ann.gene_overlap,
                ann.cdr,
                ann.secondary,
            )
            if new_consensus is not None:
                self._set_seq_consensus(i, new_consensus)
            elif getattr(ref_set, "_impute_masked_leak", None) is not None:
                # Reference quirk: a failed anchor imputation can leave the
                # consensus buffer M-masked in place (SeqSet.hpp:5510 with
                # the 5564/5646 early returns skipping the restore).
                self._changed_consensus.setdefault(
                    i, seq_set.seqs[i].consensus
                )
                seq_set.seqs[i].consensus = ref_set._impute_masked_leak
                seq_set.seqs[i].consensus_bytes_cache = None
                seq_set.seqs[i].ptr_cache = None
        return ann

    def annotate_all(self) -> None:
        """Annotator.cpp:640-696."""
        import os as _os

        seq_set = self.seq_set
        seq_cnt = seq_set.size()
        # Phase 1: precompute every contig-piece's scored overlap query in
        # one threaded native batch (the annotator's hot scan,
        # Annotator.cpp:640-688).  Phase 2 (the per-contig decision logic)
        # runs natively too (native/annotate2.inc, threaded), with the
        # serial host loop as oracle/fallback (TRUST4_TPU_ANN2=0 forces it,
        # TRUST4_TPU_ANN2_CHECK=1 runs both and asserts field equality).
        # Fork-based parallelism is unsafe here (jax/axon background
        # threads; fork inherits held locks), so parallelism lives in C++.
        import time as _time

        _sub = _os.environ.get("TRUST4_TPU_STAGE_TIMES", "0") == "1"
        _t0 = _time.perf_counter()
        precomputed = self._precompute_contig_queries()
        if _sub:
            print(f"[stage-time]     ann/precompute: "
                  f"{_time.perf_counter() - _t0:.3f}s", file=sys.stderr)
            _t0 = _time.perf_counter()
        try:
            ann2_on = _os.environ.get("TRUST4_TPU_ANN2", "1") != "0"
            check = _os.environ.get("TRUST4_TPU_ANN2_CHECK", "0") == "1"
            self.annotations = None
            if precomputed is not None and ann2_on:
                job_index, flat = precomputed
                self.annotations = self._annotate_all_native(
                    job_index, flat, check
                )
            if self.annotations is None:
                self.annotations = [
                    self._annotate_one(i) for i in range(seq_cnt)
                ]
        finally:
            self.ref_set._scored_cache = None
        if _sub:
            print(f"[stage-time]     ann/decide: "
                  f"{_time.perf_counter() - _t0:.3f}s", file=sys.stderr)

        self._annotation_tie_break()
        for i in range(seq_cnt):
            self.annotations[i].is_full_length = self._is_complete_vdj(i)

    def _annotate_all_native(self, job_index, flat, check: bool):
        """Run the per-contig detail-2 decision logic in the native engine
        (native/annotate2.inc; reference Annotator.cpp:369-397
        AnnotateReads_Thread + SeqSet.hpp:6016-8500).  Returns the
        Annotation list, or None to fall back to the host loop."""
        from trust4_tpu.utils.parallel import internal_threads

        ref_set = self.ref_set
        nat = ref_set._native_sync()
        if nat is None or flat is None:
            return None
        contigs = [
            self.seq_set.seqs[i].consensus for i in range(self.seq_set.size())
        ]
        piece_jobs = []
        piece_off = [0]
        cached_iv = getattr(self, "_piece_intervals", None)
        use_cache = cached_iv is not None and len(cached_iv) == len(contigs)
        for ci, cons in enumerate(contigs):
            iv = (
                cached_iv[ci] if use_cache
                else ref_set.get_contig_intervals(cons)
            )
            for (a, b) in iv:
                piece_jobs.append(job_index[(cons[a : b + 1], 0, -1, 1, False)])
            piece_off.append(len(piece_jobs))
        (ret, gene_i32, gene_f64, cdr_i32, cdr_f64, sec_i32, sec_f64,
         sec_rng) = nat.annotate2_batch(
            contigs, piece_jobs, piece_off, flat,
            internal_threads(self.threads), ref_set.gap_n, ref_set.radius,
            ref_set.hit_len_required, ref_set.is_long_seq_set,
            ref_set.nomatch_gap_limit, ref_set.novel_seq_similarity,
            ref_set.ref_seq_similarity, ref_set.repeat_similarity,
        )

        def row_to_overlap(r9, sim) -> Overlap:
            return Overlap(
                seq_idx=int(r9[0]), read_start=int(r9[1]),
                read_end=int(r9[2]), strand=int(r9[3]),
                seq_start=int(r9[4]), seq_end=int(r9[5]),
                match_cnt=int(r9[6]), indel_cnt=int(r9[7]),
                similarity=float(sim), info_from_hits=int(r9[8]),
            )

        annotations = []
        for i in range(len(contigs)):
            if ret[i] == -9:  # piece-mapping mismatch: host path per contig
                annotations.append(self._annotate_one(i))
                continue
            ann = Annotation()
            ann.gene_overlap = [
                row_to_overlap(gene_i32[i, g], gene_f64[i, g])
                for g in range(4)
            ]
            ann.cdr = [
                row_to_overlap(cdr_i32[i, c], cdr_f64[i, c]) for c in range(3)
            ]
            a, c = int(sec_rng[2 * i]), int(sec_rng[2 * i + 1])
            ann.secondary = [
                row_to_overlap(sec_i32[a + t], sec_f64[a + t])
                for t in range(c)
            ]
            if check:
                # Compare against the host path BEFORE imputation (the
                # native result is pre-impute; impute runs below for both).
                ref = Annotation()
                _, ref.gene_overlap, ref.cdr = self.ref_set.annotate_read(
                    self.seq_set.seqs[i].consensus, 2, ref.secondary
                )
                want = [
                    (o.seq_idx, o.read_start, o.read_end, o.strand,
                     o.seq_start, o.seq_end, o.match_cnt, o.indel_cnt,
                     o.similarity)
                    for o in ref.gene_overlap + ref.cdr + ref.secondary
                ]
                got = [
                    (o.seq_idx, o.read_start, o.read_end, o.strand,
                     o.seq_start, o.seq_end, o.match_cnt, o.indel_cnt,
                     o.similarity)
                    for o in ann.gene_overlap + ann.cdr + ann.secondary
                ]
                assert got == want, (
                    f"annotate2 mismatch on contig {i}: "
                    f"host={want} native={got}"
                )
            if self.impute:
                new_consensus = self.ref_set.impute_cdr3(
                    self.seq_set.seqs[i].consensus,
                    ann.gene_overlap,
                    ann.cdr,
                    ann.secondary,
                )
                if new_consensus is not None:
                    self._set_seq_consensus(i, new_consensus)
                elif getattr(self.ref_set, "_impute_masked_leak", None) is not None:
                    # Reference quirk: see _annotate_one.
                    self._changed_consensus.setdefault(
                        i, self.seq_set.seqs[i].consensus
                    )
                    self.seq_set.seqs[i].consensus = (
                        self.ref_set._impute_masked_leak
                    )
                    self.seq_set.seqs[i].consensus_bytes_cache = None
                    self.seq_set.seqs[i].ptr_cache = None
            annotations.append(ann)
        return annotations

    def _precompute_contig_queries(self):
        """Batch all per-contig-piece scored queries (detail>=1 uses
        read_type 1, strand 0, barcode -1; engine/annotate.py:222) through
        the threaded native engine and stash them in ref_set._scored_cache.
        Returns the {job_key: job_index} map (for the native detail-2
        batch), or None when the batch could not run."""
        import os as _os

        if self.need_rc:
            return None  # consensus may flip before annotation; per-contig
        if _os.environ.get("TRUST4_TPU_SCORED", "1") == "0":
            return None
        if _os.environ.get("TRUST4_TPU_SCORED_CHECK", "0") == "1":
            return None
        ref_set = self.ref_set
        nat = ref_set._native_sync()
        if nat is None:
            return None
        from trust4_tpu.utils.parallel import internal_threads

        jobs = []
        seen = set()
        # The N-split intervals are reused verbatim by the detail-2 batch
        # (same consensus strings — impute rewrites happen later), so
        # compute them once here.
        self._piece_intervals = []
        for i in range(self.seq_set.size()):
            cons = self.seq_set.seqs[i].consensus
            iv = ref_set.get_contig_intervals(cons)
            self._piece_intervals.append(iv)
            for (a, b) in iv:
                sub = cons[a : b + 1]
                key = (sub, 0, -1, 1, False)
                if key not in seen:
                    seen.add(key)
                    jobs.append(key)
        if not jobs:
            return None
        conf = (
            internal_threads(self.threads), ref_set.radius,
            ref_set.hit_len_required, ref_set.is_long_seq_set,
            ref_set.nomatch_gap_limit, ref_set.novel_seq_similarity,
            ref_set.ref_seq_similarity, ref_set.repeat_similarity,
        )
        results = None
        # Mesh-sharded path (TRUST4_TPU_GAP_MESH=<n>): the phase-1 gap
        # batch shards over a jax Mesh's dp axis, per-shard DP counts
        # psum-merge, and phase 2 consumes them through the same oracle
        # interface — byte-identical _cdr3.out for every mesh shape
        # (parallel/gap_mesh.py; SURVEY.md §2.8).
        mesh_n = int(_os.environ.get("TRUST4_TPU_GAP_MESH", "0") or 0)
        if mesh_n > 0:
            # NOTE: unlike the gap_oracle branch below, the mesh path runs
            # jax IN-PROCESS with no watchdog — a wedged device tunnel can
            # stall it.  It is an opt-in env knob aimed at CPU-mesh /
            # multi-chip runs; errors (missing backend, too few devices)
            # fall back to the CPU DP like the device branch does.
            try:
                from trust4_tpu.parallel.gap_mesh import (
                    gap_counts_via_mesh,
                    make_mesh,
                )

                gap_jobs = nat.batch_collect_gaps(jobs, *conf)
                counts = gap_counts_via_mesh(
                    make_mesh(mesh_n), nat, jobs, gap_jobs, ref_set.seqs,
                    n_threads=conf[0],
                )
                if counts is not None:
                    results = nat.query_scored_batch_oracle(
                        jobs, gap_jobs, counts, *conf
                    )
                    log(f"Annotation gap DP ran on a {mesh_n}-device mesh "
                        f"({len(gap_jobs)} gap fills).")
            except Exception as e:  # mesh unavailable -> CPU fallback
                log(f"Mesh gap-DP pass unavailable ({e}); using CPU DP.")
                results = None
        # Device path (default when a TPU backend is attached): batched
        # Pallas launches through the watchdogged device child score every
        # gap-fill DP of the whole annotation batch and the traceback-bits
        # walker supplies bit-identical counts to the engine
        # (ops/gap_oracle.py).
        from trust4_tpu.ops import gap_oracle

        if (results is None and gap_oracle.collect_profitable()
                and gap_oracle.active()):
            try:
                gap_jobs = nat.batch_collect_gaps(jobs, *conf)
                counts = gap_oracle.gap_counts_on_device(
                    nat, jobs, gap_jobs, ref_set.seqs, n_threads=conf[0]
                )
                if counts is not None:
                    results = nat.query_scored_batch_oracle(
                        jobs, gap_jobs, counts, *conf
                    )
                    log("Annotation gap DP ran on the TPU "
                        f"({len(gap_jobs)} gap fills).")
            except Exception as e:  # device flake -> CPU fallback
                log(f"TPU gap-oracle pass unavailable ({e}); using CPU DP.")
                results = None
        if results is None:
            results = nat.query_scored_batch(jobs, *conf)
        ref_set._scored_cache = dict(zip(jobs, results))
        # The flat arrays of this exact batch back the native detail-2 pass.
        return {key: i for i, key in enumerate(jobs)}, nat._last_flat

    def _reverse_complement_in_seq_set(self, idx: int) -> None:
        sw = self.seq_set.seqs[idx]
        sw.consensus = revcomp(sw.consensus)
        from trust4_tpu.engine.assemble import new_pos_weight_from_seq

        sw.pos_weight = new_pos_weight_from_seq(sw.consensus)

    def _set_seq_consensus(self, idx: int, nc: str) -> None:
        from trust4_tpu.engine.assemble import new_pos_weight_from_seq

        sw = self.seq_set.seqs[idx]
        self._changed_consensus.setdefault(idx, sw.consensus)
        sw.consensus = nc
        sw.pos_weight = new_pos_weight_from_seq(nc)

    def _annotation_tie_break(self) -> None:
        """Annotator.cpp:257-307."""
        seq_set, ref_set = self.seq_set, self.ref_set
        abundance = [0.0] * len(ref_set.seqs)
        for i, ann in enumerate(self.annotations):
            sw = seq_set.seqs[i]
            avg = int(sw.pos_weight.sum()) / sw.consensus_len
            for k in range(4):
                if ann.gene_overlap[k].seq_idx != -1:
                    abundance[ann.gene_overlap[k].seq_idx] += avg
        for ann in self.annotations:
            for k in range(4):
                g = ann.gene_overlap[k]
                if g.seq_idx == -1:
                    continue
                for j, o in enumerate(ann.secondary):
                    if get_gene_type(ref_set.seqs[o.seq_idx].name) != k:
                        continue
                    if (
                        o.read_end - o.read_start == g.read_end - g.read_start
                        and o.similarity == g.similarity
                        and abundance[o.seq_idx] > abundance[g.seq_idx]
                    ):
                        ann.gene_overlap[k], ann.secondary[j] = (
                            ann.secondary[j],
                            ann.gene_overlap[k],
                        )
                        g = ann.gene_overlap[k]

    def _is_complete_vdj(self, i: int) -> int:
        """Annotator.cpp:342-366 (IsCompleteVDJ)."""
        seq = self.seq_set.seqs[i].consensus
        ann = self.annotations[i]
        go = ann.gene_overlap
        cdr = ann.cdr
        if go[0].seq_idx == -1 or go[2].seq_idx == -1:
            return 0
        if cdr[2].seq_idx == -1:
            return 0
        if go[0].read_end > go[2].read_start + 3:
            return 0
        if go[0].seq_start > 0 or go[0].read_end < cdr[2].read_start:
            return 0
        if (
            go[2].read_start > cdr[2].read_end
            or go[2].seq_end
            < self.ref_set.seqs[go[2].seq_idx].consensus_len - 1
        ):
            return 0
        for j in range(go[0].read_start, go[2].read_end + 1):
            if seq[j] == "N":
                return 0
        return 1

    # -- CDR3 germline similarity (SeqSet.hpp:8503-8594) ---------------

    def get_cdr3_similarity(self, seq: str, go, cdr) -> float:
        ref_set = self.ref_set
        if cdr[2].similarity <= 0:
            return 0
        if go[0].seq_idx == -1 or go[2].seq_idx == -1:
            return 0
        seq_idx = go[0].seq_idx
        has_d = 0
        if go[0].read_end < cdr[2].read_start or go[0].read_start > cdr[2].read_start:
            return 0
        if go[2].read_start > cdr[2].read_end or go[2].read_end < cdr[2].read_end:
            return 0
        if ref_set.seqs[seq_idx].name[2] in "HBD":
            if go[1].seq_idx == -1:
                return 0
            has_d = 1

        match_cnt = mismatch_cnt = indel_cnt = 0
        total_len = 0
        broke = False
        for i in range(3):
            if has_d == 0 and i == 1:
                continue
            gene = go[i]
            if i == 0:
                read_start = cdr[2].read_start
                read_end = gene.read_end
                info = ref_set.seqs[gene.seq_idx].info[2][0]
                seq_start = (
                    info if info != -1 else gene.seq_end - (read_end - read_start)
                )
                seq_end = gene.seq_end
            elif i == 1:
                read_start, read_end = gene.read_start, gene.read_end
                seq_start, seq_end = gene.seq_start, gene.seq_end
            else:
                read_start = gene.read_start
                read_end = cdr[2].read_end
                seq_start = gene.seq_start
                info = ref_set.seqs[gene.seq_idx].info[2][0]
                seq_end = (
                    info
                    if info != -1
                    else gene.seq_start + (read_end - read_start)
                )
            if read_end - read_start < 0 or seq_end - seq_start < 0:
                match_cnt = 0
                broke = True
                break
            if read_start < cdr[2].read_start or read_end > cdr[2].read_end:
                continue
            cons = ref_set.seqs[gene.seq_idx].consensus
            _, align = align_host.global_alignment(
                cons[seq_start : seq_end + 1],
                seq[
                    read_start - cdr[2].read_start : read_end
                    - cdr[2].read_start
                    + 1
                ],
            )
            match_cnt, mismatch_cnt, indel_cnt = get_align_stats(
                align, True, (match_cnt, mismatch_cnt, indel_cnt)
            )
            total_len += seq_end - seq_start + 1
        if total_len == 0:
            return 0
        return match_cnt / total_len

    def get_equal_secondary(self, primary: Overlap, gene_type: int, secondary):
        """SeqSet.hpp:8596-8619."""
        if primary.seq_idx == -1:
            return []
        out = []
        for i, o in enumerate(secondary):
            if get_gene_type(self.ref_set.seqs[o.seq_idx].name) != gene_type:
                continue
            if (
                primary.similarity == o.similarity
                and primary.read_end - primary.read_start
                == o.read_end - o.read_start
            ):
                out.append(i)
        return out

    # -- annot.fa writer (SeqSet.hpp:8622-8736) ------------------------

    def write_annotation_fasta(self, fp) -> None:
        seq_set, ref_set = self.seq_set, self.ref_set
        for i, ann in enumerate(self.annotations):
            sw = seq_set.seqs[i]
            weight_sum = int(sw.pos_weight.sum())
            parts = [
                f">{sw.name} {sw.consensus_len} {weight_sum / 500.0:.2f}"
            ]
            for k in range(4):
                g = ann.gene_overlap[k]
                if g.seq_idx != -1:
                    field = (
                        f" {ref_set.seqs[g.seq_idx].name}"
                        f"({ref_set.seqs[g.seq_idx].consensus_len}):"
                        f"({g.read_start}-{g.read_end}):"
                        f"({g.seq_start}-{g.seq_end}):{g.similarity * 100:.2f}"
                    )
                    for o in ann.secondary:
                        if (
                            get_gene_type(ref_set.seqs[o.seq_idx].name)
                            != k
                        ):
                            continue
                        field += (
                            f",{ref_set.seqs[o.seq_idx].name}"
                            f"({ref_set.seqs[o.seq_idx].consensus_len}):"
                            f"({o.read_start}-{o.read_end}):"
                            f"({o.seq_start}-{o.seq_end}):"
                            f"{o.similarity * 100:.2f}"
                        )
                    parts.append(field)
                else:
                    parts.append(" *")
            for k in range(3):
                c = ann.cdr[k]
                if c.seq_idx != -1:
                    cdr_seq = sw.consensus[c.read_start : c.read_end + 1]
                    parts.append(
                        f" CDR{k + 1}({c.read_start}-{c.read_end}):"
                        f"{c.similarity * 100:.2f}={cdr_seq}"
                    )
                else:
                    parts.append(f" CDR{k + 1}(0-0):0.00=null")
            fp.write("".join(parts) + "\n" + sw.consensus + "\n")

    # -- AIRR alignment (SeqSet.hpp:8740-8865, 8999-9033) --------------

    def _gene_overlap_alignment(self, read: str, gene: Overlap):
        if gene.seq_idx == -1:
            return None
        cons = self.ref_set.seqs[gene.seq_idx].consensus
        _, align = align_host.global_alignment(
            cons[gene.seq_start : gene.seq_end + 1],
            read[gene.read_start : gene.read_end + 1],
        )
        return align

    def _airr_cigar(self, read: str, gene: Overlap, align) -> str:
        if align is None or gene.seq_idx == -1:
            return ""
        parts = []
        length = len(read)
        if gene.read_start > 0:
            parts.append(f"{gene.read_start}S")
        if gene.seq_start > 0:
            parts.append(f"{gene.seq_start}N")
        i = 0
        n = len(align)
        while i < n:
            j = i + 1
            while j < n and (
                align[i] == align[j]
                or (align[i] in (0, 1) and align[j] in (0, 1))
            ):
                j += 1
            op = "M"
            if align[i] == 2:  # EDIT_INSERT: op on reference -> query D
                op = "D"
            elif align[i] == 3:  # EDIT_DELETE -> query I
                op = "I"
            parts.append(f"{j - i}{op}")
            i = j
        if gene.read_end < length - 1:
            parts.append(f"{length - 1 - gene.read_end}S")
        cons_len = self.ref_set.seqs[gene.seq_idx].consensus_len
        if gene.seq_end < cons_len - 1:
            parts.append(f"{cons_len - 1 - gene.seq_end}N")
        return "".join(parts)

    def annotation_to_airr_align(
        self, read: str, go, cdr, include_cdr3_coordinate: bool
    ) -> str:
        aligns = [self._gene_overlap_alignment(read, go[i]) for i in range(4)]
        out = []
        for i in range(4):
            out.append(self._airr_cigar(read, go[i], aligns[i]) + "\t")
        buffer2 = []
        buffer3 = []
        cdr3_adjusted_start = -1
        cdr3_adjusted_end = -1
        prev_read_end = -1
        for k in range(3):
            g = go[k]
            if g.seq_idx == -1:
                continue
            if prev_read_end != -1:
                for j in range(prev_read_end + 1, g.read_start):
                    buffer2.append(read[j])
                    buffer3.append(read[j])
                    if cdr[2].seq_idx != -1 and cdr[2].read_start == j:
                        cdr3_adjusted_start = len(buffer2) - 1
                    if cdr[2].seq_idx != -1 and cdr[2].read_end == j:
                        cdr3_adjusted_end = len(buffer2) - 1
            j = g.read_start
            jstart = g.read_start
            jend = g.read_end + 1
            if prev_read_end >= g.read_end:
                continue
            if prev_read_end >= jstart:
                jstart = prev_read_end + 1
            if k == 1:
                for next_k in range(k + 1, 3):
                    if (
                        go[next_k].seq_idx != -1
                        and go[next_k].read_start < jend
                    ):
                        jend = go[next_k].read_start
            if jend - 1 > prev_read_end:
                prev_read_end = jend - 1
            else:
                continue
            seq = self.ref_set.seqs[g.seq_idx].consensus
            m = g.seq_start
            for a in aligns[k]:
                if j >= jend:
                    break
                if a != 3:  # not EDIT_DELETE
                    if j < jstart:
                        j += 1
                        continue
                    buffer2.append(read[j])
                    if cdr[2].seq_idx != -1 and cdr[2].read_start == j:
                        cdr3_adjusted_start = len(buffer2) - 1
                    if cdr[2].seq_idx != -1 and cdr[2].read_end == j:
                        cdr3_adjusted_end = len(buffer2) - 1
                    if a == 2:  # EDIT_INSERT
                        buffer3.append("-")
                    else:
                        buffer3.append(seq[m])
                        m += 1
                    j += 1
                else:
                    if j < jstart:
                        continue
                    buffer2.append("-")
                    buffer3.append(seq[m])
                    m += 1
        s2 = "".join(buffer2)
        s3 = "".join(buffer3)
        if include_cdr3_coordinate:
            out.append(
                f"{s2}\t{s3}\t{cdr3_adjusted_start}\t{cdr3_adjusted_end}"
            )
        else:
            out.append(f"{s2}\t{s3}")
        return "".join(out)

    AIRR_PART_HEADER = (
        "sequence\trev_comp\tv_call\td_call\tj_call\tc_call\tv_cigar\t"
        "d_cigar\tj_cigar\tc_cigar\tsequence_alignment\tgermline_alignment\t"
        "cdr1\tcdr2\tjunction\tjunction_aa\tproductive\tv_identity\tj_identity"
    )

    def annotation_to_airr_string(self, read: str, go, cdr) -> str:
        """19-column AIRR fields for one contig (SeqSet.hpp:8877-8981)."""
        from trust4_tpu.dna import dna_to_aa

        parts = [read]
        gidx = 0
        while gidx < 4 and go[gidx].seq_idx == -1:
            gidx += 1
        if gidx >= 4 and cdr[2].seq_idx == -1:
            return "\t".join([read] + [""] * 18)
        parts.append("T" if go[gidx].strand == -1 else "F")
        for i in range(4):
            parts.append(
                "" if go[i].seq_idx == -1 else self.ref_set.seqs[go[i].seq_idx].name
            )
        # v/d/j/c cigars + sequence/germline alignment (no CDR3 coords).
        align_str = self.annotation_to_airr_align(read, go, cdr, False)
        parts.append(align_str)
        for i in range(2):
            parts.append(
                ""
                if cdr[i].seq_idx == -1
                else read[cdr[i].read_start : cdr[i].read_end + 1]
            )
        if cdr[2].seq_idx == -1:
            parts.extend(["", "", ""])
        else:
            cdr3 = read[cdr[2].read_start : cdr[2].read_end + 1]
            parts.append(cdr3)
            if len(cdr3) % 3 != 0:
                parts.extend(["out_of_frame", "F"])
            else:
                aa = []
                productive = "T"
                for i in range(cdr[2].read_start, cdr[2].read_end + 1, 3):
                    a = dna_to_aa(read[i], read[i + 1], read[i + 2])
                    if not ("A" <= a <= "Z"):
                        productive = "F"
                    aa.append(a)
                parts.extend(["".join(aa), productive])
        for i in (0, 2):
            parts.append(
                ""
                if go[i].seq_idx == -1
                else f"{go[i].similarity * 100:.2f}"
            )
        return "\t".join(parts)

    def write_airr_annotation(self, fp) -> None:
        """--outputFormat 1 (Annotator.cpp:699-723)."""
        fp.write(f"sequence_id\t{self.AIRR_PART_HEADER}\tcomplete_vdj\n")
        for i, ann in enumerate(self.annotations):
            airr = self.annotation_to_airr_string(
                self.seq_set.seqs[i].consensus, ann.gene_overlap, ann.cdr
            )
            fl = "T" if ann.is_full_length else "F"
            fp.write(f"{self.seq_set.seqs[i].name}\t{airr}\t{fl}\n")

    def write_airr_align(self, out_path: str) -> None:
        """Annotator.cpp:725-741."""
        with open(out_path, "w") as fp:
            for i, ann in enumerate(self.annotations):
                if ann.cdr[2].seq_idx != -1:
                    s = self.annotation_to_airr_align(
                        self.seq_set.seqs[i].consensus,
                        ann.gene_overlap,
                        ann.cdr,
                        True,
                    )
                    fp.write(f"{self.seq_set.seqs[i].name}\t{s}\n")

    # -- read realignment + EM + cdr3.out (Annotator.cpp:744-1139) -----

    def _assign_reads_batch(self, assembled_reads, fail):
        """AssignRead for every assembled read (AssignReads_Thread,
        Annotator.cpp:399-419) through the threaded native engine, falling
        back to the serial host loop (consecutive dedup is a pure cache,
        so both produce the serial results)."""
        import os as _os

        seq_set = self.seq_set
        nat = None
        if _os.environ.get("TRUST4_TPU_SCORED", "1") != "0" and _os.environ.get(
            "TRUST4_TPU_SCORED_CHECK", "0"
        ) != "1":
            nat = seq_set._native_sync()
        if nat is not None and assembled_reads:
            from trust4_tpu.utils.parallel import internal_threads

            found, rows, sims = nat.assign_batch(
                [r.read for r in assembled_reads],
                [r.overlap.strand for r in assembled_reads],
                [r.barcode for r in assembled_reads],
                internal_threads(self.threads),
                *seq_set._sconf(),
            )
            if not (found == -3).any():
                out = []
                for i in range(len(assembled_reads)):
                    if found[i] == 1:
                        r8 = rows[i]
                        out.append(
                            Overlap(
                                seq_idx=int(r8[0]), read_start=int(r8[1]),
                                read_end=int(r8[2]), strand=int(r8[3]),
                                seq_start=int(r8[4]), seq_end=int(r8[5]),
                                match_cnt=int(r8[6]), indel_cnt=int(r8[7]),
                                similarity=float(sims[i]),
                            )
                        )
                    else:
                        out.append(fail)
                return out
        out = []
        assign = fail
        for i, r in enumerate(assembled_reads):
            if (
                i == 0
                or r.barcode != assembled_reads[i - 1].barcode
                or r.read != assembled_reads[i - 1].read
            ):
                a = seq_set.assign_read(r.read, r.overlap.strand, r.barcode)
                assign = a if a is not None else fail
            out.append(assign)
        return out

    def _realign_collect_fast(self, assembled_reads_fa, read_assignment_path,
                              cdr3_infos, stamp):
        """Array realign path: native .fa parse (t4_parse_assembled_fa),
        native assign over (offset, length) record views
        (t4o_assign_batch_ol), and vectorized CDR3-window masks; Python
        objects are built only for the EM subset.  Produces exactly the
        serial path's cdr3_reads/cdr3_infos (same per-read decisions, same
        order).  Returns the cdr3_reads list, or None for the object
        fallback (native unavailable / a read needs host assign)."""
        import os as _os

        seq_set = self.seq_set
        if _os.environ.get("TRUST4_TPU_SCORED", "1") == "0" or _os.environ.get(
            "TRUST4_TPU_SCORED_CHECK", "0"
        ) == "1":
            return None
        nat = seq_set._native_sync()
        if nat is None:
            return None
        with open(assembled_reads_fa, "rb") as fp:
            data = fp.read()
        parsed = align_native.parse_assembled_fa(data)
        if parsed is None:
            return None
        rec, ivals = parsed
        n = len(rec)
        stamp("parse_fa")
        if n == 0:
            return []

        # Barcode resolution (reads whose barcode produced no contig are
        # dropped; Annotator.cpp:770-786).  Reads arrive barcode-grouped,
        # so a last-token cache makes this near-free.
        bo = rec[:, 4]
        if bool((bo >= 0).any()):
            b2i = {
                k.encode("ascii"): v
                for k, v in self.barcode_str_to_int.items()
            }
            bo_l = bo.tolist()
            bl_l = rec[:, 5].tolist()
            bc_ids = np.full(n, -1, dtype=np.int32)
            keep = np.ones(n, dtype=bool)
            last_tok = None
            last_val = -2
            for i in range(n):
                o = bo_l[i]
                if o < 0:
                    continue
                tok = data[o : o + bl_l[i]]
                if tok != last_tok:
                    last_tok = tok
                    last_val = b2i.get(tok, -2)
                if last_val == -2:
                    keep[i] = False
                else:
                    bc_ids[i] = last_val
            kept = np.nonzero(keep)[0]
        else:
            bc_ids = np.full(n, -1, dtype=np.int32)
            kept = np.arange(n)

        lens_k = rec[kept, 3]
        if int((lens_k >= 200).sum()) > len(kept) / 2:
            seq_set.set_is_long_seq_set(True)

        from trust4_tpu.utils.parallel import internal_threads

        found, rows, sims = nat.assign_batch_ol(
            data, rec[kept, 2], lens_k, ivals[kept, 0], bc_ids[kept],
            internal_threads(self.threads), *seq_set._sconf(),
        )
        if bool((found == -3).any()):
            return None  # host-assign case: object fallback
        stamp("assign")

        if read_assignment_path:
            # --readAssignment dump (Annotator.cpp:856-866).
            with open(read_assignment_path, "w") as fp:
                for j in np.nonzero(found == 1)[0].tolist():
                    gi = int(kept[j])
                    rid = data[
                        rec[gi, 0] : rec[gi, 0] + rec[gi, 1]
                    ].decode("ascii")
                    fp.write(
                        f"{rid}\t"
                        f"{seq_set.seqs[int(rows[j, 0])].name}\n"
                    )

        annotations = self.annotations
        seq_cnt = seq_set.size()
        cs = np.full(seq_cnt, 0, dtype=np.int64)
        ce = np.full(seq_cnt, 0, dtype=np.int64)
        has = np.zeros(seq_cnt, dtype=bool)
        for i, ann in enumerate(annotations):
            c = ann.cdr[2]
            if c.seq_idx != -1:
                has[i] = True
                cs[i] = c.read_start
                ce[i] = c.read_end
        ok = found == 1
        sidx = np.where(ok, rows[:, 0], 0)
        sstart = rows[:, 4].astype(np.int64)
        send = rows[:, 5].astype(np.int64)
        valid = ok & has[sidx]
        m_cdr3 = valid & (send > cs[sidx] + 3) & (sstart < ce[sidx] - 3)

        cdr3_reads: List[AssignedRead] = []
        rows_l = rows.tolist()
        sims_l = sims.tolist()
        for j in np.nonzero(m_cdr3)[0].tolist():
            gi = int(kept[j])
            rid = data[rec[gi, 0] : rec[gi, 0] + rec[gi, 1]].decode("ascii")
            read = data[rec[gi, 2] : rec[gi, 2] + rec[gi, 3]].decode("ascii")
            r8 = rows_l[j]
            ov = Overlap(
                seq_idx=r8[0], read_start=r8[1], read_end=r8[2],
                strand=r8[3], seq_start=r8[4], seq_end=r8[5],
                match_cnt=r8[6], indel_cnt=r8[7], similarity=sims_l[j],
            )
            nr = AssignedRead(
                id=rid, read=read, umi=int(ivals[gi, 1]), overlap=ov,
            )
            if ov.strand == -1:
                nr.read = revcomp(read)
                nr.overlap.strand = 1
            cdr3_reads.append(nr)

        if not self.has_barcode:
            m_var = valid & (sstart <= cs[sidx]) & (send >= ce[sidx])
            for j in np.nonzero(m_var)[0].tolist():
                gi = int(kept[j])
                r8 = rows_l[j]
                si = r8[0]
                cdr3_len = int(ce[si] - cs[si] + 1)
                seq = data[
                    rec[gi, 2] : rec[gi, 2] + rec[gi, 3]
                ].decode("ascii")
                offset = r8[1] + int(cs[si]) - r8[4]
                if r8[3] == 1:
                    var = seq[offset : offset + cdr3_len]
                elif r8[3] == -1:
                    start = (len(seq) - 1 - offset) - cdr3_len + 1
                    var = revcomp(seq[start : start + cdr3_len])
                else:
                    continue
                info = cdr3_infos[si]
                for entry in info:
                    if entry[0] == var:
                        entry[1] += 1
                        break
                else:
                    info.append([var, 1.0])
        stamp("collect")
        return cdr3_reads

    def realign_and_write_cdr3(
        self, assembled_reads_fa: str, out_path: str,
        read_assignment_path: Optional[str] = None,
    ) -> None:
        import os as _os
        import time as _time

        _sub = _os.environ.get("TRUST4_TPU_STAGE_TIMES", "0") == "1"
        _t0 = [_time.perf_counter()]

        def _stamp(what: str) -> None:
            now = _time.perf_counter()
            if _sub:
                log(f"[stage-time]     realign/{what}: {now - _t0[0]:.3f}s")
            _t0[0] = now

        seq_set = self.seq_set
        annotations = self.annotations
        seq_cnt = seq_set.size()
        cdr3_infos: List[List[List]] = [[] for _ in range(seq_cnt)]  # [seq, count]

        log("Start to realign reads for CDR3 analysis.")
        nat = seq_set.seq_index.native
        if (
            not self.need_rc
            and seq_set.seq_index.native_only
            and nat is not None
        ):
            # The load-time index is already in the final key space and
            # (sid, w)-sorted per posting list; resyncing the few
            # impute-rewritten seqs with ordered inserts reproduces the
            # full Clean() rebuild bit-for-bit (t4o_resync_seq) without
            # tearing down and re-inserting the whole contig index.
            for sid in sorted(self._changed_consensus):
                sw = seq_set.seqs[sid]
                nat.resync_seq(
                    self._changed_consensus[sid], sw.consensus,
                    seq_set.kmer_length, sid, sw.barcode,
                )
                seq_set._nat_dirty.add(sid)
            self._changed_consensus.clear()
            seq_set.set_prev_add_info(-1, -1, -1, -1, -1, 0)
        else:
            seq_set.clean(False)
        _stamp("clean")

        cdr3_reads = self._realign_collect_fast(
            assembled_reads_fa, read_assignment_path, cdr3_infos, _stamp
        )
        if cdr3_reads is None:  # object fallback (no native / host assign)

            assembled_reads: List[AssignedRead] = []
            with open(assembled_reads_fa) as fp:
                lines = fp.read().splitlines()
            for i in range(0, len(lines) - 1, 2):
                header = lines[i]
                toks = header.split(" ")
                strand = int(toks[1])
                nr = AssignedRead(id=toks[0][1:], read=lines[i + 1])
                umi = -1
                barcode = -1
                for t in toks:
                    if t.startswith("umi:"):
                        umi = int(t[4:])
                    if t.startswith("barcode:"):
                        # Skip reads whose barcode produced no contig
                        # (Annotator.cpp:770-786).
                        key = t[8:]
                        if key not in self.barcode_str_to_int:
                            barcode = None
                            break
                        barcode = self.barcode_str_to_int[key]
                if barcode is None:
                    continue
                nr.umi = umi
                nr.barcode = barcode
                nr.overlap = Overlap()
                nr.overlap.seq_idx = -1
                nr.overlap.strand = strand
                assembled_reads.append(nr)
            _stamp("parse_fa")

            long_cnt = sum(1 for r in assembled_reads if len(r.read) >= 200)
            if long_cnt > len(assembled_reads) / 2:
                seq_set.set_is_long_seq_set(True)

            fail = Overlap()
            fail.seq_idx = -1
            assigned = self._assign_reads_batch(assembled_reads, fail)
            for r, a in zip(assembled_reads, assigned):
                r.overlap = a
            _stamp("assign")

            del fail
            if read_assignment_path:
                # --readAssignment dump (Annotator.cpp:856-866).
                with open(read_assignment_path, "w") as fp:
                    for r in assembled_reads:
                        if r.overlap.seq_idx == -1:
                            continue
                        fp.write(
                            f"{r.id}\t{seq_set.seqs[r.overlap.seq_idx].name}\n"
                        )

            cdr3_reads: List[AssignedRead] = []
            for r in assembled_reads:
                assign = r.overlap
                if assign.seq_idx == -1:
                    continue
                ann = annotations[assign.seq_idx]
                cdr3 = ann.cdr[2]
                cdr3_len = cdr3.read_end - cdr3.read_start + 1
                if (
                    cdr3.seq_idx != -1
                    and assign.seq_end > cdr3.read_start + 3
                    and assign.seq_start < cdr3.read_end - 3
                ):
                    nr = AssignedRead(
                        id=r.id, read=r.read, umi=r.umi,
                        overlap=_dc_replace(assign),
                    )
                    if assign.strand == -1:
                        nr.read = revcomp(r.read)
                        nr.overlap.strand = 1
                    cdr3_reads.append(nr)
                if (
                    not self.has_barcode
                    and cdr3.seq_idx != -1
                    and assign.seq_start <= cdr3.read_start
                    and assign.seq_end >= cdr3.read_end
                ):
                    seq = r.read
                    offset = assign.read_start + cdr3.read_start - assign.seq_start
                    if assign.strand == 1:
                        var = seq[offset : offset + cdr3_len]
                    elif assign.strand == -1:
                        start = (len(seq) - 1 - offset) - cdr3_len + 1
                        var = revcomp(seq[start : start + cdr3_len])
                    else:
                        continue
                    info = cdr3_infos[assign.seq_idx]
                    for entry in info:
                        if entry[0] == var:
                            entry[1] += 1
                            break
                    else:
                        info.append([var, 1.0])

            _stamp("collect")
        log("Compute CDR3 abundance.")
        for i in range(seq_cnt):
            cdr3 = annotations[i].cdr[2]
            if cdr3.seq_idx == -1:
                continue
            if not cdr3_infos[i]:
                cons = seq_set.seqs[i].consensus
                cdr3_infos[i].append(
                    [cons[cdr3.read_start : cdr3.read_end + 1], 1.0]
                )

        cxx_sort(
            cdr3_reads,
            lambda a, b: (
                a.overlap.seq_idx < b.overlap.seq_idx
                if a.overlap.seq_idx != b.overlap.seq_idx
                else a.id < b.id
            ),
        )
        n = len(cdr3_reads)
        i = 0
        while i < n:
            j = i + 1
            while j < n and cdr3_reads[j].overlap.seq_idx == cdr3_reads[i].overlap.seq_idx:
                j += 1
            info = cdr3_infos[cdr3_reads[i].overlap.seq_idx]
            size = len(info)
            umi_used = set()
            if size == 1:
                cnt = 0
                k = i
                while k < j:
                    if k < j - 1 and is_same_fragment(
                        cdr3_reads[k].id,
                        cdr3_reads[k + 1].id,
                        cdr3_reads[k].read,
                        cdr3_reads[k + 1].read,
                    ):
                        k += 1
                    if cdr3_reads[k].umi != -1:
                        if cdr3_reads[k].umi in umi_used:
                            k += 1
                            continue
                        umi_used.add(cdr3_reads[k].umi)
                    cnt += 1
                    k += 1
                info[0][1] = cnt
                i = j
                continue
            cdr3_coord = annotations[cdr3_reads[i].overlap.seq_idx].cdr[2]
            compat: List[List[int]] = []
            k = i
            while k < j:
                nc: List[int] = []
                if cdr3_reads[k].umi != -1:
                    if cdr3_reads[k].umi in umi_used:
                        k += 1
                        continue
                    umi_used.add(cdr3_reads[k].umi)
                if k < j - 1 and is_same_fragment(
                    cdr3_reads[k].id,
                    cdr3_reads[k + 1].id,
                    cdr3_reads[k].read,
                    cdr3_reads[k + 1].read,
                ):
                    for l in range(size):
                        if is_cdr3_compatible(
                            cdr3_reads[k], info[l][0], cdr3_coord
                        ) and is_cdr3_compatible(
                            cdr3_reads[k + 1], info[l][0], cdr3_coord
                        ):
                            nc.append(l)
                    k += 1
                else:
                    for l in range(size):
                        if is_cdr3_compatible(
                            cdr3_reads[k], info[l][0], cdr3_coord
                        ):
                            nc.append(l)
                compat.append(nc)
                k += 1
            counts = [entry[1] for entry in info]
            abundance_estimation(compat, counts)
            for l, entry in enumerate(info):
                entry[1] = counts[l]
            i = j
        _stamp("em")

        self._write_cdr3_out(out_path, cdr3_infos)
        _stamp("write")

    def _write_cdr3_out(self, out_path: str, cdr3_infos) -> None:
        seq_set, ref_set = self.seq_set, self.ref_set
        with open(out_path, "w") as fp:
            for i, ann in enumerate(self.annotations):
                if ann.cdr[2].seq_idx == -1:
                    continue
                if not self.include_partial and ann.cdr[2].similarity == 0:
                    continue
                effective_j = 0
                for seq_var, count in cdr3_infos[i]:
                    if count == 0:
                        continue
                    fp.write(f"{seq_set.seqs[i].name}\t{effective_j}\t")
                    effective_j += 1
                    for k in range(4):
                        g = ann.gene_overlap[k]
                        if g.seq_idx == -1:
                            fp.write("*\t")
                        else:
                            names = [ref_set.seqs[g.seq_idx].name]
                            for l in self.get_equal_secondary(
                                g, k, ann.secondary
                            ):
                                names.append(
                                    ref_set.seqs[
                                        ann.secondary[l].seq_idx
                                    ].name
                                )
                            fp.write(",".join(names) + "\t")
                    for k in range(2):
                        c = ann.cdr[k]
                        if c.seq_idx == -1:
                            fp.write("*\t")
                        else:
                            fp.write(
                                seq_set.seqs[i].consensus[
                                    c.read_start : c.read_end + 1
                                ]
                                + "\t"
                            )
                    sim = self.get_cdr3_similarity(
                        seq_var, ann.gene_overlap, ann.cdr
                    )
                    fp.write(
                        f"{seq_var}\t{ann.cdr[2].similarity:.2f}\t"
                        f"{count:.2f}\t{sim * 100.0:.2f}\t"
                        f"{ann.is_full_length}\n"
                    )

    def write_cdr3_from_consensus(self, out_path: str) -> None:
        """--outputCDR3File variant (Annotator.cpp:1141-1204)."""
        seq_set, ref_set = self.seq_set, self.ref_set
        with open(out_path, "w") as fp:
            for i, ann in enumerate(self.annotations):
                if ann.cdr[2].seq_idx == -1:
                    continue
                if not self.include_partial and ann.cdr[2].similarity == 0:
                    continue
                fp.write(f"{seq_set.seqs[i].name}\t0\t")
                for k in range(4):
                    g = ann.gene_overlap[k]
                    if g.seq_idx == -1:
                        fp.write("*\t")
                    else:
                        names = [ref_set.seqs[g.seq_idx].name]
                        for l in self.get_equal_secondary(g, k, ann.secondary):
                            names.append(
                                ref_set.seqs[ann.secondary[l].seq_idx].name
                            )
                        fp.write(",".join(names) + "\t")
                cons = seq_set.seqs[i].consensus
                for k in range(3):
                    c = ann.cdr[k]
                    if c.seq_idx == -1:
                        fp.write("*\t")
                    else:
                        fp.write(cons[c.read_start : c.read_end + 1] + "\t")
                    if k == 2:
                        sw = seq_set.seqs[i]
                        cov = 0
                        for p in range(c.read_start, c.read_end + 1):
                            cov += int(
                                sw.pos_weight[p, nuc_num(cons[p])]
                            )
                        avg_cov = cov / (c.read_end - c.read_start + 1)
                        cdr3_seq = cons[c.read_start : c.read_end + 1]
                        sim = self.get_cdr3_similarity(
                            cdr3_seq, ann.gene_overlap, ann.cdr
                        )
                        fp.write(
                            f"{ann.cdr[2].similarity:.2f}\t{avg_cov:.2f}\t"
                            f"{sim * 100.0:.2f}\t{ann.is_full_length}\n"
                        )
