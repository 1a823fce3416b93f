"""Shared engine data types (reference: SeqSet.hpp:19-136)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class SeqWrapper:
    """One reference allele or novel contig (reference: _seqWrapper)."""

    name: str
    consensus: str
    is_ref: bool = False
    pos_weight: Optional[np.ndarray] = None  # (L, 4) int32
    min_left_ext_anchor: int = 0
    min_right_ext_anchor: int = 0
    # info[0..2]: CDR1/2 (a,b) and CDR3 anchor for refs; rough V/J/C coords
    # during scaffolding (each entry is [a, b, c])
    info: List[List[int]] = field(
        default_factory=lambda: [[-1, -1, -1], [-1, -1, -1], [-1, -1, -1]]
    )
    barcode: int = -1
    num_read: int = 0
    index: bool = True
    pos_weight_compressed: bool = False
    # ascii cache for the native chain scorer; only valid for is_ref seqs
    # (their consensus never changes after load).
    consensus_bytes_cache: Optional[bytes] = None
    # (source_obj, raw_ptr[, keepalive]) cache for batch chain scoring:
    # consensus-bytes pointer for refs, posWeight pointer for novels
    # (invalidated by identity check against the live pos_weight array).
    ptr_cache: Optional[tuple] = None

    def __setattr__(self, key, value):
        # Native-registry dirty tracking: the scored-query engine
        # (native/overlap_engine.cpp) holds per-seq copies of name/consensus
        # and the posWeight pointer; any REBIND of these must re-register
        # before the next native query.  In-place posWeight mutation keeps
        # the pointer valid and needs no tracking.  _owner/_idx are set by
        # SeqSet._native_sync at first registration.
        object.__setattr__(self, key, value)
        if key in _TRACKED_FIELDS:
            owner = getattr(self, "_owner", None)
            if owner is not None:
                owner._nat_dirty.add(self._idx)

    @property
    def consensus_len(self) -> int:
        return len(self.consensus)

    def weight_sum(self) -> int:
        if self.pos_weight is None:
            return 0
        return int(self.pos_weight.sum())


_TRACKED_FIELDS = frozenset(("consensus", "pos_weight", "name", "barcode"))


@dataclass
class Hit:
    idx: int  # seq index
    offset: int  # position in seq
    read_offset: int
    strand: int
    repeats: int = 0


@dataclass(slots=True)
class Overlap:
    """A read/contig-vs-seq overlap candidate (reference: _overlap).
    slots: millions of instances at single-cell scale."""

    seq_idx: int = -1
    read_start: int = -1
    read_end: int = -1
    seq_start: int = -1
    seq_end: int = -1
    strand: int = 1
    match_cnt: int = 0  # matched bases counted TWICE
    indel_cnt: int = 0
    similarity: float = 0.0
    hit_coords: Optional[List[Tuple[int, int]]] = None
    info: Optional[List[int]] = None
    info_from_hits: int = 0
    # (raw_ptr, n_pairs) of this overlap's coordinate block inside the
    # native query's coord copy (hit_coords keeps the block alive);
    # rides along through sorting/filtering for batch chain scoring.
    coord_ref: Optional[Tuple[int, int]] = None

    def sort_key(self):
        # Priority: matchCnt desc, similarity desc, read span desc, then
        # deterministic tie-breaks (SeqSet.hpp:103-127).
        return (
            -self.match_cnt,
            -self.similarity,
            -(self.read_end - self.read_start),
            self.seq_idx,
            self.strand,
            self.read_start,
            self.read_end,
            self.seq_start,
            self.seq_end,
        )


