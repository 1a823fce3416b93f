"""Dynamic k-mer -> postings index for the growing contig store.

Host-side equivalent of the reference's mutable index (KmerIndex.hpp).
Postings are (seq_idx, offset) in insertion order — ordering is part of the
determinism contract because downstream hit sorting is stable only up to this
order.

Two reference quirks are reproduced exactly:

* consecutive-duplicate suppression when building from a read: a window is
  inserted when it differs from the previous window's code OR it is the
  window starting at position 1 (``i == kl`` in KmerIndex.hpp:132), which
  also means a read whose first window code equals the initial rolling state
  (all-A) skips that first window;
* with barcode hashing enabled, a probe with barcode b only sees postings
  whose barcode is congruent to b modulo the bucket count 1,000,003
  (KmerIndex.hpp:29-33) — per-cell isolation with rare aliasing.

The static germline membership tables used by the TPU probe kernel are a
different, immutable structure (ops/prefilter.py build_membership_tables).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from trust4_tpu.ops.kmer import kmer_codes

KINDEX_HASH_MAX = 1000003

_EMPTY: List[Tuple[int, int]] = []


class KmerIndex:
    def __init__(self, consider_barcode: bool = False):
        self.consider_barcode = consider_barcode
        # key -> list of (seq_idx, offset)
        self._index: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
        # Deferred host builds: build_from_read queues here and the
        # Python postings materialize on first host search/mutation
        # (native-engine pipelines never host-search ref stores, so they
        # never pay the per-window Python insertion at all).  Replay
        # order == call order, so insertion-order determinism is intact.
        self._pending: List[Tuple[str, int, int, int, int]] = []
        # Native twin (engine/overlap_native.py): receives every
        # string-level mutation so overlap queries can run in C++.
        self.native = None
        # When True (and the native twin exists) the Python dict postings
        # are not maintained: queries must go through the native engine.
        # Enabled per-SeqSet for contig stores that never use the host
        # search path (ref sets keep both for HasHitInSet).
        self.native_only = False
        try:
            from trust4_tpu.engine import overlap_native

            if overlap_native.available():
                self.native = overlap_native.NativeOverlapEngine(9)
                if consider_barcode:
                    self.native.set_consider_barcode(True)
        except Exception:
            self.native = None

    def set_consider_barcode(self, s: bool) -> None:
        self._flush_pending()  # _key depends on the flag; keep eager keys
        self.consider_barcode = s
        if self.native is not None:
            self.native.set_consider_barcode(s)

    def _key(self, code: int, barcode: int) -> Tuple[int, int]:
        if self.consider_barcode:
            return (code, (code + barcode + 1) % KINDEX_HASH_MAX)
        return (code, (code % KINDEX_HASH_MAX))

    def clear(self) -> None:
        self._pending.clear()
        self._index.clear()
        if self.native is not None:
            self.native.clear()

    def _flush_pending(self) -> None:
        if not self._pending:
            return
        pend, self._pending = self._pending, []
        for (s, kl, sid, barcode, shift) in pend:
            self._host_build_from_read(s, kl, sid, barcode, shift)

    def insert(self, code: int, idx: int, offset: int, barcode: int) -> None:
        self._flush_pending()
        self._index.setdefault(self._key(code, barcode), []).append((idx, offset))

    def search(self, code: int, barcode: int) -> List[Tuple[int, int]]:
        assert not self.native_only, (
            "host search on a native-only index (enable the dict or query "
            "through the native engine)"
        )
        self._flush_pending()
        return self._index.get(self._key(code, barcode), _EMPTY)

    def remove(self, code: int, idx: int, offset: int, barcode: int) -> None:
        self._flush_pending()
        lst = self._index.get(self._key(code, barcode))
        if not lst:
            return
        for i, (a, b) in enumerate(lst):
            if a == idx and b == offset:
                del lst[i]
                # Reference only erases emptied barcode-hashed entries
                # (KmerIndex.hpp:98-99); emptied lists behave identically
                # either way for search.
                if not lst:
                    del self._index[self._key(code, barcode)]
                return

    # --- read-level builders (KmerIndex.hpp:118-201) ---

    def _windows(self, s: str, kl: int):
        codes, valid = kmer_codes(s, kl)
        return codes, valid

    def build_from_read(
        self, s: str, kl: int, sid: int, barcode: int, shift: int = 0
    ) -> None:
        if self.native_only and self.native is not None:
            self.native.build_from_read(s, kl, sid, barcode, shift)
            return
        self._pending.append((s, kl, sid, barcode, shift))
        if self.native is not None:
            self.native.build_from_read(s, kl, sid, barcode, shift)

    def _host_build_from_read(
        self, s: str, kl: int, sid: int, barcode: int, shift: int
    ) -> None:
        codes, valid = self._windows(s, kl)
        n = len(codes)
        for w in range(n):
            if not valid[w]:
                continue
            # Reference inserts when i == kl (window 1) or the rolling code
            # differs from the previous position's rolling code — which
            # advances every position regardless of validity (N packs as 0).
            # Window 0 compares against the restart state 0, so an all-A
            # first window is skipped.
            if w != 1:
                prev = 0 if w == 0 else int(codes[w - 1])
                if int(codes[w]) == prev:
                    continue
            self._index.setdefault(
                self._key(int(codes[w]), barcode), []
            ).append((sid, w + shift))

    def remove_from_read(
        self, s: str, kl: int, sid: int, barcode: int, offset: int = 0
    ) -> None:
        if self.native_only and self.native is not None:
            self.native.remove_from_read(s, kl, sid, barcode, offset)
            return
        self._flush_pending()
        codes, valid = self._windows(s, kl)
        for w in range(len(codes)):
            if valid[w]:
                self.remove(int(codes[w]), sid, w + offset, barcode)
        if self.native is not None:
            self.native.remove_from_read(s, kl, sid, barcode, offset)

    def update_from_read(
        self, s: str, kl: int, barcode: int, shift: int, old_id: int, new_id: int
    ) -> None:
        if self.native_only and self.native is not None:
            self.native.update_from_read(s, kl, barcode, shift, old_id, new_id)
            return
        self._flush_pending()
        codes, valid = self._windows(s, kl)
        for w in range(len(codes)):
            if not valid[w]:
                continue
            lst = self._index.get(self._key(int(codes[w]), barcode))
            if not lst:
                continue
            for i, (a, b) in enumerate(lst):
                if a == old_id and b == w:
                    lst[i] = (new_id, b + shift)
                    break
        if self.native is not None:
            self.native.update_from_read(s, kl, barcode, shift, old_id, new_id)
