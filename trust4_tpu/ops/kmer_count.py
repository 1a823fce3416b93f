"""Canonical k-mer counting with per-read support stats and quality trimming.

Host-side equivalent of the reference counter (KmerCount.hpp).  The count
table is a plain dict keyed by canonical code; the per-read statistics and
3'-tail trimming reproduce the reference's exact arithmetic, including its
quirks:

* ``avg`` uses the sum over the *untrimmed* windows divided by the trimmed
  window count (KmerCount.hpp:219,277);
* a trim point inside the first k-mer empties the read and leaves the stats
  computed over a zero-length slice — min/median then read the first stored
  count and avg becomes +inf (KmerCount.hpp:266-277);
* any N in the (possibly trimmed) read forces min to 0 (KmerCount.hpp:278-285).

For bulk counting the add path also has a vectorized form used by the
batched TPU pipeline (counts merged with np.unique before dict update).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import numpy as np

from trust4_tpu.ops.kmer import canonical_codes, kmer_codes


class KmerCount:
    def __init__(self, k: int):
        self.k = k
        self.counts: Dict[int, int] = {}
        # Native backend (engine/overlap_native.py): when present, counts
        # live C++-side and the host dict stays empty.
        self._native = None
        try:
            from trust4_tpu.engine import overlap_native

            if overlap_native.available():
                self._native = overlap_native.NativeKmerCount(k)
        except Exception:
            self._native = None
        self._max_read_len = -1
        # Persistent per-window count buffer.  The reference reuses one
        # heap buffer across calls and sorts it in place, so when trimming
        # shrinks the window count below the stored count, the stats read
        # *stale values from the previous read* (KmerCount.hpp:187-277).
        # We model the single-thread buffer exactly (fresh pages = 0).
        self._buf: list = []

    @property
    def max_read_len(self):
        if self._native is not None:
            return self._native.max_read_len
        return self._max_read_len

    @max_read_len.setter
    def max_read_len(self, v):
        if self._native is not None:
            self._native.max_read_len = v
        else:
            self._max_read_len = v

    def add_count(self, read: str) -> int:
        """Count canonical k-mers of one read (KmerCount.hpp:64-97)."""
        if self._native is not None:
            return self._native.add_count(read)
        if len(read) < self.k:
            return 0
        codes, valid = kmer_codes(read, self.k)
        canon = canonical_codes(codes, self.k)
        counts = self.counts
        for w in range(len(canon)):
            if valid[w]:
                c = int(canon[w])
                counts[c] = counts.get(c, 0) + 1
        if len(read) > self.max_read_len:
            self.max_read_len = len(read)
        return 1

    def add_counts_batch(self, reads) -> None:
        """Vectorized bulk counting across many reads."""
        all_codes = []
        for read in reads:
            if len(read) < self.k:
                continue
            codes, valid = kmer_codes(read, self.k)
            canon = canonical_codes(codes, self.k)
            if valid.all():
                all_codes.append(canon)
            else:
                all_codes.append(canon[valid])
            if len(read) > self.max_read_len:
                self.max_read_len = len(read)
        if not all_codes:
            return
        cat = np.concatenate(all_codes)
        uniq, cnt = np.unique(cat, return_counts=True)
        counts = self.counts
        for u, c in zip(uniq.tolist(), cnt.tolist()):
            counts[u] = counts.get(u, 0) + c

    def add_count_from_file(self, path: str) -> None:
        """Ingest jellyfish2 dump output: alternating '>count' / kmer
        tokens; counts <= 1 are skipped and stored counts OVERWRITE
        (KmerCount.hpp:99-120 assigns, not accumulates).  The stored code
        is the raw forward code of the dumped k-mer (the reference appends
        the token without canonicalizing; jellyfish dumps canonical
        k-mers already)."""
        with open(path) as fp:
            tokens = fp.read().split()
        i = 0
        counts = self.counts
        while i + 1 < len(tokens):
            c = int(tokens[i][1:])
            kmer = tokens[i + 1]
            i += 2
            if c <= 1:
                continue
            codes, _valid = kmer_codes(kmer, self.k)
            if len(codes) == 0:
                continue
            if self._native is not None:
                self._native.set_count(int(codes[0]), c)
            else:
                counts[int(codes[0])] = c

    def get_count(self, kmer: str) -> int:
        codes, valid = kmer_codes(kmer, self.k)
        if len(codes) == 0 or not valid[0]:
            return 0
        canon = int(canonical_codes(codes[:1], self.k)[0])
        if self._native is not None:
            return self._native.get_count_code(canon)
        return self.counts.get(canon, 0)

    def get_count_stats_and_trim(
        self, read: str, qual: Optional[str]
    ) -> Tuple[str, Optional[str], int, int, float, int]:
        """Per-read (min, median, avg) k-mer support + low-quality 3' trim.

        Reference: KmerCount.hpp:177-288 (GetCountStatsAndTrim).  Returns
        (read, qual, min_count, median_count, avg_count, ok) where read/qual
        are the possibly-trimmed strings (the reference trims in place).
        """
        if self._native is not None:
            return self._native.stats_trim(read, qual)
        if self.max_read_len == -1:
            return read, qual, 0, 0, 0.0, 0
        k = self.k
        length = len(read)
        if length < k:
            return read, qual, -1, -1, -1.0, 0

        if len(self._buf) < self.max_read_len:
            self._buf.extend([0] * (self.max_read_len - len(self._buf)))
        c = self._buf
        codes, valid = kmer_codes(read, k)
        canon = canonical_codes(codes, k)
        s = 0
        nk = 0
        counts = self.counts
        for w in range(len(canon)):
            if valid[w]:
                v = counts.get(int(canon[w]), 0)
                if v <= 0:
                    v = 1
                c[nk] = v
                s += v
                nk += 1
        stored = nk
        if nk == 0:
            if qual is not None:
                read = ""
                qual = ""
            return read, qual, -length, -length, float(-length), 0

        orig_read = read
        nulled = set()
        if qual is not None:
            i = stored - 1
            while i >= 0:
                if c[i] > 1:
                    break
                i -= 1
            i += 1
            bad_cnt = 0
            trim_start = -1
            j = length - 1
            while j >= i + k - 1:
                if ord(qual[j]) - 32 <= 15:
                    bad_cnt += 1
                    if bad_cnt >= 0.1 * (length - j):
                        trim_start = j
                j -= 1
            if trim_start > 0:
                nk = trim_start - k + 1
                read = read[:trim_start]
                qual = qual[:trim_start]
                nulled.add(trim_start)
            if 0 < trim_start < k:
                nk = 0
                read = ""
                qual = ""
                nulled.add(0)

        if nk == 0:
            # Reference reads the stale first buffer slot and divides by zero
            # (sum over >=1 windows / 0 -> +inf as a C float).
            min_count = c[0]
            median_count = c[0]
            avg_count = math.inf
        else:
            # std::sort(c, c+nk) sorts the buffer prefix IN PLACE; positions
            # beyond ``stored`` hold stale values from earlier reads, which
            # participate when trimming derived nk from positions while Ns
            # reduced the stored count.
            c[:nk] = sorted(c[:nk])
            min_count = c[0]
            median_count = c[nk // 2]
            avg_count = s / nk

        # The reference's N scan runs over the ORIGINAL buffer length; the
        # trim only NUL-ed single positions, so Ns beyond the trim point are
        # still seen (KmerCount.hpp:278-285).  Counts clamp min to >= 1
        # before this, so the effect is simply min=0 when any N is seen.
        has_n = any(
            orig_read[i] == "N" for i in range(length) if i not in nulled
        )
        if has_n:
            if min_count >= 0:
                min_count = 0
            else:
                min_count -= 1
        return read, qual, min_count, median_count, avg_count, 1
