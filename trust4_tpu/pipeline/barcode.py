"""Barcode/UMI handling for the extractor: read-format parsing, whitelist
correction, and barcode translation.

References: ReadFormatter.hpp, BarcodeCorrector.hpp, BarcodeTranslator.hpp.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import Dict, List, Optional

FORMAT_READ1, FORMAT_READ2, FORMAT_BARCODE, FORMAT_UMI = 0, 1, 2, 3

_COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


@dataclass
class SegInfo:
    start: int = 0
    end: int = -1
    strand: int = 1
    in_comment: bool = False
    field: int = -1
    field_prefix: Optional[str] = None


class ReadFormatter:
    """--readFormat parser/extractor (ReadFormatter.hpp)."""

    def __init__(self):
        self.segs: List[List[SegInfo]] = [[] for _ in range(4)]

    def init(self, format_str: str) -> None:
        for part in format_str.replace(";", ",").split(","):
            if not part:
                continue
            self._parse(part)

    def _parse(self, s: str) -> None:
        if len(s) < 3 or s[2] != ":":
            raise ValueError(f"Format description error in {s}")
        cat = {"r1": 0, "r2": 1, "bc": 2, "um": 3}.get(s[:2])
        if cat is None:
            raise ValueError(f"Format description error in {s}")
        seg = SegInfo()
        rest = s[3:]
        if rest.startswith("hd:"):
            seg.in_comment = True
            rest = rest[3:]
            tok, _, rest = rest.partition(":")
            if tok.isdigit():
                seg.field = int(tok)
            else:
                seg.field = -1
                seg.field_prefix = tok
        toks = rest.split(":")
        if len(toks) < 2 or len(toks) > 3:
            raise ValueError(f"Format description error in {s}")
        seg.start = int(toks[0])
        seg.end = int(toks[1])
        if len(toks) == 3:
            seg.strand = 1 if toks[2] == "+" else -1
        self.segs[cat].append(seg)

    def add_segment(self, start: int, end: int, strand: int, cat: int) -> None:
        self.segs[cat].append(SegInfo(start=start, end=end, strand=strand))

    def need_extract(self, cat: int) -> bool:
        segs = self.segs[cat]
        if not segs:
            return False
        if len(segs) == 1:
            s = segs[0]
            if s.start == 0 and s.end == -1 and s.strand == 1 and not s.in_comment:
                return False
        return True

    def is_in_comment(self, cat: int) -> bool:
        return bool(self.segs[cat]) and self.segs[cat][0].in_comment

    def extract(self, seq: Optional[str], cat: int, need_complement: bool) -> str:
        """ReadFormatter.hpp:288-405."""
        if seq is None:
            return ""
        if not self.need_extract(cat):
            return seq
        length = len(seq)
        out = []
        strand = 1
        for seg in self.segs[cat]:
            start, end = seg.start, seg.end
            lenk = length
            if self.is_in_comment(cat):
                fstart, fend = 0, 0
                if seg.field >= 0:
                    f = 0
                    found = False
                    for j in range(length + 1):
                        c = seq[j] if j < length else "\0"
                        if c in (" ", "\t", "\0"):
                            f += 1
                            if f == seg.field:
                                fstart = j + 1
                            elif f == seg.field + 1:
                                fend = j - 1
                                found = True
                                break
                    if not found and f <= seg.field:
                        fstart = length
                        fend = length - 1
                else:
                    p = seq.find(seg.field_prefix)
                    if p != -1:
                        fstart = p
                        q = p
                        while q < length and seq[q] not in (" ", "\t"):
                            q += 1
                        fend = q - 1
                    else:
                        fstart = length
                        fend = length - 1
                if start >= 0:
                    start += fstart
                if end >= 0:
                    end += fstart
                lenk = fend + 1
            if start < 0:
                start = lenk + start
            if end >= lenk:
                end = lenk - 1
            elif end < 0:
                end = lenk + end
            out.append(seq[start : end + 1])
            if seg.strand == -1:
                strand = -1
        buf = "".join(out)
        if strand == -1:
            buf = buf[::-1]
            if need_complement:
                buf = "".join(_COMP.get(c, "N") for c in buf)
        return buf


class _TrieNode:
    __slots__ = ("next", "end", "count")

    def __init__(self):
        self.next = [None, None, None, None]
        self.end = False
        self.count = 0


_NUC = {"A": 0, "C": 1, "G": 2, "T": 3}


class BarcodeCorrector:
    """Whitelist trie + single-substitution correction
    (BarcodeCorrector.hpp)."""

    def __init__(self):
        self.head = _TrieNode()

    def _insert(self, s: str, weight: int) -> None:
        for c in s:
            if c not in _NUC:
                return
        p = self.head
        for c in s:
            tag = _NUC[c]
            if p.next[tag] is None:
                p.next[tag] = _TrieNode()
            p = p.next[tag]
        p.end = True
        p.count += weight

    def _search_and_update(self, s: str, weight: int) -> int:
        p = self.head
        for c in s:
            tag = _NUC.get(c)
            if tag is None or p.next[tag] is None:
                return -1
            p = p.next[tag]
        p.count += weight
        return p.count

    def set_whitelist(self, path: str) -> None:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as fp:
            for line in fp:
                self._insert(line.strip(), 1)

    def collect_background(self, barcodes, formatter: ReadFormatter, case_cnt=2_000_000):
        """First 2M observed (extracted) barcodes feed the frequency counts
        (BarcodeCorrector.hpp:134-147)."""
        n = 0
        for bc in barcodes:
            self._search_and_update(
                formatter.extract(bc, FORMAT_BARCODE, True), 1
            )
            n += 1
            if n >= case_cnt:
                break

    def correct(self, barcode: str, qual: Optional[str]):
        """Returns (result, corrected): -1 uncorrectable, 0 exact,
        1 corrected (BarcodeCorrector.hpp:150-218)."""
        if self._search_and_update(barcode, 0) != -1:
            return 0, barcode
        records = []
        for i, orig in enumerate(barcode):
            for j, test in enumerate("ACGT"):
                if test == orig:
                    continue
                cnt = self._search_and_update(
                    barcode[:i] + test + barcode[i + 1 :], 0
                )
                if cnt != -1:
                    records.append((i, j, cnt))
        if not records:
            return -1, barcode
        best_cnt = -1
        best_tag = -1
        best_low_qual = 255
        for t, (i, j, cnt) in enumerate(records):
            if cnt > best_cnt:
                best_cnt = cnt
                best_tag = t
                if qual is not None:
                    best_low_qual = ord(qual[i])
            elif cnt == best_cnt:
                if qual is not None and ord(qual[i]) < best_low_qual:
                    best_low_qual = ord(qual[i])
                    best_tag = t
        i, j, _ = records[best_tag]
        return 1, barcode[:i] + "ACGT"[j] + barcode[i + 1 :]


class BarcodeTranslator:
    """Translate-table barcode mapping (BarcodeTranslator.hpp)."""

    def __init__(self):
        self.table: Optional[Dict[str, str]] = None
        self.from_len = 0

    def set_translate_table(self, path: str) -> None:
        self.table = {}
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as fp:
            for line in fp:
                line = line.rstrip("\n")
                for i, c in enumerate(line):
                    if c in ",\t ":
                        break
                else:
                    continue
                to = line[:i]
                frm = line[i + 1 :]
                self.from_len = len(frm)
                self.table[frm] = to

    def is_set(self) -> bool:
        return self.table is not None

    def translate(self, bc: str) -> str:
        if self.table is None:
            return bc
        out = []
        for i in range(len(bc) // self.from_len):
            piece = bc[i * self.from_len : (i + 1) * self.from_len]
            to = self.table.get(piece)
            if to is None:
                return ""
            out.append(to)
        return "-".join(out)
