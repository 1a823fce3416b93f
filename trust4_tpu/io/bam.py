"""Minimal BAM reader (BGZF + binary record parsing).

Replaces the reference's vendored samtools-0.1.19 (reference:
alignments.hpp, samtools-0.1.19/) for the read-only access patterns the
extractor needs: header chrom table, flags, CIGAR reference segments,
original-strand sequence/quality, and string aux fields.  BGZF is a
multi-member gzip stream, which Python's gzip module decodes natively.
"""

from __future__ import annotations

import gzip
import struct
from typing import Iterator, List, Optional, Tuple

_SEQ_CODE = "=ACMGRSVTWYHKDBN"
_COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}

BAM_CMATCH = 0
BAM_CINS = 1
BAM_CDEL = 2
BAM_CREF_SKIP = 3
BAM_CSOFT_CLIP = 4
BAM_CHARD_CLIP = 5
BAM_CPAD = 6


class BamRecord:
    __slots__ = (
        "name", "flag", "tid", "pos", "mapq", "mtid", "mpos", "tlen",
        "l_seq", "_seq_raw", "_qual_raw", "cigar", "_aux",
    )

    def __init__(self):
        self._aux = None

    # -- flags (alignments.hpp:380-426) --

    @property
    def is_reverse(self) -> bool:
        return bool(self.flag & 0x10)

    @property
    def is_mate_reverse(self) -> bool:
        return bool(self.flag & 0x20)

    @property
    def is_primary(self) -> bool:
        return (self.flag & 0x900) == 0

    @property
    def is_first_mate(self) -> bool:
        return bool(self.flag & 0x40)

    def is_template_aligned(self) -> bool:
        """alignments.hpp:387-394."""
        if (self.flag & 0xD) == 0xD or (self.flag & 0x5) == 0x4 or self.tid < 0:
            return False
        return True

    def is_aligned(self) -> bool:
        if self.flag & 0x4 or self.tid < 0:
            return False
        return True

    # -- sequence access: always original strand (alignments.hpp:489-541) --

    def read_seq(self) -> str:
        out = []
        raw = self._seq_raw
        n = self.l_seq
        for i in range(n):
            byte = raw[i >> 1]
            code = (byte >> 4) if i % 2 == 0 else (byte & 0xF)
            c = {1: "A", 2: "C", 4: "G", 8: "T"}.get(code, "N")
            out.append(c)
        if self.is_reverse:
            out = [_COMP.get(c, "N") for c in reversed(out)]
        return "".join(out)

    def qual(self) -> str:
        q = self._qual_raw
        if self.is_reverse:
            q = q[::-1]
        return "".join(chr(x + 33) for x in q)

    # -- CIGAR reference segments (alignments.hpp:181-249) --

    def ref_segments(self) -> List[Tuple[int, int]]:
        segments = []
        start = self.pos
        length = 0
        for op, num in self.cigar:
            if op in (BAM_CMATCH, BAM_CDEL):
                length += num
            elif op in (BAM_CSOFT_CLIP, BAM_CHARD_CLIP, BAM_CPAD, BAM_CINS):
                pass
            elif op == BAM_CREF_SKIP:
                segments.append((start, start + length - 1))
                start = start + length + num
                length = 0
            else:
                length += num
        segments.append((start, start + length - 1))
        return segments

    # -- aux fields (alignments.hpp:452-460) --

    def get_field_z(self, tag: str) -> Optional[str]:
        if self._aux is None:
            return None
        data = self._aux
        i = 0
        target = tag.encode("ascii")
        n = len(data)
        while i + 3 <= n:
            t = data[i : i + 2]
            typ = chr(data[i + 2])
            i += 3
            if typ == "A":
                val_len = 1
            elif typ in "cC":
                val_len = 1
            elif typ in "sS":
                val_len = 2
            elif typ in "iIf":
                val_len = 4
            elif typ in "ZH":
                end = data.index(b"\x00", i)
                if t == target:
                    return data[i:end].decode("ascii")
                i = end + 1
                continue
            elif typ == "B":
                sub = chr(data[i])
                cnt = struct.unpack_from("<i", data, i + 1)[0]
                sub_len = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}[sub]
                val_len = 5 + cnt * sub_len
            else:
                return None
            i += val_len
        return None


class BamReader:
    def __init__(self, path: str):
        self.path = path
        self._open()

    def _open(self):
        self._fp = gzip.open(self.path, "rb")
        magic = self._fp.read(4)
        if magic != b"BAM\x01":
            raise ValueError(f"{self.path}: not a BAM file")
        (l_text,) = struct.unpack("<i", self._fp.read(4))
        self.header_text = self._fp.read(l_text).decode("ascii", "replace")
        (n_ref,) = struct.unpack("<i", self._fp.read(4))
        self.chrom_names: List[str] = []
        self.chrom_lens: List[int] = []
        for _ in range(n_ref):
            (l_name,) = struct.unpack("<i", self._fp.read(4))
            name = self._fp.read(l_name)[:-1].decode("ascii")
            (l_ref,) = struct.unpack("<i", self._fp.read(4))
            self.chrom_names.append(name)
            self.chrom_lens.append(l_ref)
        self.chrom_ids = {n: i for i, n in enumerate(self.chrom_names)}

    def rewind(self) -> None:
        self._fp.close()
        self._open()

    def get_chrom_id_from_name(self, s: str) -> int:
        """alignments.hpp GetChromIdFromName: exact, strip-'chr', add-'chr'."""
        if s in self.chrom_ids:
            return self.chrom_ids[s]
        if len(s) >= 4 and s[3:] in self.chrom_ids:
            return self.chrom_ids[s[3:]]
        if "chr" + s in self.chrom_ids:
            return self.chrom_ids["chr" + s]
        raise ValueError(f"Unknown genome name: {s}")

    def __iter__(self) -> Iterator[BamRecord]:
        read = self._fp.read
        while True:
            head = read(4)
            if len(head) < 4:
                return
            (block_size,) = struct.unpack("<i", head)
            data = read(block_size)
            if len(data) < block_size:
                return
            rec = BamRecord()
            (
                rec.tid, rec.pos, l_read_name, rec.mapq, _bin, n_cigar,
                rec.flag, rec.l_seq, rec.mtid, rec.mpos, rec.tlen,
            ) = struct.unpack_from("<iiBBHHHiiii", data, 0)
            off = 32
            rec.name = data[off : off + l_read_name - 1].decode("ascii")
            off += l_read_name
            cigar = struct.unpack_from(f"<{n_cigar}I", data, off)
            rec.cigar = [(c & 0xF, c >> 4) for c in cigar]
            off += 4 * n_cigar
            seq_bytes = (rec.l_seq + 1) // 2
            rec._seq_raw = data[off : off + seq_bytes]
            off += seq_bytes
            rec._qual_raw = data[off : off + rec.l_seq]
            off += rec.l_seq
            rec._aux = data[off:]
            yield rec
