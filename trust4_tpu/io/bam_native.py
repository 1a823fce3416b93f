"""ctypes loader for the native BAM scanner (libt4bam.so).

Drop-in replacement for io/bam.py's BamReader hot loop: BGZF inflate and
record decode run in C++ (native/bam_scan.cpp), with records delivered in
struct-of-arrays batches and wrapped lazily.  Field semantics are identical
to io/bam.py (sequences/qualities already oriented to the original strand,
same CIGAR->segments rule, same Z-tag lookup).  Set TRUST4_TPU_NATIVE=0 to
force the pure-Python reader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Tuple

import numpy as np

# TRUST4_TPU_NATIVE_DIR points at an alternate build (e.g. the asan=1
# libraries tools/asan_check.sh builds into native/asan/).
_NATIVE_DIR = os.environ.get(
    "TRUST4_TPU_NATIVE_DIR",
    os.path.join(os.path.dirname(__file__), "..", "native"),
)
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libt4bam.so"))

_LIB = None
_TRIED = False

_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TRUST4_TPU_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR), "libt4bam.so"],
                check=True,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    c_int = ctypes.c_int
    lib.t4bam_open.restype = ctypes.c_void_p
    lib.t4bam_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.t4bam_close.argtypes = [ctypes.c_void_p]
    lib.t4bam_n_refs.restype = c_int
    lib.t4bam_n_refs.argtypes = [ctypes.c_void_p]
    lib.t4bam_ref_name.restype = c_int
    lib.t4bam_ref_name.argtypes = [ctypes.c_void_p, c_int, ctypes.c_char_p, c_int]
    lib.t4bam_ref_len.restype = c_int
    lib.t4bam_ref_len.argtypes = [ctypes.c_void_p, c_int]
    lib.t4bam_header_text.restype = c_int
    lib.t4bam_header_text.argtypes = [ctypes.c_void_p, ctypes.c_char_p, c_int]
    lib.t4bam_next_batch.restype = c_int
    lib.t4bam_next_batch.argtypes = [
        ctypes.c_void_p, c_int, _i32p, _i32p, _i32p, c_int,
        _u8p, ctypes.c_int64, _u8p, ctypes.c_int64,
    ]
    # Candidate-filter symbols (extract_filter.cpp is linked into this
    # library so the extractor can run fully natively).
    lib.t4x_create.restype = ctypes.c_void_p
    lib.t4x_create.argtypes = [c_int, c_int]
    lib.t4x_destroy.argtypes = [ctypes.c_void_p]
    lib.t4x_set_hit_len.argtypes = [ctypes.c_void_p, c_int]
    lib.t4x_add_seq.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.t4bam_extract.restype = c_int
    lib.t4bam_extract.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        c_int, c_int, c_int, c_int, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def native_bam_extract(
    bam_path: str,
    ref_seqs,
    kmer_length: int,
    radius: int,
    hit_len_required: int,
    genes,
    paired: bool,
    abnormal_unmapped: bool,
    mate_id_len: int,
    out1: str,
    out2: str,
    out_bc: str,
    out_umi: str,
    bc_tag: str,
    umi_tag: str,
) -> None:
    """Run the full two-pass extraction natively (t4bam_extract)."""
    lib = _load()
    h = lib.t4x_create(kmer_length, radius)
    try:
        for s in ref_seqs:
            lib.t4x_add_seq(h, s.encode("ascii"))
        lib.t4x_set_hit_len(h, hit_len_required)
        g = np.ascontiguousarray(genes, dtype=np.int64)
        rc = lib.t4bam_extract(
            bam_path.encode(), h,
            g.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(g),
            1 if paired else 0, 1 if abnormal_unmapped else 0, mate_id_len,
            out1.encode(), (out2 or "").encode(), (out_bc or "").encode(),
            (out_umi or "").encode(), (bc_tag or "").encode(),
            (umi_tag or "").encode(),
        )
        if rc == -1:
            raise RuntimeError(
                "Two reads from the unaligned fragment are not showing up "
                "together. Please use -u option."
            )
        if rc != 0:
            raise RuntimeError(f"native BAM extraction failed ({rc})")
    finally:
        lib.t4x_destroy(h)


class NativeBamRecord:
    """io/bam.py BamRecord-compatible view over one batch row.

    Sequence/quality/segments decode lazily: most records in an extraction
    pass only have their flags/coords inspected."""

    __slots__ = (
        "name", "flag", "tid", "pos", "mapq", "mtid", "mpos", "tlen",
        "l_seq", "_text_b", "_text_off", "_segs_rows", "_bc", "_umi",
        "_tags",
    )

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
        if (self.flag & 0xD) == 0xD or (self.flag & 0x5) == 0x4 or self.tid < 0:
            return False
        return True

    def is_aligned(self) -> bool:
        if self.flag & 0x4 or self.tid < 0:
            return False
        return True

    def read_seq(self) -> str:
        o = self._text_off
        return self._text_b[o : o + self.l_seq].decode("ascii")

    def qual(self) -> str:
        o = self._text_off + self.l_seq
        return self._text_b[o : o + self.l_seq].decode("ascii")

    def ref_segments(self) -> List[Tuple[int, int]]:
        return self._segs_rows

    def get_field_z(self, tag: str) -> Optional[str]:
        if tag == self._tags[0]:
            return self._bc
        if tag == self._tags[1]:
            return self._umi
        raise KeyError(
            f"tag {tag} not preconfigured on the native BAM reader"
        )


class NativeBamReader:
    """BamReader-compatible reader backed by the C++ scanner.

    ``tags`` preconfigures up to two Z-type aux fields (e.g. barcode/UMI
    tags) extracted per record."""

    _BATCH = 8192

    def __init__(self, path: str, tags: Tuple[str, str] = ("", "")):
        lib = _load()
        if lib is None:
            raise RuntimeError("native BAM scanner unavailable")
        self._lib = lib
        self.path = path
        self._tags = (tags[0] or "", tags[1] or "")
        self._open()
        # batch buffers
        self._fixed = np.empty((self._BATCH, 12), dtype=np.int32)
        self._aux = np.empty((self._BATCH, 4), dtype=np.int32)
        self._seg_cap = self._BATCH * 16
        self._segs = np.empty((self._seg_cap, 2), dtype=np.int32)
        self._text_cap = self._BATCH * 1024
        self._text = np.empty(self._text_cap, dtype=np.uint8)
        self._name_cap = self._BATCH * 512
        self._names = np.empty(self._name_cap, dtype=np.uint8)

    def _open(self):
        self._h = self._lib.t4bam_open(
            self.path.encode(), self._tags[0].encode(), self._tags[1].encode()
        )
        if not self._h:
            raise ValueError(f"{self.path}: not a BAM file")
        n = self._lib.t4bam_n_refs(self._h)
        buf = ctypes.create_string_buffer(4096)
        self.chrom_names = []
        self.chrom_lens = []
        for i in range(n):
            self._lib.t4bam_ref_name(self._h, i, buf, 4096)
            self.chrom_names.append(buf.value.decode("ascii"))
            self.chrom_lens.append(self._lib.t4bam_ref_len(self._h, i))
        self.chrom_ids = {s: i for i, s in enumerate(self.chrom_names)}
        hl = self._lib.t4bam_header_text(self._h, None, 0)
        hbuf = ctypes.create_string_buffer(max(hl, 1))
        self._lib.t4bam_header_text(self._h, hbuf, hl)
        self.header_text = hbuf.raw[:hl].decode("ascii", "replace")

    def close(self):
        if getattr(self, "_h", None):
            self._lib.t4bam_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def rewind(self) -> None:
        self.close()
        self._open()

    def get_chrom_id_from_name(self, s: str) -> int:
        if s in self.chrom_ids:
            return self.chrom_ids[s]
        if len(s) >= 4 and s[3:] in self.chrom_ids:
            return self.chrom_ids[s[3:]]
        if "chr" + s in self.chrom_ids:
            return self.chrom_ids["chr" + s]
        raise ValueError(f"Unknown genome name: {s}")

    def __iter__(self) -> Iterator[NativeBamRecord]:
        lib = self._lib
        while True:
            n = lib.t4bam_next_batch(
                self._h, self._BATCH,
                self._fixed.ctypes.data_as(_i32p),
                self._aux.ctypes.data_as(_i32p),
                self._segs.ctypes.data_as(_i32p), self._seg_cap,
                self._text.ctypes.data_as(_u8p), self._text_cap,
                self._names.ctypes.data_as(_u8p), self._name_cap,
            )
            if n == -1:
                # one oversized record: grow buffers and retry
                self._seg_cap *= 4
                self._segs = np.empty((self._seg_cap, 2), dtype=np.int32)
                self._text_cap *= 4
                self._text = np.empty(self._text_cap, dtype=np.uint8)
                self._name_cap *= 4
                self._names = np.empty(self._name_cap, dtype=np.uint8)
                continue
            if n == 0:
                return
            fixed = self._fixed[:n].tolist()
            aux = self._aux[:n].tolist()
            last = fixed[-1]
            # used blob sizes: names end after the last record's name+tags,
            # text after the summed seq/qual bytes.
            name_end = last[8] + last[9]
            for b0, b1, u0, u1 in aux:
                if b0 >= 0 and b0 + b1 > name_end:
                    name_end = b0 + b1
                if u0 >= 0 and u0 + u1 > name_end:
                    name_end = u0 + u1
            text_end = sum(2 * row[7] for row in fixed)
            seg_end = last[10] + last[11]
            names_b = self._names[:name_end].tobytes()
            text_b = self._text[:text_end].tobytes()
            seg_pairs = [tuple(p) for p in self._segs[:seg_end].tolist()]
            text_off = 0
            tags = self._tags
            for i in range(n):
                (flag, tid, pos, mapq, mtid, mpos, tlen, l_seq,
                 name_off, name_len, seg_off, n_seg) = fixed[i]
                rec = NativeBamRecord()
                rec.flag = flag
                rec.tid = tid
                rec.pos = pos
                rec.mapq = mapq
                rec.mtid = mtid
                rec.mpos = mpos
                rec.tlen = tlen
                rec.l_seq = l_seq
                rec.name = names_b[name_off : name_off + name_len].decode(
                    "ascii"
                )
                rec._text_b = text_b
                rec._text_off = text_off
                text_off += 2 * l_seq
                rec._segs_rows = seg_pairs[seg_off : seg_off + n_seg]
                b0, b1, u0, u1 = aux[i]
                rec._bc = (
                    names_b[b0 : b0 + b1].decode("ascii") if b0 >= 0 else None
                )
                rec._umi = (
                    names_b[u0 : u0 + u1].decode("ascii") if u0 >= 0 else None
                )
                rec._tags = tags
                yield rec
