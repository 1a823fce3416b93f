"""ctypes loader for the native alignment kernel library.

Builds trust4_tpu/native/libt4align.so on first use (g++ is part of the
baked toolchain).  Set TRUST4_TPU_NATIVE=0 to force the pure-Python oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False

# TRUST4_TPU_NATIVE_DIR points at an alternate build (e.g. the asan=1
# libraries tools/asan_check.sh builds into native/asan/).
_NATIVE_DIR = os.environ.get(
    "TRUST4_TPU_NATIVE_DIR",
    os.path.join(os.path.dirname(__file__), "..", "native"),
)
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libt4align.so"))


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
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    c_char_p = ctypes.c_char_p
    c_int = ctypes.c_int
    c_int64 = ctypes.c_int64
    c_double = ctypes.c_double
    i8_p = ctypes.POINTER(ctypes.c_int8)
    i32_p = ctypes.POINTER(ctypes.c_int32)
    int_p = ctypes.POINTER(c_int)

    lib.t4_global_alignment.restype = c_int64
    lib.t4_global_alignment.argtypes = [
        c_char_p, c_int, c_char_p, c_int, i8_p, int_p,
    ]
    lib.t4_global_alignment_posweight.restype = c_int64
    lib.t4_global_alignment_posweight.argtypes = [
        i32_p, c_int, c_char_p, c_int, i8_p, int_p,
    ]
    lib.t4_global_alignment_posweight_affine.restype = c_int64
    lib.t4_global_alignment_posweight_affine.argtypes = [
        i32_p, c_int, c_char_p, c_int, i8_p, int_p,
    ]
    lib.t4_global_alignment_one_end.restype = c_int64
    lib.t4_global_alignment_one_end.argtypes = [
        c_char_p, c_int, c_char_p, c_int, c_int64, c_double, i8_p, int_p,
    ]
    lib.t4_local_alignment.restype = c_int64
    lib.t4_local_alignment.argtypes = [
        c_char_p, c_int, c_char_p, c_int, int_p, int_p, i8_p, int_p,
    ]
    lib.t4_global_alignment_counts.restype = c_int64
    lib.t4_global_alignment_counts.argtypes = [
        c_char_p, c_int, c_char_p, c_int, int_p,
    ]
    lib.t4_global_alignment_posweight_counts.restype = c_int64
    lib.t4_global_alignment_posweight_counts.argtypes = [
        i32_p, c_int, c_char_p, c_int, int_p,
    ]
    lib.t4_chain_score.restype = None
    lib.t4_chain_score.argtypes = [
        ctypes.c_void_p, c_int, c_int, c_int, c_int, c_int, c_char_p,
        ctypes.c_void_p, c_char_p, ctypes.POINTER(c_int64),
    ]
    lib.t4_chain_score_batch.restype = None
    lib.t4_chain_score_batch.argtypes = [
        ctypes.POINTER(c_int64), i32_p, ctypes.POINTER(c_int64), c_int,
        c_int, c_int, c_int, c_char_p, c_char_p, ctypes.POINTER(c_int64),
    ]
    lib.t4_extend_overlap.restype = None
    lib.t4_extend_overlap.argtypes = [
        ctypes.c_void_p, c_char_p, c_int, c_int, c_int, c_int, c_int,
        c_int, ctypes.POINTER(c_int64),
    ]
    lib.t4_chain_score2.restype = None
    lib.t4_chain_score2.argtypes = [
        ctypes.c_void_p, c_int, c_int, c_int, c_int, c_int, c_char_p,
        ctypes.c_void_p, c_char_p, c_int, c_int, ctypes.POINTER(c_int64),
    ]
    lib.t4_is_mate_overlap.restype = c_int
    lib.t4_is_mate_overlap.argtypes = [
        c_char_p, c_int, c_char_p, c_int, c_int, c_int, int_p, int_p,
    ]
    lib.t4_fmt_pw_block.restype = ctypes.c_int64
    lib.t4_fmt_pw_block.argtypes = [
        ctypes.POINTER(ctypes.c_int32), c_int, c_char_p, ctypes.c_int64,
    ]
    lib.t4_fmt_pw_compressed.restype = ctypes.c_int64
    lib.t4_fmt_pw_compressed.argtypes = [
        c_char_p, c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        c_char_p, ctypes.c_int64,
    ]
    lib.t4_fmt_pw_onehot.restype = ctypes.c_int64
    lib.t4_fmt_pw_onehot.argtypes = [
        c_char_p, c_int, c_int, c_char_p, ctypes.c_int64,
    ]
    lib.t4_parse_i32.restype = ctypes.c_int64
    lib.t4_parse_i32.argtypes = [
        c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.t4_parse_final_out.restype = ctypes.c_int64
    lib.t4_parse_final_out.argtypes = [
        c_char_p, ctypes.c_int64, ctypes.POINTER(c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, i32_p,
    ]
    lib.t4_parse_assembled_fa.restype = ctypes.c_int64
    lib.t4_parse_assembled_fa.argtypes = [
        c_char_p, ctypes.c_int64, ctypes.POINTER(c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


import threading

_TLS = threading.local()


def _out_buf(n: int):
    """Reusable per-thread edit-script buffer (allocation dominates the
    cost of small DP calls; safe across fork since each process gets its
    own TLS copies)."""
    n = max(n, 1)
    buf = getattr(_TLS, "buf", None)
    if buf is None or len(buf) < n:
        cap = 1 << max(n - 1, 1).bit_length()
        buf = (ctypes.c_int8 * cap)()
        _TLS.buf = buf
    ln = ctypes.c_int(0)
    return buf, ln


def chain_score_batch(coord_ptrs, per_meta, seq_ptrs, kl, radius,
                      nomatch_gap_limit, read_fwd_bytes, read_rc_bytes):
    """One call scoring all of a query's overlap chains; returns an
    (n, 5) int64 array {match, mismatch, indel, sim_zero, low_complex}."""
    lib = _LIB
    n = len(coord_ptrs)
    out = np.empty((n, 5), dtype=np.int64)
    lib.t4_chain_score_batch(
        coord_ptrs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        per_meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        seq_ptrs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, kl, radius, nomatch_gap_limit, read_fwd_bytes, read_rc_bytes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def extend_overlap_core(posweight, read_bytes, read_len, seq_len,
                        read_start, read_end, seq_start, seq_end):
    """Both overhang profile-DPs + tallies of ExtendOverlap; returns
    (ret, left, right, good_left, good_right, match, mismatch, indel)."""
    lib = _LIB
    w = posweight
    if not (w.flags["C_CONTIGUOUS"] and w.dtype == np.int32):
        w = np.ascontiguousarray(w, dtype=np.int32)
    out = (ctypes.c_int64 * 8)()
    lib.t4_extend_overlap(
        w.ctypes.data, read_bytes, read_len, seq_len,
        read_start, read_end, seq_start, seq_end, out,
    )
    return tuple(out)


def chain_score2(coords, kl, radius, nomatch_gap_limit, is_ref,
                 consensus_bytes, posweight, read_bytes, read_start,
                 read_end):
    """Chain walk + overlap low-complexity test in one native call:
    (match, mismatch, indel, similarity_zero, low_complex)."""
    lib = _LIB
    c = coords
    if not (
        isinstance(c, np.ndarray)
        and c.dtype == np.int32
        and c.flags["C_CONTIGUOUS"]
    ):
        c = np.ascontiguousarray(c, dtype=np.int32)
    out = (ctypes.c_int64 * 5)()
    if is_ref:
        lib.t4_chain_score2(
            c.ctypes.data, len(c), kl, radius, nomatch_gap_limit, 1,
            consensus_bytes, None, read_bytes, read_start, read_end, out,
        )
    else:
        w = posweight
        if not (w.flags["C_CONTIGUOUS"] and w.dtype == np.int32):
            w = np.ascontiguousarray(w, dtype=np.int32)
        lib.t4_chain_score2(
            c.ctypes.data, len(c), kl, radius, nomatch_gap_limit, 0,
            None, w.ctypes.data, read_bytes, read_start, read_end, out,
        )
    return out[0], out[1], out[2], out[3], out[4]


def chain_score(coords, kl, radius, nomatch_gap_limit, is_ref,
                consensus, posweight, read_bytes):
    """Accumulated (match, mismatch, indel, similarity_zero) along a hit
    chain, gap-fill DPs included (engine/overlap.py chain walk).
    read_bytes must be pre-encoded ascii; coords an (n, 2) int32 array or
    a list of pairs."""
    lib = _LIB
    c = coords
    if not (
        isinstance(c, np.ndarray)
        and c.dtype == np.int32
        and c.flags["C_CONTIGUOUS"]
    ):
        c = np.ascontiguousarray(c, dtype=np.int32)
    out = (ctypes.c_int64 * 4)()
    if is_ref:
        lib.t4_chain_score(
            c.ctypes.data, len(c), kl, radius, nomatch_gap_limit, 1,
            consensus.encode("ascii"), None, read_bytes, out,
        )
    else:
        w = posweight
        if not (w.flags["C_CONTIGUOUS"] and w.dtype == np.int32):
            w = np.ascontiguousarray(w, dtype=np.int32)
        lib.t4_chain_score(
            c.ctypes.data, len(c), kl, radius, nomatch_gap_limit, 0,
            None, w.ctypes.data, read_bytes, out,
        )
    return out[0], out[1], out[2], out[3]


def global_alignment_counts(t: str, p: str) -> Tuple[int, int, int]:
    """(match, mismatch, indel) tallies of the global-alignment edit
    script, without transferring the script itself."""
    lib = _LIB
    out = (ctypes.c_int * 3)()
    lib.t4_global_alignment_counts(t.encode(), len(t), p.encode(), len(p), out)
    return out[0], out[1], out[2]


def global_alignment_posweight_counts(t_weights, p: str) -> Tuple[int, int, int]:
    lib = _LIB
    w = np.ascontiguousarray(t_weights, dtype=np.int32)
    out = (ctypes.c_int * 3)()
    lib.t4_global_alignment_posweight_counts(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(w), p.encode(), len(p), out,
    )
    return out[0], out[1], out[2]


def global_alignment(t: str, p: str) -> Tuple[int, List[int]]:
    lib = _LIB
    buf, ln = _out_buf(len(t) + len(p) + 2)
    ret = lib.t4_global_alignment(
        t.encode(), len(t), p.encode(), len(p), buf, ctypes.byref(ln)
    )
    return int(ret), list(buf[: ln.value])


def global_alignment_posweight(t_weights, p: str) -> Tuple[int, List[int]]:
    lib = _LIB
    w = np.ascontiguousarray(t_weights, dtype=np.int32)
    lent = len(w)
    buf, ln = _out_buf(lent + len(p) + 2)
    ret = lib.t4_global_alignment_posweight(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lent, p.encode(), len(p), buf, ctypes.byref(ln),
    )
    return int(ret), list(buf[: ln.value])


def global_alignment_posweight_affine(t_weights, p: str) -> Tuple[int, List[int]]:
    lib = _LIB
    w = np.ascontiguousarray(t_weights, dtype=np.int32)
    lent = len(w)
    buf, ln = _out_buf(lent + len(p) + 2)
    ret = lib.t4_global_alignment_posweight_affine(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lent, p.encode(), len(p), buf, ctypes.byref(ln),
    )
    return int(ret), list(buf[: ln.value])


def global_alignment_one_end(
    t: str, p: str, threshold: int, factor: float
) -> Tuple[int, List[int]]:
    lib = _LIB
    buf, ln = _out_buf(len(t) + len(p) + 2)
    ret = lib.t4_global_alignment_one_end(
        t.encode(), len(t), p.encode(), len(p), threshold, factor,
        buf, ctypes.byref(ln),
    )
    return int(ret), list(buf[: ln.value])


def local_alignment(t: str, p: str) -> Tuple[int, int, int, List[int]]:
    lib = _LIB
    buf, ln = _out_buf(len(t) + len(p) + 2)
    tstart = ctypes.c_int(0)
    pstart = ctypes.c_int(0)
    ret = lib.t4_local_alignment(
        t.encode(), len(t), p.encode(), len(p),
        ctypes.byref(tstart), ctypes.byref(pstart), buf, ctypes.byref(ln),
    )
    return int(ret), tstart.value, pstart.value, list(buf[: ln.value])


def is_mate_overlap(
    fr: str, sr: str, min_overlap: int, check_tandem: bool = True
) -> Tuple[int, int, int]:
    lib = _LIB
    offset = ctypes.c_int(-1)
    best = ctypes.c_int(-1)
    ret = lib.t4_is_mate_overlap(
        fr.encode(), len(fr), sr.encode(), len(sr), min_overlap,
        1 if check_tandem else 0,
        ctypes.byref(offset), ctypes.byref(best),
    )
    return int(ret), offset.value, best.value


def format_pw_block(w: "np.ndarray") -> Optional[str]:
    """Format a (L,4) int32 posWeight array as the 4 output lines of the
    _raw/_final writer ("v v ... v \n" each); None if unavailable."""
    lib = _LIB
    if lib is None:
        return None
    w = np.ascontiguousarray(w, dtype=np.int32)
    length = w.shape[0]
    cap = 48 * length + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.t4_fmt_pw_block(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), length, buf, cap
    )
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")


def format_pw_compressed(consensus: str, flat: "np.ndarray") -> Optional[str]:
    """Decompress the run-length posWeight (SeqSet.hpp:2484-2509) and format
    the 4 writer lines in one native call; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(flat.reshape(-1), dtype=np.int32)
    length = len(consensus)
    cap = 48 * length + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.t4_fmt_pw_compressed(
        consensus.encode("ascii"), length,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(flat),
        buf, cap,
    )
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")


def format_pw_onehot(consensus: str, num_read: int) -> Optional[str]:
    """posWeight-free writer lines: num_read in the consensus base's slot,
    0 elsewhere; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    length = len(consensus)
    cap = (len(str(num_read)) + 2) * 4 * (length + 1) + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.t4_fmt_pw_onehot(
        consensus.encode("ascii"), length, num_read, buf, cap
    )
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")


def parse_final_out(data: bytes):
    """Parse a whole _final.out in one native call.  Returns
    (rec_meta (n,4) i64 {header_off, header_len, seq_off, seq_len},
     row_cnt (n,4) i32, counts flat i32) or None (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    # Upper bounds: every record needs >= 6 newlines; ints are >= 2 bytes
    # each ("v ").
    rec_cap = max(1, data.count(b">"))
    counts_cap = max(16, len(data) // 2 + 4)
    rec_meta = np.empty((rec_cap, 4), dtype=np.int64)
    row_cnt = np.empty((rec_cap, 4), dtype=np.int32)
    counts = np.empty(counts_cap, dtype=np.int32)
    n = lib.t4_parse_final_out(
        data, len(data),
        rec_meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), rec_cap,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), counts_cap,
        row_cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n < 0:
        return None
    return rec_meta[:n], row_cnt[:n], counts


def parse_assembled_fa(data: bytes):
    """Parse a whole _assembled_reads.fa in one native call
    (t4_parse_assembled_fa).  Returns (rec (n,6) i64 {id_off, id_len,
    seq_off, seq_len, bc_off, bc_len}, ivals (n,2) i32 {strand, umi})
    or None (caller falls back to the Python tokenizer)."""
    lib = _load()
    if lib is None:
        return None
    rec_cap = max(1, data.count(b">"))
    rec = np.empty((rec_cap, 6), dtype=np.int64)
    ivals = np.empty((rec_cap, 2), dtype=np.int32)
    n = lib.t4_parse_assembled_fa(
        data, len(data),
        rec.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ivals.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), rec_cap,
    )
    if n < 0:
        return None
    return rec[:n], ivals[:n]


def parse_i32(line: str) -> Optional["np.ndarray"]:
    """Parse a whitespace-separated int row into int32 (the annotator's
    _final.out posWeight loader); None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    b = line.encode("ascii")
    cap = len(b) // 2 + 2
    out = np.empty(cap, dtype=np.int32)
    n = lib.t4_parse_i32(
        b, len(b), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap
    )
    if n < 0:
        return None
    return out[:n]
