"""Vectorized read encoding for the TPU pipeline.

Batch counterpart of the per-read rolling KmerCode (reference:
KmerCode.hpp:45-130): equal-length (or padded) reads are packed into a
(B, L) base-code matrix and window codes are produced with a strided
polynomial sum — all numpy, no per-read Python loops.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from trust4_tpu.dna import NUC2NUM_256


def pack_reads(reads: List[str], pad_len: int) -> np.ndarray:
    """Reads -> (B, pad_len) uint8 ASCII matrix, padded with 'N'."""
    batch = len(reads)
    buf = np.full((batch, pad_len), ord("N"), dtype=np.uint8)
    for i, r in enumerate(reads):
        b = np.frombuffer(r.encode("ascii"), dtype=np.uint8)[:pad_len]
        buf[i, : len(b)] = b
    return buf


def window_codes_batch(ascii_mat: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """(B, L) ASCII -> (B, L-k+1) int32 window codes + validity.

    N (and padding) packs as base 0 with valid=False, matching the rolling
    encoder's semantics.
    """
    base = NUC2NUM_256[ascii_mat]
    # N packs as base 0 in the lookup table (reference quirk); invalidity is
    # keyed off the character itself, like KmerCode's invalidPos.
    is_n = (base < 0) | (ascii_mat == ord("N"))
    vals = np.where(base < 0, 0, base).astype(np.int64)
    B, L = vals.shape
    W = L - k + 1
    codes = np.zeros((B, W), dtype=np.int64)
    bad = np.zeros((B, W), dtype=bool)
    for i in range(k):
        codes = (codes << 2) | vals[:, i : i + W]
        bad |= is_n[:, i : i + W]
    return codes.astype(np.int32), ~bad
