"""2-bit packed k-mer codes, vectorized.

Reference semantics (KmerCode.hpp): a rolling window packs bases into a
uint64 with the *first* base in the high bits (Append shifts left).  A window
is invalid while it covers any N.  Non-ACGT letters encode via
``nucToNum & 3`` (so unknown letters alias, but inputs are sanitized to
ACGTN upstream, exactly as the reference does).  The canonical code is
min(code, revcomp_code).

The vectorized builders return, for a whole sequence, the array of window
codes plus a validity mask — the batched form consumed by both the host
index and the TPU probe kernels.
"""

from __future__ import annotations

import numpy as np

from trust4_tpu.dna import NUC2NUM_256

_U64 = np.uint64


def kmer_codes(seq: str, k: int):
    """All k-mer window codes of ``seq``.

    Returns (codes, valid): codes is a (L-k+1,) uint64 array of forward-strand
    codes; valid marks windows free of N.  Empty arrays when len(seq) < k.
    """
    b = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    return kmer_codes_from_bytes(b, k)


def kmer_codes_from_bytes(b: np.ndarray, k: int):
    n = len(b) - k + 1
    if n <= 0:
        return np.empty(0, dtype=_U64), np.empty(0, dtype=bool)
    vals = (NUC2NUM_256[b].astype(np.int64) & 3).astype(_U64)
    is_n = b == ord("N")
    # Sliding-window pack via cumulative polynomial trick:
    # code[i] = sum_{j<k} vals[i+j] << 2*(k-1-j).
    codes = np.zeros(n, dtype=_U64)
    for j in range(k):
        codes |= vals[j : j + n] << _U64(2 * (k - 1 - j))
    # valid[i] = no N in window i
    if is_n.any():
        csum = np.concatenate([[0], np.cumsum(is_n)])
        valid = (csum[k:] - csum[:-k]) == 0
    else:
        valid = np.ones(n, dtype=bool)
    return codes, valid


def revcomp_code(code: int, k: int) -> int:
    """Reverse-complement of a packed code (KmerCode.hpp:69-81)."""
    code = int(code)
    cr = 0
    for i in range(k):
        cr = (cr << 2) | (3 - ((code >> (2 * i)) & 3))
    return cr


def revcomp_codes(codes: np.ndarray, k: int) -> np.ndarray:
    """Vectorized reverse-complement of packed codes."""
    c = codes.astype(_U64)
    out = np.zeros_like(c)
    for i in range(k):
        out = (out << _U64(2)) | (_U64(3) - ((c >> _U64(2 * i)) & _U64(3)))
    return out


def canonical_codes(codes: np.ndarray, k: int) -> np.ndarray:
    """Canonical (min of fwd/rc) codes, vectorized (KmerCode.hpp:54-67)."""
    rc = revcomp_codes(codes, k)
    return np.minimum(codes.astype(_U64), rc)


def code_to_seq(code: int, k: int) -> str:
    from trust4_tpu.dna import NUM_TO_NUC

    out = []
    for i in range(k - 1, -1, -1):
        out.append(NUM_TO_NUC[(int(code) >> (2 * i)) & 3])
    return "".join(out)
