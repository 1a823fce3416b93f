"""TPU candidate-read prefilter: the extraction hot path.

The reference tests every read against the V/D/J/C k-mer index one k-mer at
a time on the CPU (SeqSet.hpp:3144-3327, HasHitInSet; FastqExtractor.cpp:129).
On TPU we restructure this as a dense, batched membership sweep:

* the germline DB (620 seqs, ~350kb) fits a full 4^k membership table for
  k=9 (256K entries, uint8) — replicated per chip;
* reads are 2-bit packed into fixed-shape (B, L) code tensors;
* one gather per position per strand gives hit masks; a k-wide dilation and
  row-sum produce each read's total hit coverage per strand — a conservative
  upper bound on any single-(seq,strand) chain the exact filter could find.

Reads whose coverage is below hitLenRequired can never pass the exact filter,
so the TPU pass rejects the overwhelming majority (non-receptor reads) at
HBM bandwidth, and only survivors run the exact host filter for bit-identical
candidate sets.  No false negatives: coverage over all seqs/offsets is >= the
per-seq chained hit length used by HasHitInSet.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from trust4_tpu.dna import NUC2NUM_256
from trust4_tpu.ops.kmer import kmer_codes
from trust4_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()


def build_membership_tables(seqs: List[str], k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Forward and reverse-complement membership tables over the 4^k code
    space (host-side, one-time; the DB is static)."""
    size = 1 << (2 * k)
    fwd = np.zeros(size, dtype=np.uint8)
    for s in seqs:
        if len(s) < k:
            continue
        codes, valid = kmer_codes(s, k)
        fwd[codes[valid]] = 1

    # rc table: rc_exists[c] = fwd[revcomp(c)].  Vectorized bit shuffle.
    codes = np.arange(size, dtype=np.uint64)
    rc = np.zeros(size, dtype=np.uint64)
    for i in range(k):
        base = (codes >> np.uint64(2 * i)) & np.uint64(3)
        rc |= (np.uint64(3) - base) << np.uint64(2 * (k - 1 - i))
    rc_exists = fwd[rc]
    return fwd, rc_exists


def encode_reads(reads: List[str], k: int, pad_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pack reads into (B, pad_len) window-code + validity arrays.

    Window w of a read covers read[w:w+k]; invalid (N-containing or padded)
    windows get valid=0.
    """
    batch = len(reads)
    codes = np.zeros((batch, pad_len), dtype=np.int32)
    valid = np.zeros((batch, pad_len), dtype=bool)
    for i, r in enumerate(reads):
        if len(r) < k:
            continue
        c, v = kmer_codes(r, k)
        n = min(len(c), pad_len)
        codes[i, :n] = c[:n].astype(np.int64) & 0x7FFFFFFF
        valid[i, :n] = v[:n]
    return codes, valid


@functools.partial(jax.jit, static_argnames=("k", "hit_len_required"))
def prefilter_kernel(
    codes: jnp.ndarray,      # (B, W) int32 window codes
    valid: jnp.ndarray,      # (B, W) bool
    fwd_table: jnp.ndarray,  # (4^k,) uint8
    rc_table: jnp.ndarray,   # (4^k,) uint8
    k: int,
    hit_len_required: int,
) -> jnp.ndarray:
    """Per-read candidate mask: True when either strand's total hit coverage
    reaches hit_len_required (conservative superset of the exact filter)."""
    fwd_hit = fwd_table[codes].astype(jnp.bool_) & valid
    rc_hit = rc_table[codes].astype(jnp.bool_) & valid

    def total_cover(hits):
        # covered read positions = positions p s.t. exists hit window w with
        # w <= p <= w+k-1.  Compute via running max over the last k windows.
        x = hits.astype(jnp.int32)
        csum = jnp.cumsum(x, axis=1)
        zeros = jnp.zeros((x.shape[0], 1), dtype=jnp.int32)
        csum_pad = jnp.concatenate([zeros, csum], axis=1)  # (B, W+1)
        W = x.shape[1]
        # count of hit windows in [p-k+1, p] for position p in [0, W+k-1)
        P = W + k - 1
        hi = jnp.minimum(jnp.arange(P) + 1, W)
        lo = jnp.maximum(jnp.arange(P) - k + 1, 0)
        cnt = csum_pad[:, hi] - csum_pad[:, lo]
        return jnp.sum(cnt > 0, axis=1)

    fwd_cov = total_cover(fwd_hit)
    rc_cov = total_cover(rc_hit)
    return jnp.maximum(fwd_cov, rc_cov) >= hit_len_required


class NumpyPrefilter:
    """Host fallback of the same conservative membership sweep (no device,
    no transfer latency).  Used by default in extraction so the exact
    per-read filter only runs on the ~1% of reads that might be candidates;
    the candidate set stays bit-identical (superset property as above)."""

    def __init__(self, ref_seqs: List[str], k: int = 9, hit_len_required: int = 27):
        self.k = k
        self.hit_len_required = hit_len_required
        self.fwd_table, self.rc_table = build_membership_tables(ref_seqs, k)

    def __call__(self, reads: List[str], pad_len: int = 512, fixed_batch: int = 0) -> np.ndarray:
        from trust4_tpu.ops.encode import pack_reads, window_codes_batch

        k = self.k
        mat = pack_reads(reads, max(pad_len, k))
        codes, valid = window_codes_batch(mat, k)
        fwd_hit = (self.fwd_table[codes] != 0) & valid
        rc_hit = (self.rc_table[codes] != 0) & valid

        def total_cover(hits):
            x = hits.astype(np.int32)
            csum = np.cumsum(x, axis=1)
            csum_pad = np.concatenate(
                [np.zeros((x.shape[0], 1), np.int32), csum], axis=1
            )
            W = x.shape[1]
            P = W + k - 1
            hi = np.minimum(np.arange(P) + 1, W)
            lo = np.maximum(np.arange(P) - k + 1, 0)
            cnt = csum_pad[:, hi] - csum_pad[:, lo]
            return np.sum(cnt > 0, axis=1)

        cov = np.maximum(total_cover(fwd_hit), total_cover(rc_hit))
        return cov >= self.hit_len_required


class TpuPrefilter:
    """Stateful wrapper: build tables once, stream read batches."""

    def __init__(self, ref_seqs: List[str], k: int = 9, hit_len_required: int = 27):
        self.k = k
        self.hit_len_required = hit_len_required
        fwd, rc = build_membership_tables(ref_seqs, k)
        self.fwd_table = jnp.asarray(fwd)
        self.rc_table = jnp.asarray(rc)

    def __call__(
        self, reads: List[str], pad_len: int = 512, fixed_batch: int = 0
    ) -> np.ndarray:
        from trust4_tpu.ops.encode import pack_reads, window_codes_batch

        # Stable padded shapes: one compile per (batch, width) pair.  Device
        # compiles are expensive (and enormous over the axon tunnel), so the
        # caller should keep batch sizes constant; short final batches are
        # padded up.
        n = len(reads)
        pad_len = max(64, 1 << (pad_len - 1).bit_length())
        if fixed_batch and n < fixed_batch:
            reads = list(reads) + [""] * (fixed_batch - n)
        mat = pack_reads(reads, pad_len)
        codes, valid = window_codes_batch(mat, self.k)
        mask = prefilter_kernel(
            jnp.asarray(codes),
            jnp.asarray(valid),
            self.fwd_table,
            self.rc_table,
            self.k,
            self.hit_len_required,
        )
        return np.asarray(mask)[:n]
