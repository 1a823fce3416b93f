"""TPU candidate-read prefilters for extraction.

The reference tests every read against the V/D/J/C k-mer index one k-mer at
a time on the CPU (SeqSet.hpp:3144-3327, HasHitInSet; FastqExtractor.cpp:129).
Two conservative device formulations are provided (both are strict
supersets of the exact filter, so the candidate set stays bit-identical
after the exact host pass on survivors):

* ``prefilter_kernel``: dense 4^k membership gather + k-window coverage
  reduction — the cheapest sweep, used as the scaling/demo unit;
* ``seq_count_prefilter_kernel``: fixed-width postings gather + the
  reference's own diagonal-cluster rule (hits grouped per (strand, seq)
  by sorted diffs with adjacent gaps <= radius, SeqSet.hpp:889-919) —
  the longest cluster bounds any exact chain from above.

**Selectivity finding** (measured, see VALIDATION.md): at k=9 the
350kb germline DB populates ~29% of the code space and its gene families
share most k-mers, so random 100-mers genuinely accumulate 3+ clustered
hits per seq — NO counting/cluster prescreen short of the full
LIS+coverage computation rejects bulk-RNA-seq negatives at the default
hitLen=23 (the reference itself runs the full filter on every read for
the same reason).  The cluster kernel becomes selective once the
required chain length grows: at long-read thresholds (hitLen>=50,
n_min>=7) random reads are rejected at >99%.  The shipping bulk
extraction therefore uses the native exact filter
(pipeline/extract_native.py); ``--tpuPrefilter`` applies the cluster
kernel first, which is profitable for long-read/high-threshold data.
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


def build_posting_tables(seqs: List[str], k: int, pmax: int = 16):
    """Fixed-width postings layout for the device per-seq-count filter.

    For every 4^k code: up to ``pmax`` postings packed as
    ``seq_id * 2**16 + (offset + 1)`` (0 = empty) plus an overflow flag
    for codes with more postings (handled as conservative wildcards).
    A second table with the same layout is indexed by the
    reverse-complement code, serving the RC-strand scan.
    """
    size = 1 << (2 * k)
    post = np.zeros((size, pmax), dtype=np.int32)
    fill = np.zeros(size, dtype=np.int32)
    overflow = np.zeros(size, dtype=bool)
    for sid, s in enumerate(seqs):
        if len(s) < k:
            continue
        codes, valid = kmer_codes(s, k)
        for w in range(len(codes)):
            if not valid[w]:
                continue
            c = int(codes[w])
            n = fill[c]
            if n < pmax:
                post[c, n] = sid * 65536 + (w + 1)
                fill[c] = n + 1
            else:
                overflow[c] = True

    # rc view: rc_post[c] = post[revcomp(c)]
    codes = np.arange(size, dtype=np.uint64)
    rc = np.zeros(size, dtype=np.uint64)
    for i in range(k):
        base = (codes >> np.uint64(2 * i)) & np.uint64(3)
        rc |= (np.uint64(3) - base) << np.uint64(2 * (k - 1 - i))
    rc_post = post[rc]
    rc_overflow = overflow[rc]
    return post, overflow, rc_post, rc_overflow


@functools.partial(
    jax.jit, static_argnames=("hit_len_required", "k", "radius")
)
def seq_count_prefilter_kernel(
    codes: jnp.ndarray,        # (B, W) int32 window codes
    valid: jnp.ndarray,        # (B, W) bool
    post: jnp.ndarray,         # (4^k, PMAX) int32 packed postings
    overflow: jnp.ndarray,     # (4^k,) bool
    rc_post: jnp.ndarray,
    rc_overflow: jnp.ndarray,
    k: int,
    hit_len_required: int,
    radius: int = 10,
) -> jnp.ndarray:
    """Per-read candidate mask via the reference's own diagonal-cluster
    rule: HasHitInSet chains live inside one (strand, seq) group of hits
    whose diffs (readOffset - seqOffset), sorted, have adjacent gaps
    <= radius (SeqSet.hpp:889-919).  The device test finds the longest
    such run per read; any exact chain is a sub-run, so
    maxrun >= n_min is a strict superset of the exact filter.
    Overflow-code windows count as wildcards toward every group."""
    # Minimum hits any passing chain must contain: n hits cover at most
    # (n-1)*(k-1) + k read positions (runs break beyond k-1 spacing), so
    # coverage >= hitLen forces n >= (hitLen-k)/(k-1) + 1.
    if hit_len_required <= k:
        need = 1
    else:
        need = -(-(hit_len_required - k) // (k - 1)) + 1

    w_idx = jnp.arange(codes.shape[1], dtype=jnp.int32)[None, :, None]

    def strand_max_run(tbl, ovf):
        entries = tbl[codes]                       # (B, W, PMAX)
        live = (entries > 0) & valid[:, :, None]
        seqs = entries >> 16
        offs = (entries & 0xFFFF) - 1
        diff = w_idx - offs + 2048                 # keep positive
        key = seqs * jnp.int32(1 << 13) + diff     # diff < 8192
        key = jnp.where(live, key, jnp.int32(1 << 30))
        b, w, p = key.shape
        flat = jnp.sort(key.reshape(b, w * p), axis=1)
        fseq = flat >> 13
        fdiff = flat & (jnp.int32(1 << 13) - 1)
        prev_seq = jnp.concatenate(
            [jnp.full((b, 1), -1, fseq.dtype), fseq[:, :-1]], axis=1
        )
        prev_diff = jnp.concatenate(
            [jnp.full((b, 1), -(1 << 12), fdiff.dtype), fdiff[:, :-1]],
            axis=1,
        )
        start = (fseq != prev_seq) | (fdiff - prev_diff > radius)
        idx = jnp.arange(w * p, dtype=jnp.int32)[None, :]
        last_start = jax.lax.cummax(jnp.where(start, idx, -1), axis=1)
        runlen = idx - last_start + 1
        runlen = jnp.where(flat < (1 << 30), runlen, 0)
        wild = jnp.sum((ovf[codes] & valid).astype(jnp.int32), axis=1)
        return jnp.max(runlen, axis=1) + wild

    best = jnp.maximum(
        strand_max_run(post, overflow), strand_max_run(rc_post, rc_overflow)
    )
    return best >= need


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
    """Stateful wrapper: build tables once, stream read batches.

    Uses the diagonal-cluster kernel (tighter of the two conservative
    formulations; see module docstring)."""

    def __init__(self, ref_seqs: List[str], k: int = 9, hit_len_required: int = 27,
                 radius: int = 10):
        self.k = k
        self.hit_len_required = hit_len_required
        self.radius = radius
        post, ovf, rc_post, rc_ovf = build_posting_tables(ref_seqs, k)
        self.post = jnp.asarray(post)
        self.overflow = jnp.asarray(ovf)
        self.rc_post = jnp.asarray(rc_post)
        self.rc_overflow = jnp.asarray(rc_ovf)

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
        mask = seq_count_prefilter_kernel(
            jnp.asarray(codes),
            jnp.asarray(valid),
            self.post,
            self.overflow,
            self.rc_post,
            self.rc_overflow,
            self.k,
            self.hit_len_required,
            self.radius,
        )
        return np.asarray(mask)[:n]
