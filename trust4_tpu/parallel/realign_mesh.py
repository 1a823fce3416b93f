"""Mesh-sharded read-realignment round: the pipeline's batched
read-vs-contig matching as one SPMD program.

This is the multi-chip form of the pipeline's dense realignment sweeps —
the annotator's AssignRead pass over every assembled read (reference:
Annotator.cpp:813-854, SeqSet.hpp:4632-4701) and the batch-match phase of
round-based assembly (SURVEY.md §7.1): every read is k-mer-matched and
then banded-DP-scored against the current contig set, and accepted reads'
bases accumulate into the per-contig posWeight coverage tensor.

Sharding layout (SURVEY.md §2.8 TPU-native equivalents):
  - reads shard over the data axis ``dp``;
  - contigs (k-mer position tables, code tensors, posWeight) shard over
    the model axis ``mp``;
  - the germline membership tables for the candidate prefilter are
    replicated;
  - collectives: per-read best-contig selection max-reduces (score,
    contig) pairs over ``mp``; the posWeight coverage tensor and the
    candidate count psum over ``dp``.

Everything is integer arithmetic, so results are bit-identical for every
mesh shape — tests/test_multichip.py asserts (1,1) == (4,1) == (2,2) ==
(4,2), and __graft_entry__.dryrun_multichip runs the round on the real
bundled-example reads and contigs.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

from trust4_tpu.ops.prefilter import build_membership_tables, encode_reads

_NEG = -(1 << 30)


def build_contig_position_tables(
    contigs: List[str], k: int, pad_to: int
) -> np.ndarray:
    """(C, 4^k) int32 first-occurrence position of each k-mer per contig
    (-1 = absent).  The device-side replacement for KmerIndex postings over
    the (small, per-round-static) contig set."""
    from trust4_tpu.ops.kmer import kmer_codes

    size = 1 << (2 * k)
    tables = np.full((pad_to, size), -1, dtype=np.int32)
    for c, s in enumerate(contigs):
        if len(s) < k:
            continue
        codes, valid = kmer_codes(s, k)
        # first occurrence wins: write backwards
        for w in range(len(codes) - 1, -1, -1):
            if valid[w]:
                tables[c, codes[w]] = w
    return tables


def encode_contigs(contigs: List[str], pad_to: int,
                   max_len: int) -> Tuple[np.ndarray, np.ndarray]:
    from trust4_tpu.ops.dp_batch import encode_for_dp

    codes, lens = encode_for_dp(list(contigs), max_len)
    out_c = np.full((pad_to, max_len), 5, dtype=codes.dtype)
    out_l = np.zeros(pad_to, dtype=np.int32)
    out_c[: len(contigs)] = codes
    out_l[: len(contigs)] = lens
    return out_c, out_l


def _round_body(read_codes, read_valid, read_dp, read_len, fwd_tab, rc_tab,
                ctg_pos, ctg_codes, ctg_lens, ctg_base, *, k, hit_len,
                window, band, axis_dp, axis_mp):
    """Per-shard body (runs under shard_map).  Shapes: reads are the local
    ``dp`` shard, contigs the local ``mp`` shard."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from trust4_tpu.ops.dp_batch import banded_affine_scores
    from trust4_tpu.ops.prefilter import prefilter_kernel

    b = read_codes.shape[0]
    c_local = ctg_pos.shape[0]

    # 1. candidate prefilter against the replicated germline tables
    #    (extraction analog; ops/prefilter.py).
    cand = prefilter_kernel(read_codes, read_valid, fwd_tab, rc_tab, k,
                            hit_len)

    # 2. k-mer hit counting + diagonal estimate against each local contig.
    #    pos: (c_local, b, W) first-occurrence positions.
    pos = ctg_pos[:, read_codes]  # gather over the code axis
    hit = (pos >= 0) & read_valid[None, :, :]
    hits_cnt = jnp.sum(hit, axis=2)  # (c_local, b)
    widx = jnp.arange(read_codes.shape[1], dtype=jnp.int32)[None, None, :]
    diag = jnp.where(hit, pos - widx, 1 << 30)
    offset = jnp.clip(jnp.min(diag, axis=2), 0, None)  # (c_local, b)

    # Global best contig per read by (hit count, lower global id) —
    # selected BEFORE the DP via a cross-``mp`` max of packed int32 keys,
    # so the choice is identical for every mesh shape (shard-invariance).
    ctg_ids = (
        lax.axis_index(axis_mp) * c_local
        + jnp.arange(c_local, dtype=jnp.int32)
    )[:, None]
    alive = (ctg_lens > 0)[:, None]
    # hits < 2^14 (bounded by read windows), ids < 2^16.
    key = jnp.where(alive, hits_cnt, -1) * (1 << 16) + (
        (1 << 16) - 1 - ctg_ids
    )
    best_local = jnp.argmax(key, axis=0)  # (b,)
    take = lambda a: jnp.take_along_axis(a, best_local[None, :], axis=0)[0]
    my_key = take(key)
    g_key = lax.pmax(my_key, axis_mp)
    i_own = my_key == g_key  # this shard holds the global winner
    best_hits = take(hits_cnt)
    best_off = take(offset)
    best_id = jnp.take(ctg_ids[:, 0], best_local)

    # 3. banded DP of each read against its best local contig's window
    #    (the real kernel the pipeline ships; ops/dp_batch.py).
    w_idx = best_off[:, None] + jnp.arange(window, dtype=jnp.int32)[None, :]
    sel_codes = ctg_codes[best_local]  # (b, Lc)
    w_idx_c = jnp.clip(w_idx, 0, ctg_codes.shape[1] - 1)
    win_codes = jnp.take_along_axis(sel_codes, w_idx_c, axis=1)
    sel_len = jnp.take(ctg_lens, best_local)
    win_len = jnp.clip(sel_len - best_off, 0, window)
    pad_mask = jnp.arange(window)[None, :] < win_len[:, None]
    win_codes = jnp.where(pad_mask, win_codes, 5).astype(jnp.int8)
    ok = (
        i_own & (best_hits > 0) & cand
        & (jnp.abs(win_len - read_len) + 11 <= band)
    )
    scores = banded_affine_scores(
        win_codes, jnp.where(ok, win_len, 0).astype(jnp.int32),
        read_dp, jnp.where(ok, read_len, 0).astype(jnp.int32), band,
    )
    scores = jnp.where(ok, scores, _NEG)

    # 4. only the winner shard's DP survives; share score + id over ``mp``.
    g_score = lax.pmax(scores, axis_mp)
    g_id = lax.pmax(jnp.where(ok, best_id, -1), axis_mp)

    # 5. posWeight accumulation for reads won by a local contig, psum over
    #    the read axis (the coverage-merge collective of SURVEY §2.8).
    win_here = ok & (scores > _NEG)
    base_idx = jnp.clip(read_dp.astype(jnp.int32), 0, 3)  # (b, L)
    l_pos = best_off[:, None] + jnp.arange(read_dp.shape[1],
                                           dtype=jnp.int32)[None, :]
    valid_pos = (
        win_here[:, None]
        & (jnp.arange(read_dp.shape[1])[None, :] < read_len[:, None])
        & (l_pos < ctg_codes.shape[1])
        & (read_dp.astype(jnp.int32) < 4)[:, :]
    )
    pw = jnp.zeros((c_local, ctg_codes.shape[1], 4), jnp.int32)
    pw = pw.at[
        best_local[:, None], jnp.clip(l_pos, 0, ctg_codes.shape[1] - 1),
        base_idx,
    ].add(valid_pos.astype(jnp.int32))
    pw = lax.psum(pw, axis_dp)
    n_cand = lax.psum(jnp.sum(cand.astype(jnp.int32)), axis_dp)

    return cand, g_score, g_id, pw, n_cand[None]


def sharded_realign_round(mesh, reads: List[str], contigs: List[str],
                          germline: List[str], *, k: int = 9,
                          hit_len: int = 17, band: int = 32):
    """Run one batched realign round of ``reads`` against ``contigs`` over
    ``mesh`` (axes ("dp", "mp")).  Returns host numpy
    (cand_mask (B,), scores (B,), contig_ids (B,), posWeight (C, L, 4),
    n_candidates) — bit-identical for every mesh shape."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from trust4_tpu.ops.dp_batch import encode_for_dp

    n_dp = mesh.shape["dp"]
    n_mp = mesh.shape["mp"]

    def rup(x, m):
        return ((x + m - 1) // m) * m

    B = rup(max(len(reads), 1), n_dp)
    C = rup(max(len(contigs), 1), n_mp)
    reads = list(reads) + [""] * (B - len(reads))
    max_rd = max((len(r) for r in reads), default=1)
    max_rd = max(max_rd, k)
    W = max_rd - k + 1

    codes, valid = encode_reads(reads, k, W)
    read_dp, read_len = encode_for_dp(reads, max_rd)
    fwd, rc = build_membership_tables(germline, k)
    Lc = rup(max(max((len(c) for c in contigs), default=1), max_rd), 8)
    ctg_pos = build_contig_position_tables(contigs, k, C)
    ctg_codes, ctg_lens = encode_contigs(contigs, C, Lc)
    ctg_base = None  # reserved

    window = max_rd + 16

    shard = functools.partial(
        _round_body, k=k, hit_len=hit_len, window=window, band=band,
        axis_dp="dp", axis_mp="mp",
    )
    spec_r = P("dp", None)
    spec_r1 = P("dp")
    spec_c = P("mp", None)
    spec_c1 = P("mp")
    fn = shard_map(
        shard, mesh=mesh,
        in_specs=(spec_r, spec_r, spec_r, spec_r1, P(), P(),
                  spec_c, spec_c, spec_c1, P()),
        out_specs=(spec_r1, spec_r1, spec_r1, spec_c, P()),
    )
    put = lambda a, s: jax.device_put(jnp.asarray(a), NamedSharding(mesh, s))
    args = (
        put(codes, spec_r), put(valid, spec_r), put(read_dp, spec_r),
        put(read_len.astype(np.int32), spec_r1), put(fwd, P()), put(rc, P()),
        put(ctg_pos, spec_c), put(ctg_codes, spec_c), put(ctg_lens, spec_c1),
        jnp.zeros((1,), jnp.int32),
    )
    cand, scores, ids, pw, n_cand = jax.jit(fn)(*args)
    return (
        np.asarray(cand), np.asarray(scores), np.asarray(ids),
        np.asarray(pw), int(np.asarray(n_cand)[0]),
    )


class MeshRealigner:
    """Convenience wrapper holding the mesh for repeated rounds."""

    def __init__(self, mesh):
        self.mesh = mesh

    def round(self, reads, contigs, germline, **kw):
        return sharded_realign_round(self.mesh, reads, contigs, germline,
                                     **kw)
