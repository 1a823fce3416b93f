#!/usr/bin/env python
"""Kernel lab: experiments toward >=4 G cells/s on the banded-DP kernel.

ROUND-5 CLOSURE: `base` (the shipping kernel, device-resident inputs,
materialization-first) measures **57-60 G cells/s** (5.5 ms/launch at
N=65536 L=150 W=32) — round 4's "2.0 G truthful sustained" was the
since-removed take_along_axis host-shim gather, not the VPU.  The
kernel is ~0.02 cycles/cell, BEYOND the round-4 issue-bound estimate,
so the G-way interleave candidates below are moot (inter2/inter4 also
crash the Mosaic vector-layout pass on strided lane slices:
`Check failed: limits[i] <= dim(i)` in ApplyVectorLayoutPass).  All
remaining launch cost is the tunnel (tools/tunnel_probe.py: ~29 ms per
transfer + ~22 MB/s h2d) — addressed by the v2 fused launch protocol
in ops/gap_server.py, not by kernel work.

Usage: python tools/dp_kernel_lab.py [base|inter2|inter4|...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from trust4_tpu.utils.axonboot import ensure_registered

ensure_registered()

import jax
import jax.numpy as jnp
import jax.lax as lax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trust4_tpu.ops.dp_batch import (
    SCORE_GAPEXTEND,
    SCORE_GAPOPEN,
    SCORE_MATCH,
    SCORE_MISMATCH,
    _CODE_N,
    _CODE_PAD,
)
from trust4_tpu.ops.dp_pallas import banded_affine_scores_pallas, _SENT32, _BIG_NEG

LANES = 128


def _dp_kernel_inter(ts_ref, ps_ref, meta_ref, out_ref, m_ref, e_ref, *, w,
                     p_max, groups, scan_span, uniform_p, jz_blocks):
    """G-way interleaved row loop.  Layout: every ref carries G groups of
    128 lanes side by side; each group is an independent (w, 128) band
    tile.  Each recurrence step is emitted for all groups before the next
    step, so the instruction stream alternates between G independent
    dependency chains."""
    G = groups
    t_len = meta_ref[0, :]
    p_len = meta_ref[1, :]
    left = meta_ref[2, :]
    right = meta_ref[3, :]

    k_col = lax.broadcasted_iota(jnp.int32, (w, LANES * G), 0)
    sent = jnp.int32(_SENT32)
    big_neg = jnp.int32(_BIG_NEG)
    go = jnp.int32(SCORE_GAPOPEN)
    ge = jnp.int32(SCORE_GAPEXTEND)
    t_len_b = t_len[None, :]
    p_len_b = p_len[None, :]
    kge = k_col * jnp.int32(-SCORE_GAPEXTEND)
    k_in_right = k_col <= (left + right)[None, :]
    j0 = k_col - left[None, :]

    m0 = jnp.where(j0 == 0, 0, go + j0 * go)
    e0 = jnp.where(j0 == 0, 0, go + (p_len_b + 1) * go)
    in_t0 = (j0 >= 0) & (j0 <= t_len_b)
    m_ref[:] = jnp.where(in_t0, m0, sent).astype(jnp.int32)
    e_ref[:] = jnp.where(in_t0, e0, sent).astype(jnp.int32)

    def gsl(x, g):  # lane slice of group g
        return x[:, g * LANES:(g + 1) * LANES]

    def shift_up(x):
        return jnp.concatenate(
            [x[1:, :], jnp.full((1, LANES), sent, jnp.int32)], axis=0
        )

    n_blk = (p_max + 7) // 8
    go_ge = jnp.int32(SCORE_GAPOPEN + SCORE_GAPEXTEND)

    kge_g = [gsl(kge, g) for g in range(G)]
    kir_g = [gsl(k_in_right, g) for g in range(G)]
    plb_g = [gsl(p_len_b, g) for g in range(G)]

    def make_blk_body(with_jz):
        def blk_body(b, j_rows):
            base8 = b * 8
            ts_chunk = ts_ref[pl.ds(base8, w + 8), :]
            ps_chunk = ps_ref[pl.ds(base8, 8), :]
            ts_g = [gsl(ts_chunk, g) for g in range(G)]
            ps_g = [gsl(ps_chunk, g) for g in range(G)]
            m_cur = [gsl(m_ref[:], g) for g in range(G)]
            e_cur = [gsl(e_ref[:], g) for g in range(G)]
            j_row = [gsl(j_rows, g) for g in range(G)]
            for r in range(8):
                i = base8 + r + 1
                j_row = [jr + 1 for jr in j_row]
                if with_jz:
                    jz = [jr == 0 for jr in j_row]

                tj = [lax.slice_in_dim(ts_g[g], r, r + w, axis=0)
                      for g in range(G)]
                pi = [lax.slice_in_dim(ps_g[g], r, r + 1, axis=0)
                      for g in range(G)]
                eq = [(tj[g] == pi[g]) | (tj[g] == _CODE_N) |
                      (pi[g] == _CODE_N) for g in range(G)]
                sub = [jnp.where(eq[g], SCORE_MATCH,
                                 SCORE_MISMATCH).astype(jnp.int32)
                       for g in range(G)]

                e_new = [shift_up(jnp.maximum(e_cur[g] + ge,
                                              m_cur[g] + go_ge))
                         for g in range(G)]
                diag = [m_cur[g] + sub[g] for g in range(G)]

                bound_m = (go + i * go).astype(jnp.int32)
                base = [jnp.maximum(diag[g], e_new[g]) for g in range(G)]
                if with_jz:
                    base = [jnp.where(jz[g], bound_m, base[g])
                            for g in range(G)]
                base = [jnp.where(kir_g[g], base[g], sent)
                        for g in range(G)]

                if with_jz:
                    run = [jnp.where(jz[g], bound_m, base[g] + go) + kge_g[g]
                           for g in range(G)]
                else:
                    run = [base[g] + go + kge_g[g] for g in range(G)]
                s = 1
                while s < scan_span:
                    shifted = [
                        jnp.concatenate(
                            [jnp.full((s, LANES), sent, jnp.int32),
                             run[g][:-s, :]], axis=0)
                        for g in range(G)
                    ]
                    run = [jnp.maximum(run[g], shifted[g]) for g in range(G)]
                    s *= 2
                f_new = [
                    jnp.concatenate(
                        [jnp.full((1, LANES), sent, jnp.int32),
                         run[g][:-1, :]], axis=0) - kge_g[g]
                    for g in range(G)
                ]

                m_in = [jnp.maximum(base[g], f_new[g]) for g in range(G)]
                if with_jz:
                    m_in = [jnp.where(jz[g], bound_m, m_in[g])
                            for g in range(G)]
                e_in = [jnp.where(kir_g[g], e_new[g], sent)
                        for g in range(G)]

                if uniform_p:
                    m_cur, e_cur = m_in, e_in
                else:
                    in_dp_row = [i <= plb_g[g] for g in range(G)]
                    m_cur = [jnp.where(in_dp_row[g], m_in[g], m_cur[g])
                             for g in range(G)]
                    e_cur = [jnp.where(in_dp_row[g], e_in[g], e_cur[g])
                             for g in range(G)]
            m_ref[:] = jnp.concatenate(m_cur, axis=1)
            e_ref[:] = jnp.concatenate(e_cur, axis=1)
            return jnp.concatenate(j_row, axis=1)
        return blk_body

    nb_jz = min(jz_blocks, n_blk)
    j_carry = j0
    if nb_jz > 0:
        j_carry = lax.fori_loop(0, nb_jz, make_blk_body(True), j_carry)
    if nb_jz < n_blk:
        lax.fori_loop(nb_jz, n_blk, make_blk_body(False), j_carry)

    k_final = (t_len - p_len + left)[None, :]
    best = jnp.max(
        jnp.where(k_col == k_final, m_ref[:], big_neg), axis=0,
        keepdims=True
    )
    out_ref[:] = best


@functools.partial(
    jax.jit,
    static_argnames=("band_width", "groups", "scan_span", "uniform_p",
                     "jz_blocks"),
)
def scores_inter(t_codes, t_lens, p_codes, p_lens, band_width, groups,
                 scan_span, uniform_p, jz_blocks):
    n, t_max = t_codes.shape
    p_max = p_codes.shape[1]
    w = band_width
    G = groups
    blk = LANES * G

    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    left = jnp.where(t_lens < p_lens, 5 + (p_lens - t_lens), 5).astype(jnp.int32)
    right = jnp.where(t_lens > p_lens, 5 + (t_lens - p_lens), 5).astype(jnp.int32)

    n_pad = ((n + blk - 1) // blk) * blk
    pad = n_pad - n

    def padb(x, fill=0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    t_codes = padb(t_codes, _CODE_PAD)
    p_codes = padb(p_codes, _CODE_PAD)
    t_lens_p = padb(t_lens)
    p_lens_p = padb(p_lens)
    left_p = padb(left, 5)
    right_p = padb(right, 5)

    p_max_pad = ((p_max + 7) // 8) * 8
    p_codes = jnp.pad(p_codes, ((0, 0), (0, p_max_pad - p_max)),
                      constant_values=_CODE_PAD)

    t_shift_len = max(t_max, p_max_pad) + w + 8
    x = jnp.arange(t_shift_len, dtype=jnp.int32)[None, :]
    src = x - left_p[:, None]
    valid = (src >= 0) & (src < t_max)
    ts = jnp.where(
        valid,
        jnp.take_along_axis(
            t_codes.astype(jnp.int32), jnp.clip(src, 0, t_max - 1), axis=1
        ),
        _CODE_PAD,
    )

    ts_T = ts.T
    ps_T = p_codes.astype(jnp.int32).T
    meta = jnp.stack(
        [t_lens_p, p_lens_p, left_p, right_p,
         jnp.zeros_like(t_lens_p), jnp.zeros_like(t_lens_p),
         jnp.zeros_like(t_lens_p), jnp.zeros_like(t_lens_p)],
        axis=0,
    )

    grid = (n_pad // blk,)
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        functools.partial(_dp_kernel_inter, w=w, p_max=p_max, groups=G,
                          scan_span=scan_span, uniform_p=uniform_p,
                          jz_blocks=jz_blocks),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_shift_len, blk), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_max_pad, blk), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, blk), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((w, blk), jnp.int32),
            pltpu.VMEM((w, blk), jnp.int32),
        ],
        interpret=interpret,
    )(ts_T, ps_T, meta)
    return out[0, :n]


ABL = set(os.environ.get("DP_ABLATE", "").split(","))


def _dp_kernel_abl(ts_ref, ps_ref, meta_ref, out_ref, m_ref, e_ref, *, w,
                   p_max, lanes, scan_span, uniform_p, jz_blocks):
    """Copy of the shipping _dp_kernel with DP_ABLATE toggles (timing
    only; scores are wrong when pieces are removed)."""
    t_len = meta_ref[0, :]
    p_len = meta_ref[1, :]
    left = meta_ref[2, :]
    right = meta_ref[3, :]

    k_col = lax.broadcasted_iota(jnp.int32, (w, lanes), 0)
    sent = jnp.int32(_SENT32)
    big_neg = jnp.int32(_BIG_NEG)
    go = jnp.int32(SCORE_GAPOPEN)
    ge = jnp.int32(SCORE_GAPEXTEND)
    t_len_b = t_len[None, :]
    p_len_b = p_len[None, :]
    kge = k_col * jnp.int32(-SCORE_GAPEXTEND)
    k_in_right = k_col <= (left + right)[None, :]
    j0 = k_col - left[None, :]

    m0 = jnp.where(j0 == 0, 0, go + j0 * go)
    e0 = jnp.where(j0 == 0, 0, go + (p_len_b + 1) * go)
    in_t0 = (j0 >= 0) & (j0 <= t_len_b)
    m_ref[:] = jnp.where(in_t0, m0, sent).astype(jnp.int32)
    e_ref[:] = jnp.where(in_t0, e0, sent).astype(jnp.int32)

    def shift_up(x):
        if "noshift" in ABL:
            return x
        return jnp.concatenate(
            [x[1:, :], jnp.full((1, lanes), sent, jnp.int32)], axis=0
        )

    n_blk = (p_max + 7) // 8
    go_ge = jnp.int32(SCORE_GAPOPEN + SCORE_GAPEXTEND)

    def make_blk_body(with_jz):
        def blk_body(b, j_row):
            base8 = b * 8
            if "statload" in ABL:
                ts_chunk = ts_ref[pl.ds(0, w + 8), :]
                ps_chunk = ps_ref[pl.ds(0, 8), :]
            else:
                ts_chunk = ts_ref[pl.ds(base8, w + 8), :]
                ps_chunk = ps_ref[pl.ds(base8, 8), :]
            m_cur = m_ref[:]
            e_cur = e_ref[:]
            for r in range(8):
                i = base8 + r + 1
                j_row = j_row + 1
                if with_jz:
                    jz = j_row == 0

                if "notslice" in ABL:
                    tj = lax.slice_in_dim(ts_chunk, 0, w, axis=0)
                    pi = lax.slice_in_dim(ps_chunk, 0, 1, axis=0)
                else:
                    tj = lax.slice_in_dim(ts_chunk, r, r + w, axis=0)
                    pi = lax.slice_in_dim(ps_chunk, r, r + 1, axis=0)
                if "nosub" in ABL:
                    sub = jnp.int32(SCORE_MATCH) + (tj - tj)
                else:
                    eq = (tj == pi) | (tj == _CODE_N) | (pi == _CODE_N)
                    sub = jnp.where(eq, SCORE_MATCH,
                                    SCORE_MISMATCH).astype(jnp.int32)

                e_new = shift_up(jnp.maximum(e_cur + ge, m_cur + go_ge))
                diag = m_cur + sub

                bound_m = (go + i * go).astype(jnp.int32)
                base = jnp.maximum(diag, e_new)
                if with_jz:
                    base = jnp.where(jz, bound_m, base)
                if "nokir" not in ABL:
                    base = jnp.where(k_in_right, base, sent)

                if "noscan" in ABL:
                    f_new = base
                else:
                    if with_jz:
                        run = jnp.where(jz, bound_m, base + go) + kge
                    else:
                        run = base + go + kge
                    s = 1
                    while s < scan_span:
                        shifted = jnp.concatenate(
                            [jnp.full((s, lanes), sent, jnp.int32),
                             run[:-s, :]], axis=0)
                        run = jnp.maximum(run, shifted)
                        s *= 2
                    f_new = (
                        jnp.concatenate(
                            [jnp.full((1, lanes), sent, jnp.int32),
                             run[:-1, :]], axis=0)
                        - kge
                    )

                m_in = jnp.maximum(base, f_new)
                if with_jz:
                    m_in = jnp.where(jz, bound_m, m_in)
                if "nokir" not in ABL:
                    e_in = jnp.where(k_in_right, e_new, sent)
                else:
                    e_in = e_new

                if uniform_p:
                    m_cur, e_cur = m_in, e_in
                else:
                    in_dp_row = i <= p_len_b
                    m_cur = jnp.where(in_dp_row, m_in, m_cur)
                    e_cur = jnp.where(in_dp_row, e_in, e_cur)
            m_ref[:] = m_cur
            e_ref[:] = e_cur
            return j_row
        return blk_body

    nb_jz = 0 if "nojz" in ABL else min(jz_blocks, n_blk)
    j_carry = j0
    if nb_jz > 0:
        j_carry = lax.fori_loop(0, nb_jz, make_blk_body(True), j_carry)
    if nb_jz < n_blk:
        lax.fori_loop(nb_jz, n_blk, make_blk_body(False), j_carry)

    k_final = (t_len - p_len + left)[None, :]
    best = jnp.max(
        jnp.where(k_col == k_final, m_ref[:], big_neg), axis=0,
        keepdims=True
    )
    out_ref[:] = best


@functools.partial(
    jax.jit,
    static_argnames=("band_width", "scan_span", "uniform_p", "jz_blocks"),
)
def scores_abl(t_codes, t_lens, p_codes, p_lens, band_width,
               scan_span, uniform_p, jz_blocks):
    n, t_max = t_codes.shape
    p_max = p_codes.shape[1]
    w = band_width
    lanes = int(os.environ.get("TRUST4_TPU_DP_LANES", "128"))

    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    left = jnp.where(t_lens < p_lens, 5 + (p_lens - t_lens), 5).astype(jnp.int32)
    right = jnp.where(t_lens > p_lens, 5 + (t_lens - p_lens), 5).astype(jnp.int32)

    n_pad = ((n + lanes - 1) // lanes) * lanes
    pad = n_pad - n

    def padb(x, fill=0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    t_codes = padb(t_codes, _CODE_PAD)
    p_codes = padb(p_codes, _CODE_PAD)
    t_lens_p = padb(t_lens)
    p_lens_p = padb(p_lens)
    left_p = padb(left, 5)
    right_p = padb(right, 5)

    p_max_pad = ((p_max + 7) // 8) * 8
    p_codes = jnp.pad(p_codes, ((0, 0), (0, p_max_pad - p_max)),
                      constant_values=_CODE_PAD)

    t_shift_len = max(t_max, p_max_pad) + w + 8
    x = jnp.arange(t_shift_len, dtype=jnp.int32)[None, :]
    src = x - left_p[:, None]
    valid = (src >= 0) & (src < t_max)
    ts = jnp.where(
        valid,
        jnp.take_along_axis(
            t_codes.astype(jnp.int32), jnp.clip(src, 0, t_max - 1), axis=1
        ),
        _CODE_PAD,
    )

    ts_T = ts.T
    ps_T = p_codes.astype(jnp.int32).T
    meta = jnp.stack(
        [t_lens_p, p_lens_p, left_p, right_p,
         jnp.zeros_like(t_lens_p), jnp.zeros_like(t_lens_p),
         jnp.zeros_like(t_lens_p), jnp.zeros_like(t_lens_p)],
        axis=0,
    )

    grid = (n_pad // lanes,)
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        functools.partial(_dp_kernel_abl, w=w, p_max=p_max, lanes=lanes,
                          scan_span=scan_span, uniform_p=uniform_p,
                          jz_blocks=jz_blocks),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_shift_len, lanes), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_max_pad, lanes), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, lanes), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lanes), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((w, lanes), jnp.int32),
            pltpu.VMEM((w, lanes), jnp.int32),
        ],
        interpret=interpret,
    )(ts_T, ps_T, meta)
    return out[0, :n]


def scores_abl_host(tc, tl, pc, pl_, w):
    tln = np.asarray(tl)
    pln = np.asarray(pl_)
    d = pln - tln
    lr_max = int((10 + np.abs(d)).max()) if tln.size else 10
    scan_span = 1
    while scan_span < min(lr_max + 1, w):
        scan_span *= 2
    left_max = int(np.maximum(d, 0).max()) + 5 if tln.size else 5
    jz_blocks = (left_max + 7) // 8
    p_max = pc.shape[1]
    uniform_p = bool(tln.size) and bool((pln == p_max).all())
    return scores_abl(tc, tl, pc, pl_, w, scan_span, uniform_p, jz_blocks)


def scores_inter_host(tc, tl, pc, pl_, w, groups):
    tln = np.asarray(tl)
    pln = np.asarray(pl_)
    d = pln - tln
    lr_max = int((10 + np.abs(d)).max()) if tln.size else 10
    scan_span = 1
    while scan_span < min(lr_max + 1, w):
        scan_span *= 2
    left_max = int(np.maximum(d, 0).max()) + 5 if tln.size else 5
    jz_blocks = (left_max + 7) // 8
    p_max = pc.shape[1]
    uniform_p = bool(tln.size) and bool((pln == p_max).all())
    return scores_inter(tc, tl, pc, pl_, w, groups, scan_span, uniform_p,
                        jz_blocks)


@functools.partial(jax.jit, static_argnames=("band_width",))
def prep_only(t_codes, t_lens, p_codes, p_lens, band_width):
    """Just the host shim's device-side prep: pad, shift-gather, transpose."""
    n, t_max = t_codes.shape
    p_max = p_codes.shape[1]
    w = band_width
    lanes = 128
    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    left = jnp.where(t_lens < p_lens, 5 + (p_lens - t_lens), 5).astype(jnp.int32)
    n_pad = ((n + lanes - 1) // lanes) * lanes
    pad = n_pad - n

    def padb(x, fill=0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    t_codes = padb(t_codes, _CODE_PAD)
    p_codes = padb(p_codes, _CODE_PAD)
    left_p = padb(left, 5)
    p_max_pad = ((p_max + 7) // 8) * 8
    p_codes = jnp.pad(p_codes, ((0, 0), (0, p_max_pad - p_max)),
                      constant_values=_CODE_PAD)
    t_shift_len = max(t_max, p_max_pad) + w + 8
    x = jnp.arange(t_shift_len, dtype=jnp.int32)[None, :]
    src = x - left_p[:, None]
    valid = (src >= 0) & (src < t_max)
    ts = jnp.where(
        valid,
        jnp.take_along_axis(
            t_codes.astype(jnp.int32), jnp.clip(src, 0, t_max - 1), axis=1
        ),
        _CODE_PAD,
    )
    return ts.T, p_codes.astype(jnp.int32).T


@jax.jit
def transpose_only(t_codes):
    return t_codes.astype(jnp.int32).T


@jax.jit
def gather_only(t_codes, t_lens, p_lens):
    n, t_max = t_codes.shape
    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    left = jnp.where(t_lens < p_lens, 5 + (p_lens - t_lens), 5).astype(jnp.int32)
    t_shift_len = t_max + 48
    x = jnp.arange(t_shift_len, dtype=jnp.int32)[None, :]
    src = x - left[:, None]
    valid = (src >= 0) & (src < t_max)
    return jnp.where(
        valid,
        jnp.take_along_axis(
            t_codes.astype(jnp.int32), jnp.clip(src, 0, t_max - 1), axis=1
        ),
        _CODE_PAD,
    )


@jax.jit
def selshift_prep(t_codes, t_lens, p_lens):
    """Shift-by-left via select-over-shifts on the TRANSPOSED layout:
    no gather.  ts_T[x, n] = t_codes[n, x - left[n]]."""
    n, t_max = t_codes.shape
    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    left = jnp.where(t_lens < p_lens, 5 + (p_lens - t_lens), 5).astype(jnp.int32)
    t_shift_len = t_max + 48
    ttT = t_codes.astype(jnp.int32).T  # (T, N)
    ttT_pad = jnp.pad(ttT, ((48, t_shift_len - t_max - 48 + 48), (0, 0)),
                      constant_values=_CODE_PAD)
    out = jnp.full((t_shift_len, n), _CODE_PAD, jnp.int32)
    for s in range(5, 48):
        seg = lax.dynamic_slice_in_dim(ttT_pad, 48 - s, t_shift_len, axis=0)
        out = jnp.where(left[None, :] == s, seg, out)
    return out


def make_inputs(N=65536, L=152, W=32, seed=0):
    rng = np.random.default_rng(seed)
    tc = rng.integers(0, 4, size=(N, L), dtype=np.int8)
    tl = np.full(N, 150, dtype=np.int32)
    pl_ = np.full(N, 148, dtype=np.int32)
    return tc, tl, tc, pl_, W


def time_fn(fn, args, n_outer=5, n_inner=10):
    # materialize once (compile + tunnel handshake)
    t0 = time.perf_counter()
    ref = np.asarray(fn(*args))
    print(f"  first-call (compile+handshake): {time.perf_counter()-t0:.1f}s",
          flush=True)
    dargs = [jax.device_put(a) if isinstance(a, np.ndarray) else a
             for a in args]
    jax.block_until_ready([a for a in dargs if hasattr(a, 'block_until_ready')])
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        for _ in range(n_inner):
            s = fn(*dargs)
        s.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n_inner)
    return best, ref


def main():
    which = sys.argv[1:] or ["base", "inter2", "inter4"]
    N, L, W = 65536, 152, 32
    tc, tl, pc, pl_, W = make_inputs(N, L, W)
    cells = N * 150 * W
    print(f"backend: {jax.default_backend()}  N={N} L=150 W={W} "
          f"cells/launch={cells/1e9:.2f}G", flush=True)

    results = {}
    ref_scores = None
    for name in which:
        if name == "base":
            fn = lambda a, b, c, d: banded_affine_scores_pallas(a, b, c, d, W)
            args = (tc, tl, pc, pl_)
        elif name == "prep":
            fn = lambda a, b, c, d: prep_only(a, b, c, d, W)[0]
            args = (tc, tl, pc, pl_)
        elif name == "tonly":
            fn = lambda a, b, c, d: transpose_only(a)
            args = (tc, tl, pc, pl_)
        elif name == "gonly":
            fn = lambda a, b, c, d: gather_only(a, b, d)
            args = (tc, tl, pc, pl_)
        elif name == "selshift":
            fn = lambda a, b, c, d: selshift_prep(a, b, d)
            args = (tc, tl, pc, pl_)
        elif name == "abl":
            fn = lambda a, b, c, d: scores_abl_host(a, b, c, d, W)
            args = (tc, tl, pc, pl_)
        elif name.startswith("inter"):
            G = int(name[5:])
            fn = lambda a, b, c, d, G=G: scores_inter_host(a, b, c, d, W, G)
            args = (tc, tl, pc, pl_)
        else:
            print(f"unknown: {name}")
            continue
        print(f"[{name}]", flush=True)
        t, out = time_fn(fn, args)
        if ref_scores is None:
            ref_scores = out
        else:
            ok = np.array_equal(ref_scores, out)
            print(f"  scores match base: {ok}", flush=True)
            if not ok:
                bad = np.nonzero(ref_scores != out)[0][:5]
                print(f"  first mismatches at {bad}: "
                      f"{ref_scores[bad]} vs {out[bad]}")
        rate = cells / t
        results[name] = rate
        print(f"  {t*1e3:.1f} ms/launch  {rate/1e9:.2f} G cells/s", flush=True)

    print("\nsummary:")
    for k, v in results.items():
        print(f"  {k}: {v/1e9:.2f} G cells/s")


if __name__ == "__main__":
    main()
