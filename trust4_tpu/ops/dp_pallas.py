"""Pallas TPU kernel for the batched banded affine-gap DP.

Same semantics as ops/dp_batch.banded_affine_scores (reference:
AlignAlgo.hpp:218-424 GlobalAlignment, incl. the stale ``e[0][j]`` seed
quirk) with a layout designed for the VPU:

* **batch in lanes**: each (W, 128) tile holds the band of 128 pairs, so
  every recurrence step is a full-width VPU op;
* **band in sublanes**: the vertical neighbour (k+1) and the horizontal
  running max both become static sublane shifts;
* **pre-shifted text**: each pair's text row is shifted right by its
  left_band before the kernel, turning the per-pair band window
  ``t[i-1-left+k]`` into the uniform slice ``ts[i-1+k]`` — the row loop
  reads one static (W, 128) window per step and needs no gathers;
* the in-row horizontal-gap recurrence is an exclusive running max over
  the band axis, computed with log2(W) doubling steps on sublanes.

Scores are bit-identical to the XLA formulation and the host oracle
(cross-checked in tests/test_dp_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from trust4_tpu.ops.dp_batch import (
    SCORE_GAPEXTEND,
    SCORE_GAPOPEN,
    SCORE_MATCH,
    SCORE_MISMATCH,
    _CODE_N,
    _CODE_PAD,
)
from trust4_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

_LANES = 128
# Lane-tile width for the scores kernel: the row recurrence is a deep
# dependent chain, so each op must span several vregs of independent work
# to hide VPU latency.  Overridable for experiments via env.
import os as _os
_SCORE_LANES = int(_os.environ.get("TRUST4_TPU_DP_LANES", "128"))
_BIG_NEG = -(1 << 29)
# Sentinel for the -inf fillers in the scores kernel: far below any real
# score yet far from INT32_MIN, so per-row drift from the unmasked left
# band edge can never wrap (stored rows are floor-clamped back to it).
_SENT32 = -(1 << 27)


def _dp_kernel(ts_ref, ps_ref, meta_ref, out_ref, m_ref, e_ref, *, w,
               p_max, lanes, scan_span, uniform_p, jz_blocks):
    """One batch tile: ts (T_pad, 128) pre-shifted text codes, ps (P, 128)
    query codes, meta (8, 128) = [t_len, p_len, left, right, ...].

    Optimized row loop: 8 query rows per grid-loop step (one aligned block
    load of text/query codes + static in-register slices, amortizing loop
    and ref-traffic overhead), loop-carried j_row, hoisted invariants
    (k*(-GE), the loop-invariant right band edge j<=i+right <=> k<=left+
    right), and no left-edge mask — cells left of the band hold sentinel
    values that decay monotonically and are refreshed to the exact
    column-0 boundary when j reaches 0.  (int16 state would halve the
    cycles again, but this target supports neither 16-bit compares nor
    16-bit max.)  Scores are bit-identical to the XLA formulation."""
    import jax.lax as lax

    t_len = meta_ref[0, :]  # (128,)
    p_len = meta_ref[1, :]
    left = meta_ref[2, :]
    right = meta_ref[3, :]

    k_col = lax.broadcasted_iota(jnp.int32, (w, lanes), 0)  # band index k
    sent = jnp.int32(_SENT32)
    big_neg = jnp.int32(_BIG_NEG)
    go = jnp.int32(SCORE_GAPOPEN)
    ge = jnp.int32(SCORE_GAPEXTEND)
    t_len_b = t_len[None, :]
    p_len_b = p_len[None, :]
    # Loop-invariant pieces of the recurrence.
    kge = k_col * jnp.int32(-SCORE_GAPEXTEND)  # k * (-GE)
    k_in_right = k_col <= (left + right)[None, :]  # j<=i+right, all rows
    j0 = k_col - left[None, :]  # j at row 0

    # Row 0: m[0][j] = GO + j*GO; e[0][j] seeded with the stale loop
    # variable lenp+1 (reference quirk, AlignAlgo.hpp:244-249).
    m0 = jnp.where(j0 == 0, 0, go + j0 * go)
    e0 = jnp.where(j0 == 0, 0, go + (p_len_b + 1) * go)
    in_t0 = (j0 >= 0) & (j0 <= t_len_b)
    m_ref[:] = jnp.where(in_t0, m0, sent).astype(jnp.int32)
    e_ref[:] = jnp.where(in_t0, e0, sent).astype(jnp.int32)

    def shift_up(x):  # band index k reads k+1 of the previous row
        return jnp.concatenate(
            [x[1:, :], jnp.full((1, lanes), sent, jnp.int32)], axis=0
        )

    n_blk = (p_max + 7) // 8

    go_ge = jnp.int32(SCORE_GAPOPEN + SCORE_GAPEXTEND)

    # Static specializations (computed on host from the batch):
    #  * jz_blocks: j reaches 0 only while i <= max(left), so only the
    #    first blocks carry the column-0 boundary logic;
    #  * uniform_p: when every real lane has p_len == p_max the per-row
    #    freeze select is dead;
    #  * scan_span: the horizontal-gap running max only has to cover the
    #    true band span max(left+right)+1 — contributions from farther k
    #    are the sentinel by construction.
    def make_blk_body(with_jz):
        def blk_body(b, j_row):
            base8 = b * 8
            ts_chunk = ts_ref[pl.ds(base8, w + 8), :]
            ps_chunk = ps_ref[pl.ds(base8, 8), :]
            m_cur = m_ref[:]
            e_cur = e_ref[:]
            for r in range(8):
                i = base8 + r + 1
                j_row = j_row + 1  # carried: j = i - left + k
                if with_jz:
                    jz = j_row == 0

                # Pre-shifted text: t[j_row - 1] == ts[i - 1 + k].
                tj = jax.lax.slice_in_dim(ts_chunk, r, r + w, axis=0)
                pi = jax.lax.slice_in_dim(ps_chunk, r, r + 1, axis=0)
                eq = (tj == pi) | (tj == _CODE_N) | (pi == _CODE_N)
                sub = jnp.where(eq, SCORE_MATCH,
                                SCORE_MISMATCH).astype(jnp.int32)

                # E recurrence: max first, shift once (shift distributes).
                e_new = shift_up(jnp.maximum(e_cur + ge, m_cur + go_ge))
                diag = m_cur + sub

                # Only the loop-invariant right band edge needs masking:
                # cells with j > t_len are provably never read by any
                # j <= t_len cell (diag/e/f all read j' <= j), and the left
                # edge decays from the sentinel monotonically.
                bound_m = (go + i * go).astype(jnp.int32)
                base = jnp.maximum(diag, e_new)
                if with_jz:
                    base = jnp.where(jz, bound_m, base)
                base = jnp.where(k_in_right, base, sent)

                # Exclusive running max over k (horizontal gaps).
                if with_jz:
                    run = jnp.where(jz, bound_m, base + go) + kge
                else:
                    run = base + go + kge
                s = 1
                while s < scan_span:
                    shifted = jnp.concatenate(
                        [jnp.full((s, lanes), sent, jnp.int32), run[:-s, :]],
                        axis=0,
                    )
                    run = jnp.maximum(run, shifted)
                    s *= 2
                f_new = (
                    jnp.concatenate(
                        [jnp.full((1, lanes), sent, jnp.int32), run[:-1, :]],
                        axis=0,
                    )
                    - kge
                )

                m_in = jnp.maximum(base, f_new)
                if with_jz:
                    m_in = jnp.where(jz, bound_m, m_in)
                e_in = jnp.where(k_in_right, e_new, sent)

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

    nb_jz = min(jz_blocks, n_blk)
    j_carry = j0
    if nb_jz > 0:
        j_carry = lax.fori_loop(0, nb_jz, make_blk_body(True), j_carry)
    if nb_jz < n_blk:
        lax.fori_loop(nb_jz, n_blk, make_blk_body(False), j_carry)

    # Final cell (p_len, t_len): band index k = t_len - p_len + left.
    k_final = (t_len - p_len + left)[None, :]
    best = jnp.max(
        jnp.where(k_col == k_final, m_ref[:], big_neg), axis=0, keepdims=True
    )
    out_ref[:] = best


import jax.experimental.pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _shift_hi_bucket(left_max: int) -> int:
    """Static bound for the select-over-shifts prep, bucketed so the jit
    cache sees at most a handful of variants per tier."""
    for b in (5, 9, 17, 33, 49, 81, 129):
        if left_max <= b:
            return b
    return left_max


def _build_ts_selshift(t_codes_i32_T, left_p, t_max, t_shift_len, shift_hi):
    """Pre-shifted text rows WITHOUT a gather: ts_T[x, n] =
    t_codes[n, x - left[n]] (pad elsewhere), built as one static-slice
    select per candidate shift.  The take_along_axis gather this replaces
    was 156.7 ms/launch at the bench shape vs 4.7 ms for this form
    (tools/dp_kernel_lab.py, 2026-08-20) — it was the entire kernel-side
    bottleneck pinned in VALIDATION round 4.

    t_codes_i32_T: (t_max, n_pad) int32 (already transposed); left_p:
    (n_pad,) int32 with 5 <= left <= shift_hi; returns (t_shift_len,
    n_pad) int32."""
    ttT_pad = jnp.pad(
        t_codes_i32_T,
        ((shift_hi, max(0, t_shift_len - t_max)), (0, 0)),
        constant_values=_CODE_PAD,
    )
    out = jnp.full(
        (t_shift_len, t_codes_i32_T.shape[1]), _CODE_PAD, jnp.int32
    )
    lrow = left_p[None, :]
    for s in range(5, shift_hi + 1):
        seg = jax.lax.slice_in_dim(
            ttT_pad, shift_hi - s, shift_hi - s + t_shift_len, axis=0
        )
        out = jnp.where(lrow == s, seg, out)
    return out


def banded_affine_scores_pallas(
    t_codes: jnp.ndarray,  # (N, T) int8
    t_lens: jnp.ndarray,
    p_codes: jnp.ndarray,  # (N, P) int8
    p_lens: jnp.ndarray,
    band_width: int,
) -> jnp.ndarray:
    """Host shim: derives the kernel's static specializations from the
    batch (true band span, uniform p_len, last column-0 row), then calls
    the jitted implementation.  Inside a jit trace the lens are tracers, so
    fall back to the conservative statics."""
    if isinstance(t_lens, jax.core.Tracer) or isinstance(
        p_lens, jax.core.Tracer
    ):
        p_max = p_codes.shape[1]
        return _scores_pallas_jit(
            t_codes, t_lens, p_codes, p_lens, band_width,
            band_width, False, (p_max + 7) // 8,
            _shift_hi_bucket(max(5, band_width - 6)),
        )
    tl = np.asarray(t_lens)
    pl_ = np.asarray(p_lens)
    d = pl_ - tl
    lr_max = int((10 + np.abs(d)).max()) if tl.size else 10
    scan_span = 1
    while scan_span < min(lr_max + 1, band_width):
        scan_span *= 2
    left_max = int(np.maximum(d, 0).max()) + 5 if tl.size else 5
    jz_blocks = (left_max + 7) // 8
    p_max = p_codes.shape[1]
    uniform_p = bool(tl.size) and bool((pl_ == p_max).all())
    return _scores_pallas_jit(
        t_codes, t_lens, p_codes, p_lens, band_width,
        scan_span, uniform_p, jz_blocks, _shift_hi_bucket(left_max),
    )


@functools.partial(
    jax.jit,
    static_argnames=("band_width", "scan_span", "uniform_p", "jz_blocks",
                     "shift_hi"),
)
def _scores_pallas_jit(
    t_codes, t_lens, p_codes, p_lens, band_width,
    scan_span, uniform_p, jz_blocks, shift_hi,
):
    n, t_max = t_codes.shape
    p_max = p_codes.shape[1]
    w = band_width
    lanes = _SCORE_LANES

    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    left = jnp.where(t_lens < p_lens, 5 + (p_lens - t_lens), 5).astype(jnp.int32)
    right = jnp.where(t_lens > p_lens, 5 + (t_lens - p_lens), 5).astype(jnp.int32)

    # Pad batch to a lane multiple; give pads l=0 lens (score slot unused).
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

    # The kernel consumes 8 query rows per block; pad the row dimension so
    # every aligned block load is in bounds.
    p_max_pad = ((p_max + 7) // 8) * 8
    p_codes = jnp.pad(p_codes, ((0, 0), (0, p_max_pad - p_max)),
                      constant_values=_CODE_PAD)

    # Shift each text row right by its left_band so the kernel's band
    # window is the uniform slice ts[i-1 : i-1+W].  Gather-free: built
    # from the transposed codes with one static-slice select per shift.
    t_shift_len = max(t_max, p_max_pad) + w + 8
    ts_T = _build_ts_selshift(
        t_codes.astype(jnp.int32).T, left_p, t_max, t_shift_len, shift_hi
    )  # (T_shift, n_pad)
    ps_T = p_codes.astype(jnp.int32).T  # (P, n_pad)
    meta = jnp.stack(
        [
            t_lens_p,
            p_lens_p,
            left_p,
            right_p,
            jnp.zeros_like(t_lens_p),
            jnp.zeros_like(t_lens_p),
            jnp.zeros_like(t_lens_p),
            jnp.zeros_like(t_lens_p),
        ],
        axis=0,
    )  # (8, n_pad)

    grid = (n_pad // lanes,)
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        functools.partial(_dp_kernel, w=w, p_max=p_max, lanes=lanes,
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


# ---------------------------------------------------------------------------
# Score + traceback-decision bits (device edit scripts)
# ---------------------------------------------------------------------------
#
# Besides the final score, this variant emits 4 decision bits per band cell
# that are exactly the equality/priority tests the reference's traceback
# performs (AlignAlgo.hpp:174-203; native/align_kernels.cpp
# affine_traceback):
#   bit0: f[i][j] >= e[i][j]                      (DELETE beats INSERT)
#   bit1: m[i-1][j-1] + diff == m[i][j]           (diagonal accepted)
#   bit2: m[i-1][j] + GO+GE == e[i][j]            (insert run opened here)
#   bit3: m[i][j-1] + GO+GE == f[i][j]            (delete run opened here)
# A host walker (native/align_kernels.cpp t4_decode_dirs) replays the
# traceback DFA over these bits and produces edit scripts bit-identical to
# the CPU kernels; cells outside the band / on row 0 / column 0 are
# evaluated analytically by the walker from the boundary formulas, so only
# in-band bits are consumed.


def _dp_dirs_kernel(ts_ref, ps_ref, meta_ref, out_ref, dirs_ref, m_ref,
                    e_ref, *, w, p_max):
    import jax.lax as lax

    t_len = meta_ref[0, :]
    p_len = meta_ref[1, :]
    left = meta_ref[2, :]
    right = meta_ref[3, :]

    k_col = lax.broadcasted_iota(jnp.int32, (w, _LANES), 0)
    neg_inf = ((t_len + 1) * (p_len + 1) * SCORE_GAPOPEN).astype(jnp.int32)
    neg_inf = neg_inf[None, :]
    big_neg = jnp.int32(_BIG_NEG)
    go = jnp.int32(SCORE_GAPOPEN)
    ge = jnp.int32(SCORE_GAPEXTEND)
    go_ge = go + ge

    j0 = k_col - left[None, :]
    in_t0 = (j0 >= 0) & (j0 <= t_len[None, :])
    m0 = jnp.where(j0 == 0, 0, jnp.where(j0 > 0, go + j0 * go, big_neg))
    e0 = jnp.where(
        j0 == 0, 0,
        jnp.where(j0 > 0, go + (p_len[None, :] + 1) * go, big_neg),
    )
    m_ref[:] = jnp.where(in_t0, m0, neg_inf).astype(jnp.int32)
    e_ref[:] = jnp.where(in_t0, e0, neg_inf).astype(jnp.int32)

    def shift_up(x):
        return jnp.concatenate(
            [x[1:, :], jnp.full((1, _LANES), big_neg, jnp.int32)], axis=0
        )

    def row_body(i, _):
        m_prev = m_ref[:]
        e_prev = e_ref[:]
        j_row = i - left[None, :] + k_col
        in_band = (
            (j_row >= 1)
            & (j_row <= t_len[None, :])
            & (j_row <= i + right[None, :])
        )
        in_dp_row = i <= p_len[None, :]

        tj = ts_ref[pl.ds(i - 1, w), :]
        pi = ps_ref[pl.ds(i - 1, 1), :]
        eq = (tj == pi) | (tj == _CODE_N) | (pi == _CODE_N)
        sub = jnp.where(eq, SCORE_MATCH, SCORE_MISMATCH).astype(jnp.int32)

        e_new = jnp.maximum(shift_up(e_prev) + ge, shift_up(m_prev) + go + ge)
        diag = m_prev + sub

        bound_m = (go + i * go).astype(jnp.int32)
        base = jnp.maximum(diag, e_new)
        base = jnp.where(j_row == 0, bound_m, base)
        base = jnp.where(in_band | (j_row == 0), base, big_neg)

        t_val = jnp.where(j_row == 0, bound_m, base + go) + k_col * (-ge)
        run = t_val
        s = 1
        while s < w:
            shifted = jnp.concatenate(
                [jnp.full((s, _LANES), big_neg, jnp.int32), run[:-s, :]],
                axis=0,
            )
            run = jnp.maximum(run, shifted)
            s *= 2
        f_new = (
            jnp.concatenate(
                [jnp.full((1, _LANES), big_neg, jnp.int32), run[:-1, :]],
                axis=0,
            )
            - k_col * (-ge)
        )

        m_fin = jnp.maximum(base, f_new)
        m_stored = jnp.where(in_band & in_dp_row, m_fin, neg_inf)
        m_stored = jnp.where((j_row == 0) & in_dp_row, bound_m, m_stored)
        e_stored = jnp.where(in_band & in_dp_row, e_new, neg_inf)

        # Decision bits (valid at in-band cells; the walker handles
        # boundary cells analytically).
        b0 = (f_new >= e_new).astype(jnp.int32)
        b1 = (diag == m_fin).astype(jnp.int32)
        b2 = (shift_up(m_prev) + go_ge == e_new).astype(jnp.int32)
        # m[i][j-1]: band k-1 of the STORED row (so the j-1==0 cell reads
        # the column-0 value bound_m); fill at k=0 is bound_m only when
        # that cell is column 0 (j_row[k=0] == 1 <=> i - left == 1).
        fill = jnp.where((i - left[None, :]) == 1, bound_m, big_neg)
        m_left = jnp.concatenate([fill, m_stored[:-1, :]], axis=0)
        b3 = (m_left + go_ge == f_new).astype(jnp.int32)
        bits = b0 | (b1 << 1) | (b2 << 2) | (b3 << 3)
        dirs_ref[pl.ds(i - 1, 1), :, :] = bits.astype(jnp.int8)[None, :, :]

        m_ref[:] = jnp.where(in_dp_row, m_stored, m_prev)
        e_ref[:] = jnp.where(in_dp_row, e_stored, e_prev)
        return 0

    lax.fori_loop(1, p_max + 1, row_body, 0)

    k_final = (t_len - p_len + left)[None, :]
    m_fin = m_ref[:]
    out_ref[:] = jnp.max(
        jnp.where(k_col == k_final, m_fin, jnp.int32(_BIG_NEG)),
        axis=0, keepdims=True,
    )


@functools.partial(jax.jit, static_argnames=("band_width",))
def banded_affine_dirs_pallas(
    t_codes: jnp.ndarray,  # (N, T) int8
    t_lens: jnp.ndarray,
    p_codes: jnp.ndarray,  # (N, P) int8
    p_lens: jnp.ndarray,
    band_width: int,
):
    """Returns (scores (N,), dirs (N, P, W) int8) — see _dp_dirs_kernel."""
    n, t_max = t_codes.shape
    p_max = p_codes.shape[1]
    w = band_width
    lanes = _SCORE_LANES

    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    left = jnp.where(t_lens < p_lens, 5 + (p_lens - t_lens), 5).astype(jnp.int32)
    right = jnp.where(t_lens > p_lens, 5 + (t_lens - p_lens), 5).astype(jnp.int32)

    n_pad = ((n + _LANES - 1) // _LANES) * _LANES
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

    t_shift_len = t_max + w + 8
    ts_T = _build_ts_selshift(
        t_codes.astype(jnp.int32).T, left_p, t_max, t_shift_len,
        _shift_hi_bucket(max(5, w - 6)),
    )
    ps_T = p_codes.astype(jnp.int32).T
    meta = jnp.stack(
        [t_lens_p, p_lens_p, left_p, right_p,
         jnp.zeros_like(t_lens_p), jnp.zeros_like(t_lens_p),
         jnp.zeros_like(t_lens_p), jnp.zeros_like(t_lens_p)],
        axis=0,
    )

    grid = (n_pad // _LANES,)
    interpret = jax.default_backend() not in ("tpu", "axon")
    scores, dirs = pl.pallas_call(
        functools.partial(_dp_dirs_kernel, w=w, p_max=p_max),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((p_max, w, n_pad), jnp.int8),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_shift_len, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_max, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_max, w, _LANES), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((w, _LANES), jnp.int32),
            pltpu.VMEM((w, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(ts_T, ps_T, meta)
    # (N, P, W) layout for the host walker.
    return scores[0, :n], jnp.transpose(dirs, (2, 0, 1))[:n]


# ---------------------------------------------------------------------------
# On-device traceback decode: vectorized DFA over the decision bits
# ---------------------------------------------------------------------------
#
# Replays native/align_kernels.cpp t4_decode_dirs for a whole batch at once
# (state per job: position, DFA state, counts), so only (N, 3) count
# triples leave the device instead of the (N, P, W) bits tensor.  Integer
# arithmetic replicates the walker exactly; tests cross-check against the
# C++ bit-walker and the CPU DP.


@functools.partial(jax.jit, static_argnames=("w", "p_max"))
def decode_dirs_counts(dirs, t_codes, t_lens, p_codes, p_lens, *, w, p_max):
    """dirs (N, P, W) int8 from _dp_dirs_kernel; returns (N, 3) int32
    (match, mismatch, indel) counts of the decoded edit scripts."""
    import jax.lax as lax

    n = dirs.shape[0]
    go = jnp.int32(SCORE_GAPOPEN)
    ge = jnp.int32(SCORE_GAPEXTEND)
    go_ge = go + ge
    lent = t_lens.astype(jnp.int32)
    lenp = p_lens.astype(jnp.int32)
    left = jnp.where(lent < lenp, 5 + (lenp - lent), 5).astype(jnp.int32)
    neg_inf = (lent + 1) * (lenp + 1) * go
    sent = neg_inf - 1  # unknown in-band m (can never satisfy an equality)

    flat = dirs.reshape(n, -1).astype(jnp.int32)
    tmax = t_codes.shape[1]
    pmax_codes = p_codes.shape[1]
    tci = t_codes.astype(jnp.int32)
    pci = p_codes.astype(jnp.int32)

    def m_val(i, j):
        # analytic-only cells: row 0 / col 0; neg_inf otherwise
        return jnp.where(
            i == 0,
            jnp.where(j == 0, 0, go + j * go),
            jnp.where(j == 0, go + i * go, neg_inf),
        )

    def e_val(i, j):
        return jnp.where(
            i == 0,
            jnp.where(j == 0, 0, go + (lenp + 1) * go),
            jnp.where(j == 0, go + i * ge, neg_inf),
        )

    def f_val(i, j):
        return jnp.where(
            i == 0,
            jnp.where(j == 0, 0, go + j * ge),
            jnp.where(j == 0, go + i * go, neg_inf),
        )

    def in_band(i, j):
        k = j - i + left
        return (i >= 1) & (j >= 1) & (j <= lent) & (k >= 0) & (k < w)

    def bits_at(i, j):
        k = j - i + left
        idx = jnp.clip((i - 1) * w + k, 0, p_max * w - 1)
        return jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]

    def body(_, st):
        ti, tj, mat, cm, cmm, cind = st
        active = (ti > 0) | (tj > 0)
        ib = in_band(ti, tj)
        bits = jnp.where(ib, bits_at(ti, tj), 0)
        b0 = (bits & 1) != 0
        b1 = (bits & 2) != 0
        b2 = (bits & 4) != 0
        b3 = (bits & 8) != 0

        # mat == 0 -------------------------------------------------------
        fe = jnp.where(ib, b0, f_val(ti, tj) >= e_val(ti, tj))
        diag_ok = ib & b1 & (ti > 0) & (tj > 0)
        tc = jnp.take_along_axis(
            tci, jnp.clip(tj - 1, 0, tmax - 1)[:, None], axis=1
        )[:, 0]
        pc = jnp.take_along_axis(
            pci, jnp.clip(ti - 1, 0, pmax_codes - 1)[:, None], axis=1
        )[:, 0]
        eqc = (tc == pc) | (tc == _CODE_N) | (pc == _CODE_N)

        is0 = active & (mat == 0)
        take_diag = is0 & diag_ok
        to_del = is0 & ~diag_ok & fe
        to_ins = is0 & ~diag_ok & ~fe

        # mat == 1 (insert run) -----------------------------------------
        is1 = active & (mat == 1)
        ti_pos = ti > 0
        mv2 = jnp.where(
            (ti - 1 == 0) | (tj == 0) | ~in_band(ti - 1, tj),
            m_val(ti - 1, tj),
            sent,
        )
        ev2 = e_val(ti, tj)
        opened2_an = ((ev2 != neg_inf) | (mv2 != sent)) & (mv2 + go_ge == ev2)
        opened2 = jnp.where(ib, b2, opened2_an)
        ins_emit = is1
        ins_step = is1 & ti_pos
        ins_close = ins_step & opened2
        ins_to2 = is1 & ~ti_pos

        # mat == 2 (delete run) -----------------------------------------
        is2 = active & (mat == 2)
        tj_pos = tj > 0
        mv3 = jnp.where(
            (ti == 0) | (tj - 1 == 0) | ~in_band(ti, tj - 1),
            m_val(ti, tj - 1),
            sent,
        )
        fv3 = f_val(ti, tj)
        opened3_an = ((fv3 != neg_inf) | (mv3 != sent)) & (mv3 + go_ge == fv3)
        opened3 = jnp.where(ib, b3, opened3_an)
        del_emit = is2
        del_step = is2 & tj_pos
        del_close = del_step & opened3
        del_to1 = is2 & ~tj_pos

        cm = cm + jnp.where(take_diag & eqc, 1, 0)
        cmm = cmm + jnp.where(take_diag & ~eqc, 1, 0)
        cind = cind + jnp.where(ins_emit | del_emit, 1, 0)

        ti_n = ti - jnp.where(take_diag | ins_step, 1, 0)
        tj_n = tj - jnp.where(take_diag | del_step, 1, 0)
        mat_n = jnp.where(
            take_diag | ins_close | del_close,
            0,
            jnp.where(
                to_ins | (is1 & ~(ins_close | ins_to2)),
                1,
                jnp.where(
                    to_del | ins_to2 | (is2 & ~(del_close | del_to1)),
                    2,
                    jnp.where(del_to1, 1, mat),
                ),
            ),
        )
        mat_n = jnp.where(active, mat_n, mat)
        return ti_n, tj_n, mat_n, cm, cmm, cind

    z = jnp.zeros(n, jnp.int32)
    # Zero-length jobs produce empty edit scripts (the CPU kernels return
    # out_len 0); start them finished.
    empty = (lent == 0) | (lenp == 0)
    st = (jnp.where(empty, 0, lenp), jnp.where(empty, 0, lent), z, z, z, z)
    # each iteration emits >= 1 op or transitions the DFA; 2*(P+T)+4 bounds
    # the walk for every job in the tier
    steps = 2 * (p_max + t_codes.shape[1]) + 4
    st = lax.fori_loop(0, steps, body, st)
    _, _, _, cm, cmm, cind = st
    return jnp.stack([cm, cmm, cind], axis=1)


# ---------------------------------------------------------------------------
# Forward counts kernel: scores + (match, mismatch, indel) in ONE pass
# ---------------------------------------------------------------------------
#
# TPU-native replacement for the dirs-tensor + DFA-decode pair: instead of
# materializing (N, P, W) decision bits and replaying the traceback with
# per-job gathers (decode_dirs_counts' take_along_axis steps cost 170-360
# ms per tier launch on this chip — tools/dp_kernel_lab.py round 5), the
# kernel carries the traceback RESULT forward through the DP: per band
# cell and per walker state s in {M, E/insert-run, F/delete-run}, the
# packed (match<<20 | mismatch<<10 | indel) counts the traceback walker
# (native/align_kernels.cpp affine_traceback, delete_vs e;
# AlignAlgo.hpp:174-203) would emit walking from that cell in that state
# to the origin.  The recurrences mirror the walker transition-for-
# transition:
#
#   CM(i,j) = b1 ? CM(i-1,j-1)+inc : (b0 ? CF(i,j) : CE(i,j))
#   CE(i,j) = indel + (b2 ? CM(i-1,j) : CE(i-1,j))
#   CF(i,j) = indel + (b3 ? CM(i,j-1) : CF(i,j-1))
#
# with b0..b3 the same decision bits the dirs kernel emits.  The in-row
# CM<->CF dependency (a row can bounce M->F-run->M->F-run) is resolved
# with a log-doubling scan over the band that composes per-column
# transfer maps — each map is "copy component M/F of the predecessor and
# add a constant, or reset to a constant", a family closed under
# composition (4 registers: source selector + packed offset per
# component).  Boundary cells (row 0, column 0, out-of-band) hold the
# walker's analytic continuation counts, derived from the quirky seeds:
# row 0 never closes a delete run (j*GO == (j-1)*GE has no integer
# solution), column 0 never closes an insert run, and every out-of-band
# cell in every state walks to the origin emitting exactly i+j+1 indels.
# Bit-identical to the CPU kernels (cross-checked in
# tests/test_dp_pallas.py against t4_global_alignment_counts).

_PK_MATCH = 1 << 20
_PK_MISMATCH = 1 << 10
_PK_INDEL = 1
_PK_FIELD = (1 << 10) - 1


def _dp_counts_kernel(ts_ref, ps_ref, meta_ref, out_ref, cnt_ref, m_ref,
                      e_ref, cm_ref, ce_ref, *, w, p_max,
                      packed_out=False):
    import jax.lax as lax

    t_len = meta_ref[0, :]
    p_len = meta_ref[1, :]
    left = meta_ref[2, :]
    right = meta_ref[3, :]

    k_col = lax.broadcasted_iota(jnp.int32, (w, _LANES), 0)
    neg_inf = ((t_len + 1) * (p_len + 1) * SCORE_GAPOPEN).astype(jnp.int32)
    neg_inf = neg_inf[None, :]
    big_neg = jnp.int32(_BIG_NEG)
    go = jnp.int32(SCORE_GAPOPEN)
    ge = jnp.int32(SCORE_GAPEXTEND)
    go_ge = go + ge
    pk_i = jnp.int32(_PK_INDEL)

    j0 = k_col - left[None, :]
    in_t0 = (j0 >= 0) & (j0 <= t_len[None, :])
    m0 = jnp.where(j0 == 0, 0, jnp.where(j0 > 0, go + j0 * go, big_neg))
    e0 = jnp.where(
        j0 == 0, 0,
        jnp.where(j0 > 0, go + (p_len[None, :] + 1) * go, big_neg),
    )
    m_ref[:] = jnp.where(in_t0, m0, neg_inf).astype(jnp.int32)
    e_ref[:] = jnp.where(in_t0, e0, neg_inf).astype(jnp.int32)
    # Row-0 counts: CM(0,j) = CF(0,j) = j indels (delete run to origin,
    # never closing), CE(0,j) = j+1 indels (the walker emits one insert
    # at ti==0 before switching to the delete run); position j<0 is
    # never read.
    cm_ref[:] = jnp.where(j0 >= 0, j0 * pk_i, 0).astype(jnp.int32)
    ce_ref[:] = jnp.where(
        j0 > 0, (j0 + 1) * pk_i, 0
    ).astype(jnp.int32)

    def shift_up(x, fill):
        return jnp.concatenate([x[1:, :], fill], axis=0)

    bn_fill = jnp.full((1, _LANES), big_neg, jnp.int32)

    def row_body(i, _):
        m_prev = m_ref[:]
        e_prev = e_ref[:]
        cm_prev = cm_ref[:]
        ce_prev = ce_ref[:]
        j_row = i - left[None, :] + k_col
        in_band = (
            (j_row >= 1)
            & (j_row <= t_len[None, :])
            & (j_row <= i + right[None, :])
        )
        in_dp_row = i <= p_len[None, :]

        tj = ts_ref[pl.ds(i - 1, w), :]
        pi = ps_ref[pl.ds(i - 1, 1), :]
        eq = (tj == pi) | (tj == _CODE_N) | (pi == _CODE_N)
        sub = jnp.where(eq, SCORE_MATCH, SCORE_MISMATCH).astype(jnp.int32)

        e_new = jnp.maximum(
            shift_up(e_prev, bn_fill) + ge, shift_up(m_prev, bn_fill) + go_ge
        )
        diag = m_prev + sub

        bound_m = (go + i * go).astype(jnp.int32)
        base = jnp.maximum(diag, e_new)
        base = jnp.where(j_row == 0, bound_m, base)
        base = jnp.where(in_band | (j_row == 0), base, big_neg)

        t_val = jnp.where(j_row == 0, bound_m, base + go) + k_col * (-ge)
        run = t_val
        s = 1
        while s < w:
            shifted = jnp.concatenate(
                [jnp.full((s, _LANES), big_neg, jnp.int32), run[:-s, :]],
                axis=0,
            )
            run = jnp.maximum(run, shifted)
            s *= 2
        f_new = (
            jnp.concatenate(
                [jnp.full((1, _LANES), big_neg, jnp.int32), run[:-1, :]],
                axis=0,
            )
            - k_col * (-ge)
        )

        m_fin = jnp.maximum(base, f_new)
        m_stored = jnp.where(in_band & in_dp_row, m_fin, neg_inf)
        m_stored = jnp.where((j_row == 0) & in_dp_row, bound_m, m_stored)
        e_stored = jnp.where(in_band & in_dp_row, e_new, neg_inf)

        b0 = f_new >= e_new
        b1 = diag == m_fin
        b2 = shift_up(m_prev, bn_fill) + go_ge == e_new
        fill = jnp.where((i - left[None, :]) == 1, bound_m, big_neg)
        m_left = jnp.concatenate([fill, m_stored[:-1, :]], axis=0)
        b3 = m_left + go_ge == f_new

        # ---- counts ----
        # CE: insert-run step up.  The k = w-1 read of row i-1 is the
        # analytic value at (i-1, j_up): row 0 if i == 1, else out of
        # band (i-1 + j_up + 1 indels).
        j_up = ((i - 1) - left + w)[None, :]
        cm_fill = jnp.where(i == 1, j_up, (i - 1) + j_up + 1) * pk_i
        ce_fill = jnp.where(i == 1, j_up + 1, (i - 1) + j_up + 1) * pk_i
        cm_up = shift_up(cm_prev, cm_fill)
        ce_up = shift_up(ce_prev, ce_fill)
        ce_row = pk_i + jnp.where(b2, cm_up, ce_up)

        inc = jnp.where(eq, _PK_MATCH, _PK_MISMATCH).astype(jnp.int32)
        cm_diag = cm_prev + inc

        # Per-column transfer maps for the in-row (CM, CF) recurrence.
        # src: 0 = predecessor's M, 1 = predecessor's F, 2 = constant.
        c0 = b1 | jnp.logical_not(b0)
        reset_val = jnp.where(b1, cm_diag, ce_row)
        src_m = jnp.where(c0, 2, jnp.where(b3, 0, 1)).astype(jnp.int32)
        val_m = jnp.where(c0, reset_val, pk_i)
        src_f = jnp.where(b3, 0, 1).astype(jnp.int32)
        val_f = jnp.full((w, _LANES), _PK_INDEL, jnp.int32)

        # Boundary overrides: column 0 and out-of-band cells are resets
        # to the walker's analytic continuation.
        is_col0 = j_row == 0
        col0_m = (i * pk_i).astype(jnp.int32)
        col0_f = ((i + 1) * pk_i).astype(jnp.int32)
        oob = (i + j_row + 1) * pk_i
        outb = jnp.logical_not(in_band) & jnp.logical_not(is_col0)
        src_m = jnp.where(is_col0 | outb, 2, src_m)
        val_m = jnp.where(is_col0, col0_m, jnp.where(outb, oob, val_m))
        src_f = jnp.where(is_col0 | outb, 2, src_f)
        val_f = jnp.where(is_col0, col0_f, jnp.where(outb, oob, val_f))

        # Log-doubling composition (inclusive over k; identity fill).
        s = 1
        while s < w:
            zf = jnp.zeros((s, _LANES), jnp.int32)
            sm_s = jnp.concatenate([zf, src_m[:-s, :]], axis=0)
            vm_s = jnp.concatenate([zf, val_m[:-s, :]], axis=0)
            sf_s = jnp.concatenate([zf + 1, src_f[:-s, :]], axis=0)
            vf_s = jnp.concatenate([zf, val_f[:-s, :]], axis=0)
            pick_m = jnp.where(src_m == 0, sm_s, sf_s)
            pickv_m = jnp.where(src_m == 0, vm_s, vf_s)
            pick_f = jnp.where(src_f == 0, sm_s, sf_s)
            pickv_f = jnp.where(src_f == 0, vm_s, vf_s)
            n_src_m = jnp.where(src_m == 2, 2, pick_m)
            n_val_m = jnp.where(src_m == 2, val_m, pickv_m + val_m)
            n_src_f = jnp.where(src_f == 2, 2, pick_f)
            n_val_f = jnp.where(src_f == 2, val_f, pickv_f + val_f)
            src_m, val_m, src_f, val_f = n_src_m, n_val_m, n_src_f, n_val_f
            s *= 2

        # Evaluate at the k = -1 initial state: column j_init = i-left-1
        # (column 0 or out of band; j_init < 0 is never consumed).
        j_init = (i - left - 1)[None, :]
        cm_init = jnp.where(j_init == 0, i * pk_i,
                            jnp.maximum(i + j_init + 1, 0) * pk_i)
        cf_init = jnp.where(j_init == 0, (i + 1) * pk_i,
                            jnp.maximum(i + j_init + 1, 0) * pk_i)
        cm_scan = jnp.where(
            src_m == 2, val_m,
            jnp.where(src_m == 0, cm_init, cf_init) + val_m,
        )

        cm_store = jnp.where(in_band, cm_scan, (i + j_row + 1) * pk_i)
        cm_store = jnp.where(is_col0, col0_m, cm_store)
        ce_store = jnp.where(in_band, ce_row, (i + j_row + 1) * pk_i)
        ce_store = jnp.where(is_col0, col0_m, ce_store)

        m_ref[:] = jnp.where(in_dp_row, m_stored, m_prev)
        e_ref[:] = jnp.where(in_dp_row, e_stored, e_prev)
        cm_ref[:] = jnp.where(in_dp_row, cm_store, cm_prev)
        ce_ref[:] = jnp.where(in_dp_row, ce_store, ce_prev)
        return 0

    lax.fori_loop(1, p_max + 1, row_body, 0)

    k_final = (t_len - p_len + left)[None, :]
    m_fin = m_ref[:]
    out_ref[:] = jnp.max(
        jnp.where(k_col == k_final, m_fin, jnp.int32(_BIG_NEG)),
        axis=0, keepdims=True,
    )
    packed = jnp.max(
        jnp.where(k_col == k_final, cm_ref[:], jnp.int32(-1)),
        axis=0, keepdims=True,
    )
    # Zero-length jobs produce empty edit scripts (the CPU kernels
    # return out_len 0).
    empty = ((t_len == 0) | (p_len == 0))[None, :]
    packed = jnp.where(empty, 0, packed)
    if packed_out:
        # One int32 per job (m<<20 | mm<<10 | ind), unpacked host-side:
        # a third of the d2h bytes on the transfer-bound tunnel.
        cnt_ref[0:1, :] = packed
    else:
        cnt_ref[0:1, :] = (packed >> 20) & _PK_FIELD
        cnt_ref[1:2, :] = (packed >> 10) & _PK_FIELD
        cnt_ref[2:3, :] = packed & _PK_FIELD


@functools.partial(jax.jit, static_argnames=("band_width",))
def banded_affine_counts_pallas(
    t_codes: jnp.ndarray,  # (N, T) int8
    t_lens: jnp.ndarray,
    p_codes: jnp.ndarray,  # (N, P) int8
    p_lens: jnp.ndarray,
    band_width: int,
):
    """Returns (scores (N,), counts (N, 3) int32) — the traceback's
    (match, mismatch, indel) totals, computed forward in one pass.
    Packed-field bound: requires t_max + p_max + 2 < 1024."""
    n, t_max = t_codes.shape
    p_max = p_codes.shape[1]
    w = band_width
    assert t_max + p_max + 2 < (1 << 10), "packed count fields overflow"

    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    left = jnp.where(t_lens < p_lens, 5 + (p_lens - t_lens), 5).astype(jnp.int32)
    right = jnp.where(t_lens > p_lens, 5 + (t_lens - p_lens), 5).astype(jnp.int32)

    n_pad = ((n + _LANES - 1) // _LANES) * _LANES
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

    t_shift_len = t_max + w + 8
    ts_T = _build_ts_selshift(
        t_codes.astype(jnp.int32).T, left_p, t_max, t_shift_len,
        _shift_hi_bucket(max(5, w - 6)),
    )
    ps_T = p_codes.astype(jnp.int32).T
    meta = jnp.stack(
        [t_lens_p, p_lens_p, left_p, right_p,
         jnp.zeros_like(t_lens_p), jnp.zeros_like(t_lens_p),
         jnp.zeros_like(t_lens_p), jnp.zeros_like(t_lens_p)],
        axis=0,
    )

    grid = (n_pad // _LANES,)
    interpret = jax.default_backend() not in ("tpu", "axon")
    scores, counts = pl.pallas_call(
        functools.partial(_dp_counts_kernel, w=w, p_max=p_max),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((3, n_pad), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_shift_len, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_max, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((w, _LANES), jnp.int32),
            pltpu.VMEM((w, _LANES), jnp.int32),
            pltpu.VMEM((w, _LANES), jnp.int32),
            pltpu.VMEM((w, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(ts_T, ps_T, meta)
    return scores[0, :n], counts[:, :n].T


@functools.partial(jax.jit, static_argnames=("band_width",))
def banded_affine_counts_packed_pallas(
    t_codes: jnp.ndarray,  # (N, T) int8
    t_lens: jnp.ndarray,
    p_codes: jnp.ndarray,  # (N, P) int8
    p_lens: jnp.ndarray,
    band_width: int,
):
    """Counts kernel with PACKED output: returns (N,) int32 of
    (match<<20 | mismatch<<10 | indel) per job — the d2h-lean form for
    the tunnel-transfer-bound launch path (unpack host-side with
    unpack_counts_host).  Same DP as banded_affine_counts_pallas."""
    n, t_max = t_codes.shape
    p_max = p_codes.shape[1]
    w = band_width
    assert t_max + p_max + 2 < (1 << 10), "packed count fields overflow"

    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    left = jnp.where(t_lens < p_lens, 5 + (p_lens - t_lens), 5).astype(jnp.int32)
    right = jnp.where(t_lens > p_lens, 5 + (t_lens - p_lens), 5).astype(jnp.int32)

    n_pad = ((n + _LANES - 1) // _LANES) * _LANES
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

    t_shift_len = t_max + w + 8
    ts_T = _build_ts_selshift(
        t_codes.astype(jnp.int32).T, left_p, t_max, t_shift_len,
        _shift_hi_bucket(max(5, w - 6)),
    )
    ps_T = p_codes.astype(jnp.int32).T
    meta = jnp.stack(
        [t_lens_p, p_lens_p, left_p, right_p,
         jnp.zeros_like(t_lens_p), jnp.zeros_like(t_lens_p),
         jnp.zeros_like(t_lens_p), jnp.zeros_like(t_lens_p)],
        axis=0,
    )

    grid = (n_pad // _LANES,)
    interpret = jax.default_backend() not in ("tpu", "axon")
    _scores, packed = pl.pallas_call(
        functools.partial(_dp_counts_kernel, w=w, p_max=p_max,
                          packed_out=True),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_shift_len, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_max, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((w, _LANES), jnp.int32),
            pltpu.VMEM((w, _LANES), jnp.int32),
            pltpu.VMEM((w, _LANES), jnp.int32),
            pltpu.VMEM((w, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(ts_T, ps_T, meta)
    return packed[0, :n]


def unpack_counts_host(packed: np.ndarray) -> np.ndarray:
    """(N,) packed int32 -> (N, 3) int32 (match, mismatch, indel)."""
    out = np.empty((len(packed), 3), dtype=np.int32)
    out[:, 0] = (packed >> 20) & _PK_FIELD
    out[:, 1] = (packed >> 10) & _PK_FIELD
    out[:, 2] = packed & _PK_FIELD
    return out


# ---------------------------------------------------------------------------
# XLA mirror of the dirs kernel (any backend)
# ---------------------------------------------------------------------------
#
# Bit-for-bit the same (scores, dirs) as banded_affine_dirs_pallas, written
# as a plain lax.scan over query rows with the batch in the leading axis.
# Exists so the mesh-sharded gap stage (parallel/gap_mesh.py) runs on the
# virtual CPU device mesh of the tests/driver dry run exactly as it does on
# TPU shards, and as the compile-anywhere reference for the Pallas kernel.
# Reference semantics: AlignAlgo.hpp:218-424 (GlobalAlignment) with the
# traceback decision bits documented above _dp_dirs_kernel.


@functools.partial(jax.jit, static_argnames=("band_width",))
def banded_affine_dirs_xla(
    t_codes: jnp.ndarray,  # (N, T) int8
    t_lens: jnp.ndarray,
    p_codes: jnp.ndarray,  # (N, P) int8
    p_lens: jnp.ndarray,
    band_width: int,
):
    """Returns (scores (N,), dirs (N, P, W) int8) == the Pallas kernel."""
    import jax.lax as lax

    n, t_max = t_codes.shape
    p_max = p_codes.shape[1]
    w = band_width
    go = jnp.int32(SCORE_GAPOPEN)
    ge = jnp.int32(SCORE_GAPEXTEND)
    go_ge = go + ge
    big_neg = jnp.int32(_BIG_NEG)

    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    left = jnp.where(t_lens < p_lens, 5 + (p_lens - t_lens), 5).astype(
        jnp.int32
    )
    right = jnp.where(t_lens > p_lens, 5 + (t_lens - p_lens), 5).astype(
        jnp.int32
    )
    neg_inf = ((t_lens + 1) * (p_lens + 1) * go)[:, None]  # (N, 1)

    # Pre-shifted template rows: ts[x] = t[x - left] (pad elsewhere), so
    # row i's band window is the uniform slice ts[i-1 : i-1+w].
    # Gather-free (same construction as the Pallas shims).
    t_shift_len = t_max + w + 8
    ts = _build_ts_selshift(
        t_codes.astype(jnp.int32).T, left, t_max, t_shift_len,
        _shift_hi_bucket(max(5, w - 6)),
    ).T
    pci = p_codes.astype(jnp.int32)

    k_col = jnp.arange(w, dtype=jnp.int32)[None, :]  # (1, W)
    j0 = k_col - left[:, None]
    in_t0 = (j0 >= 0) & (j0 <= t_lens[:, None])
    m0 = jnp.where(j0 == 0, 0, jnp.where(j0 > 0, go + j0 * go, big_neg))
    e0 = jnp.where(
        j0 == 0, 0,
        jnp.where(j0 > 0, go + (p_lens[:, None] + 1) * go, big_neg),
    )
    m_init = jnp.where(in_t0, m0, neg_inf).astype(jnp.int32)
    e_init = jnp.where(in_t0, e0, neg_inf).astype(jnp.int32)

    def shift_up(a):  # band neighbour k+1
        return jnp.concatenate(
            [a[:, 1:], jnp.full((n, 1), big_neg, jnp.int32)], axis=1
        )

    def row_body(carry, i):
        m_prev, e_prev = carry
        j_row = i - left[:, None] + k_col
        in_band = (
            (j_row >= 1)
            & (j_row <= t_lens[:, None])
            & (j_row <= i + right[:, None])
        )
        in_dp_row = i <= p_lens[:, None]

        tj = lax.dynamic_slice_in_dim(ts, i - 1, w, axis=1)  # (N, W)
        pi = lax.dynamic_slice_in_dim(pci, i - 1, 1, axis=1)  # (N, 1)
        eq = (tj == pi) | (tj == _CODE_N) | (pi == _CODE_N)
        sub = jnp.where(eq, SCORE_MATCH, SCORE_MISMATCH).astype(jnp.int32)

        e_new = jnp.maximum(
            shift_up(e_prev) + ge, shift_up(m_prev) + go + ge
        )
        diag = m_prev + sub

        bound_m = (go + i * go).astype(jnp.int32)
        base = jnp.maximum(diag, e_new)
        base = jnp.where(j_row == 0, bound_m, base)
        base = jnp.where(in_band | (j_row == 0), base, big_neg)

        # horizontal-gap recurrence: exclusive running max over the band
        t_val = jnp.where(j_row == 0, bound_m, base + go) + k_col * (-ge)
        run = t_val
        s = 1
        while s < w:
            shifted = jnp.concatenate(
                [jnp.full((n, s), big_neg, jnp.int32), run[:, :-s]],
                axis=1,
            )
            run = jnp.maximum(run, shifted)
            s *= 2
        f_new = (
            jnp.concatenate(
                [jnp.full((n, 1), big_neg, jnp.int32), run[:, :-1]],
                axis=1,
            )
            - k_col * (-ge)
        )

        m_fin = jnp.maximum(base, f_new)
        m_stored = jnp.where(in_band & in_dp_row, m_fin, neg_inf)
        m_stored = jnp.where((j_row == 0) & in_dp_row, bound_m, m_stored)
        e_stored = jnp.where(in_band & in_dp_row, e_new, neg_inf)

        b0 = (f_new >= e_new).astype(jnp.int32)
        b1 = (diag == m_fin).astype(jnp.int32)
        b2 = (shift_up(m_prev) + go_ge == e_new).astype(jnp.int32)
        fill = jnp.where(
            (i - left[:, None]) == 1, bound_m, big_neg
        )
        m_left = jnp.concatenate([fill, m_stored[:, :-1]], axis=1)
        b3 = (m_left + go_ge == f_new).astype(jnp.int32)
        bits = (b0 | (b1 << 1) | (b2 << 2) | (b3 << 3)).astype(jnp.int8)

        m_next = jnp.where(in_dp_row, m_stored, m_prev)
        e_next = jnp.where(in_dp_row, e_stored, e_prev)
        return (m_next, e_next), bits

    (m_fin, _e_fin), bits_rows = lax.scan(
        row_body, (m_init, e_init),
        jnp.arange(1, p_max + 1, dtype=jnp.int32),
    )
    k_final = (t_lens - p_lens + left)[:, None]
    scores = jnp.max(
        jnp.where(k_col == k_final, m_fin, big_neg), axis=1
    )
    return scores, jnp.transpose(bits_rows, (1, 0, 2))


# ---------------------------------------------------------------------------
# XLA mirror of the forward counts kernel (any backend)
# ---------------------------------------------------------------------------
#
# Bit-for-bit the same (scores, counts) as banded_affine_counts_pallas,
# written as a lax.scan over query rows with the batch leading, so the
# mesh-sharded gap stage runs identically on virtual CPU shards and TPU
# chips, and tests cross-check the Pallas kernel on any backend.


@functools.partial(jax.jit, static_argnames=("band_width",))
def banded_affine_counts_xla(
    t_codes: jnp.ndarray,  # (N, T) int8
    t_lens: jnp.ndarray,
    p_codes: jnp.ndarray,  # (N, P) int8
    p_lens: jnp.ndarray,
    band_width: int,
):
    """Returns (scores (N,), counts (N, 3) int32) == the Pallas kernel."""
    import jax.lax as lax

    n, t_max = t_codes.shape
    p_max = p_codes.shape[1]
    w = band_width
    go = jnp.int32(SCORE_GAPOPEN)
    ge = jnp.int32(SCORE_GAPEXTEND)
    go_ge = go + ge
    big_neg = jnp.int32(_BIG_NEG)
    pk_i = jnp.int32(_PK_INDEL)

    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    left = jnp.where(t_lens < p_lens, 5 + (p_lens - t_lens), 5).astype(
        jnp.int32
    )
    right = jnp.where(t_lens > p_lens, 5 + (t_lens - p_lens), 5).astype(
        jnp.int32
    )
    neg_inf = ((t_lens + 1) * (p_lens + 1) * go)[:, None]  # (N, 1)

    t_shift_len = t_max + w + 8
    ts = _build_ts_selshift(
        t_codes.astype(jnp.int32).T, left, t_max, t_shift_len,
        _shift_hi_bucket(max(5, w - 6)),
    ).T
    pci = p_codes.astype(jnp.int32)

    k_col = jnp.arange(w, dtype=jnp.int32)[None, :]  # (1, W)
    j0 = k_col - left[:, None]
    in_t0 = (j0 >= 0) & (j0 <= t_lens[:, None])
    m0 = jnp.where(j0 == 0, 0, jnp.where(j0 > 0, go + j0 * go, big_neg))
    e0 = jnp.where(
        j0 == 0, 0,
        jnp.where(j0 > 0, go + (p_lens[:, None] + 1) * go, big_neg),
    )
    m_init = jnp.where(in_t0, m0, neg_inf).astype(jnp.int32)
    e_init = jnp.where(in_t0, e0, neg_inf).astype(jnp.int32)
    cm_init0 = jnp.where(j0 >= 0, j0 * pk_i, 0).astype(jnp.int32)
    ce_init0 = jnp.where(j0 > 0, (j0 + 1) * pk_i, 0).astype(jnp.int32)

    def shift_up(a, fill):  # band neighbour k+1
        return jnp.concatenate([a[:, 1:], fill], axis=1)

    bn_fill = jnp.full((n, 1), big_neg, jnp.int32)

    def row_body(carry, i):
        m_prev, e_prev, cm_prev, ce_prev = carry
        j_row = i - left[:, None] + k_col
        in_band = (
            (j_row >= 1)
            & (j_row <= t_lens[:, None])
            & (j_row <= i + right[:, None])
        )
        in_dp_row = i <= p_lens[:, None]

        tj = lax.dynamic_slice_in_dim(ts, i - 1, w, axis=1)  # (N, W)
        pi = lax.dynamic_slice_in_dim(pci, i - 1, 1, axis=1)  # (N, 1)
        eq = (tj == pi) | (tj == _CODE_N) | (pi == _CODE_N)
        sub = jnp.where(eq, SCORE_MATCH, SCORE_MISMATCH).astype(jnp.int32)

        e_new = jnp.maximum(
            shift_up(e_prev, bn_fill) + ge, shift_up(m_prev, bn_fill) + go_ge
        )
        diag = m_prev + sub

        bound_m = (go + i * go).astype(jnp.int32)
        base = jnp.maximum(diag, e_new)
        base = jnp.where(j_row == 0, bound_m, base)
        base = jnp.where(in_band | (j_row == 0), base, big_neg)

        t_val = jnp.where(j_row == 0, bound_m, base + go) + k_col * (-ge)
        run = t_val
        s = 1
        while s < w:
            shifted = jnp.concatenate(
                [jnp.full((n, s), big_neg, jnp.int32), run[:, :-s]],
                axis=1,
            )
            run = jnp.maximum(run, shifted)
            s *= 2
        f_new = (
            jnp.concatenate(
                [jnp.full((n, 1), big_neg, jnp.int32), run[:, :-1]],
                axis=1,
            )
            - k_col * (-ge)
        )

        m_fin = jnp.maximum(base, f_new)
        m_stored = jnp.where(in_band & in_dp_row, m_fin, neg_inf)
        m_stored = jnp.where((j_row == 0) & in_dp_row, bound_m, m_stored)
        e_stored = jnp.where(in_band & in_dp_row, e_new, neg_inf)

        b0 = f_new >= e_new
        b1 = diag == m_fin
        b2 = shift_up(m_prev, bn_fill) + go_ge == e_new
        fill = jnp.where((i - left[:, None]) == 1, bound_m, big_neg)
        m_left = jnp.concatenate([fill, m_stored[:, :-1]], axis=1)
        b3 = m_left + go_ge == f_new

        # ---- counts (see _dp_counts_kernel) ----
        j_up = ((i - 1) - left + w)[:, None]
        cm_fill = jnp.where(i == 1, j_up, (i - 1) + j_up + 1) * pk_i
        ce_fill = jnp.where(i == 1, j_up + 1, (i - 1) + j_up + 1) * pk_i
        cm_up = shift_up(cm_prev, cm_fill)
        ce_up = shift_up(ce_prev, ce_fill)
        ce_row = pk_i + jnp.where(b2, cm_up, ce_up)

        inc = jnp.where(eq, _PK_MATCH, _PK_MISMATCH).astype(jnp.int32)
        cm_diag = cm_prev + inc

        c0 = b1 | jnp.logical_not(b0)
        reset_val = jnp.where(b1, cm_diag, ce_row)
        src_m = jnp.where(c0, 2, jnp.where(b3, 0, 1)).astype(jnp.int32)
        val_m = jnp.where(c0, reset_val, pk_i)
        src_f = jnp.where(b3, 0, 1).astype(jnp.int32)
        val_f = jnp.full((n, w), _PK_INDEL, jnp.int32)

        is_col0 = j_row == 0
        col0_m = (i * pk_i).astype(jnp.int32)
        col0_f = ((i + 1) * pk_i).astype(jnp.int32)
        oob = (i + j_row + 1) * pk_i
        outb = jnp.logical_not(in_band) & jnp.logical_not(is_col0)
        src_m = jnp.where(is_col0 | outb, 2, src_m)
        val_m = jnp.where(is_col0, col0_m, jnp.where(outb, oob, val_m))
        src_f = jnp.where(is_col0 | outb, 2, src_f)
        val_f = jnp.where(is_col0, col0_f, jnp.where(outb, oob, val_f))

        s = 1
        while s < w:
            zf = jnp.zeros((n, s), jnp.int32)
            sm_s = jnp.concatenate([zf, src_m[:, :-s]], axis=1)
            vm_s = jnp.concatenate([zf, val_m[:, :-s]], axis=1)
            sf_s = jnp.concatenate([zf + 1, src_f[:, :-s]], axis=1)
            vf_s = jnp.concatenate([zf, val_f[:, :-s]], axis=1)
            pick_m = jnp.where(src_m == 0, sm_s, sf_s)
            pickv_m = jnp.where(src_m == 0, vm_s, vf_s)
            pick_f = jnp.where(src_f == 0, sm_s, sf_s)
            pickv_f = jnp.where(src_f == 0, vm_s, vf_s)
            n_src_m = jnp.where(src_m == 2, 2, pick_m)
            n_val_m = jnp.where(src_m == 2, val_m, pickv_m + val_m)
            n_src_f = jnp.where(src_f == 2, 2, pick_f)
            n_val_f = jnp.where(src_f == 2, val_f, pickv_f + val_f)
            src_m, val_m, src_f, val_f = n_src_m, n_val_m, n_src_f, n_val_f
            s *= 2

        j_init = (i - left - 1)[:, None]
        cm_i = jnp.where(j_init == 0, i * pk_i,
                         jnp.maximum(i + j_init + 1, 0) * pk_i)
        cf_i = jnp.where(j_init == 0, (i + 1) * pk_i,
                         jnp.maximum(i + j_init + 1, 0) * pk_i)
        cm_scan = jnp.where(
            src_m == 2, val_m,
            jnp.where(src_m == 0, cm_i, cf_i) + val_m,
        )

        cm_store = jnp.where(in_band, cm_scan, (i + j_row + 1) * pk_i)
        cm_store = jnp.where(is_col0, col0_m, cm_store)
        ce_store = jnp.where(in_band, ce_row, (i + j_row + 1) * pk_i)
        ce_store = jnp.where(is_col0, col0_m, ce_store)

        m_next = jnp.where(in_dp_row, m_stored, m_prev)
        e_next = jnp.where(in_dp_row, e_stored, e_prev)
        cm_next = jnp.where(in_dp_row, cm_store, cm_prev)
        ce_next = jnp.where(in_dp_row, ce_store, ce_prev)
        return (m_next, e_next, cm_next, ce_next), 0

    (m_fin2, _e, cm_fin, _ce), _ = lax.scan(
        row_body, (m_init, e_init, cm_init0, ce_init0),
        jnp.arange(1, p_max + 1, dtype=jnp.int32),
    )
    k_final = (t_lens - p_lens + left)[:, None]
    scores = jnp.max(
        jnp.where(k_col == k_final, m_fin2, big_neg), axis=1
    )
    packed = jnp.max(
        jnp.where(k_col == k_final, cm_fin, jnp.int32(-1)), axis=1
    )
    empty = (t_lens == 0) | (p_lens == 0)
    packed = jnp.where(empty, 0, packed)
    counts = jnp.stack(
        [(packed >> 20) & _PK_FIELD, (packed >> 10) & _PK_FIELD,
         packed & _PK_FIELD],
        axis=1,
    )
    return scores, counts
