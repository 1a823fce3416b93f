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
_BIG_NEG = -(1 << 29)


def _dp_kernel(ts_ref, ps_ref, meta_ref, out_ref, m_ref, e_ref, *, w, p_max):
    """One batch tile: ts (T_pad, 128) pre-shifted text codes, ps (P, 128)
    query codes, meta (8, 128) = [t_len, p_len, left, right, ...]."""
    import jax.lax as lax

    t_len = meta_ref[0, :]  # (128,)
    p_len = meta_ref[1, :]
    left = meta_ref[2, :]
    right = meta_ref[3, :]

    k_col = lax.broadcasted_iota(jnp.int32, (w, _LANES), 0)  # band index k
    neg_inf = ((t_len + 1) * (p_len + 1) * SCORE_GAPOPEN).astype(jnp.int32)
    neg_inf = neg_inf[None, :]  # (1, 128) broadcasts over k
    big_neg = jnp.int32(_BIG_NEG)
    go = jnp.int32(SCORE_GAPOPEN)
    ge = jnp.int32(SCORE_GAPEXTEND)

    # Row 0 in band coordinates: j = -left + k.
    j0 = k_col - left[None, :]
    in_t0 = (j0 >= 0) & (j0 <= t_len[None, :])
    m0 = jnp.where(
        j0 == 0,
        0,
        jnp.where(j0 > 0, go + j0 * go, big_neg),
    )
    # Reference quirk: e[0][j] seeded with the stale loop variable lenp+1.
    e0 = jnp.where(
        j0 == 0,
        0,
        jnp.where(j0 > 0, go + (p_len[None, :] + 1) * go, big_neg),
    )
    m_ref[:] = jnp.where(in_t0, m0, neg_inf).astype(jnp.int32)
    e_ref[:] = jnp.where(in_t0, e0, neg_inf).astype(jnp.int32)

    def shift_up(x):  # band index k reads k+1 of the previous row
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

        # Pre-shifted text: t[j_row - 1] == ts[i - 1 + k].
        tj = ts_ref[pl.ds(i - 1, w), :]
        pi = ps_ref[pl.ds(i - 1, 1), :]  # (1, LANES)
        eq = (tj == pi) | (tj == _CODE_N) | (pi == _CODE_N)
        sub = jnp.where(eq, SCORE_MATCH, SCORE_MISMATCH).astype(jnp.int32)

        e_new = jnp.maximum(shift_up(e_prev) + ge, shift_up(m_prev) + go + ge)
        diag = m_prev + sub

        bound_m = (go + i * go).astype(jnp.int32)
        base = jnp.maximum(diag, e_new)
        base = jnp.where(j_row == 0, bound_m, base)
        base = jnp.where(in_band | (j_row == 0), base, big_neg)

        # Exclusive running max over k (horizontal gaps), via doubling.
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

        m_new = jnp.maximum(base, f_new)
        m_new = jnp.where(in_band & in_dp_row, m_new, neg_inf)
        m_new = jnp.where((j_row == 0) & in_dp_row, bound_m, m_new)
        e_keep = jnp.where(in_band & in_dp_row, e_new, neg_inf)

        m_ref[:] = jnp.where(in_dp_row, m_new, m_prev)
        e_ref[:] = jnp.where(in_dp_row, e_keep, e_prev)
        return 0

    lax.fori_loop(1, p_max + 1, row_body, 0)

    # Final cell (p_len, t_len): band index k = t_len - p_len + left.
    k_final = (t_len - p_len + left)[None, :]
    m_fin = m_ref[:]
    out_ref[:] = jnp.max(
        jnp.where(k_col == k_final, m_fin, big_neg), axis=0, keepdims=True
    )


import jax.experimental.pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


@functools.partial(jax.jit, static_argnames=("band_width",))
def banded_affine_scores_pallas(
    t_codes: jnp.ndarray,  # (N, T) int8
    t_lens: jnp.ndarray,
    p_codes: jnp.ndarray,  # (N, P) int8
    p_lens: jnp.ndarray,
    band_width: int,
) -> jnp.ndarray:
    n, t_max = t_codes.shape
    p_max = p_codes.shape[1]
    w = band_width

    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    left = jnp.where(t_lens < p_lens, 5 + (p_lens - t_lens), 5).astype(jnp.int32)
    right = jnp.where(t_lens > p_lens, 5 + (t_lens - p_lens), 5).astype(jnp.int32)

    # Pad batch to a lane multiple; give pads l=0 lens (score slot unused).
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

    # Shift each text row right by its left_band so the kernel's band
    # window is the uniform slice ts[i-1 : i-1+W].
    t_shift_len = t_max + w + 8
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

    ts_T = ts.T  # (T_shift, n_pad)
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

    grid = (n_pad // _LANES,)
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        functools.partial(_dp_kernel, w=w, p_max=p_max),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_shift_len, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_max, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _LANES), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((w, _LANES), jnp.int32),
            pltpu.VMEM((w, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(ts_T, ps_T, meta)
    return out[0, :n]
