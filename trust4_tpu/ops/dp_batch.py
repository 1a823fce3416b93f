"""Batched banded affine-gap DP scoring on TPU.

The reference aligns one pair at a time on the CPU (reference:
AlignAlgo.hpp:218-424, GlobalAlignment).  The TPU formulation batches N
pairs into fixed-shape code tensors and runs ONE lax.scan over query rows;
each step updates the whole (N, W) band tile on the VPU.

The horizontal-gap recurrence (f depends on m of the same row) is solved in
closed form: with gap-extend -1,

    f[j] = max_{j' < j} ( base[j'] + GAPOPEN + (j - j') * GAPEXTEND )

which is an exclusive running max of ``base[k] + GAPOPEN + k`` minus ``k``
in band coordinates — a vectorized cummax instead of a sequential loop.
Scores are bit-identical to the host oracle (cross-checked in tests); the
few alignments whose edit scripts are needed re-run on the host/native
kernel.

Band coordinates: k in [0, W); column j = i - left_band + k.  The
diagonal/vertical/horizontal neighbours land at fixed band offsets (k,
k+1, k-1), so one static tile shift per row serves every pair even though
left_band varies per pair.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from trust4_tpu.dna import NUC2NUM_256
from trust4_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

SCORE_MATCH = 2
SCORE_MISMATCH = -2
SCORE_GAPOPEN = -4
SCORE_GAPEXTEND = -1

# Code 4 marks N (wildcard); >4 marks padding.
_CODE_N = 4
_CODE_PAD = 5


def encode_for_dp(seqs: List[str], pad_len: int) -> Tuple[np.ndarray, np.ndarray]:
    batch = len(seqs)
    codes = np.full((batch, pad_len), _CODE_PAD, dtype=np.int8)
    lens = np.zeros(batch, dtype=np.int32)
    table = NUC2NUM_256.copy()
    table[ord("N")] = _CODE_N
    for i, s in enumerate(seqs):
        b = np.frombuffer(s.encode(), dtype=np.uint8)[:pad_len]
        codes[i, : len(b)] = table[b]
        lens[i] = len(b)
    return codes, lens


@functools.partial(jax.jit, static_argnames=("band_width",))
def banded_affine_scores(
    t_codes: jnp.ndarray,  # (N, T) int8
    t_lens: jnp.ndarray,   # (N,)
    p_codes: jnp.ndarray,  # (N, P) int8
    p_lens: jnp.ndarray,   # (N,)
    band_width: int,
) -> jnp.ndarray:
    """Final m[lenp][lent] for each pair (reference band: 5 + |len diff|).

    Pairs whose band 5+|diff|+... exceeds band_width-1 must be re-run on
    the host; callers check `band_ok`.
    """
    n, t_max = t_codes.shape
    p_max = p_codes.shape[1]
    w = band_width

    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    left_band = jnp.where(t_lens < p_lens, 5 + (p_lens - t_lens), 5)
    right_band = jnp.where(t_lens > p_lens, 5 + (t_lens - p_lens), 5)

    neg_inf = ((t_lens + 1) * (p_lens + 1) * SCORE_GAPOPEN).astype(jnp.int32)
    big_neg = jnp.int32(-(1 << 29))

    k_idx = jnp.arange(w, dtype=jnp.int32)[None, :]  # (1, W)

    # Row 0 initialisation in band coords: j = 0 - left + k.
    j0 = -left_band[:, None] + k_idx
    in_t0 = (j0 >= 0) & (j0 <= t_lens[:, None])
    m0 = jnp.where(
        j0 == 0,
        0,
        jnp.where(j0 > 0, SCORE_GAPOPEN + j0 * SCORE_GAPOPEN, big_neg),
    )
    e0 = jnp.where(
        j0 == 0,
        0,
        # Reference quirk: e[0][j] is seeded with the stale loop variable
        # lenp+1 (AlignAlgo.hpp:271; host.py stale_i).
        jnp.where(
            j0 > 0,
            SCORE_GAPOPEN + (p_lens[:, None] + 1) * SCORE_GAPOPEN,
            big_neg,
        ),
    )
    m0 = jnp.where(in_t0, m0, neg_inf[:, None]).astype(jnp.int32)
    e0 = jnp.where(in_t0, e0, neg_inf[:, None]).astype(jnp.int32)

    go = jnp.int32(SCORE_GAPOPEN)
    ge = jnp.int32(SCORE_GAPEXTEND)
    go_ge = go + ge

    def row_step(carry, i):
        m_prev, e_prev = carry  # (N, W) at row i-1
        # Column indices this row: j = i - left + k.
        j_row = i - left_band[:, None] + k_idx  # (N, W)
        # Reference band clamp: j in [max(i-left,1), min(i+right,lent)];
        # right band is implied by W.
        in_band = (
            (j_row >= 1)
            & (j_row <= t_lens[:, None])
            & (j_row <= i + right_band[:, None])
        )
        in_dp_row = i <= p_lens[:, None]

        # Substitution score at (i, j): text[j-1] vs query[i-1].
        tj = jnp.take_along_axis(
            t_codes, jnp.clip(j_row - 1, 0, t_max - 1).astype(jnp.int32), axis=1
        ).astype(jnp.int32)
        pi = jnp.take_along_axis(
            p_codes,
            jnp.broadcast_to(
                jnp.clip(i - 1, 0, p_max - 1), (n, 1)
            ).astype(jnp.int32),
            axis=1,
        ).astype(jnp.int32)
        eq = (tj == pi) | (tj == _CODE_N) | (pi == _CODE_N)
        sub = jnp.where(eq, SCORE_MATCH, SCORE_MISMATCH).astype(jnp.int32)

        # Vertical: (i-1, j) lives at band index k+1 in the previous row.
        shift = lambda x: jnp.concatenate(
            [x[:, 1:], jnp.full((n, 1), big_neg, dtype=jnp.int32)], axis=1
        )
        m_up = shift(m_prev)
        e_up = shift(e_prev)
        e_new = jnp.maximum(e_up + ge, m_up + go_ge)

        # Diagonal: (i-1, j-1) is the same band index k in the previous row.
        diag = m_prev + sub

        # Column-0 boundary of this row enters the band when j==0 is inside.
        bound_m = (SCORE_GAPOPEN + i * SCORE_GAPOPEN).astype(jnp.int32)
        base = jnp.maximum(diag, e_new)
        base = jnp.where(j_row == 0, bound_m, base)
        base = jnp.where(in_band | (j_row == 0), base, big_neg)

        # Horizontal gaps via exclusive running max (see module docstring).
        # The f boundary at column 0 equals the m boundary and continues
        # with only gap-extend (host.py _affine_fill f[i,0]), so its seed
        # skips the gap-open term.
        t_val = jnp.where(j_row == 0, bound_m, base + go) + k_idx * (-ge)
        run = jax.lax.cummax(t_val, axis=1)
        f_new = (
            jnp.concatenate(
                [jnp.full((n, 1), big_neg, dtype=jnp.int32), run[:, :-1]],
                axis=1,
            )
            - k_idx * (-ge)
        )

        m_new = jnp.maximum(base, f_new)
        # Out-of-band / beyond-query cells keep the sentinel.
        m_new = jnp.where(in_band & in_dp_row, m_new, neg_inf[:, None])
        m_new = jnp.where((j_row == 0) & in_dp_row, bound_m, m_new)
        e_keep = jnp.where(in_band & in_dp_row, e_new, neg_inf[:, None])

        # Freeze the final row's values so the scan can run to p_max.
        m_out = jnp.where(in_dp_row, m_new, m_prev)
        e_out = jnp.where(in_dp_row, e_keep, e_prev)

        return (m_out, e_out), None

    (m_final, _), _ = jax.lax.scan(
        row_step, (m0, e0), jnp.arange(1, p_max + 1, dtype=jnp.int32)
    )

    # Final cell (lenp, lent) in band coords of row lenp: k = lent - lenp + left.
    k_final = (t_lens - p_lens + left_band)[:, None]
    score = jnp.take_along_axis(m_final, k_final.astype(jnp.int32), axis=1)[:, 0]
    return score


def band_ok(t_lens: np.ndarray, p_lens: np.ndarray, band_width: int) -> np.ndarray:
    """Pairs whose reference band fits in the static tile."""
    diff = np.abs(t_lens.astype(np.int64) - p_lens.astype(np.int64))
    return 11 + diff <= band_width
