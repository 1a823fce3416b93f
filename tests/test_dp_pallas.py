"""Pallas banded-DP kernel parity vs the XLA formulation and host oracle.

Runs in interpret mode on CPU (tests force JAX_PLATFORMS=cpu); on a real
chip the same checks run compiled (see bench.py).
"""

import numpy as np
import pytest

from trust4_tpu.align import host as align_host
from trust4_tpu.ops.dp_batch import banded_affine_scores, encode_for_dp
from trust4_tpu.ops.dp_pallas import banded_affine_scores_pallas


def _rand_pairs(rng, n, lo=20, hi=120):
    pairs = []
    for _ in range(n):
        lt = int(rng.integers(lo, hi))
        lp = int(np.clip(lt + rng.integers(-6, 7), 5, hi))
        t = "".join(rng.choice(list("ACGT"), lt))
        p_list = list(t[:lp].ljust(lp, "A"))
        for _ in range(int(rng.integers(0, 6))):
            p_list[int(rng.integers(0, lp))] = rng.choice(list("ACGTN"))
        pairs.append((t, "".join(p_list)))
    return pairs


import jax

# On a real device the kernel compiles; on CPU it runs in the (slow)
# pallas interpreter, so shrink the corpus there.
_ON_DEVICE = jax.default_backend() in ("tpu", "axon")


def test_pallas_matches_xla_random():
    rng = np.random.default_rng(3)
    pairs = _rand_pairs(rng, 192 if _ON_DEVICE else 16, hi=120 if _ON_DEVICE else 60)
    W = 32
    tmax = max(len(t) for t, _ in pairs)
    pmax = max(len(p) for _, p in pairs)
    tc, tl = encode_for_dp([t for t, _ in pairs], tmax)
    pc, pl_ = encode_for_dp([p for _, p in pairs], pmax)
    a = np.asarray(banded_affine_scores(tc, tl, pc, pl_, W))
    b = np.asarray(banded_affine_scores_pallas(tc, tl, pc, pl_, W))
    np.testing.assert_array_equal(a, b)


def test_pallas_matches_host_oracle():
    rng = np.random.default_rng(7)
    pairs = _rand_pairs(rng, 32 if _ON_DEVICE else 6, lo=15, hi=60 if _ON_DEVICE else 40)
    W = 32
    tmax = max(len(t) for t, _ in pairs)
    pmax = max(len(p) for _, p in pairs)
    tc, tl = encode_for_dp([t for t, _ in pairs], tmax)
    pc, pl_ = encode_for_dp([p for _, p in pairs], pmax)
    got = np.asarray(banded_affine_scores_pallas(tc, tl, pc, pl_, W))
    for i, (t, p) in enumerate(pairs):
        want, _ = align_host.global_alignment_py(t, p)
        assert got[i] == want, (i, t, p)
