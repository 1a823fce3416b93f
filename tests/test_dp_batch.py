"""TPU batched banded-DP scores are bit-identical to the host oracle
(reference: AlignAlgo.hpp:218-424; runs on CPU backend in tests)."""

import random

import numpy as np
import pytest

from trust4_tpu.align import host
from trust4_tpu.ops.dp_batch import (
    band_ok,
    banded_affine_scores,
    encode_for_dp,
)


def test_batched_scores_match_oracle():
    pytest.importorskip("jax")
    random.seed(23)

    def rseq(n):
        return "".join(
            random.choice("ACGTN" if random.random() < 0.08 else "ACGT")
            for _ in range(n)
        )

    pairs = []
    for _ in range(120):
        lt = random.randrange(2, 90)
        lp = max(2, lt + random.randrange(-8, 9))
        pairs.append((rseq(lt), rseq(lp)))
    tc, tl = encode_for_dp([t for t, p in pairs], 96)
    pc, pl = encode_for_dp([p for t, p in pairs], 96)
    W = 32
    ok = band_ok(tl, pl, W)
    scores = np.asarray(banded_affine_scores(tc, tl, pc, pl, W))
    checked = 0
    for i, (t, p) in enumerate(pairs):
        if not ok[i]:
            continue
        ref, _ = host.global_alignment_py(t, p)
        assert ref == scores[i], (i, t, p)
        checked += 1
    assert checked > 100
