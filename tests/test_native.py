"""Native C++ kernel parity vs the pure-Python oracle (randomized
cross-check; the oracle itself is reference-parity-tested)."""

import random

import numpy as np
import pytest

from trust4_tpu.align import host, native


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_matches_oracle():
    random.seed(17)
    rng = np.random.default_rng(17)

    def rseq(n):
        return "".join(
            random.choice("ACGTN" if random.random() < 0.1 else "ACGT")
            for _ in range(n)
        )

    for _ in range(400):
        lt = random.randrange(0, 40)
        lp = random.randrange(0, 40)
        t, p = rseq(lt), rseq(lp)
        assert host.global_alignment_py(t, p) == native.global_alignment(t, p)
        w = rng.integers(0, 5, size=(lt, 4)).astype(np.int32)
        assert host.global_alignment_posweight_py(
            w, p
        ) == native.global_alignment_posweight(w, p)
        assert host.global_alignment_one_end_py(
            t, p, 0, 0.25
        ) == native.global_alignment_one_end(t, p, 0, 0.25)
        assert host.local_alignment_py(t, p) == native.local_alignment(t, p)
        assert host.is_mate_overlap_py(t, p, 5) == native.is_mate_overlap(
            t, p, 5
        )
