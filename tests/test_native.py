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


def test_interleaved_variant_buffer_reuse():
    """Regression: the banded affine and linear-gap variants share the g_bm
    band buffer; a large posweight call followed by a smaller affine call
    must not leave the affine e/f buffers unallocated (segfault found by
    ASan in round 2)."""
    import numpy as np

    from trust4_tpu.align import host as align_host
    from trust4_tpu.align import native as align_native

    if not align_native.available():
        return
    rng = np.random.default_rng(7)
    bases = "ACGT"
    for trial in range(30):
        lp = int(rng.integers(150, 400))
        t_big = "".join(bases[i] for i in rng.integers(0, 4, lp))
        p_big = "".join(bases[i] for i in rng.integers(0, 4, lp - 3))
        w = np.zeros((len(t_big), 4), dtype=np.int32)
        for i, c in enumerate(t_big):
            w[i, bases.index(c)] = 2
        align_native.global_alignment_posweight(w, p_big)
        ls = int(rng.integers(5, 120))
        t_s = "".join(bases[i] for i in rng.integers(0, 4, ls))
        p_s = "".join(bases[i] for i in rng.integers(0, 4, max(2, ls - 2)))
        sn, an = align_native.global_alignment(t_s, p_s)
        sh, ah = align_host.global_alignment(t_s, p_s)
        assert sn == sh and list(an) == list(ah)
