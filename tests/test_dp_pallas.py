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


# ---------------------------------------------------------------------------
# Forward counts kernel (round 5): scores + traceback (match, mismatch,
# indel) in one gather-free pass — the shipping tier kernel of
# ops/gap_oracle and the per-shard kernel of parallel/gap_mesh.
# ---------------------------------------------------------------------------


def _rand_gap_jobs(rng, n, cap, w):
    """Tier-shaped jobs: mutated copies (the real gap-fill distribution)
    plus random pairs, indels included, a few zero-length rows."""
    from trust4_tpu.ops.dp_batch import _CODE_PAD

    code = {c: i for i, c in enumerate("ACGTN")}
    maxd = w - 11
    ts, ps = [], []
    for _ in range(n):
        lt = int(rng.integers(1, cap + 1))
        t = "".join(rng.choice(list("ACGT"), lt))
        p = list(t)
        for _ in range(int(rng.integers(0, 5))):
            r = rng.random()
            i = int(rng.integers(0, max(1, len(p))))
            if r < 0.6 and p:
                p[i] = str(rng.choice(list("ACGTN")))
            elif r < 0.8 and len(p) > 1:
                del p[i]
            else:
                p.insert(i, str(rng.choice(list("ACGT"))))
        p = "".join(p)[:cap] or "A"
        if abs(len(p) - len(t)) > maxd:
            p = p[: len(t) + maxd] if len(p) > len(t) else p
            t = t[: len(p) + maxd]
        ts.append(t)
        ps.append(p)
    tc = np.full((n, cap), _CODE_PAD, np.int8)
    pc = np.full((n, cap), _CODE_PAD, np.int8)
    tl = np.zeros(n, np.int32)
    pl_ = np.zeros(n, np.int32)
    for i, (t, p) in enumerate(zip(ts, ps)):
        tc[i, : len(t)] = [code[c] for c in t]
        pc[i, : len(p)] = [code[c] for c in p]
        tl[i], pl_[i] = len(t), len(p)
    for i in rng.choice(n, max(1, n // 30), replace=False):
        if rng.random() < 0.5:
            tl[i] = 0
        else:
            pl_[i] = 0
    return ts, ps, tc, tl, pc, pl_


@pytest.mark.parametrize("cap,w", [(16, 16), (48, 24), (144, 48)])
def test_counts_xla_matches_native(cap, w):
    from trust4_tpu.ops.dp_pallas import banded_affine_counts_xla
    import trust4_tpu.align.native as an

    rng = np.random.default_rng(cap * 7 + w)
    ts, ps, tc, tl, pc, pl_ = _rand_gap_jobs(rng, 160, cap, w)
    _s, counts = banded_affine_counts_xla(tc, tl, pc, pl_, w)
    counts = np.asarray(counts)
    for i in range(len(ts)):
        if tl[i] == 0 or pl_[i] == 0:
            want = (0, 0, 0)
        else:
            want = an.global_alignment_counts(ts[i][: tl[i]], ps[i][: pl_[i]])
        assert tuple(int(v) for v in counts[i]) == want, (
            i, ts[i][: tl[i]], ps[i][: pl_[i]])


def test_counts_pallas_matches_xla():
    from trust4_tpu.ops.dp_pallas import (
        banded_affine_counts_pallas,
        banded_affine_counts_xla,
    )

    cap, w = (48, 24)
    rng = np.random.default_rng(11)
    n = 256 if _ON_DEVICE else 48
    _ts, _ps, tc, tl, pc, pl_ = _rand_gap_jobs(rng, n, cap, w)
    sx, cx = banded_affine_counts_xla(tc, tl, pc, pl_, w)
    sp, cp = banded_affine_counts_pallas(tc, tl, pc, pl_, w)
    np.testing.assert_array_equal(np.asarray(sx), np.asarray(sp))
    np.testing.assert_array_equal(np.asarray(cx), np.asarray(cp))


def test_fused_launch_protocol_matches_raw():
    """The v2 fused launch path (pack_launch_host + tier_counts_fused:
    one uint8 buffer in, packed int32 counts out, incl. the chunk/4 tail
    shape) must be bit-equal to the raw tier kernel for every tier."""
    from trust4_tpu.ops.dp_pallas import unpack_counts_host
    from trust4_tpu.ops.gap_oracle import (
        _tier_counts_fn,
        _tier_counts_fused_fn,
        pack_launch_host,
    )

    rng = np.random.default_rng(5)
    raw = _tier_counts_fn()
    fused = _tier_counts_fused_fn()
    for (s_cap, w_cap, chunk) in ((16, 16, 512), (48, 24, 256)):
        for m in (chunk, chunk // 4 - 3):
            tl = rng.integers(1, s_cap + 1, m).astype(np.int32)
            pl_ = rng.integers(1, s_cap + 1, m).astype(np.int32)
            pos = np.arange(s_cap)[None, :]
            tc = np.where(pos < tl[:, None],
                          rng.integers(0, 5, (m, s_cap)), 5).astype(np.int8)
            pc = np.where(pos < pl_[:, None],
                          rng.integers(0, 5, (m, s_cap)), 5).astype(np.int8)
            want = np.asarray(raw(tc, tl, pc, pl_, w=w_cap, p_max=s_cap))
            n_rows = chunk if m > chunk // 4 else chunk // 4
            buf = pack_launch_host(tc, pc, tl, pl_, n_rows, s_cap)
            packed = np.asarray(
                fused(buf, w=w_cap, p_max=s_cap, n_rows=n_rows)
            )
            got = unpack_counts_host(packed[:m])
            np.testing.assert_array_equal(want, got,
                                          err_msg=f"{s_cap}/{m}")
