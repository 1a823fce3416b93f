"""TPU prefilter: conservative superset of the exact candidate filter
(reference: SeqSet.hpp:3144 HasHitInSet; runs on CPU backend in tests)."""

import numpy as np
import pytest

from trust4_tpu.io.fastx import read_fastx
from trust4_tpu.ops.encode import pack_reads, window_codes_batch
from trust4_tpu.ops.kmer import kmer_codes


def test_window_codes_batch_matches_rolling():
    reads = ["ACGTACGTACGTNNACGTACG", "TTTTGGGGCCCCAAAATTTT"]
    mat = pack_reads(reads, 24)
    codes, valid = window_codes_batch(mat, 9)
    for i, r in enumerate(reads):
        c, v = kmer_codes(r, 9)
        n = len(c)
        assert np.array_equal(codes[i, :n], c.astype(np.int64) & 0x7FFFFFFF)
        assert np.array_equal(valid[i, :n], v)
        # padding windows are invalid
        assert not valid[i, n:].any()


def test_prefilter_no_false_negatives():
    jax = pytest.importorskip("jax")
    from trust4_tpu.engine.seqset import SeqSet
    from trust4_tpu.ops.prefilter import TpuPrefilter

    ref = SeqSet(9)
    ref.input_ref_fa("/root/reference/hg38_bcrtcr.fa")
    ref.set_hit_len_required(27)
    refs = [sw.consensus for sw in ref.seqs]
    pf = TpuPrefilter(refs, k=9, hit_len_required=27)

    reads = [r.seq for r in read_fastx("/root/reference/example/example_1.fq")]
    mask = pf(reads, pad_len=128)
    for i, r in enumerate(reads):
        if ref.has_hit_in_set(r, 0) != 0:
            assert mask[i], f"read {i} passed exact filter but not prefilter"


def test_cluster_prefilter_conservative_and_selective():
    """Diagonal-cluster kernel: strict superset of the exact filter on
    mixed random/receptor reads, and selective at long-read thresholds."""
    import numpy as np
    import jax.numpy as jnp

    from trust4_tpu.engine.seqset import SeqSet
    from trust4_tpu.ops.encode import pack_reads, window_codes_batch
    from trust4_tpu.ops.prefilter import (
        build_posting_tables,
        seq_count_prefilter_kernel,
    )

    ss = SeqSet(9)
    ss.input_ref_fa("/root/reference/hg38_bcrtcr.fa")
    seqs = [sw.consensus for sw in ss.seqs]
    post, ovf, rc_post, rc_ovf = build_posting_tables(seqs, 9)
    args = (
        jnp.asarray(post), jnp.asarray(ovf),
        jnp.asarray(rc_post), jnp.asarray(rc_ovf),
    )

    rng = np.random.default_rng(1)
    reads = ["".join(rng.choice(list("ACGT"), size=100)) for _ in range(48)]
    ref_frag = [s for s in seqs if len(s) > 140][:16]
    reads += [s[20:120] for s in ref_frag]  # true candidates
    mat = pack_reads(reads, 128)
    codes, valid = window_codes_batch(mat, 9)
    cd, vd = jnp.asarray(codes), jnp.asarray(valid)

    mask23 = np.asarray(
        seq_count_prefilter_kernel(cd, vd, *args, 9, 23, 10)
    )
    # conservativeness: every exact candidate survives
    ss.set_hit_len_required(23)
    for i, r in enumerate(reads):
        if ss.has_hit_in_set(r, 0) != 0:
            assert mask23[i], i

    # selectivity at a long-read threshold: random reads rejected,
    # germline fragments of sufficient length kept when they pass exactly
    mask80 = np.asarray(
        seq_count_prefilter_kernel(cd, vd, *args, 9, 80, 10)
    )
    n_random_pass = int(mask80[:48].sum())
    assert n_random_pass <= 4, n_random_pass
    ss.set_hit_len_required(80)
    for i, r in enumerate(reads):
        if ss.has_hit_in_set(r, 0) != 0:
            assert mask80[i], i
