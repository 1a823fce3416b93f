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
