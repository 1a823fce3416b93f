"""Native candidate filter (libt4extract) parity vs the host HasHitInSet."""

import os

import pytest

from trust4_tpu.engine.seqset import SeqSet
from trust4_tpu.io.fastx import read_fastx
from trust4_tpu.pipeline import extract_native
from trust4_tpu.pipeline.extract import is_low_complexity

REF = "/root/reference/hg38_bcrtcr.fa"
READS = "/root/reference/example/example_1.fq"


@pytest.mark.skipif(
    not extract_native.available(), reason="native filter unavailable"
)
def test_native_filter_matches_host():
    ss = SeqSet(9)
    ss.input_ref_fa(REF)
    for hit_len in (23, 27, 31):
        ss.set_hit_len_required(hit_len)
        nf = extract_native.NativeCandidateFilter(
            [sw.consensus for sw in ss.seqs], 9, ss.radius, hit_len
        )
        reads = [rec.seq for rec in read_fastx([READS])]
        got = nf.filter_batch(reads, threads=4)
        for i, r in enumerate(reads):
            want = 0 if is_low_complexity(r) else ss.has_hit_in_set(r, 0)
            assert got[i] == want, (hit_len, i, r)


@pytest.mark.skipif(
    not extract_native.available(), reason="native filter unavailable"
)
def test_native_filter_edge_reads():
    ss = SeqSet(9)
    ss.input_ref_fa(REF)
    ss.set_hit_len_required(23)
    nf = extract_native.NativeCandidateFilter(
        [sw.consensus for sw in ss.seqs], 9, ss.radius, 23
    )
    first_ref = ss.seqs[0].consensus
    cases = [
        "ACGT",  # shorter than k
        "A" * 60,  # low complexity
        "N" * 60,
        first_ref[:50],  # exact germline fragment
        first_ref[:25] + "T" + first_ref[26:60],
        "ACGTN" * 20,
    ]
    got = nf.filter_batch(cases, threads=1)
    for i, r in enumerate(cases):
        want = 0 if is_low_complexity(r) else ss.has_hit_in_set(r, 0)
        assert got[i] == want, (i, r)
        if not is_low_complexity(r):
            assert nf.has_hit(r) == ss.has_hit_in_set(r, 0), (i, r)
