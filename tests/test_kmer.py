"""K-mer codec/count parity tests vs reference semantics."""

import os

from trust4_tpu.ops.kmer import (
    canonical_codes,
    code_to_seq,
    kmer_codes,
    revcomp_code,
)
from trust4_tpu.ops.kmer_count import KmerCount
from trust4_tpu.ops.kmer_index import KmerIndex

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_kmer_codes_basic():
    codes, valid = kmer_codes("ACGT", 2)
    # A=0 C=1 G=2 T=3; first base in high bits
    assert codes.tolist() == [0b0001, 0b0110, 0b1011]
    assert valid.tolist() == [True, True, True]


def test_kmer_codes_n_handling():
    codes, valid = kmer_codes("ANGT", 2)
    # N packs as 0 bits but invalidates covering windows
    assert valid.tolist() == [False, False, True]
    assert codes.tolist() == [0b0000, 0b0010, 0b1011]


def test_canonical_matches_scalar():
    seq = "ACGTTGCANTTACGGAT"
    k = 5
    codes, _ = kmer_codes(seq, k)
    canon = canonical_codes(codes, k)
    for c, cc in zip(codes.tolist(), canon.tolist()):
        rc = revcomp_code(c, k)
        assert cc == min(c, rc)


def test_code_roundtrip():
    codes, _ = kmer_codes("GATTACA", 7)
    assert code_to_seq(int(codes[0]), 7) == "GATTACA"


def test_index_consecutive_duplicate_suppression():
    idx = KmerIndex()
    # AAAA run: window 0 (code 0) skipped, window 1 always inserted,
    # later identical windows suppressed (KmerIndex.hpp:132 semantics).
    idx.build_from_read("AAAAAA", 3, sid=7, barcode=-1)
    assert idx.search(0, -1) == [(7, 1)]

    idx2 = KmerIndex()
    idx2.build_from_read("ACGACG", 3, sid=1, barcode=-1)
    # windows: ACG CGA GAC ACG -> all distinct from predecessor => inserted
    codes, _ = kmer_codes("ACGACG", 3)
    assert idx2.search(int(codes[0]), -1) == [(1, 0), (1, 3)]


def test_index_barcode_isolation():
    idx = KmerIndex(consider_barcode=True)
    idx.build_from_read("ACGTACGT", 4, sid=1, barcode=5)
    idx.build_from_read("ACGTACGT", 4, sid=2, barcode=6)
    codes, _ = kmer_codes("ACGTACGT", 4)
    c0 = int(codes[0])
    assert idx.search(c0, 5) == [(1, 0), (1, 4)]
    assert idx.search(c0, 6) == [(2, 0), (2, 4)]
    assert idx.search(c0, 7) == []


def test_kmer_count_stats_and_trim_matches_reference():
    golden = []
    with open(os.path.join(DATA, "kmercount_golden.tsv")) as f:
        for line in f:
            p = line.rstrip("\n").split("\t")
            golden.append(p)

    kc = KmerCount(21)
    for p in golden:
        kc.add_count(p[0])
    kc.max_read_len = max(len(p[0]) for p in golden)

    for p in golden:
        read, qual_s, has_qual, trimmed, min_c, med_c, avg_c, ret = p
        qual = qual_s if has_qual == "1" else None
        got_read, _, got_min, got_med, got_avg, got_ret = (
            kc.get_count_stats_and_trim(read, qual)
        )
        assert got_ret == int(ret), read
        assert got_min == int(min_c), read
        assert got_med == int(med_c), read
        # reference prints float32 avg with %.6g
        assert f"{float(f'{got_avg:.6g}'):g}" == f"{float(avg_c):g}" or abs(
            got_avg - float(avg_c)
        ) <= max(1e-4 * abs(float(avg_c)), 1e-4), (read, got_avg, avg_c)
        want_read = "" if trimmed == "-" else trimmed
        assert got_read == want_read, read
