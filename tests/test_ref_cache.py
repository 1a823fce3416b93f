"""Parsed-reference disk cache + lazy host k-mer index (round 4).

InputRefFa's parse (IMGT gap stripping, CDR coordinate derivation, FGxG
motif scan, gap-shift voting) is deterministic in the file bytes and
flags, so a disk cache must reproduce the uncached load bit-for-bit —
including the post-shift CDR coordinates.  The host-dict k-mer index
defers its Python postings build until first host search; the flush
must replay builds in call order so postings insertion order (part of
the determinism contract) is unchanged.
"""

import os

from trust4_tpu.engine.seqset import SeqSet
from trust4_tpu.ops.kmer_index import KmerIndex


def _load(path, is_imgt, cache_dir):
    os.environ["TRUST4_TPU_CACHE_DIR"] = cache_dir
    s = SeqSet(9)
    s.input_ref_fa(path, is_imgt=is_imgt)
    return s


def test_ref_cache_roundtrip_imgt(tmp_path, reference_dir, monkeypatch):
    fa = os.path.join(reference_dir, "human_IMGT+C.fa")
    cache = str(tmp_path / "cache")
    monkeypatch.setenv("TRUST4_TPU_CACHE_DIR", cache)
    cold = SeqSet(9)
    cold.input_ref_fa(fa, is_imgt=True)
    assert os.listdir(cache), "cache file not written"
    warm = SeqSet(9)
    warm.input_ref_fa(fa, is_imgt=True)
    assert len(cold.seqs) == len(warm.seqs) > 900
    for a, b in zip(cold.seqs, warm.seqs):
        assert a.name == b.name
        assert a.consensus == b.consensus
        assert a.info == b.info
        assert a.is_ref and b.is_ref


def test_ref_cache_disabled_env(tmp_path, reference_dir, monkeypatch):
    monkeypatch.setenv("TRUST4_TPU_CACHE_DIR", str(tmp_path / "c2"))
    monkeypatch.setenv("TRUST4_TPU_REF_CACHE", "0")
    s = SeqSet(9)
    s.input_ref_fa(os.path.join(reference_dir, "hg38_bcrtcr.fa"))
    assert len(s.seqs) > 500
    assert not os.path.exists(str(tmp_path / "c2"))


def test_lazy_host_index_flush_order():
    """Deferred host builds must flush in call order, interleaved
    correctly with direct inserts and removals."""
    eager = KmerIndex()
    eager.native = None  # host-dict only
    lazy = KmerIndex()
    lazy.native = None

    seqs = ["ACGTACGTACGTAAA", "TTTACGTACGTACGT", "ACGTACGTACGTAAA"]
    for idx in (eager, lazy):
        for sid, s in enumerate(seqs):
            idx._host_build_from_read(
                s, 9, sid, -1, 0
            ) if idx is eager else idx.build_from_read(s, 9, sid, -1)
        idx.insert(123, 7, 5, -1)  # forces a flush on the lazy side
        idx.remove_from_read(seqs[1], 9, 1, -1)

    assert eager._index == lazy._index
    # a search after everything still matches
    from trust4_tpu.ops.kmer import kmer_codes

    codes, valid = kmer_codes(seqs[0], 9)
    for w in range(len(codes)):
        if valid[w]:
            assert eager.search(int(codes[w]), -1) == lazy.search(
                int(codes[w]), -1
            )
