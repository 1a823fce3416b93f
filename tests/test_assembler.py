"""End-to-end assembler parity: _raw.out byte-identical to the reference
assembler on the bundled example (golden captured from the reference binary;
reference: main.cpp, trust-example-test.sh)."""

import os
import subprocess

import pytest

from trust4_tpu.pipeline.assembler import Assembler

GOLDEN = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def assembled(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("asm")
    asm = Assembler(
        os.path.join(GOLDEN, "..", "..", ".refbuild", "hg38_bcrtcr.fa")
        if os.path.exists(
            os.path.join(GOLDEN, "..", "..", ".refbuild", "hg38_bcrtcr.fa")
        )
        else "/root/reference/hg38_bcrtcr.fa",
        output_prefix=str(tmp / "t"),
    )
    sr = asm.ingest(
        [os.path.join(GOLDEN, "gold_toassemble_1.fq")],
        [os.path.join(GOLDEN, "gold_toassemble_2.fq")],
    )
    sr = asm.prepare(sr)
    idx = asm.assemble(sr)
    return asm, sr, idx


def test_raw_out_parity(assembled, tmp_path):
    asm, sr, idx = assembled
    out = tmp_path / "raw.out"
    with open(out, "w") as fp:
        asm.output_seqset(asm.seq_set, fp)
    golden = open(os.path.join(GOLDEN, "gold_raw.out")).read()
    assert out.read_text() == golden


def test_assembled_reads_parity(assembled, tmp_path):
    asm, sr, idx = assembled
    out = tmp_path / "reads.fa"
    with open(out, "w") as fp:
        asm.output_assembled_reads(sr, idx, fp)
    golden = open(os.path.join(GOLDEN, "gold_assembled_reads.fa")).read()
    assert out.read_text() == golden


def test_final_out_parity(assembled, tmp_path):
    """Full mate-extension path: _final.out byte-identical (main.cpp:2048-2312,
    SeqSet.hpp:9735-10806)."""
    asm, sr, idx = assembled
    asm.output_prefix = str(tmp_path / "t")
    asm.mate_extension(sr, idx)
    golden = open(os.path.join(GOLDEN, "gold_final.out")).read()
    assert (tmp_path / "t_final.out").read_text() == golden


def test_native_loop_matches_python_loop(tmp_path, monkeypatch):
    """The fully-native greedy loop (t4s_assemble_loop) and the Python
    loop (TRUST4_TPU_NATIVE_LOOP=0) must produce identical _raw.out,
    assembled index lists, and per-read strands."""
    ref = (
        os.path.join(GOLDEN, "..", "..", ".refbuild", "hg38_bcrtcr.fa")
        if os.path.exists(
            os.path.join(GOLDEN, "..", "..", ".refbuild", "hg38_bcrtcr.fa")
        )
        else "/root/reference/hg38_bcrtcr.fa"
    )

    def run(native_loop):
        monkeypatch.setenv("TRUST4_TPU_NATIVE_LOOP", native_loop)
        asm = Assembler(ref, output_prefix=str(tmp_path / f"t{native_loop}"))
        sr = asm.ingest(
            [os.path.join(GOLDEN, "gold_toassemble_1.fq")],
            [os.path.join(GOLDEN, "gold_toassemble_2.fq")],
        )
        sr = asm.prepare(sr)
        idx = asm.assemble(sr)
        out = tmp_path / f"raw{native_loop}.out"
        with open(out, "w") as fp:
            asm.output_seqset(asm.seq_set, fp)
        return out.read_text(), idx, [r.strand for r in sr]

    raw_n, idx_n, strands_n = run("1")
    raw_p, idx_p, strands_p = run("0")
    assert raw_n == raw_p
    assert idx_n == idx_p
    assert strands_n == strands_p


def test_kc_batches_match_per_read_calls():
    """add_count_batch / stats_trim_batch / barcode_pass vs the per-read
    entry points (incl. the stale-sort-buffer order dependence)."""
    import numpy as np

    from trust4_tpu.engine import overlap_native as on
    from trust4_tpu.ops.kmer_count import KmerCount

    if not on.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    reads = [
        "".join(rng.choice(list("ACGTN"), rng.integers(18, 60),
                           p=[0.24] * 4 + [0.04]))
        for _ in range(80)
    ]
    quals = ["".join(rng.choice(list("#5AFI"), len(r))) for r in reads]

    a = KmerCount(21)
    b = KmerCount(21)
    for r in reads:
        a.add_count(r)
    b._native.add_count_batch(reads)
    i64, f64 = b._native.stats_trim_batch(reads, quals)
    for i, (r, q) in enumerate(zip(reads, quals)):
        rr, qq, mn, med, avg, ok = a.get_count_stats_and_trim(r, q)
        new_len = int(i64[i, 3])
        got_r = r if new_len < 0 else r[:new_len]
        assert got_r == rr
        assert (int(i64[i, 0]), int(i64[i, 1])) == (mn, med)
        assert f64[i] == avg or (avg != avg and f64[i] != f64[i])

    # barcode pass: groups of consecutive equal barcodes
    bcs = sorted(int(rng.integers(0, 7)) for _ in reads)
    res = on.barcode_pass(21, reads, bcs, max(len(r) for r in reads), 3)
    assert res is not None
    mins, meds, avgs = res
    i = 0
    while i < len(reads):
        j = i + 1
        while j < len(reads) and bcs[j] == bcs[i]:
            j += 1
        kc = KmerCount(21)
        kc.max_read_len = max(len(r) for r in reads)
        for k in range(i, j):
            kc.add_count(reads[k])
        for k in range(i, j):
            _, _, mn, med, avg, _ = kc.get_count_stats_and_trim(
                reads[k], None
            )
            assert int(mins[k]) == mn and int(meds[k]) == med
            assert float(avgs[k]) == avg or (avg != avg)
        i = j


def test_fastx_bulk_matches_streaming(tmp_path):
    """The whole-file FASTQ fast path must yield the same records as the
    streaming parser (incl. comments, /1 suffix strip, qual lines that
    start with '@')."""
    from trust4_tpu.io import fastx

    p = tmp_path / "x.fq"
    recs = [
        ("@r1/1 comment here", "ACGT", "@@@@"),  # qual starts with '@'
        ("@r2", "GGTTAA", "IIIIII"),
        ("@r3\textra", "ACGTACGTACGT", "############"),
    ]
    with open(p, "w") as f:
        for h, s, q in recs:
            f.write(f"{h}\n{s}\n+\n{q}\n")
    bulk = fastx._read_fastq_bulk(str(p))

    # The streaming parser's fastq logic, inlined (reference comparison).
    def stream_read(path):
        out = []
        with open(path) as f:
            it = iter(f)
            line = next(it, "")
            while line:
                if line[0] == "@":
                    rid, comment = fastx._parse_header(line)
                    seq = next(it, "").strip()
                    next(it, "")
                    qual = next(it, "").rstrip("\n").rstrip("\r")
                    out.append((rid, seq, qual, comment))
                    line = next(it, "")
                else:
                    line = next(it, "")
        return out

    want = stream_read(str(p))
    assert bulk is not None
    got = [(r.id, r.seq, r.qual, r.comment) for r in bulk]
    assert got == want


def test_native_loop_kmer_growth_parity(tmp_path, monkeypatch):
    """In-loop kmer-length growth (change_kmer_length at the contig-count
    threshold, main.cpp change path): the native loop must recompute the
    nomatch gap limit exactly like the Python loop's per-call _sconf(),
    and sync the final k back to the Python engine.  A tiny threshold
    forces several growth steps on the example corpus."""
    ref = (
        os.path.join(GOLDEN, "..", "..", ".refbuild", "hg38_bcrtcr.fa")
        if os.path.exists(
            os.path.join(GOLDEN, "..", "..", ".refbuild", "hg38_bcrtcr.fa")
        )
        else "/root/reference/hg38_bcrtcr.fa"
    )

    def run(native_loop):
        monkeypatch.setenv("TRUST4_TPU_NATIVE_LOOP", native_loop)
        asm = Assembler(ref, output_prefix=str(tmp_path / f"g{native_loop}"))
        asm.change_kmer_length_threshold = 8  # force growth early + often
        sr = asm.ingest(
            [os.path.join(GOLDEN, "gold_toassemble_1.fq")],
            [os.path.join(GOLDEN, "gold_toassemble_2.fq")],
        )
        sr = asm.prepare(sr)
        idx = asm.assemble(sr)
        out = tmp_path / f"graw{native_loop}.out"
        with open(out, "w") as fp:
            asm.output_seqset(asm.seq_set, fp)
        return (out.read_text(), idx, asm.index_kmer_length,
                asm.seq_set.kmer_length, asm.seq_set.nomatch_gap_limit)

    raw_n, idx_n, kl_n, skl_n, ngl_n = run("1")
    raw_p, idx_p, kl_p, skl_p, ngl_p = run("0")
    assert kl_n > 9  # the growth actually fired
    assert (kl_n, skl_n, ngl_n) == (kl_p, skl_p, ngl_p)
    assert raw_n == raw_p
    assert idx_n == idx_p
