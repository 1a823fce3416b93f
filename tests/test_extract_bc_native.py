"""Native barcoded extraction stream (t4x_extract_stream_bc) vs the
Python loop (the differential oracle), byte-for-byte on every output
file, across format shapes: bc+um slices from a shared file, r1/r2
sub-slicing, minus-strand segments, multi-segment barcodes, and the
barcode==read low-complexity artifact guard
(reference: FastqExtractor.cpp:407-545, ReadFormatter.hpp:288-405)."""

import os
import random

import pytest

from trust4_tpu.pipeline import extract_native
from trust4_tpu.pipeline.extract import run_barcoded_extractor


def _write_fq(path, recs):
    with open(path, "w") as fp:
        for name, seq in recs:
            fp.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, reference_dir):
    d = tmp_path_factory.mktemp("bcx")
    rng = random.Random(7)
    # Pull a few real receptor segments so some reads are candidates.
    segs = []
    cur = []
    with open(os.path.join(reference_dir, "hg38_bcrtcr.fa")) as fp:
        for line in fp:
            if line.startswith(">"):
                if cur:
                    segs.append("".join(cur))
                cur = []
            else:
                cur.append(line.strip().upper())
            if len(segs) > 40:
                break
    reads1, reads2, bcs = [], [], []
    for i in range(800):
        if rng.random() < 0.4:
            src = rng.choice(segs)
            if len(src) > 120:
                at = rng.randrange(0, len(src) - 100)
                seq = src[at : at + 100]
            else:
                seq = (src * 3)[:100]
        else:
            seq = "".join(rng.choice("ACGT") for _ in range(100))
        reads1.append((f"r{i}", seq))
        reads2.append((f"r{i}", seq[::-1]))
        if i % 97 == 0:
            bc = "A" * 16 + "CGTACGTAGC"  # low-complexity barcode
        else:
            bc = "".join(rng.choice("ACGT") for _ in range(26))
        bcs.append((f"r{i}", bc))
    _write_fq(str(d / "r1.fq"), reads1)
    _write_fq(str(d / "r2.fq"), reads2)
    _write_fq(str(d / "bc.fq"), bcs)
    return d


FORMATS = [
    ("bc:0:15,um:16:25", False),
    ("bc:0:7,bc:10:15,um:16:25:-", False),  # multi-segment + minus umi
    ("bc:0:15,um:16:25,r1:5:80", False),  # read sub-slice
    ("bc:0:15,um:16:25,r1:0:-1:-", True),  # minus-strand read, paired
]


@pytest.mark.skipif(not extract_native.available(),
                    reason="native extract unavailable")
@pytest.mark.parametrize("fmt,paired", FORMATS)
def test_native_vs_python_barcoded_stream(corpus, tmp_path, monkeypatch,
                                          fmt, paired):
    d = corpus
    args = dict(
        barcode_files=[str(d / "bc.fq")],
        umi_files=[str(d / "bc.fq")],
        read_format=fmt,
    )
    r1 = [str(d / "r1.fq")]
    r2 = [str(d / "r2.fq")] if paired else None
    ref_fa = os.path.join(
        os.environ.get("TRUST4_REF_DIR", "/root/reference"),
        "hg38_bcrtcr.fa",
    )
    nat = str(tmp_path / "nat")
    run_barcoded_extractor(ref_fa, r1, r2, nat, **args)
    py = str(tmp_path / "py")
    monkeypatch.setenv("TRUST4_TPU_NATIVE", "0")
    run_barcoded_extractor(ref_fa, r1, r2, py, **args)
    suffixes = ["_bc.fa", "_umi.fa"]
    suffixes += ["_1.fq", "_2.fq"] if paired else [".fq"]
    for suf in suffixes:
        with open(nat + suf, "rb") as a, open(py + suf, "rb") as b:
            assert a.read() == b.read(), (fmt, suf)
        assert os.path.getsize(nat + suf) > 0, (fmt, suf)


@pytest.mark.skipif(not extract_native.available(),
                    reason="native extract unavailable")
def test_short_read_negative_offset(tmp_path, monkeypatch, reference_dir):
    """Reads shorter than a negative --readFormat offset: the adjusted
    segment start/end can stay negative.  The reference reads out of
    bounds there; our contract is the Python oracle's slice semantics
    (one more negative wrap, then clamp) — native must match it
    byte-for-byte (ADVICE r4)."""
    d = tmp_path
    rng = random.Random(3)
    reads, bcs = [], []
    for i in range(60):
        # Lengths straddling the format offsets, incl. very short reads.
        ln = rng.choice([3, 5, 8, 12, 20, 40, 100])
        reads.append((f"s{i}", "".join(rng.choice("ACGT")
                                       for _ in range(ln))))
        bln = rng.choice([2, 4, 10, 26])
        bcs.append((f"s{i}", "".join(rng.choice("ACGT")
                                     for _ in range(bln))))
    _write_fq(str(d / "r1.fq"), reads)
    _write_fq(str(d / "bc.fq"), bcs)
    ref_fa = os.path.join(
        os.environ.get("TRUST4_REF_DIR", "/root/reference"),
        "hg38_bcrtcr.fa",
    )
    # Negative offsets larger than the short reads/barcodes.
    args = dict(
        barcode_files=[str(d / "bc.fq")],
        umi_files=[str(d / "bc.fq")],
        read_format="bc:-30:-20,um:0:5,r1:-15:-1",
    )
    nat = str(d / "nat")
    run_barcoded_extractor(ref_fa, [str(d / "r1.fq")], None, nat, **args)
    py = str(d / "py")
    monkeypatch.setenv("TRUST4_TPU_NATIVE", "0")
    run_barcoded_extractor(ref_fa, [str(d / "r1.fq")], None, py, **args)
    for suf in ("_bc.fa", "_umi.fa", ".fq"):
        with open(nat + suf, "rb") as a, open(py + suf, "rb") as b:
            assert a.read() == b.read(), suf


@pytest.mark.skipif(not extract_native.available(),
                    reason="native extract unavailable")
@pytest.mark.parametrize("skip_err", [False, True])
def test_native_vs_python_whitelist_correction(corpus, tmp_path,
                                               monkeypatch, skip_err):
    """Whitelist correction (exact hit / single-substitution ranked by
    background frequency then lowest quality / missing_barcode or
    read-skip): native trie vs the Python corrector, byte-for-byte."""
    d = corpus
    # Whitelist = every 3rd observed barcode -> plenty of corrections and
    # uncorrectable cases.
    wl = tmp_path / "wl.txt"
    seen = []
    with open(d / "bc.fq") as fp:
        for i, line in enumerate(fp):
            if i % 4 == 1:
                seen.append(line.strip()[:16])
    wl.write_text("\n".join(sorted(set(seen))[::3]) + "\n")
    args = dict(
        barcode_files=[str(d / "bc.fq")],
        umi_files=[str(d / "bc.fq")],
        read_format="bc:0:15,um:16:25",
        barcode_whitelist=str(wl),
        skip_barcode_error_read=skip_err,
    )
    ref_fa = os.path.join(
        os.environ.get("TRUST4_REF_DIR", "/root/reference"),
        "hg38_bcrtcr.fa",
    )
    r1 = [str(d / "r1.fq")]
    nat = str(tmp_path / "natw")
    run_barcoded_extractor(ref_fa, r1, None, nat, **args)
    py = str(tmp_path / "pyw")
    monkeypatch.setenv("TRUST4_TPU_NATIVE", "0")
    run_barcoded_extractor(ref_fa, r1, None, py, **args)
    for suf in ("_bc.fa", "_umi.fa", ".fq"):
        with open(nat + suf, "rb") as a, open(py + suf, "rb") as b:
            assert a.read() == b.read(), (skip_err, suf)
