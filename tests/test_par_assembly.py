"""Per-barcode partitioned assembly parity: the parallel greedy loop
(pipeline/assembler.py _assemble_native_partitioned) must be
byte-identical to the serial native loop on a corpus large enough to
trigger partitioning (>= 4096 reads, whole-barcode content-run-aligned
cuts).  Exactness argument: barcode-salted index hashing
(reference KmerIndex.hpp:29-33) + barcode-filtered hits
(SeqSet.hpp:1418,1485) make cells independent, and main.cpp gates the
10k-consensus cadence and k-mer escalation on !hasBarcode."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_partitioned_assembly_byte_identical(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_bench_corpus import make_barcoded_corpus

    reads_fq = str(tmp_path / "reads.fq")
    bc_fq = str(tmp_path / "bc.fq")
    # ~9k reads over 200 cells: comfortably past the 4096-read gate.
    make_barcoded_corpus(reads_fq, bc_fq, n_cells=200, seed=4242,
                         n_clones=60)

    outs = {}
    for tag, par in (("par", "1"), ("ser", "0")):
        od = tmp_path / tag
        od.mkdir()
        env = dict(os.environ)
        env["TRUST4_TPU_PAR_ASM"] = par
        env["TRUST4_TPU_DEVICE"] = "0"
        r = subprocess.run(
            [
                sys.executable, "-m", "trust4_tpu", "run",
                "-u", reads_fq, "--barcode", bc_fq,
                "--readFormat", "bc:0:15,um:16:25",
                "-f", "/root/reference/hg38_bcrtcr.fa",
                "--ref", "/root/reference/human_IMGT+C.fa",
                "-o", "x", "--od", str(od), "-t", "4",
            ],
            capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs[tag] = od

    for f in ("x_raw.out", "x_final.out", "x_assembled_reads.fa",
              "x_cdr3.out", "x_annot.fa", "x_barcode_report.tsv"):
        pa = (outs["par"] / f).read_bytes()
        se = (outs["ser"] / f).read_bytes()
        assert pa == se, f
