"""Mesh-sharded per-barcode assembly (parallel/asm_mesh.py): the SAME
whole-barcode span payloads the shipping thread pool executes must run
as a shard_map program over a dp mesh and produce a byte-identical
``_final.out`` at every shard count (1/2/4/8 on the virtual CPU mesh —
the same program that lays the loop out over a multi-host slice)."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_mesh_partitioned_assembly_byte_identical(tmp_path):
    sys.path.insert(0, REPO)
    from tools.make_bench_corpus import make_barcoded_corpus

    from trust4_tpu.parallel.asm_mesh import (
        make_mesh,
        mesh_partition_executor,
    )
    from trust4_tpu.pipeline.assembler import Assembler
    from trust4_tpu.pipeline.extract import run_barcoded_extractor

    reads_fq = str(tmp_path / "reads.fq")
    bc_fq = str(tmp_path / "bc.fq")
    make_barcoded_corpus(reads_fq, bc_fq, n_cells=120, seed=77,
                         n_clones=40)
    coord = "/root/reference/hg38_bcrtcr.fa"
    pre = str(tmp_path / "x_toassemble")
    run_barcoded_extractor(
        coord, [reads_fq], None, pre,
        barcode_files=[bc_fq], umi_files=[bc_fq],
        read_format="bc:0:15,um:16:25",
    )

    def assemble(tag, executor):
        prefix = str(tmp_path / tag)
        asm = Assembler(coord, output_prefix=prefix, threads=4)
        if executor is not None:
            asm._partition_executor = executor
        asm.run([pre + ".fq"], None, barcode_files=[pre + "_bc.fa"],
                umi_files=[pre + "_umi.fa"])
        with open(prefix + "_final.out", "rb") as f:
            final = f.read()
        assert len(final) > 1000
        return final

    golden = assemble("pool", None)
    for n_dev in (1, 2, 4, 8):
        calls = []
        base = mesh_partition_executor(make_mesh(n_dev))

        def counting(run_part, bounds, workers, _base=base):
            out = _base(run_part, bounds, workers)
            calls.append(len(bounds) - 1)  # AFTER: a throw must not count
            return out

        got = assemble(f"mesh{n_dev}", counting)
        assert got == golden, f"final.out diverged at {n_dev} shards"
        # The partition gate must have fired AND the mesh program must
        # have completed (an executor throw falls back to the serial
        # loop, which would make the byte-compare vacuously green).
        assert calls and calls[0] >= 2, calls
