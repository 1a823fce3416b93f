"""Mesh-sharded realign round: shard-count invariance on real data.

Runs the sharded read-vs-contig round (trust4_tpu/parallel/realign_mesh.py)
on the real bundled-example candidate reads against the real assembled
contigs (tests/data goldens), over 1x1, 4x1, and 2x2 CPU meshes, and
asserts every output — candidate mask, per-read scores and contig
assignments, and the psum-merged posWeight coverage — is bit-identical
across mesh shapes (integer arithmetic end to end).

conftest.py forces JAX_PLATFORMS=cpu with 8 virtual host devices when the
shell does not override it; on the axon chip only the single-device mesh
runs (the tunnel exposes one chip), so this module re-forces the CPU
backend in-process.
"""

import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def cpu_devices():
    import jax

    # The axon sitecustomize force-sets jax_platforms="axon,cpu"; the mesh
    # tests need the 8 virtual CPU devices (conftest sets
    # xla_force_host_platform_device_count=8).
    if jax.default_backend() != "cpu":
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.clear_backends()
        except Exception:
            pass
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return devs


def _real_inputs():
    """Real example candidate reads + real assembled contigs + germline."""
    from trust4_tpu.io.fastx import read_fastx

    reads = [r.seq for r in read_fastx(
        [os.path.join(DATA, "gold_toassemble_1.fq"),
         os.path.join(DATA, "gold_toassemble_2.fq")]
    )]
    contigs = []
    with open(os.path.join(DATA, "gold_final.out")) as f:
        for line in f:
            if line.startswith(">"):
                contigs.append(next(f).strip())
    germ = []
    cur = []
    with open("/root/reference/hg38_bcrtcr.fa") as f:
        for line in f:
            if line.startswith(">"):
                if cur:
                    germ.append("".join(cur))
                cur = []
            else:
                cur.append(line.strip().upper())
    if cur:
        germ.append("".join(cur))
    assert len(reads) > 100 and len(contigs) > 3
    return reads, contigs, germ


def test_shard_count_invariance(cpu_devices):
    import jax
    from jax.sharding import Mesh

    from trust4_tpu.parallel import sharded_realign_round

    reads, contigs, germ = _real_inputs()

    results = {}
    for dp, mp in [(1, 1), (4, 1), (2, 2)]:
        devs = np.array(cpu_devices[: dp * mp]).reshape(dp, mp)
        mesh = Mesh(devs, axis_names=("dp", "mp"))
        results[(dp, mp)] = sharded_realign_round(
            mesh, reads, contigs, germ
        )

    base = results[(1, 1)]
    n_reads = len(reads)
    for shape, got in results.items():
        cand, scores, ids, pw, n_cand = got
        b_cand, b_scores, b_ids, b_pw, b_n = base
        np.testing.assert_array_equal(cand[:n_reads], b_cand[:n_reads],
                                      err_msg=f"cand {shape}")
        np.testing.assert_array_equal(scores[:n_reads], b_scores[:n_reads],
                                      err_msg=f"scores {shape}")
        np.testing.assert_array_equal(ids[:n_reads], b_ids[:n_reads],
                                      err_msg=f"ids {shape}")
        # posWeight pads contigs up to the mesh multiple; compare the real
        # contig rows
        c = len(contigs)
        np.testing.assert_array_equal(pw[:c], b_pw[:c],
                                      err_msg=f"posWeight {shape}")
        assert n_cand == b_n

    # the round did real work: candidates exist, reads were assigned, and
    # coverage landed in the merged posWeight
    cand, scores, ids, pw, n_cand = base
    assert n_cand > 50
    assert (scores > -(1 << 29)).sum() > 50
    assert pw.sum() > 1000
