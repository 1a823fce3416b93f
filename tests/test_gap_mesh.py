"""Mesh-sharded gap-fill DP stage (parallel/gap_mesh.py).

The annotator's phase-1 gap batch sharded over a jax Mesh ``dp`` axis
with psum-merged counts must be bit-identical for every mesh shape, and
the SHIPPING pipeline consuming it (TRUST4_TPU_GAP_MESH=<n>) must write
a byte-identical ``_cdr3.out`` at 1/2/4/8 shards (VERDICT r3 item 4).
Runs on the virtual 8-device CPU mesh (conftest.py) through the XLA
mirror kernel — the same shard program that runs on TPU chips.
"""

import os

import numpy as np
import pytest

from trust4_tpu.align import native as align_native
from trust4_tpu.parallel.gap_mesh import make_mesh, mesh_tier_counts
from trust4_tpu.ops.dp_batch import encode_for_dp


def _random_pairs(rng, n, hi):
    pairs = []
    for _ in range(n):
        lt = int(rng.integers(0, hi))
        lp = int(np.clip(lt + rng.integers(-5, 6), 0, hi))
        t = "".join(rng.choice(list("ACGTN"), lt, p=[0.24] * 4 + [0.04]))
        if lt and lp and rng.random() < 0.6:
            p_list = list(t[:lp].ljust(lp, "A"))
            for _ in range(int(rng.integers(0, 5))):
                p_list[int(rng.integers(0, lp))] = rng.choice(list("ACGT"))
            p = "".join(p_list)
        else:
            p = "".join(rng.choice(list("ACGT"), lp))
        pairs.append((t, p))
    return pairs


def test_mesh_tier_counts_shard_invariant_and_exact():
    rng = np.random.default_rng(23)
    pairs = _random_pairs(rng, 61, 16)  # odd n: uneven shard remainder
    cap, w = 16, 16
    tc, tl = encode_for_dp([t for t, _ in pairs], cap)
    pc, pl = encode_for_dp([p for _, p in pairs], cap)
    ref = None
    for n_dev in (1, 2, 4, 8):
        counts = mesh_tier_counts(
            make_mesh(n_dev), tc, pc, tl, pl, w=w
        )
        if ref is None:
            ref = counts
            for i, (t, p) in enumerate(pairs):
                want = align_native.global_alignment_counts(t, p)
                assert tuple(int(v) for v in counts[i]) == want, (i, t, p)
        else:
            np.testing.assert_array_equal(counts, ref, err_msg=str(n_dev))


@pytest.fixture(scope="module")
def example_run(tmp_path_factory, reference_dir):
    """Full shipping pipeline once on the bundled example (CPU path)."""
    from trust4_tpu.pipeline.run import run_trust4

    d = tmp_path_factory.mktemp("gapmesh")
    prefix = str(d / "ex")
    example = os.path.join(reference_dir, "example")
    args = dict(
        read1_files=[os.path.join(example, "example_1.fq")],
        read2_files=[os.path.join(example, "example_2.fq")],
        output_prefix=prefix,
    )
    run_trust4(
        os.path.join(reference_dir, "hg38_bcrtcr.fa"),
        os.path.join(reference_dir, "human_IMGT+C.fa"),
        **args,
    )
    return reference_dir, prefix, args


def test_cdr3_identity_across_shards(example_run, monkeypatch):
    """Stage-2 rerun with the gap batch sharded over 1/2/4/8 devices:
    _annot.fa and _cdr3.out must be byte-identical to the CPU path."""
    reference_dir, prefix, args = example_run
    from trust4_tpu.pipeline.run import run_trust4

    with open(prefix + "_cdr3.out") as f:
        base_cdr3 = f.read()
    with open(prefix + "_annot.fa") as f:
        base_annot = f.read()
    assert base_cdr3.strip(), "example produced no CDR3 rows"
    for n_dev in (1, 2, 4, 8):
        monkeypatch.setenv("TRUST4_TPU_GAP_MESH", str(n_dev))
        run_trust4(
            os.path.join(reference_dir, "hg38_bcrtcr.fa"),
            os.path.join(reference_dir, "human_IMGT+C.fa"),
            stage=2,
            **args,
        )
        with open(prefix + "_cdr3.out") as f:
            assert f.read() == base_cdr3, f"{n_dev} shards: _cdr3.out"
        with open(prefix + "_annot.fa") as f:
            assert f.read() == base_annot, f"{n_dev} shards: _annot.fa"
