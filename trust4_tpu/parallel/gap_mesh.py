"""Mesh-sharded gap-fill DP: a SHIPPING annotator stage over a device mesh.

Stage 2's phase-1 scored-overlap batch collects every inter-anchor
gap-fill DP job (native t4o_batch_collect_gaps; reference:
SeqSet.hpp:1829-2007).  This module runs those jobs as one SPMD program
over a ``jax.sharding.Mesh``: unique job code rows shard over the data
axis ``dp``, each shard runs the banded traceback-bits DP + on-device
decode (ops/dp_pallas), and the per-shard count triples merge into the
replicated (n, 3) result with a ``psum`` over ``dp`` — the collective
pattern of SURVEY.md §2.8.  ``pipeline/annotator.py`` consumes the
merged counts through the same oracle interface as the single-device
path (t4o_query_scored_batch_oracle), so ``_cdr3.out`` is byte-identical
for every mesh shape — tests/test_gap_mesh.py asserts identity at
1/2/4/8 shards and ``__graft_entry__.dryrun_multichip`` does the same on
the driver's virtual device mesh.

Enable in the pipeline with ``TRUST4_TPU_GAP_MESH=<n_devices>``
(annotator phase-1 batches then run through an n-device mesh instead of
the device child / CPU DP).  On non-TPU backends the XLA mirror kernel
(banded_affine_dirs_xla) serves each shard, so the virtual CPU mesh of
the tests exercises the exact sharded program that runs on TPU chips.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

# Per-tier fixed shapes shared with the single-device oracle: identical
# tiering keeps mesh and non-mesh batches byte-compatible job for job.
from trust4_tpu.ops.gap_oracle import _TIERS, _job_segments


def make_mesh(n_devices: int):
    """A 1-D ("dp",) mesh over n_devices (virtual CPU devices under the
    test/driver environment, real chips on a TPU slice)."""
    import jax
    from jax.sharding import Mesh

    env_platforms = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in env_platforms.split(","):
        devices = jax.devices("cpu")[:n_devices]
    else:
        devices = jax.devices()[:n_devices]
    if len(devices) < n_devices:
        devices = jax.devices("cpu")[:n_devices]
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)}"
    )
    return Mesh(np.asarray(devices[:n_devices]), axis_names=("dp",))


def mesh_tier_counts(mesh, t_codes, p_codes, t_lens, p_lens, *,
                     w: int) -> np.ndarray:
    """(n, 3) int32 gap counts of one tier batch, computed shard-wise
    over the mesh's ``dp`` axis and merged with a psum.

    Each shard computes its rows' counts, scatters them into its slice
    of a zero (n_pad, 3) contribution, and the psum over ``dp`` yields
    the replicated merged result — bit-identical for every mesh shape
    because every job's DP is integer arithmetic on its own row."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from trust4_tpu.ops.dp_pallas import (
        banded_affine_counts_pallas,
        banded_affine_counts_xla,
    )

    n, cap = t_codes.shape
    n_dp = mesh.shape["dp"]
    n_pad = ((max(n, 1) + n_dp - 1) // n_dp) * n_dp

    def padr(a, fill):
        out = np.full((n_pad,) + a.shape[1:], fill, dtype=a.dtype)
        out[:n] = a
        return out

    tc = padr(np.ascontiguousarray(t_codes, np.int8), 5)
    pc = padr(np.ascontiguousarray(p_codes, np.int8), 5)
    tl = padr(np.ascontiguousarray(t_lens, np.int32), 0)
    pl = padr(np.ascontiguousarray(p_lens, np.int32), 0)

    # Pallas on real TPU shards, the bit-identical XLA mirror elsewhere
    # (interpret-mode Pallas is too slow for CPU shards).  Decided by the
    # MESH's devices, not the process default backend: under the axon
    # plugin the default is tpu even when the mesh is the virtual CPU
    # device set.  Each shard runs the forward counts kernel (round 5:
    # replaced the dirs-bits + decode pair — see ops/gap_oracle.py).
    on_tpu = mesh.devices.flat[0].platform in ("tpu", "axon")
    counts_fn = (
        banded_affine_counts_pallas if on_tpu else banded_affine_counts_xla
    )

    def shard_body(tc, pc, tl, pl):
        _scores, local = counts_fn(tc, tl, pc, pl, w)
        contrib = jnp.zeros((n_pad, 3), jnp.int32)
        at = lax.axis_index("dp") * (n_pad // n_dp)
        contrib = lax.dynamic_update_slice(contrib, local, (at, 0))
        return lax.psum(contrib, "dp")

    # check_vma=False: the decode walker's fori_loop seeds its counters
    # with unvarying zeros that later mix with shard-varying data, which
    # the new vma checker rejects; the program itself is shard-correct
    # (asserted bit-identical across shapes in tests).
    fn = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=P(),
        check_vma=False,
    )
    put = lambda a: jax.device_put(
        a, NamedSharding(mesh, P("dp"))
    )
    counts = jax.jit(fn)(put(tc), put(pc), put(tl), put(pl))
    return np.asarray(counts)[:n]


def gap_counts_via_mesh(mesh, nat, query_jobs, gap_jobs: np.ndarray,
                        seqs, n_threads: int = 0) -> Optional[np.ndarray]:
    """Mesh-sharded equivalent of gap_oracle.gap_counts_on_device: the
    full (n, 3) oracle for a collected gap batch, with the DP volume
    sharded over the mesh.  Same tiering, native dedup, and CPU fallback
    for beyond-top-tier jobs as the single-device path, so phase 2
    consumes it unchanged."""
    n = len(gap_jobs)
    if n == 0:
        return np.zeros((0, 3), dtype=np.int32)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1

    t_lens = gap_jobs[:, 5]
    r_lens = gap_jobs[:, 7]
    size = np.maximum(np.maximum(t_lens, r_lens), 2)
    band = 11 + np.abs(t_lens - r_lens)
    tier_of = np.full(n, -1, dtype=np.int32)
    for ti in range(len(_TIERS) - 1, -1, -1):
        s_cap, w_cap, _chunk = _TIERS[ti]
        tier_of[(size <= s_cap) & (band <= w_cap)] = ti

    counts = np.zeros((n, 3), dtype=np.int32)
    done = np.zeros(n, dtype=bool)

    dev_all = bool((tier_of >= 0).all())
    if dev_all:
        dev_idx = None
        dev_jobs = gap_jobs
    else:
        dev_idx = np.nonzero(tier_of >= 0)[0]
        dev_jobs = np.ascontiguousarray(gap_jobs[dev_idx])
    top_cap = _TIERS[-1][0]
    uniq_local, inverse = nat.dedup_gap_jobs(
        query_jobs, dev_jobs, top_cap, n_threads
    )
    uniq_global = uniq_local if dev_all else dev_idx[uniq_local]
    uniq_tier = tier_of[uniq_global]
    uniq_counts = np.zeros((len(uniq_global), 3), dtype=np.int32)

    for ti, (s_cap, w_cap, _chunk) in enumerate(_TIERS):
        usel = np.nonzero(uniq_tier == ti)[0]
        if len(usel) == 0:
            continue
        gsel = uniq_global[usel]
        t_codes, p_codes = nat.emit_gap_codes(
            query_jobs, np.ascontiguousarray(gap_jobs[gsel]), s_cap
        )
        tl = np.minimum(t_lens[gsel], s_cap).astype(np.int32)
        pl = np.minimum(r_lens[gsel], s_cap).astype(np.int32)
        uniq_counts[usel] = mesh_tier_counts(
            mesh, t_codes, p_codes, tl, pl, w=w_cap
        )

    if dev_all:
        counts[:] = uniq_counts[inverse]
        done[:] = True
    else:
        counts[dev_idx] = uniq_counts[inverse]
        done[dev_idx] = True

    if not done.all():
        import trust4_tpu.align.native as an

        reads = [j[0] if isinstance(j, tuple) else j for j in query_jobs]
        for i in np.nonzero(~done)[0]:
            t, p = _job_segments(reads, seqs, gap_jobs[i])
            counts[i] = an.global_alignment_counts(t, p)
    return counts
