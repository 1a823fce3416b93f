"""Mesh-sharded per-barcode assembly: the partitioned greedy loop as an
SPMD program over a jax Mesh's ``dp`` axis.

TRUST4's single-cell assembly is share-nothing over barcodes (the index
hash salts the barcode, queries are barcode-filtered, and the bulk-only
global couplings are disabled — see Assembler._barcode_partition_cuts
for the exact independence argument), so its natural multi-chip/-host
layout is: each mesh position owns a contiguous span of whole barcodes
and runs the native greedy loop for that span; one collective (psum of
per-span contig counts) joins the program.  The loop itself is C++
pointer-chasing, not MXU work — on a real multi-host slice the callback
body is each host's local engine, exactly like the reference's pthread
split (main.cpp:569-605) scaled past one machine.

``mesh_partition_executor`` plugs into Assembler._run_partitions, so the
SAME span payloads that the shipping thread pool executes run as a
shard_map program instead — byte-identical ``_final.out`` by
construction, asserted at 1/2/4/8 shards in tests/test_asm_mesh.py and
the driver's dryrun_multichip, which also records the wall-clock per
shard count (the scaling-efficiency table).

No reference counterpart beyond the pthread split cited above.
"""

from __future__ import annotations

from typing import List

import numpy as np


def make_mesh(n_devices: int):
    """A 1-D ``dp`` mesh over n_devices CPU-backend devices.  Unlike
    gap_mesh.make_mesh this always prefers the CPU backend: the span
    bodies are host callbacks (the assembly loop is native CPU work by
    design), and accelerator plugins — the axon tunnel in particular —
    do not implement host send/recv callbacks."""
    import jax
    from jax.sharding import Mesh

    try:
        devices = jax.devices("cpu")[:n_devices]
    except RuntimeError:
        devices = jax.devices()[:n_devices]
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devices)}"
        )
    return Mesh(np.array(devices), axis_names=("dp",))


def mesh_partition_executor(mesh):
    """Returns an Assembler._partition_executor: runs the per-barcode
    span payloads as a shard_map over ``mesh``'s dp axis.  Each shard's
    program io_callbacks into the native greedy loop for the span ids it
    owns (the FFI call releases the GIL, so shards execute in parallel
    even on the virtual single-process CPU mesh) and contributes its
    contig counts to a psum — the mesh program's output depends on every
    shard's completion."""

    def run(run_part, bounds, workers):
        import jax
        import jax.numpy as jnp
        from jax.experimental import io_callback
        from jax.sharding import PartitionSpec as P

        shard_map = getattr(jax, "shard_map", None)
        if shard_map is None:  # pre-0.8 jax
            from jax.experimental.shard_map import shard_map

        del workers  # parallelism = the mesh's dp extent
        n_parts = len(bounds) - 1
        dp = mesh.devices.size
        pad = (-n_parts) % dp
        ids = np.concatenate(
            [np.arange(n_parts, dtype=np.int32),
             np.full(pad, -1, dtype=np.int32)]
        )
        results: List = [None] * n_parts

        def run_span(idv):
            out = np.zeros(idv.shape, dtype=np.int32)
            for k, i in enumerate(np.asarray(idv).ravel()):
                i = int(i)
                if i < 0:
                    continue
                part = run_part(bounds[i], bounds[i + 1])
                results[i] = part
                out[k] = len(part[3])  # contig count of the span
            return out

        def body(ids_shard):
            counts = io_callback(
                run_span,
                jax.ShapeDtypeStruct(ids_shard.shape, jnp.int32),
                ids_shard,
                ordered=False,
            )
            return jax.lax.psum(counts.sum(), "dp")

        f = jax.jit(
            shard_map(body, mesh=mesh, in_specs=P("dp"), out_specs=P())
        )
        # Pin the input (and thus the program) to the mesh's devices:
        # without this the arg commits to the DEFAULT backend, which on
        # the tunnel box is the axon plugin — and that one cannot run
        # host callbacks.
        from jax.sharding import NamedSharding

        ids_dev = jax.device_put(
            jnp.asarray(ids), NamedSharding(mesh, P("dp"))
        )
        total = int(f(ids_dev))
        assert all(r is not None for r in results), "span dropped by mesh"
        assert total == sum(len(r[3]) for r in results)
        return results

    return run
