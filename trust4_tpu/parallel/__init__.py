"""Multi-chip execution layer: sharded pipeline rounds over a
jax.sharding.Mesh (SURVEY.md §2.8 / §7 TPU-native distributed design).

The reference is single-node pthreads; this package holds its mesh-native
replacements — read batches sharded over a data axis, contig state sharded
over a model axis, XLA collectives (psum / all_gather over ICI) merging
per-shard candidate counts, DP scores, and posWeight coverage tensors.
"""

from trust4_tpu.parallel.realign_mesh import (  # noqa: F401
    MeshRealigner,
    sharded_realign_round,
)
