#!/usr/bin/env python
"""VPU microbenchmarks: pin per-op latency/throughput on this chip.

Each kernel runs K dependent (or G x K interleaved-independent) vector
ops on (W, LANES) int32 tiles inside one grid step, repeated over a grid
to make the launch measurable.  Prints ns/op — the number the DP-kernel
redesign needs.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from trust4_tpu.utils.axonboot import ensure_registered

ensure_registered()

import jax
import jax.numpy as jnp
import jax.lax as lax
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID = 256          # grid steps per launch
K = 512             # dependent ops per grid step (per chain)


def bench(kernel_body, w, lanes, tag, reps=30, k_ops=K, n_out=None):
    """kernel_body(x) -> y, traced on (w, lanes) int32."""
    def kern(x_ref, o_ref):
        x = x_ref[:]
        y = kernel_body(x)
        o_ref[:] = y

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((w, lanes), jnp.int32),
            grid=(GRID,),
            in_specs=[pl.BlockSpec((w, lanes), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((w, lanes), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 100, size=(w, lanes), dtype=np.int32))
    np.asarray(run(x))  # compile + materialize
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            y = run(x)
        y.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / reps)
    n_ops = GRID * k_ops
    per_op = best / n_ops
    print(f"{tag:42s} {best*1e3:7.2f} ms/launch  {per_op*1e9:7.1f} ns/op",
          flush=True)
    return per_op


def main():
    print(f"backend: {jax.default_backend()}  GRID={GRID} K={K}", flush=True)

    # 1. dependent chain of max(x, x+1) pairs: 2 ops per iter
    def chain_max(x):
        one = jnp.int32(1)
        for _ in range(K // 2):
            x = jnp.maximum(x, x + one)
        return x
    for w, lanes in ((8, 128), (32, 128), (32, 512)):
        bench(chain_max, w, lanes, f"dep max+add chain ({w},{lanes})")

    # 2. G independent interleaved chains (ops alternate across chains)
    def make_inter(G):
        def body(x):
            one = jnp.int32(1)
            xs = [x + jnp.int32(g) for g in range(G)]
            for _ in range(K // 2):
                xs = [jnp.maximum(v, v + one) for v in xs]
            acc = xs[0]
            for v in xs[1:]:
                acc = jnp.maximum(acc, v)
            return acc
        return body
    for G in (2, 4):
        bench(make_inter(G), 32, 128, f"{G}x interleaved chains (32,128)",
              k_ops=K * G)

    # 3. dependent chain of sublane shifts (concat pattern used by the DP)
    def chain_shift(x):
        w = x.shape[0]
        fill = jnp.full((1, x.shape[1]), 7, jnp.int32)
        for _ in range(K):
            x = jnp.concatenate([x[1:, :], fill], axis=0)
        return x
    for w, lanes in ((8, 128), (32, 128), (32, 512)):
        bench(chain_shift, w, lanes, f"dep sublane-shift chain ({w},{lanes})")

    # 4. shift+max pairs (the scan step): dependent
    def chain_shift_max(x):
        fill = jnp.full((1, x.shape[1]), 7, jnp.int32)
        for _ in range(K // 2):
            s = jnp.concatenate([x[1:, :], fill], axis=0)
            x = jnp.maximum(x, s)
        return x
    bench(chain_shift_max, 32, 128, "dep shift+max pairs (32,128)")

    # 5. independent (throughput) max ops: no dependencies at all
    def indep_max(x):
        ys = [jnp.maximum(x, x + jnp.int32(i)) for i in range(K // 2)]
        acc = ys[0]
        for y in ys[1:]:
            acc = jnp.maximum(acc, y)
        return acc
    bench(indep_max, 32, 128, "independent max ops (32,128)", k_ops=K)

    # 6. select chain (jnp.where) — used heavily in the DP row body
    def chain_where(x):
        one = jnp.int32(1)
        m = x > jnp.int32(50)
        for _ in range(K):
            x = jnp.where(m, x + one, x)
        return x
    bench(chain_where, 32, 128, "dep where chain (32,128)")


if __name__ == "__main__":
    main()
