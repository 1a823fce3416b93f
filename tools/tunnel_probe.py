#!/usr/bin/env python
"""Tunnel transfer probe: pins the h2d/d2h cost model (fixed RTT +
bytes/bandwidth) that the gap-oracle launch protocol must optimize.

Round-5 gate work: the kernel is 57+ G cells/s device-resident
(tools/dp_kernel_lab.py base), so the shipping launch wall is transfer
dominated.  This measures device_put / np.asarray walls across sizes,
and a full launch with fresh host inputs each call (the shipping
pattern) vs device-resident inputs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from trust4_tpu.utils.axonboot import ensure_registered

ensure_registered()

import jax
import jax.numpy as jnp


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    # Handshake: first materialization.
    x = jax.device_put(np.ones(8, np.uint8))
    t0 = time.perf_counter()
    np.asarray(x)
    print(f"handshake d2h: {time.perf_counter()-t0:.2f}s", flush=True)

    for mb in (0.001, 0.01, 0.1, 0.5, 1.0, 2.0, 4.0, 8.0):
        nbytes = int(mb * 1e6)
        a = np.random.randint(0, 250, size=nbytes, dtype=np.uint8)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            d = jax.device_put(a)
            d.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        # d2h of same buffer
        bestd = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(d)
            bestd = min(bestd, time.perf_counter() - t0)
        print(f"{mb:8.3f} MB  h2d {best*1e3:8.1f} ms ({nbytes/best/1e6:7.1f} MB/s)"
              f"  d2h {bestd*1e3:8.1f} ms ({nbytes/bestd/1e6:7.1f} MB/s)",
              flush=True)

    # Multiple small transfers vs one big: per-transfer fixed cost.
    a = np.random.randint(0, 250, size=1 << 20, dtype=np.uint8)
    parts = [a[i::8].copy() for i in range(8)]
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        ds = [jax.device_put(p) for p in parts]
        jax.block_until_ready(ds)
        best = min(best, time.perf_counter() - t0)
    print(f"8x 128KB h2d: {best*1e3:.1f} ms (vs 1MB single above)", flush=True)

    # Donated/jitted round trip: fresh inputs -> tiny output, the
    # shipping launch pattern at tier-1 shape.
    @jax.jit
    def f(tc, tl, pc, plens):
        return (tc.astype(jnp.int32).sum(axis=1) + tl + plens
                + pc.astype(jnp.int32).sum(axis=1)).astype(jnp.int32)

    n, L = 32768, 48
    tc = np.random.randint(0, 4, size=(n, L), dtype=np.int8)
    tl = np.full(n, L, np.int32)
    out = np.asarray(f(tc, tl, tc, tl))  # compile
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = np.asarray(f(tc, tl, tc, tl))
        best = min(best, time.perf_counter() - t0)
    mbytes = (2 * n * L + 2 * 4 * n + 4 * n) / 1e6
    print(f"jit roundtrip tier1-shape ({mbytes:.1f} MB in, {4*n/1e6:.1f} MB "
          f"out): {best*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
