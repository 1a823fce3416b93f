"""Fork-based data parallelism for the host phases.

The reference splits its read/contig sweeps over pthreads in static blocks
(main.cpp:513-626, Annotator.cpp:369-419); every unit of work is
independent (the shared SeqSet is read-only during these phases), so the
parallel results are identical to the serial pass.  Fork workers inherit
the index/profile state copy-on-write — no pickling of the SeqSet.
"""

from __future__ import annotations

import multiprocessing as mp
import os
from typing import Callable, List, Sequence, TypeVar

T = TypeVar("T")
R = TypeVar("R")

_work_fn = None


def internal_threads(threads: int) -> int:
    """Effective parallelism for engine-internal phases.

    Our native/fork sweeps are part of the engine's architecture (like the
    reference's worker pools); at -t 1 they default to a bounded internal
    pool (the extract filter set this precedent).  TRUST4_TPU_INTERNAL_THREADS
    overrides (0/1 forces serial).
    """
    env = os.environ.get("TRUST4_TPU_INTERNAL_THREADS")
    if env is not None:
        try:
            v = int(env)
        except ValueError:
            v = 1
        return max(1, v)
    if threads > 1:
        return threads
    return max(1, min(8, os.cpu_count() or 1))


def _invoke(arg):
    return _work_fn(arg)


def map_fork(fn: Callable[[T], R], items: Sequence[T], threads: int) -> List[R]:
    """Order-preserving parallel map over items using forked workers."""
    if threads <= 1 or len(items) <= 1:
        return [fn(x) for x in items]
    global _work_fn
    _work_fn = fn
    ctx = mp.get_context("fork")
    chunk = max(1, len(items) // (threads * 4))
    with ctx.Pool(threads) as pool:
        try:
            return pool.map(_invoke, items, chunksize=chunk)
        finally:
            _work_fn = None


def map_fork_chunks(
    fn: Callable[[Sequence[T]], List[R]], items: Sequence[T], threads: int
) -> List[R]:
    """Split items into `threads` contiguous blocks (the reference's static
    partition) and concatenate the per-block results."""
    if threads <= 1 or len(items) <= 1:
        return fn(items)
    n = len(items)
    block = (n + threads - 1) // threads
    chunks = [items[i : i + block] for i in range(0, n, block)]
    global _work_fn
    _work_fn = fn
    ctx = mp.get_context("fork")
    with ctx.Pool(len(chunks)) as pool:
        try:
            results = pool.map(_invoke, chunks)
        finally:
            _work_fn = None
    out: List[R] = []
    for r in results:
        out.extend(r)
    return out
