"""Device gap-fill oracle: the Pallas DP in the shipping annotator.

Stage 2 (annotation) realigns every contig against the IMGT database; the
dominant DP volume is the inter-anchor gap fills inside the overlap
similarity pass (reference: SeqSet.hpp:1829-2007).  This module runs ALL of
a batch's gap fills as batched Pallas kernel launches
(ops/dp_pallas.banded_affine_dirs_pallas): the device computes scores plus
per-cell traceback-decision bits and the on-device DFA walker
(ops/dp_pallas.decode_dirs_counts) decodes (match, mismatch, indel) counts
bit-identical to the CPU DP — only the (n, 3) count triples leave the
device.  Job code rows are emitted by the C++ engine
(native/overlap_engine.cpp t4o_emit_gap_codes), so there is no per-job
Python work.

Every launch uses one of three FIXED (chunk, len, band) shapes, so each
tier compiles exactly once ever (persistent cache) and traces exactly once
per process; ``prewarm()`` runs the traces on a background thread while
the CPU-bound assembly stages run, so by annotation time the device path
costs only transfers + kernel time.

Used by pipeline/annotator.py via the two-phase engine batch
(t4o_batch_collect_gaps / t4o_query_scored_batch_oracle).  Falls back to
the CPU path on any device error; TRUST4_TPU_DEVICE=0 disables,
TRUST4_TPU_DEVICE_CHECK=1 asserts the device counts equal the CPU DP's.
"""

from __future__ import annotations

import os
import threading
from typing import Optional

import numpy as np

# Fixed size tiers keep kernel shapes stable (one compile per tier ever,
# shared across corpora/runs/entry points).  (max_len, band_width, chunk)
# — a job lands in the first tier covering both its length and
# 11+|len diff|; beyond the last tier it falls back to the CPU DP (it
# stays an oracle miss in phase 2).  Batches larger than `chunk` run as
# several launches of the same shape.
_TIERS = ((16, 16, 65536), (48, 24, 32768), (144, 48, 16384))

# Auto mode: the device pays a fixed per-process warmup (jax import +
# backend attach + one trace per tier, overlapped with the CPU assembly
# stages) plus per-batch transfer latency, so the driver enables it only
# when the candidate-read count is large enough that the annotation
# stage's gap-fill DP volume amortizes those fixed costs;
# TRUST4_TPU_DEVICE=1/0 forces.
AUTO_MIN_READS = int(os.environ.get("TRUST4_TPU_DEVICE_MIN_READS", "25000"))

_prewarm_thread: Optional[threading.Thread] = None
_prewarm_done = threading.Event()
_prewarm_ok = False


def mode() -> str:
    """'1' force-on, '0' off, 'auto' (default)."""
    return os.environ.get("TRUST4_TPU_DEVICE", "auto")


def active() -> bool:
    """True when the device path should serve this process's batches:
    forced on, or auto mode with a COMPLETED prewarm.  Auto mode never
    touches the backend from the caller's thread: if the device tunnel is
    wedged, the prewarm thread hangs in backend init holding the import
    lock, and a device_available() probe here would deadlock the
    pipeline — so auto trusts the prewarm outcome only (not finished ->
    CPU path; it had the whole assembly stage to finish)."""
    m = mode()
    if m == "0":
        return False
    if m == "auto":
        if _prewarm_thread is None:
            return False
        return _prewarm_done.is_set() and _prewarm_ok
    return device_available()


def device_available() -> bool:
    if mode() == "0":
        return False
    try:
        from trust4_tpu.utils.axonboot import ensure_registered

        ensure_registered()
        import jax

        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _tier_counts_fn():
    """One fused jitted program per tier: Pallas DP emitting decision
    bits + the on-device DFA walker, one dispatch, only (chunk, 3) counts
    leave the device."""
    import functools

    import jax

    from trust4_tpu.ops.dp_pallas import (
        banded_affine_dirs_pallas,
        decode_dirs_counts,
    )

    @functools.partial(jax.jit, static_argnames=("w", "p_max"))
    def tier_counts(tc, tcl, pc, pcl, *, w, p_max):
        _scores, dirs = banded_affine_dirs_pallas(tc, tcl, pc, pcl, w)
        return decode_dirs_counts(dirs, tc, tcl, pc, pcl, w=w, p_max=p_max)

    return tier_counts


_tier_counts = None


def _get_tier_counts():
    global _tier_counts
    if _tier_counts is None:
        _tier_counts = _tier_counts_fn()
    return _tier_counts


def _trace_tier(s_cap: int, w_cap: int, chunk: int) -> None:
    import jax

    t = np.full((chunk, s_cap), 5, dtype=np.int8)
    lens = np.zeros(chunk, dtype=np.int32)
    cnt = _get_tier_counts()(t, lens, t, lens, w=w_cap, p_max=s_cap)
    jax.block_until_ready(cnt)


def prewarm(wait: bool = False) -> None:
    """Trace + (cache-)compile every tier shape.  Called with wait=False
    from the pipeline driver before the CPU-bound assembly stage, so the
    device path is warm by annotation time.  Idempotent."""
    global _prewarm_thread
    if mode() == "0":
        return
    if _prewarm_thread is None:
        def run():
            global _prewarm_ok
            try:
                if not device_available():  # imports jax (slow) off-thread
                    return
                for s_cap, w_cap, chunk in _TIERS:
                    _trace_tier(s_cap, w_cap, chunk)
                _prewarm_ok = True
            except Exception:
                pass
            finally:
                _prewarm_done.set()

        _prewarm_thread = threading.Thread(
            target=run, name="trust4-tpu-prewarm", daemon=True
        )
        _prewarm_thread.start()
    if wait:
        _prewarm_thread.join()


_RC_FLAG = 1 << 30

# TRUST4_TPU_GAP_PROF=1: per-batch cost/coverage breakdown on stderr —
# job/unique counts per tier, device-miss fraction (jobs beyond the top
# tier, VERDICT r2 item 7), and where the wall time goes (emit / dedup /
# device / scatter / cpu-leftovers).
_GAP_PROF = os.environ.get("TRUST4_TPU_GAP_PROF", "0") == "1"


def _job_segments(reads, seqs, row):
    """The (t, p) DP strings of one gap-job row, honoring the bit-30 rc
    flag on seq_idx (annotate0 batches: the query segment is the reverse
    complement walking backward from the forward anchor, matching
    t4o_emit_gap_codes)."""
    from trust4_tpu.dna import revcomp

    q, _ov, _go, sidx, t_from, t_len, r_from, r_len = (int(v) for v in row)
    rc = bool(sidx & _RC_FLAG)
    sidx &= ~_RC_FLAG
    t = seqs[sidx].consensus[t_from : t_from + t_len]
    rd = reads[q]
    if rc:
        p = revcomp(rd[r_from - r_len + 1 : r_from + 1])
    else:
        p = rd[r_from : r_from + r_len]
    return t, p


def gap_counts_on_device(nat, query_jobs, gap_jobs: np.ndarray,
                         seqs, n_threads: int = 0) -> Optional[np.ndarray]:
    """Compute (match, mismatch, indel) for each collected gap job on the
    TPU.  nat: the NativeOverlapEngine; query_jobs: the batch's query
    tuples or plain read strings (for the read blob); gap_jobs: (n, 8)
    int32 rows from batch_collect_gaps or annotate0_collect_gaps (seq_idx
    may carry the bit-30 rc flag); seqs: queried SeqSet's wrappers (CPU
    leftovers + check mode).  Returns (n, 3) int32, or None (caller uses
    the CPU DP).

    Dedup happens NATIVELY before any code emission (t4o_dedup_gap_jobs):
    only unique DP inputs are materialized, transferred, and launched;
    duplicates scatter from the unique results.  (The earlier
    np.unique-on-void-rows dedup cost 68s at the 10M-job scale.)"""
    import time as _time

    n = len(gap_jobs)
    if n == 0:
        return np.zeros((0, 3), dtype=np.int32)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    prof = {"emit": 0.0, "dedup": 0.0, "device": 0.0, "scatter": 0.0,
            "cpu_left": 0.0, "tiers": []} if _GAP_PROF else None
    t_all0 = _time.perf_counter() if _GAP_PROF else 0.0
    check = os.environ.get("TRUST4_TPU_DEVICE_CHECK", "0") == "1"
    if _prewarm_thread is not None and mode() != "1":
        # active() only admits completed prewarms in auto mode, so this
        # returns immediately; the timeout guards a wedged backend init
        # (CPU fallback instead of a pipeline hang).
        _prewarm_thread.join(timeout=600)
        if not _prewarm_done.is_set():
            if check:
                raise RuntimeError("device prewarm did not complete")
            return None
    elif _prewarm_thread is not None:
        _prewarm_thread.join()

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

    try:
        tier_counts = _get_tier_counts()

        # ONE global content dedup over all device-eligible jobs (equal
        # content implies equal lengths implies the same tier, so
        # cross-tier merges are impossible by construction).
        t0 = _time.perf_counter() if prof is not None else 0.0
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
        if prof is not None:
            prof["dedup"] += _time.perf_counter() - t0

        pending = []
        for ti, (s_cap, w_cap, chunk) in enumerate(_TIERS):
            usel = np.nonzero(uniq_tier == ti)[0]
            if len(usel) == 0:
                continue
            gsel = uniq_global[usel]
            t0 = _time.perf_counter() if prof is not None else 0.0
            t_codes, p_codes = nat.emit_gap_codes(
                query_jobs, np.ascontiguousarray(gap_jobs[gsel]), s_cap
            )
            tl = np.minimum(t_lens[gsel], s_cap).astype(np.int32)
            pl = np.minimum(r_lens[gsel], s_cap).astype(np.int32)
            if prof is not None:
                prof["emit"] += _time.perf_counter() - t0
                prof["tiers"].append(
                    (s_cap, int((tier_of == ti).sum()), len(usel))
                )
                t0 = _time.perf_counter()
            for at in range(0, len(usel), chunk):
                hi = min(at + chunk, len(usel))
                if hi - at == chunk:
                    tc, pc = t_codes[at:hi], p_codes[at:hi]
                    tcl, pcl = tl[at:hi], pl[at:hi]
                else:  # pad the tail to the tier's fixed chunk shape
                    tc = np.full((chunk, s_cap), 5, dtype=np.int8)
                    pc = np.full((chunk, s_cap), 5, dtype=np.int8)
                    tc[: hi - at] = t_codes[at:hi]
                    pc[: hi - at] = p_codes[at:hi]
                    tcl = np.zeros(chunk, dtype=np.int32)
                    pcl = np.zeros(chunk, dtype=np.int32)
                    tcl[: hi - at] = tl[at:hi]
                    pcl[: hi - at] = pl[at:hi]
                dev_counts = tier_counts(tc, tcl, pc, pcl,
                                         w=w_cap, p_max=s_cap)
                pending.append((usel[at:hi], hi - at, dev_counts))
            if prof is not None:
                prof["device"] += _time.perf_counter() - t0
        t0 = _time.perf_counter() if prof is not None else 0.0
        for usel_part, m, dev_counts in pending:
            tb = _time.perf_counter() if prof is not None else 0.0
            uniq_counts[usel_part] = np.asarray(dev_counts)[:m]
            if prof is not None:
                print(f"[gap-prof]   block launch m={m}: "
                      f"{_time.perf_counter() - tb:.3f}s",
                      file=__import__('sys').stderr, flush=True)
        if dev_all:
            counts[:] = uniq_counts[inverse]
            done[:] = True
        else:
            counts[dev_idx] = uniq_counts[inverse]
            done[dev_idx] = True
        if prof is not None:
            prof["scatter"] += _time.perf_counter() - t0
    except Exception:
        if check:
            raise
        return None

    if not done.any():
        return None
    if not done.all():
        # CPU DP for jobs beyond the top tier so phase 2 sees a complete
        # oracle.
        import trust4_tpu.align.native as an

        t0 = _time.perf_counter() if prof is not None else 0.0
        reads = [j[0] if isinstance(j, tuple) else j for j in query_jobs]
        for i in np.nonzero(~done)[0]:
            t, p = _job_segments(reads, seqs, gap_jobs[i])
            counts[i] = an.global_alignment_counts(t, p)
        if prof is not None:
            prof["cpu_left"] = _time.perf_counter() - t0
    if prof is not None:
        n_miss = int((~done).sum())
        tiers = " ".join(
            f"cap{c}:{tot}j/{u}u" for c, tot, u in prof["tiers"]
        )
        print(
            f"[gap-prof] n={n} tiers[{tiers}] miss={n_miss}"
            f" ({100.0 * n_miss / n:.2f}%)"
            f" emit={prof['emit']:.3f}s dedup={prof['dedup']:.3f}s"
            f" device={prof['device']:.3f}s scatter={prof['scatter']:.3f}s"
            f" cpu_left={prof['cpu_left']:.3f}s"
            f" total={_time.perf_counter() - t_all0:.3f}s",
            file=__import__('sys').stderr, flush=True,
        )

    if check:
        import trust4_tpu.align.native as an

        reads = [j[0] if isinstance(j, tuple) else j for j in query_jobs]
        for i in range(n):
            t, p = _job_segments(reads, seqs, gap_jobs[i])
            want = an.global_alignment_counts(t, p)
            got = tuple(int(v) for v in counts[i])
            assert got == want, (
                f"device gap counts mismatch job {i}: {got} vs {want}"
            )
    return counts
