"""Device gap-fill oracle: the Pallas DP in the shipping annotator.

Stage 2 (annotation) realigns every contig against the IMGT database; the
dominant DP volume is the inter-anchor gap fills inside the overlap
similarity pass (reference: SeqSet.hpp:1829-2007).  This module runs ALL
of a batch's gap fills as batched Pallas kernel launches
(ops/dp_pallas.banded_affine_dirs_pallas): the device computes scores
plus per-cell traceback-decision bits and the on-device DFA walker
(ops/dp_pallas.decode_dirs_counts) decodes (match, mismatch, indel)
counts bit-identical to the CPU DP — only the (n, 3) count triples leave
the device.  Job code rows are emitted by the C++ engine
(native/overlap_engine.cpp t4o_emit_gap_codes), so there is no per-job
Python work.

Runtime shape (since round 4): all device work runs in a WATCHDOGGED
SUBPROCESS (ops/gap_server.py).  A wedged tunnel blocks PJRT calls with
the GIL held — in-process, that froze entire runs (BENCH_r03's 770s
record); in the child it wedges only the child, every parent pipe
operation has a deadline, and on any timeout the run falls back to the
CPU DP.  The child's prewarm also absorbs the tunnel's one-time
first-transfer handshake (measured 24-200s) and reports measured warm
per-launch seconds.

Engagement is a MEASURED decision, not a read-count proxy — and since
round 5 it is PER TIER: each size tier is priced on both paths (CPU
cost from a calibrated native DP cell rate over the deduped unique
cells; device cost from the child's measured warm launch seconds), the
device takes exactly the tiers it wins, and the native CPU fills the
parked tiers' unique jobs WHILE the launches are in flight — the batch
wall is max(device, CPU), not the sum (see _gate_decision).  Tier 0's
16x16-cell jobs are CPU-bound by construction (a full chunk is ~30 ms
of one CPU thread vs a ~50-80 ms tunnel launch); tier 2's
144x48-cell chunks run ~3-4x faster on the device than on the 4-thread
CPU pool, so real batches typically split.
TRUST4_TPU_DEVICE=1 forces the device path (still watchdogged),
TRUST4_TPU_DEVICE=0 disables it, TRUST4_TPU_DEVICE_CHECK=1 additionally
asserts every device count equals the CPU DP's.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import Optional

import numpy as np

# Fixed size tiers keep kernel shapes stable (one compile per tier ever,
# shared across corpora/runs/entry points).  (max_len, band_width, chunk)
# — a job lands in the first tier covering both its length and
# 11+|len diff|; beyond the last tier it falls back to the CPU DP (it
# stays an oracle miss in phase 2).  Batches larger than `chunk` run as
# several launches of the same shape.
_TIERS = ((16, 16, 65536), (48, 24, 32768), (144, 48, 16384))

# Deadlines (seconds).  Every parent-side wait on the device child is
# bounded by one of these; a run can NEVER hang on the device.
LAUNCH_TIMEOUT_S = float(
    os.environ.get("TRUST4_TPU_DEVICE_TIMEOUT_S", "120")
)
READY_TIMEOUT_S = float(
    os.environ.get("TRUST4_TPU_DEVICE_READY_TIMEOUT_S", "300")
)

# The device must be predicted to beat the CPU path by this factor
# before it engages (absorbs cost-model noise: emit/transfer overheads
# and the calibration's ctypes bias both land inside 30%).
_CPU_FAVOR = 1.3

# Native dedup wall cost per job per thread (seconds); seeded from the
# round-3 measurement (10.8M jobs / 3.8s at 4 threads) and replaced by
# the measured value after the first real dedup of the process.
_dedup_s_per_job_thread = 1.4e-6

def _inproc() -> bool:
    """Debug-only in-process device path (no watchdog, no gate)."""
    return os.environ.get("TRUST4_TPU_GAP_INPROC", "0") == "1"

_client = None
_client_lock = threading.Lock()
_warned_fallback = False


def mode() -> str:
    """'1' force-on, '0' off, 'auto' (default)."""
    return os.environ.get("TRUST4_TPU_DEVICE", "auto")


def collect_profitable() -> bool:
    """Whether the collect-oracle restructuring can pay at all — the
    PRE-collect gate consulted by the annotator/assembler branches.

    Round-5 measured verdict (VALIDATION.md §gap-oracle): the oracle
    path restructures one query pass into collect + dedup + counts +
    oracle-consume, where the collect pass costs ~the full original pass
    (it runs the same hits/chain work in sink mode; 897k annotator:
    collect+dedup ~67s vs the 63s monolithic pass) while the DP it can
    offload is ~5% of the pass after the engine's own content memo
    (t4-prof: dp 35 of 225 thread-s at 897k; dedup leaves 567k unique
    jobs of 43.1M ~= 2.4s of CPU DP).  No launch speed — not even a
    zero-cost device — recovers a ~100% structural overhead to save
    ~5%, so auto mode never takes this path.  Forced ('1'), check, and
    in-process modes still do: they are the byte-identity/parity
    harness for the device stack, and the per-tier hybrid gate still
    prices each tier honestly there."""
    return mode() == "1" or check_mode() or _inproc()


def check_mode() -> bool:
    return os.environ.get("TRUST4_TPU_DEVICE_CHECK", "0") == "1"


# ---------------------------------------------------------------------------
# Device child lifecycle (subprocess path, the shipping default)
# ---------------------------------------------------------------------------


def _start_client():
    global _client
    with _client_lock:
        if _client is None:
            from trust4_tpu.ops.gap_server import GapDeviceClient

            _client = GapDeviceClient(_TIERS)
            import atexit

            atexit.register(lambda: _client and _client.kill())
    return _client


def prewarm(wait: bool = False) -> None:
    """Start the device child (idempotent, never blocks unless wait).
    The child attaches the backend, compiles every tier, and absorbs the
    tunnel's first-transfer handshake while the CPU stages run."""
    if mode() == "0":
        return
    if _inproc():
        _prewarm_inproc(wait)
        return
    c = _start_client()
    if wait:
        c.poll_ready(timeout_s=READY_TIMEOUT_S)


def active() -> bool:
    """True when the device path should serve this process's batches.
    auto: child started AND already READY (never blocks — if the tunnel
    is still handshaking or wedged, the batch goes to the CPU path).
    forced ('1'): starts the child if needed and waits, bounded by
    READY_TIMEOUT_S."""
    global _warned_fallback
    m = mode()
    if m == "0":
        return False
    if _inproc():
        return _active_inproc()
    if m == "auto":
        return _client is not None and _client.poll_ready(0.0)
    # forced
    c = _start_client()
    if not c.poll_ready(timeout_s=READY_TIMEOUT_S):
        # One bounded wait per RUN, not per call site: a child that
        # missed its ready deadline is killed so every later active()
        # probe fails fast instead of re-waiting the full timeout.
        c.kill()
        if not _warned_fallback:
            _warned_fallback = True
            print(
                "[trust4-tpu] TRUST4_TPU_DEVICE=1 but the device child "
                f"did not become ready within {READY_TIMEOUT_S:.0f}s; "
                "using the CPU DP for this run.",
                file=sys.stderr,
                flush=True,
            )
        return False
    return True


def device_available() -> bool:
    """Probe for a device backend IN-PROCESS.  Debug/tooling only: this
    imports jax and may block on a wedged tunnel — the shipping pipeline
    never calls it (the subprocess child does its own probing)."""
    if mode() == "0":
        return False
    try:
        from trust4_tpu.utils.axonboot import ensure_registered

        ensure_registered()
        import jax

        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Tier kernel (shared: the child executes this; in-process debug path too)
# ---------------------------------------------------------------------------


def _tier_counts_fn():
    """One jitted program per tier: the forward counts kernel — scores
    and (match, mismatch, indel) in a single gather-free pass; only the
    (chunk, 3) counts leave the device.  (Replaced the dirs-bits +
    on-device DFA decode pair in round 5: the decode's per-step gathers
    cost 170-360 ms per tier launch vs 25-29 ms for the forward kernel,
    measured in tools/dp_kernel_lab.py.)"""
    import functools

    import jax

    from trust4_tpu.ops.dp_pallas import banded_affine_counts_pallas

    @functools.partial(jax.jit, static_argnames=("w", "p_max"))
    def tier_counts(tc, tcl, pc, pcl, *, w, p_max):
        _scores, counts = banded_affine_counts_pallas(tc, tcl, pc, pcl, w)
        return counts

    return tier_counts


def pack_codes_host(codes: np.ndarray) -> np.ndarray:
    """4-bit pack two DP codes per byte (codes are 0..5, pad 5), host
    side.  Halves the bytes crossing the device tunnel per launch."""
    c = codes.astype(np.uint8)
    return (c[:, ::2] | (c[:, 1::2] << 4)).astype(np.uint8)


def _tier_counts_packed_fn():
    """Tier kernel taking 4-bit packed code rows; unpacks on device.
    The tunnel's host->device bandwidth (~22 MB/s measured) dominates
    warm launch cost, so halving the payload roughly halves it."""
    import functools

    import jax
    import jax.numpy as jnp

    from trust4_tpu.ops.dp_pallas import banded_affine_counts_pallas

    @functools.partial(jax.jit, static_argnames=("w", "p_max"))
    def tier_counts_packed(tcp, tcl, pcp, pcl, *, w, p_max):
        def unpack(p):
            u = p.astype(jnp.int32)
            lo = u & 15
            hi = (u >> 4) & 15
            return jnp.stack([lo, hi], axis=-1).reshape(
                p.shape[0], p_max
            ).astype(jnp.int8)

        _scores, counts = banded_affine_counts_pallas(
            unpack(tcp), tcl, unpack(pcp), pcl, w
        )
        return counts

    return tier_counts_packed


def pack_launch_host(tc, pc, tl, pl, n_rows: int, s_cap: int) -> np.ndarray:
    """Build the fused v2 launch payload: ONE uint8 buffer =
    [t_lens u8 | p_lens u8 | t codes 4-bit | p codes 4-bit], with the
    live rows padded up to n_rows.  One buffer means one tunnel h2d per
    launch (measured ~29 ms fixed cost per transfer,
    tools/tunnel_probe.py) and ~2.3x fewer bytes than the v0 protocol."""
    m = len(tc)
    assert s_cap % 2 == 0, "4-bit packing needs an even tier cap"
    half = s_cap // 2
    buf = np.empty(2 * n_rows + 2 * n_rows * half, dtype=np.uint8)
    buf[:m] = tl
    buf[m:n_rows] = 0
    buf[n_rows : n_rows + m] = pl
    buf[n_rows + m : 2 * n_rows] = 0
    o = 2 * n_rows
    tcp = pack_codes_host(tc)
    buf[o : o + m * half] = tcp.reshape(-1)
    buf[o + m * half : o + n_rows * half] = 0x55  # pad codes (5, 5)
    o += n_rows * half
    pcp = pack_codes_host(pc)
    buf[o : o + m * half] = pcp.reshape(-1)
    buf[o + m * half : o + n_rows * half] = 0x55
    return buf


def _tier_counts_fused_fn():
    """v2 launch protocol kernel: ONE uint8 input buffer (see
    pack_launch_host) -> (n_rows,) PACKED int32 counts.  Minimizes both
    per-transfer fixed cost (one h2d, one d2h) and bytes (4-bit codes,
    uint8 lens, 1 int32/job out) on the transfer-bound tunnel."""
    import functools

    import jax
    import jax.numpy as jnp

    from trust4_tpu.ops.dp_pallas import banded_affine_counts_packed_pallas

    @functools.partial(jax.jit, static_argnames=("w", "p_max", "n_rows"))
    def tier_counts_fused(buf, *, w, p_max, n_rows):
        half = p_max // 2
        tl = buf[:n_rows].astype(jnp.int32)
        pl = buf[n_rows : 2 * n_rows].astype(jnp.int32)
        o = 2 * n_rows

        def unpack(p):
            u = p.astype(jnp.int32)
            lo = u & 15
            hi = (u >> 4) & 15
            return jnp.stack([lo, hi], axis=-1).reshape(
                n_rows, p_max
            ).astype(jnp.int8)

        tcu = unpack(buf[o : o + n_rows * half].reshape(n_rows, half))
        pcu = unpack(
            buf[o + n_rows * half : o + 2 * n_rows * half].reshape(
                n_rows, half
            )
        )
        return banded_affine_counts_packed_pallas(tcu, tl, pcu, pl, w)

    return tier_counts_fused


_tier_counts = None


def _get_tier_counts():
    global _tier_counts
    if _tier_counts is None:
        _tier_counts = _tier_counts_fn()
    return _tier_counts


# ---------------------------------------------------------------------------
# In-process debug path (TRUST4_TPU_GAP_INPROC=1): no watchdog, no gate.
# Kept for kernel debugging and for tests that monkeypatch the tier fn.
# ---------------------------------------------------------------------------

_prewarm_thread: Optional[threading.Thread] = None
_prewarm_done = threading.Event()
_prewarm_ok = False


def _prewarm_inproc(wait: bool) -> None:
    global _prewarm_thread
    if _prewarm_thread is None:

        def run():
            global _prewarm_ok
            try:
                if not device_available():
                    return
                for s_cap, w_cap, chunk in _TIERS:
                    t = np.full((chunk, s_cap), 5, dtype=np.int8)
                    lens = np.zeros(chunk, dtype=np.int32)
                    cnt = _get_tier_counts()(
                        t, lens, t, lens, w=w_cap, p_max=s_cap
                    )
                    np.asarray(cnt)  # full round trip: absorb handshake
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


def _active_inproc() -> bool:
    if mode() == "auto":
        if _prewarm_thread is None:
            return False
        return _prewarm_done.is_set() and _prewarm_ok
    return device_available()


def _launch_inproc(launches):
    """Run tier launches in-process (debug path)."""
    tier_counts = _get_tier_counts()
    pending = []
    for tier, tc, pc, tl, pl in launches:
        s_cap, w_cap, chunk = _TIERS[tier]
        m = len(tc)
        if m != chunk:
            ftc = np.full((chunk, s_cap), 5, dtype=np.int8)
            fpc = np.full((chunk, s_cap), 5, dtype=np.int8)
            ftl = np.zeros(chunk, dtype=np.int32)
            fpl = np.zeros(chunk, dtype=np.int32)
            ftc[:m], fpc[:m], ftl[:m], fpl[:m] = tc, pc, tl, pl
            tc, pc, tl, pl = ftc, fpc, ftl, fpl
        pending.append(
            (m, tier_counts(tc, tl, pc, pl, w=w_cap, p_max=s_cap))
        )
    return [np.asarray(dev)[:m] for m, dev in pending]


# ---------------------------------------------------------------------------
# Measured engagement gate (auto mode)
# ---------------------------------------------------------------------------

_cpu_cells_per_s: Optional[float] = None


def _cpu_rate() -> float:
    """Single-thread native banded-DP throughput (cells/s), measured
    once per process on synthetic jobs through the same entry the CPU
    leftover path uses."""
    global _cpu_cells_per_s
    if _cpu_cells_per_s is None:
        import trust4_tpu.align.native as an

        rng = np.random.default_rng(1)
        pairs = []
        cells = 0
        for _ in range(256):
            L = 64
            t = "".join(rng.choice(list("ACGT"), L))
            p = list(t)
            for _k in range(4):
                p[int(rng.integers(0, L))] = str(
                    rng.choice(list("ACGT"))
                )
            pairs.append((t, "".join(p)))
            cells += L * 11  # band = 11 + |len diff|
        t0 = time.perf_counter()
        for t, p in pairs:
            an.global_alignment_counts(t, p)
        dt = max(time.perf_counter() - t0, 1e-6)
        _cpu_cells_per_s = cells / dt
    return _cpu_cells_per_s


def _launches_cost(uniq_by_tier, warm_s) -> float:
    out = 0.0
    for ti, (_s, _w, chunk) in enumerate(_TIERS):
        if uniq_by_tier[ti] > 0:
            out += np.ceil(uniq_by_tier[ti] / chunk) * warm_s[ti]
    return float(out)


def _tier_launch_cost(n_uniq: int, tier: int, warm_s) -> float:
    if n_uniq <= 0:
        return 0.0
    chunk = _TIERS[tier][2]
    full, rem = divmod(n_uniq, chunk)
    cost = full * warm_s[tier]
    if rem:  # tail launches run in the chunk/4 shape (gap_server v2)
        cost += np.ceil(rem / (chunk // 4)) * 0.4 * warm_s[tier]
    return float(cost)


def _gate_decision(nat, query_jobs, gap_jobs, tier_of, size, band,
                   n_threads, warm_s, prof):
    """PER-TIER measured-win gate, two stages.  Returns None (whole
    batch to the CPU path) or (engaged bool-per-tier, uniq_local,
    inverse, sel): the tiers the device is predicted to win plus the
    full-dedup result, REUSED by the hybrid batch — engaged tiers
    launch on the device while the native CPU computes the parked
    tiers' unique jobs in parallel (gap_counts_on_device).

    Stage 1 (cheap screen, <= 1/16 sampled native dedup): per tier, the
    sample's unique count floors the global unique count, so
    launches(sample_uniq_t) floors the device price, and
    cells(est_uniq_t)/rate is an optimistic ceiling on the CPU price
    (within-sample duplication underestimates global duplication).
    Stage 2 runs only when the summed optimistic benefit
    max(0, cpu_hi_t - launch_lo_t) clears the full-dedup price.

    Stage 2 (exact): full dedup (wall measured in place, result handed
    to the batch), then exact per-tier pricing: tier t engages iff
    cpu_t > _CPU_FAVOR * launch_t.  The round-4 whole-batch gate both
    overestimated unique fractions ~20x (duplication is global, not
    local) and let tier 0 — whose 16x16-cell jobs the CPU always wins —
    veto the device on the tiers it loses (VERDICT r4 task 1)."""
    global _dedup_s_per_job_thread
    n = len(gap_jobs)
    n_tiers = len(_TIERS)
    eligible = tier_of >= 0
    n_elig = int(eligible.sum())
    if n_elig == 0:
        return None
    eff = max(1.0, 0.7 * n_threads)
    cells = (size * np.minimum(band, 64)).astype(np.float64)
    top_cap = _TIERS[-1][0]

    dev_all = bool(eligible.all())
    sel = None if dev_all else np.nonzero(eligible)[0]
    sel_idx = np.arange(n) if dev_all else sel
    if n_elig > (1 << 16):
        sample = sel_idx[:: max(1, n_elig // (1 << 16))]
    else:
        sample = sel_idx
    t0 = time.perf_counter()
    uniq_s, _inv_s = nat.dedup_gap_jobs(
        query_jobs, np.ascontiguousarray(gap_jobs[sample]), top_cap,
        n_threads,
    )
    sample_s = time.perf_counter() - t0
    dedup_est = n * _dedup_s_per_job_thread / max(1, n_threads)
    rate = _cpu_rate() * eff
    st = tier_of[sample]
    su_tier = st[uniq_s]
    benefit = 0.0
    for ti in range(n_tiers):
        n_t = int((st == ti).sum())
        if n_t == 0:
            continue
        frac_t = int((su_tier == ti).sum()) / n_t
        n_elig_t = int((tier_of == ti).sum())
        mean_cells_t = float(cells[sample[st == ti]].mean())
        cpu_hi_t = mean_cells_t * frac_t * n_elig_t / rate
        launch_lo_t = _tier_launch_cost(
            int((su_tier == ti).sum()), ti, warm_s
        )
        benefit += max(0.0, cpu_hi_t - launch_lo_t)
    if benefit <= dedup_est:
        if prof is not None:
            prof["gate"] = (
                f"screen: benefit_hi={benefit:.3f}s <= "
                f"dedup_est={dedup_est:.3f}s (sample={len(sample)} "
                f"sample_s={sample_s:.3f}s) -> cpu"
            )
        return None

    # Stage 2: exact per-tier pricing on the full dedup (result reused).
    t0 = time.perf_counter()
    dev_jobs = gap_jobs if dev_all else np.ascontiguousarray(gap_jobs[sel])
    uniq_local, inverse = nat.dedup_gap_jobs(
        query_jobs, dev_jobs, top_cap, n_threads
    )
    dedup_s = time.perf_counter() - t0
    if len(dev_jobs) >= (1 << 16):
        _dedup_s_per_job_thread = dedup_s * max(1, n_threads) / len(dev_jobs)
    uniq_global = uniq_local if dev_all else sel[uniq_local]
    ut = tier_of[uniq_global]
    engaged = [False] * n_tiers
    detail = []
    for ti in range(n_tiers):
        usel_t = ut == ti
        n_u = int(usel_t.sum())
        if n_u == 0:
            continue
        launch_t = _tier_launch_cost(n_u, ti, warm_s)
        cpu_t = float(cells[uniq_global[usel_t]].sum()) / rate
        engaged[ti] = cpu_t > _CPU_FAVOR * launch_t
        detail.append(
            f"t{ti}:cpu={cpu_t:.3f}s dev={launch_t:.3f}s u={n_u}"
            + ("+D" if engaged[ti] else "-C")
        )
    if prof is not None:
        prof["gate"] = (
            f"exact: {' '.join(detail)} (dedup spent {dedup_s:.3f}s, "
            f"uniq={len(uniq_global)}/{n_elig})"
        )
    if not any(engaged):
        return None
    return engaged, uniq_local, inverse, sel


# ---------------------------------------------------------------------------
# Batch entry
# ---------------------------------------------------------------------------

_RC_FLAG = 1 << 30

# TRUST4_TPU_GAP_PROF=1: per-batch cost/coverage breakdown on stderr —
# job/unique counts per tier, device-miss fraction (jobs beyond the top
# tier), the measured gate's decision, and where the wall time goes.
# ``device=`` is the true submit-to-last-result wall (round 3 mislabeled
# the wait as scatter; VERDICT r3 weak #3).
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
    TPU (via the watchdogged device child).  nat: the
    NativeOverlapEngine; query_jobs: the batch's query tuples or plain
    read strings (for the read blob); gap_jobs: (n, 8) int32 rows from
    batch_collect_gaps or annotate0_collect_gaps (seq_idx may carry the
    bit-30 rc flag); seqs: queried SeqSet's wrappers (CPU leftovers +
    check mode).  Returns (n, 3) int32, or None (caller uses the CPU
    DP) — None is also the answer when the measured gate prices the CPU
    path as the winner, or when the device child times out/dies.

    Dedup happens NATIVELY before any code emission (t4o_dedup_gap_jobs):
    only unique DP inputs are materialized, transferred, and launched;
    duplicates scatter from the unique results."""
    global _dedup_s_per_job_thread

    n = len(gap_jobs)
    if n == 0:
        return np.zeros((0, 3), dtype=np.int32)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    prof = {"emit": 0.0, "dedup": 0.0, "submit": 0.0, "device": 0.0,
            "scatter": 0.0, "cpu_left": 0.0, "gate": "forced",
            "tiers": []} if _GAP_PROF else None
    t_all0 = time.perf_counter() if _GAP_PROF else 0.0
    check = check_mode()
    forced = mode() == "1" or check or _inproc()

    t_lens = gap_jobs[:, 5]
    r_lens = gap_jobs[:, 7]
    size = np.maximum(np.maximum(t_lens, r_lens), 2)
    band = 11 + np.abs(t_lens - r_lens)
    tier_of = np.full(n, -1, dtype=np.int32)
    for ti in range(len(_TIERS) - 1, -1, -1):
        s_cap, w_cap, _chunk = _TIERS[ti]
        tier_of[(size <= s_cap) & (band <= w_cap)] = ti

    engaged = [True] * len(_TIERS)
    dedup_reuse = None
    if not _inproc():
        c = _client
        if c is None or not c.ready:
            return None
        warm_s = c.warm_s or [0.3] * len(_TIERS)
        if not forced:
            g = _gate_decision(
                nat, query_jobs, gap_jobs, tier_of, size, band, n_threads,
                warm_s, prof,
            )
            if g is None:
                if prof is not None:
                    print(f"[gap-prof] n={n} gate[{prof['gate']}]",
                          file=sys.stderr, flush=True)
                return None
            engaged, uniq_local_g, inverse_g, _sel = g
            dedup_reuse = (uniq_local_g, inverse_g)

    counts = np.zeros((n, 3), dtype=np.int32)
    done = np.zeros(n, dtype=bool)

    try:
        # ONE global content dedup over all device-eligible jobs (equal
        # content implies equal lengths implies the same tier, so
        # cross-tier merges are impossible by construction).  The gate's
        # stage-2 dedup is reused when it ran.
        dev_all = bool((tier_of >= 0).all())
        dev_idx = None if dev_all else np.nonzero(tier_of >= 0)[0]
        top_cap = _TIERS[-1][0]
        if dedup_reuse is not None:
            uniq_local, inverse = dedup_reuse
        else:
            t0 = time.perf_counter()
            dev_jobs = (
                gap_jobs if dev_all
                else np.ascontiguousarray(gap_jobs[dev_idx])
            )
            uniq_local, inverse = nat.dedup_gap_jobs(
                query_jobs, dev_jobs, top_cap, n_threads
            )
            dedup_dt = time.perf_counter() - t0
            if len(dev_jobs) >= (1 << 16):  # recalibrate the gate's model
                _dedup_s_per_job_thread = (
                    dedup_dt * max(1, n_threads) / len(dev_jobs)
                )
            if prof is not None:
                prof["dedup"] += dedup_dt
        uniq_global = uniq_local if dev_all else dev_idx[uniq_local]
        uniq_tier = tier_of[uniq_global]
        uniq_counts = np.zeros((len(uniq_global), 3), dtype=np.int32)

        launches = []  # (tier, tc, pc, tl, pl) with live rows only
        spans = []  # usel slices per launch
        parked = []  # uniq ordinals of non-engaged tiers (native CPU)
        for ti, (s_cap, w_cap, chunk) in enumerate(_TIERS):
            usel = np.nonzero(uniq_tier == ti)[0]
            if len(usel) == 0:
                continue
            if prof is not None:
                prof["tiers"].append(
                    (s_cap, int((tier_of == ti).sum()), len(usel),
                     bool(engaged[ti]))
                )
            if not engaged[ti]:
                parked.append(usel)
                continue
            gsel = uniq_global[usel]
            t0 = time.perf_counter()
            t_codes, p_codes = nat.emit_gap_codes(
                query_jobs, np.ascontiguousarray(gap_jobs[gsel]), s_cap
            )
            tl = np.minimum(t_lens[gsel], s_cap).astype(np.int32)
            pl = np.minimum(r_lens[gsel], s_cap).astype(np.int32)
            if prof is not None:
                prof["emit"] += time.perf_counter() - t0
            for at in range(0, len(usel), chunk):
                hi = min(at + chunk, len(usel))
                launches.append(
                    (ti, t_codes[at:hi], p_codes[at:hi],
                     tl[at:hi], pl[at:hi])
                )
                spans.append(usel[at:hi])

        # Submit the device launches, then fill the parked tiers and the
        # beyond-top-tier jobs on the native CPU WHILE the tunnel round
        # trips — the hybrid's wall is max(device, cpu), not the sum.
        t0 = time.perf_counter()
        inproc_results = None
        if _inproc():
            inproc_results = _launch_inproc(launches)
        else:
            if not _client.submit_all(launches, LAUNCH_TIMEOUT_S):
                if check:
                    raise RuntimeError("device child failed the batch")
                return None
        if prof is not None:
            prof["submit"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        if parked:
            cus = np.concatenate(parked)
            uniq_counts[cus] = nat.gap_counts_cpu(
                query_jobs, gap_jobs, uniq_global[cus], n_threads
            )
        miss_idx = np.nonzero(tier_of < 0)[0]
        if len(miss_idx):
            counts[miss_idx] = nat.gap_counts_cpu(
                query_jobs, gap_jobs, miss_idx, n_threads
            )
            done[miss_idx] = True
        if prof is not None:
            prof["cpu_left"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        if inproc_results is not None:
            results = inproc_results
        else:
            results = _client.collect(len(launches), LAUNCH_TIMEOUT_S)
        if prof is not None:
            prof["device"] += time.perf_counter() - t0
        if results is None:
            if check:
                raise RuntimeError("device child failed the batch")
            return None
        t0 = time.perf_counter()
        for usel_part, res in zip(spans, results):
            uniq_counts[usel_part] = res
        if dev_all:
            counts[:] = uniq_counts[inverse]
            done[:] = True
        else:
            counts[dev_idx] = uniq_counts[inverse]
            done[dev_idx] = True
        if prof is not None:
            prof["scatter"] += time.perf_counter() - t0
    except Exception:
        if check:
            raise
        return None
    if prof is not None:
        n_miss = int((tier_of < 0).sum())
        tiers = " ".join(
            f"cap{c}:{tot}j/{u}u{'D' if eng else 'C'}"
            for c, tot, u, eng in prof["tiers"]
        )
        print(
            f"[gap-prof] n={n} tiers[{tiers}] miss={n_miss}"
            f" ({100.0 * n_miss / n:.2f}%) gate[{prof['gate']}]"
            f" emit={prof['emit']:.3f}s dedup={prof['dedup']:.3f}s"
            f" submit={prof['submit']:.3f}s device={prof['device']:.3f}s"
            f" scatter={prof['scatter']:.3f}s"
            f" cpu_left={prof['cpu_left']:.3f}s"
            f" total={time.perf_counter() - t_all0:.3f}s",
            file=sys.stderr, flush=True,
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
