"""Watchdogged device-child protocol (ops/gap_server.py).

The shipping pipeline must NEVER hang on the device: a wedged axon
tunnel blocks PJRT calls with the GIL held, so all device work lives in
a subprocess and every parent pipe operation carries a deadline.  These
tests drive the real client against the real child binary in its test
modes: ``mock`` (counts from the native CPU DP — full protocol, no jax),
``hang-ready`` and ``hang-launch`` (simulated wedged tunnel at each
phase).  The capstone runs the full driver on the bundled example with a
device child that hangs on its first launch and asserts the pipeline
completes on the CPU path with byte-identical outputs (VERDICT r3 next
item 1a).
"""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

from trust4_tpu.align import native as align_native
from trust4_tpu.ops.gap_oracle import _TIERS
from trust4_tpu.ops.gap_server import GapDeviceClient

DATA = os.path.join(os.path.dirname(__file__), "data")


def _client(test_mode: str) -> GapDeviceClient:
    env = dict(os.environ)
    env["TRUST4_TPU_GAP_SERVER_TEST"] = test_mode
    return GapDeviceClient(_TIERS, env=env)


def test_mock_server_roundtrip():
    """Frames, ordering, padding, and counts through the real pipes."""
    c = _client("mock")
    try:
        assert c.poll_ready(timeout_s=60)
        assert c.backend == "mock"
        rng = np.random.default_rng(3)
        launches = []
        want = []
        for tier in (0, 1, 0, 2):  # interleaved tiers, odd sizes
            s_cap = _TIERS[tier][0]
            m = int(rng.integers(1, 40))
            tc = rng.integers(0, 5, (m, s_cap), dtype=np.int8)
            pc = rng.integers(0, 5, (m, s_cap), dtype=np.int8)
            tl = rng.integers(0, s_cap + 1, m, dtype=np.int32)
            pl = np.clip(
                tl + rng.integers(-5, 6, m), 0, s_cap
            ).astype(np.int32)
            launches.append((tier, tc, pc, tl, pl))
            num = "ACGTN?"
            rows = []
            for j in range(m):
                t = "".join(num[v] for v in tc[j][: int(tl[j])])
                p = "".join(num[v] for v in pc[j][: int(pl[j])])
                rows.append(align_native.global_alignment_counts(t, p))
            want.append(np.array(rows, dtype=np.int32).reshape(m, 3))
        got = c.launch_all(launches, timeout_s=120)
        assert got is not None
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
    finally:
        c.kill()


def test_poll_ready_nonblocking_probe():
    """The auto gate's poll_ready(0.0) probe must eventually observe
    READY without ever blocking (round-5 regression: the deadline math
    returned False before attempting a read, so auto mode could never
    engage the device)."""
    c = _client("mock")
    try:
        t0 = time.monotonic()
        while time.monotonic() - t0 < 60:
            t1 = time.monotonic()
            ok = c.poll_ready(0.0)
            assert time.monotonic() - t1 < 0.5  # never blocks
            if ok:
                break
            time.sleep(0.05)
        assert c.ready
    finally:
        c.kill()


def test_hang_ready_detected():
    """A child that never readies: auto mode must see not-ready fast and
    the poll must never block past its timeout."""
    c = _client("hang-ready")
    try:
        t0 = time.monotonic()
        assert not c.poll_ready(timeout_s=0.5)
        assert time.monotonic() - t0 < 5
        # and a launch attempt on a non-ready client is refused outright
        assert c.launch_all([], timeout_s=1) is None
    finally:
        c.kill()


def test_hang_launch_times_out_and_kills():
    """A child that wedges mid-launch: the deadline must fire, the child
    must be killed, and the client must stay dead."""
    c = _client("hang-launch")
    try:
        assert c.poll_ready(timeout_s=60)
        s_cap = _TIERS[0][0]
        tc = np.zeros((4, s_cap), dtype=np.int8)
        tl = np.zeros(4, dtype=np.int32)
        t0 = time.monotonic()
        got = c.launch_all([(0, tc, tc, tl, tl)], timeout_s=2)
        assert got is None
        assert time.monotonic() - t0 < 30
        assert not c.ok
        assert c._proc.poll() is not None  # child reaped
    finally:
        c.kill()


def test_gate_declines_when_cpu_wins(monkeypatch):
    """Measured gate: tiny batches (CPU cost ~0) must not engage the
    device even when the child is ready."""
    from trust4_tpu.ops import gap_oracle

    class _Nat:
        def dedup_gap_jobs(self, jobs, gap_jobs, width, n_threads):
            n = len(gap_jobs)
            return (np.arange(n, dtype=np.int32),
                    np.arange(n, dtype=np.int32))

    rows = np.array([[0, 0, 0, 0, 0, 8, 0, 8]] * 32, dtype=np.int32)
    tier_of = np.zeros(32, dtype=np.int32)
    size = np.full(32, 8)
    band = np.full(32, 11)
    engage = gap_oracle._gate_decision(
        _Nat(), ["ACGTACGT"], rows, tier_of, size, band,
        n_threads=4, warm_s=[0.3, 0.3, 0.5], prof=None,
    )
    assert not engage


@pytest.mark.slow
def test_pipeline_completes_with_hung_device(tmp_path, reference_dir):
    """Full driver on the bundled example with the device FORCED on and
    the child wedging on its first launch: the run must complete on the
    CPU fallback within the deadline budget and produce the committed
    golden outputs byte-identically."""
    prefix = str(tmp_path / "ex")
    env = dict(os.environ)
    env["TRUST4_TPU_DEVICE"] = "1"
    env["TRUST4_TPU_GAP_SERVER_TEST"] = "hang-launch"
    env["TRUST4_TPU_DEVICE_TIMEOUT_S"] = "3"
    env["TRUST4_TPU_DEVICE_READY_TIMEOUT_S"] = "60"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    example = os.path.join(reference_dir, "example")
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from trust4_tpu.pipeline.run import run_trust4\n"
        "run_trust4(%r, %r, read1_files=[%r], read2_files=[%r],\n"
        "           output_prefix=%r)\n"
        % (
            repo,
            os.path.join(reference_dir, "hg38_bcrtcr.fa"),
            os.path.join(reference_dir, "human_IMGT+C.fa"),
            os.path.join(example, "example_1.fq"),
            os.path.join(example, "example_2.fq"),
            prefix,
        )
    )
    t0 = time.monotonic()
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=600)
    assert time.monotonic() - t0 < 300
    for suffix, golden in (
        ("_annot.fa", "gold_annot.fa"),
        ("_cdr3.out", "gold_cdr3.out"),
    ):
        with open(prefix + suffix) as f_got, open(
            os.path.join(DATA, golden)
        ) as f_want:
            assert f_got.read() == f_want.read(), suffix
