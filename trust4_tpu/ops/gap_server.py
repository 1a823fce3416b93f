"""Watchdogged device subprocess for the gap-fill oracle.

Why a subprocess: every JAX/PJRT call into the tunneled TPU backend can
block *holding the GIL* — a wedged tunnel freezes not just the calling
thread but the whole pipeline (observed: 12+ minutes at 0% CPU with all
threads in futex wait; that run is BENCH_r03's 770s record).  No
in-process timeout can guard that, so the device work moves to a child
process and the parent talks to it over plain pipes: ``os.read`` /
``os.write`` release the GIL and every parent-side pipe operation here
carries a deadline.  A wedged tunnel now wedges only the child; the
parent kills it and the run falls back to the CPU DP.

The child also absorbs the tunnel's one-time cost: the FIRST
device-to-host materialization of a process takes 24-200s on this
tunnel (measured; ``jax.block_until_ready`` returns instantly and the
cost lands in the first transfer), so the child's prewarm runs one full
launch+materialize round trip per tier and only then reports READY with
its measured warm per-launch seconds — the parent's measured auto gate
(ops/gap_oracle.py) prices device batches with those numbers.

Protocol (length-prefixed binary frames over the child's stdin/stdout):

  parent -> child   LAUNCH(seq, tier, m, tl, pl, t_codes, p_codes)
                    QUIT()
  child  -> parent  READY(json: warm_s per tier, handshake_s, backend)
                    COUNTS(seq, m, counts m*3 i32)
                    ERROR(utf8 message)

The child replies to LAUNCH frames in order; a reader thread drains
stdin so the parent can submit a whole batch without blocking on pipe
backpressure, and the async JAX dispatch overlaps the child's transfers
with kernel execution.

Test hooks (``TRUST4_TPU_GAP_SERVER_TEST``): ``mock`` computes counts
with the native CPU DP (no jax import — exercises the full protocol in
tests), ``hang-ready`` never readies, ``hang-launch`` readies then
sleeps forever on the first LAUNCH — the parent must detect both and
complete on the CPU path (tests/test_gap_server.py).

There is no reference counterpart: the reference's annotation DP is
in-process CPU (SeqSet.hpp:1829-2007); this file is TPU-runtime
plumbing.
"""

from __future__ import annotations

import json
import os
import select
import signal
import struct
import subprocess
import sys
import threading
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

MSG_READY = 1
MSG_COUNTS = 2
MSG_ERROR = 3
MSG_LAUNCH = 16
MSG_QUIT = 17

_HDR = struct.Struct("<II")  # (msg_type, payload_len)
_LAUNCH_HDR = struct.Struct("<III")  # (seq, tier, m)
_COUNTS_HDR = struct.Struct("<II")  # (seq, m)


# ---------------------------------------------------------------------------
# Parent side
# ---------------------------------------------------------------------------


class GapServerError(Exception):
    pass


class GapServerTimeout(GapServerError):
    pass


class GapDeviceClient:
    """Parent-side handle on the device child process.

    Every pipe operation is select()-guarded with a deadline; on any
    timeout, protocol error, or child death the client kills the child
    and stays permanently dead (``ok`` False) — the caller falls back
    to the CPU DP for the rest of the run.
    """

    def __init__(self, tiers, env: Optional[dict] = None):
        self.tiers = tuple(tiers)
        self.warm_s: Optional[List[float]] = None
        self.handshake_s: Optional[float] = None
        self.backend = ""
        self._dead = False
        self._ready = False
        self._rbuf = b""
        self.started_at = time.monotonic()
        child_env = dict(os.environ if env is None else env)
        # The child imports trust4_tpu from the same tree as the parent.
        pkg_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        pp = child_env.get("PYTHONPATH", "")
        child_env["PYTHONPATH"] = pkg_root + (os.pathsep + pp if pp else "")

        def _child_setup():  # pragma: no cover - runs in the child
            try:
                os.nice(5)  # don't steal CPU from the -t threads
            except OSError:
                pass
            try:  # die with the parent (no orphaned tunnel holders)
                import ctypes

                libc = ctypes.CDLL("libc.so.6", use_errno=True)
                PR_SET_PDEATHSIG = 1
                libc.prctl(PR_SET_PDEATHSIG, signal.SIGKILL, 0, 0, 0)
            except Exception:
                pass

        self._proc = subprocess.Popen(
            [sys.executable, "-m", "trust4_tpu.ops.gap_server"],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=None,  # inherit: child logs surface in the run's stderr
            env=child_env,
            preexec_fn=_child_setup,
        )
        os.set_blocking(self._proc.stdin.fileno(), False)
        os.set_blocking(self._proc.stdout.fileno(), False)

    # -- lifecycle ----------------------------------------------------

    @property
    def ok(self) -> bool:
        return not self._dead

    @property
    def ready(self) -> bool:
        return self._ready and not self._dead

    def kill(self) -> None:
        self._dead = True
        if self._proc.poll() is None:
            try:
                self._proc.kill()
            except OSError:
                pass
        try:
            self._proc.stdin.close()
        except OSError:
            pass
        try:
            self._proc.stdout.close()
        except OSError:
            pass
        # The child got SIGKILL: reaping it cannot block meaningfully.
        try:
            self._proc.wait(timeout=5)
        except Exception:
            pass

    # -- framed pipe I/O (deadline-guarded, GIL-safe) -------------------

    def _write_all(self, data: bytes, deadline: float) -> None:
        fd = self._proc.stdin.fileno()
        view = memoryview(data)
        while view:
            budget = deadline - time.monotonic()
            if budget <= 0:
                raise GapServerTimeout("write to device child timed out")
            r, w, _x = [], [fd], []
            w_ready = select.select(r, w, _x, min(budget, 1.0))[1]
            if not w_ready:
                if self._proc.poll() is not None:
                    raise GapServerError("device child exited")
                continue
            try:
                n = os.write(fd, view[: 1 << 20])
            except BlockingIOError:
                continue
            except (BrokenPipeError, OSError) as e:
                raise GapServerError(f"device child pipe: {e}")
            view = view[n:]

    def _read_exact(self, n: int, deadline: float) -> bytes:
        fd = self._proc.stdout.fileno()
        while len(self._rbuf) < n:
            budget = deadline - time.monotonic()
            if budget <= 0:
                raise GapServerTimeout("device child result timed out")
            r_ready = select.select([fd], [], [], min(budget, 1.0))[0]
            if not r_ready:
                if self._proc.poll() is not None:
                    raise GapServerError("device child exited")
                continue
            try:
                chunk = os.read(fd, 1 << 20)
            except BlockingIOError:
                continue
            except OSError as e:
                raise GapServerError(f"device child pipe: {e}")
            if not chunk:
                raise GapServerError("device child closed the pipe")
            self._rbuf += chunk
        out, self._rbuf = self._rbuf[:n], self._rbuf[n:]
        return out

    def _read_frame(self, deadline: float) -> Tuple[int, bytes]:
        hdr = self._read_exact(_HDR.size, deadline)
        msg_type, length = _HDR.unpack(hdr)
        payload = self._read_exact(length, deadline) if length else b""
        if msg_type == MSG_ERROR:
            raise GapServerError(
                "device child error: " + payload.decode("utf-8", "replace")
            )
        return msg_type, payload

    # -- protocol -------------------------------------------------------

    def poll_ready(self, timeout_s: float = 0.0) -> bool:
        """Advance toward READY without ever blocking past timeout_s.
        False = not ready yet (or dead)."""
        if self._dead:
            return False
        if self._ready:
            return True
        deadline = time.monotonic() + timeout_s
        try:
            first = True
            while True:
                fd = self._proc.stdout.fileno()
                if len(self._rbuf) < _HDR.size:
                    budget = deadline - time.monotonic()
                    if budget <= 0 and not first:
                        return False
                    first = False
                    # One select is always attempted: with timeout_s=0
                    # (the auto gate's non-blocking probe) the deadline
                    # math lands microseconds in the past, and round 4's
                    # early return meant a READY frame sitting in the
                    # pipe was NEVER read — auto mode could not engage.
                    if not select.select([fd], [], [], max(budget, 0))[0]:
                        if self._proc.poll() is not None:
                            raise GapServerError("device child exited")
                        return False
                msg_type, payload = self._read_frame(
                    max(deadline, time.monotonic() + 0.2)
                )
                if msg_type == MSG_READY:
                    info = json.loads(payload.decode("utf-8"))
                    self.warm_s = [float(v) for v in info["warm_s"]]
                    self.handshake_s = float(info.get("handshake_s", 0.0))
                    self.backend = str(info.get("backend", ""))
                    self._ready = True
                    return True
        except GapServerError as e:
            print(f"[trust4-tpu] device child not ready: {e}",
                  file=sys.stderr, flush=True)
            self.kill()
            return False

    def submit_all(
        self,
        launches: Sequence[Tuple[int, np.ndarray, np.ndarray,
                                 np.ndarray, np.ndarray]],
        timeout_s: float,
    ) -> bool:
        """Write (tier, t_codes, p_codes, tl, pl) LAUNCH frames to the
        child without waiting for results — the caller runs CPU work
        while the tunnel round trips, then calls collect().  Codes are
        the LIVE rows only (m <= chunk; the child pads).  False after
        killing the child on timeout/failure."""
        if self._dead or not self._ready:
            return False
        try:
            deadline = time.monotonic() + timeout_s
            for seq, (tier, tc, pc, tl, pl) in enumerate(launches):
                m = len(tc)
                payload = b"".join(
                    (
                        _LAUNCH_HDR.pack(seq, tier, m),
                        np.ascontiguousarray(tl, dtype=np.int32).tobytes(),
                        np.ascontiguousarray(pl, dtype=np.int32).tobytes(),
                        np.ascontiguousarray(tc, dtype=np.int8).tobytes(),
                        np.ascontiguousarray(pc, dtype=np.int8).tobytes(),
                    )
                )
                self._write_all(
                    _HDR.pack(MSG_LAUNCH, len(payload)) + payload, deadline
                )
            return True
        except GapServerError as e:
            print(
                f"[trust4-tpu] device child failed at submit ({e}); "
                "CPU DP fallback for the rest of the run.",
                file=sys.stderr,
                flush=True,
            )
            self.kill()
            return False

    def collect(self, n_launches: int,
                timeout_s: float) -> Optional[List[np.ndarray]]:
        """Read the COUNTS frames of a prior submit_all.  Returns
        per-launch (m, 3) int32 counts in submit order, or None after
        killing the child on any timeout/failure."""
        if self._dead or not self._ready:
            return None
        try:
            deadline = time.monotonic() + timeout_s
            results: List[Optional[np.ndarray]] = [None] * n_launches
            for _ in range(n_launches):
                msg_type, payload = self._read_frame(deadline)
                if msg_type != MSG_COUNTS:
                    raise GapServerError(
                        f"unexpected frame {msg_type} awaiting counts"
                    )
                seq, m = _COUNTS_HDR.unpack_from(payload, 0)
                counts = np.frombuffer(
                    payload, dtype=np.int32, offset=_COUNTS_HDR.size
                ).reshape(m, 3)
                results[seq] = counts
            if any(r is None for r in results):
                raise GapServerError("duplicate/missing counts frames")
            return results  # type: ignore[return-value]
        except GapServerError as e:
            print(
                f"[trust4-tpu] device child failed mid-batch ({e}); "
                "CPU DP fallback for the rest of the run.",
                file=sys.stderr,
                flush=True,
            )
            self.kill()
            return None

    def launch_all(
        self,
        launches: Sequence[Tuple[int, np.ndarray, np.ndarray,
                                 np.ndarray, np.ndarray]],
        timeout_s: float,
    ) -> Optional[List[np.ndarray]]:
        """submit_all + collect in one blocking call (tests, tools)."""
        if not self.submit_all(launches, timeout_s):
            return None
        return self.collect(len(launches), timeout_s)


# ---------------------------------------------------------------------------
# Child side
# ---------------------------------------------------------------------------


def _child_write(out, msg_type: int, payload: bytes) -> None:
    out.write(_HDR.pack(msg_type, len(payload)) + payload)
    out.flush()


def _child_read_exact(fd: int, n: int) -> Optional[bytes]:
    buf = b""
    while len(buf) < n:
        chunk = os.read(fd, n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def _decode_launch(payload: bytes, tiers):
    seq, tier, m = _LAUNCH_HDR.unpack_from(payload, 0)
    s_cap = tiers[tier][0]
    off = _LAUNCH_HDR.size
    tl = np.frombuffer(payload, np.int32, m, off)
    off += 4 * m
    pl = np.frombuffer(payload, np.int32, m, off)
    off += 4 * m
    tc = np.frombuffer(payload, np.int8, m * s_cap, off).reshape(m, s_cap)
    off += m * s_cap
    pc = np.frombuffer(payload, np.int8, m * s_cap, off).reshape(m, s_cap)
    return seq, tier, m, tc, pc, tl, pl


def _serve_mock(proto_in: int, out, tiers) -> None:
    """Protocol-complete mock: counts from the native CPU DP (no jax).
    Exercises framing/ordering/padding in tests."""
    import trust4_tpu.align.native as an

    _child_write(
        out,
        MSG_READY,
        json.dumps(
            {"warm_s": [0.001] * len(tiers), "handshake_s": 0.0,
             "backend": "mock"}
        ).encode(),
    )
    num = "ACGTN?"
    while True:
        hdr = _child_read_exact(proto_in, _HDR.size)
        if hdr is None:
            return
        msg_type, length = _HDR.unpack(hdr)
        payload = _child_read_exact(proto_in, length) or b""
        if msg_type == MSG_QUIT:
            return
        if msg_type != MSG_LAUNCH:
            continue
        seq, _tier, m, tc, pc, tl, pl = _decode_launch(payload, tiers)
        counts = np.zeros((m, 3), dtype=np.int32)
        for j in range(m):
            t = "".join(num[v] for v in tc[j][: int(tl[j])])
            p = "".join(num[v] for v in pc[j][: int(pl[j])])
            counts[j] = an.global_alignment_counts(t, p)
        _child_write(
            out, MSG_COUNTS, _COUNTS_HDR.pack(seq, m) + counts.tobytes()
        )


def _serve_device(proto_in: int, out, tiers) -> None:
    from trust4_tpu.utils.axonboot import ensure_registered

    ensure_registered()
    import jax

    try:
        backend = jax.default_backend()
    except RuntimeError:
        # JAX_PLATFORMS can demand a platform whose plugin never
        # registered in THIS process (e.g. a parent that clobbered the
        # PYTHONPATH entry carrying the plugin's sitecustomize while the
        # platform env var survived).  Let jax pick from what actually
        # registered; if that is only cpu we report below and the run
        # stays on the CPU DP.
        jax.config.update("jax_platforms", "")
        backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        _child_write(
            out, MSG_ERROR, f"no device backend (got {backend})".encode()
        )
        return

    from trust4_tpu.ops.gap_oracle import (
        _tier_counts_fn,
        _tier_counts_fused_fn,
        _tier_counts_packed_fn,
        pack_codes_host,
        pack_launch_host,
    )
    from trust4_tpu.ops.dp_pallas import unpack_counts_host

    # Launch protocol (A/B knob; v2 is the shipping default):
    #   v2  ONE fused uint8 buffer in (u8 lens + 4-bit codes), packed
    #       int32 counts out, tail launches in a chunk/4-row shape —
    #       minimizes transfer count AND bytes on the ~29ms-RTT /
    #       ~22MB/s tunnel (tools/tunnel_probe.py).
    #   v1  4-bit packed code arrays, int32 lens, (m,3) counts out.
    #   v0  raw int8 codes, int32 lens, (m,3) counts out (round-4 form).
    proto = os.environ.get("TRUST4_TPU_LAUNCH_PROTO", "v2")
    tier_counts_fused = _tier_counts_fused_fn() if proto == "v2" else None
    tier_counts_packed = (
        _tier_counts_packed_fn() if proto == "v1" else None
    )
    tier_counts_raw = _tier_counts_fn() if proto == "v0" else None
    rng = np.random.default_rng(0)

    def _shape_rows(tier: int, m: int) -> int:
        # Two compiled shapes per tier: full chunk, and chunk/4 for the
        # tail launch (less pad-row transfer waste without a recompile
        # per batch size).
        chunk = tiers[tier][2]
        return chunk if m > chunk // 4 else chunk // 4

    def _launch(tier, tc, pc, tl, pl):
        s_cap, w_cap, chunk = tiers[tier]
        m = len(tc)
        if proto == "v2":
            n_rows = _shape_rows(tier, m)
            buf = pack_launch_host(tc, pc, tl, pl, n_rows, s_cap)
            return tier_counts_fused(
                buf, w=w_cap, p_max=s_cap, n_rows=n_rows
            )
        if m == chunk:
            ftc, fpc, ftl, fpl = tc, pc, tl, pl
        else:
            ftc = np.full((chunk, s_cap), 5, dtype=np.int8)
            fpc = np.full((chunk, s_cap), 5, dtype=np.int8)
            ftl = np.zeros(chunk, dtype=np.int32)
            fpl = np.zeros(chunk, dtype=np.int32)
            ftc[:m], fpc[:m], ftl[:m], fpl[:m] = tc, pc, tl, pl
        if proto == "v1":
            return tier_counts_packed(
                pack_codes_host(ftc), ftl, pack_codes_host(fpc), fpl,
                w=w_cap, p_max=s_cap,
            )
        return tier_counts_raw(ftc, ftl, fpc, fpl, w=w_cap, p_max=s_cap)

    def _materialize(dev, m: int) -> np.ndarray:
        """Device result -> (m, 3) int32 counts."""
        arr = np.asarray(dev)
        if proto == "v2":
            return unpack_counts_host(arr[:m])
        return arr[:m]

    # Prewarm: trace+compile every tier shape, then one realistic launch
    # with a full host materialization — the FIRST np.asarray of the
    # process pays the tunnel's one-time transfer handshake (24-200s
    # measured), which must land here (overlapped with the parent's CPU
    # stages), not in the first real batch.  Then time one warm
    # full-chunk launch per tier: those are the prices the parent's
    # measured auto gate uses.
    t0 = time.monotonic()
    warm_s = []
    for tier, (s_cap, w_cap, chunk) in enumerate(tiers):
        tc = rng.integers(0, 4, (chunk, s_cap), dtype=np.int8)
        tl = np.full(chunk, s_cap, dtype=np.int32)
        np.asarray(_launch(tier, tc, tc, tl, tl))
        if proto == "v2":  # compile the tail shape too
            q = chunk // 4
            np.asarray(_launch(tier, tc[:q], tc[:q], tl[:q], tl[:q]))
    handshake_s = time.monotonic() - t0
    for tier, (s_cap, w_cap, chunk) in enumerate(tiers):
        tc = rng.integers(0, 4, (chunk, s_cap), dtype=np.int8)
        tl = np.full(chunk, s_cap, dtype=np.int32)
        t1 = time.monotonic()
        np.asarray(_launch(tier, tc, tc, tl, tl))
        warm_s.append(time.monotonic() - t1)
    _child_write(
        out,
        MSG_READY,
        json.dumps(
            {"warm_s": warm_s, "handshake_s": handshake_s,
             "backend": backend}
        ).encode(),
    )

    # Serve loop: a reader thread drains frames so dispatches can run
    # ahead of materializations (JAX async dispatch overlaps the tunnel
    # transfers of launch k+1 with the execution of launch k).
    import queue

    frames: "queue.Queue" = queue.Queue()

    def _reader():
        while True:
            hdr = _child_read_exact(proto_in, _HDR.size)
            if hdr is None:
                frames.put(None)
                return
            msg_type, length = _HDR.unpack(hdr)
            payload = _child_read_exact(proto_in, length) or b""
            frames.put((msg_type, payload))
            if msg_type == MSG_QUIT:
                return

    threading.Thread(target=_reader, daemon=True).start()

    from collections import deque

    pending = deque()  # (seq, m, device result)
    while True:
        block = not pending
        try:
            item = frames.get(block=block, timeout=None if block else 0.0)
        except queue.Empty:
            item = False  # no new frame; materialize the head
        if item is None:
            return
        if item is not False:
            msg_type, payload = item
            if msg_type == MSG_QUIT:
                return
            if msg_type == MSG_LAUNCH:
                seq, tier, m, tc, pc, tl, pl = _decode_launch(
                    payload, tiers
                )
                pending.append((seq, m, _launch(tier, tc, pc, tl, pl)))
            continue  # drain more frames before blocking on results
        seq, m, dev = pending.popleft()
        counts = _materialize(dev, m)
        _child_write(
            out,
            MSG_COUNTS,
            _COUNTS_HDR.pack(seq, m)
            + np.ascontiguousarray(counts, dtype=np.int32).tobytes(),
        )


def main() -> None:
    # stdout carries the binary protocol: hand the fd to the protocol
    # writer and point fd 1 (print/log traffic) at stderr.
    proto_out = os.fdopen(os.dup(1), "wb")
    os.dup2(2, 1)
    sys.stdout = sys.stderr
    proto_in = 0

    from trust4_tpu.ops.gap_oracle import _TIERS

    test_mode = os.environ.get("TRUST4_TPU_GAP_SERVER_TEST", "")
    try:
        if test_mode == "hang-ready":
            time.sleep(86400)
        elif test_mode == "hang-launch":
            _child_write(
                proto_out,
                MSG_READY,
                json.dumps(
                    {"warm_s": [0.001] * len(_TIERS), "handshake_s": 0.0,
                     "backend": "hang"}
                ).encode(),
            )
            _child_read_exact(proto_in, _HDR.size)
            time.sleep(86400)
        elif test_mode == "mock":
            _serve_mock(proto_in, proto_out, _TIERS)
        else:
            _serve_device(proto_in, proto_out, _TIERS)
    except BrokenPipeError:
        pass
    except Exception as e:  # noqa: BLE001 - report, then die
        import traceback

        traceback.print_exc()  # child stderr is the run's stderr
        try:
            _child_write(
                proto_out, MSG_ERROR, f"{type(e).__name__}: {e}".encode()
            )
        except Exception:
            pass
        sys.exit(1)


if __name__ == "__main__":
    main()
