"""Deferred device-backend boot for the CLI.

On this machine the TPU is attached through an out-of-tree PJRT plugin
that a ``sitecustomize`` hook registers at EVERY interpreter start when
``PALLAS_AXON_POOL_IPS`` is set — importing jax and dialing the device
tunnel before any user code runs (~2.6 s serial, measured).  The
reference driver is perl + C binaries and pays nothing comparable, so
this fixed tax alone put the full-driver CLI ~1.5 s behind on corpora
the pipeline itself finishes in ~2 s.

The pipeline only needs the device backend lazily (the stage-2 gap
oracle's prewarm thread, which overlaps with the CPU-bound extraction
and assembly stages).  So:

Because sitecustomize runs before ANY user code (including ``__main__``),
the gate can only be stashed in the LAUNCH environment — re-exec'ing from
inside Python is too late, the first interpreter has already paid.  So:

* ``bin/trust4-tpu`` (and ``stashed_env()`` for programmatic launchers
  like bench.py) move the gate to ``TRUST4_TPU_AXON_POOL_IPS`` before
  exec'ing the interpreter.  The fresh interpreter boots in ~50 ms
  (sitecustomize's gated block is skipped).
* ``ensure_registered()`` — called by the device paths immediately
  before their first ``import jax``: restores the gate variable and
  re-executes the sitecustomize module, i.e. the exact boot-path
  registration, just later and off the critical path (the gap oracle's
  prewarm thread, which overlaps the CPU-bound assembly stages).  No-op
  when the boot was never deferred (tests, the driver's own interpreter,
  plain TPU VMs where jax finds the backend itself).
"""

from __future__ import annotations

import importlib
import os
import sys
import threading

_GATE = "PALLAS_AXON_POOL_IPS"
_STASH = "TRUST4_TPU_AXON_POOL_IPS"
# Current axon builds register via a PYTHONPATH sitecustomize entry with
# no gate variable at all (~1.7 s measured at EVERY interpreter start),
# so the stash also moves that path entry aside.
_SITE_STASH = "TRUST4_TPU_AXON_SITE"

_lock = threading.Lock()
_registered = False


def stashed_env() -> dict:
    """A copy of os.environ with the device-boot gate AND the axon
    sitecustomize PYTHONPATH entry stashed, for spawning trust4_tpu CLI
    subprocesses that should boot fast (~70 ms vs ~1.8 s) and register
    the device backend lazily (ensure_registered)."""
    env = dict(os.environ)
    ips = env.pop(_GATE, None)
    if ips:
        env[_STASH] = ips
    pp = env.get("PYTHONPATH", "")
    if pp and _SITE_STASH not in env:
        parts = pp.split(os.pathsep)
        axon = [p for p in parts if "axon_site" in p]
        if axon:
            rest = [p for p in parts if "axon_site" not in p]
            env[_SITE_STASH] = os.pathsep.join(axon)
            env["PYTHONPATH"] = os.pathsep.join(rest)
    return env


def ensure_registered() -> None:
    """Run the deferred device registration (idempotent, thread-safe).

    Must be called before the first ``import jax`` on any path that
    expects the axon PJRT backend.  Restores the stashed sys.path entry
    and/or gate variable and executes the sitecustomize module — the
    identical code the interpreter would have run at boot.
    """
    global _registered
    site_stash = os.environ.get(_SITE_STASH)
    ips = os.environ.get(_STASH)
    if not site_stash and not ips:
        return
    with _lock:
        if _registered:
            return
        if ips:
            os.environ[_GATE] = ips
        if site_stash:
            for p in reversed(site_stash.split(os.pathsep)):
                if p and p not in sys.path:
                    sys.path.insert(0, p)
            # Children (e.g. the device child itself re-spawning tools)
            # must see the entry again: restore it in PYTHONPATH.
            pp = os.environ.get("PYTHONPATH", "")
            if "axon_site" not in pp:
                os.environ["PYTHONPATH"] = (
                    site_stash + (os.pathsep + pp if pp else "")
                )
        try:
            import sitecustomize

            importlib.reload(sitecustomize)
        except Exception as e:  # noqa: BLE001 — mirror sitecustomize's own
            # swallow-and-report: a failed registration must not take the
            # CPU pipeline down; jax will raise on first device use.
            print(
                f"[trust4-tpu] deferred device boot failed: "
                f"{type(e).__name__}: {e}",
                file=sys.stderr,
            )
        _registered = True
