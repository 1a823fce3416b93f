"""Deferred device-backend boot (utils/axonboot.py).

The launcher contract: ``stashed_env()`` moves the sitecustomize gate
variable aside so spawned interpreters boot without the eager PJRT
registration, and ``ensure_registered()`` is a no-op unless a stash is
present (so tests, driver interpreters, and plain TPU VMs are untouched).
"""

import os
import stat
import subprocess

import trust4_tpu.utils.axonboot as axonboot

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stashed_env_moves_gate(monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.delenv("TRUST4_TPU_AXON_POOL_IPS", raising=False)
    env = axonboot.stashed_env()
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert env["TRUST4_TPU_AXON_POOL_IPS"] == "10.0.0.1"
    # os.environ itself is untouched.
    assert os.environ["PALLAS_AXON_POOL_IPS"] == "10.0.0.1"


def test_stashed_env_noop_without_gate(monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    env = axonboot.stashed_env()
    assert "TRUST4_TPU_AXON_POOL_IPS" not in env


def test_ensure_registered_noop_without_stash(monkeypatch):
    monkeypatch.delenv("TRUST4_TPU_AXON_POOL_IPS", raising=False)
    # Must not import sitecustomize or flip the registered flag.
    before = axonboot._registered
    axonboot.ensure_registered()
    assert axonboot._registered == before


def test_launcher_script_stashes_gate(tmp_path):
    """bin/trust4-tpu must exec its interpreter with the gate variable
    moved to the stash (probed by substituting the interpreter)."""
    probe = tmp_path / "probe.sh"
    probe.write_text(
        "#!/bin/sh\n"
        'echo "gate=${PALLAS_AXON_POOL_IPS:-unset} '
        'stash=${TRUST4_TPU_AXON_POOL_IPS:-unset}"\n'
    )
    probe.chmod(probe.stat().st_mode | stat.S_IXUSR)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = "10.9.9.9"
    env.pop("TRUST4_TPU_AXON_POOL_IPS", None)
    env["PYTHON"] = str(probe)
    r = subprocess.run(
        [os.path.join(REPO, "bin", "trust4-tpu"), "run", "--help"],
        capture_output=True, text=True, env=env, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "gate=unset stash=10.9.9.9"
