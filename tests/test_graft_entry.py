"""Driver entry points: the multi-chip dry run must keep working."""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_two_devices(capsys):
    import __graft_entry__
    assert jax.device_count() >= 2
    __graft_entry__.dryrun_multichip(2)
    assert "ok" in capsys.readouterr().out


def test_dryrun_multichip_driver_env():
    """Reproduce the driver's invocation: a fresh subprocess WITHOUT the
    conftest's CPU forcing (sitecustomize pins JAX_PLATFORMS=axon there).
    dryrun_multichip must self-host its virtual mesh (MULTICHIP_r01 was red
    because it asserted on jax.devices() instead)."""
    import subprocess
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # undo conftest forcing; keep sitecustomize
    repo = os.path.join(os.path.dirname(__file__), "..")
    code = ("import sys; sys.path.insert(0, {p!r}); import __graft_entry__; "
            "__graft_entry__.dryrun_multichip(8)").format(
                p=os.path.abspath(repo))
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_entry_signature():
    """entry() builds lazily; just validate it is importable and callable
    metadata-wise (the full-size init is exercised on the TPU drives)."""
    import __graft_entry__
    assert callable(__graft_entry__.entry)
    assert callable(__graft_entry__.dryrun_multichip)
