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


def test_entry_signature():
    """entry() builds lazily; just validate it is importable and callable
    metadata-wise (the full-size init is exercised on the TPU drives)."""
    import __graft_entry__
    assert callable(__graft_entry__.entry)
    assert callable(__graft_entry__.dryrun_multichip)
