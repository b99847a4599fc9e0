"""Cross-process chip-lease guard (utils/chip_lease.py): the flock that
keeps bench.py and the on-chip pytest from silently queueing on the
relay's exclusive chip grant (BASELINE.md r2: a concurrent suite run
turned the bench warmup into an 867 s stall)."""

import os
import subprocess
import sys

from slam_toolkit_tpu.utils.chip_lease import ChipLease

CHILD = """
import sys
sys.path.insert(0, {repo!r})
from slam_toolkit_tpu.utils.chip_lease import ChipLease
print("HELD" if ChipLease({path!r}).try_acquire() else "BUSY")
"""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child_sees(path):
    r = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO, path=path)],
        capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    return r.stdout.strip()


def test_lease_excludes_other_processes(tmp_path):
    path = str(tmp_path / "chip.lock")
    lease = ChipLease(path)
    assert lease.try_acquire()
    assert "pid=" in lease.holder()
    assert _child_sees(path) == "BUSY"      # concurrent claimant skips
    lease.release()
    assert _child_sees(path) == "HELD"      # freed for the next run


def test_lease_released_on_process_death(tmp_path):
    path = str(tmp_path / "chip.lock")
    # a holder that exits without releasing: flock(2) frees the lease
    r = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO, path=path)],
        capture_output=True, text=True, timeout=60)
    assert r.stdout.strip() == "HELD"
    assert ChipLease(path).try_acquire()


def test_acquire_timeout(tmp_path):
    path = str(tmp_path / "chip.lock")
    lease = ChipLease(path)
    assert lease.try_acquire()
    other = ChipLease(path)
    assert not other.acquire(timeout_s=0.2, poll_s=0.05)
    lease.release()
    assert other.acquire(timeout_s=1.0, poll_s=0.05)
    other.release()


def test_context_manager_raises_when_held(tmp_path):
    """`with ChipLease():` must never silently proceed without the
    lease — it blocks up to timeout_s then raises (r3 advisor)."""
    import pytest

    path = str(tmp_path / "chip.lock")
    holder = ChipLease(path)
    assert holder.try_acquire()
    with pytest.raises(TimeoutError, match="lease not acquired"):
        with ChipLease(path, timeout_s=0.2):
            pass
    holder.release()
    with ChipLease(path, timeout_s=1.0) as lease:
        assert "pid=" in lease.holder()
    # released on exit
    assert ChipLease(path).try_acquire()
