"""Cross-process chip-lease guard for the single exclusive TPU.

This environment's relay grants the chip to ONE process at a time; a
second claimant does not fail, it silently queues on the grant poll —
which is how a concurrently running pytest once turned the bench's
warmup into an 867 s stall (BASELINE.md r2 confirm-run note). Both
claimants now take this advisory flock first:

- bench.py (the priority user) blocks on the lease with a bounded,
  legible wait;
- tests/test_tpu_kernels.py tries it non-blocking and SKIPS with a
  message when someone else holds the chip.

The lock file is advisory and purely host-side — nothing on the device
side changes; flock(2) guarantees release even if the holder dies.
"""

from __future__ import annotations

import errno
import fcntl
import os
import time

LOCK_PATH = "/tmp/slam_tpu_chip.lock"


class ChipLease:
    """Advisory exclusive lease on the (single) TPU chip."""

    def __init__(self, path: str = LOCK_PATH, timeout_s: float = 900.0):
        self.path = path
        self.timeout_s = timeout_s    # bound used by the context manager
        self._fd: int | None = None

    def try_acquire(self) -> bool:
        """Non-blocking: True iff the lease is now held by this process."""
        fd = os.open(self.path, os.O_CREAT | os.O_RDWR, 0o666)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError as e:
            os.close(fd)
            if e.errno in (errno.EACCES, errno.EAGAIN):
                return False
            raise
        os.ftruncate(fd, 0)
        os.write(fd, f"pid={os.getpid()}\n".encode())
        self._fd = fd
        return True

    def acquire(self, timeout_s: float = 900.0,
                poll_s: float = 5.0) -> bool:
        """Blocking with a bound: poll until held or timeout. Returns
        False (lease NOT held) on timeout — callers decide whether to
        proceed anyway or abort."""
        t0 = time.monotonic()
        while True:
            if self.try_acquire():
                return True
            if time.monotonic() - t0 >= timeout_s:
                return False
            time.sleep(poll_s)

    def holder(self) -> str:
        """Best-effort description of the current holder (for messages)."""
        try:
            with open(self.path) as f:
                return f.read().strip() or "unknown"
        except OSError:
            return "unknown"

    def release(self) -> None:
        if self._fd is not None:
            try:
                fcntl.flock(self._fd, fcntl.LOCK_UN)
            finally:
                os.close(self._fd)
                self._fd = None

    def __enter__(self) -> "ChipLease":
        # `with ChipLease():` must never silently proceed WITHOUT the
        # lease — that is exactly the silent-queueing failure mode this
        # module exists to prevent (r3 advisor). Block with the default
        # bound, then fail loudly; callers wanting non-blocking or
        # proceed-anyway semantics use try_acquire()/acquire() directly.
        if not self.acquire(timeout_s=self.timeout_s):
            raise TimeoutError(
                f"TPU chip lease not acquired (held by {self.holder()}); "
                "use try_acquire() for non-blocking semantics")
        return self

    def __exit__(self, *exc) -> None:
        self.release()
