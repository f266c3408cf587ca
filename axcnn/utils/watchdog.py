"""Hung-step watchdog: failure DETECTION for wedged device dispatch.

Motivation (observed 2026-08-19 on the axon TPU tunnel): a training run
wedged mid-run — the client's dispatch thread parked in a futex wait, the
tunnel's relay thread polling a socket that never delivered, 0% CPU for
12+ minutes, no exception anywhere. A hung run is WORSE than a crashed
one: a crash gets restarted by any supervisor, a hang holds the device
claim and burns wall-clock silently. The reference gets coarse hang
detection operationally (Estimator jobs are killed and restarted by the
cluster manager on liveness probes; SURVEY §5.3); axcnn runs anywhere, so
the liveness probe ships in-process.

Mechanism: the run loop beats the watchdog at every point where forward
progress is PROVEN on the host side — after each step dispatch (dispatch
blocks once the device queue backpressures onto a wedged device), after
each blocking metrics fetch, after eval, after checkpoint save. A daemon
thread checks the time since the last beat; past the deadline it logs a
``hang_detected`` record, flushes, and calls the ``on_hang`` callback —
by default ``os._exit(HANG_EXIT_CODE)``. ``os._exit`` is deliberate:
the main thread is wedged inside a C extension and will never run
``finally`` blocks, atexit hooks, or respond to a normal ``SystemExit``;
only a hard exit releases the device claim so the NEXT invocation (which
auto-resumes from the last periodic checkpoint) can take it.

The exit code is distinct (42) so supervisors/drives can tell "hung,
retry me" from a real failure. Use together with
``--runtime.save_checkpoint_steps`` to bound the lost work.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable

HANG_EXIT_CODE = 42


def _default_on_hang() -> None:  # pragma: no cover - kills the process
    os._exit(HANG_EXIT_CODE)


def exit_after(log_fn: Callable[[], None], *, timeout_s: float = 5.0,
               exit_code: int = HANG_EXIT_CODE) -> None:
    """Best-effort log, then ``os._exit`` UNCONDITIONALLY.

    The hang being reported may live in the filesystem or summary-writer
    layer — in which case ``log_fn`` itself blocks and a plain
    ``log(); os._exit()`` sequence never reaches the exit it exists to
    guarantee (round-4 review, Weak #8). Running the log on a daemon side
    thread with a bounded join means a wedged logger delays the exit by at
    most ``timeout_s`` and can never neutralize it.
    """
    try:
        t = threading.Thread(target=log_fn, daemon=True, name="hang-exit-log")
        t.start()
        t.join(timeout_s)
    except Exception:  # pragma: no cover - thread creation failure
        pass
    os._exit(exit_code)


class HangWatchdog:
    """Deadline monitor for an event loop that must keep making progress.

    ``beat()`` is cheap (one monotonic read + one float store, no lock:
    a torn read across the GIL is impossible for a float slot, and even a
    stale read only delays detection by one poll interval). The monitor
    thread is a daemon so it never blocks interpreter shutdown.
    """

    def __init__(self, timeout_s: float,
                 on_hang: Callable[[float], None] | None = None,
                 poll_s: float | None = None):
        if timeout_s <= 0:
            raise ValueError(f"timeout_s must be > 0, got {timeout_s}")
        self.timeout_s = float(timeout_s)
        self._on_hang = on_hang
        self._poll_s = poll_s if poll_s is not None else min(
            5.0, self.timeout_s / 4)
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.fired = False

    def beat(self) -> None:
        self._last = time.monotonic()

    def start(self) -> "HangWatchdog":
        self.beat()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="hang-watchdog")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2 * self._poll_s)

    def __enter__(self) -> "HangWatchdog":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    def _run(self) -> None:
        while not self._stop.wait(self._poll_s):
            stalled = time.monotonic() - self._last
            if stalled > self.timeout_s:
                self.fired = True
                if self._on_hang is not None:
                    self._on_hang(stalled)
                else:  # pragma: no cover - kills the process
                    _default_on_hang()
                return
