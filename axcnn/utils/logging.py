"""Structured metric logging + throughput tracking.

Parity target (SURVEY.md §5.5): the vendored ``BenchmarkLogger`` (JSON-lines
metric dump), ``LoggingTensorHook`` (periodic loss/LR), and
``ExamplesPerSecondHook``. One JSONL stream replaces all three; stdout gets a
human-readable line. images/sec/chip is the north-star counter
(BASELINE.json).
"""

from __future__ import annotations

import json
import os
import sys
import time


class MetricLogger:
    """Writes one JSON object per event to ``<dir>/metrics.jsonl`` and a
    compact line to stdout. ``tensorboard=True`` additionally writes TB
    scalar summaries to ``<dir>/tb`` (the reference's Estimator summaries,
    SURVEY.md §5.5) — opt-in because importing TF costs ~10s."""

    def __init__(self, directory: str | None = None, *, quiet: bool = False,
                 tensorboard: bool = False):
        self._f = None
        self._quiet = quiet
        self._tb = None
        if directory:
            os.makedirs(directory, exist_ok=True)
            self._f = open(os.path.join(directory, "metrics.jsonl"), "a")
            if tensorboard:
                try:
                    import tensorflow as tf

                    self._tb = tf.summary.create_file_writer(
                        os.path.join(directory, "tb"))
                except ImportError:
                    print("tensorboard requested but tensorflow unavailable",
                          file=sys.stderr)

    def log(self, tag: str, step: int, *, jsonl_only: bool = False, **metrics):
        """``jsonl_only=True`` skips the TensorBoard branch — used by the
        hang-watchdog handlers, where entering TF summary writing against a
        wedged process state could block the exit the handler guarantees."""
        rec = {"tag": tag, "step": int(step), "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self._tb is not None and not jsonl_only:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in rec.items():
                    if k not in ("tag", "time", "step") and isinstance(v, float):
                        tf.summary.scalar(f"{tag}/{k}", v, step=int(step))
            self._tb.flush()
        if not self._quiet:
            body = " ".join(
                f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items() if k not in ("tag", "time"))
            print(f"[{tag}] {body}", file=sys.stderr, flush=True)

    def close(self):
        if self._f:
            self._f.close()
        if self._tb is not None:
            self._tb.close()


class Throughput:
    """Examples/sec over a sliding window of step timings."""

    def __init__(self, batch_size: int, *, window: int = 20):
        self._bs = batch_size
        self._window = window
        self._times: list[float] = []

    def tick(self) -> float | None:
        """Call once per step; returns examples/sec over the window or None."""
        now = time.perf_counter()
        self._times.append(now)
        if len(self._times) > self._window + 1:
            self._times.pop(0)
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        steps = len(self._times) - 1
        return self._bs * steps / dt if dt > 0 else None
