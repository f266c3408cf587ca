"""Hung-step watchdog tests (axcnn/utils/watchdog.py + loop wiring).

The watchdog is the in-process liveness probe motivated by a real axon
tunnel wedge (futex-parked dispatch, 0% CPU, no exception). Units cover
fire/no-fire/poll behavior with an injected ``on_hang``; the loop test
runs a real tiny ``run()`` with the knob enabled and asserts the run
completes normally (the watchdog must never fire on a healthy run and
must be stopped by the loop's ``finally``).
"""

import threading
import time

import pytest

from axcnn.utils.watchdog import HANG_EXIT_CODE, HangWatchdog


class TestHangWatchdog:
    def test_fires_on_stall(self):
        fired = threading.Event()
        stalls = []

        def on_hang(stalled_s):
            stalls.append(stalled_s)
            fired.set()

        wd = HangWatchdog(timeout_s=0.2, on_hang=on_hang, poll_s=0.05)
        wd.start()
        try:
            assert fired.wait(2.0), "watchdog never fired on a stall"
        finally:
            wd.stop()
        assert wd.fired
        assert stalls and stalls[0] > 0.2

    def test_beats_keep_it_quiet(self):
        fired = threading.Event()
        wd = HangWatchdog(timeout_s=0.3, on_hang=lambda s: fired.set(),
                          poll_s=0.05)
        wd.start()
        try:
            for _ in range(10):
                time.sleep(0.1)
                wd.beat()
        finally:
            wd.stop()
        assert not fired.is_set()
        assert not wd.fired

    def test_stop_before_deadline(self):
        """stop() must prevent a later fire even if the deadline passes."""
        fired = threading.Event()
        wd = HangWatchdog(timeout_s=0.2, on_hang=lambda s: fired.set(),
                          poll_s=0.05)
        wd.start()
        wd.stop()
        time.sleep(0.4)
        assert not fired.is_set()

    def test_context_manager(self):
        with HangWatchdog(timeout_s=10.0) as wd:
            wd.beat()
        assert not wd.fired

    def test_rejects_bad_timeout(self):
        import pytest

        with pytest.raises(ValueError):
            HangWatchdog(timeout_s=0)

    def test_exit_code_is_distinct(self):
        # supervisors key on this to tell "hung, retry" from real failure
        assert HANG_EXIT_CODE == 42
        assert HANG_EXIT_CODE not in (0, 1, 2)


class TestExitAfter:
    """exit_after must reach os._exit even when the log itself wedges —
    round-4 review Weak #8: a hang in the filesystem/TB layer blocking the
    hang-record write used to neutralize the exit it guards."""

    def _run(self, body, timeout):
        import subprocess
        import sys
        import textwrap

        code = ("from axcnn.utils.watchdog import exit_after\n"
                + textwrap.dedent(body))
        return subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=timeout)

    def test_exits_despite_blocking_logger(self):
        r = self._run("""
            import threading
            def blocked_log():
                threading.Event().wait()  # a wedged filesystem write
            exit_after(blocked_log, timeout_s=0.2)
            print("UNREACHABLE")
        """, timeout=30)
        assert r.returncode == 42, (r.returncode, r.stdout, r.stderr)
        assert "UNREACHABLE" not in r.stdout

    def test_exits_despite_raising_logger(self):
        r = self._run("""
            def bad_log():
                raise OSError("disk gone")
            exit_after(bad_log, timeout_s=1.0)
        """, timeout=30)
        assert r.returncode == 42, (r.returncode, r.stdout, r.stderr)

    def test_log_lands_when_healthy(self, tmp_path):
        out = tmp_path / "rec.txt"
        r = self._run(f"""
            def ok_log():
                open({str(out)!r}, "w").write("hang_detected")
            exit_after(ok_log, timeout_s=5.0, exit_code=7)
        """, timeout=30)
        assert r.returncode == 7
        assert out.read_text() == "hang_detected"


@pytest.mark.slow  # drives the real run loop
class TestLoopWiring:
    def test_healthy_run_completes_with_watchdog(self, tmp_path):
        """A normal tiny run with the knob on: completes, logs train/eval
        records, and never logs hang_detected."""
        import json

        from axcnn.models.resnet import ModelConfig
        from axcnn.train.loop import run
        from axcnn.utils.config import (Config, DataConfig, RuntimeConfig,
                                        TrainConfig)

        cfg = Config(
            model=ModelConfig(resnet_size=50, num_classes=1001),
            data=DataConfig(dataset_name="imagenet", use_synthetic_data=True,
                            image_size=32),
            train=TrainConfig(batch_size=4, train_steps=2, base_lr=0.01,
                              lr_warmup_epochs=0, dtype="fp32", log_every=1,
                              seed=0),
            runtime=RuntimeConfig(model_dir=str(tmp_path / "run"),
                                  num_devices=1, hang_watchdog_s=120),
        )
        metrics = run(cfg)
        assert metrics["top1"] >= 0.0
        tags = []
        with open(tmp_path / "run" / "metrics.jsonl") as f:
            for line in f:
                tags.append(json.loads(line).get("tag"))
        assert "train" in tags and "eval" in tags
        assert "hang_detected" not in tags
