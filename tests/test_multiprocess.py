"""REAL multi-process (multi-host) execution test (VERDICT r1 #4a).

Spawns 2 OS processes (tests/mp_worker.py), each a JAX "host" with 2 virtual
CPU devices, joined via jax.distributed (Gloo collectives). Covers, as actual
cross-process execution rather than a simulated mesh:

- jax.distributed.initialize bring-up (the reference's TF_CONFIG/grpc
  surface, SURVEY.md §5.8);
- per-host input sharding (disjoint shard subsets per host);
- global-batch assembly via jax.make_array_from_process_local_data;
- gradient psum across host boundaries (losses must be identical on both);
- the uneven-eval-shard padding fix: host 0 owns 12 eval records, host 1
  owns 4 — without batch-count agreement the per-batch psum deadlocks.
"""

import io
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from axcnn.data.tfrecord import TFRecordWriter, make_example

_WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _jpeg(rng):
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)).save(
        buf, "JPEG", quality=90)
    return buf.getvalue()


def _build_dataset(d):
    rng = np.random.default_rng(0)
    # train: 2 even shards of 8
    for s in range(2):
        with TFRecordWriter(str(d / f"train-0000{s}-of-00002")) as w:
            for i in range(8):
                w.write(make_example({"image/encoded": [_jpeg(rng)],
                                      "image/class/label": [i % 5]}))
    # eval: UNEVEN shards — host h reads shards h::2 → host0: 12, host1: 4
    for s, n in ((0, 12), (1, 4)):
        with TFRecordWriter(str(d / f"validation-0000{s}-of-00002")) as w:
            for i in range(n):
                w.write(make_example({"image/encoded": [_jpeg(rng)],
                                      "image/class/label": [i % 5]}))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_and_uneven_eval(tmp_path):
    _build_dataset(tmp_path)
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via the config API
    # the worker script lives in tests/, so Python's script-dir sys.path
    # injection does not cover the repo root — make `import axcnn` explicit
    repo_root = os.path.dirname(os.path.dirname(_WORKER))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH", "")) if p)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(tmp_path), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(_WORKER)))
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process run timed out (deadlock?)")
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT in:\n{out}"
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = r

    # pmean-ed loss must be bitwise-identical on every host
    assert results[0]["train_losses"] == results[1]["train_losses"]
    # eval covered all 16 records exactly once, despite 12/4 shard split
    assert results[0]["eval_count"] == 16.0
    assert results[0]["eval_top1"] == results[1]["eval_top1"]
    # spatial GSPMD step across hosts (data=hosts, spatial=local devices):
    # the replicated global loss must agree on both
    assert results[0]["spatial_loss"] == results[1]["spatial_loss"]
