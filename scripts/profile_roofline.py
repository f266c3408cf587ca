"""Profiler-truth roofline for the flagship train step (VERDICT r2 #1).

Round 2's roofline used XLA's cost model (`compiled.cost_analysis()`), whose
"bytes accessed" counts LOGICAL operand bytes per op — it reported 841 GB/s
sustained against an 819 GB/s HBM spec (103% utilization, physically
impossible), so every "we are at the roofline" conclusion inherited an
overcounted denominator. This script replaces it with two independent,
honest accountings:

1. **HLO-graph traffic**: parse the OPTIMIZED HLO's entry computation and sum
   each top-level instruction's unique operand + output buffer bytes. This
   is the traffic of the fused graph as scheduled — fusion-internal reuse
   excluded by construction. (Still an upper bound: ignores donation
   aliasing making read-modify-write weight updates 2x, and any cache hits.)
2. **Profiler timeline** (when the PJRT plugin supports it): trace K steps
   with `jax.profiler`, parse the xplane (axcnn/utils/xplane.py), and build
   a per-fusion time table; joining (1) and (2) gives per-fusion achieved
   GB/s — which fusions sit at the roofline and which leave headroom.

Prints a JSON summary + a top-N per-fusion table; results recorded in
docs/DESIGN.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import re
import time

import numpy as np

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16, "s4": 1, "u4": 1, "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Bytes of an HLO result type string (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in DTYPE_BYTES:
            continue
        numel = 1
        for d in dims.split(","):
            if d:
                numel *= int(d)
        total += numel * DTYPE_BYTES[dt]
    return total


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^)]*\)|\S+))\s+([\w\-]+)\(")


def parse_entry(hlo: str):
    """Parse the ENTRY computation: returns
    (instrs: [{name, opcode, out_bytes, operands}], sizes: {name: out_bytes}).
    """
    sizes = {}
    # first pass: result sizes for EVERY instruction in the module (operands
    # of entry instructions are other entry instructions or parameters)
    for line in hlo.splitlines():
        m = _INSTR_RE.match(line)
        if m:
            sizes[m.group(1)] = shape_bytes(m.group(2))
    instrs = []
    in_entry = False
    for line in hlo.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            m = _INSTR_RE.match(line)
            if not m:
                continue
            name, type_str, opcode = m.groups()
            paren = line[m.end() - 1:]
            depth = 0
            args = ""
            for ch in paren:
                if ch == "(":
                    depth += 1
                    if depth == 1:
                        continue
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        break
                if depth >= 1:
                    args += ch
            operands = re.findall(r"%?([\w.\-]+)", args)
            operands = [o for o in operands if o in sizes]
            instrs.append({
                "name": name, "opcode": opcode,
                "out_bytes": shape_bytes(type_str),
                "operands": operands,
            })
    return instrs, sizes


def graph_traffic(instrs, sizes):
    """Sum of unique operand + output bytes over entry instructions,
    excluding pure bookkeeping opcodes that do not touch HBM."""
    skip = {"parameter", "tuple", "get-tuple-element", "constant", "bitcast",
            "after-all", "partition-id", "replica-id"}
    total = 0
    per_instr = {}
    for ins in instrs:
        if ins["opcode"] in skip:
            continue
        b = ins["out_bytes"]
        for op in set(ins["operands"]):
            b += sizes.get(op, 0)
        per_instr[ins["name"]] = b
        total += b
    return total, per_instr


def build_step(batch):
    import jax

    from axcnn.core.dtypes import BF16_POLICY
    from axcnn.models.resnet import ModelConfig
    from axcnn.train.schedules import make_lr_schedule
    from axcnn.train.train_step import create_train_state, make_train_step

    cfg = ModelConfig(
        resnet_size=50, num_classes=1000,
        use_resnet_d=True, use_se_block=True, use_sk_block=True,
        anti_alias_type="sconv", use_dropblock=True, zero_gamma=True)
    state = create_train_state(jax.random.key(0), cfg, use_ema=True)
    rng = np.random.default_rng(0)
    data = {
        "images": jax.device_put(
            rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8)),
        "labels": jax.device_put(
            rng.integers(0, 1000, (batch,), dtype=np.int32)),
    }
    step = make_train_step(
        cfg, lr_schedule=make_lr_schedule(base_lr=0.4, total_steps=1000,
                                          warmup_steps=100),
        total_steps=1000, policy=BF16_POLICY, label_smoothing=0.1,
        mixup_alpha=0.2, weight_decay=1e-4, use_ema=True)
    compiled = jax.jit(step, donate_argnums=(0,)).lower(
        state, data, jax.random.key(1)).compile()
    return compiled, state, data


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/axcnn_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--trace_dir", default="/tmp/axcnn_profile")
    ap.add_argument("--out", default="/tmp/axcnn_profile/roofline.json")
    ap.add_argument("--no_trace", action="store_true",
                    help="HLO-graph accounting only (skip jax.profiler)")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    os.makedirs(args.trace_dir, exist_ok=True)

    compiled, state, data = build_step(args.batch)
    key = jax.random.key(1)

    # cost-model numbers (the round-2 accounting, kept for comparison)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    cost_flops = float(ca.get("flops", float("nan")))
    cost_bytes = float(ca.get("bytes accessed", float("nan")))

    hlo = compiled.as_text()
    instrs, sizes = parse_entry(hlo)
    traffic, per_instr_bytes = graph_traffic(instrs, sizes)

    # timed chain (dependent steps + scalar fetch; block_until_ready is not
    # reliable through the axon tunnel)
    for _ in range(3):
        state, metrics = compiled(state, data, key)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, metrics = compiled(state, data, key)
    float(metrics["loss"])
    step_s = (time.perf_counter() - t0) / 10

    out = {
        "batch": args.batch,
        "step_ms": round(step_s * 1e3, 2),
        "images_per_sec": round(args.batch / step_s, 1),
        "cost_model": {
            "gflop": round(cost_flops / 1e9, 1),
            "gb": round(cost_bytes / 1e9, 2),
            "gbps": round(cost_bytes / step_s / 1e9, 0),
            "hbm_utilization_vs_819": round(
                cost_bytes / step_s / 1e9 / 819.0, 3),
        },
        "hlo_graph": {
            "gb": round(traffic / 1e9, 2),
            "gbps": round(traffic / step_s / 1e9, 0),
            "hbm_utilization_vs_819": round(
                traffic / step_s / 1e9 / 819.0, 3),
            "entry_instructions": len(instrs),
        },
        "mfu_vs_197tflops": round(cost_flops / step_s / 1e12 / 197.0, 3),
    }

    if not args.no_trace:
        from axcnn.utils.xplane import (parse_xspace, find_xplane_files,
                                        device_planes, op_totals)

        trace_ok = False
        try:
            jax.profiler.start_trace(args.trace_dir)
            for _ in range(args.steps):
                state, metrics = compiled(state, data, key)
            float(metrics["loss"])
            jax.profiler.stop_trace()
            trace_ok = True
        except Exception as exc:
            out["trace_error"] = f"{type(exc).__name__}: {exc}"
        if trace_ok:
            files = find_xplane_files(args.trace_dir)
            out["xplane_files"] = files
            if files:
                planes = parse_xspace(files[-1])
                out["planes"] = [p.name for p in planes]
                devs = device_planes(planes)
                if devs:
                    totals = op_totals(devs[0])
                    dev_total_ms = sum(
                        v["total_ps"] for v in totals.values()) / 1e9
                    table = []
                    for name, v in list(totals.items())[:args.top]:
                        ms = v["total_ps"] / 1e9 / args.steps
                        short = name.split("/")[-1]
                        b = per_instr_bytes.get(short, 0)
                        table.append({
                            "op": short[:60], "count": v["count"] // args.steps,
                            "ms_per_step": round(ms, 3),
                            "gb": round(b / 1e9, 3),
                            "gbps": round(b / (ms / 1e3) / 1e9, 0) if ms else 0,
                        })
                    out["device_plane"] = devs[0].name
                    out["device_busy_ms_per_step"] = round(
                        dev_total_ms / args.steps, 2)
                    out["top_ops"] = table

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
