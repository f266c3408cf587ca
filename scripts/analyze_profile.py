"""Join a jax.profiler xplane trace with the optimized HLO's per-instruction
traffic table -> the per-fusion roofline evidence behind docs/DESIGN.md.

Inputs (produced by scripts/profile_roofline.py --steps N and
scripts/dump_hlo.py): the xplane.pb trace and the HLO text + instr-bytes
JSON. Entirely offline (no TPU contact).

For every entry instruction: device time/step (from the trace's "XLA Ops"
line, which tiles the busy timeline), unique operand+output bytes (from the
HLO), achieved GB/s, and a category:
  conv-fusion  : fusion whose body contains convolution(s)
  fusion       : elementwise/reduce fusion, no conv
  async-copy   : {slice,copy,dynamic-slice,dynamic-update-slice}-start/done
                 (HBM<->VMEM prefetches; overlap compute)
  other        : everything else (reduce, select-and-scatter, rng, ...)
Prints a JSON summary + top-N table; the table is the answer to "which ops
hold the step away from its speed of light".
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import re
from collections import defaultdict

NAME_RE = re.compile(r"%([\w.\-]+)\s*=")


def load_trace_ops(xplane_path, steps):
    from axcnn.utils.xplane import parse_xspace

    planes = parse_xspace(xplane_path)
    dev = next(p for p in planes if p.name.startswith("/device:TPU"))
    line = next(ln for ln in dev.lines if ln.name == "XLA Ops")
    per = defaultdict(lambda: [0, 0])  # name -> [total_ps, count]
    for ev in line.events:
        m = NAME_RE.search(ev.name)
        name = m.group(1) if m else ev.name[:80]
        per[name][0] += ev.duration_ps
        per[name][1] += 1
    return {k: {"ms_per_step": v[0] / 1e9 / steps, "count": v[1] / steps}
            for k, v in per.items()}


_WINDOW_FIELD_RE = re.compile(r"(size|stride|pad|lhs_dilate|rhs_dilate)=([\dx_]+)")
_DIMLBL_RE = re.compile(r"dim_labels=(\w+)_(\w+)->(\w+)")


def _valid_pairs(I, W, stride, pad_lo, lhs_dil, rhs_dil, O):
    """Number of (output position, window tap) pairs that hit a real lhs
    sample — the padding/dilation-aware MAC count per spatial dim (mirrors
    XLA's HloCostAnalysis convolution accounting)."""
    span = (I - 1) * lhs_dil + 1 if I > 0 else 0
    n = 0
    for o in range(O):
        base = o * stride - pad_lo
        for t in range(W):
            x = base + t * rhs_dil
            if 0 <= x < span and x % lhs_dil == 0:
                n += 1
    return n


def conv_flops_by_fusion(hlo_text):
    """Per-called-computation convolution FLOPs, padding/dilation-aware.

    FLOPs = 2 * batch_x_feature(out) * contracted_feature
              * prod_d valid_pairs_d
    where contracted feature is the rhs dimension labeled 'i', and
    valid_pairs_d counts (output, tap) pairs that land on real input (full
    convolutions like dgrad pad by W-1 — counting padded taps would inflate
    a 56x56-window dgrad ~50x). Shapes come from the module-wide name->type
    table (fused computations declare their parameters with full shapes).
    """
    from scripts.profile_roofline import split_instr

    types = {}
    for line in hlo_text.splitlines():
        parts = split_instr(line)
        if parts:
            types.setdefault(parts[0], parts[1])

    def dims_of(type_str):
        m = re.search(r"\w+\[([\d,]*)\]", type_str)
        return [int(d) for d in m.group(1).split(",") if d] if m else []

    header_re = re.compile(r"^%([\w.\-]+)\s*\(")
    flops = {}
    cur = None
    for line in hlo_text.splitlines():
        if line.startswith("%") or line.startswith("ENTRY"):
            m = header_re.match(line)
            cur = m.group(1) if m else None
            continue
        if " convolution(" not in line or cur is None:
            continue
        parts = split_instr(line)
        if not parts:
            continue
        dm = _DIMLBL_RE.search(line)
        if not dm:
            continue
        lhs_spec, rhs_spec, out_spec = dm.groups()
        out_dims = dims_of(parts[1])
        ops = re.findall(r"%([\w.\-]+)", parts[3].split("),")[0])
        lhs_dims = dims_of(types.get(ops[0], "")) if ops else []
        rhs_dims = dims_of(types.get(ops[1], "")) if len(ops) > 1 else []

        fields = dict(_WINDOW_FIELD_RE.findall(line[:line.find("dim_labels")]
                                               if "dim_labels" in line
                                               else line))
        nsp = len(out_spec) - 2  # spatial rank

        def per_dim(field, default):
            if field not in fields:
                return [default] * nsp
            if field == "pad":
                return [int(p.split("_")[0])
                        for p in fields[field].split("x")]
            return [int(v) for v in fields[field].split("x")]

        size = per_dim("size", 1)
        stride = per_dim("stride", 1)
        pad_lo = per_dim("pad", 0)
        lhs_dil = per_dim("lhs_dilate", 1)
        rhs_dil = per_dim("rhs_dilate", 1)

        # output batch*feature = all non-spatial output dims
        bf = 1
        for pos, ch in enumerate(out_spec):
            if ch in "bf" and pos < len(out_dims):
                bf *= out_dims[pos]
        contracted = 1
        i_pos = rhs_spec.find("i")
        if 0 <= i_pos < len(rhs_dims):
            contracted = rhs_dims[i_pos]
        macs = bf * contracted
        for d in range(nsp):
            # spatial dim d: position of label str(d) in each spec
            o_pos = out_spec.find(str(d))
            l_pos = lhs_spec.find(str(d))
            O = out_dims[o_pos] if 0 <= o_pos < len(out_dims) else 1
            I = lhs_dims[l_pos] if 0 <= l_pos < len(lhs_dims) else 1
            macs *= _valid_pairs(I, size[d], stride[d], pad_lo[d],
                                 lhs_dil[d], rhs_dil[d], O)
        flops[cur] = flops.get(cur, 0) + 2 * macs
    return flops


def fusion_calls(hlo_text):
    """Entry instruction name -> called computation name (fusions +
    async-starts)."""
    calls = {}
    in_entry = False
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            m = NAME_RE.search(line)
            c = re.search(r"calls=%?([\w.\-]+)", line)
            if m and c:
                calls[m.group(1)] = c.group(1)
    return calls


def categorize(name, opcode, conv_fusions):
    if re.match(r"(slice|copy|dynamic-slice|dynamic-update-slice)"
                r"(-start|-done)", name):
        return "async-copy"
    if name in conv_fusions:
        return "conv-fusion"
    if opcode == "fusion" or name.startswith("fusion"):
        return "fusion"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xplane", default="/tmp/axcnn_profile/plugins/profile/"
                    "2026_08_17_12_23_22/vm.xplane.pb")
    ap.add_argument("--hlo", default="/tmp/axcnn_profile/train_step_b128.hlo")
    ap.add_argument("--bytes", dest="bytes_json",
                    default="/tmp/axcnn_profile/instr_bytes.json")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default="/tmp/axcnn_profile/fusion_table.json")
    args = ap.parse_args()

    PEAK_TF, PEAK_GBPS = 197.0, 819.0

    ops = load_trace_ops(args.xplane, args.steps)
    with open(args.bytes_json) as f:
        meta = json.load(f)
    per_bytes, opcodes = meta["per_instr"], meta["opcode"]
    hlo = open(args.hlo).read()
    comp_flops = conv_flops_by_fusion(hlo)
    calls = fusion_calls(hlo)
    convs = {n for n, c in calls.items() if c in comp_flops}

    rows = []
    cats = defaultdict(lambda: [0.0, 0.0, 0, 0.0, 0.0])
    for name, t in ops.items():
        b = per_bytes.get(name, 0)
        fl = comp_flops.get(calls.get(name, ""), 0)
        cat = categorize(name, opcodes.get(name, ""), convs)
        ms = t["ms_per_step"]
        # this op's own speed of light: slower of its two walls
        ideal_ms = max(fl / (PEAK_TF * 1e12), b / (PEAK_GBPS * 1e9)) * 1e3
        rows.append({
            "op": name, "cat": cat, "ms": round(ms, 3),
            "gb": round(b / 1e9, 4),
            "gbps": round(b / 1e9 / (ms / 1e3), 0) if ms > 1e-6 else 0,
            "gflop": round(fl / 1e9, 1),
            "tfs": round(fl / 1e12 / (ms / 1e3), 1) if ms > 1e-6 else 0,
            "ideal_ms": round(ideal_ms, 3),
            "count": t["count"],
        })
        cats[cat][0] += ms
        cats[cat][1] += b / 1e9
        cats[cat][2] += 1
        cats[cat][3] += fl / 1e9
        cats[cat][4] += ideal_ms
    rows.sort(key=lambda r: -r["ms"])
    total_ms = sum(r["ms"] for r in rows)
    total_ideal = sum(r["ideal_ms"] for r in rows)
    out = {
        "total_traced_ms_per_step": round(total_ms, 2),
        # sum of per-op speed-of-light times: the per-kernel-roofline ceiling
        # for THIS op schedule (no overlap assumed between sync ops)
        "sum_per_op_ideal_ms": round(total_ideal, 2),
        "per_op_roofline_fraction": round(total_ideal / total_ms, 3),
        "categories": {
            k: {"ms": round(v[0], 2), "gb": round(v[1], 2), "ops": v[2],
                "gbps": round(v[1] / (v[0] / 1e3), 0) if v[0] else 0,
                "gflop": round(v[3], 1),
                "tfs": round(v[3] / v[0], 1) if v[0] else 0,
                "ideal_ms": round(v[4], 2)}
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1][0])},
        "top_ops": rows[:args.top],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
