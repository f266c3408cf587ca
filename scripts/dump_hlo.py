"""Dump the flagship train step's OPTIMIZED HLO + per-instruction traffic
table for offline joining with a jax.profiler xplane trace
(scripts/analyze_profile.py). Run on the TPU; compile cache makes it cheap.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json

import jax

from axcnn.utils.cache import cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out_hlo", default="/tmp/axcnn_profile/train_step_b128.hlo")
    ap.add_argument("--out_bytes", default="/tmp/axcnn_profile/instr_bytes.json")
    args = ap.parse_args()

    from scripts.profile_roofline import build_step, parse_entry, graph_traffic

    print(f"devices: {jax.devices()}", flush=True)
    compiled, _, _ = build_step(args.batch)
    hlo = compiled.as_text()
    os.makedirs(os.path.dirname(args.out_hlo), exist_ok=True)
    with open(args.out_hlo, "w") as f:
        f.write(hlo)
    instrs, sizes = parse_entry(hlo)
    total, per_instr = graph_traffic(instrs, sizes)
    with open(args.out_bytes, "w") as f:
        json.dump({"total_bytes": total, "per_instr": per_instr,
                   "opcode": {i["name"]: i["opcode"] for i in instrs}}, f)
    print(f"wrote {args.out_hlo} ({len(hlo)} chars), "
          f"{len(per_instr)} instr bytes, total {total/1e9:.2f} GB", flush=True)


if __name__ == "__main__":
    main()
