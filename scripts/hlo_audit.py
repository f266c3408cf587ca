"""HLO fusion audit — the evidence behind "XLA already emits the fused form".

Compiles the flagship train and eval steps and inspects the OPTIMIZED HLO
(what actually runs on the chip) to verify the north-star fusions exist:

- every convolution's elementwise epilogue (BN scale/shift, ReLU, SE gate
  multiply, residual add) is inside a fusion instruction, not a standalone
  HBM-roundtripping op;
- counts standalone top-level elementwise ops remaining in the entry
  computation (should be ~zero);
- reports fusion/op histograms per step.

Writes the HLO text files next to the JSON summary under --out (default
/tmp/axcnn_hlo_audit) so the claim is spot-checkable. Results recorded in
docs/DESIGN.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import collections
import json
import re

import numpy as np

# ops whose appearance at ENTRY level (outside any fusion) would mean an
# un-fused elementwise HBM round trip over an activation-sized tensor
ELEMENTWISE = {
    "add", "subtract", "multiply", "divide", "maximum", "minimum", "select",
    "compare", "convert", "exponential", "rsqrt", "tanh", "logistic",
    "power", "negate", "abs",
}


def _entry_ops(hlo: str):
    """Yield (opcode, line) for instructions in the ENTRY computation."""
    in_entry = False
    for line in hlo.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = \S+ ([\w\-]+)\(", line)
            if m:
                yield m.group(1), line


def audit(hlo: str):
    ops = collections.Counter()
    elementwise_lines = []
    for opcode, line in _entry_ops(hlo):
        ops[opcode] += 1
        if opcode in ELEMENTWISE:
            # ignore scalar/tiny ops (metrics, LR math): only activation-size
            # tensors matter for bandwidth. Crude size filter: dims product.
            m = re.search(r"= \w+\[([\d,]*)\]", line)
            numel = np.prod([int(d) for d in m.group(1).split(",") if d]) if m and m.group(1) else 1
            if numel >= 1 << 16:
                elementwise_lines.append(line.strip()[:160])
    fusion_kinds = collections.Counter(
        re.findall(r"fusion\([^)]*\), kind=(\w+)", hlo))
    convs_total = len(re.findall(r"= \S+ convolution\(", hlo))
    # multi-output fused computations containing a convolution — e.g. the
    # conv+BN-statistics fusion: (f32[C] mean, f32[C] meansq, bf16[NHWC] out)
    conv_multiout = 0
    header = None
    body_has_conv = False
    for line in hlo.splitlines():
        if line.startswith("%fused_computation"):
            header = line
            body_has_conv = False
        elif header is not None:
            if line.startswith("}"):
                if body_has_conv and re.search(r"->\s*\(", header):
                    conv_multiout += 1
                header = None
            elif "convolution(" in line:
                body_has_conv = True
    return {
        "entry_op_histogram": dict(ops.most_common(12)),
        "entry_convolutions": ops.get("convolution", 0),
        "entry_fusions": ops.get("fusion", 0),
        "fusion_kinds": dict(fusion_kinds),
        "convolutions_total": convs_total,
        "convolutions_in_multi_output_fusions": conv_multiout,
        "unfused_large_elementwise": len(elementwise_lines),
        "unfused_examples": elementwise_lines[:5],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/axcnn_hlo_audit")
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    from axcnn.core.dtypes import BF16_POLICY
    from axcnn.models.resnet import ModelConfig
    from axcnn.train.schedules import make_lr_schedule
    from axcnn.train.train_step import (create_train_state, make_eval_step,
                                        make_train_step)

    cfg = ModelConfig(
        resnet_size=50, num_classes=1000,
        use_resnet_d=True, use_se_block=True, use_sk_block=True,
        anti_alias_type="sconv", use_dropblock=True, zero_gamma=True)
    state = create_train_state(jax.random.key(0), cfg, use_ema=True)
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.integers(0, 256, (args.batch, 224, 224, 3), dtype=np.uint8),
        "labels": rng.integers(0, 1000, (args.batch,), dtype=np.int32),
    }

    train = make_train_step(
        cfg, lr_schedule=make_lr_schedule(base_lr=0.4, total_steps=1000,
                                          warmup_steps=100),
        total_steps=1000, policy=BF16_POLICY, label_smoothing=0.1,
        mixup_alpha=0.2, weight_decay=1e-4, use_ema=True)
    evalf = make_eval_step(cfg, policy=BF16_POLICY)

    summary = {}
    for name, fn, fnargs in (
        ("train", lambda: jax.jit(train, donate_argnums=(0,)).lower(
            state, batch, jax.random.key(1)), None),
        ("eval", lambda: jax.jit(evalf).lower(state, batch), None),
    ):
        hlo = fn().compile().as_text()
        with open(os.path.join(args.out, f"{name}.hlo.txt"), "w") as f:
            f.write(hlo)
        summary[name] = audit(hlo)

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
