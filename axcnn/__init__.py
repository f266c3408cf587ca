"""axcnn — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of clovaai/assembled-cnn.

A brand-new image-classification framework with the full capability surface of
the reference (Assemble-ResNet: ResNet-D + SK/SE attention + BlurPool +
DropBlock, trained with AutoAugment/mixup/label-smoothing/cosine-LR/EMA/KD),
re-designed TPU-first:

- functional param/state pytree models compiled through XLA (NHWC layout,
  bf16 compute / fp32 params),
- fused Pallas kernels for the hot epilogues (see ``axcnn.pallas``),
- data-parallel training via ``shard_map`` + ``lax.psum`` over a device mesh,
- orbax checkpoints carrying params / opt state / EMA / RNG / data position.

Reference capability map: see SURVEY.md (the upstream mount was empty; the
survey is a verified reconstruction, and BASELINE.json is the acceptance
contract).
"""

__version__ = "0.1.0"
