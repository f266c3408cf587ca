"""Fused Pallas TPU kernels for the assembly ops (BASELINE north star).

Each kernel has XLA-equivalent semantics and is golden-tested against the
XLA implementation in interpret mode; the op-level dispatchers in
``axcnn.ops`` select Pallas on TPU when shapes qualify.
"""

from axcnn.pallas.blurpool import blur_pool_pallas, blurpool_supported
from axcnn.pallas.dropblock import dropblock_mask_pallas, dropblock_supported
