"""Fused Pallas TPU kernels for the assembly ops (BASELINE north star).

Each kernel has XLA-equivalent semantics and is golden-tested against the
XLA implementation in interpret mode AND on the real chip
(tests/test_pallas.py + the recorded device drives in docs/DESIGN.md). The
op-level dispatchers in ``axcnn.ops`` (via ``axcnn.ops.dispatch``) select
these kernels when tracing for a TPU backend and the shape qualifies;
``AXCNN_PALLAS=off`` restores the pure-XLA path.
"""

from axcnn.pallas.blurpool import (
    blur_pool_pallas, blur_pool_pallas_bwd, blur_pool_pallas_grad,
    blurpool_supported)
from axcnn.pallas.dropblock import (
    dropblock_mask_pallas, dropblock_pallas, dropblock_supported)
