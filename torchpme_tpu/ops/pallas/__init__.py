"""Pallas TPU kernels for the hot mesh ops (fused in-VMEM weight build + MXU
contraction; see :mod:`torchpme_tpu.ops.pallas.mesh_pallas`)."""

from .mesh_pallas import gather_tiles, spread_tiles, supports_pallas

__all__ = ["gather_tiles", "spread_tiles", "supports_pallas"]
