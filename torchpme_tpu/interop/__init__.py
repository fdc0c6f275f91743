"""Interop adapters for users of other frameworks.

:mod:`torchpme_tpu.interop.torch_bridge` exposes the library to PyTorch
code: ``TorchCalculator`` mirrors the reference torch-pme calculator
``forward`` contract (``/root/reference/src/torchpme/calculators/
calculator.py:103``) as a ``torch.nn.Module`` whose compute runs in JAX
(jitted, on the default JAX device — the TPU when present) and whose
gradients flow back into torch autograd.

Not imported at package root: ``import torch`` is heavy and optional,
exactly like the reference's gated metatensor subpackage
(``/root/reference/src/torchpme/__init__.py:21-22``).
"""

__all__ = ["torch_bridge"]
