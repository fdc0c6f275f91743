"""PyTorch bridge: run torchpme_tpu calculators from torch code.

A user of the reference torch-pme calls a ``torch.nn.Module`` with
``(charges, cell, positions, neighbor_indices, neighbor_distances)`` and
backpropagates through the result for forces and stress
(``/root/reference/src/torchpme/calculators/calculator.py:103-189``).
:class:`TorchCalculator` keeps that exact contract while the math runs in
JAX — jit-compiled, on the default JAX device (the TPU when present) —
and the pullback is stitched into torch autograd through a
``torch.autograd.Function`` whose backward calls the jitted ``jax.vjp``.

Design notes (TPU-first, not a translation):

* The forward is ``jax.jit``-ed once per static configuration (mesh shape
  / k-space extents); torch tensors cross the boundary as host numpy
  buffers (torch here is CPU-only; JAX owns the accelerator).
* The backward *recomputes* the forward inside a jitted
  ``jax.vjp``-and-apply program instead of holding JAX residuals alive
  between torch's forward and backward phases — residual lifetimes would
  otherwise be invisible to torch's graph and pin device memory across
  optimizer steps.  Cost: one extra forward per backward, amortized by
  XLA fusion.
* Integer neighbor indices ride as non-differentiated traced arguments,
  so refreshing a neighbor list does NOT recompile; only shape changes
  do (pad the pair axis for shape stability, as in the reference's own
  batching pattern, ``/root/reference/tests/calculators/test_padding.py``).

Example (doctest run by the suite)::

    >>> import numpy as np, torch
    >>> import torchpme_tpu as tpme
    >>> from torchpme_tpu.interop.torch_bridge import TorchCalculator
    >>> from torchpme_tpu.utils.neighbors import neighbor_list
    >>> pos = np.array([[0.0, 0, 0], [0.5, 0.5, 0.5]])
    >>> idx, dist, _ = neighbor_list(pos, np.eye(3), cutoff=1.2)
    >>> calc = TorchCalculator(
    ...     tpme.PMECalculator(tpme.CoulombPotential(smearing=0.3),
    ...                        mesh_spacing=0.11)
    ... )
    >>> charges = torch.tensor([[-1.0], [1.0]], requires_grad=True)
    >>> potential = calc(charges, torch.eye(3), torch.as_tensor(pos),
    ...                  torch.as_tensor(idx), torch.as_tensor(dist))
    >>> energy = torch.sum(potential * charges)
    >>> energy.backward()
    >>> bool(torch.isfinite(charges.grad).all())
    True
"""

from __future__ import annotations

import numpy as np

try:
    import torch
except ImportError as _err:  # pragma: no cover - torch ships in this env
    raise ImportError(
        "torchpme_tpu.interop.torch_bridge needs `torch` installed"
    ) from _err

import jax
import jax.numpy as jnp

from ..calculators.calculator import Calculator
from ..calculators.dipole import CalculatorDipole

__all__ = ["TorchCalculator", "TorchCalculatorDipole", "jax2torch"]


def _promote_floats(*tensors: "torch.Tensor") -> tuple["torch.Tensor", ...]:
    """Coerce mixed float dtypes to one common dtype at the boundary.

    Torch users habitually mix ``torch.eye(3)`` (float32) with float64
    positions; the JAX side validates a single dtype across all float
    inputs, so promote here (``.to`` is differentiable — grads flow back
    to the original tensors in their own dtype).
    """
    dtype = tensors[0].dtype
    for t in tensors[1:]:
        dtype = torch.promote_types(dtype, t.dtype)
    return tuple(t.to(dtype) for t in tensors)


def _t2j(t: "torch.Tensor") -> jax.Array:
    if t.dtype == torch.float64 and not jax.config.jax_enable_x64:
        raise ValueError(
            "float64 torch inputs need float64 JAX: run "
            'jax.config.update("jax_enable_x64", True) first '
            "(or pass float32 tensors)"
        )
    return jnp.asarray(t.detach().cpu().numpy())


def _j2t(a: jax.Array) -> "torch.Tensor":
    # copy: np.asarray of a JAX array is a read-only view, and torch
    # tensors must own writable memory
    return torch.from_numpy(np.array(a))


class _Bridge(torch.autograd.Function):
    """Generic torch<->jax splice: ``fwd(static, ints, *floats)``."""

    @staticmethod
    def forward(ctx, jfwd, jvjp, static, int_arrays, *tensors):
        ctx.jvjp, ctx.static, ctx.ints = jvjp, static, int_arrays
        ctx.save_for_backward(*tensors)
        out = jfwd(static, int_arrays, *[_t2j(t) for t in tensors])
        return _j2t(out)

    @staticmethod
    def backward(ctx, cotangent):
        floats = tuple(_t2j(t) for t in ctx.saved_tensors)
        grads = ctx.jvjp(ctx.static, ctx.ints, floats, _t2j(cotangent))
        return (None, None, None, None) + tuple(
            _j2t(g) if need else None
            for g, need in zip(grads, ctx.needs_input_grad[4:])
        )


def jax2torch(fn):
    """Wrap a JAX function of float arrays into a torch-autograd callable.

    ``fn(*arrays) -> array`` becomes ``g(*tensors) -> tensor`` with
    gradients w.r.t. every input flowing through torch autograd (via the
    jitted ``jax.vjp``; the backward re-runs the forward, see module
    docstring).

    >>> import torch, jax.numpy as jnp
    >>> g = jax2torch(lambda x: jnp.sum(x**3))
    >>> x = torch.tensor([1.0, 2.0], requires_grad=True)
    >>> g(x).backward()
    >>> x.grad
    tensor([ 3., 12.])
    """

    jfwd = jax.jit(lambda static, ints, *floats: fn(*floats))

    @jax.jit
    def jvjp(static, ints, floats, ct):
        return jax.vjp(fn, *floats)[1](ct)

    def wrapped(*tensors):
        return _Bridge.apply(jfwd, jvjp, None, (), *tensors)

    return wrapped


class TorchCalculator(torch.nn.Module):
    """The reference calculator contract, computed by torchpme_tpu.

    Wraps a built torchpme_tpu calculator (direct :class:`Calculator`,
    :class:`EwaldCalculator`, :class:`PMECalculator`, or
    :class:`P3MCalculator`).  ``forward(charges, cell, positions,
    neighbor_indices, neighbor_distances)`` takes torch tensors, returns
    the ``(n_atoms, n_channels)`` per-atom potentials as a torch tensor,
    and is differentiable w.r.t. charges, cell, positions, and
    neighbor_distances — the reference semantics
    (``/root/reference/src/torchpme/calculators/calculator.py:103-189``)
    with the compute jitted on the JAX side.

    Static mesh/k-space extents are re-derived eagerly from each concrete
    cell (``get_ns_mesh`` / ``get_ns_kvectors``), so NPT-style cell
    changes are allowed and only *extent* changes trigger recompilation.
    """

    def __init__(self, calc: Calculator):
        super().__init__()
        if isinstance(calc, CalculatorDipole):
            raise TypeError("use TorchCalculatorDipole for dipolar systems")
        self.calc = calc

        def core(static, idx, charges, cell, positions, distances):
            kw = {}
            if static is not None:
                kw[self._static_kw] = static
            return self.calc(charges, cell, positions, idx, distances, **kw)

        self._static_kw = (
            "ns_mesh"
            if hasattr(calc, "get_ns_mesh")
            else "ns_kvectors"
            if hasattr(calc, "get_ns_kvectors")
            else None
        )
        self._jfwd = jax.jit(core, static_argnums=0)
        self._jvjp = jax.jit(
            lambda static, idx, floats, ct: jax.vjp(
                lambda *fl: core(static, idx, *fl), *floats
            )[1](ct),
            static_argnums=0,
        )

    def _static(self, cell: "torch.Tensor"):
        cell_np = cell.detach().cpu().numpy()
        if self._static_kw == "ns_mesh":
            return tuple(self.calc.get_ns_mesh(cell_np))
        if self._static_kw == "ns_kvectors":
            return tuple(self.calc.get_ns_kvectors(cell_np))
        return None

    def forward(
        self,
        charges: "torch.Tensor",
        cell: "torch.Tensor",
        positions: "torch.Tensor",
        neighbor_indices: "torch.Tensor",
        neighbor_distances: "torch.Tensor",
    ) -> "torch.Tensor":
        idx = jnp.asarray(neighbor_indices.detach().cpu().numpy())
        charges, cell, positions, neighbor_distances = _promote_floats(
            charges, cell, positions, neighbor_distances
        )
        return _Bridge.apply(
            self._jfwd,
            self._jvjp,
            self._static(cell),
            idx,
            charges,
            cell,
            positions,
            neighbor_distances,
        )


class TorchCalculatorDipole(torch.nn.Module):
    """Torch contract of the reference dipolar calculator
    (``/root/reference/src/torchpme/calculators/calculator_dipole.py:127``):
    ``forward(dipoles, cell, positions, neighbor_indices,
    neighbor_vectors)`` returns the ``(n_atoms, 3)`` potential vectors,
    differentiable w.r.t. dipoles, cell, positions, and the pair vectors."""

    def __init__(self, calc: CalculatorDipole):
        super().__init__()
        self.calc = calc

        def core(static, idx, dipoles, cell, positions, vectors):
            kw = {"ns_kvectors": static} if static is not None else {}
            return self.calc(dipoles, cell, positions, idx, vectors, **kw)

        self._jfwd = jax.jit(core, static_argnums=0)
        self._jvjp = jax.jit(
            lambda static, idx, floats, ct: jax.vjp(
                lambda *fl: core(static, idx, *fl), *floats
            )[1](ct),
            static_argnums=0,
        )

    def forward(
        self,
        dipoles: "torch.Tensor",
        cell: "torch.Tensor",
        positions: "torch.Tensor",
        neighbor_indices: "torch.Tensor",
        neighbor_vectors: "torch.Tensor",
    ) -> "torch.Tensor":
        static = None
        if self.calc.potential.smearing is not None:
            static = tuple(
                self.calc.get_ns_kvectors(cell.detach().cpu().numpy())
            )
        idx = jnp.asarray(neighbor_indices.detach().cpu().numpy())
        dipoles, cell, positions, neighbor_vectors = _promote_floats(
            dipoles, cell, positions, neighbor_vectors
        )
        return _Bridge.apply(
            self._jfwd,
            self._jvjp,
            static,
            idx,
            dipoles,
            cell,
            positions,
            neighbor_vectors,
        )
