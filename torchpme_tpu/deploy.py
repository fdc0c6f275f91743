"""AOT export / serialized deployment of calculators (``jax.export``).

The reference ships calculators to production by TorchScript-compiling the
``nn.Module`` and round-tripping it through ``torch.jit.save``/``load``
(``/root/reference/tests/calculators/test_workflow.py:154-162``).  The JAX
analog is **ahead-of-time export**: trace + lower a jitted step to StableHLO,
serialize it to bytes, and later run it — in a process that never imports
this library — via ``jax.export.deserialize``.  That is what this module
wraps:

* :func:`export_step` — lower ``fn(*example_args)`` (optionally its
  value-and-gradient) for one or more target platforms and return the
  serialized bytes;
* :func:`load_step` — deserialize back to a callable.

Because every calculator here is an immutable pytree dataclass, "exporting a
calculator" is just exporting a closure over it — the parameters are baked
into the artifact as constants, exactly like TorchScript buffers.  Shapes
are static (the library-wide contract), so no symbolic dimensions are
needed; pass differently-shaped systems through separate exports.

Example
-------
>>> import jax, jax.numpy as jnp, numpy as np
>>> import torchpme_tpu as tpme
>>> from torchpme_tpu.deploy import export_step, load_step
>>> rng = np.random.default_rng(0)
>>> positions = jnp.asarray(rng.uniform(0, 8.0, (24, 3)))
>>> charges = jnp.asarray(np.tile([1.0, -1.0], 12).reshape(-1, 1))
>>> cell = jnp.eye(3) * 8.0
>>> calc = tpme.EwaldCalculator(tpme.CoulombPotential(smearing=1.0),
...                             lr_wavelength=2.0)
>>> from torchpme_tpu.utils.neighbors import neighbor_list
>>> idx, dist, _ = neighbor_list(np.asarray(positions), np.asarray(cell), 3.0)
>>> ns_k = calc.get_ns_kvectors(cell)  # static, like every k-grid under jit
>>> def potentials(charges, cell, positions, dist):
...     return calc(charges, cell, positions, jnp.asarray(idx), dist,
...                 ns_kvectors=ns_k)
>>> blob = export_step(potentials, charges, cell, positions, jnp.asarray(dist))
>>> restored = load_step(blob)          # no torchpme_tpu needed from here on
>>> out = restored(charges, cell, positions, jnp.asarray(dist))
>>> ref = potentials(charges, cell, positions, jnp.asarray(dist))
>>> print(bool(jnp.allclose(out, ref, atol=1e-12)))
True
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
from jax import export as _jax_export

__all__ = ["export_step", "load_step"]


def export_step(
    fn: Callable,
    *example_args,
    with_grad: int | Sequence[int] | None = None,
    platforms: Sequence[str] | None = None,
) -> bytes:
    """Serialize ``fn`` (AOT, StableHLO) traced at ``example_args``.

    :param fn: a jit-compatible function of array arguments (typically a
        closure over a calculator or :class:`~torchpme_tpu.md.MDFastPath`).
    :param example_args: arrays fixing the traced shapes/dtypes.
    :param with_grad: if given, export ``jax.value_and_grad(fn,
        argnums=with_grad)`` instead — the deployed artifact then returns
        ``(value, grads)``, e.g. energy and minus-forces for an MD engine.
    :param platforms: lowering targets, e.g. ``("tpu", "cpu")``.  Defaults
        to the current default backend.  Cross-platform export (lowering for
        TPU from a CPU host) is supported; running the artifact requires one
        of its target platforms.
    :return: serialized bytes (persist them anywhere; no pickle involved).
    """
    if with_grad is not None:
        argnums = (
            tuple(with_grad) if isinstance(with_grad, (tuple, list)) else with_grad
        )
        fn = jax.value_and_grad(fn, argnums=argnums)
    exported = _jax_export.export(
        jax.jit(fn),
        platforms=tuple(platforms) if platforms is not None else None,
    )(*example_args)
    return bytes(exported.serialize())


def load_step(data: bytes) -> Callable:
    """Deserialize an :func:`export_step` artifact into a callable.

    The returned callable runs the embedded StableHLO under ``jax.jit`` with
    the exact shapes/dtypes it was traced at (mismatches raise).  Only
    ``jax`` itself is required at load time — not this library.
    """
    exported = _jax_export.deserialize(data)
    return jax.jit(exported.call)
