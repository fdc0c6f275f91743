"""Converters between the pytree containers and real metatensor objects.

The reference's ecosystem layer consumes ``metatomic.torch.System`` objects
and emits ``metatensor.torch.TensorMap`` blocks
(``/root/reference/src/torchpme/metatensor/calculator.py:22-188``).
metatensor has no JAX array backend, so this library's calculators run on
the pytree containers in :mod:`torchpme_tpu.atomistic.calculator` — and this
module provides the boundary converters so a metatensor/metatomic pipeline
can feed them and consume their output:

* :func:`system_from_metatensor` — ``metatomic.torch.System`` (with its
  TensorMap ``"charge"`` data) → :class:`~torchpme_tpu.atomistic.System`.
* :func:`neighborlist_from_metatensor` — a metatensor ``TensorBlock``
  neighbor list (the layout ``metatomic.torch.System.get_neighborlist``
  returns) → :class:`~torchpme_tpu.atomistic.NeighborList`.
* :func:`labeled_to_metatensor` — :class:`~torchpme_tpu.atomistic.LabeledValues`
  → a ``metatensor.torch.TensorMap`` with the reference's exact output
  layout (keys ``"_"``, samples ``(system, atom)``, properties
  ``charges_channel``).

Backend resolution: ``metatensor.torch`` + ``metatomic.torch`` when
installed (torch itself ships in this environment); the numpy-based
``metatensor`` core API otherwise.  Neither package can be installed on
this machine (no network egress; see the environment note below), so the
converters are exercised by structural stand-in tests plus
``importorskip``-gated roundtrip tests that activate the moment either
package is present.

.. note:: **Environment**: ``pip install metatensor metatomic`` requires
   network egress, which the development box does not have.  The converter
   code paths track the documented public API of metatensor ≥ 0.5 /
   metatomic ≥ 0.1 (the versions the reference pins) and are covered by
   duck-typed structural tests (``tests/test_atomistic.py``) that mimic
   those objects' attribute surface exactly.
"""

from __future__ import annotations

import numpy as np

from .calculator import _EXPECTED_SAMPLE_NAMES, LabeledValues, NeighborList, System

__all__ = [
    "system_from_metatensor",
    "neighborlist_from_metatensor",
    "labeled_to_metatensor",
    "metatensor_backend",
]


def _to_numpy(x) -> np.ndarray:
    """Array-out of a torch tensor / numpy array / buffer duck-typed value."""
    if hasattr(x, "detach"):  # torch.Tensor
        return x.detach().cpu().numpy()
    return np.asarray(x)


def metatensor_backend() -> str | None:
    """Which metatensor API is importable: ``"torch"``, ``"numpy"`` or None."""
    try:
        import metatensor.torch  # noqa: F401

        return "torch"
    except ImportError:
        pass
    try:
        import metatensor  # noqa: F401

        return "numpy"
    except ImportError:
        return None


def system_from_metatensor(mts_system, charge_key: str = "charge") -> System:
    """Build a :class:`System` from a ``metatomic.torch.System``.

    Mirrors the data access of the reference wrapper
    (``metatensor/calculator.py:92-107,144``): the system must carry a
    ``charge`` data entry — a one-block, component-free TensorMap whose
    block values are ``(n_atoms, n_channels)``.

    :param mts_system: a ``metatomic.torch.System`` (or any object with
        ``types`` / ``positions`` / ``cell`` attributes, ``known_data()``,
        and ``get_data(name)`` returning a TensorMap-like with ``block()``).
    :param charge_key: name of the per-atom data entry to import.
    """
    import jax.numpy as jnp

    system = System(
        types=jnp.asarray(_to_numpy(mts_system.types)),
        positions=jnp.asarray(_to_numpy(mts_system.positions)),
        cell=jnp.asarray(_to_numpy(mts_system.cell)),
    )
    known = set(mts_system.known_data())
    if charge_key not in known:
        raise ValueError(
            f"`system` does not contain `{charge_key}` data; attach it with "
            f'`system.add_data("{charge_key}", tensor_map)` first'
        )
    charge_tmap = mts_system.get_data(charge_key)
    if len(charge_tmap) != 1:
        raise ValueError(
            "Charge tensor must have exactly one block but has "
            f"{len(charge_tmap)} blocks"
        )
    block = charge_tmap.block()
    if len(block.components) > 0:
        raise ValueError(
            "TensorBlock containing the charges should not have components; "
            f"found {len(block.components)}"
        )
    return system.add_data(charge_key, jnp.asarray(_to_numpy(block.values)))


def neighborlist_from_metatensor(neighbors) -> NeighborList:
    """Build a :class:`NeighborList` from a metatensor neighbor TensorBlock.

    Accepts the layout the reference consumes
    (``metatensor/calculator.py:56-90,151-166``): samples named
    ``(first_atom, second_atom, cell_shift_a/b/c)``, one ``xyz`` component,
    one ``distance`` property, values ``(n_pairs, 3, 1)``.
    """
    import jax.numpy as jnp

    samples = neighbors.samples
    names = tuple(samples.names)
    if names != _EXPECTED_SAMPLE_NAMES:
        raise ValueError(
            "Invalid samples for `neighbors`: the sample names must be "
            "'first_atom', 'second_atom', 'cell_shift_a', 'cell_shift_b', "
            f"'cell_shift_c', got {list(names)}"
        )
    components = list(getattr(neighbors, "components", []))
    if components:
        component_names = tuple(c.names[0] for c in components)
    else:
        component_names = ("xyz",)
    if component_names != ("xyz",):
        raise ValueError(
            "Invalid components for `neighbors`: there should be a single "
            f"'xyz' component, got {list(component_names)}"
        )
    sample_values = _to_numpy(samples.values)
    vectors = _to_numpy(neighbors.values)
    return NeighborList(
        samples=jnp.asarray(sample_values),
        vectors=jnp.asarray(vectors),
        sample_names=names,
        component_names=component_names,
        property_names=("distance",),
    )


def labeled_to_metatensor(labeled: LabeledValues, backend: str = "auto"):
    """Export a :class:`LabeledValues` block as a metatensor ``TensorMap``.

    Produces the reference wrapper's exact output layout
    (``metatensor/calculator.py:176-188``): keys ``Labels("_", [[0]])``, one
    TensorBlock whose samples are ``(system, atom)``, no components, and
    ``charges_channel`` properties.

    :param backend: ``"torch"`` (metatensor.torch), ``"numpy"``
        (metatensor core), or ``"auto"`` (torch if importable, else numpy).
    """
    if backend == "auto":
        backend = metatensor_backend()
        if backend is None:
            raise ImportError(
                "neither metatensor.torch nor metatensor is installed; "
                "`pip install metatensor[torch]` (requires network egress)"
            )

    values = np.asarray(labeled.values)
    n_atoms, n_channels = values.shape
    if labeled.samples is not None:
        samples_arr = np.asarray(labeled.samples, dtype=np.int32)
    else:
        samples_arr = np.stack(
            [np.zeros(n_atoms, np.int32), np.arange(n_atoms, dtype=np.int32)],
            axis=1,
        )
    props_arr = np.arange(n_channels, dtype=np.int32).reshape(-1, 1)
    keys_arr = np.zeros((1, 1), dtype=np.int32)

    if backend == "torch":
        import torch
        from metatensor.torch import Labels, TensorBlock, TensorMap

        block = TensorBlock(
            values=torch.from_numpy(values.copy()),
            samples=Labels(
                list(labeled.sample_names), torch.from_numpy(samples_arr)
            ),
            components=[],
            properties=Labels(
                list(labeled.property_names), torch.from_numpy(props_arr)
            ),
        )
        keys = Labels("_", torch.from_numpy(keys_arr))
        return TensorMap(keys=keys, blocks=[block])

    if backend == "numpy":
        from metatensor import Labels, TensorBlock, TensorMap

        block = TensorBlock(
            values=values.copy(),
            samples=Labels(list(labeled.sample_names), samples_arr),
            components=[],
            properties=Labels(list(labeled.property_names), props_arr),
        )
        keys = Labels("_", keys_arr)
        return TensorMap(keys=keys, blocks=[block])

    raise ValueError(f"unknown metatensor backend {backend!r}")
