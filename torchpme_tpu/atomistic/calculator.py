"""Labeled-I/O calculators over :class:`System` / :class:`NeighborList`.

Mirrors the validation and output semantics of the reference metatensor
wrapper (``/root/reference/src/torchpme/metatensor/calculator.py:22-188``):

* the neighbor list must carry its metadata — pair sample names
  ``(first_atom, second_atom, cell_shift_a/b/c)``, an ``xyz`` vector
  component, a ``distance`` property — and consistency is checked eagerly;
* the system must have a ``"charge"`` data array of shape
  ``(n_atoms, n_channels)``;
* the result is a labeled block whose samples are ``(system, atom)`` and
  whose properties are ``charges_channel``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .. import calculators as _calc
from ..potentials import Potential

__all__ = [
    "System",
    "NeighborList",
    "LabeledValues",
    "Calculator",
    "EwaldCalculator",
    "PMECalculator",
    "P3MCalculator",
]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class System:
    """An atomistic system with attached per-atom data arrays.

    :param types: ``(n_atoms,)`` integer species.
    :param positions: ``(n_atoms, 3)`` Cartesian coordinates.
    :param cell: ``(3, 3)`` cell matrix (rows are basis vectors).
    :param data: dict of named per-atom arrays; calculators require a
        ``"charge"`` entry of shape ``(n_atoms, n_channels)``.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> system = System(
    ...     types=jnp.asarray([55, 17]),
    ...     positions=jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
    ...     cell=jnp.eye(3),
    ... ).add_data("charge", jnp.asarray([[1.0], [-1.0]]))
    >>> len(system), system.get_data("charge").shape
    (2, (2, 1))
    """

    types: Array
    positions: Array
    cell: Array
    data: dict = field(default_factory=dict)

    def add_data(self, name: str, values) -> "System":
        """Return a new System with ``values`` attached under ``name``."""
        new = dict(self.data)
        new[name] = jnp.asarray(values)
        return System(self.types, self.positions, self.cell, new)

    def get_data(self, name: str) -> Array:
        if name not in self.data:
            raise ValueError(
                f"`system` does not contain `{name}` data. Please attach it "
                f'with `system.add_data("{name}", values)`.'
            )
        return self.data[name]

    def __len__(self) -> int:
        return self.positions.shape[0]


_EXPECTED_SAMPLE_NAMES = (
    "first_atom",
    "second_atom",
    "cell_shift_a",
    "cell_shift_b",
    "cell_shift_c",
)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NeighborList:
    """A half or full neighbor list with explicit metadata.

    :param samples: ``(n_pairs, 5)`` integer array whose columns are named by
        ``sample_names`` — (first_atom, second_atom, cell_shift_a/b/c).
    :param vectors: ``(n_pairs, 3, 1)`` pair displacement vectors (the
        trailing axis is the ``distance`` property, matching the reference's
        TensorBlock layout) or ``(n_pairs, 3)``.
    :param sample_names: metadata names for the sample columns.
    :param component_names: names of the vector components.
    :param property_names: names of the trailing property axis.
    """

    samples: Array
    vectors: Array
    sample_names: tuple = field(
        default=_EXPECTED_SAMPLE_NAMES, metadata=dict(static=True)
    )
    component_names: tuple = field(default=("xyz",), metadata=dict(static=True))
    property_names: tuple = field(default=("distance",), metadata=dict(static=True))

    @property
    def indices(self) -> Array:
        return self.samples[:, :2]

    @property
    def cell_shifts(self) -> Array:
        return self.samples[:, 2:5]

    @property
    def pair_vectors(self) -> Array:
        v = self.vectors
        return v[..., 0] if v.ndim == 3 else v

    @property
    def distances(self) -> Array:
        return jnp.linalg.norm(self.pair_vectors, axis=-1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LabeledValues:
    """A labeled output block: ``(samples, properties)``-annotated values."""

    values: Array
    sample_names: tuple = field(
        default=("system", "atom"), metadata=dict(static=True)
    )
    samples: Array | None = None
    property_names: tuple = field(
        default=("charges_channel",), metadata=dict(static=True)
    )

    def block(self) -> "LabeledValues":
        return self


class Calculator:
    """Base labeled-I/O calculator wrapping a plain tensor calculator.

    Subclasses set ``_base_calculator`` (mirrors the reference's
    ``metatensor/{ewald,pme,p3m}.py`` shape).
    """

    _base_calculator: type = _calc.Calculator

    def __init__(self, potential: Potential, **kwargs):
        self._calculator = self._base_calculator(potential, **kwargs)
        self.potential = potential

    # -- validation (parity with metatensor/calculator.py:39-107) -------------

    def _validate(self, system: System, neighbors: NeighborList) -> None:
        if not isinstance(system, System):
            raise TypeError(
                f"`system` must be a torchpme_tpu.atomistic.System, got {type(system)}"
            )
        if not isinstance(neighbors, NeighborList):
            raise TypeError(
                "`neighbors` must be a torchpme_tpu.atomistic.NeighborList, "
                f"got {type(neighbors)}"
            )
        if tuple(neighbors.sample_names) != _EXPECTED_SAMPLE_NAMES:
            raise ValueError(
                "Invalid samples for `neighbors`: the sample names must be "
                "'first_atom', 'second_atom', 'cell_shift_a', 'cell_shift_b', "
                f"'cell_shift_c', got {list(neighbors.sample_names)}"
            )
        if tuple(neighbors.component_names) != ("xyz",):
            raise ValueError(
                "Invalid components for `neighbors`: there should be a single "
                f"'xyz' component, got {list(neighbors.component_names)}"
            )
        if tuple(neighbors.property_names) != ("distance",):
            raise ValueError(
                "Invalid properties for `neighbors`: there should be a single "
                f"'distance' property, got {list(neighbors.property_names)}"
            )
        if neighbors.samples.ndim != 2 or neighbors.samples.shape[1] != 5:
            raise ValueError(
                "Invalid samples for `neighbors`: expected shape "
                f"(n_pairs, 5), got {list(neighbors.samples.shape)}"
            )
        vectors = neighbors.pair_vectors
        if vectors.shape != (neighbors.samples.shape[0], 3):
            raise ValueError(
                "Invalid vectors for `neighbors`: expected shape (n_pairs, 3), "
                f"got {list(vectors.shape)}"
            )
        charges = system.get_data("charge")
        if charges.ndim != 2 or charges.shape[0] != len(system):
            raise ValueError(
                "Invalid `charge` data: expected shape (n_atoms, n_channels) "
                f"with n_atoms={len(system)}, got {list(charges.shape)}"
            )

    def forward(
        self,
        system: System,
        neighbors: NeighborList,
        system_index: int = 0,
        **extra_kwargs,
    ) -> LabeledValues:
        """Compute per-atom potentials, returning a labeled block.

        :param extra_kwargs: forwarded static-shape hints (``ns_mesh`` /
            ``ns_kvectors``) for jit use.
        """
        self._validate(system, neighbors)
        charges = system.get_data("charge")
        values = self._calculator(
            charges,
            system.cell,
            system.positions,
            neighbors.indices,
            neighbors.distances,
            **extra_kwargs,
        )
        n_atoms = len(system)
        samples = jnp.stack(
            [jnp.full((n_atoms,), system_index), jnp.arange(n_atoms)], axis=1
        )
        return LabeledValues(values=values, samples=samples)

    __call__ = forward


class EwaldCalculator(Calculator):
    """Labeled-I/O wrapper of :class:`torchpme_tpu.EwaldCalculator`."""

    _base_calculator = _calc.EwaldCalculator


class PMECalculator(Calculator):
    """Labeled-I/O wrapper of :class:`torchpme_tpu.PMECalculator`."""

    _base_calculator = _calc.PMECalculator


class P3MCalculator(Calculator):
    """Labeled-I/O wrapper of :class:`torchpme_tpu.P3MCalculator`."""

    _base_calculator = _calc.P3MCalculator
