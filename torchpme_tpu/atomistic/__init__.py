"""Labeled atomistic-systems interface (ecosystem layer).

Structural equivalent of the reference's metatensor bindings
(``/root/reference/src/torchpme/metatensor/``): calculators that consume a
:class:`System` (positions, cell, types, attached per-atom data) plus a
:class:`NeighborList` with explicit metadata, validate that metadata with the
same semantics as the reference (first/second atom samples, cell-shift
triplets, xyz vector components, distance property), and return a
:class:`LabeledValues` block keyed by ``charges_channel``.

metatensor-jax does not exist at the time of writing, so the containers are
lightweight pytree dataclasses; ``System.from_metatensor`` /
``LabeledValues.to_metatensor`` hooks can be added when an upstream JAX
metatensor materializes.
"""

from .calculator import (
    Calculator,
    EwaldCalculator,
    LabeledValues,
    NeighborList,
    P3MCalculator,
    PMECalculator,
    System,
)

__all__ = [
    "Calculator",
    "EwaldCalculator",
    "LabeledValues",
    "NeighborList",
    "P3MCalculator",
    "PMECalculator",
    "System",
]
