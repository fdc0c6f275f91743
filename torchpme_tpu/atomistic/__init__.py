"""Labeled atomistic-systems interface (ecosystem layer).

Structural equivalent of the reference's metatensor bindings
(``/root/reference/src/torchpme/metatensor/``): calculators that consume a
:class:`System` (positions, cell, types, attached per-atom data) plus a
:class:`NeighborList` with explicit metadata, validate that metadata with the
same semantics as the reference (first/second atom samples, cell-shift
triplets, xyz vector components, distance property), and return a
:class:`LabeledValues` block keyed by ``charges_channel``.

metatensor-jax does not exist at the time of writing, so the containers are
lightweight pytree dataclasses.  Boundary converters to/from REAL metatensor
objects live in :mod:`torchpme_tpu.atomistic.convert`
(:func:`system_from_metatensor`, :func:`neighborlist_from_metatensor`,
:func:`labeled_to_metatensor`) — importable without metatensor installed,
active when ``metatensor.torch``/``metatomic.torch`` (or the numpy core
API) is present.  See that module's docstring for the environment note on
why the packages themselves cannot be installed on this machine.
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
from .convert import (
    labeled_to_metatensor,
    metatensor_backend,
    neighborlist_from_metatensor,
    system_from_metatensor,
)

__all__ = [
    "Calculator",
    "EwaldCalculator",
    "LabeledValues",
    "NeighborList",
    "P3MCalculator",
    "PMECalculator",
    "System",
    "labeled_to_metatensor",
    "metatensor_backend",
    "neighborlist_from_metatensor",
    "system_from_metatensor",
]
