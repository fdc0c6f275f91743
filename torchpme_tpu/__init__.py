"""torchpme_tpu: TPU-native long-range interactions for atomistic systems.

A from-scratch JAX/XLA/Pallas framework with the capabilities of torch-pme
(reference layout documented in ``SURVEY.md``): direct, Ewald, PME and P3M
calculators over range-separated pair potentials, with full autodiff through
positions, charges/dipoles and cell (forces and stress), slab corrections,
masked ``vmap`` batching, error-bound-driven auto-tuning, and pjit/shard_map
multi-chip sharding.
"""

from . import calculators, md, ops, parallel, potentials, prefactors, tuning, utils  # noqa: F401
from ._version import __version__  # noqa: F401
from .calculators import (
    Calculator,
    CalculatorDipole,
    EwaldCalculator,
    P3MCalculator,
    PMECalculator,
    PMECalculatorDipole,
)
from .md import MDFastPath, MDFastPathDipole, MDFastPathEwald
from .potentials import (
    CombinedPotential,
    CoulombPotential,
    InversePowerLawPotential,
    Potential,
    PotentialDipole,
    SplinePotential,
)

__all__ = [
    "Calculator",
    "EwaldCalculator",
    "P3MCalculator",
    "PMECalculator",
    "CoulombPotential",
    "Potential",
    "InversePowerLawPotential",
    "SplinePotential",
    "CombinedPotential",
    "PotentialDipole",
    "CalculatorDipole",
    "PMECalculatorDipole",
    "MDFastPath",
    "MDFastPathDipole",
    "MDFastPathEwald",
]
