"""Particle-particle particle-mesh (P3M) calculator.

TPU-native counterpart of ``/root/reference/src/torchpme/calculators/p3m.py``:
identical pipeline to PME but with the P3M charge-assignment stencil and the
optimal influence function multiplying the reciprocal-space filter.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
from jax import Array

from ..ops.kspace import compute_kspace_filter, p3m_influence_function
from ..potentials.potential import static_field
from .pme import PMECalculator

__all__ = ["P3MCalculator"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class P3MCalculator(PMECalculator):
    r"""P3M variant of the mesh calculator.

    :param potential: range-separated potential; ``smearing`` must be set.
    :param mesh_spacing: target mesh-plane spacing (rounded to powers of two).
    :param interpolation_nodes: P3M charge-assignment order, values 1–5.
    :param full_neighbor_list: half (False) or full (True) neighbor list.
    :param mode: influence-function mode — 0 potential, 1 energy, 2 dipolar
        torque, 3 dipolar force (eq. 30 of Ballenegger 2008).
    :param differential_order: finite-difference order (1–6) of the
        approximate differential operator.

    Example
    -------
    CsCl Madelung constant (2.035361...) to mesh accuracy:

    >>> import jax.numpy as jnp
    >>> from torchpme_tpu import CoulombPotential, P3MCalculator
    >>> from torchpme_tpu.utils.neighbors import neighbor_list
    >>> positions = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    >>> charges = jnp.asarray([[-1.0], [1.0]])
    >>> cell = jnp.eye(3)
    >>> idx, dist, _ = neighbor_list(positions, cell, cutoff=1.2)
    >>> calc = P3MCalculator(CoulombPotential(smearing=0.25), mesh_spacing=0.1)
    >>> pot = calc(charges, cell, positions, jnp.asarray(idx), jnp.asarray(dist))
    >>> print(f"{float(-jnp.sum(pot * charges)):.3f}")
    2.035
    """

    _method: str = static_field(default="P3M", kw_only=True)
    mode: int = static_field(default=0, kw_only=True)
    differential_order: int = static_field(default=2, kw_only=True)

    def __post_init__(self):
        # Validate like PME but with the P3M node range.
        from .calculator import Calculator

        Calculator.__post_init__(self)
        if self.potential.smearing is None:
            raise ValueError(
                "Must specify smearing to use a potential with P3MCalculator"
            )
        if (
            isinstance(self.potential.smearing, (int, float))
            and self.potential.smearing <= 0
        ):
            raise ValueError(
                f"`smearing` is {self.potential.smearing} but must be positive"
            )
        if self.interpolation_nodes not in (1, 2, 3, 4, 5):
            raise ValueError(
                f"`interpolation_nodes` is {self.interpolation_nodes} but only "
                "values from 1 to 5 for method 'P3M' are allowed"
            )
        if self.mode not in (0, 1, 2, 3):
            raise ValueError(
                f"`mode` should be one of [0, 1, 2, 3], but got {self.mode}"
            )
        if self.differential_order not in (1, 2, 3, 4, 5, 6):
            raise ValueError(
                "`differential_order` should be one between 1 and 6, "
                f"but got {self.differential_order}"
            )

    def _kspace_filter(self, cell: Array, ns: tuple[int, int, int]) -> Array:
        influence = p3m_influence_function(
            cell, ns, self.interpolation_nodes, self.mode, self.differential_order
        )
        return influence * compute_kspace_filter(
            self.potential.lr_from_k_sq, cell, ns
        )
