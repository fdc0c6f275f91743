"""Weighted linear combination of potentials, with trainable weights.

TPU-native counterpart of ``/root/reference/src/torchpme/potentials/combined.py``.
The weights are ordinary pytree leaves: differentiating or optimizing through
them needs no special "parameter" machinery — pass the potential through
``jax.grad`` / optax like any other pytree (the reference needs
``nn.Parameter`` for this, ``combined.py:76-79``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from .potential import Potential

__all__ = ["CombinedPotential"]


class CombinedPotential(Potential):
    """Linear combination ``sum_i w_i · V_i`` of compatible potentials.

    :param potentials: sequence of potentials; either all direct
        (``smearing=None``) or all range-separated.
    :param initial_weights: combination weights, default all-ones.
    :param learnable_weights: kept for API parity; in JAX the weights are
        always pytree leaves, so they are trainable whenever the caller
        optimizes over them.
    :param smearing: must be set iff the member potentials are range-separated
        (used by calculators to pick their SR/LR split bookkeeping).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> from torchpme_tpu.potentials import CoulombPotential, InversePowerLawPotential
    >>> combined = CombinedPotential(
    ...     [CoulombPotential(smearing=1.0),
    ...      InversePowerLawPotential(exponent=2, smearing=1.0)],
    ...     initial_weights=jnp.asarray([2.0, 1.0]),
    ...     smearing=1.0,
    ... )
    >>> print(f"{float(combined.from_dist(jnp.asarray(2.0))):.4f}")  # 2/r + 1/r²
    1.2500
    """

    def __init__(
        self,
        potentials: list[Potential],
        initial_weights: Array | None = None,
        learnable_weights: bool = True,
        smearing: float | None = None,
        exclusion_radius: float | None = None,
        exclusion_degree: int = 1,
    ):
        sets = object.__setattr__
        sets(self, "smearing", smearing)
        sets(self, "exclusion_radius", exclusion_radius)
        sets(self, "exclusion_degree", exclusion_degree)
        sets(self, "prefactor", 1.0)
        sets(self, "learnable_weights", bool(learnable_weights))

        smearings = [pot.smearing for pot in potentials]
        if not all(s is not None for s in smearings) and any(
            s is not None for s in smearings
        ):
            raise ValueError(
                "Cannot combine direct (`smearing=None`) and range-separated "
                "(`smearing=float`) potentials."
            )
        if all(s is not None for s in smearings) and len(smearings) > 0 and smearing is None:
            raise ValueError(
                "You should specify a `smearing` when combining range-separated "
                "(`smearing=float`) potentials."
            )
        if not any(s is not None for s in smearings) and smearing is not None:
            raise ValueError(
                "Cannot specify `smearing` when combining direct "
                "(`smearing=None`) potentials."
            )

        if initial_weights is not None:
            initial_weights = jnp.asarray(initial_weights)
            if initial_weights.shape[0] != len(potentials):
                raise ValueError(
                    "The number of initial weights must match the number of "
                    "potentials being combined"
                )
        else:
            initial_weights = jnp.ones(len(potentials))
        sets(self, "potentials", tuple(potentials))
        sets(self, "weights", initial_weights)

    def _combine(self, values: list[Array]) -> Array:
        stacked = jnp.stack(values, axis=-1)
        return jnp.matmul(
            stacked, self.weights.astype(stacked.dtype), precision="highest"
        )

    def from_dist(self, dist: Array, pair_mask: Array | None = None) -> Array:
        return self._combine([p.from_dist(dist, pair_mask) for p in self.potentials])

    def sr_from_dist(self, dist: Array, pair_mask: Array | None = None) -> Array:
        return self._combine([p.sr_from_dist(dist, pair_mask) for p in self.potentials])

    def lr_from_dist(self, dist: Array, pair_mask: Array | None = None) -> Array:
        return self._combine([p.lr_from_dist(dist, pair_mask) for p in self.potentials])

    def lr_from_k_sq(self, k_sq: Array) -> Array:
        return self._combine([p.lr_from_k_sq(k_sq) for p in self.potentials])

    @property
    def sr_derivative(self):
        """Analytic combined :math:`dV_{SR}/dr` when every member has the
        hook, else ``None`` (the fast path falls back to the autodiff
        pullback — which trainable weights require anyway; the analytic gate
        only fires when all leaves, weights included, are concrete).

        Members recompute their own SR factors (the shared ``sr_values``
        argument is the *combined* value, which cannot be split back), so
        this costs one extra member-SR pass — still cheaper than the
        ``jax.vjp`` re-walk of the whole combination.
        """
        if any(
            getattr(p, "sr_derivative", None) is None for p in self.potentials
        ):
            return None

        def deriv(dist: Array, sr_values: Array) -> Array:
            del sr_values  # combined value; members re-derive their own
            return self._combine(
                [p.sr_derivative(dist, p.sr_from_dist(dist)) for p in self.potentials]
            )

        return deriv

    @property
    def sr_window_math(self):
        """Composed fused ``(V, V'/d)``-of-d² hook when every member has one,
        else ``None``.  Like :attr:`sr_derivative`, this only fires through
        the analytic gate (all leaves concrete — trainable weights keep the
        autodiff pullback); the member Gaussians are not shared across
        members (different smearings), but each member still pays only its
        own single transcendental pass."""
        if any(
            getattr(p, "sr_window_math", None) is None for p in self.potentials
        ):
            return None

        def window_math(dist_sq: Array) -> tuple[Array, Array]:
            parts = [p.sr_window_math(dist_sq) for p in self.potentials]
            return (
                self._combine([v for v, _ in parts]),
                self._combine([w for _, w in parts]),
            )

        return window_math

    def self_contribution(self) -> Array:
        return self._combine([p.self_contribution() for p in self.potentials])

    def background_correction(self) -> Array:
        return self._combine([p.background_correction() for p in self.potentials])


_COMBINED_LEAVES = (
    "smearing",
    "exclusion_radius",
    "prefactor",
    "potentials",
    "weights",
)


def _combined_flatten(pot: CombinedPotential):
    return (
        tuple(getattr(pot, n) for n in _COMBINED_LEAVES),
        (pot.exclusion_degree, pot.learnable_weights),
    )


def _combined_unflatten(aux, children) -> CombinedPotential:
    pot = object.__new__(CombinedPotential)
    for name, value in zip(_COMBINED_LEAVES, children):
        object.__setattr__(pot, name, value)
    object.__setattr__(pot, "exclusion_degree", aux[0])
    object.__setattr__(pot, "learnable_weights", aux[1])
    return pot


jax.tree_util.register_pytree_node(
    CombinedPotential, _combined_flatten, _combined_unflatten
)
