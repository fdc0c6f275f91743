"""Custom autograd architectures + jit timing.

Counterpart of reference example 05: subclass a potential to build custom
physics (here a damped Coulomb with a trainable screening length), then
measure the eager-vs-jit speedup of the full calculator.
"""

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

import torchpme_tpu as tpme
from torchpme_tpu.potentials import CoulombPotential
from torchpme_tpu.utils.neighbors import neighbor_list

jax.config.update("jax_enable_x64", True)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DampedCoulomb(CoulombPotential):
    """Coulomb kernel with an extra trainable exponential damping in k-space."""

    damping: float = 0.0  # a pytree leaf → trainable

    def lr_from_k_sq(self, k_sq):
        return super().lr_from_k_sq(k_sq) * jnp.exp(-self.damping * k_sq)


rng = np.random.default_rng(0)
box = 6.0
positions = jnp.asarray(rng.uniform(0, box, (32, 3)))
charges = jnp.asarray(np.tile([1.0, -1.0], 16).reshape(-1, 1))
cell = jnp.eye(3) * box
indices, distances, _ = map(
    jnp.asarray, neighbor_list(np.asarray(positions), np.asarray(cell), 2.0)
)

pot = DampedCoulomb(smearing=0.5, damping=0.05)
calc = tpme.EwaldCalculator(pot, lr_wavelength=0.25)
kv = calc.compute_kvectors(cell)


def energy(pot_damping):
    p = DampedCoulomb(smearing=0.5, damping=pot_damping)
    c = tpme.EwaldCalculator(p, lr_wavelength=0.25)
    out = c(charges, cell, positions, indices, distances, kvectors=kv)
    return jnp.sum(out * charges)


# gradient w.r.t. the custom physics parameter
dE_ddamping = jax.grad(energy)(0.05)
print(f"dE/d(damping) = {float(dE_ddamping):.6f}")

# eager vs jit timing
t0 = time.monotonic()
for _ in range(5):
    jax.block_until_ready(energy(0.05))
eager = (time.monotonic() - t0) / 5
jitted = jax.jit(energy)
jax.block_until_ready(jitted(0.05))  # compile
t0 = time.monotonic()
for _ in range(5):
    jax.block_until_ready(jitted(0.05))
fast = (time.monotonic() - t0) / 5
print(f"eager {eager*1e3:.2f} ms → jit {fast*1e3:.2f} ms ({eager/fast:.1f}x)")
