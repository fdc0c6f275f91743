"""Basic usage: energy, forces and stress of a CsCl crystal with PME.

The quickstart flow (mirrors the reference README quickstart): build a
system, get a neighbor list, pick tuned parameters, evaluate per-atom
potentials, and differentiate for forces and stress.
"""

import jax
import jax.numpy as jnp
import numpy as np

import torchpme_tpu as tpme
from torchpme_tpu.utils.neighbors import compute_distances, neighbor_list

jax.config.update("jax_enable_x64", True)

# --- a CsCl crystal ---------------------------------------------------------
positions = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
charges = jnp.asarray([[1.0], [-1.0]])
cell = jnp.eye(3)

# --- neighbor list (any engine works; indices+distances are the contract) ---
cutoff = 0.49
indices, distances, shifts = map(
    jnp.asarray, neighbor_list(np.asarray(positions), np.asarray(cell), cutoff)
)

# --- tuned parameters --------------------------------------------------------
smearing, params, _ = tpme.tuning.tune_pme(
    charges, cell, positions, cutoff=cutoff,
    neighbor_indices=indices, neighbor_distances=distances,
    accuracy=1e-3, nodes_lo=3, nodes_hi=4, mesh_lo=3, mesh_hi=6,
)
calculator = tpme.PMECalculator(tpme.CoulombPotential(smearing=smearing), **params)
ns_mesh = calculator.get_ns_mesh(cell)  # static mesh shape for jit

# --- energy + forces + stress through one jitted function --------------------
def total_energy(positions, charges, cell):
    d = compute_distances(positions, indices, cell=cell, neighbor_shifts=shifts)
    potentials = calculator(charges, cell, positions, indices, d, ns_mesh=ns_mesh)
    return jnp.sum(potentials * charges)

energy, (neg_forces, stress_x_cell) = jax.jit(
    jax.value_and_grad(total_energy, argnums=(0, 2))
)(positions, charges, cell)

print(f"energy per formula unit: {float(energy):.6f}  (madelung ≈ 2.0354)")
print("forces:", -np.asarray(neg_forces))
