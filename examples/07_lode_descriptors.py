"""LODE-style long-range descriptors from the mesh engine directly.

Counterpart of reference example 07: power users compose
``MeshInterpolator`` + ``KSpaceFilter`` with species-channel charges to build
long-distance-equivariant (LODE) features — the smeared long-range potential
of each species sublattice evaluated at every atom.
"""

import jax.numpy as jnp
import numpy as np

from torchpme_tpu import CoulombPotential
from torchpme_tpu.ops import KSpaceFilter, MeshInterpolator

# NaCl cubic cell with one-hot species channels
positions = jnp.asarray(
    [[0.0, 0, 0], [1, 1, 0], [1, 0, 1], [0, 1, 1],
     [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]]
)
types = np.array([0, 0, 0, 0, 1, 1, 1, 1])
onehot = jnp.asarray(np.eye(2)[types])
cell = 2 * jnp.eye(3)
ns = (16, 16, 16)

# density of each species on the mesh
mi = MeshInterpolator(cell, ns, interpolation_nodes=4, method="Lagrange")
mi.compute_weights(positions)
rho = mi.points_to_mesh(onehot)  # (2, nx, ny, nz)

# smeared Coulomb propagator as the filter (a Potential IS a KSpaceKernel)
kf = KSpaceFilter(
    cell, ns, kernel=CoulombPotential(smearing=0.4),
    fft_norm="backward", ifft_norm="forward",
)
potential_mesh = kf(rho)

# back-interpolate: per-atom, per-species long-range features
volume = jnp.abs(jnp.linalg.det(cell))
features = mi.mesh_to_points(potential_mesh) / volume
print("LODE feature matrix (atoms × species channels):")
print(np.asarray(features))
assert features.shape == (8, 2)
