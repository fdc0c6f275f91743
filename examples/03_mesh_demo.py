"""Mesh interpolator demo: spreading charges and interpolating back.

Counterpart of reference example 03: the two halves of the PME mesh engine
used directly — charge assignment (points → mesh) and back-interpolation
(mesh → points) — plus the charge-conservation sum rule.
"""

import jax.numpy as jnp
import numpy as np

from torchpme_tpu.ops import MeshInterpolator

cell = jnp.eye(3) * 4.0
positions = jnp.asarray([[0.3, 1.1, 2.2], [2.7, 3.3, 0.4], [1.5, 1.5, 1.5]])
charges = jnp.asarray([[1.0], [-1.0], [0.5]])

mi = MeshInterpolator(cell, (16, 16, 16), interpolation_nodes=4, method="Lagrange")
mi.compute_weights(positions)

rho = mi.points_to_mesh(charges)
print("mesh shape:", rho.shape)
print("total charge on mesh:", float(rho.sum()), "(exactly conserves Σq =", float(charges.sum()), ")")

# back-interpolation of a smooth field: reproduce values at the particles
xyz = mi.get_mesh_xyz()
field = jnp.sin(xyz[..., 0])[None]  # a smooth test function on the mesh
at_atoms = mi.mesh_to_points(field)
print("interpolated sin(x) at atoms:", np.asarray(at_atoms).ravel())
print("exact:                        ", np.sin(np.asarray(positions)[:, 0]))
