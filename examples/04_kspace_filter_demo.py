"""K-space filter demo: custom reciprocal-space convolutions.

Counterpart of reference example 04: any object with ``kernel_from_k_sq``
drives the rFFT filter — here a Gaussian smoothing kernel applied to a
point density.
"""

import jax.numpy as jnp
import numpy as np

from torchpme_tpu.ops import KSpaceFilter, MeshInterpolator


class GaussianSmoothing:
    """exp(−σ²k²/2) low-pass kernel (the k-space-kernel protocol)."""

    def __init__(self, sigma: float):
        self.sigma = sigma

    def kernel_from_k_sq(self, k_sq):
        return jnp.exp(-0.5 * self.sigma**2 * k_sq)


cell = jnp.eye(3) * 5.0
ns = (32, 32, 32)

# a point charge spread on the mesh ...
mi = MeshInterpolator(cell, ns, interpolation_nodes=3, method="P3M")
mi.compute_weights(jnp.asarray([[2.5, 2.5, 2.5]]))
rho = mi.points_to_mesh(jnp.asarray([[1.0]]))

# ... smoothed by the filter
kf = KSpaceFilter(cell, ns, kernel=GaussianSmoothing(sigma=0.5))
smooth = kf(rho)

print("peak before:", float(rho.max()))
print("peak after: ", float(smooth.max()))
print("mass conserved:", np.isclose(float(rho.sum()), float(smooth.sum()), rtol=1e-10))
