"""Padded vmap batching over systems of different sizes.

Counterpart of reference example 12: pad atoms/pairs/k-vectors to common
static shapes, mask the padding, and ``jax.vmap`` the calculator over the
batch — one compiled kernel for the whole dataset.
"""

import jax
import jax.numpy as jnp
import numpy as np

import torchpme_tpu as tpme
from torchpme_tpu.ops import compute_batched_kvectors
from torchpme_tpu.utils.neighbors import neighbor_list

jax.config.update("jax_enable_x64", True)

rng = np.random.default_rng(3)
LR_WAVELENGTH = 0.5
systems = []
for n_pairs, box in [(2, 4.0), (3, 5.0), (4, 6.0)]:
    n = 2 * n_pairs
    pos = rng.uniform(0.5, box - 0.5, (n, 3))
    q = np.tile([1.0, -1.0], n_pairs).reshape(-1, 1)
    cell = np.eye(3) * box
    idx, dist, _ = neighbor_list(pos, cell, cutoff=1.9)
    systems.append((pos, q, cell, idx, dist))

max_atoms = max(s[0].shape[0] for s in systems)
max_pairs = max(s[3].shape[0] for s in systems)


def pad(arr, n, fill=0.0):
    widths = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, widths, constant_values=fill)


batch = {
    "positions": jnp.asarray(np.stack([pad(s[0], max_atoms) for s in systems])),
    "charges": jnp.asarray(np.stack([pad(s[1], max_atoms) for s in systems])),
    "cell": jnp.asarray(np.stack([s[2] for s in systems])),
    "idx": jnp.asarray(np.stack([pad(s[3], max_pairs) for s in systems])),
    "dist": jnp.asarray(np.stack([pad(s[4], max_pairs, fill=1.0) for s in systems])),
    "node_mask": jnp.asarray(
        np.stack([np.arange(max_atoms) < s[0].shape[0] for s in systems])
    ),
    "pair_mask": jnp.asarray(
        np.stack([np.arange(max_pairs) < s[3].shape[0] for s in systems])
    ),
}
kvectors = compute_batched_kvectors(LR_WAVELENGTH, batch["cell"])

calc = tpme.EwaldCalculator(tpme.CoulombPotential(smearing=1.0), lr_wavelength=LR_WAVELENGTH)
batched = jax.jit(
    jax.vmap(
        lambda q, c, p, i, d, nm, pm, kv: calc(
            q, c, p, i, d, node_mask=nm, pair_mask=pm, kvectors=kv
        )
    )
)
potentials = batched(
    batch["charges"], batch["cell"], batch["positions"], batch["idx"],
    batch["dist"], batch["node_mask"], batch["pair_mask"], kvectors,
)
energies = jnp.sum(potentials * batch["charges"], axis=(1, 2))
print("batched per-system energies:", np.asarray(energies))
