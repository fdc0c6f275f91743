"""Multi-chip SPMD execution of the calculators over a jax device mesh.

This tier is **new TPU-native capability** — the reference is strictly
single-device (SURVEY.md §2: no distributed code of any kind).  The scale
axes of this library are atom count, neighbor-pair count, k-vector count and
FFT mesh size; they are sharded as:

* **real space** — neighbor pairs sharded across the ``atoms`` axis; each
  device scatter-adds its local pairs into an (N, C) partial that is
  ``psum``-reduced over ICI and re-sliced to the device's atom shard;
* **Ewald k-space** — k-vectors sharded; each device computes the
  structure-factor einsum for its k-shard (the MXU-hot op) and the per-atom
  energies are ``psum``-reduced;
* **PME/P3M k-space** — atoms sharded for spreading/gathering; the density
  mesh is ``psum``-reduced (one all-reduce of the (C, nx, ny, nz) mesh over
  ICI), the 3D rFFT filter runs replicated (cheap relative to spreading at
  production sizes), and each device gathers the potentials of its own atoms.

All collectives are XLA collectives inserted by ``shard_map``; gradients flow
through them (``psum`` transposes to broadcast), so forces/stress work on the
sharded path too.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..ops.kspace import apply_kspace_filter
from ..ops.kvectors import generate_kvectors_for_ewald
from ..ops.mesh import compute_interpolation, mesh_to_points, points_to_mesh

__all__ = [
    "pad_to_multiple",
    "sharded_ewald_potentials",
    "sharded_mesh_potentials",
]


def pad_to_multiple(array, multiple: int, axis: int = 0, fill=0):
    """Right-pad ``array`` along ``axis`` to a multiple of ``multiple``."""
    array = jnp.asarray(array)
    n = array.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return array
    pad = [(0, 0)] * array.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(array, pad, constant_values=fill)


def _rspace_partial(calc, charges, idx_local, dist_local, mask_local, axis):
    """Local-pair scatter partials, reduced to the full (N, C) over ICI."""
    partial_pot = calc._compute_rspace(
        charges, idx_local, dist_local, pair_mask=mask_local
    )
    return lax.psum(partial_pot, axis)


def sharded_ewald_potentials(
    calc,
    device_mesh: Mesh,
    charges: Array,
    cell: Array,
    positions: Array,
    neighbor_indices: Array,
    neighbor_distances: Array,
    ns_kvectors: tuple[int, int, int],
    pair_mask: Array | None = None,
    axis: str = "atoms",
) -> Array:
    """Ewald per-atom potentials, SPMD over ``device_mesh[axis]``.

    Pairs and k-vectors are sharded; positions/charges/cell are replicated
    (they are small compared to the pair and k-vector sets that carry the
    quadratic work).  Pads pairs and k-vectors to shardable multiples
    internally; returns the same values as ``calc(...)`` on one device.
    """
    n_dev = device_mesh.shape[axis]
    kvectors = generate_kvectors_for_ewald(cell, ns_kvectors)
    # zero-padding is safe: the k=0 kernel entry is zero by construction
    kvectors = pad_to_multiple(kvectors, n_dev)
    neighbor_indices = pad_to_multiple(neighbor_indices, n_dev)
    if pair_mask is None:
        pair_mask = jnp.arange(neighbor_indices.shape[0]) < neighbor_distances.shape[0]
    else:
        pair_mask = pad_to_multiple(pair_mask, n_dev, fill=False)
    neighbor_distances = pad_to_multiple(neighbor_distances, n_dev, fill=1.0)

    def local(charges, cell, positions, idx, dist, mask, kvecs):
        pot = _rspace_partial(calc, charges, idx, dist, mask, axis)

        # k-space partial over the local k-shard
        knorm_sq = jnp.sum(kvecs**2, axis=-1)
        g_kernel = calc.potential.lr_from_k_sq(knorm_sq)
        trig_args = jnp.matmul(kvecs, positions.T, precision="highest")
        trig = jnp.stack([jnp.cos(trig_args), jnp.sin(trig_args)])
        weighted = jnp.einsum(
            "fki,ic,k->fkc", trig, charges, g_kernel, precision="highest"
        )
        energy = jnp.einsum("fkc,fki->ic", weighted, trig, precision="highest")
        energy = lax.psum(energy, axis)

        volume = jnp.abs(jnp.linalg.det(cell))
        energy = energy / volume
        energy = energy - charges * calc.potential.self_contribution()
        charge_tot = jnp.sum(charges, axis=0)
        energy = (
            energy - 2 * calc.potential.background_correction() * charge_tot / volume
        )
        return pot + energy / 2

    fn = shard_map(
        local,
        mesh=device_mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    return fn(
        charges,
        cell,
        positions,
        neighbor_indices,
        neighbor_distances,
        pair_mask,
        kvectors,
    )


def sharded_mesh_potentials(
    calc,
    device_mesh: Mesh,
    charges: Array,
    cell: Array,
    positions: Array,
    neighbor_indices: Array,
    neighbor_distances: Array,
    ns_mesh: tuple[int, int, int],
    pair_mask: Array | None = None,
    axis: str = "atoms",
) -> Array:
    """PME/P3M per-atom potentials, SPMD over ``device_mesh[axis]``.

    Atoms are sharded for the spread/gather stencils (the bandwidth-bound hot
    path); the density mesh is psum-reduced across devices and the rFFT filter
    runs replicated.  Returns the same values as ``calc(...)`` single-device.
    Atom count must not require resharding mid-flight: positions/charges are
    padded to a multiple of the axis size internally (padded charges are zero,
    so they do not contribute).
    """
    n_dev = device_mesh.shape[axis]
    n_atoms = charges.shape[0]
    charges_p = pad_to_multiple(charges, n_dev)
    positions_p = pad_to_multiple(positions, n_dev)
    neighbor_indices = pad_to_multiple(neighbor_indices, n_dev)
    if pair_mask is None:
        pair_mask = jnp.arange(neighbor_indices.shape[0]) < neighbor_distances.shape[0]
    else:
        pair_mask = pad_to_multiple(pair_mask, n_dev, fill=False)
    neighbor_distances = pad_to_multiple(neighbor_distances, n_dev, fill=1.0)
    ns_mesh = tuple(int(n) for n in ns_mesh)

    def local(charges_all, cell, positions_all, pos_shard, q_shard, idx, dist, mask):
        rank = lax.axis_index(axis)
        block = pos_shard.shape[0]

        pot_r_full = _rspace_partial(calc, charges_all, idx, dist, mask, axis)
        pot_r = lax.dynamic_slice_in_dim(pot_r_full, rank * block, block)

        # spread the local atom shard onto a device-local mesh copy ...
        inverse_cell = jnp.linalg.inv(cell)
        interp = compute_interpolation(
            pos_shard, inverse_cell, ns_mesh, calc.interpolation_nodes, calc._method
        )
        rho_local = points_to_mesh(interp, q_shard)
        # ... and reduce the density over ICI: one all-reduce of the mesh
        rho_mesh = lax.psum(rho_local, axis)

        kfilter = calc._kspace_filter(cell, ns_mesh)
        potential_mesh = apply_kspace_filter(
            rho_mesh, kfilter, fft_norm="backward", ifft_norm="forward"
        )

        volume = jnp.abs(jnp.linalg.det(cell))
        energy = mesh_to_points(interp, potential_mesh) / volume
        energy = energy - q_shard * calc.potential.self_contribution()
        charge_tot = jnp.sum(charges_all, axis=0)
        energy = (
            energy - 2 * calc.potential.background_correction() * charge_tot / volume
        )
        return pot_r + energy / 2

    fn = shard_map(
        local,
        mesh=device_mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    out = fn(
        charges_p,
        cell,
        positions_p,
        positions_p,
        charges_p,
        neighbor_indices,
        neighbor_distances,
        pair_mask,
    )
    return out[:n_atoms]
