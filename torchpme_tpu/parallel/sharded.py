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
* **PME/P3M k-space** — **slab decomposition** along the first mesh axis.
  Atoms are bucketed by x-slab on the host (:func:`compute_slab_bucketing`,
  refreshed like a neighbor list); each device spreads its own atoms into its
  ``nx/D`` mesh slab plus a ``halo``-plane skirt, the skirts ride two
  :func:`jax.lax.ppermute` ring hops (periodic wrap included), and the
  reciprocal-space filter runs as a *distributed per-axis DFT*: z- and y-axis
  DFT matmuls are slab-local, and the x-axis contraction is made local by an
  ``all_to_all`` x↔y transpose (the standard distributed-FFT layout swap).
  Per-device collective volume is O(mesh/D) per ``all_to_all`` hop plus the
  O(halo) skirts — **no collective ever carries the full mesh** (the per-atom
  (N, C) result psum is the only global reduction, and it is O(atoms), not
  O(mesh)).

All collectives are XLA collectives inserted by ``shard_map``; gradients flow
through them (``psum`` transposes to broadcast, ``ppermute``/``all_to_all``
to their inverse permutations), so forces/stress work on the sharded path
too.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..ops.math import inv3
import numpy as np
from jax import Array, lax
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..ops.kspace import _dft_matrices, _full_dft_matrices
from ..ops.kvectors import generate_kvectors_for_ewald
from ..ops.mesh import compute_1d_weights

__all__ = [
    "SlabBucketing",
    "compute_slab_bucketing",
    "pad_to_multiple",
    "sharded_ewald_potentials",
    "sharded_mesh_potentials",
]


def pad_to_multiple(array, multiple: int, axis: int = 0, fill=0):
    """Right-pad ``array`` along ``axis`` to a multiple of ``multiple``.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> pad_to_multiple(jnp.ones((5, 2)), 4).shape
    (8, 2)
    """
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


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SlabBucketing:
    """Host-computed assignment of atoms to x-slabs of the density mesh.

    Refreshed like a neighbor list: the assignment stays valid while every
    atom's interpolation stencil fits inside its slab plus the ``halo`` skirt;
    drift beyond that is detected on-device and poisons the result with NaN
    (the same observable-failure contract as the tiled mesh backend).
    """

    atom_index: Array  # (n_devices, capacity) int32 global atom ids
    slot_mask: Array  # (n_devices, capacity) bool, False for padding
    ns: tuple[int, int, int] = field(metadata=dict(static=True))
    halo: int = field(metadata=dict(static=True))


def compute_slab_bucketing(
    positions,
    cell,
    ns_mesh,
    n_devices: int,
    interpolation_nodes: int,
    capacity: int | None = None,
) -> SlabBucketing:
    """Bucket atoms by mesh x-slab for :func:`sharded_mesh_potentials`.

    Host-side and eager (like :func:`~torchpme_tpu.utils.neighbors.neighbor_list`);
    the returned pytree is reusable across jitted steps until atoms drift out
    of their slab's stencil window.
    """
    ns_mesh = tuple(int(n) for n in ns_mesh)
    nx = ns_mesh[0]
    if nx % n_devices:
        raise ValueError(
            f"mesh x-size {nx} must be divisible by the {n_devices}-device axis"
        )
    block = nx // n_devices
    # stencil half-width plus one plane of slack for host/device float
    # disagreement at slab boundaries
    halo = int(interpolation_nodes) // 2 + 2
    if halo > block:
        raise ValueError(
            f"slab of {block} planes is thinner than the {halo}-plane stencil "
            f"halo; use a finer mesh or fewer devices along this axis"
        )
    pos = np.asarray(positions, dtype=np.float64)
    inv = np.linalg.inv(np.asarray(cell, dtype=np.float64))
    frac_x = (pos @ inv)[:, 0]
    frac_x -= np.floor(frac_x)
    slab = np.minimum((frac_x * n_devices).astype(np.int64), n_devices - 1)

    counts = np.bincount(slab, minlength=n_devices)
    if capacity is None:
        capacity = max(8, int(-(-counts.max() // 8) * 8))
    elif counts.max() > capacity:
        raise ValueError(
            f"capacity {capacity} below the fullest slab ({counts.max()} atoms)"
        )
    order = np.argsort(slab, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank_in_slab = np.arange(pos.shape[0]) - starts[slab[order]]

    atom_index = np.zeros((n_devices, capacity), dtype=np.int32)
    slot_mask = np.zeros((n_devices, capacity), dtype=bool)
    atom_index[slab[order], rank_in_slab] = order
    slot_mask[slab[order], rank_in_slab] = True
    return SlabBucketing(
        jnp.asarray(atom_index), jnp.asarray(slot_mask), ns_mesh, halo
    )


def _slab_stencil(pos_local, mask, inverse_cell, ns, nodes, method, rank, block, halo):
    """Stencil indices/weights of a slab's atoms on its extended local mesh.

    Same math as :func:`~torchpme_tpu.ops.mesh.compute_interpolation`, except
    the x axis is *not* wrapped: indices are rebased onto the device-local
    ``block + 2·halo`` plane window (periodic wrap is realized by the halo
    ring exchange instead).  Returns ``(linear_indices, weights, valid)``
    where ``valid`` is False if any real atom's stencil escapes the window.
    """
    nx, ny, nz = ns
    ext = block + 2 * halo
    dtype = pos_local.dtype
    frac = jnp.matmul(pos_local, inverse_cell, precision="highest")
    frac = frac - jnp.floor(frac)  # wrap into the cell (zero-gradient shift)
    rel = frac * jnp.asarray(ns, dtype=dtype)

    if nodes % 2 == 0:
        base_idx = jnp.floor(rel).astype(jnp.int32)
        offsets = rel - (base_idx + 0.5)
    else:
        base_idx = jnp.round(rel).astype(jnp.int32)
        offsets = rel - base_idx

    weights_1d = compute_1d_weights(offsets, nodes, method)  # (nodes, cap, 3)
    shifts = np.arange(1 - (nodes + 1) // 2, 1 + nodes // 2)
    shifts_j = jnp.asarray(shifts, dtype=jnp.int32)[:, None]

    # x: rebase onto the local window, NO wrap (halo exchange handles it)
    local_x = base_idx[None, :, 0] + shifts_j - rank * block + halo  # (nodes, cap)
    in_window = (local_x >= 0) & (local_x < ext)
    valid = jnp.all(in_window | ~mask[None, :])
    # y, z: periodic wrap as usual
    ns_j = jnp.asarray(ns, dtype=jnp.int32)
    iy_all = (base_idx[None, :, 1] + shifts_j) % ns_j[1]
    iz_all = (base_idx[None, :, 2] + shifts_j) % ns_j[2]
    lx_all = jnp.clip(local_x, 0, ext - 1)

    sa, sb, sc = np.meshgrid(
        np.arange(nodes), np.arange(nodes), np.arange(nodes), indexing="ij"
    )
    sa, sb, sc = sa.ravel(), sb.ravel(), sc.ravel()
    linear = (lx_all[sa] * ny + iy_all[sb]) * nz + iz_all[sc]  # (nodes³, cap)
    combined = (
        weights_1d[sa, :, 0] * weights_1d[sb, :, 1] * weights_1d[sc, :, 2]
    ) * mask[None, :].astype(dtype)
    return linear, combined, valid


def _dft_filter_sharded(interior, kfilter_local, axis: str, n_dev: int):
    """Distributed reciprocal filter: slab-local z/y DFT matmuls, an
    ``all_to_all`` x↔y transpose to localize the x-axis contraction, filter
    multiply on the (x-full, y-sharded) spectrum, and the mirrored inverse.
    Per-device communication is O(mesh/n_dev) per transpose."""
    dtype = interior.dtype
    block, ny, nz = interior.shape[-3:]
    Pr = "highest"

    crz, srz = _dft_matrices(nz, dtype)
    re = jnp.einsum("cxyz,zk->cxyk", interior, crz, precision=Pr)
    im = jnp.einsum("cxyz,zk->cxyk", interior, srz, precision=Pr)

    cfy, sfy = _full_dft_matrices(ny, dtype, -1)
    re, im = (
        jnp.einsum("cxyk,yw->cxwk", re, cfy, precision=Pr)
        - jnp.einsum("cxyk,yw->cxwk", im, sfy, precision=Pr),
        jnp.einsum("cxyk,yw->cxwk", re, sfy, precision=Pr)
        + jnp.einsum("cxyk,yw->cxwk", im, cfy, precision=Pr),
    )

    # layout swap: (C, nx/D, ny, kz) → (C, nx, ny/D, kz)
    re = lax.all_to_all(re, axis, split_axis=2, concat_axis=1, tiled=True)
    im = lax.all_to_all(im, axis, split_axis=2, concat_axis=1, tiled=True)

    nx = block * n_dev
    cfx, sfx = _full_dft_matrices(nx, dtype, -1)
    re, im = (
        jnp.einsum("cxwk,xu->cuwk", re, cfx, precision=Pr)
        - jnp.einsum("cxwk,xu->cuwk", im, sfx, precision=Pr),
        jnp.einsum("cxwk,xu->cuwk", re, sfx, precision=Pr)
        + jnp.einsum("cxwk,xu->cuwk", im, cfx, precision=Pr),
    )

    re = re * kfilter_local
    im = im * kfilter_local

    cix, six = _full_dft_matrices(nx, dtype, +1)
    re, im = (
        jnp.einsum("cuwk,ux->cxwk", re, cix, precision=Pr)
        - jnp.einsum("cuwk,ux->cxwk", im, six, precision=Pr),
        jnp.einsum("cuwk,ux->cxwk", re, six, precision=Pr)
        + jnp.einsum("cuwk,ux->cxwk", im, cix, precision=Pr),
    )

    # swap back: (C, nx, ny/D, kz) → (C, nx/D, ny, kz)
    re = lax.all_to_all(re, axis, split_axis=1, concat_axis=2, tiled=True)
    im = lax.all_to_all(im, axis, split_axis=1, concat_axis=2, tiled=True)

    ciy, siy = _full_dft_matrices(ny, dtype, +1)
    re, im = (
        jnp.einsum("cxwk,wy->cxyk", re, ciy, precision=Pr)
        - jnp.einsum("cxwk,wy->cxyk", im, siy, precision=Pr),
        jnp.einsum("cxwk,wy->cxyk", re, siy, precision=Pr)
        + jnp.einsum("cxwk,wy->cxyk", im, ciy, precision=Pr),
    )
    crzi, srzi = _dft_matrices(nz, dtype, inverse=True)
    return jnp.einsum("cxyk,kz->cxyz", re, crzi, precision=Pr) - jnp.einsum(
        "cxyk,kz->cxyz", im, srzi, precision=Pr
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
    slab_bucketing: SlabBucketing | None = None,
) -> Array:
    """PME/P3M per-atom potentials, SPMD over ``device_mesh[axis]``.

    Slab-decomposed along the first mesh axis (see the module docstring):
    each device spreads only its own atoms into its ``nx/D`` plane slab plus
    halo skirts, halos ride ``ppermute`` ring hops, the reciprocal filter is
    a distributed per-axis DFT with ``all_to_all`` transposes, and the gather
    back reads its own slab plus ppermute-fetched halo planes.  No collective
    carries the full mesh.  Returns the same values as ``calc(...)``
    single-device.

    ``slab_bucketing`` is the atom→slab assignment from
    :func:`compute_slab_bucketing`; reuse it across jitted MD steps like a
    neighbor list (computed automatically in eager calls).  Stale bucketings
    (atoms drifted past the halo) poison the result with NaN instead of
    returning silently wrong values.

    Requires ``nx`` and ``ny`` divisible by the axis size (power-of-two
    meshes on 2^k devices always satisfy this).
    """
    n_dev = device_mesh.shape[axis]
    n_atoms = charges.shape[0]
    ns_mesh = tuple(int(n) for n in ns_mesh)
    nx, ny, nz = ns_mesh
    if nx % n_dev or ny % n_dev:
        raise ValueError(
            f"mesh sizes nx={nx}, ny={ny} must be divisible by the "
            f"{n_dev}-device '{axis}' axis for the slab-sharded pipeline"
        )
    block = nx // n_dev

    if slab_bucketing is None:
        import jax.core as _core

        if isinstance(positions, _core.Tracer):
            raise ValueError(
                "sharded_mesh_potentials under jit needs a precomputed "
                "`slab_bucketing` (compute it eagerly with "
                "compute_slab_bucketing, and refresh it like a neighbor list)"
            )
        slab_bucketing = compute_slab_bucketing(
            positions, cell, ns_mesh, n_dev, calc.interpolation_nodes
        )
    if slab_bucketing.ns != ns_mesh:
        raise ValueError(
            f"slab_bucketing was built for mesh {slab_bucketing.ns}, got {ns_mesh}"
        )
    halo = slab_bucketing.halo

    neighbor_indices = pad_to_multiple(neighbor_indices, n_dev)
    if pair_mask is None:
        pair_mask = jnp.arange(neighbor_indices.shape[0]) < neighbor_distances.shape[0]
    else:
        pair_mask = pad_to_multiple(pair_mask, n_dev, fill=False)
    neighbor_distances = pad_to_multiple(neighbor_distances, n_dev, fill=1.0)

    # per-slab atom data, gathered on the replicated inputs
    pos_b = positions[slab_bucketing.atom_index]  # (D, cap, 3)
    q_b = charges[slab_bucketing.atom_index] * slab_bucketing.slot_mask[..., None]

    kfilter = calc._kspace_filter(cell, ns_mesh)  # (nx, ny, kz)
    nodes = calc.interpolation_nodes
    method = calc._method
    right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def local(charges_all, cell, pos_shard, q_shard, idx_map, mask, kf_local,
              idx, dist, pmask):
        rank = lax.axis_index(axis)
        pos_shard, q_shard = pos_shard[0], q_shard[0]
        idx_map, mask = idx_map[0], mask[0]

        pot_r = _rspace_partial(calc, charges_all, idx, dist, pmask, axis)

        inverse_cell = inv3(cell)
        linear, weights, valid = _slab_stencil(
            pos_shard, mask, inverse_cell, ns_mesh, nodes, method,
            rank, block, halo,
        )
        # a stale bucketing on ANY device corrupts halos globally: AND-reduce
        valid = lax.psum(1 - valid.astype(jnp.int32), axis) == 0

        # spread into the extended local slab: (C, block + 2·halo, ny, nz)
        n_channels = q_shard.shape[1]
        ext = block + 2 * halo
        values = (q_shard.T[:, None, :] * weights[None]).reshape(n_channels, -1)
        rho_ext = jnp.zeros((n_channels, ext * ny * nz), dtype=q_shard.dtype)
        rho_ext = rho_ext.at[:, linear.reshape(-1)].add(values)
        rho_ext = rho_ext.reshape(n_channels, ext, ny, nz)

        # fold the halo skirts into the neighbors' interiors (periodic ring)
        from_left = lax.ppermute(rho_ext[:, ext - halo:], axis, right)
        from_right = lax.ppermute(rho_ext[:, :halo], axis, left)
        interior = rho_ext[:, halo : halo + block]
        interior = interior.at[:, :halo].add(from_left)
        interior = interior.at[:, block - halo :].add(from_right)

        pot_interior = _dft_filter_sharded(interior, kf_local, axis, n_dev)

        # gather needs the neighbors' edge planes: fetch halo skirts
        halo_left = lax.ppermute(pot_interior[:, block - halo :], axis, right)
        halo_right = lax.ppermute(pot_interior[:, :halo], axis, left)
        pot_ext = jnp.concatenate([halo_left, pot_interior, halo_right], axis=1)

        flat = pot_ext.reshape(n_channels, -1)
        gathered = flat[:, linear]  # (C, nodes³, cap)
        energies = jnp.sum(gathered * weights[None], axis=1).T  # (cap, C)
        energies = energies * jnp.where(valid, 1.0, jnp.nan)

        # back to global atom order: O(atoms) scatter + psum, not O(mesh)
        mesh_pot = jnp.zeros((n_atoms, n_channels), dtype=energies.dtype)
        mesh_pot = mesh_pot.at[idx_map].add(energies * mask[:, None])
        mesh_pot = lax.psum(mesh_pot, axis)

        volume = jnp.abs(jnp.linalg.det(cell))
        energy = mesh_pot / volume
        energy = energy - charges_all * calc.potential.self_contribution()
        charge_tot = jnp.sum(charges_all, axis=0)
        energy = (
            energy - 2 * calc.potential.background_correction() * charge_tot / volume
        )
        return pot_r + energy / 2

    fn = shard_map(
        local,
        mesh=device_mesh,
        in_specs=(
            P(), P(), P(axis), P(axis), P(axis), P(axis),
            P(None, axis, None), P(axis), P(axis), P(axis),
        ),
        out_specs=P(),
    )
    return fn(
        charges,
        cell,
        pos_b,
        q_b,
        slab_bucketing.atom_index,
        slab_bucketing.slot_mask,
        kfilter,
        neighbor_indices,
        neighbor_distances,
        pair_mask,
    )
