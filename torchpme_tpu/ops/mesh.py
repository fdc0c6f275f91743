"""Charge spreading onto a mesh and back-interpolation of mesh fields.

TPU-native counterpart of
``/root/reference/src/torchpme/lib/mesh_interpolator.py``.  Design differences:

* **Functional core.**  :func:`compute_interpolation` returns an immutable
  :class:`MeshInterpolationWeights` pytree; :func:`points_to_mesh` and
  :func:`mesh_to_points` are pure functions of it.  Spreading and gathering
  are exact transposes, so JAX's autodiff gives the force back-interpolation
  for free — no mutable cached state (the reference stores weights on the
  module, ``mesh_interpolator.py:71-79``).
* **Coefficient tables, not unrolled polynomials.**  The published P3M
  (Deserno & Holm, JCP 109, 7678 (1998)) and Lagrange (Essmann et al., JCP
  103, 8577 (1995)) 1D charge-assignment polynomials are evaluated as a single
  dense ``(nodes, nodes) @ (nodes, N·3)`` matmul over a power basis — an
  MXU-shaped contraction instead of ``nodes`` unrolled expressions
  (reference ``mesh_interpolator.py:156-301``).
* **Single linearized scatter/gather.**  The 3D stencil is flattened to one
  linear index per (stencil-point, atom) pair and accumulated with one XLA
  scatter-add (one gather on the way back), which XLA:TPU handles as a single
  fused kernel rather than ``n_channels`` sequential ``index_put_`` calls
  (reference ``mesh_interpolator.py:411-424``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .math import inv3
import numpy as np
from jax import Array

from .kvectors import get_ns_mesh  # noqa: F401  (re-exported convenience)

__all__ = [
    "DipoleInterpolationWeights",
    "MeshInterpolationWeights",
    "compute_1d_weights",
    "compute_1d_weight_derivatives",
    "compute_dipole_interpolation",
    "compute_interpolation",
    "dipoles_to_mesh",
    "mesh_to_dipole_field",
    "points_to_mesh",
    "mesh_to_points",
    "mesh_xyz",
    "MeshInterpolator",
]


def _weight_coefficients(method: str, nodes: int) -> np.ndarray:
    """Rows = stencil node, cols = ascending powers of the offset ``x``.

    P3M coefficients: Deserno & Holm table (JCP 109, 7678 (1998)); Lagrange
    coefficients: Essmann et al. (JCP 103, 8577 (1995)).  ``x`` lives in
    [-1/2, 1/2] relative to the stencil center.
    """
    if method == "P3M":
        tables = {
            1: [[1.0]],
            2: np.array([[1, -2], [1, 2]]) / 2,
            3: np.array([[1, -4, 4], [6, 0, -8], [1, 4, 4]]) / 8,
            4: np.array(
                [
                    [1, -6, 12, -8],
                    [23, -30, -12, 24],
                    [23, 30, -12, -24],
                    [1, 6, 12, 8],
                ]
            )
            / 48,
            5: np.array(
                [
                    [1, -8, 24, -32, 16],
                    [76, -176, 96, 64, -64],
                    [230, 0, -240, 0, 96],
                    [76, 176, 96, -64, -64],
                    [1, 8, 24, 32, 16],
                ]
            )
            / 384,
        }
        if nodes not in tables:
            raise ValueError(
                f"`interpolation_nodes` is {nodes} but only values "
                "from 1 to 5 for method 'P3M' are allowed"
            )
    elif method == "Lagrange":
        tables = {
            3: np.array([[0, -1, 1], [2, 0, -2], [0, 1, 1]]) / 2,
            4: np.array(
                [
                    [-3, 2, 12, -8],
                    [27, -54, -12, 24],
                    [27, 54, -12, -24],
                    [-3, -2, 12, 8],
                ]
            )
            / 48,
            5: np.array(
                [
                    [0, 2, -1, -2, 1],
                    [0, -16, 16, 4, -4],
                    [24, 0, -30, 0, 6],
                    [0, 16, 16, -4, -4],
                    [0, -2, -1, 2, 1],
                ]
            )
            / 24,
            6: np.array(
                [
                    [45, -18, -200, 80, 80, -32],
                    [-375, 250, 1560, -1040, -240, 160],
                    [2250, -4500, -1360, 2720, 160, -320],
                    [2250, 4500, -1360, -2720, 160, 320],
                    [-375, -250, 1560, 1040, -240, -160],
                    [45, 18, -200, -80, 80, 32],
                ]
            )
            / 3840,
            7: np.array(
                [
                    [0, -12, 4, 15, -5, -3, 1],
                    [0, 108, -54, -120, 60, 12, -6],
                    [0, -540, 540, 195, -195, -15, 15],
                    [720, 0, -980, 0, 280, 0, -20],
                    [0, 540, 540, -195, -195, 15, 15],
                    [0, -108, -54, 120, 60, -12, -6],
                    [0, 12, 4, -15, -5, 3, 1],
                ]
            )
            / 720,
        }
        if nodes not in tables:
            raise ValueError(
                f"`interpolation_nodes` is {nodes} but only values "
                "from 3 to 7 for method 'Lagrange' are allowed"
            )
    else:
        raise ValueError(
            f"method '{method}' is not supported. Choose from 'Lagrange' or 'P3M'"
        )
    return np.asarray(tables[nodes], dtype=np.float64)


def compute_1d_weights(x: Array, nodes: int, method: str) -> Array:
    """1D interpolation weights for relative offsets ``x`` in [-1/2, 1/2].

    :param x: offsets of any shape (typically ``(N, 3)``).
    :param nodes: static number of stencil nodes per axis.
    :param method: static ``"Lagrange"`` or ``"P3M"``.
    :return: weights of shape ``(nodes, *x.shape)``.
    """
    coeffs = jnp.asarray(_weight_coefficients(method, nodes), dtype=x.dtype)
    # power basis [1, x, x², ...]: (nodes, *x.shape)
    powers = jnp.stack([x**m for m in range(nodes)])
    return jnp.tensordot(coeffs, powers, axes=1, precision="highest")


from dataclasses import field as _field  # noqa: E402


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MeshInterpolationWeights:
    """Precomputed stencil for spreading/gathering a set of points.

    ``linear_indices``/``combined_weights`` have shape ``(nodes³, N)``: one
    flattened mesh index and the product of the three per-axis weights for
    every (stencil point, atom) pair.  ``ns`` is static mesh-shape metadata.
    """

    linear_indices: Array
    combined_weights: Array
    ns: tuple[int, int, int] = _field(metadata=dict(static=True), default=(1, 1, 1))


def compute_interpolation(
    positions: Array,
    inverse_cell: Array,
    ns: tuple[int, int, int],
    interpolation_nodes: int,
    method: str,
) -> MeshInterpolationWeights:
    """Stencil indices and weights for interpolating ``positions`` on a mesh.

    :param positions: ``(N, 3)`` Cartesian coordinates.
    :param inverse_cell: inverse of the ``(3, 3)`` cell matrix.
    :param ns: static mesh shape ``(nx, ny, nz)``.
    :param interpolation_nodes: static stencil size ``n`` per axis (``n³``
        mesh points receive weight from each particle).
    :param method: static ``"Lagrange"`` (PME) or ``"P3M"``.

    Grid centering follows the parity rule of the reference
    (``mesh_interpolator.py:329-341``): even-``n`` stencils center between the
    two nearest grid points, odd-``n`` stencils on the nearest grid point.
    """
    ns = tuple(int(n) for n in ns)
    nodes = int(interpolation_nodes)
    ns_arr = jnp.asarray(ns, dtype=positions.dtype)
    # fractional coords × mesh size; HIGHEST precision: bf16 coordinate
    # products would shift stencil offsets at TPU default matmul precision
    rel = (
        jnp.matmul(positions, inverse_cell, precision="highest") * ns_arr
    )

    if nodes % 2 == 0:
        base_idx = jnp.floor(rel).astype(jnp.int32)
        offsets = rel - (base_idx + 0.5)
    else:
        base_idx = jnp.round(rel).astype(jnp.int32)
        offsets = rel - base_idx

    weights_1d = compute_1d_weights(offsets, nodes, method)  # (nodes, N, 3)

    shifts = np.arange(1 - (nodes + 1) // 2, 1 + nodes // 2)
    idx = (base_idx[None, :, :] + jnp.asarray(shifts, dtype=jnp.int32)[:, None, None]) % jnp.asarray(ns, dtype=jnp.int32)

    # flatten the n×n×n stencil: sa/sb/sc enumerate the per-axis node choice
    sa, sb, sc = np.meshgrid(
        np.arange(nodes), np.arange(nodes), np.arange(nodes), indexing="ij"
    )
    sa, sb, sc = sa.ravel(), sb.ravel(), sc.ravel()

    ix = idx[sa, :, 0]  # (nodes³, N)
    iy = idx[sb, :, 1]
    iz = idx[sc, :, 2]
    linear = (ix * ns[1] + iy) * ns[2] + iz

    combined = (
        weights_1d[sa, :, 0] * weights_1d[sb, :, 1] * weights_1d[sc, :, 2]
    )  # (nodes³, N)
    return MeshInterpolationWeights(linear, combined, ns)


def points_to_mesh(
    interp: MeshInterpolationWeights, particle_weights: Array
) -> Array:
    """Spread per-particle weights onto the mesh (forward interpolation).

    :param particle_weights: ``(N, n_channels)`` charges per channel.
    :return: density mesh of shape ``(n_channels, nx, ny, nz)``.
    """
    if particle_weights.ndim != 2:
        raise ValueError(
            f"`particle_weights` of dimension {particle_weights.ndim} has to be "
            "of dimension 2"
        )
    nx, ny, nz = interp.ns
    n_channels = particle_weights.shape[1]
    # (C, nodes³·N) values scattered at (nodes³·N,) linear indices
    values = (
        particle_weights.T[:, None, :] * interp.combined_weights[None, :, :]
    ).reshape(n_channels, -1)
    flat_idx = interp.linear_indices.reshape(-1)
    mesh = jnp.zeros((n_channels, nx * ny * nz), dtype=particle_weights.dtype)
    mesh = mesh.at[:, flat_idx].add(values)
    return mesh.reshape(n_channels, nx, ny, nz)


def mesh_to_points(interp: MeshInterpolationWeights, mesh_vals: Array) -> Array:
    """Interpolate a mesh field back to the particle positions (transpose of
    :func:`points_to_mesh` with the same weights).

    :param mesh_vals: ``(n_channels, nx, ny, nz)`` field on the mesh.
    :return: ``(N, n_channels)`` interpolated values.
    """
    if mesh_vals.ndim != 4:
        raise ValueError(
            f"`mesh_vals` of dimension {mesh_vals.ndim} has to be of dimension 4"
        )
    n_channels = mesh_vals.shape[0]
    flat_mesh = mesh_vals.reshape(n_channels, -1)
    gathered = flat_mesh[:, interp.linear_indices]  # (C, nodes³, N)
    return jnp.sum(gathered * interp.combined_weights[None], axis=1).T


def compute_1d_weight_derivatives(x: Array, nodes: int, method: str) -> Array:
    """Derivatives ``dW/dx`` of the 1D interpolation weights at offsets ``x``.

    Same coefficient tables as :func:`compute_1d_weights`, analytically
    differentiated in the power basis (``d/dx Σ c_m x^m = Σ m·c_m x^{m-1}``).
    Shape ``(nodes, *x.shape)``.
    """
    coeffs = np.asarray(_weight_coefficients(method, nodes))
    dcoeffs = coeffs[:, 1:] * np.arange(1, nodes)
    dcoeffs = jnp.asarray(dcoeffs, dtype=x.dtype)
    if nodes == 1:
        return jnp.zeros((1, *x.shape), x.dtype)
    powers = jnp.stack([x**m for m in range(nodes - 1)])
    return jnp.tensordot(dcoeffs, powers, axes=1, precision="highest")


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DipoleInterpolationWeights:
    """Gradient stencil for spreading point DIPOLES onto a mesh.

    ``grad_weights[s, j, b]`` is :math:`\\partial W^{3D}_{s}(r_j)/\\partial
    r_{j,b}` — the Cartesian gradient of the combined 3D stencil weight, so
    the dipolar mesh density is :math:`Q(m) = \\sum_j \\vec\\mu_j\\cdot
    \\nabla_{r_j} W_j(m)` and the per-atom vector field gathers with the
    same stencil.  ``linear_indices`` as in :class:`MeshInterpolationWeights`.
    """

    linear_indices: Array
    grad_weights: Array  # (nodes³, N, 3)
    ns: tuple[int, int, int] = _field(metadata=dict(static=True), default=(1, 1, 1))


def compute_dipole_interpolation(
    positions: Array,
    inverse_cell: Array,
    ns: tuple[int, int, int],
    interpolation_nodes: int,
    method: str,
) -> DipoleInterpolationWeights:
    r"""Gradient-stencil indices and weights for dipolar mesh spreading.

    The chain rule through the fractional coordinates gives
    :math:`\partial W/\partial r_b = \sum_a \dot W_a W_{a'} W_{a''}\,
    (\text{inverse cell})_{ba}\, n_a` — evaluated with the same coefficient
    tables as the charge stencil plus their analytic derivatives.  No
    reference counterpart (the reference has no dipolar mesh method,
    ``/root/reference/src/torchpme/calculators/calculator_dipole.py`` is
    Ewald-only); this is the spread side of the dipolar PME.
    """
    ns = tuple(int(n) for n in ns)
    nodes = int(interpolation_nodes)
    ns_arr = jnp.asarray(ns, dtype=positions.dtype)
    rel = jnp.matmul(positions, inverse_cell, precision="highest") * ns_arr

    if nodes % 2 == 0:
        base_idx = jnp.floor(rel).astype(jnp.int32)
        offsets = rel - (base_idx + 0.5)
    else:
        base_idx = jnp.round(rel).astype(jnp.int32)
        offsets = rel - base_idx

    weights_1d = compute_1d_weights(offsets, nodes, method)  # (nodes, N, 3)
    dweights_1d = compute_1d_weight_derivatives(offsets, nodes, method)

    shifts = np.arange(1 - (nodes + 1) // 2, 1 + nodes // 2)
    idx = (
        base_idx[None, :, :]
        + jnp.asarray(shifts, dtype=jnp.int32)[:, None, None]
    ) % jnp.asarray(ns, dtype=jnp.int32)

    sa, sb, sc = np.meshgrid(
        np.arange(nodes), np.arange(nodes), np.arange(nodes), indexing="ij"
    )
    sa, sb, sc = sa.ravel(), sb.ravel(), sc.ravel()
    ix = idx[sa, :, 0]
    iy = idx[sb, :, 1]
    iz = idx[sc, :, 2]
    linear = (ix * ns[1] + iy) * ns[2] + iz

    wx, wy, wz = weights_1d[sa, :, 0], weights_1d[sb, :, 1], weights_1d[sc, :, 2]
    dx_, dy_, dz_ = (
        dweights_1d[sa, :, 0],
        dweights_1d[sb, :, 1],
        dweights_1d[sc, :, 2],
    )
    # ∂W3D/∂rel_a, then chain through rel = (pos @ inv_cell) ⊙ ns
    grad_rel = jnp.stack(
        [dx_ * wy * wz, wx * dy_ * wz, wx * wy * dz_], axis=-1
    )  # (nodes³, N, 3) in fractional-mesh units
    grad_pos = jnp.einsum(
        "sna,ba,a->snb",
        grad_rel,
        inverse_cell,
        ns_arr,
        precision="highest",
    )
    return DipoleInterpolationWeights(linear, grad_pos, ns)


def dipoles_to_mesh(interp: DipoleInterpolationWeights, dipoles: Array) -> Array:
    r"""Spread point dipoles onto the mesh as a gradient density.

    :param dipoles: ``(N, 3)`` point dipoles.
    :return: dipolar density mesh ``(1, nx, ny, nz)`` with
        :math:`Q(m) = \sum_j \vec\mu_j\cdot\nabla_{r_j} W_j(m)` (its
        Fourier transform is :math:`-i\,\hat w(k)\,S(k)` with
        :math:`S(k) = \sum_j (\vec\mu_j\cdot\vec k)\,e^{-ik\cdot r_j}`,
        so the scalar Parseval machinery applies unchanged).
    """
    nx, ny, nz = interp.ns
    values = jnp.einsum(
        "snb,nb->sn", interp.grad_weights, dipoles, precision="highest"
    ).reshape(-1)
    flat_idx = interp.linear_indices.reshape(-1)
    mesh = jnp.zeros((nx * ny * nz,), dtype=dipoles.dtype)
    mesh = mesh.at[flat_idx].add(values)
    return mesh.reshape(1, nx, ny, nz)


def mesh_to_dipole_field(
    interp: DipoleInterpolationWeights, mesh_vals: Array
) -> Array:
    """Gather the filtered mesh back to per-atom VECTOR fields (transpose of
    :func:`dipoles_to_mesh` in the dipole argument).

    :param mesh_vals: ``(1, nx, ny, nz)`` filtered mesh.
    :return: ``(N, 3)`` per-atom field ``g_i = Σ_s ∇W_{s,i} · mesh[idx]``
        with ``Σ_i μ_i·g_i == Σ_m Q·mesh`` exactly.
    """
    flat_mesh = mesh_vals.reshape(-1)
    gathered = flat_mesh[interp.linear_indices]  # (nodes³, N)
    return jnp.einsum(
        "sn,snb->nb", gathered, interp.grad_weights, precision="highest"
    )


def mesh_xyz(cell: Array, ns: tuple[int, int, int]) -> Array:
    """Cartesian coordinates of the mesh points, shape ``(nx, ny, nz, 3)``."""
    fracs = [jnp.arange(n, dtype=cell.dtype) / n for n in ns]
    grid = jnp.stack(jnp.meshgrid(*fracs, indexing="ij"), axis=-1)
    return jnp.matmul(grid, cell, precision="highest")


class MeshInterpolator:
    """Stateful convenience shell over the functional mesh-interpolation core.

    Mirrors the reference class API (``update`` / ``compute_weights`` /
    ``points_to_mesh`` / ``mesh_to_points`` / ``get_mesh_xyz``,
    ``mesh_interpolator.py:4-457``) for eager and exploratory use (e.g. LODE
    feature pipelines).  Jitted calculator internals use the pure functions
    directly.

    Example
    -------
    Spreading conserves total charge for every interpolation order:

    >>> import jax.numpy as jnp
    >>> mi = MeshInterpolator(jnp.eye(3) * 4.0, (8, 8, 8),
    ...                       interpolation_nodes=4, method="Lagrange")
    >>> _ = mi.compute_weights(jnp.asarray([[0.3, 1.7, 2.2], [3.1, 0.4, 1.1]]))
    >>> rho = mi.points_to_mesh(jnp.asarray([[1.0], [-2.0]]))
    >>> print(f"{float(jnp.sum(rho)):.6f}")
    -1.000000
    """

    def __init__(
        self,
        cell: Array,
        ns_mesh,
        interpolation_nodes: int,
        method: str,
    ):
        _weight_coefficients(method, interpolation_nodes)  # validate eagerly
        self.method = method
        self.interpolation_nodes = int(interpolation_nodes)
        self._interp: MeshInterpolationWeights | None = None
        self.update(cell, ns_mesh)

    def update(self, cell: Array | None = None, ns_mesh=None) -> None:
        """Refresh the cell and/or mesh shape this interpolator targets."""
        if cell is not None:
            cell = jnp.asarray(cell)
            if cell.shape != (3, 3):
                raise ValueError(
                    f"cell of shape {list(cell.shape)} should be of shape (3, 3)"
                )
            self.cell = cell
            self.inverse_cell = inv3(cell)
        if ns_mesh is not None:
            ns_tuple = tuple(int(n) for n in np.asarray(ns_mesh).reshape(-1))
            if len(ns_tuple) != 3:
                raise ValueError(
                    f"shape {[len(ns_tuple)]} of `ns_mesh` has to be (3,)"
                )
            self.ns_mesh = ns_tuple

    def get_mesh_xyz(self) -> Array:
        """Cartesian positions of the mesh points, ``(nx, ny, nz, 3)``."""
        return mesh_xyz(self.cell, self.ns_mesh)

    def compute_weights(self, positions: Array) -> MeshInterpolationWeights:
        if positions.ndim != 2 or positions.shape[1] != 3:
            raise ValueError(
                f"shape {list(positions.shape)} of `positions` has to be (N, 3)"
            )
        self._interp = compute_interpolation(
            positions,
            self.inverse_cell,
            self.ns_mesh,
            self.interpolation_nodes,
            self.method,
        )
        return self._interp

    def points_to_mesh(self, particle_weights: Array) -> Array:
        if self._interp is None:
            raise ValueError("Call `compute_weights` before `points_to_mesh`.")
        return points_to_mesh(self._interp, particle_weights)

    def mesh_to_points(self, mesh_vals: Array) -> Array:
        if self._interp is None:
            raise ValueError("Call `compute_weights` before `mesh_to_points`.")
        return mesh_to_points(self._interp, mesh_vals)
