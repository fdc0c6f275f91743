from .kspace import (
    KSpaceFilter,
    KSpaceKernel,
    P3MKSpaceFilter,
    apply_kspace_filter,
    compute_kspace_filter,
    p3m_influence_function,
)
from .kvectors import (
    compute_batched_kvectors,
    generate_kvectors_for_ewald,
    generate_kvectors_for_mesh,
    get_ns_ewald,
    get_ns_mesh,
)
from .math import CustomExp1, exp1, gamma, gammaincc_over_powerlaw
from .mesh import (
    MeshInterpolationWeights,
    MeshInterpolator,
    compute_1d_weights,
    compute_interpolation,
    mesh_to_points,
    mesh_xyz,
    points_to_mesh,
)
from .splines import (
    CubicSpline,
    CubicSplineReciprocal,
    compute_second_derivatives,
    compute_spline_ft,
    solve_tridiagonal,
)

__all__ = [
    "CustomExp1",
    "CubicSpline",
    "CubicSplineReciprocal",
    "KSpaceFilter",
    "KSpaceKernel",
    "MeshInterpolationWeights",
    "MeshInterpolator",
    "P3MKSpaceFilter",
    "apply_kspace_filter",
    "compute_1d_weights",
    "compute_batched_kvectors",
    "compute_interpolation",
    "compute_kspace_filter",
    "compute_second_derivatives",
    "compute_spline_ft",
    "exp1",
    "gamma",
    "gammaincc_over_powerlaw",
    "generate_kvectors_for_ewald",
    "generate_kvectors_for_mesh",
    "get_ns_ewald",
    "get_ns_mesh",
    "mesh_to_points",
    "mesh_xyz",
    "p3m_influence_function",
    "points_to_mesh",
    "solve_tridiagonal",
]
