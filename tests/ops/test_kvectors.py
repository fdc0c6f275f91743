"""K-vector tests (parity with reference ``tests/lib/test_kvectors.py``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu.ops import (
    compute_batched_kvectors,
    generate_kvectors_for_ewald,
    generate_kvectors_for_mesh,
    get_ns_ewald,
    get_ns_mesh,
)


@pytest.fixture
def triclinic_cell():
    return jnp.asarray(
        np.array([[3.0, 0.0, 0.0], [1.1, 2.7, 0.0], [-0.4, 0.8, 2.2]])
    )


def test_get_ns_mesh_power_of_two():
    cell = jnp.eye(3) * 5.0
    ns = get_ns_mesh(cell, 0.5)
    assert all((n & (n - 1)) == 0 for n in ns)  # powers of two
    # 2·5/0.5 + 1 = 21 → next power of two = 32
    assert ns == (32, 32, 32)


def test_kvector_lattice_duality(triclinic_cell):
    """exp(i k · R) must be 1 for every lattice vector R (k on reciprocal lattice)."""
    ns = (4, 6, 5)
    for gen, reshape in [
        (generate_kvectors_for_ewald, lambda kv: kv),
        (generate_kvectors_for_mesh, lambda kv: kv.reshape(-1, 3)),
    ]:
        kv = reshape(gen(triclinic_cell, ns))
        phases = kv @ triclinic_cell.T  # k · a_i must be 2π × integer
        np.testing.assert_allclose(
            np.cos(np.asarray(phases)), 1.0, atol=1e-10
        )


def test_mesh_kvectors_shape_and_zero(triclinic_cell):
    ns = (4, 6, 8)
    kv = generate_kvectors_for_mesh(triclinic_cell, ns)
    assert kv.shape == (4, 6, 5, 3)
    np.testing.assert_allclose(kv[0, 0, 0], 0.0)


def test_ewald_kvectors_shape_and_zero(triclinic_cell):
    ns = (4, 6, 8)
    kv = generate_kvectors_for_ewald(triclinic_cell, ns)
    assert kv.shape == (4 * 6 * 8, 3)
    np.testing.assert_allclose(kv[0], 0.0)


def test_get_ns_ewald_counts():
    cell = jnp.eye(3) * 4.0
    # k_cutoff = 2π/λ, ns = ceil(k_cutoff·L/2π) = ceil(L/λ)
    assert get_ns_ewald(cell, 1.0) == (4, 4, 4)
    assert get_ns_ewald(cell, 1.5) == (3, 3, 3)


def test_batched_kvectors_padding():
    cells = jnp.stack([jnp.eye(3) * 2.0, jnp.eye(3) * 4.0])
    kv = compute_batched_kvectors(1.0, cells)
    assert kv.ndim == 3 and kv.shape[2] == 3
    # smaller cell has fewer k-vectors: padded region must be exactly zero
    n_small = int(np.prod(get_ns_ewald(cells[0], 1.0)))
    np.testing.assert_allclose(kv[0, n_small:], 0.0)


def test_traced_cell_raises_helpful_error():
    import jax

    cell = jnp.eye(3)
    with pytest.raises(ValueError, match="static under `jit`"):
        jax.jit(lambda c: get_ns_mesh(c, 0.5))(cell)
