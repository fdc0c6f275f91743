"""vmap batching of the MESH calculators — beyond-reference capability.

The reference raises NotImplementedError for batched mesh calculators
(``calculators/pme.py:102-105``); here a static shared ``ns_mesh`` makes
PME/P3M vmap-able (positions/charges/cells batched, same mesh shape)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import CoulombPotential, P3MCalculator, PMECalculator

sys.path.append(str(Path(__file__).parents[1]))
from helpers import neighbor_list


def make_batch(n_systems=3, n_atoms=12, box=5.0):
    rng = np.random.default_rng(11)
    positions, charges, idxs, dists = [], [], [], []
    max_pairs = 0
    raw = []
    for _ in range(n_systems):
        pos = rng.uniform(0.3, box - 0.3, (n_atoms, 3))
        q = np.tile([1.0, -1.0], n_atoms // 2).reshape(-1, 1)
        idx, dist, _ = neighbor_list(pos, np.eye(3) * box, cutoff=2.0)
        raw.append((pos, q, idx, dist))
        max_pairs = max(max_pairs, idx.shape[0])
    for pos, q, idx, dist in raw:
        p = idx.shape[0]
        positions.append(pos)
        charges.append(q)
        idxs.append(np.pad(idx, ((0, max_pairs - p), (0, 0))))
        dists.append(np.pad(dist, (0, max_pairs - p), constant_values=1.0))
    pair_mask = np.stack(
        [np.arange(max_pairs) < r[2].shape[0] for r in raw]
    )
    return (
        jnp.asarray(np.stack(positions)),
        jnp.asarray(np.stack(charges)),
        jnp.asarray(np.eye(3) * box),
        jnp.asarray(np.stack(idxs)),
        jnp.asarray(np.stack(dists)),
        jnp.asarray(pair_mask),
    )


@pytest.mark.parametrize("cls", [PMECalculator, P3MCalculator])
def test_mesh_calculator_vmap_equals_loop(cls):
    positions, charges, cell, idxs, dists, pair_mask = make_batch()
    calc = cls(CoulombPotential(smearing=0.6), mesh_spacing=0.3)
    ns = calc.get_ns_mesh(cell)

    batched = jax.vmap(
        lambda q, p, i, d, pm: calc(
            q, cell, p, i, d, pair_mask=pm, ns_mesh=ns
        )
    )(charges, positions, idxs, dists, pair_mask)

    for b in range(positions.shape[0]):
        ref = calc(
            charges[b], cell, positions[b], idxs[b], dists[b],
            pair_mask=pair_mask[b], ns_mesh=ns,
        )
        np.testing.assert_allclose(
            np.asarray(batched[b]), np.asarray(ref), atol=1e-10
        )


def test_mesh_calculator_vmap_jits():
    positions, charges, cell, idxs, dists, pair_mask = make_batch()
    calc = PMECalculator(CoulombPotential(smearing=0.6), mesh_spacing=0.3)
    ns = calc.get_ns_mesh(cell)
    fn = jax.jit(
        jax.vmap(
            lambda q, p, i, d, pm: calc(q, cell, p, i, d, pair_mask=pm, ns_mesh=ns)
        )
    )
    out = fn(charges, positions, idxs, dists, pair_mask)
    assert np.all(np.isfinite(np.asarray(out)))
