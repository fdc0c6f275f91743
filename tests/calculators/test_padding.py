"""Masked/padded vmap batching ≡ per-system loop (parity with reference
``tests/calculators/test_padding.py``): systems of different sizes are padded
to common static shapes and batched with ``jax.vmap``; results must match the
unbatched loop on the valid entries."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import Calculator, CoulombPotential, EwaldCalculator
from torchpme_tpu.ops import compute_batched_kvectors

sys.path.append(str(Path(__file__).parents[1]))
from helpers import neighbor_list

LR_WAVELENGTH = 0.5


def make_systems():
    """Three CsCl-like boxes with different atom counts and cells."""
    rng = np.random.default_rng(77)
    systems = []
    for n_pairs, box in [(2, 4.0), (3, 5.0), (4, 6.0)]:
        n = 2 * n_pairs
        positions = rng.uniform(0.5, box - 0.5, (n, 3))
        charges = np.tile([1.0, -1.0], n_pairs).reshape(-1, 1)
        cell = np.eye(3) * box
        idx, dist, _ = neighbor_list(positions, cell, cutoff=1.9)
        systems.append((positions, charges, cell, idx, dist))
    return systems


def pad_systems(systems):
    """Right-pad to common static shapes with zero charges / masked pairs."""
    max_atoms = max(s[0].shape[0] for s in systems)
    max_pairs = max(s[3].shape[0] for s in systems)
    batch = {
        "positions": [],
        "charges": [],
        "cell": [],
        "idx": [],
        "dist": [],
        "node_mask": [],
        "pair_mask": [],
    }
    for positions, charges, cell, idx, dist in systems:
        n, p = positions.shape[0], idx.shape[0]
        batch["positions"].append(
            np.pad(positions, ((0, max_atoms - n), (0, 0)))
        )
        # zero charges make padded atoms invisible to both sums
        batch["charges"].append(np.pad(charges, ((0, max_atoms - n), (0, 0))))
        batch["cell"].append(cell)
        batch["idx"].append(np.pad(idx, ((0, max_pairs - p), (0, 0))))
        # padded distances must be nonzero to avoid 1/0 (masked out anyway)
        batch["dist"].append(np.pad(dist, (0, max_pairs - p), constant_values=1.0))
        batch["node_mask"].append(
            np.arange(max_atoms) < n
        )
        batch["pair_mask"].append(np.arange(max_pairs) < p)
    return {k: jnp.asarray(np.stack(v)) for k, v in batch.items()}, max_atoms


@pytest.mark.parametrize("calc_kind", ["direct", "ewald"])
def test_vmap_batch_equals_loop(calc_kind):
    systems = make_systems()
    batch, max_atoms = pad_systems(systems)

    if calc_kind == "direct":
        calc = Calculator(CoulombPotential())
        kvectors = None
    else:
        calc = EwaldCalculator(
            CoulombPotential(smearing=1.0), lr_wavelength=LR_WAVELENGTH
        )
        kvectors = compute_batched_kvectors(LR_WAVELENGTH, batch["cell"])

    def single(charges, cell, positions, idx, dist, node_mask, pair_mask, kvecs):
        return calc(
            charges,
            cell,
            positions,
            idx,
            dist,
            node_mask=node_mask,
            pair_mask=pair_mask,
            kvectors=kvecs,
        )

    in_axes = (0, 0, 0, 0, 0, 0, 0, 0 if kvectors is not None else None)
    batched = jax.vmap(single, in_axes=in_axes)(
        batch["charges"],
        batch["cell"],
        batch["positions"],
        batch["idx"],
        batch["dist"],
        batch["node_mask"],
        batch["pair_mask"],
        kvectors,
    )

    for b, (positions, charges, cell, idx, dist) in enumerate(systems):
        if calc_kind == "ewald":
            kv = calc.compute_kvectors(cell)
            ref = calc(
                jnp.asarray(charges),
                jnp.asarray(cell),
                jnp.asarray(positions),
                jnp.asarray(idx),
                jnp.asarray(dist),
                kvectors=kv,
            )
        else:
            ref = calc(
                jnp.asarray(charges),
                jnp.asarray(cell),
                jnp.asarray(positions),
                jnp.asarray(idx),
                jnp.asarray(dist),
            )
        n = positions.shape[0]
        np.testing.assert_allclose(
            np.asarray(batched[b, :n]), np.asarray(ref), atol=1e-5
        )
        # padded outputs are exactly zero thanks to node_mask
        np.testing.assert_allclose(np.asarray(batched[b, n:]), 0.0, atol=1e-12)


def test_vmap_batch_is_jittable():
    systems = make_systems()
    batch, _ = pad_systems(systems)
    calc = EwaldCalculator(CoulombPotential(smearing=1.0), lr_wavelength=LR_WAVELENGTH)
    kvectors = compute_batched_kvectors(LR_WAVELENGTH, batch["cell"])

    fn = jax.jit(
        jax.vmap(
            lambda q, c, p, i, d, nm, pm, kv: calc(
                q, c, p, i, d, node_mask=nm, pair_mask=pm, kvectors=kv
            )
        )
    )
    out = fn(
        batch["charges"],
        batch["cell"],
        batch["positions"],
        batch["idx"],
        batch["dist"],
        batch["node_mask"],
        batch["pair_mask"],
        kvectors,
    )
    assert np.all(np.isfinite(np.asarray(out)))
