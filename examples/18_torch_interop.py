"""Calling torchpme_tpu from PyTorch code.

A codebase built on the reference torch-pme calls a ``torch.nn.Module``
and backpropagates through the per-atom potentials for forces.
``TorchCalculator`` keeps that exact calling convention — same argument
order, same gradients — while the math runs jit-compiled in JAX (on the
TPU when one is attached).  ``jax2torch`` does the same for arbitrary
scalar-output JAX functions, so custom energy expressions written in JAX
slot into a torch training loop.
"""

import numpy as np
import torch

import jax

jax.config.update("jax_enable_x64", True)

import torchpme_tpu as tpme
from torchpme_tpu.interop.torch_bridge import TorchCalculator, jax2torch
from torchpme_tpu.utils.neighbors import neighbor_list

# CsCl crystal: the Madelung constant is the oracle
positions = np.array([[0.0, 0, 0], [0.5, 0.5, 0.5]])
cell = np.eye(3)
idx, dist, _ = neighbor_list(positions, cell, cutoff=2.0)

calc = TorchCalculator(
    tpme.PMECalculator(tpme.CoulombPotential(smearing=0.4), mesh_spacing=0.05)
)

# the torch side: tensors with requires_grad, exactly as with torch-pme
charges = torch.tensor([[-1.0], [1.0]], dtype=torch.float64, requires_grad=True)
pos_t = torch.as_tensor(positions).clone().requires_grad_(True)
dist_t = torch.as_tensor(dist).clone().requires_grad_(True)

potential = calc(
    charges, torch.as_tensor(cell), pos_t, torch.as_tensor(idx), dist_t
)
energy = torch.sum(potential * charges)
energy.backward()

madelung = -float(energy.detach())  # CsCl: 2.035361...
print(f"torch-side PME energy:   {-madelung:+.6f} (Madelung {madelung:.6f})")
print(f"dE/dq (torch autograd):  {charges.grad.flatten().tolist()}")
assert abs(madelung - 2.0353610945) < 1e-4
# charge gradient identity for a quadratic energy: dE/dq_i = 2 V_i
np.testing.assert_allclose(
    charges.grad.numpy(), 2 * potential.detach().numpy(), rtol=1e-10
)

# arbitrary JAX functions as torch autograd ops
import jax.numpy as jnp

soft_coulomb = jax2torch(lambda r, a: jnp.sum(1.0 / jnp.sqrt(r**2 + a**2)))
r = torch.linspace(0.5, 3.0, 8, dtype=torch.float64, requires_grad=True)
a = torch.tensor(0.2, dtype=torch.float64, requires_grad=True)
soft_coulomb(r, a).backward()
print(f"jax2torch gradients flow: dE/da = {float(a.grad):+.6f}")
assert torch.autograd.gradcheck(
    soft_coulomb, (r.detach().requires_grad_(True), a.detach().requires_grad_(True))
)
print("torch.autograd.gradcheck: PASS")
