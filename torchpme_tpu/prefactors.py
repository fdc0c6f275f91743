"""Unit-system prefactors converting from Gaussian units.

Counterpart of ``/root/reference/src/torchpme/prefactors.py``; pass one of
these as the ``prefactor`` of any potential.

Example
-------
>>> from torchpme_tpu import CoulombPotential, prefactors
>>> import jax.numpy as jnp
>>> pot = CoulombPotential(prefactor=prefactors.eV_A)
>>> print(f"{float(pot.from_dist(jnp.asarray(1.0))):.4f}")  # eV at r = 1 Å
14.3996
"""

#: Conversion factor from Gaussian units to SI units
SI = 2.3070775523417355e-28

#: Conversion factor from Gaussian units to electron volts / Angstroms
eV_A = 14.399645478425667

#: Conversion factor from Gaussian units to kilocalories per mole / Angstroms
kcalmol_A = 332.0637132991921

#: Conversion factor from Gaussian units to kilojoules per mole / Angstroms
kJmol = 1389.3545764438197
