"""Doctest the library docstrings (parity with the reference's CI doctest
pass over all docstrings, ``tox.ini:42-44``)."""

import doctest

import pytest

import torchpme_tpu
import torchpme_tpu.tuning.ewald
import torchpme_tpu.tuning.p3m
import torchpme_tpu.tuning.pme

MODULES = [
    torchpme_tpu.tuning.ewald,
    torchpme_tpu.tuning.pme,
    torchpme_tpu.tuning.p3m,
]


@pytest.mark.parametrize("module", MODULES, ids=lambda m: m.__name__)
def test_module_doctests(module):
    results = doctest.testmod(module, verbose=False)
    assert results.attempted > 0, f"no doctests collected in {module.__name__}"
    assert results.failed == 0
