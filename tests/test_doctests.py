"""Doctest every module of the package plus the README code blocks (parity
with the reference's CI doctest pass over all docstrings and README,
``tox.ini:42-44``)."""

import doctest
import importlib
import pkgutil
import re
from pathlib import Path

import pytest

import torchpme_tpu


def _walk_modules():
    names = ["torchpme_tpu"]
    for info in pkgutil.walk_packages(
        torchpme_tpu.__path__, prefix="torchpme_tpu."
    ):
        names.append(info.name)
    return sorted(names)


ALL_MODULES = _walk_modules()

# public modules that must carry at least one executable example
MUST_HAVE_EXAMPLES = [
    "torchpme_tpu.atomistic.calculator",
    "torchpme_tpu.calculators.calculator",
    "torchpme_tpu.calculators.dipole",
    "torchpme_tpu.calculators.ewald",
    "torchpme_tpu.calculators.p3m",
    "torchpme_tpu.calculators.pme",
    "torchpme_tpu.ops.kspace",
    "torchpme_tpu.ops.kvectors",
    "torchpme_tpu.ops.math",
    "torchpme_tpu.ops.mesh",
    "torchpme_tpu.ops.mesh_tiled",
    "torchpme_tpu.ops.rspace_cells",
    "torchpme_tpu.ops.splines",
    "torchpme_tpu.parallel.sharded",
    "torchpme_tpu.potentials.combined",
    "torchpme_tpu.potentials.coulomb",
    "torchpme_tpu.potentials.dipole",
    "torchpme_tpu.potentials.inverse_power_law",
    "torchpme_tpu.potentials.potential",
    "torchpme_tpu.potentials.spline",
    "torchpme_tpu.prefactors",
    "torchpme_tpu.tuning.ewald",
    "torchpme_tpu.tuning.p3m",
    "torchpme_tpu.tuning.pme",
    "torchpme_tpu.tuning.tuner",
    "torchpme_tpu.utils.neighbors",
]


@pytest.mark.parametrize("name", ALL_MODULES)
def test_module_doctests(name):
    module = importlib.import_module(name)
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0
    if name in MUST_HAVE_EXAMPLES:
        assert results.attempted > 0, f"no doctests collected in {name}"


def test_must_have_list_is_current():
    missing = [m for m in MUST_HAVE_EXAMPLES if m not in ALL_MODULES]
    assert not missing, f"stale entries in MUST_HAVE_EXAMPLES: {missing}"


def test_readme_code_blocks():
    """Execute every ```python block of the README top to bottom."""
    readme = (Path(__file__).parents[1] / "README.md").read_text()
    blocks = re.findall(r"```python\n(.*?)```", readme, flags=re.DOTALL)
    assert blocks, "README has no python code blocks"
    namespace = {}
    for block in blocks:
        exec(compile(block, "README.md", "exec"), namespace)
