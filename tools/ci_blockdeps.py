"""pytest plugin: make optional dependencies unimportable.

Simulates the ``tests-min`` tox env (minimal-deps install: no torch, no
orbax, no optax, no transformers) on a box where those packages ARE
installed — parity with the reference's ``tests-min`` CI env, which installs
the package without its optional extras.  Any package code that imports an
optional dependency unconditionally fails loudly here; tests that need one
``pytest.importorskip`` it and skip cleanly.

Usage:
    python -m pytest -p tools.ci_blockdeps tests/calculators -q
    python tools/ci_local.py min
"""

import importlib.abc
import sys

BLOCKED = ("torch", "orbax", "optax", "transformers", "accelerate", "haiku")


class _BlockOptionalDeps(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        root = fullname.split(".", 1)[0]
        if root in BLOCKED:
            raise ImportError(
                f"{fullname!r} is blocked by tools.ci_blockdeps "
                "(simulated minimal-deps install)"
            )
        return None


for _name in list(sys.modules):
    if _name.split(".", 1)[0] in BLOCKED:
        del sys.modules[_name]
sys.meta_path.insert(0, _BlockOptionalDeps())
