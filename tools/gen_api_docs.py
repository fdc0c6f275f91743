"""Generate docs/api.md — a dependency-free API reference.

The reference ships a sphinx site; this environment has no sphinx (and no
package installs), so the API reference is generated from the live
docstrings with the standard library instead and committed as markdown.
Regenerate after API changes:

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/gen_api_docs.py
"""

from __future__ import annotations

import inspect
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

MODULES = [
    ("torchpme_tpu", "Package root — public surface re-exports"),
    ("torchpme_tpu.potentials", "Pair potentials (pytree dataclasses)"),
    ("torchpme_tpu.calculators", "Calculators: direct, Ewald, PME, P3M, dipolar"),
    ("torchpme_tpu.md", "Bucket-order MD states (zero-gather steps)"),
    ("torchpme_tpu.ops.rspace_cells", "Cell-list real-space window engine"),
    ("torchpme_tpu.ops.rspace_cells_dipole", "Dipolar window engine"),
    ("torchpme_tpu.ops.mesh", "Generic mesh interpolation (scatter path)"),
    ("torchpme_tpu.ops.mesh_tiled", "Tile-GEMM mesh backend"),
    ("torchpme_tpu.ops.pallas.mesh_pallas", "Pallas mesh kernels (three-kernel form)"),
    ("torchpme_tpu.ops.pallas.spread_fused", "Fused position→mesh Pallas spread"),
    ("torchpme_tpu.ops.kspace", "K-space filters (FFT / DFT-by-matmul / Parseval)"),
    ("torchpme_tpu.ops.kvectors", "K-vector generation"),
    ("torchpme_tpu.ops.splines", "Cubic splines + radial Fourier transforms"),
    ("torchpme_tpu.ops.math", "Special functions (gamma, exp1, ...)"),
    ("torchpme_tpu.tuning", "Parameter tuning (error bounds, timings)"),
    ("torchpme_tpu.parallel.sharded", "Slab-sharded distributed calculators"),
    ("torchpme_tpu.parallel.sharded_md", "Slab-sharded MD fast path"),
    ("torchpme_tpu.atomistic", "Labeled System/NeighborList bindings"),
    ("torchpme_tpu.utils.neighbors", "Host neighbor lists, distances"),
    ("torchpme_tpu.utils.validation", "Input validation"),
    ("torchpme_tpu.deploy", "jax.export serialization"),
    ("torchpme_tpu.interop.torch_bridge", "PyTorch autograd bridge"),
    ("torchpme_tpu.prefactors", "Unit-system prefactors"),
]


def first_paragraph(doc: str | None) -> str:
    if not doc:
        return "*(no docstring)*"
    paras = inspect.cleandoc(doc).split("\n\n")
    return paras[0].replace("\n", " ")


def signature_of(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def document_module(name: str, blurb: str) -> list[str]:
    import importlib

    mod = importlib.import_module(name)
    out = [f"## `{name}`\n", f"{blurb}.\n"]
    doc = first_paragraph(mod.__doc__)
    if doc != "*(no docstring)*":
        out.append(doc + "\n")
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [
            n for n, o in vars(mod).items()
            if not n.startswith("_")
            and getattr(o, "__module__", None) == name
            and (inspect.isclass(o) or inspect.isfunction(o))
        ]
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None:
            continue
        if inspect.isclass(obj):
            out.append(f"### `{n}`\n")
            out.append(first_paragraph(obj.__doc__) + "\n")
            for mn, m in sorted(vars(obj).items()):
                if mn.startswith("_") and mn != "__call__":
                    continue
                if inspect.isfunction(m) or isinstance(m, classmethod):
                    f = m.__func__ if isinstance(m, classmethod) else m
                    out.append(
                        f"- **`{n}.{mn}{signature_of(f)}`** — "
                        f"{first_paragraph(f.__doc__)}"
                    )
            out.append("")
        elif inspect.isfunction(obj):
            out.append(f"### `{n}{signature_of(obj)}`\n")
            out.append(first_paragraph(obj.__doc__) + "\n")
    return out


def main():
    lines = [
        "# API reference\n",
        "*Generated from the live docstrings by `tools/gen_api_docs.py`; "
        "rendered into the HTML site by `tools/build_docs.py` "
        "(`docs/html/api.html`). Every docstring is doctested "
        "(`tests/test_doctests.py`), so this reference cannot drift from "
        "the code.*\n",
    ]
    for name, blurb in MODULES:
        lines.extend(document_module(name, blurb))
    out = Path(__file__).parents[1] / "docs" / "api.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out} ({len(lines)} blocks)")


if __name__ == "__main__":
    main()
