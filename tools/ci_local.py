"""Offline CI runner: the tox env matrix without virtualenvs.

The development box has no network egress, so tox cannot build its envs;
this runs the same two test selections against the ambient interpreter:

    python tools/ci_local.py        # both envs
    python tools/ci_local.py full   # full suite (warnings-as-errors per
                                    # pyproject, CPU backend per conftest)
    python tools/ci_local.py min    # minimal-deps simulation: torch/orbax/
                                    # optax/transformers import-blocked
                                    # (tools.ci_blockdeps), core oracles only

Exit status is nonzero if any selected env fails — usable as a pre-merge
gate.  The real multi-OS matrix lives in tox.ini / .github/workflows.
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

ENVS = {
    "full": [sys.executable, "-m", "pytest", "tests", "-q"],
    "min": [
        sys.executable,
        "-m",
        "pytest",
        "-p",
        "tools.ci_blockdeps",
        "tests/calculators",
        "tests/potentials",
        "tests/tuning",
        "tests/ops",
        "-q",
    ],
}


def main() -> int:
    which = sys.argv[1:] or list(ENVS)
    rc = 0
    for name in which:
        cmd = ENVS[name]
        print(f"== ci_local env '{name}': {' '.join(cmd[1:])}", flush=True)
        # the min env must also prove a bare import works with deps blocked
        if name == "min":
            probe = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import tools.ci_blockdeps, torchpme_tpu; "
                    "print('import OK without optional deps')",
                ],
                cwd=ROOT,
            )
            rc |= probe.returncode
        rc |= subprocess.run(cmd, cwd=ROOT).returncode
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
