"""Documentation-as-tests: every example must execute cleanly
(parity with the reference's doctested sphinx-gallery examples, SURVEY §5)."""

import runpy
import sys
from pathlib import Path

import pytest

EXAMPLES = sorted((Path(__file__).parents[1] / "examples").glob("*.py"))


@pytest.mark.parametrize("example", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(example, capsys):
    sys.path.insert(0, str(example.parent.parent))
    try:
        runpy.run_path(str(example), run_name="__main__")
    finally:
        sys.path.remove(str(example.parent.parent))
    out = capsys.readouterr().out
    assert len(out) > 0  # every example prints its findings
