"""Smoke-run every example (the reference CI pattern: run the tutorial
binaries at tiny resolution and check exit status —
openpose/scripts/travis/run_tests.sh). Each example asserts its own
acceptance criteria, so a pass is more than an exit code."""

import runpy
from pathlib import Path

import pytest

# Long e2e sweeps: run with `-m slow` (core suite excludes them).
pytestmark = pytest.mark.slow

EXAMPLES = sorted((Path(__file__).parent.parent / "examples").glob("[0-9]*.py"))


@pytest.mark.slow
@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(path):
    runpy.run_path(str(path), run_name="__main__")
