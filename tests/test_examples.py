"""The examples/ scripts run end-to-end in the suite (round-1 VERDICT noted
their asserts — e.g. example 03's sharded==single generation equality —
were never executed by CI).  Each example self-asserts; executing it IS the
test."""

import pathlib
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).resolve().parents[1] / "examples").glob("0*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(path, capsys):
    import runpy

    sys.path.insert(0, str(path.parent))
    try:
        runpy.run_path(str(path), run_name="__main__")
    finally:
        sys.path.remove(str(path.parent))
    out = capsys.readouterr().out
    assert "OK" in out  # every example prints an explicit success marker
