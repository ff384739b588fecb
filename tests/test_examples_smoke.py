"""CI smoke for the examples/ demo set (SURVEY.md §2.8: the reference's
examples are de-facto manual integration tests; here they run in CI).

Each example module must execute end-to-end on the CPU mesh without error.
The heavyweight end-to-end example (example_quickstart) is covered by the
training e2e suites; this file runs the cheap per-component demos.
"""
import runpy
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).parent.parent / "examples"


@pytest.mark.parametrize("script", [
    "example_losses.py",
    "example_encoders.py",
    "example_compute_stats.py",
    "example_dataset.py",
])
def test_example_runs(script, capsys, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)  # examples that write files stay in tmp
    monkeypatch.setattr(sys, "argv", [script])
    runpy.run_path(str(EXAMPLES / script), run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{script} printed nothing"
    assert "nan" not in out.lower().replace("nan-safe", ""), \
        f"{script} printed NaNs:\n{out}"
