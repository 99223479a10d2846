"""bench.py is the driver's per-round measurement surface: it must emit its
one-line JSON record even when a section crashes (a lost TCP ring peer once
aborted the whole suite before anything was written — see the guarded()
wrapper in bench.main).  These tests drive main() with monkeypatched
sections, so they exercise the real argument plumbing and record assembly
without any Spark session.
"""

from __future__ import annotations

import importlib.util
import io
import contextlib
import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    """A fresh bench module whose BENCH/ output dir is redirected so the
    committed BENCH/latest_full.json is never clobbered by a test run."""
    spec = importlib.util.spec_from_file_location("bench_under_test", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    # main() writes <bench.py dir>/BENCH/latest_full.json; point the module's
    # __file__ at a sandbox so the write lands in tmp_path/BENCH.
    mod.__file__ = str(tmp_path / "bench.py")
    yield mod
    sys.modules.pop("bench_under_test", None)


def _run_main(bench, monkeypatch, sections: str) -> dict:
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SECTIONS", sections)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    last = buf.getvalue().strip().splitlines()[-1]
    return json.loads(last)


def test_crashed_section_still_emits_record(bench, monkeypatch):
    def boom(results):
        raise RuntimeError("synthetic section crash")

    monkeypatch.setattr(bench, "section_scaling", boom)
    rec = _run_main(bench, monkeypatch, "scaling")
    assert rec["metric"] == "headline_suite_seconds"
    assert "synthetic section crash" in rec["section_errors"]["scaling"]


def test_one_crash_does_not_skip_later_sections(bench, monkeypatch):
    ran = []

    def boom(results):
        raise RuntimeError("first section dies")

    def ok(results):
        ran.append("scaling2p")
        results["scaling_2proc"] = {"paths": {}}

    monkeypatch.setattr(bench, "section_scaling", boom)
    monkeypatch.setattr(bench, "section_scaling_2proc", ok)
    rec = _run_main(bench, monkeypatch, "scaling,scaling2p")
    assert ran == ["scaling2p"]
    assert set(rec["section_errors"]) == {"scaling"}


def test_clean_run_has_no_section_errors(bench, monkeypatch):
    monkeypatch.setattr(bench, "section_scaling", lambda results: None)
    rec = _run_main(bench, monkeypatch, "scaling")
    assert rec["section_errors"] is None


def test_full_document_written_with_errors(bench, monkeypatch, tmp_path):
    def boom(results):
        raise RuntimeError("boom")

    monkeypatch.setattr(bench, "section_scaling", boom)
    _run_main(bench, monkeypatch, "scaling")
    full = json.loads((tmp_path / "BENCH" / "latest_full.json").read_text())
    assert "boom" in full["section_errors"]["scaling"]
