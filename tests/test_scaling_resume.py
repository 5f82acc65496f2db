"""scripts/scaling_run.py leg-resume: a persisted leg JSON short-circuits
the 30+ minute re-measurement when SPARK_GRAFT_SCALE_RESUME=1. Pure
Python — no Spark session."""

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)
import scaling_run  # noqa: E402


def test_resume_returns_persisted_leg(tmp_path, monkeypatch):
    monkeypatch.setattr(scaling_run, "REPO", str(tmp_path))
    monkeypatch.setattr(scaling_run, "_git_sha", lambda: "abc123")
    (tmp_path / "BENCH").mkdir()
    leg = {
        "docs_per_sec": 123.0,
        "dedup_pipeline_sec": 9.9,
        "cores": 2,
        "_meta": {"git_sha": "abc123", "sf_dir": "/nonexistent"},
    }
    (tmp_path / "BENCH" / "leg_c2_x10_r1.json").write_text(json.dumps(leg))
    monkeypatch.setenv("SPARK_GRAFT_SCALE_RESUME", "1")
    # legs written before the CPU-pinning stamp existed count as unpinned
    monkeypatch.setenv("SPARK_GRAFT_PIN_CPUS", "0")
    # bench.py does not exist under tmp_path: any subprocess attempt
    # would raise, so a returned dict proves the persisted leg was used.
    out = scaling_run.run_bench(2, 10, "/nonexistent", None, suffix="_r1")
    assert out == leg


def test_no_resume_across_pinning_modes(tmp_path, monkeypatch):
    """A leg measured without CPU pinning is not evidence for the pinned
    protocol (and vice versa) — the two measure different machines."""
    monkeypatch.setattr(scaling_run, "REPO", str(tmp_path))
    monkeypatch.setattr(scaling_run, "_git_sha", lambda: "abc123")
    (tmp_path / "BENCH").mkdir()
    leg = {
        "docs_per_sec": 123.0,
        "_meta": {"git_sha": "abc123", "sf_dir": "/nonexistent",
                  "pinned": False},
    }
    (tmp_path / "BENCH" / "leg_c2_x10_r1.json").write_text(json.dumps(leg))
    monkeypatch.setenv("SPARK_GRAFT_SCALE_RESUME", "1")
    monkeypatch.setenv("SPARK_GRAFT_PIN_CPUS", "1")
    with pytest.raises(Exception):
        scaling_run.run_bench(2, 10, "/nonexistent", None, suffix="_r1")


def test_no_resume_when_code_or_input_changed(tmp_path, monkeypatch):
    """A leg measured on older code (stale git stamp) or different input
    must NOT silently enter the report as current evidence."""
    monkeypatch.setattr(scaling_run, "REPO", str(tmp_path))
    monkeypatch.setattr(scaling_run, "_git_sha", lambda: "NEW_SHA")
    (tmp_path / "BENCH").mkdir()
    leg = {
        "docs_per_sec": 123.0,
        "_meta": {"git_sha": "OLD_SHA", "sf_dir": "/nonexistent"},
    }
    (tmp_path / "BENCH" / "leg_c2_x10_r1.json").write_text(json.dumps(leg))
    monkeypatch.setenv("SPARK_GRAFT_SCALE_RESUME", "1")
    with pytest.raises(Exception):
        # stamp mismatch -> must re-run bench.py, which is absent here
        scaling_run.run_bench(2, 10, "/nonexistent", None, suffix="_r1")
    # unstamped (pre-round-3) legs are equally not current evidence
    (tmp_path / "BENCH" / "leg_c2_x10_r1.json").write_text(
        json.dumps({"docs_per_sec": 1.0})
    )
    with pytest.raises(Exception):
        scaling_run.run_bench(2, 10, "/nonexistent", None, suffix="_r1")


def test_no_resume_without_optin(tmp_path, monkeypatch):
    monkeypatch.setattr(scaling_run, "REPO", str(tmp_path))
    (tmp_path / "BENCH").mkdir()
    (tmp_path / "BENCH" / "leg_c2_x10.json").write_text("{}")
    monkeypatch.delenv("SPARK_GRAFT_SCALE_RESUME", raising=False)
    with pytest.raises(Exception):
        # opts out -> must actually run bench.py, which is absent here
        scaling_run.run_bench(2, 10, "/nonexistent", None)
