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


def test_resume_across_doc_only_commits_but_not_code(tmp_path, monkeypatch):
    """The resume gate compares the code a leg EXECUTES (the packaged
    sources + bench.py), not the raw sha: a doc/test/script commit
    landing between the legs of one protocol must not burn a 30-minute
    measurement, but any change under the measured paths must."""
    import subprocess

    def git(*args):
        subprocess.run(
            ["git", *args], cwd=tmp_path, check=True, capture_output=True
        )

    def sha():
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=tmp_path,
            capture_output=True, text=True,
        ).stdout.strip()

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    (tmp_path / "image_dedup_spark").mkdir()
    (tmp_path / "image_dedup_spark" / "x.py").write_text("A = 1\n")
    (tmp_path / "bench.py").write_text("B = 1\n")
    git("add", "-A")
    git("commit", "-qm", "base")
    leg_sha = sha()

    monkeypatch.setattr(scaling_run, "REPO", str(tmp_path))
    monkeypatch.setenv("SPARK_GRAFT_SCALE_RESUME", "1")
    monkeypatch.setenv("SPARK_GRAFT_PIN_CPUS", "0")
    (tmp_path / "BENCH").mkdir()
    leg = {
        "docs_per_sec": 123.0,
        "_meta": {"git_sha": leg_sha, "sf_dir": "/nonexistent"},
    }
    leg_file = tmp_path / "BENCH" / "leg_c2_x10_r1.json"
    leg_file.write_text(json.dumps(leg))

    # doc-only commit after the leg: measured code identical -> resume
    (tmp_path / "README.md").write_text("doc\n")
    git("add", "-A")
    git("commit", "-qm", "doc only")
    out = scaling_run.run_bench(2, 10, "/nonexistent", None, suffix="_r1")
    assert out == leg

    # measured-code commit after the leg: stale evidence -> re-run
    (tmp_path / "bench.py").write_text("B = 2\n")
    git("add", "-A")
    git("commit", "-qm", "bench change")
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
