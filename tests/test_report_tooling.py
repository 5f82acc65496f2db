"""Report-tooling stamp discipline: the appendix and the headline
regenerator must never mix measured-code versions in one paired table.
Pure Python + git — no Spark session."""

import json
import os
import subprocess
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)
import append_scaling_context as ASC  # noqa: E402
import regen_head_report as RHR  # noqa: E402
import scaling_run  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _head() -> str:
    return subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()


def test_at_head_filters_stale_stamps():
    legs = [
        {"_meta": {"git_sha": _head()}, "docs_per_sec": 1.0},
        {"_meta": {"git_sha": "not-a-commit"}, "docs_per_sec": 2.0},
        {"_meta": {}, "docs_per_sec": 3.0},
    ]
    kept = ASC._at_head(legs)
    assert [r["docs_per_sec"] for r in kept] == [1.0]


def test_bandwidth_section_refuses_mixed_code_series(tmp_path, monkeypatch):
    """Legs spanning two measured-code versions (the round-4 r0/r1 vs
    r2-r4 bench-fusion mix) must not share one paired table."""
    monkeypatch.setattr(ASC, "REPO", str(tmp_path))
    (tmp_path / "BENCH").mkdir()

    def leg(cores, i, sha):
        p = tmp_path / "BENCH" / f"leg_c{cores}_x100_pin_r{i}.json"
        p.write_text(
            json.dumps(
                {
                    "docs_per_sec": 100.0 * cores,
                    "dedup_pipeline_sec": 10.0,
                    "n_docs": 1000,
                    "n_clusters": 5,
                    "_meta": {"git_sha": sha, "pinned": True},
                }
            )
        )

    # Two real historical commits that differ from HEAD's measured code
    # AND from each other (56026ca fused the bench between them; int16
    # landed after both): the exact mix that tainted the round-4 series.
    a, b = "b349ab0", "7ad8d9e"
    leg(1, 0, a)
    leg(1, 1, b)
    leg(4, 0, a)
    leg(4, 1, b)
    assert ASC._bandwidth_share_section() == ""

    # A stale-but-single-code series IS emitted, labelled superseded.
    leg(1, 0, b)
    leg(4, 0, b)
    out = ASC._bandwidth_share_section()
    assert "superseded" in out
    assert b in out


def test_regen_suffixes_cli(monkeypatch):
    monkeypatch.setattr(sys, "argv", ["regen_head_report.py", "_pin_i16", "3"])
    assert RHR._suffixes() == ["_pin_i16_r0", "_pin_i16_r1", "_pin_i16_r2"]
    monkeypatch.setattr(sys, "argv", ["regen_head_report.py"])
    assert RHR._suffixes() == RHR.SUFFIXES
