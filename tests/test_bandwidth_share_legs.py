"""scripts/bandwidth_share_legs.py repeat numbering: an add-more-repeats
invocation (start index > 0) must EXTEND the persisted leg series, never
restart at r0 and overwrite already-committed legs in place — the exact
regression that clobbered leg_c{1,4}_x100_pin_r0.json mid-round-4. Pure
Python — run_bench is stubbed, no Spark session."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)
import bandwidth_share_legs  # noqa: E402


def _capture_suffixes(monkeypatch, argv):
    calls = []

    def fake_run_bench(cores, expansion, sf_dir, pyfiles, suffix):
        calls.append((cores, expansion, suffix))
        return {
            "dedup_pipeline_sec": 1.0,
            "docs_per_sec": float(cores),
            "n_clusters": 7,
        }

    monkeypatch.setattr(bandwidth_share_legs, "run_bench", fake_run_bench)
    monkeypatch.setattr(bandwidth_share_legs, "build", lambda: None)
    monkeypatch.setattr(sys, "argv", ["bandwidth_share_legs.py"] + argv)
    bandwidth_share_legs.main()
    return calls


def test_default_starts_at_r0(monkeypatch):
    calls = _capture_suffixes(monkeypatch, ["2", "100"])
    assert [s for _, _, s in calls] == [
        "_pin_r0", "_pin_r0", "_pin_r1", "_pin_r1",
    ]
    # interleaved: each repeat runs 1c then 4c before the next repeat
    assert [c for c, _, _ in calls] == [1, 4, 1, 4]


def test_start_index_extends_series(monkeypatch):
    calls = _capture_suffixes(monkeypatch, ["2", "100", "3"])
    assert [s for _, _, s in calls] == [
        "_pin_r3", "_pin_r3", "_pin_r4", "_pin_r4",
    ]
    assert all(e == 100 for _, e, _ in calls)
