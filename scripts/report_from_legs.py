"""Regenerate BENCH/BASELINE.md from already-persisted pinned legs.

The protocol runner (scaling_run.py) writes each leg JSON the moment it
finishes, but only writes the report after ALL repeats complete. If the
round's wall clock runs out mid-protocol, this script rebuilds the
report from whatever interleaved pairs exist — only legs whose
``_meta`` stamp matches the requested protocol (pinned, expansion) and
with equal pair counts per level, so the report never mixes protocols
or compares unpaired weather windows.

Usage: python scripts/report_from_legs.py [expansion] [N] [4N]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from append_scaling_context import _legs
from scaling_run import write_report


def main() -> None:
    expansion = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    four_n = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * n
    runs_n = _legs(n, expansion=expansion, pinned=True)
    runs_4n = _legs(four_n, expansion=expansion, pinned=True)
    k = min(len(runs_n), len(runs_4n))
    if k == 0:
        raise SystemExit("no pinned leg pairs found")
    runs_n, runs_4n = runs_n[:k], runs_4n[:k]
    eff = write_report(runs_n, runs_4n, n, four_n, expansion)
    from append_scaling_context import secondary_sections

    baseline = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "BASELINE.md",
    )
    extra = secondary_sections()
    if extra:
        with open(baseline, "a") as f:
            f.write(extra)
    if k > 1:
        with open(baseline, "a") as f:
            f.write(
                f"\n## All legs ({k} interleaved repeats per level)\n\n"
                "| level | run | pipeline sec | docs/sec |\n|---|---|---|---|\n"
            )
            for level, runs in ((n, runs_n), (four_n, runs_4n)):
                for i, r in enumerate(runs):
                    f.write(
                        f"| {level}c | {i} | {r['dedup_pipeline_sec']} "
                        f"| {r['docs_per_sec']} |\n"
                    )
    print(json.dumps({"pairs": k, "eff": eff}))


if __name__ == "__main__":
    main()
