"""Secondary scaling evidence: pinned 1-vs-4-core legs at a smaller
input (default x100 = 500k docs).

Why this pair exists (BENCH/ANALYSIS_r4.md §3): the 2→8 headline's
upper leg saturates this one VM's DRAM bandwidth — the pinned burn
test bounds ANY memory-bound phase at ~0.42 efficiency there. At
1→4 cores the upper leg uses at most half the machine's bandwidth,
so the platform ceiling is mostly out of the way: if the SAME job
scores materially higher here, the headline gap is attributable to
platform bandwidth (which a real N→4N-executor cluster multiplies
per executor), not to serial or skewed software.

Runs the legs interleaved (1c, 4c, 1c, 4c, ...) and leaves the report
regeneration to report_from_legs.py / append_scaling_context.py,
which pick these legs up by filename + ``_meta`` stamp.

Usage: python scripts/bandwidth_share_legs.py [repeats] [expansion]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_pyfiles_zip import build
from scaling_run import run_bench


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    expansion = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    # Repeat numbering starts here instead of 0 so an add-more-repeats
    # invocation extends the persisted leg series (..._pin_r{K}.json)
    # rather than overwriting already-committed legs in place.
    start = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pyfiles = build()
    out = []
    for i in range(start, start + repeats):
        for cores in (1, 4):
            r = run_bench(cores, expansion, sf_dir, pyfiles, f"_pin_r{i}")
            out.append(
                {
                    "cores": cores,
                    "run": i,
                    "pipeline_sec": r["dedup_pipeline_sec"],
                    "docs_per_sec": r["docs_per_sec"],
                    "n_clusters": r["n_clusters"],
                }
            )
            print(json.dumps(out[-1]), flush=True)
    by = lambda c: sorted(
        (r["docs_per_sec"] for r in out if r["cores"] == c)
    )
    t1, t4 = by(1), by(4)
    if t1 and t4:
        eff = t4[len(t4) // 2] / (4 * t1[len(t1) // 2])
        print(json.dumps({"eff_1_to_4": round(eff, 3)}))


if __name__ == "__main__":
    main()
