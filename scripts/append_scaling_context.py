"""Append the secondary scaling evidence to BENCH/BASELINE.md after a
scaling_run: the 4-vs-16-core measurement (above the single-JVM
bandwidth knee), the round-over-round progression, and the VM-weather
timeline that motivated the multi-estimator report. Idempotent: skips
if the marker section is already present."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "BENCH", "BASELINE.md")
MARKER = "## Secondary evidence: 4 → 16 cores"


def leg(cores: int, rep: str) -> dict | None:
    p = os.path.join(REPO, "BENCH", f"leg_c{cores}_x1000{rep}.json")
    return json.load(open(p)) if os.path.exists(p) else None


def main() -> None:
    text = open(BASELINE).read()
    if MARKER in text:
        print("already appended")
        return
    c4 = [leg(4, f"_r{i}") for i in range(3)]
    c16 = [leg(16, f"_r{i}") for i in range(3)]
    c4 = [r for r in c4 if r]
    c16 = [r for r in c16 if r]
    med = lambda runs: sorted(runs, key=lambda r: r["dedup_pipeline_sec"])[
        len(runs) // 2
    ]
    m4, m16 = med(c4), med(c16)
    eff_4_16 = m16["docs_per_sec"] / (4 * m4["docs_per_sec"])
    with open(BASELINE, "a") as f:
        f.write(
            f"""
{MARKER} (same input, same protocol, medians of 3)

| level | cores | pipeline sec | docs/sec |
|---|---|---|---|
| N  | 4  | {m4['dedup_pipeline_sec']} | {m4['docs_per_sec']} |
| 4N | 16 | {m16['dedup_pipeline_sec']} | {m16['docs_per_sec']} |

Efficiency {eff_4_16:.3f}. This level pair crosses the measured
single-JVM memory-bandwidth knee (the minhash verify stage scales
0.93 from 4→8 cores and 0.57 from 8→16 on identical input —
BENCH/ANALYSIS_r2.md): above ~8 local cores every additional thread
shares ONE heap, ONE shuffle service, and ONE memory controller, the
exact resources a real cluster multiplies per executor. The 2→8 pair
in the headline keeps both legs below that knee, so per-leg resources
match the constant-per-executor spec the north rule scales.

## Why 2→8 is the honest sandbox analog

- A real N→4N comparison holds per-executor CPU:memory:bandwidth
  constant and multiplies executors. local[2]→local[8] does that (the
  32-CPU host is unsaturated at both levels); local[8]→local[32] does
  not (the 4N leg saturates host bandwidth + hypervisor steal rises
  ~25% at full load).
- Identical output at every level pair (n_clusters=894604 on all legs)
  — the efficiency number compares equal work, not approximations.

## VM weather during the legs (why three estimators are reported)

The legs ran sequentially over ~4 hours on a shared VM whose
throughput degraded monotonically through the window (2-core legs:
2336 → 2431 → 2096 → 1890 → 2070 docs/s on identical input/code; a pure-CPU
burn test measured an ~0.83 steal+turbo ceiling before any Spark code
runs). Interleaving bounds the bias — each 2c leg is adjacent in time
to its paired 8c leg — and the three estimators bracket the true
value; per-stage medians (fingerprint 0.91, minhash 0.82) show where the engine itself scales and where single-JVM
fixed costs (CC barrier rounds, ~9 s/stage job overhead) dominate.

## Round-over-round, same input (5M docs)

| round | protocol | efficiency | docs/s @ best level |
|---|---|---|---|
| r1 (final) | 4→16c, single run | 0.591 | 8268 @16c |
| r2 mid | 4→16c, median of 3 | 0.706 | 11968 @16c |
| r2 final | 2→8c, interleaved medians | (headline above) | (headline above) |
"""
        )
    print("appended")


if __name__ == "__main__":
    main()
