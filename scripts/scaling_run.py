"""Scaling-evidence protocol (BASELINE.md): run the identical bench job
on the identical input at two parallelism levels — N=local[8] and
4N=local[32] — and write throughput + scaling efficiency to
BENCH/BASELINE.md.

This is the sandbox substitute for the north_rule's two-cluster-size
criterion: same `spark-submit`-able job, same deterministic input,
shuffle partitions scaled with cores (handled inside session.get_spark).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    return shutil.which("spark-submit")


def run_bench(
    cores: int,
    expansion: int,
    sf_dir: str,
    pyfiles: str | None,
    suffix: str = "",
) -> dict:
    """One bench run. Uses the real ``spark-submit --py-files`` launch
    path (the north_rule's submit mechanism) when spark-submit is on
    PATH; plain ``python bench.py`` otherwise (identical job either way —
    bench.py builds its own session from $SPARK_GRAFT_CPUS)."""
    leg_path = os.path.join(
        REPO, "BENCH", f"leg_c{cores}_x{expansion}{suffix}.json"
    )
    # Resume: a leg costs 30+ minutes; if a previous invocation of this
    # exact (cores, expansion, repeat) leg already persisted its result
    # and the caller opts in (engine code unchanged since), reuse it
    # instead of burning the measurement again.
    if os.environ.get("SPARK_GRAFT_SCALE_RESUME") == "1" and os.path.exists(
        leg_path
    ):
        with open(leg_path) as f:
            return json.load(f)
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_BENCH_EXPANSION=str(expansion),
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    submit = _spark_submit()
    # Memory scales with cores (the real-cluster analog: same executor
    # spec, more executors — per-core memory constant). Measured both
    # failure modes: an 8g heap OOMs a 16-core leg at 5M docs, while an
    # oversized 48g G1 heap runs identical stages ~2x slower than 8g.
    mem = os.environ.get("SPARK_DRIVER_MEM", f"{max(8, 2 * cores)}g")
    if submit and pyfiles:
        cmd = [
            submit,
            "--master", f"local[{cores}]",
            # builder-time spark.driver.memory is ignored under
            # spark-submit (the JVM is already up) — set it here.
            "--driver-memory", mem,
            "--py-files", pyfiles,
            os.path.join(REPO, "bench.py"),
        ]
    else:
        cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=3600
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench produced no JSON (cmd={cmd[0]}):\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
        )
    res = json.loads(lines[-1])
    # persist each leg immediately so a crashed/killed sibling leg never
    # loses this one's 30+ minutes of measurement
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(leg_path, "w") as f:
        json.dump(res, f)
    return res


def write_report(r_n: dict, r_4n: dict, n: int, four_n: int, expansion: int) -> float:
    tp_n = r_n["docs_per_sec"]
    tp_4n = r_4n["docs_per_sec"]
    eff = tp_4n / (4 * tp_n)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    stage_names = {
        "q_exact_dedup": "exact dedup",
        "q_fingerprint": "fingerprint (Arrow UDF)",
        "q_minhash_lsh_pairs": "minhash LSH pairs",
        "q_simhash_pairs": "simhash pairs",
        "q_connected_components": "connected components",
    }
    stage_rows = []
    for key, label in stage_names.items():
        a, b = r_n["queries"].get(key), r_4n["queries"].get(key)
        if a and b:
            stage_rows.append(
                f"| {label} | {a} | {b} | {a / b:.2f}× | {a / b / 4:.2f} |"
            )
    stage_rows.append(
        f"| **dedup pipeline** | **{r_n['dedup_pipeline_sec']}** "
        f"| **{r_4n['dedup_pipeline_sec']}** "
        f"| **{r_n['dedup_pipeline_sec'] / r_4n['dedup_pipeline_sec']:.2f}×** "
        f"| **{eff:.3f}** |"
    )
    stage_table = "\n".join(stage_rows)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling evidence ({stamp})

Protocol (BASELINE.md): identical job, identical deterministic input
({r_n['n_docs']} docs = sf{r_n['sf']} documents × {expansion} expansion),
two local parallelism levels, shuffle partitions scaled with cores.

| level | cores | dedup pipeline sec | docs/sec |
|---|---|---|---|
| N  | {n}  | {r_n['dedup_pipeline_sec']} | {tp_n} |
| 4N | {four_n} | {r_4n['dedup_pipeline_sec']} | {tp_4n} |

**Scaling efficiency = throughput(4N) / (4 × throughput(N)) =
{eff:.3f}** (target ≥ 0.8 ⇒ {"PASS" if eff >= 0.8 else "FAIL"};
a pure-CPU burn test on this VM measures an ~0.83 platform ceiling
from hypervisor steal + turbo before any Spark code runs —
BENCH/ANALYSIS_r1.md — so {eff / 0.83:.2f} normalized to the ceiling)

## Per-stage speedup, {n} → {four_n} cores ({r_n['n_docs']} docs)

| stage | {n}c sec | {four_n}c sec | speedup | efficiency |
|---|---|---|---|---|
{stage_table}

Raw N:  `{json.dumps(r_n)}`

Raw 4N: `{json.dumps(r_4n)}`
"""
        )
    return eff


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    expansion = int(os.environ.get("SPARK_GRAFT_BENCH_EXPANSION", "40"))
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
    # Repeats: single-run legs on this VM swing ±20% from hypervisor
    # steal (the Arrow fingerprint stage alone measured 142-193s at 16
    # cores across identical runs), which is ±0.1 on the efficiency
    # number. Legs are interleaved (N, 4N, N, 4N, ...) so slow periods
    # hit both levels, and the report uses the per-level MEDIAN by
    # pipeline time, with every raw leg listed.
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "1"))
    four_n = 4 * n
    from make_pyfiles_zip import build

    pyfiles = build()
    runs_n, runs_4n = [], []
    for i in range(repeats):
        suffix = f"_r{i}" if repeats > 1 else ""
        runs_n.append(run_bench(n, expansion, sf_dir, pyfiles, suffix))
        runs_4n.append(run_bench(four_n, expansion, sf_dir, pyfiles, suffix))
    med = lambda runs: sorted(runs, key=lambda r: r["dedup_pipeline_sec"])[
        len(runs) // 2
    ]
    r_n, r_4n = med(runs_n), med(runs_4n)
    eff = write_report(r_n, r_4n, n, four_n, expansion)
    if repeats > 1:
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(
                f"\n## All legs ({repeats} interleaved repeats per level; "
                "report uses the per-level median by pipeline sec)\n\n"
                "| level | run | pipeline sec | docs/sec |\n|---|---|---|---|\n"
            )
            for level, runs in ((n, runs_n), (four_n, runs_4n)):
                for i, r in enumerate(runs):
                    f.write(
                        f"| {level}c | {i} | {r['dedup_pipeline_sec']} "
                        f"| {r['docs_per_sec']} |\n"
                    )
    print(
        json.dumps(
            {"eff": eff, "tp_n": r_n["docs_per_sec"], "tp_4n": r_4n["docs_per_sec"]}
        )
    )


if __name__ == "__main__":
    main()
