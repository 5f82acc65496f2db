"""Connected components over the duplicate-pair graph — the Spark
analogue of the reference's pair-merge step.

The reference reduces the pair graph with a single-threaded greedy
max-degree vertex removal (/root/reference/samples.cpp:534-577,
remove_dups_from_pairs) whose tie-breaks follow unordered_map iteration
order (nondeterministic). Here the canonical operator is deterministic
min-label propagation to a fixpoint (the iterative-hash-join analogue of
union-find): every doc gets ``cluster_id`` = min doc_id reachable in its
component, the representative (survivor) is that min doc — mirroring
keep-first. A reference-compatible greedy survivor mode with
deterministic tie-breaks is provided for parity checks.

Scale notes: each iteration is one shuffle join and pointer-jumping
makes the round count O(log n); lineage is truncated and convergence
probed only every ``cfg.cc_checkpoint_every`` rounds (each probe is a
driver action — the measured scaling drag of round 1 — so batching
probes trades <= probe_every-1 extra cheap rounds for far fewer
barriers). Convergence = the label sum (as decimal(38,0), immune to
64-bit wraparound on hash-derived ids) reaching its fixpoint; no
driver-side graph materialization ever happens. When the SparkContext
has a checkpoint dir set (``sc.setCheckpointDir``), reliable
``checkpoint()`` is used instead of ``localCheckpoint`` — on a real
cluster localCheckpoint blocks are lost with an executor.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from image_dedup_spark.config import DEFAULT, DedupConfig


def _truncate_lineage(df: DataFrame, lazy_ok: bool = False) -> DataFrame:
    """Reliable checkpoint when the context has a checkpoint dir (fault
    tolerant on a cluster), localCheckpoint otherwise (local mode).

    ``lazy_ok``: local-mode callers that immediately run an aggregation
    over the result pass True — the lazy localCheckpoint then
    materializes its blocks as a side effect of that SAME job, fusing
    what used to be two driver barriers (checkpoint job + probe job)
    into one. The reliable-checkpoint path stays eager: an RDD marked
    for reliable checkpointing is recomputed by the checkpoint writer
    after the first action, so laziness would double-compute there."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=not lazy_ok)


def connected_components(
    edges: DataFrame,
    cfg: DedupConfig = DEFAULT,
    src: str = "src_id",
    dst: str = "dst_id",
    dedup_edges: bool = False,
    metrics_out: list | None = None,
) -> DataFrame:
    """(doc_id, cluster_id) for every vertex appearing in `edges`.
    cluster_id = min doc_id in the component.

    ``dedup_edges`` is off by default: min-label propagation is
    idempotent to duplicate edges (a repeated (a,b) only re-offers the
    same min candidate to the same groupBy), so the distinct's full
    shuffle+dedup of the symmetrized edge table only pays for itself
    when the pair families overlap heavily; the engine's stages emit
    distinct pairs each, so overlap is the rare doc caught by two
    families.

    ``metrics_out``: optional list that receives one dict per probe
    barrier {"iteration", "seconds", "label_sum", "converged"} — the
    bench uses it to separate real propagation work from barrier
    latency when comparing runs."""
    # Pin the symmetrized edge table: every probe is its own Spark job,
    # and an unpinned `e` would replay the union shuffle each round
    # (shuffle reuse does not cross job boundaries). Lazy in local mode:
    # the warm-start probe job below materializes e's blocks as a side
    # effect, so edge pinning + label init + first probe are ONE job
    # submission instead of three (the ~9s/stage fixed floor measured in
    # BENCH/ANALYSIS_r2.md was mostly these serial barriers).
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    e = _truncate_lineage(sym.distinct() if dedup_edges else sym, lazy_ok=True)
    # Warm start: label(v) = min(v, min neighbor) — the result round 1
    # would produce, folded into the same shuffle the old doc_id-distinct
    # init already paid. Dup-pair graphs are shallow (exact-dup stars,
    # small near-dup clumps), so most vertices are already converged
    # after this and the loop typically needs only 1-2 confirming rounds.
    labels = _truncate_lineage(
        e.groupBy(F.col("a").alias("doc_id"))
        .agg(F.min("b").alias("min_nbr"))
        .select(
            "doc_id",
            F.least(F.col("doc_id"), F.col("min_nbr")).alias("cluster_id"),
        ),
        lazy_ok=True,
    )
    probe_every = max(1, cfg.cc_checkpoint_every)

    def probe(lab: DataFrame, it: int):
        """One job: materializes any pending lazy checkpoints in lab's
        plan AND computes the convergence sum (decimal(38,0) — immune to
        64-bit wraparound on hash-derived ids)."""
        t0 = time.monotonic()
        s = lab.agg(F.sum(F.col("cluster_id").cast("decimal(38,0)"))).first()[0]
        if metrics_out is not None:
            metrics_out.append(
                {
                    "iteration": it,
                    "seconds": round(time.monotonic() - t0, 3),
                    "label_sum": str(s),
                }
            )
        return s

    # Seed the convergence probe with the warm-start label sum. Combined
    # with probing after round 1, a graph the warm start fully converged
    # (stars and cliques — the shape of real dup graphs) exits after a
    # single confirming round instead of running probe_every rounds.
    # Deeper graphs fall back to the batched probe cadence.
    prev_sum = probe(labels, -1)
    for it in range(cfg.cc_max_iterations):
        nbr = (
            e.join(labels, e.b == labels.doc_id)
            .select(F.col("a").alias("doc_id"), "cluster_id")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        # pointer-jumping shortcut: label := label(label). A neighbor hop
        # alone moves the frontier one edge per round (O(diameter) on
        # chains); composing it with this doubling step converges in
        # O(log n) rounds — the large-star/small-star idea.
        parents = new_labels.select(
            F.col("doc_id").alias("p_id"), F.col("cluster_id").alias("p_label")
        )
        new_labels = (
            new_labels.join(
                parents, new_labels.cluster_id == parents.p_id, "left"
            )
            .select(
                "doc_id",
                F.coalesce("p_label", "cluster_id").alias("cluster_id"),
            )
        )
        labels = new_labels
        # Checkpoint + convergence probe only every probe_every rounds:
        # each probe is a full driver barrier (the round-1 bench's worst
        # scaling stage), while an extra converged round is one cheap
        # no-change join. Min-propagation never increases a label, so the
        # label sum is non-increasing until the fixpoint; summing as
        # decimal(38,0) keeps the equality test exact even for 64-bit
        # hash-derived ids that would wrap a BIGINT sum.
        if (
            it == 0
            or (it + 1) % probe_every == 0
            or it == cfg.cc_max_iterations - 1
        ):
            # Lazy checkpoint + probe = ONE job per barrier: the probe's
            # aggregation computes the round's labels, persisting them as
            # the checkpoint blocks the next round reads.
            labels = _truncate_lineage(labels, lazy_ok=True)
            label_sum = probe(labels, it)
            if metrics_out is not None:
                metrics_out[-1]["converged"] = label_sum == prev_sum
            if prev_sum is not None and label_sum == prev_sum:
                break
            prev_sum = label_sum
    return labels


def assign_clusters(
    docs: DataFrame, edges: DataFrame, cfg: DedupConfig = DEFAULT,
    id_col: str = "doc_id",
    metrics_out: list | None = None,
) -> DataFrame:
    """Every doc gets a cluster_id (its own id when untouched by any edge)
    and is_representative (deterministic min-doc_id rule)."""
    comp = connected_components(edges, cfg, metrics_out=metrics_out)
    return (
        docs.join(comp.withColumnRenamed("doc_id", id_col), id_col, "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
        .withColumn("is_representative", F.col(id_col) == F.col("cluster_id"))
    )


_GREEDY_SCHEMA = "doc_id long, removed boolean"


def _greedy_remove(pdf: pd.DataFrame) -> pd.DataFrame:
    """Reference-compatible greedy max-degree removal within one component
    (/root/reference/samples.cpp:552-574) with DETERMINISTIC tie-break:
    highest remaining degree, then smallest doc_id (the reference's tie
    order is unordered_map iteration order — unreproducible, SURVEY §7)."""
    adj: dict[int, set[int]] = {}
    for s, d in zip(pdf["src_id"], pdf["dst_id"]):
        adj.setdefault(int(s), set()).add(int(d))
        adj.setdefault(int(d), set()).add(int(s))
    removed = []
    while True:
        best, best_deg = None, 0
        for node in sorted(adj):
            deg = len(adj[node])
            if deg > best_deg:
                best, best_deg = node, deg
        if best is None or best_deg == 0:
            break
        for nbr in adj.pop(best):
            adj[nbr].discard(best)
        removed.append(best)
    rows = [(n, True) for n in removed] + [(n, False) for n in adj]
    return pd.DataFrame(rows, columns=["doc_id", "removed"])


def greedy_survivors(
    edges: DataFrame, cfg: DedupConfig = DEFAULT
) -> DataFrame:
    """(doc_id, removed) via per-component greedy max-degree removal.
    Components are small after near-dup detection, so grouped-map pandas
    execution is safe (applyInPandas per cluster_id); survivors form an
    independent set — no two survivors are duplicates of each other,
    exactly the reference's postcondition.

    Mega-component guard: a pathological component (boilerplate star
    chains) would put its whole edge list in one pandas group — one
    task's memory. Components with more than ``cfg.greedy_max_component``
    edges skip the greedy pass and fall back to the keep-first rule
    (min doc_id survives, everything else removed): deterministic, one
    aggregation, and the same independent-set postcondition under the
    near-dup relation's transitive closure."""
    comp = connected_components(edges, cfg)
    e = (
        edges.select("src_id", "dst_id")
        .join(
            comp.withColumnRenamed("doc_id", "src_id").withColumnRenamed(
                "cluster_id", "cid"
            ),
            "src_id",
        )
    )
    sizes = e.groupBy("cid").agg(F.count("*").alias("n_edges"))
    e = e.join(sizes, "cid")
    small = e.filter(F.col("n_edges") <= cfg.greedy_max_component)
    big = e.filter(F.col("n_edges") > cfg.greedy_max_component)
    greedy = small.groupBy("cid").applyInPandas(
        lambda pdf: _greedy_remove(pdf), schema=_GREEDY_SCHEMA
    )
    fallback = (
        big.select("cid", F.explode(F.array("src_id", "dst_id")).alias("doc_id"))
        .distinct()
        .select("doc_id", (F.col("doc_id") != F.col("cid")).alias("removed"))
    )
    return greedy.unionByName(fallback)
