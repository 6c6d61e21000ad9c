"""Connected components over near-duplicate pair emissions.

The dedup family (x07 n-gram Jaccard, x11 MinHash-LSH, x26 embedding LSH)
emits PAIRS; an actual corpus dedup needs GROUPS — the transitive closure
of pairs — so that each near-dup cluster keeps exactly one canonical
document. `connected_components` closes that gap: given an edge list it
labels every node with the minimum node id reachable from it, which is a
deterministic group id (and `is_canonical` marks the one kept row per
group).

Scale design: min-label propagation with pointer jumping. Each round is
(a) one keyed shuffle propagating the current label across edges plus a
min-aggregate, and (b) one self-join hop (`label <- label(label)`) that
doubles compression depth — so rounds grow O(log(component diameter)),
not O(diameter). Per-round results are eagerly checkpointed to
truncate lineage (iterative DataFrame loops otherwise re-execute the
whole prefix every round): RELIABLY when the session has a checkpoint
dir configured (`sc.setCheckpointDir` — the cluster deployment), else
locally on executors (single-JVM dev/test), via `_truncate`. This is the DataFrame rendering of the classic
large-star/small-star MapReduce formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond") — each round is a bounded number of
shuffles on (node, label) pairs, never materializing anything larger
than the edge list.

The loop stops at the first round with zero label changes. The
convergence probe is itself a job launch, so it runs every SECOND
round (the fixpoint is stable: if the latest transition changed
nothing, every earlier one is irrelevant — at most one redundant
round of work is traded for half the probe actions). `max_iter` only
bounds a pathological input, and exhausting it without reaching the
fixpoint raises rather than silently returning wrong group ids. The
fixpoint is iteration-order independent, so the result is deterministic
and oracle-checkable: the DuckDB twin is a recursive-CTE reachability
closure (`catalog_ext._x28_sql`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _truncate(df: DataFrame) -> DataFrame:
    """Eagerly cut the lineage of an iterative intermediate. When the
    session has a reliable checkpoint directory configured
    (`sc.setCheckpointDir` — HDFS/S3 on a cluster), use a RELIABLE
    checkpoint: executor loss cannot force recomputing a lineage that no
    longer exists. Without one (local dev/test), `localCheckpoint` keeps
    the blocks on executors — faster, and loss-tolerance is moot in a
    single JVM."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph `edges` with the minimum
    node id in its connected component.

    Returns (node_id, group_id, group_size, is_canonical): one row per
    node that appears in any edge; `is_canonical` is true for the
    group's minimum-id node — the "keep this document" marker a dedup
    pipeline consumes directly.
    """
    half = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = (
        half.unionByName(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    e = _truncate(e)
    labels = _truncate(
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    for it in range(max_iter):
        # (a) propagate: every node takes min(own label, neighbors' labels)
        nbr = e.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        new = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # (b) pointer jump: label <- label's label (labels are node ids,
        # so the lookup is a self-join; a root's label is itself)
        jump = new.select(
            F.col("node").alias("label"), F.col("label").alias("jlabel")
        )
        new = _truncate(
            new.join(jump, "label", "left")
            .select("node", F.coalesce("jlabel", "label").alias("label"))
        )
        # probe every 2nd round (and on the last) — each probe is a job
        if it % 2 == 1 or it == max_iter - 1:
            changed = (
                new.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            if changed == 0:
                labels = new
                converged = True
                break
        labels = new
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; raise max_iter (pointer jumping needs O(log diameter) "
            "rounds, so this input is pathological)"
        )
    return (
        labels.select(F.col("node").alias("node_id"), F.col("label").alias("group_id"))
        .withColumn(
            "group_size",
            F.count(F.lit(1)).over(Window.partitionBy("group_id")),
        )
        .withColumn("is_canonical", F.col("node_id") == F.col("group_id"))
    )
