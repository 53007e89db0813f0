"""Connected components over candidate-pair graphs — duplicate clustering.

Dedup pipelines end with: candidate pairs (LSH) → connected components →
one survivor per component. Spark has no native CC; this is the classic
iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors of label(u))

repeated until fixpoint. Each iteration is one join + one aggregate (two
shuffles on the node id); the iteration count is O(graph diameter), which
for near-dup clusters is tiny (dups of one document form near-cliques).
The driver loop holds only a scalar convergence flag — labels never leave
the cluster. This is the engine's "iterative algorithm" template
(PageRank, label propagation, etc. have the same shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, cluster_id) for every node in ``edges``; cluster_id = min node
    id in the component. Undirected; only nodes appearing in edges emerge
    (singletons need no clustering)."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
    und = und.cache()
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            und.join(labels, und.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)  # truncate lineage
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    if changed != 0:
        # min-label propagation needs O(component diameter) rounds; a
        # still-changing label set means some component's diameter exceeds
        # max_iterations and its labels are SPLIT (silently wrong clusters)
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iterations} "
            "iterations — some components have split labels; raise "
            "max_iterations (rounds needed = component diameter)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def dedup_survivors(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one row per cluster (the cluster_id row itself) plus all
    unclustered rows — the final dedup application step."""
    clustered = components.select(
        F.col("node").alias(id_col), F.col("cluster_id")
    )
    joined = df.join(clustered, on=id_col, how="left")
    return joined.filter(
        F.col("cluster_id").isNull() | (F.col(id_col) == F.col("cluster_id"))
    ).drop("cluster_id")
