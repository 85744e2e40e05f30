"""Distributed connected components (min-label propagation) — the
clustering step of a near-duplicate pipeline: LSH/Jaccard candidate PAIRS
become duplicate GROUPS, from which one canonical document per group
survives.

Scale shape: each iteration is ONE shuffle (edge–label equi-join +
groupBy-min) over the edge list; the driver holds only a convergence
counter, never data. Lineage is truncated per iteration with
localCheckpoint, so the plan stays O(1) deep regardless of graph diameter
— without it, iteration k re-plans k joins and the job dies long before
100 TB. Label propagation converges in O(component diameter) rounds;
near-dup graphs are dense clusters with tiny diameters, so typically
3–5 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 50) -> DataFrame:
    """(src, dst) edge list → (node, component) where component is the
    minimum node id reachable from ``node``. Nodes appear iff they occur
    in an edge; callers union isolated nodes afterwards if needed."""
    sym = (edges.selectExpr(f"{src} AS a", f"{dst} AS b")
           .union(edges.selectExpr(f"{dst} AS a", f"{src} AS b"))
           .distinct()
           .persist())
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint())
    for _ in range(max_iter):
        nbr = (sym.join(labels, sym["b"] == labels["node"])
               .groupBy("a").agg(F.min("label").alias("nbr_min")))
        # Checkpoint BEFORE the convergence count: the count then scans the
        # materialized rows instead of re-executing the round's join — one
        # join per round, not two.
        stepped = (labels.join(nbr, labels["node"] == nbr["a"], "left")
                   .select("node", "label",
                           F.least("label", F.coalesce("nbr_min", "label"))
                           .alias("new_label"))
                   .localCheckpoint())
        changed = stepped.where(F.col("new_label") < F.col("label")).count()
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", F.col("label").alias("component"))
