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
                         dst: str = "dst", max_iter: int = 50,
                         method: str = "hop") -> DataFrame:
    """(src, dst) edge list → (node, component) where component is the
    minimum node id reachable from ``node``. Nodes appear iff they occur
    in an edge; callers union isolated nodes afterwards if needed.

    method="hop" (default): one edge-join round per iteration — O(diameter)
    rounds, the right default for near-dup graphs (dense clusters, tiny
    diameters). method="jump" adds a pointer-jumping shortcut (each node
    also adopts its label's label) — two joins per round but O(log
    diameter) rounds, the scale path for long-chain graphs where O(d)
    rounds would mean thousands of shuffles."""
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
        stepped = (labels.join(nbr, labels["node"] == nbr["a"], "left")
                   .select("node", "label",
                           F.least("label", F.coalesce("nbr_min", "label"))
                           .alias("new_label")))
        if method == "jump":
            # Pointer jumping: every label is itself a node id in `labels`,
            # so chase one level (label -> label's label). Reachable-set
            # distance to the minimum roughly halves per round.
            lut = labels.select(F.col("node").alias("j_node"),
                                F.col("label").alias("j_label"))
            stepped = (stepped.join(
                lut, stepped["new_label"] == lut["j_node"], "left")
                .select("node", "label",
                        F.least("new_label", F.coalesce("j_label",
                                                        "new_label"))
                        .alias("new_label")))
        # Checkpoint BEFORE the convergence count: the count then scans the
        # materialized rows instead of re-executing the round's join(s) —
        # each join runs once per round.
        stepped = stepped.localCheckpoint()
        changed = stepped.where(F.col("new_label") < F.col("label")).count()
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    else:
        # Silent non-convergence returns WRONG (under-merged) labels —
        # observed live: a sprawling tau=1 percolation graph exceeded the
        # hop method's 50-round budget and split real components. Fail
        # loudly; callers pick method="jump" (O(log diameter)) or raise
        # max_iter for long-chain graphs.
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(method={method!r}); use method='jump' or raise max_iter")
    sym.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def kcore_rounds(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Bounded k-core peel: ``rounds`` fixed iterations of "drop every node
    whose degree in the surviving subgraph is < k", returning one row per
    round: (round, n_alive, checksum).  Round 0 is the full node set; the
    peel has converged iff the last two rounds are identical (callers gate
    that — the fixed bound is what makes the result reproducible as a
    finite SQL unrolling on any engine).

    Scale shape: each round is one degree aggregation over the surviving
    edge list (two broadcast semi-joins against the alive set + groupBy) —
    the alive set only shrinks, so every round is cheaper than the last;
    localCheckpoint truncates lineage so round r never re-plans rounds
    0..r-1.  Rounds whose alive set is empty emit no row (both engines
    agree: the SQL twin filters empty rounds with HAVING)."""
    bi = (edges.selectExpr("a AS u", "b AS v")
          .union(edges.selectExpr("b AS u", "a AS v"))
          .localCheckpoint())
    alive = bi.selectExpr("u AS node").distinct().localCheckpoint()
    snaps = [alive.selectExpr("CAST(0 AS BIGINT) AS round", "node")]
    for r in range(1, rounds + 1):
        a_u = alive.selectExpr("node AS u")
        a_v = alive.selectExpr("node AS v")
        deg = (bi.join(F.broadcast(a_u), "u", "semi")
               .join(F.broadcast(a_v), "v", "semi")
               .groupBy("u").agg(F.count(F.lit(1)).alias("d")))
        alive = (deg.where(f"d >= {k}").selectExpr("u AS node")
                 .localCheckpoint())
        snaps.append(alive.selectExpr(f"CAST({r} AS BIGINT) AS round",
                                      "node"))
    out = snaps[0]
    for s in snaps[1:]:
        out = out.union(s)
    return (out.groupBy("round")
            .agg(F.count(F.lit(1)).alias("n_alive"),
                 F.expr("SUM(node * 131)").alias("checksum"))
            .selectExpr("round", "CAST(n_alive AS BIGINT) AS n_alive",
                        "CAST(checksum AS BIGINT) AS checksum"))
