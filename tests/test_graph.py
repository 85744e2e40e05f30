"""connected_components: min-label propagation over an edge list."""

import pyspark.sql.functions as F


def _cc(spark, pairs):
    from spark_shp.graph import connected_components
    df = spark.createDataFrame(pairs, "src: long, dst: long")
    rows = connected_components(df, "src", "dst").collect()
    return {r["node"]: r["component"] for r in rows}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_diameter_exceeds_one_round(spark):
    # A 12-node path: the min label must walk the whole chain, which takes
    # multiple propagation rounds (one hop per round).
    edges = [(i, i + 1) for i in range(12)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_self_loop_and_duplicate_edges(spark):
    got = _cc(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])
    assert got == {5: 5, 1: 1, 2: 1}


def test_jump_matches_hop_and_converges_in_fewer_rounds(spark):
    # 1 chain of 40 nodes: hop needs ~39 rounds; jump must finish within a
    # max_iter far below the diameter, and both agree.
    edges = [(i, i + 1) for i in range(39)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    from spark_shp.graph import connected_components
    jump = connected_components(df, "src", "dst", max_iter=12,
                                method="jump").collect()
    assert {r["component"] for r in jump} == {0}
    assert len(jump) == 40
    hop = connected_components(df, "src", "dst").collect()
    assert sorted(map(tuple, hop)) == sorted(map(tuple, jump))
