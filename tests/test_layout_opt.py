"""Plan-pin tests for the physical-layout optimizations (bucketed joins,
bucket pruning, dynamic partition pruning). These features' contract is
the shape of the physical plan — the row values are trivially checked
against the unbucketed join."""

import pytest

from pyspark.sql import functions as F

from spark_shp import layout_opt


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    """Point the session catalog at a temp warehouse for these tests."""
    return spark


def _facts(spark, n=200_000):
    return spark.range(n).selectExpr(
        "id AS k", "id % 97 AS v", "CAST(id % 13 AS BIGINT) AS grp")


def _dims(spark, n=200_000):
    return spark.range(n).selectExpr("id AS k", "id % 31 AS w")


def test_bucketed_join_has_zero_shuffle_exchanges(spark, tmp_path):
    f, d = _facts(spark), _dims(spark)
    layout_opt.write_bucketed(f, "t_fact_b", "k", 8)
    layout_opt.write_bucketed(d, "t_dim_b", "k", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = layout_opt.bucketed_equijoin(spark, "t_fact_b", "t_dim_b", "k")
        agg = j.groupBy().agg(F.sum(F.col("v") * F.col("w")).alias("s"))
        # the JOIN itself shuffles nothing: only the final 1-row agg may
        # exchange, so the join subtree must be exchange-free
        assert layout_opt.n_exchanges(j) == 0
        # and the unbucketed twin shuffles BOTH sides
        uj = _facts(spark).join(_dims(spark), "k")
        assert layout_opt.n_exchanges(uj) == 2
        # values agree with the unbucketed join
        expect = (_facts(spark).join(_dims(spark), "k").groupBy()
                  .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
                  .collect()[0].s)
        assert agg.collect()[0].s == expect
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_fact_b")
        spark.sql("DROP TABLE IF EXISTS t_dim_b")


def test_bucket_pruning_scans_one_bucket(spark):
    layout_opt.write_bucketed(_facts(spark), "t_prune_b", "k", 8)
    # autoBucketedScan drops the bucketed layout when no JOIN benefits;
    # for filter-driven bucket PRUNING the scan must stay bucketed
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
                   "false")
    try:
        q = spark.table("t_prune_b").where(F.col("k") == 12345)
        sel = layout_opt.selected_buckets(q)
        assert sel is not None, "plan lost bucket-pruning info"
        assert sel == (1, 8)
        assert q.count() == 1
    finally:
        spark.conf.unset(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql("DROP TABLE IF EXISTS t_prune_b")


def test_dynamic_partition_pruning_fires_on_star_join(spark, tmp_path):
    fact_path = str(tmp_path / "fact_part")
    fact = spark.range(100_000).selectExpr(
        "id", "CAST(id % 32 AS BIGINT) AS region", "id % 7 AS v")
    layout_opt.write_hive_partitioned(fact, fact_path, "region")
    dim = spark.range(32).selectExpr(
        "id AS region", "CASE WHEN id IN (3, 17) THEN 'hot' ELSE 'cold' "
        "END AS klass")
    f = spark.read.parquet(fact_path)
    j = (f.join(dim.where(F.col("klass") == "hot"), "region")
         .groupBy("region").count())
    assert layout_opt.has_dynamic_pruning(j)
    rows = {r.region: r["count"] for r in j.collect()}
    assert set(rows) == {3, 17}
    # each partition holds 100000/32 rows, +/-1 for the remainder split
    assert all(3124 <= n <= 3125 for n in rows.values())
