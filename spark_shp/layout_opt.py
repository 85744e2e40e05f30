"""Physical-layout optimizations the brief calls out by name: bucketed
(pre-shuffled) tables for co-located joins, bucket pruning, and dynamic
partition pruning (DPP) on hive-partitioned layouts.

These are PLAN-level features — their contract is the shape of the
physical plan, not a row-value oracle — so the evidence is plan-pin
pytest (`tests/test_layout_opt.py`) plus wall-clock/skip counts in
BENCH/LAYOUT.json:

  * write_bucketed / read_bucketed — persist a table hash-bucketed by the
    join key via the Spark catalog (`bucketBy` + saveAsTable). Two tables
    bucketed the same way sort-merge-join with ZERO Exchange operators:
    at 100 TB this converts every recurring fact-fact join on the same
    key (e.g. images x events on cell) from a full 2-sided shuffle into
    a local merge — the single biggest recurring-shuffle eliminator the
    engine has.
  * A filter on the bucket key prunes buckets at scan time
    (``SelectedBucketsCount: 1 out of N`` in the scan node) — the hash
    analog of partition pruning, no shuffle and no full scan for
    point-lookups on the bucket key.
  * write_hive_partitioned + a star-join — Spark injects a
    ``dynamicpruning`` subquery: the fact side's partition filter is
    derived AT RUNTIME from the filtered dimension, so a selective dim
    predicate skips fact partitions wholesale. This engine's
    iceberg_layout gets the same effect from manifest bounds
    (scan_table); DPP is the catalog-table twin that works through
    Spark's own scan, with zero engine code in the read path.

The catalog warehouse lives under the caller-supplied directory; no
global state beyond the SparkSession's catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   sort: bool = True) -> None:
    """Persist ``df`` as a catalog table hash-bucketed (and optionally
    sorted) by ``key``.

    The pre-write ``repartition(n_buckets, key)`` is load-bearing: it uses
    the SAME murmur3 hash as the bucket spec, so each writer task holds
    exactly one bucket and each bucket becomes ONE file. Without it every
    writer task spills a fragment into every bucket (tasks x buckets tiny
    files — measured 36% SLOWER than the plain join at 50M rows), and
    Spark refuses to propagate the per-bucket sort order unless a bucket
    is a single file (readers must also set
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` to elide
    the sort-merge join's Sort)."""
    w = (df.repartition(n_buckets, key)
         .write.mode("overwrite").format("parquet")
         .bucketBy(n_buckets, key))
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_equijoin(spark: SparkSession, left: str, right: str,
                      key: str) -> DataFrame:
    """Equi-join two same-bucketed catalog tables. With bucketing aligned
    (same key, same bucket count) Spark plans a sort-merge join with no
    Exchange on either side."""
    lt = spark.table(left)
    rt = spark.table(right)
    return lt.join(rt, key)


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode)


def n_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the physical plan (broadcast
    exchanges excluded — those are the cheap kind). Counted in the
    tree-only ("simple") rendering: "formatted" mode lists every operator
    a second time in the detail section."""
    plan = physical_plan(df, "simple")
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line and "Broadcast" not in line
               and "Reused" not in line)


def selected_buckets(df: DataFrame) -> tuple[int, int] | None:
    """(selected, total) bucket counts from the scan node, if the plan
    carries bucket pruning info."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "SelectedBucketsCount" in line:
            # e.g. "SelectedBucketsCount: 1 out of 8"
            frag = line.split("SelectedBucketsCount:", 1)[1]
            parts = frag.replace(")", " ").split()
            return int(parts[0]), int(parts[3])
    return None


def write_hive_partitioned(df: DataFrame, path: str, part_col: str) -> None:
    df.write.mode("overwrite").partitionBy(part_col).parquet(path)


def has_dynamic_pruning(df: DataFrame) -> bool:
    return "dynamicpruning" in physical_plan(df).lower()
