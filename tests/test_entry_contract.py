"""Driver-contract smoke tests: entry() runs and returns rows; every
queries() entry has matching columns with its oracle_sql(); iceberg-layout
round-trip."""

import sys

sys.path.insert(0, "/root/repo")


def test_entry_returns_rows(spark):
    import __spark_entry__ as em
    df = em.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"n_name", "n_events", "n_tiles", "min_event"} <= cols


def test_registry_shapes():
    import __spark_entry__ as em
    qs, os_ = em.queries(), em.oracle_sql()
    assert len(qs) >= 45
    assert set(os_) <= set(qs)
    # rows-only entries are the documented non-SQL-expressible ones
    rows_only = set(qs) - set(os_)
    assert rows_only == {"approx_sketches", "images_phash_verify"}


def test_iceberg_layout_roundtrip(spark, tmp_path):
    from spark_shp import iceberg_layout as ice
    from spark_shp.queries_spatial import _images_meta_df
    root = str(tmp_path / "tbl")
    df = _images_meta_df(spark, 300).withColumn(
        "fmt_part", __import__("pyspark").sql.functions.col("fmt"))
    snap = ice.write_table(df, root, partition_by="fmt_part")
    assert snap["total_rows"] == 300 and snap["snapshot_id"] == 1
    back = ice.read_table(spark, root)
    assert back.count() == 300
    assert ice.table_stats(root)["total_rows"] == 300
    # second commit bumps the snapshot
    snap2 = ice.write_table(df.limit(10), root, partition_by="fmt_part")
    assert snap2["snapshot_id"] == 2
    assert ice.read_table(spark, root).count() == 10
