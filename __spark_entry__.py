"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Engine: spark_shp/ (SURVEY.md blueprint). Query registry: spark_shp/registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial-join + tile-assignment over sf0.001 — event points
    PIP-joined to nation fence polygons (cell-cover equi-join + exact
    ray-cast refine), aggregated per nation with the point's fine tile."""
    from spark_shp import fixtures, spatial
    from spark_shp.queries_spatial import _event_points, _nation_fences_df

    sf_dir = "/root/testdata/sf0.001"
    pts = _event_points(spark, sf_dir)
    pts = spatial.tile_assign(pts, "lon", "lat", 12, "tile_12")
    polys = _nation_fences_df(spark, sf_dir)
    joined = spatial.spatial_join(pts, polys, "lon", "lat", level=6, broadcast_cover=True)
    joined = joined.join(F.broadcast(polys.select("poly_id", "n_name")),
                         "poly_id")
    return (joined.groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("tile_12").alias("n_tiles"),
                 F.min("event_id").alias("min_event")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from spark_shp.registry import queries as _q
    return _q()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twins of queries() (same column names/aliases)."""
    from spark_shp.registry import oracle_sql as _o
    return _o()
