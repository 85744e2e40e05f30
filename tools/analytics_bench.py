"""Throughput evidence for the round-3 analytics/grid operators at scale
(BENCH/ANALYTICS.json): hex_bin, hilbert_assign, geohash_encode and
pq_codes over formula-synthesized inputs far larger than sf0.1 — the
claim under test is "map-only codegen arithmetic + one combinable agg
runs at scan speed", so rows/sec at local[32] is the honest metric.

Also records the REJECTED formulations at a smaller N (they are 10-50x
slower — measuring them at the headline N would take an hour and prove
nothing more):
  - hilbert via staged CASE recurrence (Catalyst inlines the mutually
    referencing stages into a ~2^levels tree),
  - hilbert / PQ via aggregate() HOF folds (linear tree, but Spark
    evaluates higher-order functions interpreted, never codegen),
  - hilbert via vectorized-numpy pandas_udf (Arrow transfer bound).
The shipped shapes: hilbert = branchless parallel-prefix bitwise stages,
PQ = flat argmin CASE (codegen subexpression elimination evaluates each
repeated distance tree once).

PQ input is written to parquet first: synthesizing 64-dim vectors
in-plan uses transform() — an interpreted HOF that would dominate the
timing and flatter the slow variants.

Methodology (repo rules): fresh plan per trial (no shuffle-stage reuse),
spark.catalog.clearCache() before every timed trial (the CacheManager
matches canonicalized plans across DataFrame objects), min over trials
reported (GC-pause isolation), row counts asserted so a lazy plan can't
fake a time.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

N_POINTS = 200_000_000
N_POINTS_ALT = 20_000_000
N_VECS = 2_000_000
TRIALS = 3
PQ_DIR = "/tmp/analytics_bench_vecs"

from pyspark.sql import functions as F  # noqa: E402

from spark_shp import cells, fixtures  # noqa: E402
from spark_shp.queries_analytics import (ALGEBRA_LEVEL, HILBERT_LEVEL,  # noqa: E402
                                         _hex_stages, _hilbert_sql_stages,
                                         _pq_exprs, geohash6_spark_expr,
                                         hilbert_branchless_stages)
from spark_shp.session import get_spark  # noqa: E402

LON = fixtures.EVENT_LON_SQL.replace("event_id", "id")
LAT = fixtures.EVENT_LAT_SQL.replace("event_id", "id")


def _points(spark, n):
    return spark.range(0, n, 1, 64).selectExpr(
        "id AS event_id", f"{LON} AS lon", f"{LAT} AS lat")


def bench(spark, name, build, n_input, trials=TRIALS, expect_rows_min=1):
    best = None
    for _ in range(trials):
        spark.catalog.clearCache()
        df = build()
        t0 = time.time()
        rows = df.count()
        dt = time.time() - t0
        assert rows >= expect_rows_min, (name, rows)
        best = dt if best is None else min(best, dt)
    return {"sec": round(best, 3), "rows_out": rows,
            "input_rows": n_input,
            "input_rows_per_sec": round(n_input / best)}


def _hilbert_branchless_df(spark, n):
    ix, iy = cells.quantize_sql("lon", "lat", HILBERT_LEVEL)
    d = _points(spark, n).selectExpr(f"{ix} AS hx", f"{iy} AS hy")
    for stage in hilbert_branchless_stages(HILBERT_LEVEL):
        d = d.selectExpr(*stage)
    return (d.selectExpr("CAST(FLOOR(hd / 4096.0) AS BIGINT) AS b")
            .groupBy("b").agg(F.count(F.lit(1)).alias("n")))


def main():
    spark = get_spark("analytics_bench", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"n_points": N_POINTS, "n_vectors": N_VECS, "trials": TRIALS,
           "cpus": 32,
           "method": ("fresh plan per trial, clearCache, min-of-trials; "
                      "rejected formulations at n_points_alt="
                      f"{N_POINTS_ALT}")}

    def hex_build():
        st = _hex_stages("lon", "lat")
        d = _points(spark, N_POINTS)
        for stage in st:
            d = d.selectExpr("event_id", *stage)
        return d.groupBy("hq", "hr").agg(F.count(F.lit(1)).alias("n"))

    def geohash_build():
        gh = geohash6_spark_expr("lon", "lat")
        return (_points(spark, N_POINTS)
                .selectExpr(f"SUBSTRING({gh}, 1, 4) AS gh4")
                .groupBy("gh4").agg(F.count(F.lit(1)).alias("n")))

    def morton_build():
        return (_points(spark, N_POINTS)
                .selectExpr(
                    f"{cells.cell_sql('lon', 'lat', ALGEBRA_LEVEL)} AS c")
                .groupBy("c").agg(F.count(F.lit(1)).alias("n")))

    out["hex_bin"] = bench(spark, "hex_bin", hex_build, N_POINTS)
    out["hilbert_assign"] = bench(
        spark, "hilbert_assign",
        lambda: _hilbert_branchless_df(spark, N_POINTS), N_POINTS)
    out["geohash_encode"] = bench(spark, "geohash_encode", geohash_build,
                                  N_POINTS)
    out["morton_tile_assign_reference"] = bench(spark, "morton",
                                                morton_build, N_POINTS)

    # rejected hilbert formulations, 1 trial at the smaller N
    def hilbert_staged_rec_build():
        ix, iy = cells.quantize_sql("lon", "lat", HILBERT_LEVEL)
        d = _points(spark, N_POINTS_ALT).selectExpr(
            "event_id", f"{ix} AS hx", f"{iy} AS hy",
            "CAST(0 AS BIGINT) AS hd")
        for a, b in _hilbert_sql_stages(HILBERT_LEVEL):
            d = d.selectExpr("event_id", *a)
            d = d.selectExpr("event_id", *b)
        return (d.selectExpr("CAST(FLOOR(hd / 4096.0) AS BIGINT) AS b")
                .groupBy("b").agg(F.count(F.lit(1)).alias("n")))

    alt = {}
    alt["hilbert_branchless_same_n"] = bench(
        spark, "hb20",
        lambda: _hilbert_branchless_df(spark, N_POINTS_ALT),
        N_POINTS_ALT, trials=1)
    alt["hilbert_staged_case_recurrence"] = bench(
        spark, "hrec", hilbert_staged_rec_build, N_POINTS_ALT, trials=1)
    out["rejected_formulations"] = alt

    # PQ encode over 64-dim vectors read from parquet (the real query
    # shape; in-plan synthesis would be HOF-bound)
    shutil.rmtree(PQ_DIR, ignore_errors=True)
    (spark.range(0, N_VECS, 1, 64).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 63), j -> CAST(((id * 64 + j) % 997) "
        "/ 997.0 - 0.5 AS FLOAT)) AS embedding")
     .write.mode("overwrite").parquet(PQ_DIR))

    def pq_build():
        exprs = _pq_exprs(lambda i: f"embedding[{i}]")
        return (spark.read.parquet(PQ_DIR)
                .selectExpr("vec_id", *exprs)
                .groupBy("c0", "c1", "c2", "c3")
                .agg(F.count(F.lit(1)).alias("n")))

    r = bench(spark, "pq_codes", pq_build, N_VECS)
    out["pq_codes"] = {"sec": r["sec"], "n_vectors": N_VECS,
                       "vectors_per_sec": r["input_rows_per_sec"],
                       "distinct_code_tuples": r["rows_out"]}
    shutil.rmtree(PQ_DIR, ignore_errors=True)

    print(json.dumps(out, indent=2))
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/ANALYTICS.json", "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
