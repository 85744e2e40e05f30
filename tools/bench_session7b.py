"""Scale evidence for the session-7 post-lock-in operators: the EXACT
gated code paths at ~1000x the sf0.1 gate volume.

- rolling_regression   : 100M events -> per-type hourly series + window
- group_sequential_test: 100M events (10-slot per-user pivot, 5 looks)
- rayleigh_uniformity  : 100M events (quantized circular moments)
- type_profile_similarity: 100M events (24-bin histograms + pair join)
- nearest_event_join   : 100M events x 10M orders union-merge
- chaikin_smooth       : 100M events (rank window + 2 subdivision rounds)
- image_median_cut / image_color_pca / image_seam_carve-class kernels:
  40k real-decode images

Methodology per the repo bench rules: clearCache() per trial, plan
rebuilt per trial, min over trials.

Usage: python tools/bench_session7b.py [n_rows] (default 100_000_000)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_shp.hashing import u01_sql  # noqa: E402
from spark_shp.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
NO = N // 10
OUT = "/tmp/bench_session7b_sf"
TRIALS = 2


def synthesize(spark):
    import shutil
    marker = os.path.join(OUT, f"N_{N}")
    if os.path.isdir(os.path.join(OUT, "orders.parquet")) \
            and os.path.exists(marker):
        return
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    open(marker, "w").close()
    (spark.range(0, N, 1, 256)
     .selectExpr(
         "id AS event_id",
         "timestamp_micros(CAST(1600000000000000 + "
         f"{u01_sql('id * 11 + 5')} * 2592000000000.0 AS BIGINT)) AS ts",
         "id % 1000000 AS user_id",
         f"{u01_sql('id * 7 + 3')} * 1000.0 AS value",
         "CASE id % 7 WHEN 0 THEN 'purchase' WHEN 1 THEN 'view' "
         "WHEN 2 THEN 'click' WHEN 3 THEN 'signup' ELSE 'error' END "
         "AS event_type")
     .write.parquet(f"{OUT}/events.parquet"))
    (spark.range(0, NO, 1, 256)
     .selectExpr(
         "id AS o_orderkey", "id % 1000000 AS o_custkey",
         "timestamp_micros(CAST(1598000000000000 + "
         f"{u01_sql('id * 17 + 9')} * 31536000000000.0 AS BIGINT)) "
         "AS o_orderdate")
     .write.parquet(f"{OUT}/orders.parquet"))


def timed(name, fn, rows, results, unit="rows"):
    spark = results.pop("_spark")
    times, out_rows = [], None
    for _ in range(TRIALS):
        spark.catalog.clearCache()
        t = time.time()
        res = fn().collect()
        times.append(time.time() - t)
        out_rows = len(res)
    best = min(times)
    results[name] = {
        f"input_{unit}": rows, "out_rows": out_rows,
        "sec": round(best, 2),
        f"{unit}_per_sec": round(rows / best),
    }
    results["_spark"] = spark
    print(f"# {name}: {rows} {unit} in {best:.2f}s "
          f"({rows / best / 1e6:.3f}M {unit}/s)", flush=True)


def main():
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    results = {"_spark": spark}
    synthesize(spark)

    from spark_shp import queries_analytics as qa  # noqa: F401
    from spark_shp import queries_eval as qe
    from spark_shp import queries_insights as qi
    from spark_shp import queries_rel as qr
    from spark_shp import queries_vision as qv

    timed("rolling_regression",
          lambda: qi.q_rolling_regression(spark, OUT)
          .selectExpr("COUNT(*) AS n",
                      "SUM(CAST(slope_cents_per_hour * 100 AS BIGINT))"
                      " AS s"), N, results)
    timed("group_sequential_test",
          lambda: qi.q_group_sequential(spark, OUT), N, results)
    timed("rayleigh_uniformity",
          lambda: qi.q_rayleigh_uniformity(spark, OUT), N, results)
    timed("type_profile_similarity",
          lambda: qi.q_type_profile_similarity(spark, OUT), N, results)
    timed("nearest_event_join",
          lambda: qr.q_nearest_event_join(spark, OUT)
          .selectExpr("COUNT(*) AS n", "SUM(delta_us) AS s"),
          N, results)
    timed("chaikin_smooth",
          lambda: qe.q_chaikin_smooth(spark, OUT)
          .selectExpr("COUNT(*) AS n", "SUM(x16) AS sx"), N, results)

    qv.VISION_N = 40000
    timed("image_median_cut",
          lambda: qv.q_image_median_cut(spark, OUT)
          .selectExpr("COUNT(*) AS n", "SUM(s0) AS s"),
          40000, results, unit="images")
    timed("image_color_pca",
          lambda: qv.q_image_color_pca(spark, OUT)
          .selectExpr("COUNT(*) AS n",
                      "SUM(CAST(eig_px * 100 AS BIGINT)) AS s"),
          40000, results, unit="images")

    results.pop("_spark")
    print(json.dumps({"n": N, "results": results}))


if __name__ == "__main__":
    main()
