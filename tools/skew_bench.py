"""Skew-join evidence (north rule: "skew from dense cells is handled with
salted repartitioning and AQE").

The synthetic images table pins ~30% of all rows in one level-6 cell
(FIXTURES.md skew injection). This bench forces a SHUFFLE join on that cell
key (auto-broadcast disabled — the stand-in for a build side too big to
broadcast) against a per-cell dimension, and times three plans:

  plain   sort-merge join, AQE skew-join OFF  → the hot cell's partition is
          one straggler task doing ~30% of the probe work
  aqe     AQE skew-join ON (Spark splits the skewed partition at runtime)
  salted  explicit B13 salting (salt_hot_cells / explode_salts): hot probe
          rows fan out over salt_factor sub-keys, build side replicates —
          works even where AQE cannot re-plan (first-shuffle aggregations,
          pre-partitioned stages)

Prints one JSON line with the three wall times. Uses the cached bench table
(built by bench.py / _images_table).

Usage: python tools/skew_bench.py  [env: SKEW_BENCH_IMAGES=24000000]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("SKEW_BENCH_IMAGES", "24000000"))
LEVEL = 6
SALT = 16


def main():
    from pyspark.sql import functions as F
    from bench import _images_table, read_images, warm_python_workers
    from spark_shp import cells, spatial
    from spark_shp.session import get_spark

    spark = get_spark("skew_bench")
    spark.sparkContext.setLogLevel("ERROR")
    root = _images_table(spark, N)
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(32 * 1024 * 1024))
    # force a real shuffle join: no auto-broadcast anywhere
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    warm_python_workers(spark)

    def probe():
        img = read_images(spark, root).select("lon", "lat")
        return spatial.tile_assign(img, "lon", "lat", LEVEL, "cell")

    # build side: 16 rows per distinct level-6 cell (big enough that Spark
    # must shuffle it, keyed so every probe row matches 16 build rows)
    def build():
        cs = probe().select("cell").distinct()
        return (cs.crossJoin(spark.range(16).withColumnRenamed("id", "slot"))
                .withColumn("weight", (F.col("cell") % 97 + F.col("slot"))
                            .cast("double")))

    bdf = build().localCheckpoint()  # materialize once, reuse across plans

    def run(mode):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                       "true" if mode == "aqe" else "false")
        p = probe()
        if mode == "salted":
            p_s, hot = spatial.salt_hot_cells(p, "cell", top_n=4,
                                              salt_factor=SALT)
            b_s = spatial.explode_salts(bdf, "cell", hot, salt_factor=SALT)
            j = p_s.join(b_s.drop("cell"), "_salted_cell")
        else:
            j = p.join(bdf, "cell")
        t0 = time.time()
        out = j.groupBy().agg(F.count(F.lit(1)).alias("n"),
                              F.sum("weight").alias("w")).collect()
        return time.time() - t0, out[0]["n"]

    results, expect = {}, None
    for mode in ("plain", "aqe", "salted"):
        run(mode)  # warm plan/JIT
        best, n = min(run(mode) for _ in range(3)), None
        sec, n = best
        results[mode] = round(sec, 3)
        if expect is None:
            expect = n
        assert n == expect, f"{mode} row count {n} != {expect}"

    print(json.dumps({
        "metric": "skew shuffle-join wall s (30%-hot level-6 cell, "
                  "x16 build fanout, broadcast disabled)",
        "images": N, "joined_rows": expect,
        "plain_sec": results["plain"],
        "aqe_skewjoin_sec": results["aqe"],
        "salted_sec": results["salted"],
        "salted_speedup_vs_plain": round(
            results["plain"] / results["salted"], 2),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
