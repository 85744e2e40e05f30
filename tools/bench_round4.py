"""Round-4 scale evidence: the de-serialized l_moments two-phase ranks
vs the old per-group rank window at 100M rows (VERDICT r3 item 4's >5x
done-criterion), the full ALS loop at >=10M ratings (item 5), and the
baseline JPEG codec's encode+decode throughput (item 6).

Methodology per the repo bench rules: clearCache() before each timed
trial, plan rebuilt per trial, min over trials.

Usage: python tools/bench_round4.py [n_rows] (default 100_000_000)
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_shp.hashing import u01_sql  # noqa: E402
from spark_shp.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
N_RATINGS = max(N // 5, 1_000_000)
OUT = "/tmp/bench_round4_sf"
TRIALS = 2


def synthesize(spark):
    marker = os.path.join(OUT, f"N_{N}")
    if os.path.isdir(os.path.join(OUT, "ratings.parquet")) \
            and os.path.exists(marker):
        return
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    (spark.range(0, N, 1, 256)
     .selectExpr(
         "id AS event_id",
         "CASE id % 5 WHEN 0 THEN 'view' WHEN 1 THEN 'click' "
         "WHEN 2 THEN 'purchase' WHEN 3 THEN 'scroll' "
         "ELSE 'search' END AS event_type",
         f"{u01_sql('id * 7 + 3')} * 1000.0 AS value")
     .write.parquet(f"{OUT}/events.parquet"))
    (spark.range(0, N_RATINGS, 1, 256)
     .selectExpr(
         "id % 2000000 AS u", "id % 40000 AS i",
         # planted rank-2-ish structure + hash noise
         f"((id % 2000000) % 7 + 1) * ((id % 40000) % 6 + 1) / 7.0 "
         f"+ {u01_sql('id * 13 + 1')} * 0.3 AS r")
     .write.parquet(f"{OUT}/ratings.parquet"))
    open(marker, "w").close()      # marker LAST (crash-safe resynthesis)


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

    from spark_shp import queries_insights as qi

    # --- l_moments: two-phase bucket ranks (the shipped path) ---------
    timed("l_moments_twophase",
          lambda: qi.q_l_moments(spark, OUT), N, results)

    # --- l_moments: the old per-group global rank window --------------
    def old_rank_window():
        spark.read.parquet(f"{OUT}/events.parquet") \
            .createOrReplaceTempView("events")
        return spark.sql(qi._lmom_sql())
    timed("l_moments_rankwindow", old_rank_window, N, results)

    # equality of the two formulations at full volume
    a = sorted(map(tuple, qi.q_l_moments(spark, OUT).collect()))
    spark.read.parquet(f"{OUT}/events.parquet") \
        .createOrReplaceTempView("events")
    b = sorted(map(tuple, spark.sql(qi._lmom_sql()).collect()))
    assert a == b, "two-phase != rank-window at bench volume"
    results["l_moments_equal"] = True
    results["l_moments_speedup"] = round(
        results["l_moments_rankwindow"]["sec"]
        / results["l_moments_twophase"]["sec"], 2)
    print(f"# l_moments speedup: {results['l_moments_speedup']}x, "
          f"results equal", flush=True)

    # --- full ALS loop at N_RATINGS ratings ---------------------------
    from spark_shp import als
    ratings = spark.read.parquet(f"{OUT}/ratings.parquet") \
        .selectExpr("u", "i", "r")
    t = time.time()
    users, items = als.als_train(ratings, rank=4, iters=2, lam=0.1,
                                 broadcast_items=True)
    n_users = users.count()
    wall = time.time() - t
    rmse = als.als_rmse(
        ratings.selectExpr("CAST(u AS BIGINT) u", "CAST(i AS BIGINT) i",
                           "CAST(r AS DOUBLE) r"), users, items, 4)
    # 2 iters x 2 half-steps = 4 passes over the ratings
    results["als_train"] = {
        "ratings": N_RATINGS, "rank": 4, "iters": 2,
        "n_users": n_users, "sec": round(wall, 2),
        "ratings_per_sec_per_halfstep": round(4 * N_RATINGS / wall),
        "train_rmse": round(rmse, 4),
    }
    print(f"# als_train: {N_RATINGS} ratings x 2 iters in {wall:.2f}s "
          f"(rmse {rmse:.4f})", flush=True)

    # --- jpeg codec throughput (distributed encode+decode QA) ---------
    from spark_shp import queries_vision as qv
    n_img_prev = qv.JPEG_QA_N
    qv.JPEG_QA_N = 5000          # 20k images across the 4 modes
    try:
        timed("jpeg_qa_20k", lambda: qv.q_jpeg_decode_stats(spark, OUT),
              4 * qv.JPEG_QA_N, results, unit="images")
    finally:
        qv.JPEG_QA_N = n_img_prev

    results.pop("_spark")
    results["n"] = N
    results["cpus"] = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(json.dumps(results))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "ROUND4.json"),
            "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
