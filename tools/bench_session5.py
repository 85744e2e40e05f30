"""Scale evidence for the continuation-session-5 batch: run the EXACT
gated code paths (same functions __spark_entry__ serves) at ~1000x the
sf0.1 gate volume and record throughput.

- detection_iou_match : 200M images (map-only unroll + tiny rollup)
- nms_boxes           : 200M images (map-only boolean unroll)
- map_match_roads     : 100M GPS points vs the 200-segment network
                        (~20 candidates/point through the ring join)
- idw_interpolation   : 100M samples, 64 probes (zero corpus shuffles)
- tile_render_png     : 100M points -> 1024 rendered png tiles
- video_motion_vectors: 4096 RIFF-decoded AVIs, 25-offset SAD search

Methodology per the repo bench rules: clearCache() before each timed
trial, plan rebuilt per trial, min over trials.

Usage: python tools/bench_session5.py [n_rows] (default 100_000_000)
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
OUT = "/tmp/bench_session5_sf"
TRIALS = 2


def synthesize(spark):
    if os.path.isdir(os.path.join(OUT, "events.parquet")):
        return
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    (spark.range(0, N, 1, 256)
     .selectExpr("id AS event_id",
                 f"{u01_sql('id * 7 + 3')} * 1000.0 AS value")
     .write.parquet(f"{OUT}/events.parquet"))


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
    results = {"_spark": spark}
    synthesize(spark)

    from spark_shp import queries_insights as qi
    from spark_shp import queries_vision as qv

    qv.DET_N = N * 2
    timed("detection_iou_match", lambda: qv.q_detection_iou_match(
        spark, OUT), N * 2, results, unit="images")

    qv.NMS_N = N * 2
    timed("nms_boxes", lambda: qv.q_nms_boxes(spark, OUT),
          N * 2, results, unit="images")

    timed("map_match_roads", lambda: qi.q_map_match_roads(spark, OUT),
          N, results)
    timed("idw_interpolation", lambda: qi.q_idw_interpolation(spark, OUT),
          N, results)
    timed("tile_render_png", lambda: qv.q_tile_render_png(spark, OUT),
          N, results)

    qi.N_MV_AVI = 4096
    timed("video_motion_vectors", lambda: qi.q_video_motion_vectors(
        spark, OUT), 4096, results, unit="videos")

    results.pop("_spark")
    print(json.dumps({"n": N, "results": results}))


if __name__ == "__main__":
    main()
