"""Scale evidence for the insight operators (round-3 continuation): run the
EXACT gated query code paths against the 100M-row synthesized tables from
tools/bench_mining.py (reused if present), plus the image kernels at 40k
mixed-size images, and record throughput.

Ripley's K is benched with SCALED parameters (cell level 12, radii 5e3/1e4
udeg): the operator's ring level must match the radius — at 100M world-
uniform points the gate's 2-degree radius implies ~1e12 qualifying pairs
(the K function is inherently O(n^2 * density * r^2)), which no engine
returns; the bench demonstrates the radius/level knob that keeps candidate
pairs O(n). Same code path, module constants overridden.

Methodology per the repo bench rules: fresh plan per trial,
spark.catalog.clearCache() before each timed trial (CacheManager matches
canonicalized plans across DataFrame objects), min over trials.

Usage: python tools/bench_insights.py [n_rows] (default 100_000_000)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_shp.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
OUT = "/tmp/bench_mining_sf"
TRIALS = 2
N_IMAGES = 40_000


def main():
    import tools.bench_mining as bm
    from spark_shp import fixtures, multimodal
    from spark_shp import queries_insights as qi

    bm.N = N
    spark = get_spark("bench_insights", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    bm.synthesize(spark)
    gen_s = round(time.time() - t0, 1)

    ops = [
        ("std_dev_ellipse", qi.q_std_dev_ellipse, N),
        ("emerging_hotspots", qi.q_emerging_hotspots, N),
        ("strahler_order", qi.q_strahler_order, N),
        ("k_anonymity", qi.q_k_anonymity, N),
        ("ewma_forecast", qi.q_ewma_forecast, N),
        ("ab_test_ztest", qi.q_ab_test_ztest, N),
        ("zipf_fit", qi.q_zipf_fit, N),        # N/10 docs x 10 tokens
    ]

    results = {}
    for name, fn, vol in ops:
        best = None
        for _ in range(TRIALS):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = fn(spark, OUT).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[name] = {
            "rows_in": vol, "sec": round(best, 2),
            "rows_per_s": round(vol / best / 1e6, 1), "out_rows": len(rows)}
        print(name, results[name], flush=True)

    # ripley with scale-matched radius/ring level (same code path)
    qi.RIPLEY_CELL, old_cell = 12, qi.RIPLEY_CELL
    qi.RIPLEY_R_UDEG, old_r = (5000, 10000), qi.RIPLEY_R_UDEG
    try:
        best = None
        for _ in range(TRIALS):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = qi.q_ripley_k_bands(spark, OUT).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results["ripley_k_bands_r0.01deg_lvl12"] = {
            "rows_in": N, "sec": round(best, 2),
            "rows_per_s": round(N / best / 1e6, 1),
            "n_pairs_10000": rows[0]["n_pairs_10000"]}
        print("ripley", results["ripley_k_bands_r0.01deg_lvl12"], flush=True)
    finally:
        qi.RIPLEY_CELL, qi.RIPLEY_R_UDEG = old_cell, old_r

    # image kernels at 40k mixed images (real decode, shape-grouped)
    img = fixtures.images_df(spark, N_IMAGES, partitions=256)
    img.write.mode("overwrite").parquet(f"{OUT}/images40k.parquet")
    stored = spark.read.parquet(f"{OUT}/images40k.parquet")
    for name, kern in (
            ("glcm_checksums", multimodal.glcm_checksums),
            ("equalize_checksums", multimodal.equalize_checksums),
            ("distortion_checksums", multimodal.distortion_checksums)):
        best = None
        for _ in range(TRIALS):
            spark.catalog.clearCache()
            t0 = time.time()
            n = kern(stored).groupBy().sum().collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            _ = n
        results[name + "_40k"] = {
            "images": N_IMAGES, "sec": round(best, 2),
            "images_per_s": round(N_IMAGES / best, 0)}
        print(name, results[name + "_40k"], flush=True)

    print(json.dumps({"n_rows": N, "gen_s": gen_s, "trials": TRIALS,
                      "results": results}))


if __name__ == "__main__":
    main()
