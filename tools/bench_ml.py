"""Scale evidence for the session-5 operators: the EXACT gated code paths
at ~100-1000x the sf0.1 gate volume (tools/bench_mining.py 100M-row
synthesis reused), plus the propagation core on a 100M-edge synthetic
graph and the two new image kernels at 40k mixed-size images.

bpe_apply runs with vocabulary-matched merge literals (the gate corpus's
words don't exist in the bench vocab — same code path, module constant
overridden, the ripley precedent); the rewrite cost is the four doc-keyed
window passes either way.

Methodology per the repo bench rules: fresh plan per trial, clearCache()
before each timed trial, min over trials.

Usage: python tools/bench_ml.py [n_rows] (default 100_000_000)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_shp.session import get_spark  # noqa: E402

args = [a for a in sys.argv[1:] if not a.startswith("--")]
N = int(args[0]) if args else 100_000_000
ONLY = None
for a in sys.argv[1:]:
    if a.startswith("--only="):
        ONLY = set(a.split("=", 1)[1].split(","))
OUT = "/tmp/bench_mining_sf"
TRIALS = 2
N_IMAGES = 40_000
GRAPH_V = 10_000_000          # vertices for the propagation bench


def _timed(fn):
    best = None
    for _ in range(TRIALS):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main():
    import shutil

    import tools.bench_mining as bm
    from spark_shp import fixtures, multimodal
    from spark_shp import queries_ml as qm
    from spark_shp import queries_mining as qmin
    from spark_shp import queries_retrieval as qr
    from spark_shp.hashing import mix_sql

    bm.N = N
    spark = get_spark("bench_ml", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    bm.synthesize(spark)
    # documents need the lang column (added for readability_scores);
    # regenerate if an older cached dir lacks it
    if "lang" not in spark.read.parquet(f"{OUT}/documents.parquet").columns:
        shutil.rmtree(f"{OUT}/documents.parquet")
        bm._synthesize_documents(spark)
    gen_s = round(time.time() - t0, 1)

    results = {}

    def want(section):
        return ONLY is None or section in ONLY

    for name, fn, vol in (
            ("kmeans_rounds", qm.q_kmeans_rounds, N),
            ("isotonic_calibration", qm.q_isotonic_calibration, N),
            ("diff_in_diff", qm.q_diff_in_diff, N),
            ("hillshade_raster", qmin.q_hillshade_raster, N),
            ("readability_scores", qr.q_readability_scores, N)):
        if not want("core"):
            continue
        def run(fn=fn):
            spark.catalog.clearCache()
            return fn(spark, OUT).collect()
        best, rows = _timed(run)
        results[name] = {
            "rows_in": vol, "sec": round(best, 2),
            "rows_per_s_M": round(vol / best / 1e6, 1),
            "out_rows": len(rows)}
        print(name, results[name], flush=True)

    # bpe_apply with vocab-matched merges (4 ranks over 100M tokens).
    # NOTE: single trial — each rank localCheckpoints a full corpus copy;
    # run this section alone with SPARK_SHP_DRIVER_MEM>=48g at 100M.
    if want("bpe"):
        old = qr.BPE_APPLY_MERGES
        qr.BPE_APPLY_MERGES = (("w1", "w2"), ("w3", "w4"),
                               ("w1_w2", "w5"), ("w6", "w7"))
        try:
            t0 = time.time()
            rows = qr.q_bpe_apply(spark, OUT).collect()
            best = time.time() - t0
            results["bpe_apply_4ranks"] = {
                "tokens_in": N, "sec": round(best, 2),
                "tokens_per_s_M": round(N / best / 1e6, 1),
                "n_applied": sum(r["n_applied"] for r in rows)}
            print("bpe_apply", results["bpe_apply_4ranks"], flush=True)
        finally:
            qr.BPE_APPLY_MERGES = old

    # label propagation core on a synthetic 100M-edge graph
    if not want("spread"):
        print(json.dumps({"n_rows": N, "gen_s": gen_s, "trials": TRIALS,
                          "results": results}))
        return
    edges = spark.range(0, N, 1, 256).selectExpr(
        f"({mix_sql('id')}) % {GRAPH_V} AS s",
        f"({mix_sql('id * 2 + 1')}) % {GRAPH_V} AS d")
    edges.write.mode("overwrite").parquet(f"{OUT}/graph_edges.parquet")
    e = spark.read.parquet(f"{OUT}/graph_edges.parquet")
    seeds = spark.range(0, GRAPH_V, 1, 64).where(
        f"id % {qm.LS_SEED_MOD} = 0").selectExpr(
        "id AS vec_id", "CAST(id % 10 AS INT) AS lab")

    def run_spread():
        spark.catalog.clearCache()
        return (qm.label_spread(e, seeds, rounds=2)
                .groupBy("rnd").count().collect())
    best, rows = _timed(run_spread)
    results["label_spread_2rounds"] = {
        "edges_in": N, "vertices": GRAPH_V, "sec": round(best, 2),
        "edges_per_s_M": round(N / best / 1e6, 1),
        "labeled_by_round": {int(r["rnd"]): int(r["count"]) for r in rows}}
    print("label_spread", results["label_spread_2rounds"], flush=True)

    # image kernels at 40k mixed images (real decode, shape-grouped)
    imgp = f"{OUT}/images40k.parquet"
    if not os.path.isdir(imgp):
        fixtures.images_df(spark, N_IMAGES, partitions=256) \
            .write.parquet(imgp)
    stored = spark.read.parquet(imgp)
    for name, kern in (("ssim_requant_checksums",
                        multimodal.ssim_requant_checksums),
                       ("hough_votes", multimodal.hough_votes)):
        def run_img(kern=kern):
            spark.catalog.clearCache()
            return kern(stored).groupBy().count().collect()
        best, _ = _timed(run_img)
        results[name + "_40k"] = {
            "images": N_IMAGES, "sec": round(best, 2),
            "images_per_s": round(N_IMAGES / best, 0)}
        print(name, results[name + "_40k"], flush=True)

    print(json.dumps({"n_rows": N, "gen_s": gen_s, "trials": TRIALS,
                      "results": results}))


if __name__ == "__main__":
    main()
