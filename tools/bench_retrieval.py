"""Scale evidence for the retrieval/ranking batch: run the EXACT gated code
paths (same functions __spark_entry__ serves) at ~1000x the sf0.1 gate
volume and record throughput.

- bm25_search       : 10M docs x 10 tokens (100M tokens), 4 queries over
                      the synthetic w-vocab (the gate's literal terms
                      don't exist in this vocab, so the bench passes its
                      own query set through the same bm25_topk code path)
- bpe_learn_merges  : 3 full corpus-rewrite rounds at 2M docs (20M
                      tokens) AND 10M docs (100M tokens) — the iterative
                      rewrite is the scale-sensitive part
- link_prediction   : 100M-row synthetic lineitem (same quantity filter,
                      wedge join bounded by the filtered degree)
- rle / histogram   : the image kernels at 40k real-decoded images
- audio ZCR         : 4096 synthesized+RIFF-decoded streams

Methodology per the repo bench rules: clearCache() before each timed
trial, plan rebuilt per trial, min over trials.

Usage: python tools/bench_retrieval.py [n_rows]  (default 100_000_000)
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_shp.hashing import mix_sql, u01_sql  # noqa: E402
from spark_shp.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
OUT = "/tmp/bench_retrieval_sf"
TRIALS = 2

BENCH_QUERIES = [  # same slot shape as the gate's BM25_QUERIES
    (1, 1, "w7"), (1, 2, "w401"),
    (2, 1, "w13"), (2, 2, "w14"), (2, 3, "w15"),
    (3, 1, "w999"), (3, 2, "w0"),
    (4, 1, "w50"), (4, 2, "w51"), (4, 3, "w52"),
]


def synthesize(spark):
    if os.path.isdir(os.path.join(OUT, "lineitem.parquet")):
        return
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    # documents: N/10 docs x 10 tokens from a 1000-word vocab (matches
    # bench_mining's corpus shape)
    words = " || ' ' || ".join(
        f"concat('w', ({mix_sql(f'id * 10 + {k}')}) % 1000)"
        for k in range(10))
    (spark.range(0, N // 10, 1, 256)
     .selectExpr("id AS doc_id", f"{words} AS text")
     .write.parquet(f"{OUT}/documents.parquet"))
    (spark.range(0, N // 50, 1, 64)
     .selectExpr("id AS doc_id", f"{words} AS text")
     .write.parquet(f"{OUT}_small/documents.parquet"))
    # lineitem: 4 lines per order, 2M parts, gate-shaped quantity range
    (spark.range(0, N, 1, 256)
     .selectExpr(
         "CAST(id / 4 AS BIGINT) AS l_orderkey",
         f"({mix_sql('id * 3 + 1')}) % 2000000 AS l_partkey",
         f"1.0 + FLOOR({u01_sql('id * 5 + 2')} * 50.0) AS l_quantity")
     .write.parquet(f"{OUT}/lineitem.parquet"))


def timed(name, fn, rows, results, unit="rows"):
    spark = results["_spark"]
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
    print(f"# {name}: {rows} {unit} in {best:.2f}s "
          f"({rows / best / 1e6:.2f}M {unit}/s)")


def main():
    from spark_shp import fixtures, multimodal
    from spark_shp.queries_retrieval import (
        bm25_topk, q_audio_zcr_windows, q_bpe_learn_merges,
        q_link_prediction)

    spark = get_spark("bench_retrieval", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    synthesize(spark)
    gen_s = round(time.time() - t0, 1)
    results = {"_spark": spark}

    docs = lambda: spark.read.parquet(f"{OUT}/documents.parquet")  # noqa
    timed("bm25_search", lambda: bm25_topk(spark, docs(), BENCH_QUERIES),
          N, results, unit="tokens")
    timed("link_prediction", lambda: q_link_prediction(spark, OUT),
          N, results)
    timed("bpe_learn_merges_20m",
          lambda: q_bpe_learn_merges(spark, f"{OUT}_small"),
          N // 5, results, unit="tokens")
    timed("bpe_learn_merges_100m",
          lambda: q_bpe_learn_merges(spark, OUT),
          N, results, unit="tokens")

    n_img = 40_000
    img = fixtures.images_df(spark, n_img, partitions=64)
    timed("image_rle_runs",
          lambda: multimodal.rle_run_counts(img)
          .groupBy().agg({"runs": "sum", "n_px": "sum"}),
          n_img, results, unit="images")
    timed("image_histogram_256",
          lambda: multimodal.histogram_checksums(img, buckets=256)
          .groupBy("bucket").agg({"n_px": "sum"}),
          n_img, results, unit="images")
    timed("audio_zcr_windows",
          lambda: q_audio_zcr_windows(spark, OUT, n_streams=4096,
                                      partitions=64),
          4096, results, unit="streams")

    del results["_spark"]
    doc = {
        "n_rows": N, "gen_sec": gen_s, "trials": TRIALS,
        "host_cpus": os.cpu_count(), "results": results,
        "note": ("EXACT gated code paths at ~1000x sf0.1 gate volume; "
                 "bm25/bpe measured in tokens, images in real-decoded "
                 "images, ZCR in RIFF-decoded streams"),
    }
    with open("BENCH/RETRIEVAL.json", "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({k: v.get("sec") for k, v in results.items()}))


if __name__ == "__main__":
    main()
