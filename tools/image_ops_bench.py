"""Throughput of the decoded-bytes image kernels at curation-pipeline
volume: sobel / orientation / blob / histogram over a synthesized image
table (the EXACT kernels the gated queries call). Pixel throughput is the
honest unit — image sizes are mixed 16..80 px square.

Methodology per the repo bench rules: input cached and counted before
timing, fresh action per trial, min over trials, local[32].

Usage: python tools/image_ops_bench.py [n_images]   (default 200_000)
Writes BENCH/IMAGE_OPS.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    import numpy as np
    from pyspark.sql import functions as F
    from spark_shp import fixtures, multimodal
    from spark_shp.hashing import mix
    from spark_shp.session import get_spark

    spark = get_spark("image_ops_bench", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    img = fixtures.images_df(spark, n, partitions=256).cache()
    n_img = img.count()
    # exact pixel volume from the metadata formula (no decode needed)
    ids = np.arange(n, dtype=np.int64)
    w = 16 + (mix(ids * 5 + 1) % 5) * 16
    h = 16 + (mix(ids * 5 + 2) % 5) * 16
    n_px = int((w.astype(np.int64) * h * 3).sum())

    ops = {
        "sobel_checksums": lambda t: multimodal.sobel_checksums(t)
        .agg(F.sum("energy")),
        "orientation_checksums": lambda t: multimodal
        .orientation_checksums(t).agg(F.sum("n_px")),
        "blob_checksums": lambda t: multimodal.blob_checksums(t)
        .agg(F.sum("label_sum")),
        "histogram_checksums": lambda t: multimodal.histogram_checksums(t)
        .agg(F.sum("n_px")),
    }
    results = {}
    for name, fn in ops.items():
        fn(img).collect()                      # warm the plan shape
        times = []
        for _ in range(3):
            spark.catalog.clearCache()
            img.count()                        # re-pin the input cache
            t0 = time.time()
            fn(img).collect()
            times.append(time.time() - t0)
        best = min(times)
        results[name] = {
            "sec": round(best, 2),
            "images_per_sec": round(n_img / best),
            "mpx_per_sec": round(n_px / best / 1e6, 1),
        }
        print(f"# {name}: {best:.2f}s "
              f"({n_img / best / 1e3:.0f}k img/s, "
              f"{n_px / best / 1e6:.0f} Mpx/s)")

    doc = {
        "what": ("decoded-bytes image kernels (the gated B11 code paths) "
                 "at curation volume; mixed 16..80 px sizes, raw/png/qb"),
        "n_images": n_img, "n_subpixels": n_px, "cpus": 32,
        "method": "min of 3 fresh actions after warm-up, input cached "
                  "(clearCache + re-count per trial)",
        "results": results,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "IMAGE_OPS.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: v["mpx_per_sec"] for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
