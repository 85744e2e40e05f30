"""Batched vs per-row multimodal feature kernels (VERDICT r1 perf #10).

Times spark_shp.multimodal.image_features (shape-grouped stacked numpy) vs
the round-1 per-row itertuples variant (re-implemented inline here as the
baseline) on the same synthetic image table. Writes one JSON line; copy to
BENCH/MULTIMODAL.json.

Usage: python tools/multimodal_bench.py [n_images]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T


def perrow_image_features(images: DataFrame) -> DataFrame:
    """Round-1 implementation, verbatim shape: itertuples + per-image ops."""
    from spark_shp import codecs
    from spark_shp.multimodal import FEATURE_SCHEMA

    def work(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = codecs.decode(bytes(r.bytes), int(r.w), int(r.h),
                                   r.fmt).astype(np.float64)
                gray = px.mean(axis=2)
                gy, gx = np.gradient(gray)
                h, w = gray.shape
                hh, ww = (h // 8) * 8, (w // 8) * 8
                thumb = (gray[:hh, :ww]
                         .reshape(8, hh // 8, 8, ww // 8).mean(axis=(1, 3)))
                rows.append((r.image_id,
                             px.mean(axis=(0, 1)).tolist(),
                             float(gray.std()),
                             float(np.sqrt(gx ** 2 + gy ** 2).mean()),
                             (thumb.ravel() / 255.0).tolist()))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in FEATURE_SCHEMA])

    return (images.select("image_id", "bytes", "w", "h", "fmt")
            .mapInPandas(work, FEATURE_SCHEMA))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    sys.path.insert(0, "/root/repo")
    from spark_shp import fixtures, multimodal
    from spark_shp.session import get_spark

    spark = get_spark(cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    img = fixtures.images_df(spark, n, partitions=32)
    img.cache().count()
    # uniform-size table (what a resize stage feeds downstream): the case
    # shape-grouped stacking is FOR — mixed sizes degrade to tiny groups
    uni = multimodal.resize_images(img, 48, 48).cache()
    uni.count()

    def best_of(fn, table, trials=3):
        times = []
        for _ in range(trials):
            t0 = time.time()
            fn(table).agg({"std_gray": "sum"}).collect()
            times.append(time.time() - t0)
        return min(times)

    # warm both plan shapes once before timing
    best_of(multimodal.image_features, img, 1)
    best_of(perrow_image_features, img, 1)
    batched = best_of(multimodal.image_features, img)
    perrow = best_of(perrow_image_features, img)
    batched_uni = best_of(multimodal.image_features, uni)
    perrow_uni = best_of(perrow_image_features, uni)

    # value parity: identical rows up to fp reduction order
    a = {r.image_id: r for r in
         multimodal.image_features(img.limit(64)).collect()}
    b = {r.image_id: r for r in perrow_image_features(img.limit(64)).collect()}
    assert set(a) == set(b)
    for k in a:
        assert np.allclose(a[k].thumb64, b[k].thumb64, atol=1e-9)
        assert abs(a[k].std_gray - b[k].std_gray) < 1e-9
        assert abs(a[k].edge_energy - b[k].edge_energy) < 1e-9

    print(json.dumps({
        "bench": "multimodal_image_features", "n_images": n,
        "mixed_sizes": {"perrow_sec": round(perrow, 3),
                        "batched_sec": round(batched, 3),
                        "speedup": round(perrow / batched, 2)},
        "uniform_48x48": {"perrow_sec": round(perrow_uni, 3),
                          "batched_sec": round(batched_uni, 3),
                          "speedup": round(perrow_uni / batched_uni, 2)},
        "note": "same-(w,h,fmt) stacked numpy kernels vs round-1 itertuples; "
                "min of 3 after warm-up, inputs cached, local[32]; uniform = "
                "resize_images(48x48) output, the shape a resize stage feeds",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
