"""Decode-layer micro-benchmark (BENCH/BASELINE.md 'shp-decode MB/s').

Generates N_FILES synthetic Point shapefiles (PTS_PER_FILE records each,
28 bytes/record + headers) with the test-only writer, then measures:

1. kernel MB/s — parser.parse_shp on one blob, single thread (the numpy
   frombuffer decode path, no Spark);
2. distributed MB/s — ingest.read_shapefiles over all files on
   local[$SPARK_GRAFT_CPUS]: binaryFile scan → per-layer decode kernels →
   geometry DataFrame, forced with a count.

A .shp is not block-splittable (sequential record scan), so the
distributed unit is one layer per task — at 100 TB the parallelism axis
is the number of files, which this reproduces.

Usage: python tools/micro_decode_bench.py   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = int(os.environ.get("DECODE_BENCH_FILES", "32"))
PTS_PER_FILE = int(os.environ.get("DECODE_BENCH_PTS", "500000"))


def _points_shp_vectorized(lon, lat) -> bytes:
    """Point shapefile composed as one numpy record array — byte-identical
    to shp.writer.write_shp([(POINT, (x, y)), ...]) (asserted in main for a
    small case) but O(n) instead of per-record Python: the test-only writer
    is fine for golden fixtures, not for 16M-record bench inputs."""
    import struct

    import numpy as np

    n = len(lon)
    rec = np.zeros(n, dtype=np.dtype([
        ("rec_no", ">i4"), ("len_words", ">i4"),
        ("shape", "<i4"), ("x", "<f8"), ("y", "<f8")]))
    rec["rec_no"] = np.arange(1, n + 1)
    rec["len_words"] = 10          # (4 + 16) bytes / 2
    rec["shape"] = 1               # POINT
    rec["x"], rec["y"] = lon, lat
    body = rec.tobytes()
    file_words = (100 + len(body)) // 2
    header = struct.pack(">7i", 9994, 0, 0, 0, 0, 0, file_words)
    header += struct.pack("<2i", 1000, 1)
    header += struct.pack("<8d", float(lon.min()), float(lat.min()),
                          float(lon.max()), float(lat.max()), 0, 0, 0, 0)
    return header + body


def main():
    import numpy as np
    from spark_shp.hashing import u01
    from spark_shp.shp import parser, writer
    from spark_shp.session import get_spark

    # byte-parity guard for the vectorized generator
    small_lon = np.array([1.5, -2.25]); small_lat = np.array([3.0, 4.75])
    assert _points_shp_vectorized(small_lon, small_lat) == writer.write_shp(
        [(writer.POINT, (float(x), float(y)))
         for x, y in zip(small_lon, small_lat)])

    out_dir = f"/tmp/spark_shp_bench/decode_{N_FILES}x{PTS_PER_FILE}"
    os.makedirs(out_dir, exist_ok=True)
    blobs = []
    for f in range(N_FILES):
        path = os.path.join(out_dir, f"layer{f:03d}.shp")
        if not os.path.exists(path):
            i = np.arange(PTS_PER_FILE, dtype=np.int64) + f * PTS_PER_FILE
            lon = u01(i * 13 + 5) * 360.0 - 180.0
            lat = u01(i * 13 + 9) * 170.0 - 85.0
            with open(path, "wb") as fh:
                fh.write(_points_shp_vectorized(lon, lat))
        blobs.append(path)
    total_bytes = sum(os.path.getsize(p) for p in blobs)

    # 1. single-thread kernels: parity path (per-record GeoJSON dicts) on a
    # 1-file sample, columnar fast path on the same blob
    with open(blobs[0], "rb") as fh:
        blob = fh.read()
    parser.parse_shp(blob)  # warm
    t0 = time.time()
    geoms = parser.parse_shp(blob)
    parity_s = time.time() - t0
    assert len(geoms) == PTS_PER_FILE
    parser.parse_shp_points_columns(blob)  # warm
    t0 = time.time()
    rec_no, x, y = parser.parse_shp_points_columns(blob)
    fast_s = time.time() - t0
    assert len(rec_no) == PTS_PER_FILE
    assert geoms[17]["coordinates"] == [x[17], y[17]]  # paths agree

    # 2. distributed: columnar fast ingest (the scale path) over all files
    from spark_shp import ingest
    spark = get_spark("decode_bench")
    spark.sparkContext.setLogLevel("ERROR")
    ingest.read_points_fast(spark, out_dir + "/*.shp").count()  # warm
    best = None
    for _ in range(3):
        t0 = time.time()
        n = ingest.read_points_fast(spark, out_dir + "/*.shp").count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    assert n == N_FILES * PTS_PER_FILE

    print(json.dumps({
        "metric": "shp decode throughput",
        "files": N_FILES, "points": n, "input_mb": round(total_bytes / 1e6, 1),
        "parity_kernel_mb_per_s_1thread": round(len(blob) / 1e6 / parity_s, 1),
        "columnar_kernel_mb_per_s_1thread": round(len(blob) / 1e6 / fast_s, 1),
        "distributed_fast_sec": round(best, 3),
        "distributed_fast_mb_per_s": round(total_bytes / 1e6 / best, 1),
        "distributed_fast_mrec_per_s": round(n / best / 1e6, 2),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
