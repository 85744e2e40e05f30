"""Hilbert vs Morton clustering at the STORAGE layer: write the same 1M-row
point table twice through iceberg_layout.write_table — once cluster_by the
Morton key, once cluster_by the Hilbert key (same level-10 grid, same file
count) — then measure, for a set of small bbox queries, how many data files
a manifest-bounds reader must touch under each curve.

A file is touched iff its recorded [min, max] cluster-key bounds contain at
least one of the query's cell keys (exact membership via searchsorted over
the sorted cover keys — the lower bound of what ANY range-decomposed reader
reads). Hilbert's unit-step locality claim (pytest: mean |Δd| beats Morton
on adjacent hops) should translate into fewer files per bbox here — this
script turns the claim into a storage-level number.

Usage: python tools/bench_clustering.py [n_rows] [n_queries]
Writes BENCH/CLUSTERING.json.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from spark_shp import cells, fixtures, iceberg_layout  # noqa: E402
from spark_shp.queries_analytics import (HILBERT_BITS,  # noqa: E402
                                         hilbert_branchless_stages,
                                         hilbert_d_np)
from spark_shp.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 200
LEVEL = 10
FILES = 1024   # ~1k keys per file: fine enough to expose curve locality
ROOT = "/tmp/bench_clustering"


def build_tables(spark):
    m = fixtures.images_meta_sql("id")
    ix, iy = cells.quantize_sql(m["lon"], m["lat"], LEVEL)
    base = spark.range(0, N, 1, 64).selectExpr(
        "id AS img", f"{ix} AS hx", f"{iy} AS hy")
    mort = base.selectExpr(
        "img", "hx", "hy", f"{cells.morton_sql('hx', 'hy')} AS ckey")
    d = base
    for stage in hilbert_branchless_stages(LEVEL):
        d = d.selectExpr("img", "hx", "hy", *stage)
    hil = d.selectExpr("img", "hx", "hy", "hd AS ckey")
    out = {}
    for name, df in (("morton", mort), ("hilbert", hil)):
        root = f"{ROOT}/{name}"
        if os.path.isdir(root):
            shutil.rmtree(root)
        iceberg_layout.write_table(df, root, cluster_by="ckey",
                                   cluster_partitions=FILES)
        out[name] = root
    return out


def file_bounds(root):
    stats = iceberg_layout.table_stats(root)
    b = []
    for f in stats["files"]:
        lo, hi = f["bounds"]["ckey"]
        b.append((int(lo), int(hi)))
    return sorted(b)


def main():
    spark = get_spark("bench_clustering", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    roots = build_tables(spark)
    build_s = round(time.time() - t0, 1)
    bounds = {k: file_bounds(v) for k, v in roots.items()}

    rng = np.random.default_rng(42)
    n_grid = 1 << LEVEL
    span_deg = 4.0     # ~12 x 24 cells at level 10
    touched = {"morton": [], "hilbert": []}
    for q in range(NQ):
        lon0 = rng.uniform(-178.0, 176.0)
        lat0 = rng.uniform(-83.0, 81.0)
        cover = fixtures_bbox_cells(lon0, lat0, lon0 + span_deg,
                                    lat0 + span_deg)
        ix, iy = cover
        keys = {
            "morton": np.sort(cells.morton(ix, iy, LEVEL)),
            "hilbert": np.sort(hilbert_d_np(ix, iy, LEVEL)),
        }
        for curve in ("morton", "hilbert"):
            ks = keys[curve]
            n = 0
            for lo, hi in bounds[curve]:
                i = np.searchsorted(ks, lo)
                if i < len(ks) and ks[i] <= hi:
                    n += 1
            touched[curve].append(n)

    doc = {
        "what": ("storage-level clustering comparison: files a "
                 "manifest-bounds reader touches per small bbox query, "
                 "same table/keys/file-count, Morton vs Hilbert "
                 "cluster_by"),
        "n_rows": N, "level": LEVEL, "files": FILES,
        "n_queries": NQ, "bbox_deg": span_deg, "build_sec": build_s,
        "results": {
            c: {
                "mean_files": round(float(np.mean(touched[c])), 3),
                "median_files": float(np.median(touched[c])),
                "p90_files": float(np.percentile(touched[c], 90)),
                "max_files": int(np.max(touched[c])),
            } for c in ("morton", "hilbert")
        },
    }
    doc["results"]["hilbert_vs_morton_mean_ratio"] = round(
        doc["results"]["hilbert"]["mean_files"]
        / doc["results"]["morton"]["mean_files"], 4)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "CLUSTERING.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["results"], indent=1))
    spark.stop()


def fixtures_bbox_cells(xmin, ymin, xmax, ymax):
    """(ix[], iy[]) of every level-LEVEL cell intersecting the bbox, via
    the same quantization rule the SQL uses."""
    n = 1 << LEVEL
    qx = lambda lon: min(n - 1, max(0, int(np.floor((lon + 180.0)
                                                    / 360.0 * n))))
    qy = lambda lat: min(n - 1, max(0, int(np.floor((lat + 85.0)
                                                    / 170.0 * n))))
    x0, x1 = qx(xmin), qx(xmax)
    y0, y1 = qy(ymin), qy(ymax)
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return gx.ravel(), gy.ravel()


if __name__ == "__main__":
    main()
