"""End-to-end `spark-submit --py-files` deployment smoke (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

Builds dist/spark_shp.zip, then submits a REAL job from a directory that
does NOT contain the repo (so `import spark_shp` can only resolve from the
shipped zip), running the flagship shape at small scale: tile-assign →
broadcast-cover spatial join → per-fence counts, checked against literals
computed by an independent brute-force PIP in the job itself.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = textwrap.dedent('''
    import json
    from pyspark.sql import SparkSession, functions as F, types as T

    spark = (SparkSession.builder
             .appName("spark_shp_submit_smoke")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import spark_shp
    from spark_shp import spatial

    # prove the engine came from the shipped artifact, not a repo checkout
    src = spark_shp.__file__ or ""
    assert "spark_shp.zip" in src, f"engine imported from {src!r}"

    n = 20000
    pts = spark.range(n).selectExpr(
        "id AS event_id",
        "CAST(id % 360 AS DOUBLE) - 179.5 AS lon",
        "CAST((id * 7) % 170 AS DOUBLE) - 84.5 AS lat")

    boxes = {0: (10.0, -20.0, 60.0, 30.0),
             1: (-120.0, 10.0, -60.0, 70.0)}
    rows = []
    for pid, (x0, y0, x1, y1) in boxes.items():
        ring = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
        rows.append((pid, [[ring]], (x0, y0, x1, y1)))
    schema = T.StructType([
        T.StructField("poly_id", T.LongType()),
        T.StructField("coordinates", T.ArrayType(T.ArrayType(
            T.ArrayType(T.ArrayType(T.DoubleType()))))),
        T.StructField("bbox", T.StructType(
            [T.StructField(c, T.DoubleType())
             for c in ("xmin", "ymin", "xmax", "ymax")])),
    ])
    polys = spark.createDataFrame(rows, schema)

    joined = spatial.spatial_join(pts, polys, "lon", "lat", level=8)
    got = {int(r["poly_id"]): r["n"] for r in
           joined.groupBy("poly_id").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}

    # independent expectation: brute-force PIP on the driver (lattice
    # points sit at half-integers, boxes at integers — no boundary cases)
    import numpy as np
    ev = np.arange(n, dtype=np.int64)
    lon = (ev % 360).astype(float) - 179.5
    lat = ((ev * 7) % 170).astype(float) - 84.5
    exp = {pid: int(((lon > x0) & (lon < x1)
                     & (lat > y0) & (lat < y1)).sum())
           for pid, (x0, y0, x1, y1) in boxes.items()}
    assert got == exp, (got, exp)

    # tile-assign is pure codegen SQL from the zip too
    tiles = spatial.tile_assign(pts, "lon", "lat", 8)
    n_cells = tiles.select("cell_id").distinct().count()
    print("RESULT " + json.dumps(
        {"fences": {str(k): v for k, v in got.items()},
         "n_cells": n_cells}))
    spark.stop()
''')


def test_spark_submit_py_files(tmp_path):
    zip_src = os.path.join(REPO, "dist", "spark_shp.zip")
    sys.path.insert(0, REPO)
    from tools.package import build
    build(zip_src)

    # copy the artifact out of the repo and run from a bare directory so
    # the only way `import spark_shp` resolves is through --py-files
    zip_path = str(tmp_path / "spark_shp.zip")
    shutil.copy(zip_src, zip_path)
    job = tmp_path / "job.py"
    job.write_text(JOB)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    proc = subprocess.run(
        [submit, "--master", "local[4]",
         "--py-files", zip_path,
         "--conf", "spark.driver.extraJavaOptions=-XX:-DontCompileHugeMethods",
         "--conf",
         "spark.executor.extraJavaOptions=-XX:-DontCompileHugeMethods",
         str(job)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=390)
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("RESULT ")]
    assert line, proc.stdout[-2000:] + proc.stderr[-2000:]
    result = json.loads(line[-1][len("RESULT "):])
    assert result["n_cells"] > 100
    assert sum(result["fences"].values()) > 0
