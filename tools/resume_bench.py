"""Resume-from-checkpoint evidence at scale (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Job: tile-assign RESUME_IMAGES images at level 12, bucket by level-4 parent
cell, and checkpointed-write the bucketed output (per-bucket atomic lineage
manifests: cell range, rows). Run 1 is SIGKILLed mid-write from a watcher
thread once ~half the buckets have committed; run 2 resumes in a fresh
process and must (a) skip every committed bucket, (b) produce output
identical to an uninterrupted reference run.

Prints one JSON line with the kill point, resume work split, and wall
times. Usage: python tools/resume_bench.py  [RESUME_IMAGES=24000000]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("RESUME_IMAGES", "24000000"))
STAGE_INPUT = os.environ.get("RESUME_STAGE_INPUT", "1") == "1"
OUT = f"/tmp/spark_shp_bench/resume_{N}"


def _job(out_dir: str, kill_after: int | None):
    """Child entry: run the checkpointed write; optionally self-kill after
    kill_after manifests exist."""
    import glob
    import signal
    import threading

    from pyspark.sql import functions as F
    from bench import _images_table, read_images
    from spark_shp import cells, lineage, spatial
    from spark_shp.session import get_spark

    spark = get_spark("resume_bench", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    root = _images_table(spark, N)
    img = read_images(spark, root).select("image_id", "lon", "lat")
    img = spatial.tile_assign(img, "lon", "lat", 12, "cell")
    df = img.withColumn("bucket",
                        F.expr(cells.cell_parent_sql("cell", 8)))

    if kill_after is not None:
        def watcher():
            while True:
                done = len(glob.glob(os.path.join(out_dir, "_lineage",
                                                  "*.json")))
                if done >= kill_after:
                    os.kill(os.getpid(), signal.SIGKILL)
                time.sleep(0.05)
        threading.Thread(target=watcher, daemon=True).start()

    res = lineage.checkpointed_write(df, out_dir, "tile",
                                     bucket_col="bucket", cell_col="cell",
                                     stage_input=STAGE_INPUT)
    print(json.dumps(res))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--job":
        _job(sys.argv[2], int(sys.argv[3]) if sys.argv[3] != "none" else None)
        return

    ref, kill = OUT + "_ref", OUT + "_kill"
    for d in (ref, kill):
        shutil.rmtree(d, ignore_errors=True)

    def run(out_dir, kill_after, timeout=900):
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--job", out_dir,
             str(kill_after) if kill_after else "none"],
            capture_output=True, text=True, timeout=timeout)
        return time.time() - t0, p.returncode, p.stdout.strip()

    from spark_shp import lineage
    ref_s, rc, _ = run(ref, None)
    assert rc == 0
    n_buckets = len(lineage.completed_buckets(ref, "tile"))

    kill_s, rc, _ = run(kill, n_buckets // 2)
    assert rc == -9, f"expected SIGKILL, got {rc}"
    done_mid = lineage.completed_buckets(kill, "tile")
    ts_mid = {b: m["ts"] for b, m in done_mid.items()}

    resume_s, rc, out = run(kill, None)
    assert rc == 0
    res = json.loads(out.splitlines()[-1])
    done_end = lineage.completed_buckets(kill, "tile")
    assert set(done_end) == set(lineage.completed_buckets(ref, "tile"))
    untouched = all(done_end[b]["ts"] == ts for b, ts in ts_mid.items())
    rows_ref = sum(m["rows"] for m in
                   lineage.completed_buckets(ref, "tile").values())
    rows_kill = sum(m["rows"] for m in done_end.values())

    print(json.dumps({
        "metric": "checkpoint resume at scale (SIGKILL mid-write)",
        "images": N, "buckets": n_buckets,
        "committed_at_kill": len(done_mid),
        "resume_skipped": res["done"], "resume_new": res["new"],
        "committed_untouched_on_resume": untouched,
        "rows_match_reference": rows_kill == rows_ref,
        "uninterrupted_sec": round(ref_s, 1),
        "killed_run_sec": round(kill_s, 1),
        "resume_sec": round(resume_s, 1),
        "stage_input": STAGE_INPUT,
    }))


if __name__ == "__main__":
    main()
