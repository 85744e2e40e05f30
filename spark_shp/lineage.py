"""Per-partition lineage checkpoints + mid-job resume (SURVEY.md §2.B B14).

BASELINE.json: "each stage checkpoints per-partition lineage (cell ranges,
row counts, bytes decoded) so jobs resume mid-shuffle."

Protocol (shared-filesystem commit, works in local mode and on a cluster FS):

* work is keyed by an int ``bucket`` column (typically ``pmod(cell_id, B)`` —
  cell-range buckets, so lineage records cell ranges naturally);
* each task writes its bucket's output to ``data/bucket=K/part.parquet`` and
  then ATOMICALLY renames a manifest ``_lineage/<stage>-bucket-K.json``
  carrying {stage, bucket, cell_min, cell_max, rows, bytes, status, ts};
  the manifest is the commit point — partial parquet without a manifest is
  invisible to readers and harmlessly overwritten on retry (idempotent
  filenames);
* resume = list committed manifests → anti-filter those buckets from the
  input → process only the remainder. A SIGKILL mid-job loses at most the
  uncommitted buckets' work.

Spark's own batch commit is all-or-nothing per job; this protocol is what
makes a 10^12-row decode restartable at bucket granularity (SURVEY §4.2).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F


def _lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def completed_buckets(out_dir: str, stage: str) -> dict[int, dict]:
    """Read committed manifests → {bucket: manifest}."""
    d = _lineage_dir(out_dir)
    out = {}
    if not os.path.isdir(d):
        return out
    for fn in os.listdir(d):
        if fn.startswith(f"{stage}-bucket-") and fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                m = json.load(f)
            out[int(m["bucket"])] = m
    return out


def checkpointed_write(df: DataFrame, out_dir: str, stage: str,
                       bucket_col: str = "bucket",
                       cell_col: str | None = None,
                       bytes_col: str | None = None,
                       throttle: float = 0.0) -> dict:
    """Write ``df`` bucket-by-bucket with per-bucket lineage commits; skips
    buckets already committed (resume). Returns {"done": n_prior, "new": n}.
    """
    from pyspark.sql import types as T

    os.makedirs(_lineage_dir(out_dir), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "data"), exist_ok=True)
    prior = completed_buckets(out_dir, stage)
    todo = df
    if prior:
        todo = df.where(~F.col(bucket_col).isin(list(prior)))

    def write_group(pdf):
        # one Arrow batch per bucket (groupBy applyInPandas) — vectorized
        # end to end; the earlier foreachPartition per-Row tuple loop cost
        # more than the actual parquet write
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not len(pdf):
            return pd.DataFrame({"bucket": [], "rows": []})
        bucket = int(pdf[bucket_col].iloc[0])
        if throttle:  # test-only hook: widens the kill-resume window
            time.sleep(throttle)
        ddir = os.path.join(out_dir, "data", f"bucket={bucket}")
        os.makedirs(ddir, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(ddir, "part.parquet"))
        manifest = {
            "stage": stage, "bucket": bucket, "rows": len(pdf),
            "status": "done", "ts": time.time(),
            "cell_min": (int(pdf[cell_col].min()) if cell_col else None),
            "cell_max": (int(pdf[cell_col].max()) if cell_col else None),
            "bytes": (int(pdf[bytes_col].sum()) if bytes_col else None),
        }
        tmp = os.path.join(_lineage_dir(out_dir),
                           f".tmp-{stage}-bucket-{bucket}.json")
        final = os.path.join(_lineage_dir(out_dir),
                             f"{stage}-bucket-{bucket}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, final)  # atomic commit point
        return pd.DataFrame({"bucket": [bucket], "rows": [len(pdf)]})

    stats_schema = T.StructType([T.StructField("bucket", T.LongType()),
                                 T.StructField("rows", T.LongType())])
    new = (todo.groupBy(bucket_col)
           .applyInPandas(write_group, stats_schema).count())
    return {"done": len(prior), "new": int(new)}


def read_output(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))
