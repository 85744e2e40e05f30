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
                       throttle: float = 0.0,
                       stage_input: bool = False) -> dict:
    """Write ``df`` bucket-by-bucket with per-bucket lineage commits; skips
    buckets already committed (resume). Returns {"done": n_prior, "new": n}.

    ``stage_input=True`` additionally materializes the INPUT bucketed by
    ``bucket_col`` under ``<out_dir>/_staged/<stage>/`` on the first run
    (Spark's all-or-nothing job commit, marker-file committed), and every
    resume reads the staged parquet with the completed buckets
    anti-filtered — partition pruning on the ``bucket=`` directories skips
    their bytes entirely, so resume cost is ∝ remaining buckets instead of
    re-running the whole upstream plan (VERDICT r1 #9: 31.1 s resume vs
    41.3 s full was upstream recompute). Costs one extra write+read of the
    input on the first run; worth it when the upstream (decode + shuffle)
    dominates, which is the 100 TB shape.
    """
    from pyspark.sql import types as T

    os.makedirs(_lineage_dir(out_dir), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "data"), exist_ok=True)
    prior = completed_buckets(out_dir, stage)
    if stage_input:
        df = _stage_input(df, out_dir, stage, bucket_col)
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


def _stage_input(df: DataFrame, out_dir: str, stage: str,
                 bucket_col: str) -> DataFrame:
    """Materialize ``df`` partitioned by bucket (once); return a reader over
    the staged copy. The marker file is the commit point — a crash during
    staging leaves no marker and the next run re-stages from the upstream
    plan. The bucket column is cast back to its upstream dtype (hive
    partition inference narrows it) so output parquet schemas stay
    identical across original and resumed runs."""
    spark = df.sparkSession
    staged = os.path.join(out_dir, "_staged", stage)
    data = os.path.join(staged, "data")
    marker = os.path.join(staged, "_committed.json")
    orig_dtype = dict(df.dtypes)[bucket_col]
    if not os.path.exists(marker):
        df.write.mode("overwrite").partitionBy(bucket_col).parquet(data)
        tmp = os.path.join(staged, ".commit.tmp")
        with open(tmp, "w") as f:
            json.dump({"stage": stage, "ts": time.time(),
                       "bucket_col": bucket_col}, f)
        os.replace(tmp, marker)
    out = spark.read.parquet(data)
    return (out.withColumn(bucket_col,
                           F.col(bucket_col).cast(orig_dtype))
            .select(*df.columns))


def read_output(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))
