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
    os.makedirs(_lineage_dir(out_dir), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "data"), exist_ok=True)
    prior = completed_buckets(out_dir, stage)
    todo = df
    if prior:
        todo = df.where(~F.col(bucket_col).isin(list(prior)))
    n_buckets = (todo.select(bucket_col).distinct().count())
    if n_buckets == 0:
        return {"done": len(prior), "new": 0}

    cols = todo.columns
    cell_ix = cols.index(cell_col) if cell_col else None
    bytes_ix = cols.index(bytes_col) if bytes_col else None
    bucket_ix = cols.index(bucket_col)

    def write_partition(rows_iter):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        by_bucket: dict[int, list] = {}
        for row in rows_iter:
            by_bucket.setdefault(row[bucket_ix], []).append(tuple(row))
        for bucket, rows in by_bucket.items():
            if throttle:  # test-only hook: widens the kill-resume window
                time.sleep(throttle)
            pdf = pd.DataFrame(rows, columns=cols)
            ddir = os.path.join(out_dir, "data", f"bucket={bucket}")
            os.makedirs(ddir, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                           os.path.join(ddir, "part.parquet"))
            manifest = {
                "stage": stage, "bucket": int(bucket), "rows": len(rows),
                "status": "done", "ts": time.time(),
                "cell_min": (int(pdf.iloc[:, cell_ix].min())
                             if cell_ix is not None else None),
                "cell_max": (int(pdf.iloc[:, cell_ix].max())
                             if cell_ix is not None else None),
                "bytes": (int(pdf.iloc[:, bytes_ix].sum())
                          if bytes_ix is not None else None),
            }
            tmp = os.path.join(_lineage_dir(out_dir),
                               f".tmp-{stage}-bucket-{bucket}.json")
            final = os.path.join(_lineage_dir(out_dir),
                                 f"{stage}-bucket-{bucket}.json")
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, final)  # atomic commit point

    (todo.repartition(max(n_buckets, 1), F.col(bucket_col))
         .foreachPartition(write_partition))
    return {"done": len(prior), "new": n_buckets}


def read_output(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))
