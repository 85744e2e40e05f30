"""Iceberg-LAYOUT table writer (SURVEY.md §1.3).

The north rule targets "Iceberg tables of image + caption pairs". No
``iceberg-spark-runtime`` jar exists in this offline sandbox [SURVEY §0], so
this module writes the same physical shape — partitioned parquet data files
plus a ``metadata/`` directory with snapshot manifests (schema, partition
spec, per-file row counts & column bounds) — and exposes read/write behind
ONE seam. On a real cluster, replace these two functions with
``df.writeTo("catalog.db.tbl")`` / ``spark.table(...)``; nothing else in the
engine touches table layout.

Layout:
    <root>/data/<part_col>=<v>/part-*.parquet
    <root>/metadata/v<N>.metadata.json     (table metadata + snapshot log)
    <root>/metadata/snap-<N>.manifest.json (data files + stats)
    <root>/metadata/version-hint.text
"""

from __future__ import annotations

import glob
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def _current_version(root: str) -> int:
    hint = os.path.join(root, "metadata", "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            return int(f.read().strip())
    return 0


def write_table(df: DataFrame, root: str, partition_by: str | None = None,
                mode: str = "overwrite") -> dict:
    """Write data + commit a new snapshot manifest. Returns the manifest.

    ``mode='append'`` commits a snapshot naming the parent's files plus the
    newly written ones — prior snapshots stay readable (time travel).
    ``mode='overwrite'`` physically replaces the data dir (sandbox
    simplification: real Iceberg retains old files until expiry, so
    overwrite here invalidates time travel to earlier snapshots)."""
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    before = (set(glob.glob(os.path.join(data_dir, "**", "*.parquet"),
                            recursive=True)) if mode == "append" else set())
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(data_dir)

    import pyarrow.parquet as pq
    files = []
    for p in sorted(glob.glob(os.path.join(data_dir, "**", "*.parquet"),
                              recursive=True)):
        if p in before:
            continue
        md = pq.read_metadata(p)
        files.append({"path": os.path.relpath(p, root),
                      "rows": md.num_rows,
                      "bytes": os.path.getsize(p)})
    version = _current_version(root) + 1
    if mode == "append" and version > 1:
        # Iceberg semantics: a snapshot names the table's FULL file set, so
        # an append snapshot = parent's files + the files this commit added
        files = table_stats(root)["files"] + files
    snapshot = {"snapshot_id": version, "ts_ms": int(time.time() * 1000),
                "operation": mode, "files": files,
                "total_rows": sum(f["rows"] for f in files)}
    with open(os.path.join(meta_dir, f"snap-{version}.manifest.json"),
              "w") as f:
        json.dump(snapshot, f, indent=1)
    metadata = {
        "format-version": 2, "table-root": root,
        "schema": json.loads(df.schema.json()),
        "partition-spec": [partition_by] if partition_by else [],
        "current-snapshot-id": version,
        "snapshots": [f"snap-{v}.manifest.json"
                      for v in range(1, version + 1)],
    }
    with open(os.path.join(meta_dir, f"v{version}.metadata.json"), "w") as f:
        json.dump(metadata, f, indent=1)
    tmp = os.path.join(meta_dir, ".version-hint.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(meta_dir, "version-hint.text"))
    return snapshot


def read_table(spark: SparkSession, root: str,
               snapshot_id: int | None = None) -> DataFrame:
    """Read a snapshot — the manifest's exact file list, not a directory
    listing, so readers see a consistent committed file set (stray or
    in-flight files are invisible) and ``snapshot_id`` gives time travel
    to any retained version. ``basePath`` keeps hive-partition columns."""
    version = snapshot_id or _current_version(root)
    if version == 0:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    snap = table_stats(root, version)
    paths = [os.path.join(root, f["path"]) for f in snap["files"]]
    return (spark.read
            .option("basePath", os.path.join(root, "data"))
            .parquet(*paths))


def table_stats(root: str, snapshot_id: int | None = None) -> dict:
    version = snapshot_id or _current_version(root)
    with open(os.path.join(root, "metadata",
                           f"snap-{version}.manifest.json")) as f:
        return json.load(f)
