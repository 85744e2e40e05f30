"""Distributed shapefile ingest (SURVEY.md §3.2 decode stage, A19).

``read_shapefiles(spark, path_glob)``: binaryFile scan lists .shp/.zip blobs
(+ sidecars); a mapInPandas decode stage runs the vectorized parser kernels
per file inside executor tasks and emits the engine's geometry schema
(SURVEY §1.3):

    feature_id, layer, geom_type, coordinates(rank-4 ragged), bbox,
    is_null, properties(map<string,string>)

Coordinates are normalized to MultiPolygon rank: Point wraps to
[[[ [x,y] ]]], LineString to [[ pts ]], Polygon keeps [rings][pts], and a
MultiPolygon's parts stay at the top rank — so one fixed Spark type carries
every geometry (lower ranks left-padded; SURVEY §1.3).

Scale: each FILE decodes in one task (files are the natural parallel unit —
shapefiles are unsplittable like gzip); for many-GB single files, the
record_scan offsets would shard via the .shx index (documented future path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T

GEOM_SCHEMA = T.StructType([
    T.StructField("feature_id", T.LongType()),
    T.StructField("layer", T.StringType()),
    T.StructField("geom_type", T.StringType()),
    T.StructField("coordinates", T.ArrayType(T.ArrayType(
        T.ArrayType(T.ArrayType(T.DoubleType()))))),
    T.StructField("bbox", T.StructType([
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType())])),
    T.StructField("is_null", T.BooleanType()),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
])


def normalize_rank4(geom: dict | None):
    """GeoJSON geometry → rank-4 ragged coordinates (or None for null)."""
    if geom is None:
        return None
    t, c = geom["type"], geom["coordinates"]
    if t == "Point":
        return [[[c]]]
    if t in ("MultiPoint", "LineString"):
        return [[c]]
    if t in ("MultiLineString", "Polygon"):
        return [c]
    if t == "MultiPolygon":
        return c
    raise ValueError(f"unknown geometry type {t}")


def _geom_bbox(geom: dict | None):
    if geom is None:
        return None
    import numpy as np
    pts = np.array([p for a in normalize_rank4(geom) for b in a
                    for p in b], dtype=float)
    return (float(pts[:, 0].min()), float(pts[:, 1].min()),
            float(pts[:, 0].max()), float(pts[:, 1].max()))


def features_to_records(layer: str, features: list[dict]) -> list[dict]:
    rows = []
    for i, f in enumerate(features):
        g = f["geometry"]
        rows.append({
            "feature_id": i,
            "layer": layer,
            "geom_type": g["type"] if g else None,
            "coordinates": normalize_rank4(g),
            "bbox": _geom_bbox(g),
            "is_null": g is None,
            "properties": {k: (None if v is None else str(v))
                           for k, v in f["properties"].items()},
        })
    return rows


def read_shapefiles(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan → per-layer decode (parser kernels) → geometry DF.

    Sidecars (.shp/.dbf/.prj/.cpg) are co-located with their layer by a
    groupBy on the base name — binaryFile may otherwise scatter them across
    partitions. Each layer decodes in one task; zips demux inline (A16)."""
    from pyspark.sql import functions as F

    files = (spark.read.format("binaryFile").load(path_glob)
             .select("path", "content")
             .withColumn("base", F.regexp_replace(
                 F.element_at(F.split("path", "/"), -1),
                 r"\.[^.]+$", "")))

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        from .shp import parser, zipio
        out = []
        kinds: dict[str, bytes] = {}
        base = ""
        for path, content in zip(pdf["path"], pdf["content"]):
            fname = path.rsplit("/", 1)[-1]
            base, ext = fname.rsplit(".", 1)
            if ext.lower() == "zip":
                for lname, feats in zipio.parse_zip(bytes(content)):
                    out.extend(features_to_records(lname, feats))
            else:
                kinds[ext.lower()] = bytes(content)
        if "shp" in kinds:
            trans = parser.projection_from_wkt(
                kinds["prj"].decode("ascii", "replace")
                if "prj" in kinds else None)
            geoms = parser.parse_shp(kinds["shp"], trans)
            enc = parser.parse_cpg(kinds.get("cpg"))
            rows = (parser.parse_dbf(kinds["dbf"], enc)
                    if "dbf" in kinds else [])
            out.extend(features_to_records(base, parser.combine(geoms, rows)))
        return pd.DataFrame(out, columns=[f.name for f in GEOM_SCHEMA])

    return files.groupBy("base").applyInPandas(decode, GEOM_SCHEMA)


def read_points_fast(spark: SparkSession, path_glob: str) -> DataFrame:
    """Scale-path ingest for point telemetry (the dominant 100 TB shape):
    binaryFile scan → vectorized columnar decode
    (parser.parse_shp_points_columns, one strided frombuffer per file) →
    flat (layer, rec_no, lon, lat) DataFrame. No per-record Python, no
    GeoJSON dict materialization, no shuffle (files decode where they're
    read; .prj sidecars are fetched per layer inside the task). Files that
    are not uniform Point files fall back to the per-record parity kernel,
    so results always equal read_shapefiles' geometry stream (null shapes
    surface as SQL NULL coordinates)."""
    from pyspark.sql import functions as F, types as T

    schema = T.StructType([
        T.StructField("layer", T.StringType()),
        T.StructField("rec_no", T.LongType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ])
    files = (spark.read.format("binaryFile").load(path_glob)
             .where(F.lower(F.col("path")).endswith(".shp"))
             .select("path", "content"))

    def decode(batches):
        import os
        from .shp import parser
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                base = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                trans = None
                prj = path[: path.rfind(".")] + ".prj"
                local = (prj.replace("file:", "", 1)
                         if prj.startswith("file:") else prj)
                if os.path.exists(local):
                    with open(local, "rb") as fh:
                        trans = parser.projection_from_wkt(
                            fh.read().decode("ascii", "replace"))
                blob = bytes(content)
                fast = parser.parse_shp_points_columns(blob, trans)
                if fast is not None:
                    rec_no, x, y = fast
                else:
                    geoms = parser.parse_shp(blob, trans)
                    rec_no = np.arange(1, len(geoms) + 1, dtype=np.int64)
                    pts = [(g["coordinates"][0], g["coordinates"][1])
                           if g and g["type"] == "Point" else (np.nan, np.nan)
                           for g in geoms]
                    x = np.array([p[0] for p in pts], dtype=np.float64)
                    y = np.array([p[1] for p in pts], dtype=np.float64)
                yield pd.DataFrame({"layer": base, "rec_no": rec_no,
                                    "lon": x, "lat": y})

    return files.mapInPandas(decode, schema)
