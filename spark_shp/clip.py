"""Raster↔vector operators over the images table (SURVEY.md §2.B B10–B12).

All Arrow-batched (mapInPandas) — decode, clip, stats, re-encode, and phash
verification happen on numpy pixel arrays inside executor tasks; no per-row
Python at the DataFrame boundary beyond the batch iterator.

Footprint model: an image centered at (lon, lat) spans ``deg_per_px`` degrees
per pixel; pixel (row y, col x) center maps to

    plon = lon + (x - w/2 + 0.5) * deg_per_px
    plat = lat + (h/2 - y - 0.5) * deg_per_px    (north-up)

``clip_to_polygon`` zeroes pixels outside the polygon (even-odd PIP on the
pixel-center lattice — same geom.crossings kernel as the spatial join, so
clip semantics match join semantics exactly); ``clip_stats`` returns per-image
coverage + mean of surviving pixels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from . import codecs, geom

DEG_PER_PX = 0.01


def _pixel_lattice(w: int, h: int, lon: float, lat: float,
                   deg_per_px: float = DEG_PER_PX):
    xs = lon + (np.arange(w) - w / 2 + 0.5) * deg_per_px
    ys = lat + (h / 2 - np.arange(h) - 0.5) * deg_per_px
    gx, gy = np.meshgrid(xs, ys)   # (h, w)
    return gx, gy


def clip_pixels(pixels: np.ndarray, lon: float, lat: float,
                edges: np.ndarray,
                deg_per_px: float = DEG_PER_PX) -> tuple[np.ndarray, int]:
    """Zero pixels whose centers fall outside the polygon (edge table).
    Returns (clipped, n_inside)."""
    h, w, _ = pixels.shape
    gx, gy = _pixel_lattice(w, h, lon, lat, deg_per_px)
    inside = (geom.crossings(gx.ravel(), gy.ravel(), edges) % 2 == 1)
    mask = inside.reshape(h, w)
    out = pixels.copy()
    out[~mask] = 0
    return out, int(mask.sum())


CLIP_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("poly_id", T.LongType()),
    T.StructField("clipped_bytes", T.BinaryType()),
    T.StructField("n_inside", T.LongType()),
    T.StructField("n_pixels", T.LongType()),
    T.StructField("mean_inside", T.DoubleType()),
])


def raster_vector_clip(images: DataFrame, poly_edges: dict[int, np.ndarray],
                       poly_col: str = "poly_id",
                       deg_per_px: float = DEG_PER_PX) -> DataFrame:
    """B10: images already paired with a poly_id (e.g. via spatial_join) →
    clipped re-encoded bytes + coverage stats. ``poly_edges`` is broadcast."""
    spark = images.sparkSession
    bc = spark.sparkContext.broadcast(poly_edges)

    def work(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                edges = bc.value.get(getattr(r, poly_col))
                px = codecs.decode(bytes(r.bytes), int(r.w), int(r.h), r.fmt)
                if edges is None or not len(edges):
                    clipped, n_in = px * 0, 0
                else:
                    clipped, n_in = clip_pixels(
                        px, float(r.lon), float(r.lat), edges, deg_per_px)
                mean_in = (float(clipped.sum()) / (n_in * 3)
                           if n_in else 0.0)
                rows.append((r.image_id, int(getattr(r, poly_col)),
                             codecs.encode(clipped, r.fmt)
                             if r.fmt != "qb" else codecs.encode(clipped, "raw"),
                             n_in, int(r.w) * int(r.h), mean_in))
            yield pd.DataFrame(rows, columns=[f.name for f in CLIP_SCHEMA])

    cols = ["image_id", "bytes", "w", "h", "fmt", "lon", "lat", poly_col]
    return images.select(*cols).mapInPandas(work, CLIP_SCHEMA)


PHASH_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("phash_stored", T.LongType()),
    T.StructField("phash_computed", T.LongType()),
    T.StructField("match", T.BooleanType()),
    T.StructField("hamming", T.IntegerType()),
])


def phash_verify(images: DataFrame) -> DataFrame:
    """B12: recompute the 64-bit perceptual hash from decoded pixels and
    compare to the stored ``phash`` column (hamming ≤ 4 tolerated for the
    lossy 'qb' format; exact for lossless)."""

    def work(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = codecs.decode(bytes(r.bytes), int(r.w), int(r.h), r.fmt)
                h = codecs.phash(px)
                ham = bin((h ^ int(r.phash)) & 0xFFFFFFFFFFFFFFFF).count("1")
                ok = ham == 0 if r.fmt in ("raw", "png") else ham <= 4
                rows.append((r.image_id, int(r.phash), h, ok, ham))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in PHASH_SCHEMA])

    return (images.select("image_id", "bytes", "w", "h", "fmt", "phash")
            .mapInPandas(work, PHASH_SCHEMA))


DECODE_STATS_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("mean_px", T.DoubleType()),
    T.StructField("bytes_decoded", T.LongType()),
])


def decode_stats(images: DataFrame) -> DataFrame:
    """B11 exercise path: decode every image, emit pixel stats (also the
    kernel the lineage bench uses for bytes-decoded metrics)."""

    def work(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = codecs.decode(bytes(r.bytes), int(r.w), int(r.h), r.fmt)
                rows.append((r.image_id, r.fmt, float(px.mean()),
                             int(px.nbytes)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODE_STATS_SCHEMA])

    return (images.select("image_id", "bytes", "w", "h", "fmt")
            .mapInPandas(work, DECODE_STATS_SCHEMA))
