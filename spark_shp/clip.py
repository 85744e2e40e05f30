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
    inside = (geom.crossings_chunked(gx.ravel(), gy.ravel(), edges)
              % 2 == 1)
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


def _decode_stack_u8(pdf: pd.DataFrame, idx: np.ndarray, w: int, h: int,
                     fmt: str) -> np.ndarray:
    """Decode a same-(w,h,fmt) group into ONE (n,h,w,3) uint8 stack — raw
    images as a single frombuffer over concatenated payloads; compressed
    formats per stream (zlib is inherently per-stream), math on the stack."""
    blobs = pdf["bytes"].to_numpy()
    if fmt == "raw":
        flat = np.frombuffer(b"".join(bytes(blobs[i]) for i in idx),
                             dtype=np.uint8)
        return flat.reshape(len(idx), h, w, 3)
    return np.stack([codecs.decode(bytes(blobs[i]), w, h, fmt)
                     for i in idx])


def raster_vector_clip(images: DataFrame, poly_edges: dict[int, np.ndarray],
                       poly_col: str = "poly_id",
                       deg_per_px: float = DEG_PER_PX) -> DataFrame:
    """B10: images already paired with a poly_id (e.g. via spatial_join) →
    clipped re-encoded bytes + coverage stats. ``poly_edges`` is broadcast.

    Shape-grouped (VERDICT r2 wrong #2): each (w, h, fmt, poly) group
    decodes as one stacked kernel and ray-casts ALL its pixel centers in a
    single geom.crossings call — no per-row Python beyond the unavoidable
    per-stream encode."""
    spark = images.sparkSession
    bc = spark.sparkContext.broadcast(poly_edges)

    def work(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            ids = pdf["image_id"].to_numpy()
            lons = pdf["lon"].to_numpy(dtype=np.float64)
            lats = pdf["lat"].to_numpy(dtype=np.float64)
            all_pids = pdf[poly_col].to_numpy(dtype=np.int64)
            out = [None] * n
            # group at (w,h,fmt) so the decode stack amortizes; polys are
            # subgrouped inside (a (w,h,fmt,poly) groupby fragments mixed
            # batches into ~2-image groups and stacking never pays off)
            for (w, h, fmt), idx in (
                    pdf.groupby(["w", "h", "fmt"]).indices.items()):
                w, h = int(w), int(h)
                px = _decode_stack_u8(pdf, idx, w, h, fmt)   # (k,h,w,3)
                k = len(idx)
                pids = all_pids[idx]
                xs = (np.arange(w) - w / 2 + 0.5) * deg_per_px
                ys = (h / 2 - np.arange(h) - 0.5) * deg_per_px
                mask = np.zeros((k, h, w), dtype=bool)
                for pid in np.unique(pids):
                    edges = bc.value.get(int(pid))
                    if edges is None or not len(edges):
                        continue               # mask stays all-outside
                    sel = np.nonzero(pids == pid)[0]
                    gx, gy = np.broadcast_arrays(
                        lons[idx[sel]][:, None, None] + xs[None, None, :],
                        lats[idx[sel]][:, None, None] + ys[None, :, None])
                    inside = (geom.crossings_chunked(
                        np.ascontiguousarray(gx).ravel(),
                        np.ascontiguousarray(gy).ravel(),
                        edges) % 2 == 1)
                    mask[sel] = inside.reshape(len(sel), h, w)
                clipped = px.copy()
                clipped[~mask] = 0
                n_in = mask.sum(axis=(1, 2)).astype(np.int64)
                sums = clipped.sum(axis=(1, 2, 3), dtype=np.int64)
                enc_fmt = "raw" if fmt == "qb" else fmt
                for j, i in enumerate(idx):
                    out[i] = (ids[i], int(pids[j]),
                              codecs.encode(clipped[j], enc_fmt),
                              int(n_in[j]), w * h,
                              float(sums[j]) / (n_in[j] * 3)
                              if n_in[j] else 0.0)
            yield pd.DataFrame(out, columns=[f.name for f in CLIP_SCHEMA])

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
            n = len(pdf)
            if not n:
                continue
            ids = pdf["image_id"].to_numpy()
            stored = pdf["phash"].to_numpy(dtype=np.int64)
            fmts = pdf["fmt"].to_numpy()
            out = [None] * n
            for (w, h, fmt), idx in (
                    pdf.groupby(["w", "h", "fmt"]).indices.items()):
                w, h = int(w), int(h)
                px = _decode_stack_u8(pdf, idx, w, h, fmt)
                k = len(idx)
                gray = px.astype(np.float64).mean(axis=3)       # (k,h,w)
                hh, ww = (h // 8) * 8, (w // 8) * 8
                g = (gray[:, :hh, :ww]
                     .reshape(k, 8, hh // 8, 8, ww // 8)
                     .mean(axis=(2, 4)))                        # (k,8,8)
                bits = (g > g.mean(axis=(1, 2), keepdims=True)).reshape(k, 64)
                # MSB-first pack, identical to codecs.phash's shift loop
                hashes = (np.packbits(bits, axis=1).copy()
                          .view(">u8").reshape(k).astype(np.uint64)
                          .view(np.int64))
                xor = (hashes ^ stored[idx]).view(np.uint64)
                ham = (np.unpackbits(xor.view(np.uint8))
                       .reshape(k, 64).sum(axis=1).astype(np.int64))
                for j, i in enumerate(idx):
                    ok = (ham[j] == 0 if fmts[i] in ("raw", "png")
                          else ham[j] <= 4)
                    out[i] = (ids[i], int(stored[i]), int(hashes[j]),
                              bool(ok), int(ham[j]))
            yield pd.DataFrame(out,
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
            n = len(pdf)
            if not n:
                continue
            ids = pdf["image_id"].to_numpy()
            fmts = pdf["fmt"].to_numpy()
            out = [None] * n
            for (w, h, fmt), idx in (
                    pdf.groupby(["w", "h", "fmt"]).indices.items()):
                w, h = int(w), int(h)
                px = _decode_stack_u8(pdf, idx, w, h, fmt)
                means = px.mean(axis=(1, 2, 3))
                for j, i in enumerate(idx):
                    out[i] = (ids[i], fmts[i], float(means[j]), h * w * 3)
            yield pd.DataFrame(
                out, columns=[f.name for f in DECODE_STATS_SCHEMA])

    return (images.select("image_id", "bytes", "w", "h", "fmt")
            .mapInPandas(work, DECODE_STATS_SCHEMA))
