"""Distributed shapefile ingest e2e (A19 + geometry-DF mapping)."""

import numpy as np
from pyspark.sql import functions as F

from spark_shp import ingest
from spark_shp.shp import writer


def _write_fixture_dir(tmp_path):
    d = tmp_path / "shpdir"
    d.mkdir()
    pts = [(writer.POINT, (float(i), float(i) / 2)) for i in range(4)]
    (d / "pts.shp").write_bytes(writer.write_shp(pts))
    (d / "pts.dbf").write_bytes(writer.write_dbf(
        [("NAME", "C", 8, 0), ("SCORE", "N", 6, 0)],
        [{"NAME": f"p{i}", "SCORE": i * 10} for i in range(4)]))
    polys = [(writer.POLYGON,
              [[(0.0, 0.0), (0.0, 5.0), (5.0, 5.0), (5.0, 0.0), (0.0, 0.0)]]),
             (writer.NULL, None)]
    (d / "fences.shp").write_bytes(
        writer.write_shp(polys, header_type=writer.POLYGON))
    import io
    import zipfile
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as z:
        z.writestr("zipped.SHP", writer.write_shp(
            [(writer.POINT, (9.0, 9.0))]))
    (d / "bundle.zip").write_bytes(bio.getvalue())
    return str(d)


def test_read_shapefiles_end_to_end(spark, tmp_path):
    d = _write_fixture_dir(tmp_path)
    df = ingest.read_shapefiles(spark, d + "/*").cache()
    layers = {r.layer for r in df.select("layer").distinct().collect()}
    assert layers == {"pts", "fences", "zipped"}

    pts = df.where("layer = 'pts'").orderBy("feature_id").collect()
    assert len(pts) == 4
    assert pts[2].geom_type == "Point"
    assert pts[2].coordinates[0][0][0] == [2.0, 1.0]
    assert pts[2].properties["NAME"] == "p2"
    assert pts[2].properties["SCORE"] == "20.0"

    fences = df.where("layer = 'fences'").orderBy("feature_id").collect()
    assert fences[0].geom_type == "Polygon"
    assert fences[0].bbox.xmax == 5.0
    assert fences[1].is_null and fences[1].coordinates is None

    z = df.where("layer = 'zipped'").collect()
    assert len(z) == 1 and z[0].coordinates[0][0][0] == [9.0, 9.0]


def test_ingested_geometry_feeds_spatial_join(spark, tmp_path):
    """Decoded polygons work directly as the spatial-join build side."""
    import pandas as pd
    from spark_shp import spatial
    d = _write_fixture_dir(tmp_path)
    polys = (ingest.read_shapefiles(spark, d + "/fences.shp")
             .where(~F.col("is_null"))
             .select(F.col("feature_id").alias("poly_id"),
                     "coordinates", "bbox"))
    pts = spark.createDataFrame(pd.DataFrame({
        "pid": [0, 1], "lon": [2.5, 7.0], "lat": [2.5, 7.0]}))
    got = {(r.pid, r.poly_id) for r in
           spatial.spatial_join(pts, polys, "lon", "lat",
                                level=4).select("pid", "poly_id").collect()}
    assert got == {(0, 0)}
