"""WKB round-trip + native st_geomfromwkb interop + Python DataSource."""

import numpy as np
import pytest

from spark_shp import wkb
from spark_shp.shp import writer


GEOMS = [
    {"type": "Point", "coordinates": [1.5, -2.25]},
    {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 2.0],
                                           [3.0, 1.0]]},
    {"type": "Polygon", "coordinates": [
        [[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0], [0.0, 0.0]],
        [[2.0, 2.0], [8.0, 2.0], [8.0, 8.0], [2.0, 8.0], [2.0, 2.0]]]},
    {"type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
    {"type": "MultiLineString", "coordinates": [
        [[0.0, 0.0], [1.0, 1.0]], [[5.0, 5.0], [6.0, 7.0]]]},
    {"type": "MultiPolygon", "coordinates": [
        [[[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [0.0, 0.0]]],
        [[[5.0, 5.0], [5.0, 7.0], [7.0, 7.0], [5.0, 5.0]]]]},
]


@pytest.mark.parametrize("geom", GEOMS, ids=[g["type"] for g in GEOMS])
def test_wkb_roundtrip(geom):
    buf = wkb.geojson_to_wkb(geom)
    back, consumed = wkb.wkb_to_geojson(buf)
    assert consumed == len(buf)
    assert back == geom


def test_native_st_geomfromwkb_accepts_our_wkb(spark):
    """PySpark 4.1's GeometryType storage functions parse our WKB."""
    import pandas as pd
    from pyspark.sql import functions as F
    pdf = pd.DataFrame({"wkb": [wkb.geojson_to_wkb(g) for g in GEOMS]})
    df = spark.createDataFrame(pdf)
    out = df.selectExpr(
        "st_asbinary(st_geomfromwkb(wkb)) AS back").collect()
    for r, g in zip(out, GEOMS):
        got, _ = wkb.wkb_to_geojson(bytes(r.back))
        assert got == g


def test_shapefile_datasource(spark, tmp_path):
    from spark_shp.datasource import ShapefileDataSource
    spark.dataSource.register(ShapefileDataSource)
    d = tmp_path / "ds"
    d.mkdir()
    (d / "a.shp").write_bytes(writer.write_shp(
        [(writer.POINT, (1.0, 2.0)), (writer.NULL, None)],
        header_type=writer.POINT))
    (d / "a.dbf").write_bytes(writer.write_dbf(
        [("N", "C", 4, 0)], [{"N": "x"}, {"N": "y"}]))
    (d / "b.shp").write_bytes(writer.write_shp(
        [(writer.POLYGON, [[(0.0, 0.0), (0.0, 5.0), (5.0, 5.0),
                            (5.0, 0.0), (0.0, 0.0)]])]))
    df = spark.read.format("shapefile").load(str(d))
    rows = {(r.layer, r.feature_id): r for r in df.collect()}
    assert len(rows) == 3
    g, _ = wkb.wkb_to_geojson(bytes(rows[("a", 0)].wkb))
    assert g == {"type": "Point", "coordinates": [1.0, 2.0]}
    assert rows[("a", 1)].is_null and rows[("a", 1)].wkb is None
    assert rows[("a", 0)].properties["N"] == "x"
    gb, _ = wkb.wkb_to_geojson(bytes(rows[("b", 0)].wkb))
    assert gb["type"] == "Polygon"
