"""spark_shp — from-scratch PySpark-native spatial-join + tiling engine.

Blueprint: SURVEY.md. Subsumes shapefile-js's decode semantics as a
vectorized Arrow ingest stage and builds an H3/S2-style cell-indexed spatial
engine (tile assignment, PIP joins, kNN, raster↔vector clip) on DataFrames.
"""

__version__ = "0.1.0"
