"""Shapefile decode/ingest layer (SURVEY.md §2.A): test-only binary writer,
vectorized parser kernels, zip demux, Spark ingest wrappers."""
