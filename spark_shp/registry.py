"""Merged query registry — the single source for __spark_entry__.py and
tests/bench. Each entry: name → (spark_fn(spark, sf_dir), duckdb_oracle|None).
"""

from __future__ import annotations

from . import queries_rel, queries_shp, queries_spatial, queries_text

ALL_QUERIES: dict = {}
for mod in (queries_rel, queries_spatial, queries_text, queries_shp):
    overlap = set(ALL_QUERIES) & set(mod.QUERIES)
    if overlap:
        raise RuntimeError(f"duplicate query names: {overlap}")
    ALL_QUERIES.update(mod.QUERIES)


def queries():
    return {name: fn for name, (fn, _) in ALL_QUERIES.items()}


def oracle_sql():
    return {name: sql for name, (_, sql) in ALL_QUERIES.items()
            if sql is not None}
