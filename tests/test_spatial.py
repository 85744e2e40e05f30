"""Spatial operator exactness vs brute force (SURVEY.md §5.2 item 4)."""

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from spark_shp import cells, fixtures, geom, spatial
from spark_shp.hashing import u01

N_PTS = 3000


@pytest.fixture(scope="module")
def points_df(spark):
    k = np.arange(N_PTS, dtype=np.int64)
    lon = u01(k * 17 + 3) * 360.0 - 180.0
    lat = u01(k * 17 + 5) * 170.0 - 85.0
    import pandas as pd
    return spark.createDataFrame(
        pd.DataFrame({"pid": k, "lon": lon, "lat": lat}))


def brute_pairs(m=64):
    k = np.arange(N_PTS, dtype=np.int64)
    lon = u01(k * 17 + 3) * 360.0 - 180.0
    lat = u01(k * 17 + 5) * 170.0 - 85.0
    expect = set()
    for j in range(m):
        inside = geom.points_in_polygon(lon, lat, fixtures.fence_rings(j))
        for p in k[inside]:
            expect.add((int(p), j))
    return expect


def test_tile_assign_matches_numpy(spark, points_df):
    got = spatial.tile_assign(points_df, "lon", "lat", 12).collect()
    k = np.arange(N_PTS, dtype=np.int64)
    lon = u01(k * 17 + 3) * 360.0 - 180.0
    lat = u01(k * 17 + 5) * 170.0 - 85.0
    expect = dict(zip(k.tolist(),
                      cells.cell_encode(lon, lat, 12).tolist()))
    for r in got:
        assert r.cell_id == expect[r.pid]


def test_spatial_join_exact_vs_bruteforce(spark, points_df):
    """Engine spatial join (cell cover + PIP refine) == O(n·m) numpy truth,
    on fences WITH holes and multi-part polygons."""
    polys = fixtures.fences_df(spark, 64).drop("layer", "name")
    got = {(r.pid, r.poly_id) for r in
           spatial.spatial_join(points_df, polys, "lon", "lat",
                                level=6).select("pid", "poly_id").collect()}
    assert got == brute_pairs()


def test_spatial_join_level_invariance(spark, points_df):
    """Join output must not depend on the index level (cover is only a
    candidate filter; PIP decides)."""
    polys = fixtures.fences_df(spark, 16).drop("layer", "name")
    a = {(r.pid, r.poly_id) for r in
         spatial.spatial_join(points_df, polys, "lon", "lat",
                              level=4).select("pid", "poly_id").collect()}
    b = {(r.pid, r.poly_id) for r in
         spatial.spatial_join(points_df, polys, "lon", "lat",
                              level=7).select("pid", "poly_id").collect()}
    assert a == b


def test_knn_cells_matches_broadcast(spark, points_df):
    """Cell-ring kNN == brute-force broadcast kNN when max_ring covers the
    neighborhood (64 fence centers, level 3, ring 4 ≈ half the grid)."""
    import pandas as pd
    j = np.arange(64)
    params = [fixtures.fence_params(int(x)) for x in j]
    dims = spark.createDataFrame(pd.DataFrame({
        "fid": j, "dlon": [p[0] for p in params],
        "dlat": [p[1] for p in params]}))
    pts = points_df.where(F.col("pid") % 30 == 0)
    want = {(r.pid, r.fid, r.knn_rank) for r in spatial.knn_join_broadcast(
        pts, dims, 3, "lon", "lat", "dlon", "dlat", "fid", "pid").collect()}
    got = {(r.pid, r.fid, r.knn_rank) for r in spatial.knn_join_cells(
        pts, dims, 3, "lon", "lat", "dlon", "dlat", "fid", "pid",
        level=3, max_ring=4).collect()}
    # cell kNN is correct where the ring bound holds; require exact equality
    # of the top-3 sets here because ring 4 at level 3 spans ±180° of grid
    assert got == want


def test_salting_preserves_join_results(spark, points_df):
    """Hot-cell salted join == plain join (B13 is physical, not logical)."""
    pts = spatial.tile_assign(points_df, "lon", "lat", 4)
    # build side: distinct cells → tag
    build = pts.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_in_cell"))
    plain = {(r.pid, r.n_in_cell) for r in
             pts.join(build, "cell_id").select("pid", "n_in_cell").collect()}
    salted_probe, hot = spatial.salt_hot_cells(pts, "cell_id", top_n=4,
                                               salt_factor=8)
    salted_build = spatial.explode_salts(build, "cell_id", hot.withColumn(
        "_is_hot", F.lit(True)), salt_factor=8)
    got = {(r.pid, r.n_in_cell) for r in salted_probe.join(
        salted_build.select("_salted_cell", "n_in_cell"),
        "_salted_cell").select("pid", "n_in_cell").collect()}
    assert got == plain


def test_explain_tile_assign_is_codegen(spark, points_df):
    """Tile assignment must stay JVM-side: no Python eval in the plan."""
    plan = (spatial.tile_assign(points_df, "lon", "lat", 12)
            ._jdf.queryExecution().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_explain_spatial_join_inline_is_pure_jvm(spark, points_df):
    """Flagship join plan shape (BENCH finding #1): the broadcast-cover
    inline path must be ONE BroadcastHashJoin with the ray-cast parity as
    its condition and ZERO Python operators — a mapInPandas refine here
    oversubscribes executors and inverted the scaling curve."""
    polys = fixtures.fences_df(spark, 8).drop("layer", "name")
    j = spatial.spatial_join(points_df, polys, "lon", "lat", level=6)
    plan = j._jdf.queryExecution().executedPlan().toString()
    for banned in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython",
                   "FlatMapGroupsInPandas"):
        assert banned not in plan, f"Python stage {banned} in inline join"
    assert "BroadcastHashJoin" in plan
    # >64-edge layers must still fall back to the Arrow kernel
    import pandas as pd
    import math
    ring = [[math.cos(2 * math.pi * k / 100) * 5 + 10,
             math.sin(2 * math.pi * k / 100) * 5] for k in range(101)]
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("poly_id", T.LongType()),
        T.StructField("coordinates", T.ArrayType(T.ArrayType(
            T.ArrayType(T.ArrayType(T.DoubleType()))))),
        T.StructField("bbox", T.StructType([
            T.StructField(k, T.DoubleType())
            for k in ("xmin", "ymin", "xmax", "ymax")])),
    ])
    big = spark.createDataFrame([(0, [[ring]], (5.0, -5.0, 15.0, 5.0))],
                                schema)
    plan2 = (spatial.spatial_join(points_df, big, "lon", "lat", level=6)
             ._jdf.queryExecution().executedPlan().toString())
    assert "MapInPandas" in plan2


def test_distributed_inline_join_matches_broadcast(spark, points_df):
    """All three spatial-join strategies produce identical pairs: broadcast
    inline, distributed + Arrow refine, distributed + inline edges."""
    polys = fixtures.fences_df(spark, 16).drop("layer", "name")
    want = {(r.pid, r.poly_id) for r in spatial.spatial_join(
        points_df, polys, "lon", "lat", level=6).select(
        "pid", "poly_id").collect()}
    arrow = {(r.pid, r.poly_id) for r in spatial.spatial_join(
        points_df, polys, "lon", "lat", level=6,
        broadcast_cover=False).select("pid", "poly_id").collect()}
    inline = {(r.pid, r.poly_id) for r in spatial.spatial_join(
        points_df, polys, "lon", "lat", level=6, broadcast_cover=False,
        distributed_inline_edges=16).select("pid", "poly_id").collect()}
    assert want == arrow == inline and len(want) > 0


def test_distributed_inline_join_salted_matches(spark, points_df):
    """B13 composed with the distributed-inline join: salted == unsalted."""
    polys = fixtures.fences_df(spark, 16).drop("layer", "name")
    plain = {(r.pid, r.poly_id) for r in spatial.spatial_join(
        points_df, polys, "lon", "lat", level=6, broadcast_cover=False,
        distributed_inline_edges=16).select("pid", "poly_id").collect()}
    salted = {(r.pid, r.poly_id) for r in spatial.spatial_join(
        points_df, polys, "lon", "lat", level=6, broadcast_cover=False,
        distributed_inline_edges=16, salt_hot=4,
        salt_factor=8).select("pid", "poly_id").collect()}
    assert salted == plain and len(plain) > 0


def test_auto_route_probe_and_paths(spark, points_df, monkeypatch):
    """broadcast_cover=None auto-routes: small layer → broadcast inline
    (no Python, BroadcastHashJoin); layer above the threshold with
    inline-able polygons → distributed-inline (no broadcast of the layer,
    still no Python refine). Results identical either way."""
    polys = fixtures.fences_df(spark, 16).drop("layer", "name")
    n, max_e = spatial._probe_layer(polys)
    assert n == 16 and 4 <= max_e <= 16

    want = {(r.pid, r.poly_id) for r in spatial.spatial_join(
        points_df, polys, "lon", "lat", level=6,
        broadcast_cover=True).select("pid", "poly_id").collect()}

    auto_small = spatial.spatial_join(points_df, polys, "lon", "lat", level=6)
    plan = auto_small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "MapInPandas" not in plan
    got = {(r.pid, r.poly_id)
           for r in auto_small.select("pid", "poly_id").collect()}
    assert got == want and len(want) > 0

    monkeypatch.setattr(spatial, "AUTO_BROADCAST_MAX_POLYS", 4)
    auto_big = spatial.spatial_join(points_df, polys, "lon", "lat", level=6)
    plan2 = auto_big._jdf.queryExecution().executedPlan().toString()
    # distributed-inline route: the cover is built by a MapInPandas stage
    # (the broadcast route has none anywhere), and the parity refine stays
    # a codegen Filter — no grouped-Python refine
    assert "MapInPandas" in plan2
    assert "FlatMapGroupsInPandas" not in plan2
    got2 = {(r.pid, r.poly_id)
            for r in auto_big.select("pid", "poly_id").collect()}
    assert got2 == want


def test_empty_edge_layer_returns_empty(spark, points_df):
    """ADVICE r1: a layer whose polygons all have empty coordinates made
    the inline path emit the unparseable predicate '() % 2 = 1'."""
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("poly_id", T.LongType()),
        T.StructField("coordinates", T.ArrayType(T.ArrayType(
            T.ArrayType(T.ArrayType(T.DoubleType()))))),
        T.StructField("bbox", T.StructType([
            T.StructField(k, T.DoubleType())
            for k in ("xmin", "ymin", "xmax", "ymax")])),
    ])
    empty = spark.createDataFrame([(0, [], (0.0, 0.0, 1.0, 1.0))], schema)
    out = spatial.spatial_join(points_df, empty, "lon", "lat", level=6,
                               broadcast_cover=True)
    assert out.count() == 0
    assert "poly_id" in out.columns


def _circle_layer(spark, n_edges=101, cx=10.0, cy=0.0, r=40.0, pid=0):
    import math
    from pyspark.sql import types as T
    ring = [[math.cos(2 * math.pi * k / n_edges) * r + cx,
             math.sin(2 * math.pi * k / n_edges) * r + cy]
            for k in range(n_edges + 1)]
    schema = T.StructType([
        T.StructField("poly_id", T.LongType()),
        T.StructField("coordinates", T.ArrayType(T.ArrayType(
            T.ArrayType(T.ArrayType(T.DoubleType()))))),
        T.StructField("bbox", T.StructType([
            T.StructField(k, T.DoubleType())
            for k in ("xmin", "ymin", "xmax", "ymax")])),
    ])
    return spark.createDataFrame(
        [(pid, [[ring]], (cx - r, cy - r, cx + r, cy + r))], schema)


def test_chunked_distributed_inline_matches_arrow(spark, points_df):
    """Crossings are additive over edge chunks: the chunked
    distributed-inline join must equal the Arrow-refine ground truth on a
    >64-edge polygon, with no Python refine stage and no layer collect."""
    big = _circle_layer(spark, n_edges=101)
    want = {(r.pid, r.poly_id) for r in spatial.spatial_join(
        points_df, big, "lon", "lat", level=6,
        broadcast_cover=True).select("pid", "poly_id").collect()}
    assert len(want) > 0
    chunked = spatial.spatial_join(
        points_df, big, "lon", "lat", level=6, broadcast_cover=False,
        distributed_inline_edges=16, distributed_chunked=True)
    got = {(r.pid, r.poly_id)
           for r in chunked.select("pid", "poly_id").collect()}
    assert got == want
    plan = chunked._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan     # no grouped-Python refine
    # chunked + salted composes
    salted = spatial.spatial_join(
        points_df, big, "lon", "lat", level=6, broadcast_cover=False,
        distributed_inline_edges=16, distributed_chunked=True,
        salt_hot=4, salt_factor=8)
    got_s = {(r.pid, r.poly_id)
             for r in salted.select("pid", "poly_id").collect()}
    assert got_s == want
    # output columns: original point columns + poly_id, no transient keys
    assert chunked.columns == points_df.columns + ["poly_id"]


def test_auto_route_big_layer_many_edges_goes_chunked(spark, points_df,
                                                      monkeypatch):
    """Auto-route: a layer above the broadcast threshold whose polygons
    exceed MAX_INLINE_EDGES must take the chunked path (round 1 fell back
    to an Arrow refine that collected the whole layer driver-side)."""
    big = _circle_layer(spark, n_edges=101)
    monkeypatch.setattr(spatial, "AUTO_BROADCAST_MAX_POLYS", 0)
    auto = spatial.spatial_join(points_df, big, "lon", "lat", level=6)
    want = {(r.pid, r.poly_id) for r in spatial.spatial_join(
        points_df, big, "lon", "lat", level=6,
        broadcast_cover=True).select("pid", "poly_id").collect()}
    got = {(r.pid, r.poly_id)
           for r in auto.select("pid", "poly_id").collect()}
    assert got == want and len(want) > 0
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan


def test_knn_exact_repairs_undersized_ring(spark, points_df):
    """knn_join_cells_exact == brute force EVEN when the ring is sized too
    small for plain knn_join_cells to be correct (certify-or-repair), and
    with auto-sized level."""
    import pandas as pd
    j = np.arange(64)
    params = [fixtures.fence_params(int(x)) for x in j]
    dims = spark.createDataFrame(pd.DataFrame({
        "fid": j, "dlon": [p[0] for p in params],
        "dlat": [p[1] for p in params]}))
    pts = points_df.where(F.col("pid") % 10 == 0)
    want = {(r.pid, r.fid, r.knn_rank) for r in spatial.knn_join_broadcast(
        pts, dims, 3, "lon", "lat", "dlon", "dlat", "fid", "pid").collect()}
    # deliberately undersized: level 5, ring 1 — the plain cells join WILL
    # miss neighbors here; exact must repair to brute-force equality
    plain = {(r.pid, r.fid, r.knn_rank) for r in spatial.knn_join_cells(
        pts, dims, 3, "lon", "lat", "dlon", "dlat", "fid", "pid",
        level=5, max_ring=1).collect()}
    assert plain != want          # the sizing really is too small
    got = {(r.pid, r.fid, r.knn_rank) for r in spatial.knn_join_cells_exact(
        pts, dims, 3, "lon", "lat", "dlon", "dlat", "fid", "pid",
        level=5, max_ring=1).collect()}
    assert got == want
    # auto-sized level (level=None probes the dim count)
    auto = {(r.pid, r.fid, r.knn_rank) for r in spatial.knn_join_cells_exact(
        pts, dims, 3, "lon", "lat", "dlon", "dlat", "fid", "pid").collect()}
    assert auto == want


def test_distance_join_cells_matches_bruteforce(spark):
    """Cell-bucketed distance join == numpy brute force on random points,
    including pairs that straddle grid-cell boundaries."""
    import numpy as np
    import pandas as pd
    from spark_shp import spatial

    rng = np.random.default_rng(11)
    n_l, n_r, radius = 300, 250, 2.5
    lons_l = rng.uniform(-20, 20, n_l); lats_l = rng.uniform(-15, 15, n_l)
    lons_r = rng.uniform(-20, 20, n_r); lats_r = rng.uniform(-15, 15, n_r)
    left = spark.createDataFrame(pd.DataFrame(
        {"id": np.arange(n_l), "lon": lons_l, "lat": lats_l}))
    right = spark.createDataFrame(pd.DataFrame(
        {"id": np.arange(n_r), "lon": lons_r, "lat": lats_r}))
    got = sorted((r.l_id, r.r_id) for r in
                 spatial.distance_join_cells(left, right, radius).collect())
    d2 = ((lons_l[:, None] - lons_r[None, :]) ** 2
          + (lats_l[:, None] - lats_r[None, :]) ** 2)
    want = sorted(map(tuple, np.argwhere(d2 <= radius * radius)))
    assert got == want and len(want) > 100


def test_distance_join_cells_empty_and_tiny_radius(spark):
    """Empty right side → empty result with pair schema; radius smaller
    than any gap → no pairs (grid level clamps sanely)."""
    import numpy as np
    import pandas as pd
    from spark_shp import spatial

    left = spark.createDataFrame(pd.DataFrame(
        {"id": [0, 1], "lon": [0.0, 10.0], "lat": [0.0, 10.0]}))
    empty = spark.createDataFrame([], "id bigint, lon double, lat double")
    out = spatial.distance_join_cells(left, empty, 1.0)
    assert out.count() == 0
    assert set(out.columns) == {"l_id", "l_lon", "l_lat",
                                "r_id", "r_lon", "r_lat"}
    tiny = spatial.distance_join_cells(left, left, 1e-6)
    # only self-pairs at distance 0 survive a tiny radius
    assert sorted((r.l_id, r.r_id) for r in tiny.collect()) == [(0, 0),
                                                                (1, 1)]
