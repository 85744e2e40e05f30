"""Independent cross-checks for queries_mining: a same-bug-both-engines
failure in the shared SQL can't hide behind the differential gate.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from spark_shp.queries_mining import (
    DENS_CAP, ED_PREFIX, HULL_GROUPS, HULL_LEVEL, hull_cycle, hull_metrics,
    q_convex_hull_groups, q_dedup_editdist, q_trajectory_densify)

SF = "/root/testdata/sf0.001"


# --- convex hull: monotone chain vs brute-force half-plane admission ---------

def _brute_edges(pts):
    """The oracle's edge rule, replicated in pure python: directed edge
    (a, b) is on the boundary iff no point is strictly right of it and no
    collinear point splits it."""
    edges = []
    for a in pts:
        for b in pts:
            if a == b:
                continue
            ok = True
            for c in pts:
                if c == a or c == b:
                    continue
                cr = ((b[0] - a[0]) * (c[1] - a[1])
                      - (b[1] - a[1]) * (c[0] - a[0]))
                between = (min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
                           and min(a[1], b[1]) <= c[1] <= max(a[1], b[1]))
                if cr < 0 or (cr == 0 and between):
                    ok = False
                    break
            if ok:
                edges.append((a, b))
    return edges


def _metrics_from_edges(pts, edges):
    if len(pts) == 1:
        x, y = pts[0]
        return 1, 0, 0, 0, x * 131 + y
    nb = len({e[0] for e in edges})
    area2 = abs(sum(a[0] * b[1] - b[0] * a[1] for a, b in edges))
    esq = sum((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 for a, b in edges)
    chk = sum(a[0] * 131 + a[1] for a, _ in edges)
    return nb, len(edges), area2, esq, chk


def test_hull_metrics_match_half_plane_bruteforce_random():
    rng = np.random.default_rng(11)
    for trial in range(120):
        n = int(rng.integers(1, 14))
        span = int(rng.integers(2, 12))
        pts = sorted({(int(rng.integers(0, span)), int(rng.integers(0, span)))
                      for _ in range(n)})
        got = hull_metrics(pts)
        want = _metrics_from_edges(pts, _brute_edges(pts))
        assert got == want, (trial, pts, got, want)


def test_hull_metrics_degenerate_cases():
    # single point
    assert hull_metrics([(3, 4)]) == (1, 0, 0, 0, 3 * 131 + 4)
    # two points: down-and-back walk, zero area, both edges counted
    nb, nc, a2, esq, chk = hull_metrics([(0, 0), (3, 4)])
    assert (nb, nc, a2, esq) == (2, 2, 0, 50)
    # all-collinear run: every point is a boundary vertex, interior points
    # appear twice in the cycle (down-and-back)
    pts = [(0, 0), (1, 1), (2, 2), (3, 3)]
    assert hull_metrics(pts) == _metrics_from_edges(pts, _brute_edges(pts))
    cyc = hull_cycle(pts)
    assert len(cyc) == 2 * len(pts) - 2
    # square with center point: center never on the boundary
    pts = [(0, 0), (2, 0), (0, 2), (2, 2), (1, 1)]
    nb, nc, a2, esq, chk = hull_metrics(pts)
    assert (nb, nc, a2) == (4, 4, 8)


def test_hull_query_groups_and_bounds(spark):
    rows = {r.g: r for r in q_convex_hull_groups(spark, SF).collect()}
    assert set(rows) == set(range(HULL_GROUPS))
    lattice = 1 << HULL_LEVEL
    for r in rows.values():
        assert 0 < r.area2 <= 2 * (lattice - 1) ** 2
        assert r.n_boundary <= r.n_cycle
        assert r.n_cycle >= 3


# --- edit distance: Spark == DuckDB == textbook DP ----------------------------

def _dp_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_parity_across_engines(spark):
    cases = [("kitten", "sitting"), ("", "abc"), ("same", "same"),
             ("a row fast merge", "a row slow merge xx"),
             ("abcdef" * 30, "abcdxf" * 30)]
    sdf = spark.createDataFrame(cases, "a string, b string")
    got_spark = [r[0] for r in
                 sdf.selectExpr("levenshtein(a, b)").collect()]
    con = duckdb.connect()
    got_duck = [con.execute("SELECT levenshtein(?, ?)", list(c)).fetchone()[0]
                for c in cases]
    want = [_dp_lev(a, b) for a, b in cases]
    assert got_spark == want
    assert got_duck == want


def test_dedup_editdist_candidates_obey_band(spark):
    import pyspark.sql.functions as F
    out = q_dedup_editdist(spark, SF).collect()
    assert out, "fixture produced no candidate pairs"
    docs = {r.doc_id: r for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "source", "n_chars").collect()}
    # rebuild the candidate set brute-force and compare counts per source
    from collections import Counter
    want = Counter()
    ids = sorted(docs)
    for i, a in enumerate(ids):
        if a % 3:
            continue
        for b in ids:
            if (b > a and docs[a].source == docs[b].source
                    and abs(docs[a].n_chars - docs[b].n_chars) <= 1):
                want[docs[a].source] += 1
    got = {r.source: r.n_candidates for r in out}
    assert got == dict(want)
    for r in out:
        assert 0 <= r.min_dist <= r.max_dist <= ED_PREFIX


# --- trajectory densification -------------------------------------------------

def test_densify_segment_laws(spark):
    """Per-segment: sample count equals the Chebyshev step count (capped),
    the first sample is the segment start, and every sample lies inside the
    segment bounding box — checked against a numpy lerp on random segments
    through the same SQL expressions DuckDB runs."""
    rng = np.random.default_rng(5)
    segs = [(int(rng.integers(0, 4096)), int(rng.integers(0, 4096)),
             int(rng.integers(0, 4096)), int(rng.integers(0, 4096)))
            for _ in range(200)] + [(7, 7, 7, 7), (0, 0, 4095, 0),
                                    (10, 10, 10, 60)]
    con = duckdb.connect()
    con.execute("CREATE TABLE s(x0 BIGINT, y0 BIGINT, x1 BIGINT, y1 BIGINT)")
    con.executemany("INSERT INTO s VALUES (?,?,?,?)", segs)
    rows = con.execute(f"""
        WITH seg AS (
          SELECT x0, y0, x1 - x0 AS dx, y1 - y0 AS dy,
                 GREATEST(1, LEAST({DENS_CAP},
                                   GREATEST(ABS(x1-x0), ABS(y1-y0)))) AS n,
                 ROW_NUMBER() OVER () - 1 AS sid
          FROM s)
        SELECT sid, j, x0 + CAST(FLOOR(dx * j / n) AS BIGINT),
               y0 + CAST(FLOOR(dy * j / n) AS BIGINT)
        FROM seg, UNNEST(GENERATE_SERIES(0, n - 1)) AS t(j)
        ORDER BY sid, j""").fetchall()
    by_sid = {}
    for sid, j, xs, ys in rows:
        by_sid.setdefault(sid, []).append((j, xs, ys))
    for sid, (x0, y0, x1, y1) in enumerate(segs):
        n = max(1, min(DENS_CAP, max(abs(x1 - x0), abs(y1 - y0))))
        samples = by_sid[sid]
        assert len(samples) == n
        assert samples[0][1:] == (x0, y0)
        js = np.arange(n)
        xs = x0 + np.floor((x1 - x0) * js / n).astype(np.int64)
        ys = y0 + np.floor((y1 - y0) * js / n).astype(np.int64)
        assert [s[1] for s in samples] == xs.tolist()
        assert [s[2] for s in samples] == ys.tolist()
        for _, sx, sy in samples:
            assert min(x0, x1) <= sx <= max(x0, x1)
            assert min(y0, y1) <= sy <= max(y0, y1)


def test_densify_query_conservation(spark):
    out = q_trajectory_densify(spark, SF)
    total = out.groupBy().sum("n_samples").collect()[0][0]
    # total samples = sum over segments of n (>= 1 per segment); segments =
    # events - distinct users (each user's first ping has no predecessor)
    e = spark.read.parquet(f"{SF}/events.parquet")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert total >= n_events - n_users
    assert total <= (n_events - n_users) * DENS_CAP


# --- k-core ---------------------------------------------------------------------

def _kc_graph():
    from spark_shp.hashing import mix
    from spark_shp.queries_mining import KC_NE, KC_NV
    i = np.arange(KC_NE, dtype=np.int64)
    a, b = mix(i) % KC_NV, mix(2 * i + 1) % KC_NV
    m = a != b
    return set(zip(np.minimum(a[m], b[m]).tolist(),
                   np.maximum(a[m], b[m]).tolist()))


def test_kcore_converges_and_matches_sequential_peel(spark):
    from spark_shp.queries_mining import KC_K, KC_ROUNDS, q_kcore_decompose
    rows = {r["round"]: r for r in q_kcore_decompose(spark, SF).collect()}
    # fixture must converge inside the bound: bounded peel == true k-core
    assert rows[KC_ROUNDS].n_alive == rows[KC_ROUNDS - 1].n_alive
    assert rows[KC_ROUNDS].checksum == rows[KC_ROUNDS - 1].checksum
    # python sequential peel, an independent implementation
    edges = _kc_graph()
    alive = {x for e in edges for x in e}
    assert rows[0].n_alive == len(alive)
    for r in range(1, KC_ROUNDS + 1):
        deg = {}
        for x, y in edges:
            if x in alive and y in alive:
                deg[x] = deg.get(x, 0) + 1
                deg[y] = deg.get(y, 0) + 1
        alive = {n for n, d in deg.items() if d >= KC_K}
        assert rows[r].n_alive == len(alive), r
        assert rows[r].checksum == sum(n * 131 for n in alive), r
    # every surviving node really has >= K neighbors inside the core
    core_deg = {}
    for x, y in edges:
        if x in alive and y in alive:
            core_deg[x] = core_deg.get(x, 0) + 1
            core_deg[y] = core_deg.get(y, 0) + 1
    assert alive and all(core_deg[n] >= KC_K for n in alive)


# --- interval coverage ----------------------------------------------------------

def test_interval_coverage_matches_sequential_merge(spark):
    from spark_shp.queries_mining import q_interval_coverage
    got = {r.cust: r for r in q_interval_coverage(spark, SF).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet").selectExpr(
        "o_custkey", "o_orderkey",
        "CAST(FLOOR(unix_micros(CAST(o_orderdate AS TIMESTAMP_LTZ)) "
        "/ 86400000000.0) AS BIGINT) AS s").collect()
    per_cust = {}
    for r in orders:
        per_cust.setdefault(r.o_custkey, []).append(
            (r.s, r.s + 1 + r.o_orderkey % 14))
    for cust, ivs in per_cust.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
                islands[-1][2] += 1
            else:
                islands.append([s, e, 1])
        g = got[cust]
        assert g.n_islands == len(islands)
        assert g.covered_days == sum(e - s for s, e, _ in islands)
        assert g.max_island_days == max(e - s for s, e, _ in islands)
        assert g.n_intervals == len(ivs)


# --- BFS distance transform -----------------------------------------------------

def test_bfs_distance_matches_numpy_chebyshev(spark):
    from spark_shp.hashing import mix
    from spark_shp.queries_mining import (BFS_LEVEL, BFS_ROUNDS,
                                          BFS_SEED_MOD,
                                          q_bfs_distance_cells)
    from spark_shp import cells as C, fixtures as FX
    got = {r.dist: (r.n_cells, r.n_events, r.checksum)
           for r in q_bfs_distance_cells(spark, SF).collect()}
    n = 1 << BFS_LEVEL
    ix, iy = C.quantize_sql(FX.EVENT_LON_SQL, FX.EVENT_LAT_SQL, BFS_LEVEL)
    occ_rows = (spark.read.parquet(f"{SF}/events.parquet")
                .selectExpr(f"{ix} AS ix", f"{iy} AS iy")
                .groupBy("ix", "iy").count().collect())
    occ = {(r.ix, r.iy): r["count"] for r in occ_rows}
    seeds = {k for k in occ if mix(k[0] * n + k[1]) % BFS_SEED_MOD == 0}
    assert seeds, "fixture produced no seed cells"
    # brute-force multi-source Chebyshev BFS over the occupied set
    dist = {k: (0 if k in seeds else -1) for k in occ}
    frontier = set(seeds)
    for r in range(1, BFS_ROUNDS + 1):
        nxt = set()
        for (x, y) in frontier:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    k = (x + dx, y + dy)
                    if k in occ and dist[k] == -1:
                        dist[k] = r
                        nxt.add(k)
        frontier = nxt
    want = {}
    for k, d in dist.items():
        nc, ne, ck = want.get(d, (0, 0, 0))
        want[d] = (nc + 1, ne + occ[k], ck + k[0] * n + k[1])
    assert got == want


# --- image dedup clusters ---------------------------------------------------------

def test_image_dup_clusters_conservation_and_planted_structure(spark):
    """The phash fixture plants groups of 4 consecutive ids sharing a base
    hash with {0, 1, 3, 24}-bit deltas; hamming <= 10 links exactly members
    {0,1,2} of each group, so clusters must be 500 triples + 500 singletons
    (the +24-bit member), and SUM(n_members) must equal the corpus."""
    from spark_shp.queries_mining import q_image_dup_clusters
    from spark_shp.queries_spatial import N_PHD
    rows = q_image_dup_clusters(spark, SF).collect()
    assert sum(r.n_members for r in rows) == N_PHD
    sizes = sorted(r.n_members for r in rows)
    assert sizes.count(3) == N_PHD // 4
    assert sizes.count(1) == N_PHD // 4
    for r in rows:
        assert r.survivor_id == r.cluster  # component label = min member
        if r.n_members == 3:
            assert r.cluster % 4 == 0      # triples start each 4-block
            assert r.checksum == sum((r.cluster + k) * 31 + 7
                                     for k in range(3))


# --- image mosaic -----------------------------------------------------------------

def test_mosaic_checksum_equals_materialized_collage(spark):
    """The query never builds the collage (per-image sums add because the
    weights live in mosaic coordinates); this test BUILDS it — decode real
    bytes, NN-resize, paste into a 32x32x3 array, weight the whole array —
    and checks the additive construction against the materialized one."""
    from spark_shp import codecs, fixtures, spatial
    from spark_shp.queries_mining import (MOS_K, MOS_LVL, MOS_N, MOS_RES,
                                          q_image_mosaic_tiles)
    got = {r.tile: r for r in q_image_mosaic_tiles(spark, SF).collect()}

    rows = (spatial.tile_assign(
        fixtures.images_df(spark, MOS_N, partitions=2), "lon", "lat",
        MOS_LVL).where("fmt <> 'qb'")
        .selectExpr("cell_id AS tile", "image_id", "bytes", "w", "h", "fmt")
        .collect())
    per_tile = {}
    for r in sorted(rows, key=lambda r: r.image_id):
        per_tile.setdefault(r.tile, []).append(r)
    want = {}
    res, grid = MOS_RES, 2
    yy, xx, cc = np.meshgrid(np.arange(grid * res), np.arange(grid * res),
                             np.arange(3), indexing="ij")
    wgt = 1 + (xx * 31 + yy * 17 + cc * 7) % 101
    for tile, members in per_tile.items():
        members = members[:MOS_K]
        collage = np.zeros((grid * res, grid * res, 3), dtype=np.int64)
        ids_cs = 0
        for s, r in enumerate(members):
            px = codecs.decode(bytes(r.bytes), r.w, r.h, r.fmt).astype(
                np.int64)
            yi = (np.arange(res) * r.h // res).astype(int)
            xi = (np.arange(res) * r.w // res).astype(int)
            thumb = px[yi][:, xi]
            oy, ox = (s // grid) * res, (s % grid) * res
            collage[oy:oy + res, ox:ox + res] = thumb
            ids_cs += int(r.image_id[3:]) * 13
        want[tile] = (len(members), int((collage * wgt).sum()), ids_cs)
    assert {t: (r.n_images, r.mosaic_cs, r.ids_cs)
            for t, r in got.items()} == want


# --- bloom filter + count-min sketch ----------------------------------------------

def test_bloom_prefilter_no_false_negatives_and_python_replication(spark):
    from spark_shp.hashing import mix
    from spark_shp.queries_mining import (BF_BITS, BF_K, q_bloom_prefilter)
    rows = q_bloom_prefilter(spark, SF).collect()
    assert rows
    # Bloom filters NEVER have false negatives — structural, not statistical
    assert all(r.n_false_neg == 0 for r in rows)
    assert all(r.n_pass >= r.n_members for r in rows)
    # replicate the filter in python and check one segment's pass count
    orders = spark.read.parquet(f"{SF}/orders.parquet").where(
        "o_orderstatus = 'O'").select("o_custkey").distinct().collect()
    keys = {r.o_custkey for r in orders}
    bits = set()
    for k in keys:
        for j in range(BF_K):
            bits.add(int(mix(k * 31 + j * 7 + 1)) % BF_BITS)
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_mktsegment").collect()
    want = {}
    for c in cust:
        ok = all(int(mix(c.c_custkey * 31 + j * 7 + 1)) % BF_BITS in bits
                 for j in range(BF_K))
        n_pass, n_probe = want.get(c.c_mktsegment, (0, 0))
        want[c.c_mktsegment] = (n_pass + ok, n_probe + 1)
    got = {r.c_mktsegment: (r.n_pass, r.n_probes) for r in rows}
    assert got == want


def test_cm_heavy_hitters_overestimates_and_python_sketch(spark):
    from spark_shp.hashing import mix
    from spark_shp.queries_mining import CM_D, CM_TOPK, CM_W, \
        q_cm_heavy_hitters
    rows = q_cm_heavy_hitters(spark, SF).collect()
    assert len(rows) == CM_TOPK
    # count-min never underestimates
    assert all(r.overestimate >= 0 for r in rows)
    # python sketch replication
    od = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey").collect()
    import collections
    exact = collections.Counter(r.o_custkey for r in od)
    counters = collections.Counter()
    for k, c in exact.items():
        for j in range(CM_D):
            counters[(j, int(mix(k * 5 + j * 11 + 3)) % CM_W)] += c
    for r in rows:
        est = min(counters[(j, int(mix(r.o_custkey * 5 + j * 11 + 3))
                            % CM_W)] for j in range(CM_D))
        assert est == r.est
        assert exact[r.o_custkey] == r.exact


# --- TWAP + trajectory simplification ----------------------------------------------

def test_twap_matches_sequential_integration(spark):
    from spark_shp.queries_mining import TW_BUCKETS, q_twap_values
    got = {r.bucket: r for r in q_twap_values(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "user_id", "event_id",
        "unix_micros(CAST(ts AS TIMESTAMP_LTZ)) AS us",
        "value").collect()
    per_user = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append(r)
    import math
    want = {}
    for u, rows in per_user.items():
        rows.sort(key=lambda r: (r.us, r.event_id))
        b = u % TW_BUCKETS
        n, integ, tot = want.get(b, (0, 0, 0))
        for a, nx in zip(rows, rows[1:]):
            vc = math.floor(a.value * 100 + 0.5)
            dt = math.floor((nx.us - a.us) / 1e6)
            n, integ, tot = n + 1, integ + vc * dt, tot + dt
        want[b] = (n, integ, tot)
    for b, (n, integ, tot) in want.items():
        g = got[b]
        assert (g.n_segments, g.integral_cs, g.total_s) == (n, integ, tot)
        assert g.twap_cents == integ / tot


def test_trajectory_simplify_sequential_replay(spark):
    from spark_shp import cells as C, fixtures as FX
    from spark_shp.queries_mining import SIMP_LEVEL, q_trajectory_simplify
    got = {r.user_id: r for r in q_trajectory_simplify(spark, SF).collect()}
    n = 1 << SIMP_LEVEL
    ix, iy = C.quantize_sql(FX.EVENT_LON_SQL, FX.EVENT_LAT_SQL, SIMP_LEVEL)
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "user_id", "event_id",
        "unix_micros(CAST(ts AS TIMESTAMP_LTZ)) AS us",
        f"({ix}) * {n} + ({iy}) AS cell").collect()
    per_user = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append(r)
    for u, rows in per_user.items():
        rows.sort(key=lambda r: (r.us, r.event_id))
        kept = []
        for r in rows:
            if not kept or r.cell != kept[-1]:
                kept.append(r.cell)
        g = got[u]
        assert g.n_points == len(rows)
        assert g.n_kept == g.max_seq == len(kept)
        assert g.path_checksum == sum(
            c * ((i + 1) % 97) for i, c in enumerate(kept))
        # simplification never keeps two equal consecutive cells
        assert all(a != b for a, b in zip(kept, kept[1:]))


# --- corpus-LM scoring + quadkey ----------------------------------------------------

def test_lm_bigram_score_matches_python_mle(spark):
    import math
    from collections import Counter
    from spark_shp.queries_mining import LM_ROUND, q_lm_bigram_score
    got = {r.doc_id: r for r in q_lm_bigram_score(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text").collect()
    cb, cp, per_doc = Counter(), Counter(), {}
    for d in docs:
        ts = d.text.split(" ")
        bgs = [(a, b) for a, b in zip(ts, ts[1:])]
        per_doc[d.doc_id] = bgs
        for a, b in bgs:
            cb[(a, b)] += 1
            cp[a] += 1
    for doc_id, bgs in per_doc.items():
        lps = [math.log(cb[bg] / cp[bg[0]]) for bg in bgs]
        g = got[doc_id]
        assert g.n_bigrams == len(bgs)
        assert abs(g.avg_logprob - sum(lps) / len(lps)) < 10 ** -LM_ROUND
        assert g.avg_logprob <= 0.0   # MLE probabilities never exceed 1


def _quadkey_ref(lon, lat, level):
    """Textbook quadkey: per zoom level pick the quadrant digit — a
    genuinely different algorithm from the Morton-spread SQL."""
    n = 1 << level
    ix = min(n - 1, max(0, int((lon + 180.0) / 360.0 * n)))
    iy = min(n - 1, max(0, int((lat + 85.0) / 170.0 * n)))
    digits = []
    for lvl in range(level - 1, -1, -1):
        digits.append(str(((ix >> lvl) & 1) | (((iy >> lvl) & 1) << 1)))
    return "".join(digits)


def test_quadkey_sql_matches_bisection_reference():
    import duckdb
    import numpy as np
    from spark_shp import cells as C
    from spark_shp.queries_mining import QK_LEVEL
    rng = np.random.default_rng(9)
    lons = rng.uniform(-180, 180, 300)
    lats = rng.uniform(-85, 85, 300)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)",
                    list(zip(lons.tolist(), lats.tolist())))
    ix, iy = C.quantize_sql("lon", "lat", QK_LEVEL)
    m = C.morton_sql(ix, iy)
    got = [r[0] for r in con.execute(
        f"SELECT LPAD(to_base({m}, 4), {QK_LEVEL}, '0') FROM pts"
    ).fetchall()]
    want = [_quadkey_ref(lo, la, QK_LEVEL)
            for lo, la in zip(lons, lats)]
    assert got == want


# --- geometric median -----------------------------------------------------------------

def test_geometric_median_matches_numpy_weiszfeld_and_beats_mean(spark):
    from spark_shp.queries_mining import (WZ_EPS, WZ_ITERS,
                                          q_geometric_median)
    from spark_shp import fixtures as FX
    got = {r.g: r for r in q_geometric_median(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "event_type AS g", f"{FX.EVENT_LON_SQL} AS px",
        f"{FX.EVENT_LAT_SQL} AS py").collect()
    by_g = {}
    for r in ev:
        by_g.setdefault(r.g, []).append((r.px, r.py))
    for g, pts in by_g.items():
        P = np.array(pts)
        m = P.mean(axis=0)
        for _ in range(WZ_ITERS):
            d = np.sqrt(((P - m) ** 2).sum(axis=1)) + WZ_EPS
            m = (P / d[:, None]).sum(axis=0) / (1.0 / d).sum()
        assert abs(got[g].median_lon - round(m[0], 6)) <= 1e-6
        assert abs(got[g].median_lat - round(m[1], 6)) <= 1e-6
        assert got[g].n_points == len(pts)
        # 1-median property: total distance at the Weiszfeld point never
        # exceeds total distance at the centroid
        c = P.mean(axis=0)
        dw = np.sqrt(((P - m) ** 2).sum(axis=1)).sum()
        dc = np.sqrt(((P - c) ** 2).sum(axis=1)).sum()
        assert dw <= dc + 1e-9


# --- polygon overlay candidates -----------------------------------------------------

def test_fence_overlap_pairs_vs_numpy_bruteforce(spark):
    from spark_shp import fixtures as FX
    from spark_shp.queries_mining import FOV_M, q_fence_overlap_pairs
    got = {(r.aj, r.bj): (r.overlap_area, r.is_containment)
           for r in q_fence_overlap_pairs(spark, SF).collect()}
    boxes = {}
    for j in range(FOV_M):
        cx, cy, hx, hy = FX.fence_params(j)
        boxes[j] = (cx - hx, cy - hy, cx + hx, cy + hy)
    want = {}
    for a in range(FOV_M):
        for b in range(a + 1, FOV_M):
            ax0, ay0, ax1, ay1 = boxes[a]
            bx0, by0, bx1, by1 = boxes[b]
            if ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1:
                area = ((min(ax1, bx1) - max(ax0, bx0))
                        * (min(ay1, by1) - max(ay0, by0)))
                cont = int((ax0 <= bx0 and bx1 <= ax1 and ay0 <= by0
                            and by1 <= ay1)
                           or (bx0 <= ax0 and ax1 <= bx1 and by0 <= ay0
                               and ay1 <= by1))
                want[(a, b)] = (round(area, 9), cont)
    # grid candidate generation is LOSSLESS: exact pair-set equality
    assert set(got) == set(want)
    for k, (area, cont) in want.items():
        assert abs(got[k][0] - area) < 1e-9
        assert got[k][1] == cont
        assert area > 0


# --- union-of-rectangles area --------------------------------------------------------

def test_rect_union_area_vs_inclusion_exclusion_and_sweep(spark):
    from itertools import combinations
    from spark_shp import fixtures as FX
    from spark_shp.queries_mining import FOV_M, q_rect_union_area
    row = q_rect_union_area(spark, SF).collect()[0]
    boxes = []
    for j in range(FOV_M):
        cx, cy, hx, hy = FX.fence_params(j)
        boxes.append((cx - hx, cy - hy, cx + hx, cy + hy))
    # independent python sweep over all 64
    xs = sorted({b[0] for b in boxes} | {b[2] for b in boxes})
    union = 0.0
    for xa, xb in zip(xs, xs[1:]):
        ivs = sorted((b[1], b[3]) for b in boxes
                     if b[0] <= xa and b[2] >= xb)
        end, cov = None, 0.0
        for y0, y1 in ivs:
            if end is None or y0 > end:
                cov += y1 - y0
                end = y1
            elif y1 > end:
                cov += y1 - end
                end = y1
        union += (xb - xa) * cov
    assert abs(row.union_area - union) < 1e-6
    assert row.n_rects == FOV_M
    assert row.sum_area > row.union_area > 0
    assert abs(row.overlap_waste - (row.sum_area - row.union_area)) < 2e-6

    # inclusion-exclusion on a small subset — a genuinely different
    # algorithm (2^k signed intersection areas), exact for rectangles
    sub = boxes[:6]

    def inter_area(sel):
        x0 = max(b[0] for b in sel); x1 = min(b[2] for b in sel)
        y0 = max(b[1] for b in sel); y1 = min(b[3] for b in sel)
        return max(0.0, x1 - x0) * max(0.0, y1 - y0)

    ie = 0.0
    for k in range(1, len(sub) + 1):
        for combo in combinations(sub, k):
            ie += (-1) ** (k + 1) * inter_area(combo)
    # replicate the sweep on the same subset
    xs = sorted({b[0] for b in sub} | {b[2] for b in sub})
    sweep = 0.0
    for xa, xb in zip(xs, xs[1:]):
        ivs = sorted((b[1], b[3]) for b in sub if b[0] <= xa and b[2] >= xb)
        end, cov = None, 0.0
        for y0, y1 in ivs:
            if end is None or y0 > end:
                cov += y1 - y0; end = y1
            elif y1 > end:
                cov += y1 - end; end = y1
        sweep += (xb - xa) * cov
    assert abs(ie - sweep) < 1e-9


# --- PMI phrase mining ----------------------------------------------------------------

def test_phrase_pmi_greedy_counts_match_sequential_scan(spark):
    import math
    from collections import Counter
    from spark_shp.queries_mining import PMI_TOPK, q_phrase_pmi_mining
    rows = q_phrase_pmi_mining(spark, SF).collect()
    assert len(rows) == PMI_TOPK
    docs = [r.text.split(" ") for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("text").collect()]
    cu, cb = Counter(), Counter()
    for ts in docs:
        cu.update(ts)
        cb.update(zip(ts, ts[1:]))
    nt, nb = sum(cu.values()), sum(cb.values())
    top = sorted(cb.items(), key=lambda kv: (-kv[1], kv[0]))[:PMI_TOPK]
    assert {r.bigram for r in rows} == {" ".join(k) for k, _ in top}
    for r in rows:
        a, b = r.bigram.split(" ")
        assert r.n_adjacent == cb[(a, b)]
        pmi = math.log((cb[(a, b)] / nb) / ((cu[a] / nt) * (cu[b] / nt)))
        assert abs(r.pmi - pmi) < 1e-6
        # greedy count by an actual left-to-right scan
        g = 0
        for ts in docs:
            i = 0
            while i < len(ts) - 1:
                if ts[i] == a and ts[i + 1] == b:
                    g += 1
                    i += 2
                else:
                    i += 1
        assert r.n_greedy == g
        assert r.n_greedy <= r.n_adjacent


# --- lead-lag correlation -------------------------------------------------------------

def test_event_lag_correlation_matches_numpy_pearson(spark):
    from spark_shp.queries_mining import (LAG_A, LAG_B, LAG_MAX,
                                          q_event_lag_correlation)
    got = {r.lag: r for r in q_event_lag_correlation(spark, SF).collect()}
    assert set(got) == set(range(LAG_MAX + 1))
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "event_type",
        "CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP_LTZ)) "
        "/ 3600000000.0) AS BIGINT) AS h").collect()
    from collections import Counter
    ca, cb = Counter(), Counter()
    for r in ev:
        if r.event_type == LAG_A:
            ca[r.h] += 1
        elif r.event_type == LAG_B:
            cb[r.h] += 1
    for lag in range(LAG_MAX + 1):
        hs = [h for h in ca if (h + lag) in cb]
        x = np.array([ca[h] for h in hs], dtype=float)
        y = np.array([cb[h + lag] for h in hs], dtype=float)
        r = got[lag]
        assert r.n_hours == len(hs)
        assert r.sxy == int((x * y).sum())
        want = np.corrcoef(x, y)[0, 1]
        assert abs(r.pearson_r - want) < 1e-6


# --- motifs + outlier audit -----------------------------------------------------------

def test_sequence_motifs_match_python_scan(spark):
    from collections import Counter
    from spark_shp.queries_mining import MOTIF_TOPK, q_sequence_motifs
    rows = q_sequence_motifs(spark, SF).collect()
    assert len(rows) == MOTIF_TOPK
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "user_id", "event_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP_LTZ)) AS us").collect()
    per_user = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append(r)
    cnt, users = Counter(), {}
    for u, rs in per_user.items():
        rs.sort(key=lambda r: (r.us, r.event_id))
        ts = [r.event_type for r in rs]
        for tri in zip(ts, ts[1:], ts[2:]):
            cnt[tri] += 1
            users.setdefault(tri, set()).add(u)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:MOTIF_TOPK]
    assert [((r.a, r.b, r.c), r.n) for r in rows] == top
    for r in rows:
        assert r.n_users == len(users[(r.a, r.b, r.c)])


def test_outlier_audit_matches_numpy_tukey(spark):
    import math
    from spark_shp.queries_mining import q_outlier_audit
    got = {r.grp: r for r in q_outlier_audit(spark, SF).collect()}
    od = spark.read.parquet(f"{SF}/orders.parquet").selectExpr(
        "o_orderpriority AS grp", "o_totalprice").collect()
    by_g = {}
    for r in od:
        by_g.setdefault(r.grp, []).append(
            math.floor(r.o_totalprice * 100 + 0.5))
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        q1 = vals[math.ceil(n / 4) - 1]
        q3 = vals[math.ceil(3 * n / 4) - 1]
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        out = sum(1 for v in vals if v < lo or v > hi)
        r = got[g]
        assert (r.n_rows, r.q1_cents, r.q3_cents, r.n_outliers) == \
            (n, q1, q3, out)


# --- physical-plan pins for the scale claims ---------------------------------------

def test_plan_shapes_of_mining_ops(spark):
    """Pins for the shuffle-count claims in the docstrings: simplification
    reuses ONE user-keyed exchange across both windows, the agg, and the
    join; interval merge is one customer-keyed pass; TWAP is the user
    window plus the bucket agg (two); the trigram miner shares one
    user-keyed exchange before the motif agg + top-k. All JVM-only (no
    Python eval nodes)."""
    from spark_shp.queries_mining import (q_interval_coverage,
                                          q_sequence_motifs,
                                          q_trajectory_simplify,
                                          q_twap_values)

    def shape(df):
        plan = df._jdf.queryExecution().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        physical = df._jdf.queryExecution().executedPlan().toString()
        return physical.count("Exchange hashpartitioning")

    assert shape(q_trajectory_simplify(spark, SF)) == 1
    assert shape(q_interval_coverage(spark, SF)) == 1
    assert shape(q_twap_values(spark, SF)) == 2
    assert shape(q_sequence_motifs(spark, SF)) <= 3  # window + agg + topk


# --- Knox space-time interaction --------------------------------------------------------

def test_knox_bucket_joins_are_lossless_vs_all_pairs(spark):
    from spark_shp.queries_mining import (KNOX_DEG, KNOX_TYPE, KNOX_US,
                                          q_knox_spacetime)
    from spark_shp import fixtures as FX
    row = q_knox_spacetime(spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").where(
        f"event_type = '{KNOX_TYPE}'").selectExpr(
        "event_id", f"{FX.EVENT_LON_SQL} AS lon",
        f"{FX.EVENT_LAT_SQL} AS lat",
        "unix_micros(CAST(ts AS TIMESTAMP_LTZ)) AS us").collect()
    pts = [(r.lon, r.lat, r.us) for r in ev]
    n = len(pts)
    n_s = n_t = n_b = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (abs(pts[i][0] - pts[j][0]) <= KNOX_DEG
                 and abs(pts[i][1] - pts[j][1]) <= KNOX_DEG)
            t = abs(pts[i][2] - pts[j][2]) <= KNOX_US
            n_s += s
            n_t += t
            n_b += s and t
    assert (row.n_events, row.n_space, row.n_time, row.n_both) == \
        (n, n_s, n_t, n_b)
    expected = (n_s * n_t) / (n * (n - 1) / 2)
    assert abs(row.knox_ratio - n_b / expected) < 1e-6


# --- OLS trend + Gini ---------------------------------------------------------------------

def test_trend_regression_matches_numpy_polyfit(spark):
    from spark_shp.queries_mining import q_trend_regression
    got = {r.g: r for r in q_trend_regression(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "event_type AS g",
        "CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP_LTZ)) "
        "/ 3600000000.0) AS BIGINT) AS h",
        "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc").collect()
    from collections import defaultdict
    hourly = defaultdict(lambda: defaultdict(int))
    for r in ev:
        hourly[r.g][r.h] += r.vc
    for g, hs in hourly.items():
        h0 = min(hs)
        x = np.array([h - h0 for h in sorted(hs)], dtype=float)
        y = np.array([hs[h] for h in sorted(hs)], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        r = got[g]
        assert r.n_hours == len(x)
        assert abs(r.slope_cents_per_hour - slope) < 1e-4
        assert abs(r.intercept_cents - intercept) < 1e-2
        assert abs(r.r_squared - r2) < 1e-6


def test_gini_matches_textbook_formula_and_bounds(spark):
    from spark_shp.queries_mining import q_gini_concentration
    row = q_gini_concentration(spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").groupBy(
        "user_id").count().collect()
    xs = sorted(r["count"] for r in ev)
    n, sx = len(xs), sum(xs)
    gini = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * sx) \
        - (n + 1) / n
    assert row.n_users == n and row.n_events == sx
    assert abs(row.gini - gini) < 1e-6
    assert 0.0 <= row.gini < 1.0
    td = sum(xs[n - n // 10:])
    assert abs(row.top_decile_share - td / sx) < 1e-6
    assert row.top_decile_share >= (n // 10) / n * 0.5  # sanity


# --- CUSUM change-point ----------------------------------------------------------------

def test_changepoint_matches_sequential_cusum(spark):
    from collections import defaultdict
    from spark_shp.queries_mining import q_changepoint_detect
    got = {r.g: r for r in q_changepoint_detect(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "event_type AS g",
        "CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP_LTZ)) "
        "/ 3600000000.0) AS BIGINT) AS h").collect()
    hourly = defaultdict(lambda: defaultdict(int))
    for r in ev:
        hourly[r.g][r.h] += 1
    for g, hs in hourly.items():
        hours = sorted(hs)
        n, sn = len(hours), sum(hs.values())
        sk, best = 0, None
        for k, h in enumerate(hours, 1):
            sk += hs[h]
            d = abs(n * sk - k * sn)
            if best is None or d > best[0] or (d == best[0]
                                               and h < best[1]):
                best = (d, h)
        r = got[g]
        assert (r.cusum_scaled, r.change_hour) == best
        assert (r.n_hours, r.n_events) == (n, sn)
        assert abs(r.cusum_norm - best[0] / (n * sn)) < 1e-6


# --- Horn slope/aspect -----------------------------------------------------------------

def test_slope_aspect_matches_numpy_horn_kernel(spark):
    import math
    from collections import Counter
    from spark_shp import cells as C, fixtures as FX
    from spark_shp.queries_mining import SLOPE_LEVEL, q_slope_aspect_raster
    got = {r.aspect: (r.n_cells, r.sum_slope2, r.max_slope2)
           for r in q_slope_aspect_raster(spark, SF).collect()}
    ix, iy = C.quantize_sql(FX.EVENT_LON_SQL, FX.EVENT_LAT_SQL, SLOPE_LEVEL)
    occ_rows = (spark.read.parquet(f"{SF}/events.parquet")
                .selectExpr(f"{ix} AS cx", f"{iy} AS cy")
                .groupBy("cx", "cy").count().collect())
    occ = {(r.cx, r.cy): r["count"] for r in occ_rows}

    def v(x, y):
        return occ.get((x, y), 0)

    def octant(dx, dy):
        # the repo's octant convention (sign + |dx| vs |dy| comparisons;
        # boundary ties pinned against atan2 in test_analytics) — what
        # this test independently checks is the HORN GRADIENT plumbing
        adx, ady = abs(dx), abs(dy)
        if dx >= 0 and dy >= 0:
            return 1 if ady > adx else 0
        if dx < 0 and dy >= 0:
            return 2 if ady > adx else 3
        if dx < 0 and dy < 0:
            return 5 if ady > adx else 4
        return 6 if ady > adx else 7

    want = {}
    for (x, y) in occ:
        gx = (v(x + 1, y + 1) + 2 * v(x + 1, y) + v(x + 1, y - 1)
              - v(x - 1, y + 1) - 2 * v(x - 1, y) - v(x - 1, y - 1))
        gy = (v(x + 1, y + 1) + 2 * v(x, y + 1) + v(x - 1, y + 1)
              - v(x + 1, y - 1) - 2 * v(x, y - 1) - v(x - 1, y - 1))
        a = -1 if gx == 0 and gy == 0 else octant(gx, gy)
        s2 = gx * gx + gy * gy
        n, ss, mx = want.get(a, (0, 0, 0))
        want[a] = (n + 1, ss + s2, max(mx, s2))
    assert got == want


# --- WKT interop -----------------------------------------------------------------------

def test_wkt_roundtrip_is_exact_for_every_event(spark):
    from spark_shp.queries_mining import q_wkt_point_ingest
    rows = q_wkt_point_ingest(spark, SF).collect()
    total = sum(r.n for r in rows)
    exact = sum(r.n_roundtrip_exact for r in rows)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert total == n_events
    assert exact == total  # µdeg -> WKT -> µdeg loses nothing, ever


def test_wkt_render_matches_python_formatting(spark):
    """The integer string-surgery renderer equals python's own decimal
    rendering of µdeg/1e6 with 6 forced fraction digits, including
    negatives and tiny magnitudes."""
    from spark_shp.queries_mining import _wkt_render_sql
    import duckdb
    cases = [0, 1, -1, 999999, -999999, 1000000, -1000000, 123456789,
             -123456789, 179999999, -179999999, 5, -5, 84999999]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(u BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(c,) for c in cases])
    got = [r[0] for r in con.execute(
        f"SELECT {_wkt_render_sql('u')} FROM t").fetchall()]
    want = [("-" if c < 0 else "") + f"{abs(c) // 1000000}."
            + f"{abs(c) % 1000000:06d}" for c in cases]
    assert got == want


# --- ANOVA + Mann-Kendall + association rules ------------------------------------------

def test_anova_f_matches_scipy_style_decomposition(spark):
    import math
    from collections import defaultdict
    from spark_shp.queries_mining import q_anova_f
    row = q_anova_f(spark, SF).collect()[0]
    od = spark.read.parquet(f"{SF}/orders.parquet").selectExpr(
        "o_orderpriority AS g", "o_totalprice").collect()
    groups = defaultdict(list)
    for r in od:
        groups[r.g].append(math.floor(r.o_totalprice + 0.5))
    allv = [v for vs in groups.values() for v in vs]
    gm = sum(allv) / len(allv)
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2
              for vs in groups.values())
    ssw = sum((v - sum(vs) / len(vs)) ** 2
              for vs in groups.values() for v in vs)
    k, n = len(groups), len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row.n_groups == k and row.n_rows == n
    assert abs(row.ss_between - ssb) / ssb < 1e-9
    assert abs(row.ss_within - ssw) / ssw < 1e-9
    assert abs(row.f_stat - f) < 1e-5


def test_mann_kendall_matches_sequential_pairs(spark):
    from collections import defaultdict
    from spark_shp.queries_mining import q_mann_kendall
    got = {r.g: r for r in q_mann_kendall(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "event_type AS g",
        "CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP_LTZ)) "
        "/ 3600000000.0) AS BIGINT) AS h").collect()
    hourly = defaultdict(lambda: defaultdict(int))
    for r in ev:
        hourly[r.g][r.h] += 1
    for g, hs in hourly.items():
        xs = [hs[h] for h in sorted(hs)]
        n = len(xs)
        s = sum((xs[j] > xs[i]) - (xs[j] < xs[i])
                for i in range(n) for j in range(i + 1, n))
        from collections import Counter
        tie = sum(t * (t - 1) * (2 * t + 5)
                  for t in Counter(xs).values() if t > 1)
        var18 = n * (n - 1) * (2 * n + 5) - tie
        r = got[g]
        assert (r.n_hours, r.s, r.var18) == (n, s, var18)
        import math
        z = (s - (1 if s > 0 else -1 if s < 0 else 0)) \
            / math.sqrt(var18 / 18.0)
        assert abs(r.z - z) < 1e-6


def test_association_rules_laws(spark):
    from spark_shp.queries_mining import q_association_rules
    rows = q_association_rules(spark, SF).collect()
    assert len(rows) == 20  # 5 types x 4 ordered partners
    ut = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "user_id", "event_type").distinct().collect()
    users = {}
    for r in ut:
        users.setdefault(r.user_id, set()).add(r.event_type)
    nu = len(users)
    for r in rows:
        both = sum(1 for s in users.values()
                   if r.ante in s and r.cons in s)
        ca = sum(1 for s in users.values() if r.ante in s)
        assert r.n_both == both and r.n_ante == ca
        assert abs(r.support - both / nu) < 1e-6
        assert abs(r.confidence - both / ca) < 1e-6
        assert r.confidence <= 1.0
    # lift symmetry: lift(a,b) == lift(b,a)
    lifts = {(r.ante, r.cons): r.lift for r in rows}
    for (a, b), l in lifts.items():
        assert abs(l - lifts[(b, a)]) < 1e-6


# --- distribution drift ------------------------------------------------------------------

def test_distribution_drift_matches_numpy_emd_and_psi(spark):
    import math
    from collections import defaultdict
    from spark_shp.queries_mining import q_distribution_drift
    got = {r.g: r for r in q_distribution_drift(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").selectExpr(
        "event_type AS g",
        "unix_micros(CAST(ts AS TIMESTAMP_LTZ)) AS us").collect()
    bins = defaultdict(lambda: np.zeros(168, dtype=np.int64))
    for r in ev:
        b = ((r.us // 86_400_000_000 + 4) % 7) * 24 \
            + (r.us // 3_600_000_000) % 24
        bins[r.g][int(b)] += 1
    base = sum(bins.values())
    nb = int(base.sum())
    for g, c in bins.items():
        nt = int(c.sum())
        cum_t, cum_b = np.cumsum(c), np.cumsum(base)
        emd_x = int(np.abs(cum_t * nb - cum_b * nt).sum())
        pa = (c + 1) / (nt + 168)
        pb = (base + 1) / (nb + 168)
        psi = float(((pa - pb) * np.log(pa / pb)).sum())
        r = got[g]
        assert r.n_events == nt
        assert r.emd_scaled == emd_x
        assert abs(r.emd_bins - emd_x / (nt * nb)) < 1e-6
        assert abs(r.psi - psi) < 1e-6
        assert r.psi >= 0 or abs(r.psi) < 1e-6  # PSI is non-negative


# --- image pixel histograms ---------------------------------------------------------------

def test_image_histogram_matches_real_decode(spark):
    """Rebuild every histogram by decoding the real bytes in python
    (codecs.decode, independent of the mapInPandas kernel path) and
    bucketing with numpy."""
    from spark_shp import codecs, fixtures
    from spark_shp.queries_mining import (HIST_BUCKETS, HIST_N,
                                          q_image_histogram_stats)
    got = {(r.fmt, r.bucket): (r.n_images, r.n_pixels, r.checksum)
           for r in q_image_histogram_stats(spark, SF).collect()}
    width = 256 // HIST_BUCKETS
    want = {}
    for i in range(HIST_N):
        if i % 3 == 2:
            continue
        row = fixtures.image_row(i)
        px = codecs.decode(row["bytes"], row["w"], row["h"],
                           row["fmt"]).astype(np.int64)
        counts = np.bincount((px // width).ravel(),
                             minlength=HIST_BUCKETS)
        for b in range(HIST_BUCKETS):
            if counts[b] == 0:
                continue
            k = (row["fmt"], b)
            n, npx, ck = want.get(k, (0, 0, 0))
            want[k] = (n + 1, npx + int(counts[b]),
                       ck + int(counts[b]) * (i + 7))
    assert got == want


# --- DAG critical path ----------------------------------------------------------------------

def test_dag_critical_path_matches_topological_dp(spark):
    from spark_shp.hashing import mix
    from spark_shp.queries_mining import (DAG_EDGES, DAG_LAYERS, DAG_WIDTH,
                                          q_dag_critical_path)
    got = {r.layer: r for r in q_dag_critical_path(spark, SF).collect()}
    i = np.arange(DAG_EDGES, dtype=np.int64)
    l_ = mix(i * 5 + 1) % (DAG_LAYERS - 1)
    u = l_ * DAG_WIDTH + mix(i * 5 + 2) % DAG_WIDTH
    v = (l_ + 1) * DAG_WIDTH + mix(i * 5 + 3) % DAG_WIDTH
    w = 1 + mix(i * 5 + 4) % 99
    edges = {}
    for a, b, c in zip(u.tolist(), v.tolist(), w.tolist()):
        edges[(a, b)] = max(edges.get((a, b), 0), c)
    nodes = sorted({x for e in edges for x in e})
    dist = {n: 0 for n in nodes}
    for n in nodes:  # topological order = node id order (layered)
        for (a, b), c in edges.items():
            if a == n:
                dist[b] = max(dist[b], dist[a] + c)
    want = {}
    for n, d in dist.items():
        lyr = n // DAG_WIDTH
        cnt, rch, mx, ck = want.get(lyr, (0, 0, 0, 0))
        want[lyr] = (cnt + 1, rch + (d > 0), max(mx, d), ck + d * 131 + n)
    assert {l: (r.n_nodes, r.n_reached, r.critical_path, r.checksum)
            for l, r in got.items()} == want
    # layer 0 holds only sources (nothing points into it) and the deepest
    # layers carry the longest chains
    assert got[0].critical_path == 0 and got[0].n_reached == 0
    assert got[max(got)].critical_path >= (DAG_LAYERS - 1)  # >=1 per hop


# --- hypothesis properties ---------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=150, deadline=None)
@given(st.sets(st.tuples(st.integers(0, 9), st.integers(0, 9)),
               min_size=1, max_size=12))
def test_hull_metrics_property_fuzz(pts):
    pts = sorted(pts)
    assert hull_metrics(pts) == _metrics_from_edges(pts, _brute_edges(pts))


@settings(max_examples=200, deadline=None)
@given(st.integers(-179_999_999, 179_999_999))
def test_wkt_render_property_fuzz(u):
    import duckdb
    from spark_shp.queries_mining import _wkt_render_sql
    got = duckdb.connect().execute(
        f"SELECT {_wkt_render_sql(str(u))}").fetchone()[0]
    want = ("-" if u < 0 else "") + f"{abs(u) // 1000000}." \
        + f"{abs(u) % 1000000:06d}"
    assert got == want
    # and the parse round-trips: strtod of the string re-quantizes to u
    import math
    assert math.floor(float(got) * 1e6 + 0.5) == u


# --- tree rollup --------------------------------------------------------------------------

def test_tree_rollup_matches_recursive_python(spark):
    import math
    from collections import defaultdict
    from spark_shp.queries_mining import q_tree_rollup
    got = {r.level: r for r in q_tree_rollup(spark, SF).collect()}
    cust = spark.read.parquet(f"{SF}/customer.parquet").selectExpr(
        "c_custkey", "c_acctbal").collect()
    vals = {r.c_custkey: math.floor(r.c_acctbal * 100 + 0.5) for r in cust}
    # genuinely recursive subtree accumulation (child -> parent walks)
    n_sub, c_sub = defaultdict(int), defaultdict(int)
    for node, cents in vals.items():
        a = node
        while a >= 1:
            n_sub[a] += 1
            c_sub[a] += cents
            a //= 2
    want = {}
    for a, n in n_sub.items():
        lvl = a.bit_length() - 1
        na, sn, mx, sc, ck = want.get(lvl, (0, 0, 0, 0, 0))
        want[lvl] = (na + 1, sn + n, max(mx, n), sc + c_sub[a],
                     ck + a % 999983)
    assert {l: (r.n_ancestors, r.sum_subtree_nodes, r.max_subtree_nodes,
                r.sum_cents, r.checksum) for l, r in got.items()} == want
    # the root (level 0) sees every node with key >= 1 (key 0 has no
    # ancestor chain under parent = child // 2 — excluded on both engines)
    assert got[0].max_subtree_nodes == sum(1 for k in vals if k >= 1)


def test_plan_shapes_of_late_ops(spark):
    """Shuffle-count pins for the late batch: tree rollup is the ancestor
    agg + the level agg (two exchanges, no join); slope/aspect is the
    occupancy agg + the scatter-target agg + final octant agg (three);
    association rules shares the distinct (user,type) exchange. All
    JVM-only."""
    from spark_shp.queries_mining import (q_association_rules,
                                          q_slope_aspect_raster,
                                          q_tree_rollup)

    def shape(df):
        plan = df._jdf.queryExecution().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        physical = df._jdf.queryExecution().executedPlan().toString()
        return physical.count("Exchange hashpartitioning")

    assert shape(q_tree_rollup(spark, SF)) == 2
    assert shape(q_slope_aspect_raster(spark, SF)) <= 3
    assert shape(q_association_rules(spark, SF)) <= 4


# --- trajectory_crossings: brute-force numpy segment intersection -------------

def _seg_intersect_brute(a, b):
    """Textbook segment intersection, written independently with numpy
    floats + exact integer orientation: returns (proper, touch)."""
    (ax0, ay0, ax1, ay1), (bx0, by0, bx1, by1) = a, b
    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)
    d1 = orient(bx0, by0, bx1, by1, ax0, ay0)
    d2 = orient(bx0, by0, bx1, by1, ax1, ay1)
    d3 = orient(ax0, ay0, ax1, ay1, bx0, by0)
    d4 = orient(ax0, ay0, ax1, ay1, bx1, by1)
    proper = (d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0 \
        and (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0
    bbox = (min(ax0, ax1) <= max(bx0, bx1) and min(bx0, bx1) <= max(ax0, ax1)
            and min(ay0, ay1) <= max(by0, by1)
            and min(by0, by1) <= max(ay0, ay1))
    touch = (not proper and d1 * d2 <= 0 and d3 * d4 <= 0 and bbox)
    return proper, touch


def test_crossings_match_bruteforce(spark):
    """Engine totals at sf0.001 == a pure-python all-pairs sweep over the
    same walk segments (rebuilt via the oracle's segment CTE in DuckDB)."""
    from spark_shp.queries_mining import _tc_segments_sql, q_trajectory_crossings

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    seg = con.sql(
        "WITH s AS (" + _tc_segments_sql("epoch_us(ts)") + ") "
        "SELECT user_id, seq, x0, y0, x1, y1 FROM s "
        "WHERE x0 IS NOT NULL AND NOT (x0 = x1 AND y0 = y1)").df()
    rows = list(seg.itertuples(index=False))
    want = {}
    for i, r in enumerate(rows):
        for s in rows[i + 1:]:
            if r.user_id == s.user_id:
                continue
            ua, ub = sorted((r.user_id, s.user_id))
            A, B = (r, s) if r.user_id < s.user_id else (s, r)
            p, t = _seg_intersect_brute(
                (A.x0, A.y0, A.x1, A.y1), (B.x0, B.y0, B.x1, B.y1))
            if p or t:
                k = (ua, ub)
                c = want.setdefault(k, [0, 0, 0])
                c[0] += p
                c[1] += t
                c[2] += (A.seq * 1009 + B.seq) % 999983
    got = {(r.ua, r.ub): (r.n_cross, r.n_touch, r.checksum)
           for r in q_trajectory_crossings(spark, SF).collect()}
    assert got == {k: tuple(v) for k, v in want.items()}
    assert sum(v[0] for v in want.values()) > 0  # fixture has real crossings


def test_crossings_hand_cases(spark):
    """The sign-test SQL on hand-built segments: an X crossing is proper,
    a T junction and a shared endpoint are touches, parallel disjoint and
    collinear-disjoint are neither."""
    from spark_shp.queries_mining import _TC_CLASSIFY, _TC_TESTS

    cases = [
        # (name, a, b, proper, touch)
        ("x_cross", (0, 0, 10, 10), (0, 10, 10, 0), 1, 0),
        ("t_junction", (0, 0, 10, 0), (5, 0, 5, 8), 0, 1),
        ("shared_end", (0, 0, 10, 0), (10, 0, 20, 5), 0, 1),
        ("parallel", (0, 0, 10, 0), (0, 3, 10, 3), 0, 0),
        ("collinear_gap", (0, 0, 4, 0), (6, 0, 9, 0), 0, 0),
        ("collinear_overlap", (0, 0, 6, 0), (4, 0, 9, 0), 0, 1),
    ]
    df = spark.createDataFrame(
        [(n, *a, *b) for n, a, b, _, _ in cases],
        "name string, ax0 long, ay0 long, ax1 long, ay1 long, "
        "bx0 long, by0 long, bx1 long, by1 long")
    got = {r.name: (r.is_proper, r.is_touch)
           for r in df.selectExpr("*", *_TC_TESTS)
           .selectExpr("name", *_TC_CLASSIFY).collect()}
    for n, _, _, p, t in cases:
        assert got[n] == (p, t), n


# --- theil_sen_slope: numpy median-of-slopes replication ----------------------

def test_theil_sen_matches_numpy(spark):
    from spark_shp.queries_mining import q_theil_sen_slope

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    hourly = con.sql("""
        SELECT event_type, CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT)
                 AS h,
               SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS v
        FROM events GROUP BY 1, 2""").df()
    got = {r.event_type: (r.n_pairs, r.med_num, r.med_den, r.ts_slope)
           for r in q_theil_sen_slope(spark, SF).collect()}
    for et, g in hourly.groupby("event_type"):
        h = g.h.to_numpy()
        v = g.v.to_numpy()
        i, j = np.triu_indices(len(h), k=1)
        # numpy sorts the quotient; ties across distinct (num, den) pairs
        # are interchangeable for the reported slope value
        order = np.lexsort((v[j] - v[i], h[j] - h[i],
                            (v[j] - v[i]) / (h[j] - h[i])))
        k = order[(len(order) + 1) // 2 - 1]
        n_pairs, num, den = len(order), v[j][k] - v[i][k], h[j][k] - h[i][k]
        assert got[et][0] == n_pairs
        assert got[et][3] == pytest.approx(num / den, abs=1e-9)


def test_theil_sen_recovers_clean_trend(spark):
    """On exact linear data v = 7*h dollars (700 cents/hour) + noise on
    <50% of points, the median slope is exactly 700 — the robustness
    property OLS lacks."""
    from spark_shp.queries_mining import q_theil_sen_slope
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        rows = []
        for h in range(24):
            noise = 100000 if h % 5 == 0 else 0  # 5/24 contaminated
            rows.append((h, "2024-01-01 %02d:30:00" % h, 7.0 * h + noise))
        spark.createDataFrame(rows, "event_id long, ts string, value double") \
            .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts",
                        "CAST(1 AS BIGINT) AS user_id",
                        "'a' AS event_type", "value",
                        "'{}' AS props") \
            .write.parquet(os.path.join(d, "events.parquet"))
        out = q_theil_sen_slope(spark, d).collect()
        assert len(out) == 1
        assert out[0].ts_slope == pytest.approx(700.0, abs=1e-9)


def test_plan_shapes_of_crossings_theil_sen(spark):
    from spark_shp.queries_mining import (q_theil_sen_slope,
                                          q_trajectory_crossings)

    for q in (q_trajectory_crossings, q_theil_sen_slope):
        plan = q(spark, SF)._jdf.queryExecution().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


# --- chisq_independence: numpy contingency replication -------------------------

def test_chisq_matches_numpy(spark):
    from spark_shp.queries_mining import q_chisq_independence

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    tab = con.sql("""
        SELECT event_type,
               CAST((FLOOR(epoch_us(ts) / 86400000000.0) + 4) % 7 AS BIGINT)
                 AS dow, COUNT(*) AS o
        FROM events GROUP BY 1, 2""").df()
    piv = tab.pivot_table(index="event_type", columns="dow", values="o",
                          fill_value=0)
    obs = piv.to_numpy(dtype=float)
    r = obs.sum(axis=1, keepdims=True)
    c = obs.sum(axis=0, keepdims=True)
    n = obs.sum()
    exp = r @ c / n
    # numpy computes contributions over the FULL rectangle; the query only
    # over occupied cells — restrict to cells with o > 0
    contrib = np.where(obs > 0, (obs - exp) ** 2 / exp, 0.0).sum(axis=1)
    got = {row.event_type: row for row in
           q_chisq_independence(spark, SF).collect()}
    for et, want in zip(piv.index, contrib):
        assert got[et].chi2_contrib == pytest.approx(want, abs=1e-4)
        assert got[et].n_type == int(piv.loc[et].sum())


def test_chisq_dow_epoch_rule():
    """(day + 4) % 7 is Sunday-anchored day-of-week (Sunday=0):
    1970-01-01 was a Thursday -> 4; pinned against python's calendar."""
    import datetime
    for d in (0, 1, 3, 6, 7, 19000, 20321):
        dt = datetime.date(1970, 1, 1) + datetime.timedelta(days=d)
        assert (d + 4) % 7 == (dt.weekday() + 1) % 7


# --- nearest_seed_zones: brute-force numpy Voronoi ------------------------------

def test_nearest_seed_zones_bruteforce(spark):
    from spark_shp.hashing import u01
    from spark_shp.queries_mining import (NSZ_K, NSZ_LEVEL,
                                          q_nearest_seed_zones)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    from spark_shp import cells, fixtures
    ix, iy = cells.quantize_sql(fixtures.EVENT_LON_SQL,
                                fixtures.EVENT_LAT_SQL, NSZ_LEVEL)
    occ = con.sql(f"SELECT {ix} AS ix, {iy} AS iy, COUNT(*) AS ne "
                  "FROM events GROUP BY 1, 2").df()
    s = np.arange(NSZ_K)
    n = 1 << NSZ_LEVEL
    sx = np.floor(u01(s * 31 + 7) * n).astype(np.int64)
    sy = np.floor(u01(s * 31 + 8) * n).astype(np.int64)
    d2 = ((occ["ix"].to_numpy()[:, None] - sx[None, :]) ** 2
          + (occ["iy"].to_numpy()[:, None] - sy[None, :]) ** 2)
    zone = np.argmin(d2, axis=1)          # argmin takes the FIRST minimum
    dmin = d2[np.arange(len(occ)), zone]  # = lowest seed_id on ties
    got = {r.zone: r for r in q_nearest_seed_zones(spark, SF).collect()}
    assert sum(r.n_cells for r in got.values()) == len(occ)
    for z in np.unique(zone):
        m = zone == z
        assert got[z].n_cells == int(m.sum())
        assert got[z].sum_d2 == int(dmin[m].sum())
        assert got[z].n_events == int(occ["ne"].to_numpy()[m].sum())


# --- max_drawdown: sequential python replication --------------------------------

def test_max_drawdown_sequential(spark):
    from spark_shp.queries_mining import q_max_drawdown

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    hourly = con.sql("""
        SELECT event_type, CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT)
                 AS h,
               SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS v
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""").df()
    got = {r.event_type: r for r in q_max_drawdown(spark, SF).collect()}
    for et, g in hourly.groupby("event_type"):
        cum = peak = 0
        best, trough = -1, None
        for _, row in g.iterrows():
            cum += int(row.v)
            peak = max(peak, cum)
            dd = peak - cum
            if dd > best:
                best, trough = dd, int(row.h)
        assert got[et].max_dd == best
        assert got[et].trough_h == trough
        assert got[et].n_hours == len(g)


def test_plan_shapes_of_stats_trio(spark):
    from spark_shp.queries_mining import (q_chisq_independence,
                                          q_max_drawdown,
                                          q_nearest_seed_zones)

    for q in (q_chisq_independence, q_nearest_seed_zones, q_max_drawdown):
        qe = q(spark, SF)._jdf.queryExecution()
        plan = qe.toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
    # the Voronoi assign is a literal LEAST projection: no join at all,
    # and the only corpus-scale exchange is the occupancy groupBy
    phys = q_nearest_seed_zones(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in phys
    assert phys.count("Exchange hashpartitioning") <= 2


# --- ks_test: scipy-free numpy replication --------------------------------------

def test_ks_matches_numpy(spark):
    from spark_shp.queries_mining import KS_A, KS_B, q_ks_test

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    df = con.sql(f"""
        SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
        FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')""").df()
    a = np.sort(df[df.event_type == KS_A].c.to_numpy())
    b = np.sort(df[df.event_type == KS_B].c.to_numpy())
    support = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, support, side="right") / len(a)
    fb = np.searchsorted(b, support, side="right") / len(b)
    d = np.abs(fa - fb)
    got = q_ks_test(spark, SF).collect()[0]
    assert got.n_a == len(a) and got.n_b == len(b)
    assert got.ks_d == pytest.approx(d.max(), abs=1e-9)
    # argmax location: the query reports the SMALLEST cents achieving max
    assert got.at_cents == int(support[
        np.nonzero(np.isclose(d, d.max(), atol=1e-12))[0][0]])


# --- kaplan_meier: lifelines-free sequential replication -------------------------

def test_kaplan_meier_sequential(spark):
    from spark_shp.queries_mining import q_kaplan_meier

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    users = con.sql("""
        SELECT user_id,
               MIN(CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT)) AS h0,
               MAX(CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT)) AS h1,
               MIN(CASE WHEN event_type = 'error'
                   THEN CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT)
                   END) AS he
        FROM events GROUP BY 1""").df()
    hmax = users.h1.max()
    durs, churn = [], []
    for _, u in users.iterrows():
        if not pd.isna(u.he):
            durs.append(int(u.he - u.h0))
            churn.append(True)
        else:
            durs.append(int(hmax - u.h0))
            churn.append(False)
    durs = np.array(durs)
    churn = np.array(churn)
    got = q_kaplan_meier(spark, SF).collect()
    s = 1.0
    rows = iter(sorted(got, key=lambda r: r.dur))
    for t in np.unique(durs[churn]):
        n_risk = int((durs >= t).sum())
        deaths = int(((durs == t) & churn).sum())
        s *= (n_risk - deaths) / n_risk
        r = next(rows)
        assert (r.dur, r.deaths, r.n_risk) == (int(t), deaths, n_risk)
        assert r.km_survival == pytest.approx(s, abs=1e-5)
    # the curve is non-trivial on this fixture
    assert len(got) > 3 and got[-1].km_survival < 1.0


# --- flow_direction_d8: numpy steepest-descent replication ----------------------

def _py_flow_dirs():
    """Per-cell (fdir, chosen_drop, elev) by float steepest-descent — an
    independent replication of the integer-score kernel."""
    from spark_shp import cells, fixtures
    from spark_shp.queries_mining import _D8, FLOW_LEVEL

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    ix, iy = cells.quantize_sql(fixtures.EVENT_LON_SQL,
                                fixtures.EVENT_LAT_SQL, FLOW_LEVEL)
    occ = con.sql(f"SELECT {ix} AS ix, {iy} AS iy, COUNT(*) AS c "
                  "FROM events GROUP BY 1, 2").df()
    n = 1 << FLOW_LEVEL
    # pad the DEM by 1 so off-grid neighbors read elevation 0
    z = np.zeros((n + 2, n + 2), dtype=np.int64)
    z[occ["ix"].to_numpy() + 1, occ["iy"].to_numpy() + 1] = \
        occ["c"].to_numpy()
    sqrt2 = float(np.sqrt(2.0))
    out = {}
    for x, y, c in occ.itertuples(index=False):
        best_rate, fdir, chosen, max_drop = 0.0, None, 0, None
        for i, (dx, dy) in enumerate(_D8):
            drop = int(c) - int(z[x + 1 + dx, y + 1 + dy])
            max_drop = drop if max_drop is None else max(max_drop, drop)
            if drop <= 0:
                continue
            rate = drop / (1.0 if dx == 0 or dy == 0 else sqrt2)
            if rate > best_rate:        # strict > = first-max tiebreak
                best_rate, fdir, chosen = rate, i, drop
        if fdir is None:
            fdir, chosen = (-1 if max_drop == 0 else -2), 0
        out[(int(x), int(y))] = (fdir, chosen, int(c))
    return out


def test_flow_d8_bruteforce(spark):
    from spark_shp.queries_mining import q_flow_direction_d8

    hist = {}
    for (x, y), (fdir, chosen, c) in _py_flow_dirs().items():
        nc, sd, se = hist.get(fdir, (0, 0, 0))
        hist[fdir] = (nc + 1, sd + chosen, se + c)
    got = {r.fdir: (r.n_cells, r.sum_drop, r.sum_elev)
           for r in q_flow_direction_d8(spark, SF).collect()}
    assert got == hist


def test_flow_accumulation_bruteforce(spark):
    from spark_shp.queries_mining import _D8, q_flow_accumulation

    dirs = _py_flow_dirs()
    acc = {cell: 0 for cell in dirs}
    for start in dirs:                   # walk every chain to its outlet
        cur = start
        while cur in acc:
            acc[cur] += 1
            fdir = dirs[cur][0]
            if fdir < 0:
                break
            dx, dy = _D8[fdir]
            cur = (cur[0] + dx, cur[1] + dy)
    hist = {}
    for v in acc.values():
        hist[v] = hist.get(v, 0) + 1
    got = {r.acc: r.n_cells for r in q_flow_accumulation(spark, SF).collect()}
    assert got == hist
    # acyclicity witness: total chain-position tokens == sum(acc)
    assert sum(a * n for a, n in got.items()) == sum(acc.values())


# --- idw_interpolate: numpy gap-fill replication ---------------------------------

def test_idw_bruteforce(spark):
    from spark_shp import cells, fixtures
    from spark_shp.queries_mining import IDW_LEVEL, q_idw_interpolate

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    ix, iy = cells.quantize_sql(fixtures.EVENT_LON_SQL,
                                fixtures.EVENT_LAT_SQL, IDW_LEVEL)
    occ = con.sql(
        f"SELECT {ix} AS ix, {iy} AS iy, "
        "SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS zv "
        "FROM events GROUP BY 1, 2").df()
    field = {(int(x), int(y)): int(v)
             for x, y, v in occ.itertuples(index=False)}
    exp = {}
    for (x, y), _ in field.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                t = (x + dx, y + dy)
                if (dx == dy == 0) or t in field or t in exp:
                    continue
                num = den = 0
                for ex in (-1, 0, 1):
                    for ey in (-1, 0, 1):
                        if ex == ey == 0:
                            continue
                        s = field.get((t[0] + ex, t[1] + ey))
                        if s is not None:
                            w = 2 if (ex == 0 or ey == 0) else 1
                            num, den = num + w * s, den + w
                exp[t] = (num, den, num / den)
    rows = q_idw_interpolate(spark, SF).collect()
    got = {(r.tx, r.ty): (r.num, r.den, r.idw_cents) for r in rows}
    assert got == exp


# --- pps_sample: numpy acceptance-test replication + invariants -----------------

def test_pps_sample_bruteforce(spark):
    from spark_shp.hashing import mix
    from spark_shp.queries_mining import q_pps_sample

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    d = con.sql("SELECT doc_id, source, n_chars FROM documents").df()
    w = d["n_chars"].to_numpy().astype(np.int64)
    h = mix(d["doc_id"].to_numpy()).astype(np.int64)
    w_max = int(w.max())
    kept = h * w_max < w * 4294967296
    # invariant: a max-weight doc is ALWAYS kept (p = w/w_max = 1)
    assert kept[w == w_max].all()
    rows = q_pps_sample(spark, SF).collect()
    assert sum(r.n_sampled for r in rows) == int(kept.sum())
    for r in rows:
        m = (d["source"] == r.source).to_numpy()
        assert r.n_docs == int(m.sum())
        assert r.n_sampled == int(kept[m].sum())
        assert r.w_sampled == int(w[m][kept[m]].sum())


def test_plan_shapes_of_flow_idw_pps(spark):
    from spark_shp.queries_mining import (q_flow_direction_d8,
                                          q_idw_interpolate, q_pps_sample)

    for q in (q_flow_direction_d8, q_idw_interpolate, q_pps_sample):
        qe = q(spark, SF)._jdf.queryExecution()
        plan = qe.toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
    # both raster ops: constant scatter explode, no join; exchanges =
    # occupancy groupBy + target-cell groupBy (+ flow's final <=10-key
    # histogram agg — grid-bounded, not corpus-scale)
    for q, max_ex in ((q_flow_direction_d8, 3), (q_idw_interpolate, 2)):
        phys = q(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in phys
        assert phys.count("Exchange hashpartitioning") <= max_ex
    # pps: the w_max scalar joins broadcast, never shuffled
    phys = q_pps_sample(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in phys
    assert phys.count("Exchange hashpartitioning") <= 1


# --- soundex_blocking: python replication + published vectors -------------------

def _py_soundex(tok: str) -> str:
    """The operator's documented variant: American Soundex without the
    H/W non-separator exception."""
    m = dict(zip("abcdefghijklmnopqrstuvwxyz", "01230120022455012623010202"))
    d = "".join(m[c] for c in tok)
    out = []
    for ch in d:
        if not (out and out[-1] == ch and ch != "0"):
            out.append(ch)
    # collapse runs of the same non-zero digit (zeros only matter as
    # separators and are dropped below, so their runs are irrelevant)
    c = "".join(out)
    tail = c[1:].replace("0", "")
    return tok[0].upper() + (tail + "000")[:3]


def test_soundex_vectors():
    from spark_shp.queries_mining import _soundex_sql

    con = duckdb.connect()
    vecs = {"robert": "R163", "rupert": "R163", "tymczak": "T522",
            "pfister": "P236", "jackson": "J250", "ring": "R520",
            "ashcraft": "A226"}   # A226: no-H/W variant (NARA gives A261)
    for tok, want in vecs.items():
        got = con.sql(
            f"SELECT {_soundex_sql(repr(tok), 'duckdb')}").fetchone()[0]
        assert got == want, (tok, got, want)
        assert _py_soundex(tok) == want, (tok, _py_soundex(tok), want)


def test_soundex_blocking_bruteforce(spark):
    from spark_shp.queries_mining import q_soundex_blocking

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    toks = [r[0] for r in con.sql(
        "SELECT tok FROM (SELECT UNNEST(string_split(text, ' ')) AS tok "
        "FROM documents) WHERE LENGTH(tok) >= 2").fetchall()]
    import collections
    blocks = collections.defaultdict(collections.Counter)
    for t in toks:
        if t.isalpha() and t.islower():
            blocks[_py_soundex(t)][t] += 1
    rows = q_soundex_blocking(spark, SF).collect()
    assert len(rows) == len(blocks)
    for r in rows:
        b = blocks[r.code]
        assert r.n_distinct_tokens == len(b)
        assert r.n_tokens == sum(b.values())
        assert r.first_token == min(b)
        assert r.n_candidate_pairs == len(b) * (len(b) - 1) // 2


def test_watershed_labels_bruteforce(spark):
    from spark_shp.queries_mining import _D8, q_watershed_labels

    dirs = _py_flow_dirs()
    def root_of(cell):
        while True:
            fdir = dirs[cell][0]
            if fdir < 0:
                return cell
            dx, dy = _D8[fdir]
            nxt = (cell[0] + dx, cell[1] + dy)
            if nxt not in dirs:      # pointer exits the occupied set
                return cell
            cell = nxt
    basins = {}
    for cell, (_, _, c) in dirs.items():
        r = root_of(cell)
        n, se = basins.get(r, (0, 0))
        basins[r] = (n + 1, se + c)
    got = {(r.rx, r.ry): (r.n_cells, r.sum_elev)
           for r in q_watershed_labels(spark, SF).collect()}
    assert got == basins
    # conservation: every occupied cell belongs to exactly one basin
    assert sum(n for n, _ in got.values()) == len(dirs)


def test_map_match_exact_argmin_vs_float_geometry(spark):
    """The packed-integer argmin must agree with textbook float
    point-to-segment distance on every occupied cell (ties -> lower id)."""
    import numpy as np
    from spark_shp.queries_mining import (MM_LEVEL, q_map_match_segments,
                                          road_segments)
    from spark_shp.hashing import u01

    segs = road_segments()
    # replicate the event -> level-10 cell quantization
    con = duckdb.connect()
    eids = con.sql(f"SELECT event_id FROM "
                   f"read_parquet('{SF}/events.parquet')") \
        .df()["event_id"].to_numpy().astype(np.int64)
    lon = u01(eids) * 360.0 - 180.0
    lat = u01(eids * 2 + 1) * 170.0 - 85.0
    n = 1 << MM_LEVEL
    px = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(int)
    py = np.clip(np.floor((lat + 85.0) / 170.0 * n), 0, n - 1).astype(int)
    pts = {}
    for x, y in zip(px, py):
        pts[(x, y)] = pts.get((x, y), 0) + 1

    def seg_d2(x, y, s):
        _, ax, ay, dx, dy = s
        vx, vy = x - ax, y - ay
        dot = vx * dx + vy * dy
        if dot <= 0:
            return (vx * vx + vy * vy) * 2500
        if dot >= 2500:
            wx, wy = x - ax - dx, y - ay - dy
            return (wx * wx + wy * wy) * 2500
        return (vx * vx + vy * vy) * 2500 - dot * dot

    exp = {}
    for (x, y), c in pts.items():
        best = min((seg_d2(x, y, s), s[0]) for s in segs)
        st = exp.setdefault(best[1], [0, 0, 0, 0])
        st[0] += 1
        st[1] += c
        st[2] += best[0]
        st[3] += (x * 1024 + y) * c
        # cross-check the integer numerator against float geometry
        _, ax, ay, dx, dy = segs[best[1]]
        t = np.clip((x - ax) * dx + (y - ay) * dy, 0, 2500) / 2500.0
        fd2 = (x - ax - t * dx) ** 2 + (y - ay - t * dy) ** 2
        assert abs(best[0] / 2500.0 - fd2) < 1e-6

    got = {r.seg: [r.n_cells, r.n_points, r.sum_dnum, r.checksum]
           for r in q_map_match_segments(spark, SF).collect()}
    assert got == exp


def test_sobel_kernel_vs_direct_convolution():
    """The sliced whole-stack Sobel must equal a textbook per-pixel
    convolution on the generator pixels, for every fixture size."""
    import numpy as np
    from spark_shp import fixtures

    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.int64)
    ky = kx.T
    for i in [0, 1, 3, 4, 7]:           # raw and png ids, mixed sizes
        m = fixtures.images_meta(np.array([i]))
        w, h = int(m["w"][0]), int(m["h"][0])
        g = fixtures.image_pixels(i, w, h)[..., 1].astype(np.int64)
        direct = 0
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                win = g[y - 1:y + 2, x - 1:x + 2]
                direct += abs((win * kx).sum()) + abs((win * ky).sum())
        p = g[None]
        gx = ((p[:, :-2, 2:] + 2 * p[:, 1:-1, 2:] + p[:, 2:, 2:])
              - (p[:, :-2, :-2] + 2 * p[:, 1:-1, :-2] + p[:, 2:, :-2]))
        gy = ((p[:, 2:, :-2] + 2 * p[:, 2:, 1:-1] + p[:, 2:, 2:])
              - (p[:, :-2, :-2] + 2 * p[:, :-2, 1:-1] + p[:, :-2, 2:]))
        assert int((np.abs(gx) + np.abs(gy)).sum()) == direct


def test_sobel_edge_stats_decode_path(spark):
    """q_sobel_edge_stats through the REAL decode path must equal the
    formula recomputation per format."""
    import numpy as np
    from spark_shp import fixtures
    from spark_shp.queries_mining import SOBEL_N, q_sobel_edge_stats

    exp = {}
    for i in range(SOBEL_N):
        if i % 3 == 2:
            continue
        fmt = "raw" if i % 3 == 0 else "png"
        m = fixtures.images_meta(np.array([i]))
        w, h = int(m["w"][0]), int(m["h"][0])
        p = fixtures.image_pixels(i, w, h)[..., 1].astype(np.int64)[None]
        gx = ((p[:, :-2, 2:] + 2 * p[:, 1:-1, 2:] + p[:, 2:, 2:])
              - (p[:, :-2, :-2] + 2 * p[:, 1:-1, :-2] + p[:, 2:, :-2]))
        gy = ((p[:, 2:, :-2] + 2 * p[:, 2:, 1:-1] + p[:, 2:, 2:])
              - (p[:, :-2, :-2] + 2 * p[:, :-2, 1:-1] + p[:, :-2, 2:]))
        e = int((np.abs(gx) + np.abs(gy)).sum())
        st = exp.setdefault(fmt, [0, 0, 10 ** 18, 0, 0])
        st[0] += 1
        st[1] += e
        st[2] = min(st[2], e)
        st[3] = max(st[3], e)
        st[4] += e * (i + 7)
    got = {r.fmt: [r.n_images, r.sum_energy, r.min_energy, r.max_energy,
                   r.checksum]
           for r in q_sobel_edge_stats(spark, SF).collect()}
    assert got == exp


def test_bpe_pair_counts_bruteforce(spark):
    """Pure-python BPE pair counting over the raw parquet must match:
    n_pairs = occurrences weighted by word frequency, n_words = distinct
    vocabulary words containing the pair."""
    con = duckdb.connect()
    docs = con.sql(f"SELECT text FROM "
                   f"read_parquet('{SF}/documents.parquet')").fetchall()
    from collections import Counter
    wf = Counter()
    for (text,) in docs:
        for word in text.split(" "):
            if len(word) >= 2:
                wf[word] += 1
    cnt, words = Counter(), {}
    for word, wc in wf.items():
        for p in range(len(word) - 1):
            pair = word[p:p + 2]
            cnt[pair] += wc
            words.setdefault(pair, set()).add(word)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:40]
    exp = {r + 1: (pair, n, len(words[pair]))
           for r, (pair, n) in enumerate(ranked)}
    from spark_shp.queries_mining import q_bpe_pair_counts
    got = {r.merge_rank: (r.pair, r.n_pairs, r.n_words)
           for r in q_bpe_pair_counts(spark, SF).collect()}
    assert got == exp


def test_vocab_growth_bruteforce(spark):
    """Sequential first-occurrence scan must reproduce the decile curve,
    and the last decile's vocab_cum must equal the total vocabulary."""
    con = duckdb.connect()
    docs = con.sql(f"SELECT doc_id, text FROM "
                   f"read_parquet('{SF}/documents.parquet') "
                   f"ORDER BY doc_id").fetchall()
    nd = len(docs)
    seen, new_terms, n_tokens = set(), {}, {}
    for doc_id, text in docs:
        dec = doc_id * 10 // nd
        for tok in text.split(" "):
            if not tok:
                continue
            n_tokens[dec] = n_tokens.get(dec, 0) + 1
            if tok not in seen:
                seen.add(tok)
                new_terms[dec] = new_terms.get(dec, 0) + 1
    from spark_shp.queries_mining import q_vocab_growth
    rows = sorted(q_vocab_growth(spark, SF).collect(),
                  key=lambda r: r.decile)
    vc = tc = 0
    for r in rows:
        assert r.n_new_terms == new_terms.get(r.decile, 0)
        vc += new_terms.get(r.decile, 0)
        tc += n_tokens.get(r.decile, 0)
        assert r.vocab_cum == vc
        assert r.tokens_cum == tc
    assert rows[-1].vocab_cum == len(seen)


def test_blob_labeling_vs_union_find():
    """Stack min-label propagation must match a classic union-find flood
    fill on the generator masks, for several 16x16 fixture images."""
    import numpy as np
    from spark_shp import fixtures

    def uf_blobs(mask):
        h, w = mask.shape
        parent = {}

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for y in range(h):
            for x in range(w):
                if mask[y, x]:
                    parent[(y, x)] = (y, x)
        for y in range(h):
            for x in range(w):
                if not mask[y, x]:
                    continue
                for ny, nx in ((y + 1, x), (y, x + 1)):
                    if ny < h and nx < w and mask[ny, nx]:
                        ra, rb = find((y, x)), find((ny, nx))
                        if ra != rb:
                            parent[rb] = ra
        comps = {}
        for cell in parent:
            comps.setdefault(find(cell), []).append(cell)
        sizes = sorted(len(v) for v in comps.values())
        labels = sorted(min(y * w + x for y, x in v)
                        for v in comps.values())
        return len(comps), sizes[-1] if sizes else 0, sum(labels)

    from spark_shp.queries_mining import BLOB_N
    found = 0
    for i in range(BLOB_N):
        if i % 3 == 2:
            continue
        m = fixtures.images_meta(np.array([i]))
        if int(m["w"][0]) != 16 or int(m["h"][0]) != 16:
            continue
        mask = fixtures.image_pixels(i, 16, 16)[..., 1] >= 128
        nb, mx, ls = uf_blobs(mask)
        # replicate the stack kernel on this single image
        big = np.int64(256)
        yy, xx = np.meshgrid(np.arange(16, dtype=np.int64),
                             np.arange(16, dtype=np.int64), indexing="ij")
        lab = np.where(mask, (yy * 16 + xx), big)[None].copy()
        while True:
            nxt = lab.copy()
            nxt[:, 1:, :] = np.minimum(nxt[:, 1:, :], lab[:, :-1, :])
            nxt[:, :-1, :] = np.minimum(nxt[:, :-1, :], lab[:, 1:, :])
            nxt[:, :, 1:] = np.minimum(nxt[:, :, 1:], lab[:, :, :-1])
            nxt[:, :, :-1] = np.minimum(nxt[:, :, :-1], lab[:, :, 1:])
            nxt = np.where(mask[None], nxt, big)
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        lv = lab[0][mask]
        uniq, counts = np.unique(lv, return_counts=True)
        assert (len(uniq), int(counts.max()), int(uniq.sum())) == (nb, mx, ls)
        found += 1
        if found >= 8:
            break
    assert found >= 8


def test_grad_orientation_octants_vs_atan2(spark):
    """The comparison-only octant rule must agree with atan2 binning away
    from the 45-degree boundaries, and the gated query must reproduce the
    formula recomputation end-to-end at SOBEL_N."""
    import math
    import numpy as np
    from spark_shp import fixtures
    from spark_shp.queries_mining import SOBEL_N, q_grad_orientation_hist

    def octant(gx, gy):
        ax, ay = abs(gx), abs(gy)
        if gx >= 0 and gy >= 0:
            return 1 if ay > ax else 0
        if gx < 0 and gy >= 0:
            return 2 if ay > ax else 3
        if gx < 0 and gy < 0:
            return 5 if ay > ax else 4
        return 6 if ay > ax else 7

    rng = [(3, 1), (1, 3), (-2, 5), (-5, 2), (-4, -1), (-1, -4),
           (2, -5), (5, -2), (7, 0), (0, 7), (-7, 0), (0, -7)]
    for gx, gy in rng:
        if abs(gx) != abs(gy):
            a = math.atan2(gy, gx) % (2 * math.pi)
            bin_ = int(a // (math.pi / 4)) % 8
            if abs(a % (math.pi / 4)) > 1e-9:       # off-boundary only
                assert octant(gx, gy) == bin_

    exp = {}
    for i in range(SOBEL_N):
        if i % 3 == 2:
            continue
        fmt = "raw" if i % 3 == 0 else "png"
        m = fixtures.images_meta(np.array([i]))
        w, h = int(m["w"][0]), int(m["h"][0])
        p = fixtures.image_pixels(i, w, h)[..., 1].astype(np.int64)
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                gx = ((p[y - 1, x + 1] + 2 * p[y, x + 1] + p[y + 1, x + 1])
                      - (p[y - 1, x - 1] + 2 * p[y, x - 1]
                         + p[y + 1, x - 1]))
                gy = ((p[y + 1, x - 1] + 2 * p[y + 1, x] + p[y + 1, x + 1])
                      - (p[y - 1, x - 1] + 2 * p[y - 1, x]
                         + p[y - 1, x + 1]))
                if gx == 0 and gy == 0:
                    continue
                key = (fmt, octant(gx, gy))
                st = exp.setdefault(key, [set(), 0, 0])
                st[0].add(i)
                st[1] += 1
                st[2] += i + 7
    want = {k: (len(v[0]), v[1], v[2]) for k, v in exp.items()}
    got = {(r.fmt, r.octant): (r.n_images, r.n_pixels, r.checksum)
           for r in q_grad_orientation_hist(spark, SF).collect()}
    assert got == want


def test_template_match_vs_bruteforce(spark):
    """The packed-key argmax must find the textbook (peak, first-pos) for
    every fixture image, and the gated query must reproduce it."""
    import numpy as np
    from spark_shp import fixtures
    from spark_shp.multimodal import template_kernel
    from spark_shp.queries_mining import SOBEL_N, q_template_match_peaks

    kern = template_kernel()
    exp = {}
    for i in range(SOBEL_N):
        if i % 3 == 2:
            continue
        fmt = "raw" if i % 3 == 0 else "png"
        m = fixtures.images_meta(np.array([i]))
        w, h = int(m["w"][0]), int(m["h"][0])
        g = fixtures.image_pixels(i, w, h)[..., 1].astype(np.int64)
        best = None
        for y in range(h - 3):
            for x in range(w - 3):
                s = int((g[y:y + 4, x:x + 4] * kern).sum())
                if best is None or s > best[0]:
                    best = (s, y * w + x)
        st = exp.setdefault(fmt, [0, 0, -10 ** 18, 0])
        st[0] += 1
        st[1] += best[0]
        st[2] = max(st[2], best[0])
        st[3] += best[1] * (i + 7)
    got = {r.fmt: [r.n_images, r.sum_peak, r.max_peak, r.pos_checksum]
           for r in q_template_match_peaks(spark, SF).collect()}
    assert got == exp


def test_viewshed_rays_bruteforce(spark):
    """Sequential per-ray line-of-sight walk must reproduce the gated
    visibility verdicts (strict-> rule, observer at grid center)."""
    from spark_shp import cells, fixtures
    from spark_shp.queries_mining import (VS_CX, VS_CY, VS_LEVEL,
                                          q_viewshed_rays)

    con = duckdb.connect()
    ix, iy = cells.quantize_sql(fixtures.EVENT_LON_SQL,
                                fixtures.EVENT_LAT_SQL, VS_LEVEL)
    occ = {(r[0], r[1]): r[2] for r in con.sql(
        f"SELECT {ix} AS tx, {iy} AS ty, COUNT(*) FROM "
        f"read_parquet('{SF}/events.parquet') GROUP BY 1, 2").fetchall()}
    z0 = occ.get((VS_CX, VS_CY), 0)
    dirs = [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1),
            (1, -1)]
    exp = {}
    for ray, (dx, dy) in enumerate(dirs):
        cellsr = []
        d = 1
        while True:
            c = (VS_CX + dx * d, VS_CY + dy * d)
            if not (0 <= c[0] < 2 ** VS_LEVEL and 0 <= c[1] < 2 ** VS_LEVEL):
                break
            if c in occ:
                cellsr.append((d, occ[c]))
            d += 1
        if not cellsr:
            continue
        prior, n_vis, max_d, cs = None, 0, None, 0
        for d, zc in cellsr:
            ang = (zc - z0) / d
            v = prior is None or ang > prior
            prior = ang if prior is None else max(prior, ang)
            if v:
                n_vis += 1
                max_d = d
                cs += d * 1000 + zc
        exp[ray] = (len(cellsr), n_vis, max_d, cs)
    got = {r.ray: (r.n_cells, r.n_visible, r.max_d_vis, r.checksum)
           for r in q_viewshed_rays(spark, SF).collect()}
    assert got == exp


def test_zonal_stats_bruteforce(spark):
    """numpy replication: quantize events, roll up the grid, test every
    cell centroid against every fence rectangle."""
    import numpy as np
    from spark_shp.fixtures import nation_fences_np
    from spark_shp.hashing import u01
    from spark_shp.queries_mining import ZS_LEVEL, q_zonal_stats

    con = duckdb.connect()
    eids = con.sql(f"SELECT event_id FROM "
                   f"read_parquet('{SF}/events.parquet')") \
        .df()["event_id"].to_numpy().astype(np.int64)
    nk = con.sql(f"SELECT n_nationkey, n_name FROM "
                 f"read_parquet('{SF}/nation.parquet')").fetchall()
    lon = u01(eids) * 360.0 - 180.0
    lat = u01(eids * 2 + 1) * 170.0 - 85.0
    n = 1 << ZS_LEVEL
    tx = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(int)
    ty = np.clip(np.floor((lat + 85.0) / 170.0 * n), 0, n - 1).astype(int)
    grid = {}
    for x, y in zip(tx, ty):
        grid[(x, y)] = grid.get((x, y), 0) + 1
    keys = np.array([k for k, _ in nk], dtype=np.int64)
    cx, cy, hw = nation_fences_np(keys)
    exp = {}
    for (x, y), zc in grid.items():
        lc = -180.0 + (x + 0.5) * 360.0 / n
        tc = -85.0 + (y + 0.5) * 170.0 / n
        for i, (k, name) in enumerate(nk):
            if (cx[i] - hw[i] <= lc < cx[i] + hw[i]
                    and cy[i] - hw[i] <= tc < cy[i] + hw[i]):
                st = exp.setdefault((k, name), [0, 0, 0, 0])
                st[0] += 1
                st[1] += zc
                st[2] = max(st[2], zc)
                st[3] += zc * (x * 64 + y)
    want = {k: (v[0], v[1], v[2], v[1] / v[0], v[3])
            for k, v in exp.items()}
    got = {(r.n_nationkey, r.n_name):
           (r.n_cells, r.sum_events, r.max_zc, r.mean_zc, r.checksum)
           for r in q_zonal_stats(spark, SF).collect()}
    assert got == want


def _py_cost_grid(sf_dir):
    import numpy as np
    from spark_shp import cells, fixtures
    from spark_shp.queries_mining import CD_LEVEL

    con = duckdb.connect()
    ix, iy = cells.quantize_sql(fixtures.EVENT_LON_SQL,
                                fixtures.EVENT_LAT_SQL, CD_LEVEL)
    rows = con.sql(f"SELECT {ix} AS tx, {iy} AS ty, COUNT(*) FROM "
                   f"read_parquet('{sf_dir}/events.parquet') "
                   "GROUP BY 1, 2").fetchall()
    return {(r[0], r[1]): 1 + r[2] % 9 for r in rows}


def test_cost_distance_vs_dijkstra_and_fixpoint(spark):
    """Exact Dijkstra must equal the round-bounded relaxation, and the
    fixture must reach fixpoint strictly inside CD_ROUNDS (so the bounded
    result IS the cost distance, not a truncation)."""
    import heapq
    from spark_shp.hashing import mix
    from spark_shp.queries_mining import (CD_ROUNDS,
                                          q_cost_distance_cells)

    grid = _py_cost_grid(SF)
    seeds = [c for c in grid
             if mix(c[0] * 31 + c[1] * 17 + 5) % 19 == 0]
    assert seeds, "fixture must select at least one seed"
    # Dijkstra (exact, unbounded)
    dist = {c: 0 for c in seeds}
    pq = [(0, c) for c in seeds]
    heapq.heapify(pq)
    hops = {c: 0 for c in seeds}
    while pq:
        d, c = heapq.heappop(pq)
        if d > dist.get(c, 1 << 60):
            continue
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                n = (c[0] + dx, c[1] + dy)
                if n not in grid:
                    continue
                nd = d + grid[n]
                if nd < dist.get(n, 1 << 60):
                    dist[n] = nd
                    hops[n] = hops[c] + 1
                    heapq.heappush(pq, (nd, n))
    # fixpoint bound: Bellman-Ford needs <= max shortest-path hop count
    assert max(hops.values()) < CD_ROUNDS
    got = {(r.tx, r.ty): r.dist
           for r in q_cost_distance_cells(spark, SF).collect()}
    assert got == dist


def test_cost_distance_fixpoint_at_gate_sfs():
    """Python Bellman-Ford replication at sf0.01 and sf0.1: the shortest-
    path hop diameter stays inside CD_ROUNDS, so the gate rows compare
    CONVERGED distances at every scale factor the driver runs."""
    import heapq
    from spark_shp.hashing import mix
    from spark_shp.queries_mining import CD_ROUNDS

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        grid = _py_cost_grid(sf_dir)
        seeds = [c for c in grid
                 if mix(c[0] * 31 + c[1] * 17 + 5) % 19 == 0]
        dist = {c: 0 for c in seeds}
        hops = {c: 0 for c in seeds}
        pq = [(0, c) for c in seeds]
        heapq.heapify(pq)
        while pq:
            d, c = heapq.heappop(pq)
            if d > dist.get(c, 1 << 60):
                continue
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    n = (c[0] + dx, c[1] + dy)
                    if n not in grid:
                        continue
                    nd = d + grid[n]
                    if nd < dist.get(n, 1 << 60):
                        dist[n] = nd
                        hops[n] = hops[c] + 1
                        heapq.heappush(pq, (nd, n))
        assert hops and max(hops.values()) < CD_ROUNDS, sf_dir


def test_linear_reference_bruteforce(spark):
    """Replicate argmin + projection parameter binning in python."""
    import numpy as np
    from spark_shp.hashing import u01
    from spark_shp.queries_mining import (MM_LEVEL, q_linear_reference,
                                          road_segments)

    segs = road_segments()
    con = duckdb.connect()
    eids = con.sql(f"SELECT event_id FROM "
                   f"read_parquet('{SF}/events.parquet')") \
        .df()["event_id"].to_numpy().astype(np.int64)
    lon = u01(eids) * 360.0 - 180.0
    lat = u01(eids * 2 + 1) * 170.0 - 85.0
    n = 1 << MM_LEVEL
    px = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(int)
    py = np.clip(np.floor((lat + 85.0) / 170.0 * n), 0, n - 1).astype(int)
    pts = {}
    for x, y in zip(px, py):
        pts[(x, y)] = pts.get((x, y), 0) + 1

    def seg_d2(x, y, s):
        _, ax, ay, dx, dy = s
        vx, vy = x - ax, y - ay
        dot = vx * dx + vy * dy
        if dot <= 0:
            return (vx * vx + vy * vy) * 2500
        if dot >= 2500:
            wx, wy = x - ax - dx, y - ay - dy
            return (wx * wx + wy * wy) * 2500
        return (vx * vx + vy * vy) * 2500 - dot * dot

    exp = {}
    for (x, y), c in pts.items():
        _, sid = min((seg_d2(x, y, s), s[0]) for s in segs)
        _, ax, ay, dx, dy = segs[sid]
        dot = (x - ax) * dx + (y - ay) * dy
        mp = min(9, max(0, dot // 250))
        st = exp.setdefault((sid, mp), [0, 0, 0])
        st[0] += 1
        st[1] += c
        st[2] += (x * 1024 + y) * c
    got = {(r.seg, r.milepost): [r.n_cells, r.n_points, r.checksum]
           for r in q_linear_reference(spark, SF).collect()}
    assert got == exp


def test_burst_episodes_bruteforce(spark):
    """Sequential rank + island scan over the hourly counts must match."""
    from spark_shp.queries_mining import q_burst_episodes

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_type, CAST(FLOOR(epoch_us(ts) / 3600000000) "
        f"AS BIGINT) AS hr, COUNT(*) FROM "
        f"read_parquet('{SF}/events.parquet') GROUP BY 1, 2").fetchall()
    by_type = {}
    for et, hr, cnt in rows:
        by_type.setdefault(et, {})[hr] = cnt
    exp = {}
    for et, hours in by_type.items():
        n_hours = len(hours)
        ranked = sorted(hours.items(), key=lambda kv: (-kv[1], kv[0]))
        burst = sorted(h for h, _ in ranked[:n_hours // 10])
        if not burst:
            continue
        episodes = []
        cur = [burst[0]]
        for h in burst[1:]:
            if h == cur[-1] + 1:
                cur.append(h)
            else:
                episodes.append(cur)
                cur = [h]
        episodes.append(cur)
        exp[et] = (len(episodes), len(burst),
                   max(len(e) for e in episodes),
                   max(hours[h] for h in burst),
                   sum(hours[h] for h in burst))
    assert exp, "fixture must produce peak hours"
    got = {r.event_type: (r.n_episodes, r.n_peak_hours, r.longest,
                          r.peak_cnt, r.peak_volume)
           for r in q_burst_episodes(spark, SF).collect()}
    assert got == exp


def test_hillshade_matches_numpy(spark):
    """Replay Horn gradients + the hillshade trig chain in numpy over a
    dense grid and compare the full shade histogram + position checksums."""
    import numpy as np
    from spark_shp import cells, fixtures
    from spark_shp.queries_mining import (HS_AZ, HS_COSZ, SLOPE_LEVEL,
                                          q_hillshade_raster)
    out = {r["shade"]: r for r in q_hillshade_raster(spark, SF).collect()}
    ix, iy = cells.quantize_sql(fixtures.EVENT_LON_SQL,
                                fixtures.EVENT_LAT_SQL, SLOPE_LEVEL)
    pdf = (spark.read.parquet(f"{SF}/events.parquet")
           .selectExpr(f"{ix} AS cx", f"{iy} AS cy")
           .groupBy("cx", "cy").count().toPandas())
    n = 1 << SLOPE_LEVEL
    grid = np.zeros((n + 2, n + 2), dtype=np.int64)   # 1-cell halo
    for cx, cy, c in zip(pdf["cx"], pdf["cy"], pdf["count"]):
        grid[int(cy) + 1, int(cx) + 1] = c
    agg: dict = {}
    for cy in range(n):
        for cx in range(n):
            if grid[cy + 1, cx + 1] == 0:
                continue
            z = grid[cy:cy + 3, cx:cx + 3]
            gx = int((z[0, 2] + 2 * z[1, 2] + z[2, 2])
                     - (z[0, 0] + 2 * z[1, 0] + z[2, 0]))
            gy = int((z[2, 0] + 2 * z[2, 1] + z[2, 2])
                     - (z[0, 0] + 2 * z[0, 1] + z[0, 2]))
            s = np.arctan(np.sqrt(float(gx * gx + gy * gy)) / 8.0)
            a = np.arctan2(float(gy), float(-gx))
            hs = 255.0 * max(0.0, HS_COSZ * np.cos(s)
                             + HS_COSZ * np.sin(s) * np.cos(HS_AZ - a))
            sh = int(np.floor(hs))
            st = agg.setdefault(sh, [0, 0])
            st[0] += 1
            st[1] += cx * 1024 + cy
    assert set(agg) == set(out)
    for sh, (nc, ps) in agg.items():
        assert (out[sh]["n_cells"], out[sh]["pos_sum"]) == (nc, ps)
    assert len(agg) > 3          # non-degenerate shade spread


def test_wkt_polygon_ingest_matches_numpy_shoelace(spark):
    """The declarative WKT decode re-derived independently: rings from the
    fixture geometry (never the WKT text), µdeg-quantized in numpy, signed
    shoelace summed per fence."""
    from spark_shp import fixtures
    from spark_shp.queries_mining import q_wkt_polygon_ingest

    out = {r["poly_id"]: r for r in
           q_wkt_polygon_ingest(spark, "/root/testdata/sf0.001").collect()}
    assert len(out) == 64
    for j in range(64):
        rings = fixtures.fence_rings(j)
        q = [np.floor(r * 1e6 + 0.5).astype(np.int64) for r in rings]
        s = 0
        n_edges = 0
        for r in q:
            x, y = r[:, 0], r[:, 1]
            s += int(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
            n_edges += len(r) - 1
        row = out[j]
        assert row["n_rings"] == len(rings)
        assert row["n_edges"] == n_edges
        assert row["area2_udeg"] == -s
        assert row["area2_udeg"] > 0          # outer − holes stays positive
        allq = np.vstack(q)
        assert (row["min_x"], row["max_x"]) == (allq[:, 0].min(),
                                                allq[:, 0].max())
        assert (row["min_y"], row["max_y"]) == (allq[:, 1].min(),
                                                allq[:, 1].max())


def test_tsp_greedy_matches_python_and_bounds_optimal(spark):
    """Sequential python greedy over independently derived cities, plus
    the brute-force OPTIMAL tour (8! / fixed-start = 5040 permutations):
    greedy total >= optimal, both positive, exact equality of the
    gated walk."""
    import itertools
    from spark_shp import hashing
    from spark_shp.queries_mining import TSP_K, TSP_LEVEL, q_tsp_greedy_tour
    rows = sorted((r["step"], r["city_rank"], r["cell_key"],
                   r["leg_d2"], r["total_d2"])
                  for r in q_tsp_greedy_tour(spark, SF).collect())
    assert len(rows) == TSP_K

    e = pd.read_parquet(f"{SF}/events.parquet")
    eid = e["event_id"].to_numpy(dtype=np.int64)
    lon = hashing.u01(eid) * 360.0 - 180.0
    lat = hashing.u01(eid * 2 + 1) * 170.0 - 85.0
    n = 1 << TSP_LEVEL
    ix = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1) \
        .astype(np.int64)
    iy = np.clip(np.floor((lat + 85.0) / 170.0 * n), 0, n - 1) \
        .astype(np.int64)
    cnt = {}
    for a, b in zip(ix, iy):
        cnt[(a, b)] = cnt.get((a, b), 0) + 1
    top = sorted(cnt.items(),
                 key=lambda kv: (-kv[1], kv[0][1] * 16 + kv[0][0]))[:TSP_K]
    cities = [(j, x, y) for j, ((x, y), _) in enumerate(top)]
    # greedy walk
    visited = {0}
    cur = cities[0]
    expect = [(0, 0, cities[0][2] * 16 + cities[0][1], 0, 0)]
    total = 0
    for step in range(1, TSP_K):
        best = None
        for j, x, y in cities:
            if j in visited:
                continue
            d2 = (x - cur[1]) ** 2 + (y - cur[2]) ** 2
            if best is None or d2 * 8 + j < best[0]:
                best = (d2 * 8 + j, j, x, y, d2)
        visited.add(best[1])
        cur = (best[1], best[2], best[3])
        total += best[4]
        expect.append((step, best[1], best[3] * 16 + best[2],
                       best[4], total))
    assert rows == sorted(expect)
    # optimality bound: greedy path >= brute-force best open path
    coords = {j: (x, y) for j, x, y in cities}
    opt = min(
        sum((coords[p[i]][0] - coords[p[i + 1]][0]) ** 2
            + (coords[p[i]][1] - coords[p[i + 1]][1]) ** 2
            for i in range(len(p) - 1))
        for p in itertools.permutations(range(1, TSP_K))
        for p in [(0,) + p])
    assert 0 < opt <= total


def test_canny_finds_planted_step_edge(spark):
    """Semantic check the hash-noise gate can't give: a clean vertical
    step edge must survive as a single 1-px column of strong edges (NMS
    thins, hysteresis keeps), and an off-edge weak-only blob connected
    to nothing must be dropped."""
    import numpy as np
    import pandas as pd
    from spark_shp import codecs, multimodal

    w, h = 24, 16
    img = np.full((h, w, 3), 30, dtype=np.uint8)
    img[:, 12:, :] = 220                      # step at x = 11/12 boundary
    blob = codecs.encode(img, "raw")
    pdf = pd.DataFrame({"image_id": ["img000000000001"],
                        "bytes": [blob], "w": [w], "h": [h],
                        "fmt": ["raw"]})
    out = multimodal.canny_stats(
        spark.createDataFrame(pdf), t_lo2=10_000, t_hi2=100_000).collect()
    r = out[0]
    # the gradient band is 2 px wide; NMS thins it to ONE column of
    # interior height (ties broken deterministically)
    assert r["n_final"] == h - 2
    assert r["n_strong"] == r["n_final"]      # a clean step is all-strong
    assert r["n_weak"] == 0


def test_canny_hysteresis_keeps_connected_weak_only(spark):
    """A weak segment touching a strong segment survives; an identical
    weak segment isolated elsewhere is dropped — the hysteresis
    contract, pinned via a two-ramp synthetic image."""
    import numpy as np
    import pandas as pd
    from spark_shp import codecs, multimodal

    w, h = 40, 12
    img = np.full((h, w, 3), 100, dtype=np.uint8)
    # strong vertical edge rows 1..5 at x=10 (large step), weak
    # continuation rows 6..9 (small step), and an isolated weak edge at
    # x=30 (same small step, nothing strong nearby)
    img[:7, 10:, :] = 250
    img[7:, 10:, :] = 140
    img[:, 30:, :] = np.maximum(img[:, 30:, :], 0) + 0  # keep shape
    blob = codecs.encode(img, "raw")
    pdf = pd.DataFrame({"image_id": ["img000000000002"],
                        "bytes": [blob], "w": [w], "h": [h],
                        "fmt": ["raw"]})
    out = multimodal.canny_stats(
        spark.createDataFrame(pdf), t_lo2=5_000, t_hi2=200_000).collect()
    r = out[0]
    assert r["n_strong"] > 0 and r["n_weak"] > 0
    # every weak pixel on the x=10 edge line is connected to the strong
    # run above it, so final >= strong and < strong + weak only if some
    # weak pixels were elsewhere; here all weak pixels touch the line
    assert r["n_final"] >= r["n_strong"]
