"""Independent (non-oracle) checks for the queries_analytics batch:
brute-force / reference-implementation cross-checks so a same-bug-both-
engines failure mode in the shared SQL can't hide behind the differential.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from spark_shp import cells, fixtures
from spark_shp.queries_analytics import (
    CHUNK_SIZE, CHUNK_STRIDE, GAPFILL_USER_MOD, HOUR_US, MORPH_LEVEL,
    _geohash6_sql, q_cell_morphology, q_chunk_documents, q_gapfill_locf,
    q_pareto_frontier)

SF = "/root/testdata/sf0.001"

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash6_ref(lon: float, lat: float) -> str:
    """Textbook bisection geohash — a genuinely different algorithm from
    the Morton-spread SQL (no interleave tricks)."""
    lo_rng, la_rng = [-180.0, 180.0], [-90.0, 90.0]
    bits, out, ch, even = 0, [], 0, True
    while len(out) < 6:
        rng, v = (lo_rng, lon) if even else (la_rng, lat)
        mid = (rng[0] + rng[1]) / 2
        ch = ch * 2 + (1 if v >= mid else 0)
        rng[1 if v < mid else 0] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_B32[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_sql_matches_bisection_reference():
    rng = np.random.default_rng(7)
    lons = np.concatenate([rng.uniform(-180, 180, 200),
                           [-5.603, -0.1257, 139.7, 0.0, -179.999, 179.999]])
    lats = np.concatenate([rng.uniform(-85, 85, 200),
                           [42.605, 51.5085, 35.68, 0.0, -84.9, 84.9]])
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)",
                    list(zip(lons.tolist(), lats.tolist())))
    got = [r[0] for r in con.execute(
        f"SELECT {_geohash6_sql('lon', 'lat')} FROM pts").fetchall()]
    want = [_geohash6_ref(lo, la) for lo, la in zip(lons, lats)]
    assert got == want
    # pin the published vectors explicitly
    assert want[-6:-3] == ["ezs42s", "gcpvj0", "xn76fz"]


def test_pareto_frontier_vs_bruteforce(spark):
    out = {(r.p_partkey, r.p_retailprice, r.p_size)
           for r in q_pareto_frontier(spark, SF).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT p_partkey, p_retailprice, p_size FROM "
        f"read_parquet('{SF}/part.parquet')").fetchall()
    key = np.array([(p, s) for _, p, s in rows])
    price, size = key[:, 0], key[:, 1]
    dominated = np.zeros(len(rows), dtype=bool)
    for i in range(len(rows)):
        dominated[i] = np.any((price <= price[i]) & (size >= size[i]) &
                              ((price < price[i]) | (size > size[i])))
    want = {rows[i] for i in range(len(rows)) if not dominated[i]}
    assert out == want and len(out) > 0
    # every survivor must be mutually non-dominated
    fp = sorted(out, key=lambda r: (r[1], -r[2]))
    for a, b in zip(fp, fp[1:]):
        assert a[1] < b[1] or (a[1] == b[1] and a[2] == b[2])


def test_cell_morphology_vs_numpy_erosion(spark):
    out = {r.ix: (r.n_occ, r.n_interior, r.checksum)
           for r in q_cell_morphology(spark, SF).collect()}
    con = duckdb.connect()
    ix_sql, iy_sql = cells.quantize_sql(fixtures.EVENT_LON_SQL,
                                        fixtures.EVENT_LAT_SQL, MORPH_LEVEL)
    pts = con.execute(
        f"SELECT DISTINCT {ix_sql} AS ix, {iy_sql} AS iy FROM "
        f"read_parquet('{SF}/events.parquet')").fetchnumpy()
    n = 1 << MORPH_LEVEL
    grid = np.zeros((n + 2, n + 2), dtype=bool)  # 1-cell pad = lattice edge
    grid[pts["ix"] + 1, pts["iy"] + 1] = True
    nb = sum(np.roll(np.roll(grid, dx, 0), dy, 1)
             for dx in (-1, 0, 1) for dy in (-1, 0, 1)
             if (dx, dy) != (0, 0))
    interior = grid & (nb == 8)
    want = {}
    for ix in range(n):
        occ_iy = np.nonzero(grid[ix + 1, 1:n + 1])[0]
        if occ_iy.size == 0:
            continue
        ins = interior[ix + 1, occ_iy + 1]
        want[ix] = (occ_iy.size, int(ins.sum()),
                    int((occ_iy * (1 + ins.astype(np.int64))).sum()))
    assert out == want


def test_chunk_documents_covers_and_reconstructs(spark):
    rows = q_chunk_documents(spark, SF).collect()
    con = duckdb.connect()
    texts = dict(con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')")
        .fetchall())
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, chs in by_doc.items():
        toks = texts[doc_id].split(" ")
        chs.sort(key=lambda r: r.chunk_idx)
        # chunk starts step STRIDE, sizes min(CHUNK_SIZE, remaining)
        for r in chs:
            s = r.chunk_idx * CHUNK_STRIDE
            want = toks[s:s + CHUNK_SIZE]
            assert r.chunk_text == " ".join(want)
            assert r.n_toks == len(want)
        # coverage: stride < size ⇒ every token appears in some chunk
        covered = set()
        for r in chs:
            s = r.chunk_idx * CHUNK_STRIDE
            covered.update(range(s, s + r.n_toks))
        assert covered == set(range(len(toks)))


def test_gapfill_locf_spine_and_carry(spark):
    rows = q_gapfill_locf(spark, SF).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, epoch_us(ts) AS us, value, event_id FROM "
        f"read_parquet('{SF}/events.parquet') "
        f"WHERE user_id % {GAPFILL_USER_MOD} = 0 "
        f"ORDER BY user_id, us, event_id").fetchall()
    assert rows and ev
    per_user = {}
    for u, us, v, eid in ev:
        per_user.setdefault(u, []).append((us // HOUR_US, us, eid, v))
    got = {}
    for r in rows:
        got.setdefault(r.user_id, {})[r.hr] = (r.val, r.observed)
    assert set(got) == set(per_user)
    for u, evs in per_user.items():
        hrs = sorted(got[u])
        assert hrs == list(range(evs[0][0], evs[-1][0] + 1))  # dense spine
        for hr in hrs:
            prior = [t for t in evs if t[0] <= hr]
            want_val = max(prior)[3]  # latest (hr, us, eid) at/before hr
            val, observed = got[u][hr]
            assert val == want_val
            assert observed == (1 if any(t[0] == hr for t in evs) else 0)


def test_triangle_census_on_hand_built_graphs(spark):
    from spark_shp.queries_analytics import triangle_census

    def census(edges):
        df = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges],
            "doc_a long, doc_b long")
        return triangle_census(df).collect()[0]

    # path graph 1-2-3-4: 0 triangles, 2 wedges
    r = census([(1, 2), (2, 3), (3, 4)])
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 3, 2, 0)
    assert r.clustering_coef == 0.0
    # K4: 4 triangles, 12 wedges, coef 1.0
    r = census([(a, b) for a in range(1, 5) for b in range(a + 1, 5)])
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert r.clustering_coef == 1.0
    # bowtie (two triangles sharing node 3)
    r = census([(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (5, 6, 2)
    # star K1,5 (hub): wedges C(5,2)=10, no triangles — the orientation
    # must not blow up or double count around the hub
    r = census([(9, k) for k in range(1, 6)])
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (6, 5, 10, 0)


def test_octant_sql_matches_atan2():
    import math

    from spark_shp.queries_analytics import _octant_sql
    rng = np.random.default_rng(3)
    dx = rng.normal(size=300)
    dy = rng.normal(size=300)
    con = duckdb.connect()
    con.execute("CREATE TABLE v(dx DOUBLE, dy DOUBLE)")
    con.executemany("INSERT INTO v VALUES (?, ?)",
                    list(zip(dx.tolist(), dy.tolist())))
    got = [r[0] for r in con.execute(
        f"SELECT {_octant_sql('dx', 'dy')} FROM v").fetchall()]
    for o, x, y in zip(got, dx, dy):
        ang = math.atan2(y, x) % (2 * math.pi)
        want = int(ang // (math.pi / 4)) % 8
        assert o == want, (x, y, o, want)


def test_scd2_intervals_hand_case(spark):
    from spark_shp.queries_analytics import q_scd2_intervals
    rows = q_scd2_intervals(spark, SF).collect()
    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey FROM "
        f"read_parquet('{SF}/orders.parquet') ORDER BY 1, 3, 4").fetchall()
    per = {}
    for c, p, d, k in orders:
        per.setdefault(c, []).append((p, d))
    # rebuild islands per customer sequentially
    want = []
    for c, seq in per.items():
        runs = []
        for p, d in seq:
            if not runs or runs[-1][0] != p:
                runs.append([p, d, 0])
            runs[-1][2] += 1
        for i, (p, d, n) in enumerate(runs):
            vt = runs[i + 1][1] if i + 1 < len(runs) else None
            want.append((c, p, d, vt, n))
    got = sorted((r.o_custkey, r.priority, r.valid_from, r.valid_to,
                  r.n_orders) for r in rows)
    assert got == sorted(want)
    # interval chaining: valid_to of one version == valid_from of the next
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for c, rs in by_cust.items():
        rs.sort(key=lambda r: r.valid_from)
        assert rs[-1].valid_to is None
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from


def test_decayed_scores_weights_are_halving_powers(spark):
    from spark_shp.queries_analytics import (DECAY_MAX_BUCKET, DECAY_SCALE,
                                             q_decayed_cell_scores)
    rows = q_decayed_cell_scores(spark, SF).collect()
    assert rows
    for r in rows:
        # a score is a sum of n weights, each DECAY_SCALE >> b with
        # b <= DECAY_MAX_BUCKET, so bounds are checkable per row
        assert r.n * (DECAY_SCALE >> DECAY_MAX_BUCKET) <= r.score
        assert r.score <= r.n * DECAY_SCALE


def test_markov_transitions_counts_and_stochastic(spark):
    from spark_shp.queries_analytics import q_markov_transitions
    rows = q_markov_transitions(spark, SF).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, event_type FROM read_parquet('{SF}/events.parquet')"
        f" ORDER BY user_id, ts, event_id").fetchall()
    want = {}
    prev_by_user = {}
    for u, t in ev:
        p = prev_by_user.get(u)
        if p is not None:
            want[(p, t)] = want.get((p, t), 0) + 1
        prev_by_user[u] = t
    got = {(r.prev_type, r.next_type): r.n for r in rows}
    assert got == want
    # row-stochastic: per prev_type the probabilities sum to ~1
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r.prev_type, []).append(r.p)
    for ps in by_prev.values():
        assert abs(sum(ps) - 1.0) < 1e-12


def test_rfm_segments_quintiles_and_money(spark):
    from spark_shp.queries_analytics import q_rfm_segments
    rows = q_rfm_segments(spark, SF).collect()
    n = len(rows)
    assert n > 0
    for col in ("r_score", "f_score", "m_score"):
        counts = {}
        for r in rows:
            counts[getattr(r, col)] = counts.get(getattr(r, col), 0) + 1
        assert set(counts) == {1, 2, 3, 4, 5}
        assert max(counts.values()) - min(counts.values()) <= 1  # ntile law
    con = duckdb.connect()
    money = dict(con.execute(
        f"SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,6))) FROM "
        f"read_parquet('{SF}/orders.parquet') GROUP BY 1").fetchall())
    for r in rows[:50]:
        assert abs(r.monetary - float(money[r.o_custkey])) < 1e-6
        assert r.segment == f"{r.r_score}{r.f_score}{r.m_score}"
        assert r.recency_days >= 0


def test_benford_shares(spark):
    import math

    from spark_shp.queries_analytics import q_benford_first_digit
    rows = q_benford_first_digit(spark, SF).collect()
    assert all(r.digit in "123456789" for r in rows)
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert abs(r.benford_share - math.log10(1 + 1 / int(r.digit))) < 1e-12
    con = duckdb.connect()
    total = con.execute(f"SELECT COUNT(*) FROM "
                        f"read_parquet('{SF}/orders.parquet')").fetchone()[0]
    assert sum(r.n for r in rows) == total


def test_seasonality_buckets_match_python_calendar(spark):
    import datetime

    from spark_shp.queries_analytics import q_seasonality_profile
    rows = q_seasonality_profile(spark, SF).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT ts, user_id FROM read_parquet('{SF}/events.parquet')")\
        .fetchall()
    want_n, want_u = {}, {}
    for ts, u in ev:
        # dow convention: 0=Sunday (epoch day 0 was a Thursday=4)
        dow = (ts.toordinal() - datetime.date(1970, 1, 1).toordinal() + 4) % 7
        assert dow == (ts.weekday() + 1) % 7  # cross-check vs calendar
        key = (dow, ts.hour)
        want_n[key] = want_n.get(key, 0) + 1
        want_u.setdefault(key, set()).add(u)
    got = {(r.dow, r.hod): (r.n_events, r.n_users) for r in rows}
    assert got == {k: (want_n[k], len(want_u[k])) for k in want_n}


def test_inventory_balance_bruteforce(spark):
    from spark_shp.queries_analytics import q_inventory_balance
    rows = {r.l_partkey: r for r in q_inventory_balance(spark, SF).collect()}
    con = duckdb.connect()
    li = con.execute(
        f"SELECT l_partkey, l_returnflag, l_quantity, l_shipdate, "
        f"l_orderkey, l_linenumber FROM "
        f"read_parquet('{SF}/lineitem.parquet') "
        f"ORDER BY l_partkey, l_shipdate, l_orderkey, l_linenumber")\
        .fetchall()
    per = {}
    for pk, rf, q, *_ in li:
        per.setdefault(pk, []).append(int(q) if rf == "R" else -int(q))
    assert set(rows) == set(per)
    for pk, dqs in per.items():
        bal, mn, mx = 0, None, None
        for dq in dqs:
            bal += dq
            mn = bal if mn is None else min(mn, bal)
            mx = bal if mx is None else max(mx, bal)
        r = rows[pk]
        assert (r.n_moves, r.final_balance, r.min_balance, r.max_balance) \
            == (len(dqs), bal, mn, mx)


def test_plan_shapes_of_analytics_ops(spark):
    """Physical-plan pins for the scale-critical claims in the docstrings:
    the chunker is map-only (zero exchanges, zero Python), the inventory
    balance does exactly ONE hash shuffle (window + agg share the part
    key), and the seasonality matrix is one partial+final agg (one
    exchange), all inside whole-stage codegen."""
    from spark_shp.queries_analytics import (q_chunk_documents,
                                             q_inventory_balance,
                                             q_seasonality_profile)

    def shape(df):
        plan = df._jdf.queryExecution().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        physical = df._jdf.queryExecution().executedPlan().toString()
        return physical.count("Exchange hashpartitioning")

    assert shape(q_chunk_documents(spark, SF)) == 0
    assert shape(q_inventory_balance(spark, SF)) == 1
    assert shape(q_seasonality_profile(spark, SF)) <= 2  # partial+final agg


def test_hex_bin_sql_matches_python_hexround():
    from spark_shp.queries_analytics import HEX_SIZE_DEG, _hex_stages

    def hex_ref(lon, lat):
        s3 = 3.0 ** 0.5 / 3.0
        q = (2.0 / 3.0 * lon) / HEX_SIZE_DEG
        r = (-1.0 / 3.0 * lon + s3 * lat) / HEX_SIZE_DEG
        x, z = q, r
        y = -x - z
        rx, ry, rz = (np.floor(v + 0.5) for v in (x, y, z))
        dx, dy, dz = abs(rx - x), abs(ry - y), abs(rz - z)
        if dx > dy and dx > dz:
            rx = -ry - rz
        elif dy > dz:
            pass  # ry corrected, but ry is not emitted
        else:
            rz = -rx - ry
        return int(rx), int(rz)

    rng = np.random.default_rng(11)
    lons = rng.uniform(-180, 180, 400)
    lats = rng.uniform(-85, 85, 400)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)",
                    list(zip(lons.tolist(), lats.tolist())))
    st = _hex_stages("lon", "lat")
    got = con.execute(f"""
        WITH s1 AS (SELECT lon, lat, {', '.join(st[0])} FROM pts),
        s2 AS (SELECT *, {', '.join(c for c in st[1] if c not in ('cx','cz'))}
               FROM s1),
        s3 AS (SELECT *, CAST(FLOOR(cy + 0.5) AS BIGINT) AS ry FROM s2)
        SELECT {', '.join(st[3])} FROM s3""").fetchall()
    want = [hex_ref(lo, la) for lo, la in zip(lons, lats)]
    assert [tuple(g) for g in got] == want
    # cube-constraint: corrected coords satisfy hq + hr + hy == 0 by
    # construction — verify hq/hr land within one hex of the raw rounding
    for (hq, hr), lo, la in zip(got, lons, lats):
        q = (2.0 / 3.0 * lo) / HEX_SIZE_DEG
        r = (-1.0 / 3.0 * lo + (3.0 ** 0.5 / 3.0) * la) / HEX_SIZE_DEG
        assert abs(hq - q) <= 1.0 and abs(hr - r) <= 1.0


def test_pq_codes_vs_numpy_argmin(spark):
    from spark_shp.queries_analytics import (PQ_BLOCK_DIM, PQ_BLOCKS,
                                             _pq_codebook, q_pq_codes)
    rows = {r.vec_id: (r.c0, r.c1, r.c2, r.c3)
            for r in q_pq_codes(spark, SF).collect()}
    con = duckdb.connect()
    embs = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF}/embeddings.parquet')").fetchall()
    cb = np.array(_pq_codebook())  # (blocks, k, dim)
    for vec_id, emb in embs:
        v = np.asarray(emb, dtype=np.float64)
        want = []
        for b in range(PQ_BLOCKS):
            blk = v[b * PQ_BLOCK_DIM:(b + 1) * PQ_BLOCK_DIM]
            d = ((cb[b] - blk) ** 2).sum(axis=1)
            want.append(int(np.argmin(d)))  # ties → lowest index, same rule
        assert rows[vec_id] == tuple(want)
    # codes must actually use the space (not all constant)
    assert len(set(rows.values())) > 1


def test_pagerank_fixedpoint_vs_python(spark):
    from spark_shp.queries_analytics import (PR_BASE, PR_ITERS, PR_SCALE,
                                             q_pagerank_fixedpoint)
    from spark_shp.queries_text import q_minhash_lsh_pairs
    got = {r.doc_id: r.rank
           for r in q_pagerank_fixedpoint(spark, SF).collect()}
    pairs = [(r.doc_a, r.doc_b)
             for r in q_minhash_lsh_pairs(spark, SF)
             .where("n_bands >= 4").collect()]
    adj, deg = {}, {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    rank = {v: PR_SCALE for v in adj}
    for _ in range(PR_ITERS):
        nxt = {}
        for v, ns in adj.items():
            s = sum(int(np.floor(rank[u] / float(deg[u]))) for u in ns)
            nxt[v] = PR_BASE + int(np.floor(s * 85 / 100.0))
        rank = nxt
    assert got == rank and len(got) > 0


def test_user_entropy_matches_scipy_style_formula(spark):
    import math

    from spark_shp.queries_analytics import EVENT_TYPES, q_user_entropy
    rows = q_user_entropy(spark, SF).collect()
    assert rows
    for r in rows:
        counts = [getattr(r, f"n_{t}") for t in EVENT_TYPES]
        assert sum(counts) == r.n_events
        want = -sum((c / r.n_events) * math.log(c / r.n_events)
                    for c in counts if c > 0)
        assert abs(r.entropy - want) < 1e-6
        assert 0.0 <= r.entropy <= math.log(len(EVENT_TYPES)) + 1e-9


def test_hilbert_curve_properties_and_sql_parity():
    from spark_shp.queries_analytics import (HILBERT_LEVEL,
                                             _hilbert_sql_stages,
                                             hilbert_d_np)
    # full-lattice bijectivity + unit-adjacency at a smaller order
    n = 64
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = hilbert_d_np(xs.ravel(), ys.ravel(), 6)
    assert len(set(d.tolist())) == n * n
    order = np.argsort(d)
    px, py = xs.ravel()[order], ys.ravel()[order]
    assert np.all(np.abs(np.diff(px)) + np.abs(np.diff(py)) == 1)
    # SQL staged rewrite == numpy kernel on random points at full level
    rng = np.random.default_rng(5)
    hx = rng.integers(0, 1 << HILBERT_LEVEL, 500)
    hy = rng.integers(0, 1 << HILBERT_LEVEL, 500)
    want = hilbert_d_np(hx, hy, HILBERT_LEVEL)
    con = duckdb.connect()
    con.execute("CREATE TABLE p(hx BIGINT, hy BIGINT, hd BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?, 0)",
                    list(zip(hx.tolist(), hy.tolist())))
    sql, prev = [], "p"
    for i, (a, b) in enumerate(_hilbert_sql_stages(HILBERT_LEVEL)):
        sql.append(f"a{i} AS (SELECT {', '.join(a)} FROM {prev})")
        sql.append(f"b{i} AS (SELECT {', '.join(b)} FROM a{i})")
        prev = f"b{i}"
    got = [r[0] for r in con.execute(
        f"WITH {', '.join(sql)} SELECT hd FROM {prev}").fetchall()]
    assert got == want.tolist()


def test_hilbert_branchless_spark_parity_full_lattice(spark):
    """The shipped Spark formulation (branchless parallel-prefix bitwise
    stages — the one that stays in whole-stage codegen) must reproduce
    the numpy recurrence kernel over the ENTIRE level-8 lattice, and at
    a second level so the width-shift handling can't be a coincidence."""
    from spark_shp.queries_analytics import (HILBERT_LEVEL,
                                             hilbert_branchless_stages,
                                             hilbert_d_np)
    for level in (HILBERT_LEVEL, 6):
        n = 1 << level
        d = spark.range(0, n * n).selectExpr(
            "id", f"CAST(id % {n} AS BIGINT) AS hx",
            f"CAST(id div {n} AS BIGINT) AS hy")
        for stage in hilbert_branchless_stages(level):
            d = d.selectExpr("id", *stage)
        got = np.array([r.hd for r in d.orderBy("id").collect()])
        ids = np.arange(n * n)
        want = hilbert_d_np(ids % n, ids // n, level)
        assert np.array_equal(got, want), level


def test_hilbert_locality_beats_morton():
    """The reason to offer Hilbert at all: consecutive curve positions of
    spatially-close points jump less. Measured on unit-step walks over the
    grid (the access pattern of a range scan): mean |Δd| must be smaller
    for Hilbert than for Morton."""
    from spark_shp import cells
    from spark_shp.queries_analytics import hilbert_d_np
    rng = np.random.default_rng(9)
    n = 1 << 8
    # random walk of 20k unit steps
    steps = rng.integers(0, 4, 20000)
    dx = np.where(steps == 0, 1, np.where(steps == 1, -1, 0))
    dy = np.where(steps == 2, 1, np.where(steps == 3, -1, 0))
    x = np.clip(np.cumsum(dx) + n // 2, 0, n - 1)
    y = np.clip(np.cumsum(dy) + n // 2, 0, n - 1)
    hd = hilbert_d_np(x, y, 8)
    md = cells.morton(x, y, 8)
    jump_h = np.abs(np.diff(hd)).mean()
    jump_m = np.abs(np.diff(md)).mean()
    assert jump_h < jump_m, (jump_h, jump_m)


SF001 = "/root/testdata/sf0.001"


def test_aspect_bucketing_batch_laws(spark):
    """Bucket edges on hand-picked dims + the packing laws: every bucket's
    batch count follows from its size, remainders are < batch size, and
    the global image count is conserved."""
    from spark_shp.queries_analytics import (AB_BATCH, _AB_BUCKET,
                                             q_aspect_bucketing)
    # hand-picked (w, h) -> bucket: square=2, 2:1 wide=4, 1:2 tall=0,
    # 4:3=3 (r=4/3 is the [4/3, 2) bucket), 3:4=1 (r=3/4 is [3/4, 1)),
    # 5:4=2 (1.25 < 4/3), 4:5=1, 3:2=3, 2:3=0 (2/3 < 3/4)
    hand = [(16, 16, 2), (32, 16, 4), (16, 32, 0), (64, 48, 3),
            (48, 64, 1), (80, 64, 2), (64, 80, 1), (48, 32, 3),
            (32, 48, 0)]
    rows = spark.createDataFrame(
        [(w, h) for w, h, _ in hand], "w INT, h INT").selectExpr(
        "w", "h", f"{_AB_BUCKET} AS bucket").collect()
    for (w, h, want), r in zip(hand, rows):
        assert r.bucket == want, (w, h, r.bucket, want)
    out = q_aspect_bucketing(spark, SF001).collect()
    from spark_shp.queries_spatial import N_IMAGES_ORACLE
    assert sum(r.n_images for r in out) == N_IMAGES_ORACLE
    for r in out:
        assert 0 <= r.remainder < AB_BATCH
        assert r.n_full_batches == r.n_images // AB_BATCH
        assert r.n_batches == r.n_full_batches + (1 if r.remainder else 0)


def test_staypoint_detect_matches_sequential_bruteforce(spark):
    """Replay the segmentation sequentially in Python over the same
    events and compare every per-user statistic."""
    from spark_shp import cells, fixtures
    from spark_shp.queries_analytics import (SP_LEVEL, SP_MIN_DWELL_US,
                                             SP_RING, q_staypoint_detect)
    ix, iy = cells.quantize_sql(fixtures.EVENT_LON_SQL,
                                fixtures.EVENT_LAT_SQL, SP_LEVEL)
    e = spark.read.parquet(f"{SF001}/events.parquet").selectExpr(
        "user_id", "event_id",
        "unix_micros(CAST(ts AS TIMESTAMP_LTZ)) AS us",
        f"{ix} AS ix", f"{iy} AS iy").collect()
    byu = {}
    for r in e:
        byu.setdefault(r.user_id, []).append(r)
    want = {}
    for u, rows in byu.items():
        rows.sort(key=lambda r: (r.us, r.event_id))
        segs, cur = [], [rows[0]]
        for p, q in zip(rows, rows[1:]):
            if max(abs(q.ix - p.ix), abs(q.iy - p.iy)) <= SP_RING:
                cur.append(q)
            else:
                segs.append(cur)
                cur = [q]
        segs.append(cur)
        stays = [s for s in segs
                 if len(s) >= 2 and s[-1].us - s[0].us >= SP_MIN_DWELL_US]
        if stays:
            want[u] = (len(stays),
                       sum(s[-1].us - s[0].us for s in stays),
                       sum(len(s) for s in stays),
                       sum(s[0].us % 1000003 for s in stays))
    got = {r.user_id: (r.n_stays, r.sum_dwell_us, r.sum_pts, r.checksum)
           for r in q_staypoint_detect(spark, SF001).collect()}
    assert got == want and want


def test_mixture_weights_laws(spark):
    """Weights sum to ~1, planned docs never exceed the budget, and the
    plan is monotone in domain size (more chars -> never fewer docs)."""
    from spark_shp.queries_analytics import MIX_BUDGET, q_mixture_weights
    rows = q_mixture_weights(spark, SF001).collect()
    assert rows
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    assert sum(r.planned_docs for r in rows) <= MIX_BUDGET
    by_chars = sorted(rows, key=lambda r: r.tot_chars)
    for a, b in zip(by_chars, by_chars[1:]):
        assert a.planned_docs <= b.planned_docs
        assert a.sqrt_chars == int(a.tot_chars ** 0.5)


def test_merkle_diff_localizes_mutations(spark):
    import hashlib
    from spark_shp.hashing import mix
    from spark_shp.queries_analytics import (MD_LEAVES, MD_LEVELS, MD_MUT,
                                             q_merkle_diff)
    out = {r["level"]: r for r in q_merkle_diff(spark, SF).collect()}
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").toPandas())

    def dig(text):
        return int(hashlib.md5(text.encode()).hexdigest()[:15], 16)

    leaves: dict = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        did = int(did)
        b = int(mix(did)) % MD_LEAVES
        key = int(mix(did * 2 + 1))
        tb = ("X" + text) if did % MD_MUT == 0 else text
        da, db, n = leaves.get(b, (0, 0, 0))
        leaves[b] = (da ^ dig(text) ^ key, db ^ dig(tb) ^ key, n + 1)
    n_mut = int((docs["doc_id"] % MD_MUT == 0).sum())
    assert n_mut > 0                      # planted mutations exist
    for lvl, shift in enumerate(MD_LEVELS):
        nodes: dict = {}
        for b, (da, db, n) in leaves.items():
            node = b >> shift
            a0, b0, n0 = nodes.get(node, (0, 0, 0))
            nodes[node] = (a0 ^ da, b0 ^ db, n0 + n)
        n_diff = sum(1 for da, db, _ in nodes.values() if da != db)
        repair = sum(n for da, db, n in nodes.values() if da != db)
        row = out[lvl]
        assert (row["n_nodes"], row["n_diff"], row["repair_docs"]) \
            == (len(nodes), n_diff, repair)
    # root must flag, and repair volume must grow with coarseness
    assert out[len(MD_LEVELS) - 1]["n_diff"] == 1
    rep = [out[l]["repair_docs"] for l in range(len(MD_LEVELS))]
    assert all(a <= b for a, b in zip(rep, rep[1:]))
    assert rep[0] >= n_mut                # leaves cover every mutation


def test_merge_upsert_matches_pandas(spark):
    from spark_shp.queries_analytics import MU_PRICE_BUMP, q_merge_upsert
    out = {r["action"]: r for r in q_merge_upsert(spark, SF).collect()}
    o = (spark.read.parquet(f"{SF}/orders.parquet")
         .selectExpr("o_orderkey AS k",
                     "CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS pq")
         .toPandas())
    base = o[o["k"] % 10 < 8]
    delta = o[o["k"] % 10 >= 5]
    bk, dk = set(base["k"]), set(delta["k"])
    upd, ins, keep = bk & dk, dk - bk, bk - dk
    assert out["update"]["n_rows"] == len(upd)
    assert out["insert"]["n_rows"] == len(ins)
    assert out["keep"]["n_rows"] == len(keep)
    dmap = dict(zip(delta["k"], delta["pq"]))
    bmap = dict(zip(base["k"], base["pq"]))
    assert out["update"]["sum_price_q"] == \
        sum(dmap[k] + MU_PRICE_BUMP for k in upd)
    assert out["insert"]["sum_price_q"] == \
        sum(dmap[k] + MU_PRICE_BUMP for k in ins)
    assert out["keep"]["sum_price_q"] == sum(bmap[k] for k in keep)
    assert out["update"]["n_restated"] == len(upd)
    assert out["keep"]["n_restated"] == 0
    assert out["update"]["key_checksum"] == sum(upd)


def test_compaction_plan_matches_pandas_replay(spark):
    from spark_shp.queries_analytics import (CP_BATCH, CP_OVERHEAD,
                                             CP_TARGET, q_compaction_plan)
    out = q_compaction_plan(spark, SF).toPandas()
    d = (spark.read.parquet(f"{SF}/documents.parquet")
         .selectExpr("source", f"doc_id DIV {CP_BATCH} AS file_id",
                     "n_chars").toPandas())
    files = (d.groupby(["source", "file_id"])["n_chars"].sum()
             .reset_index())
    files["bytes"] = files["n_chars"] + CP_OVERHEAD
    for src, g in files.groupby("source"):
        g = g.sort_values("file_id").reset_index(drop=True)
        cum = g["bytes"].cumsum().shift(fill_value=0)
        g["out_file"] = cum // CP_TARGET
        exp = (g.groupby("out_file")
               .agg(n=("file_id", "size"), b=("bytes", "sum"),
                    lo=("file_id", "min"), hi=("file_id", "max")))
        got = out[out["source"] == src].set_index("out_file")
        assert len(got) == len(exp)
        for of, r in exp.iterrows():
            gr = got.loc[of]
            assert (gr["n_input_files"], gr["bytes"], gr["first_file"],
                    gr["last_file"]) == (r["n"], r["b"], r["lo"], r["hi"])
        # output ranges are contiguous, non-interleaved
        hs = got.sort_index()
        assert all(a < b for a, b in zip(hs["last_file"],
                                         hs["first_file"].iloc[1:]))


def test_zone_map_pruning_laws(spark):
    from spark_shp.queries_analytics import ZM_FILE, q_zone_map_pruning
    out = q_zone_map_pruning(spark, SF).toPandas()
    assert len(out) >= 5                       # several query years
    assert out["n_files"].nunique() == 1
    nf = out["n_files"].iloc[0]
    for _, r in out.iterrows():
        # clustering strictly beats ingestion order on every year
        assert r["scan_sorted"] < r["scan_ingest"]
        assert r["scan_ingest"] <= nf
        # a year's rows need at least ceil(rows/ZM_FILE) files
        assert r["scan_sorted"] >= -(-r["n_rows"] // ZM_FILE)
    # the headline claim: clustered layout prunes most of the table
    assert out["scan_sorted"].sum() < 0.5 * out["scan_ingest"].sum()


def test_ivm_matches_recompute_and_delta_is_real(spark):
    from spark_shp.queries_analytics import (IVM_DEL_MOD, IVM_INS_MOD,
                                             q_ivm_delta_agg)
    out = {r["pri"]: r for r in q_ivm_delta_agg(spark, SF).collect()}
    o = (spark.read.parquet(f"{SF}/orders.parquet")
         .selectExpr("o_orderkey AS k", "o_orderpriority AS pri",
                     "CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS pq")
         .toPandas())
    fin = o[(o.k % IVM_INS_MOD == 0) | (o.k % IVM_DEL_MOD != 0)]
    exp = fin.groupby("pri").agg(n=("k", "size"), s=("pq", "sum"))
    assert set(out) == set(exp.index)
    for pri, r in exp.iterrows():
        assert out[pri]["n_rows"] == r["n"]
        assert out[pri]["sum_price_q"] == r["s"]
    # both batch kinds were non-empty (the law is vacuous otherwise)
    base = o[o.k % IVM_INS_MOD != 0]
    assert (base.k % IVM_DEL_MOD == 0).sum() > 0
    assert (o.k % IVM_INS_MOD == 0).sum() > 0


def test_exact_order_statistics_matches_numpy_and_narrowing_laws(spark):
    from spark_shp.queries_analytics import (_os_kth,
                                             q_exact_order_statistics)

    sf = "/root/testdata/sf0.001"
    row = q_exact_order_statistics(spark, sf).collect()[0]
    cents = np.sort(
        spark.read.parquet(f"{sf}/orders.parquet")
        .selectExpr("CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)"
                    " AS c").toPandas()["c"].to_numpy(np.int64))
    n = len(cents)
    assert row["n"] == n
    assert row["v50"] == cents[(n + 1) // 2 - 1]
    assert row["v90"] == cents[(9 * n + 9) // 10 - 1]

    # adversarial k sweep: boundary ranks through the narrowing kernel
    df = (spark.read.parquet(f"{sf}/orders.parquet")
          .selectExpr("CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)"
                      " AS cents"))
    lo, hi = int(cents[0]), int(cents[-1])
    for k in (1, 2, n // 3, n - 1, n):
        assert _os_kth(df, "cents", k, lo, hi) == cents[k - 1], k


def _google_polyline(coords):
    """Sequential textbook encoder (true varint while-loop, independent
    of the SQL 6-chunk unroll): Google Encoded Polyline Algorithm."""
    out = []
    plat = plon = 0
    for vlat, vlon in coords:
        for v, prev in ((vlat, plat), (vlon, plon)):
            d = v - prev
            z = ~(d << 1) if d < 0 else d << 1
            while z >= 0x20:
                out.append(chr((0x20 | (z & 0x1F)) + 63))
                z >>= 5
            out.append(chr(z + 63))
        plat, plon = vlat, vlon
    return "".join(out)


def test_polyline_published_vector():
    # the worked example from Google's Encoded Polyline Algorithm doc
    pts = [(int(round(la * 1e5)), int(round(lo * 1e5)))
           for la, lo in [(38.5, -120.2), (40.7, -120.95),
                          (43.252, -126.453)]]
    assert _google_polyline(pts) == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"
    assert _google_polyline([(0, 0)]) == "??"


def test_polyline_encode_matches_sequential_encoder(spark):
    from spark_shp import fixtures, hashing
    from spark_shp.queries_analytics import (POLY_PTS, POLY_USER_MOD,
                                             q_polyline_encode)
    out = {r["user_id"]: r for r in q_polyline_encode(spark, SF).collect()}

    e = pd.read_parquet(f"{SF}/events.parquet")
    e = e[e["user_id"] % POLY_USER_MOD == 3].copy()
    eid = e["event_id"].to_numpy(dtype=np.int64)
    # numpy twin of EVENT_LON_SQL / EVENT_LAT_SQL
    lon = hashing.u01(eid) * 360.0 - 180.0
    lat = hashing.u01(eid * 2 + 1) * 170.0 - 85.0
    e["vlat"] = np.floor(lat * 1e5 + 0.5).astype(np.int64)
    e["vlon"] = np.floor(lon * 1e5 + 0.5).astype(np.int64)
    n_checked = 0
    for uid, g in e.sort_values(["ts", "event_id"]).groupby("user_id"):
        head = g.head(POLY_PTS)
        coords = list(zip(head["vlat"], head["vlon"]))
        enc = _google_polyline(coords)
        row = out[uid]
        assert row["polyline"] == enc
        assert row["n_pts"] == len(coords)
        assert row["n_chars"] == len(enc)
        n_checked += 1
    assert n_checked == len(out) and n_checked > 0
