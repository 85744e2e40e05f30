"""Kernel-level checks for the curation module (the oracle gate covers the
full queries; these pin the numpy kernels against hand-computed values)."""

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import types as T


def test_polygon_stats_rectangle_with_hole(spark):
    from spark_shp.queries_curation import polygon_stats
    outer = [[0.0, 0.0], [0.0, 4.0], [6.0, 4.0], [6.0, 0.0], [0.0, 0.0]]
    # outer above is CW (negative shoelace); this hole winds CCW (positive)
    hole = [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]]
    schema = T.StructType([
        T.StructField("poly_id", T.LongType()),
        T.StructField("coordinates", T.ArrayType(T.ArrayType(
            T.ArrayType(T.ArrayType(T.DoubleType()))))),
    ])
    df = spark.createDataFrame([(7, [[outer, hole]])], schema)
    r = polygon_stats(df).collect()[0]
    assert r["poly_id"] == 7
    assert abs(r["area"] - 23.0) < 1e-12          # 24 minus 1 for the hole
    assert abs(r["perimeter"] - 24.0) < 1e-12     # 20 outer + 4 hole
    # centroid of full rect (3, 2) pulled away from the hole at (1.5, 1.5)
    assert r["cx"] > 3.0 and r["cy"] > 2.0


def test_augment_checksums_hand_computed(spark):
    from spark_shp import codecs
    from spark_shp.multimodal import augment_checksums

    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    df = spark.createDataFrame(
        [("im0", bytearray(codecs.encode(px, "raw")), 2, 2, "raw")],
        "image_id: string, bytes: binary, w: int, h: int, fmt: string")
    r = augment_checksums(df, res_w=2, res_h=2).collect()[0]

    wgt = 1 + (np.arange(2)[None, :, None] * 31
               + np.arange(2)[:, None, None] * 17
               + np.arange(3)[None, None, :] * 7) % 101
    p = px.astype(np.int64)
    assert r["cs_flip"] == int((p[:, ::-1, :] * wgt).sum())
    assert r["cs_rot90"] == int((np.rot90(p, axes=(0, 1)) * wgt).sum())
    assert r["cs_resize"] == int((p * wgt).sum())   # 2x2 -> 2x2 identity
    # center crop of a 2x2 at quarter origin is the single pixel (0, 0)
    assert r["cs_crop"] == int((p[0:1, 0:1] * wgt[0:1, 0:1]).sum())


def test_tile_pyramid_single_shuffle_pure_jvm(spark):
    """The pyramid's selling point: ALL levels aggregate in one shuffle and
    the parent-chain explode stays inside codegen (no Python operators)."""
    from spark_shp.queries_curation import q_tile_pyramid
    df = q_tile_pyramid(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    physical = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = physical.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}"


def test_polygon_stats_random_rect_batch(spark):
    """50 seeded random rectangles (half with a centered half-extent hole):
    area/perimeter/centroid are analytically known; one Spark job checks
    the whole batch through the reduceat-segmented kernel (segment
    boundaries are the bug surface batching introduces)."""
    from spark_shp.queries_curation import polygon_stats
    from pyspark.sql import types as T
    rng = np.random.default_rng(7)
    rows, expect = [], {}
    for j in range(50):
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        hx, hy = rng.uniform(0.5, 5.0), rng.uniform(0.5, 5.0)
        ring = [[cx - hx, cy - hy], [cx - hx, cy + hy], [cx + hx, cy + hy],
                [cx + hx, cy - hy], [cx - hx, cy - hy]]
        rings = [ring]
        area, per = 4 * hx * hy, 4 * (hx + hy)
        if j % 2 == 0:
            hole = [[cx - hx / 2, cy - hy / 2], [cx + hx / 2, cy - hy / 2],
                    [cx + hx / 2, cy + hy / 2], [cx - hx / 2, cy + hy / 2],
                    [cx - hx / 2, cy - hy / 2]]
            rings.append(hole)
            area -= hx * hy
            per += 2 * (hx + hy)
        rows.append((j, [rings]))
        expect[j] = (area, per, cx, cy)
    schema = T.StructType([
        T.StructField("poly_id", T.LongType()),
        T.StructField("coordinates", T.ArrayType(T.ArrayType(
            T.ArrayType(T.ArrayType(T.DoubleType()))))),
    ])
    got = polygon_stats(spark.createDataFrame(rows, schema)).collect()
    assert len(got) == 50
    for r in got:
        area, per, cx, cy = expect[r["poly_id"]]
        assert abs(r["area"] - area) < 1e-9
        assert abs(r["perimeter"] - per) < 1e-9
        assert abs(r["cx"] - cx) < 1e-9 and abs(r["cy"] - cy) < 1e-9


def test_compact_cells_roundtrip_and_merging(spark):
    """A full 2x2 sibling block collapses to its parent (and cascades when
    the promoted parents again form a full block); ragged cells survive.
    Re-expanding every output cell to the input level reproduces the input
    set exactly (the compaction invariant)."""
    from spark_shp import cells as C, spatial

    lvl = 6
    # full block: the 16 level-6 cells under one level-4 ancestor
    anc = C.cell_encode(np.array([10.0]), np.array([20.0]), lvl - 2)[0]
    kids = C.cell_children(np.array([anc]))[0]
    grandkids = C.cell_children(kids).ravel()
    # ragged: 3 of 4 children of some other parent
    other = C.cell_encode(np.array([100.0]), np.array([-30.0]), lvl - 1)[0]
    ragged = C.cell_children(np.array([other]))[0][:3]
    cells_in = np.concatenate([grandkids, ragged]).astype(np.int64)
    df = spark.createDataFrame([(int(c),) for c in cells_in],
                               "cell_id: long")
    out = spatial.compact_cells(df, "cell_id", min_level=2)
    got = sorted(r["cell_id"] for r in out.collect())
    assert got == sorted([int(anc)] + [int(c) for c in ragged])

    # invariant: expanding back to `lvl` reproduces the input multiset
    def expand(c):
        if c % (1 << C.LEVEL_BITS) == lvl:
            return [c]
        out = []
        for k in C.cell_children(np.array([c]))[0]:
            out.extend(expand(int(k)))
        return out

    back = sorted(x for c in got for x in expand(c))
    assert back == sorted(int(c) for c in cells_in)


def test_dedup_passages_keep_first_and_reconstruct(spark):
    """Hand-computed keep-first semantics at PASSAGE_W=3: a passage shared
    across docs survives only in the lowest (doc_id, idx); docs reassemble
    from surviving passages in original order."""
    from spark_shp.queries_curation import dedup_passages
    d = spark.createDataFrame(
        [(1, "a b c x y z"),        # passages: "a b c", "x y z"
         (2, "x y z a b c q"),      # both seen in doc 1 -> only "q" kept
         (3, "a b c a b c")],       # self-dup: second "a b c" dropped too
        "doc_id: long, text: string")
    rows = {r["doc_id"]: r for r in dedup_passages(d).collect()}
    assert rows[1]["n_passages"] == 2 and rows[1]["n_kept"] == 2
    assert rows[1]["scrubbed_text"] == "a b c x y z"
    assert rows[2]["n_passages"] == 3 and rows[2]["n_kept"] == 1
    assert rows[2]["scrubbed_text"] == "q"
    assert rows[3]["n_passages"] == 2 and rows[3]["n_kept"] == 0
    assert rows[3]["scrubbed_text"] == ""


def test_repetition_signals_hand_computed(spark):
    from spark_shp.queries_curation import repetition_signals
    # tokens: [a, a, a, b] -> top token a: 3/4; bigrams: [a a, a a, a b]
    # -> top bigram "a a": 2/3; distinct bigrams 2 of 3 -> dup frac 1/3
    d = spark.createDataFrame([(1, "a a a b")], "doc_id: long, text: string")
    r = repetition_signals(d).collect()[0]
    assert r["n_tokens"] == 4
    assert abs(r["top_token_frac"] - 0.75) < 1e-9
    assert abs(r["top_bigram_frac"] - round(2 / 3, 6)) < 1e-9
    assert abs(r["dup_bigram_frac"] - round(1 / 3, 6)) < 1e-9


def test_focal_density_stencil_weights(spark):
    """One event's count must land on all 25 neighbors with weights 4/2/1
    and clamp at the grid edge; an isolated cell's own focal_sum is 4."""
    from spark_shp import cells as C
    from spark_shp.queries_curation import FOCAL_LVL, q_focal_density
    df = q_focal_density(spark, "/root/testdata/sf0.001")
    rows = {r["cell_id"]: r for r in df.collect()}
    # every output cell decodes to the right level and in-bounds coords
    n = 1 << FOCAL_LVL
    for cid in rows:
        assert cid % (1 << C.LEVEL_BITS) == FOCAL_LVL
    # cross-check one cell against a brute-force numpy stencil
    import numpy as np
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from spark_shp import fixtures
    pts = ev.selectExpr(f"{fixtures.EVENT_LON_SQL} AS lon",
                        f"{fixtures.EVENT_LAT_SQL} AS lat").toPandas()
    ix = np.clip(np.floor((pts.lon + 180.0) / 360.0 * n).astype(np.int64),
                 0, n - 1)
    iy = np.clip(np.floor((pts.lat + 85.0) / 170.0 * n).astype(np.int64),
                 0, n - 1)
    grid = np.zeros((n, n), dtype=np.int64)
    np.add.at(grid, (ix, iy), 1)
    w = np.array([[1, 1, 1, 1, 1], [1, 2, 2, 2, 1], [1, 2, 4, 2, 1],
                  [1, 2, 2, 2, 1], [1, 1, 1, 1, 1]], dtype=np.int64)
    # check the 5 densest cells
    flat = np.argsort(grid, axis=None)[-5:]
    for f in flat:
        cx, cy = int(f // n), int(f % n)
        acc = 0
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                sx, sy = cx + dx, cy + dy
                if 0 <= sx < n and 0 <= sy < n:
                    acc += int(grid[sx, sy]) * int(w[dx + 2, dy + 2])
        m = 0
        for b in range(16):
            m |= ((cx >> b) & 1) << (2 * b)
            m |= ((cy >> b) & 1) << (2 * b + 1)
        cid = m * (1 << C.LEVEL_BITS) + FOCAL_LVL
        assert rows[cid]["focal_sum"] == acc, (cx, cy)


def test_tfidf_keywords_hand_computed(spark):
    """3-doc corpus, hand-computed idf: a term in every doc scores lower
    than a rarer term with the same tf; ranks use the term tiebreak."""
    import math
    from spark_shp.queries_curation import tfidf_keywords
    d = spark.createDataFrame(
        [(1, "apple apple banana common"),
         (2, "banana cherry common"),
         (3, "cherry cherry cherry common")],
        "doc_id: long, text: string")
    rows = [(r["doc_id"], r["rank"], r["term"], r["score"])
            for r in tfidf_keywords(d).collect()]
    got = {(d_, rk): (t, s) for d_, rk, t, s in rows}

    def idf(df):
        return math.log((3 + 1.0) / (df + 1.0))
    # doc 1: apple tf=2 df=1 -> 2*ln(2); banana tf=1 df=2; common tf=1 df=3
    assert got[(1, 1)] == ("apple", round(2 * idf(1), 6))
    assert got[(1, 2)] == ("banana", round(idf(2), 6))
    assert got[(1, 3)] == ("common", round(idf(3), 6))
    # doc 3: cherry tf=3 dominates; common is rank 2; no rank 3 exists
    assert got[(3, 1)] == ("cherry", round(3 * idf(2), 6))
    assert got[(3, 2)] == ("common", round(idf(3), 6))
    assert (3, 3) not in got and len(rows) == 8


def test_hotspot_clusters_vs_bruteforce_floodfill(spark):
    """The cluster partition must equal a brute-force union-find over
    8-adjacent hot cells computed in numpy from the raw events."""
    import numpy as np
    from spark_shp import fixtures
    from spark_shp.queries_curation import HOT_LVL, q_hotspot_clusters
    out = q_hotspot_clusters(spark, "/root/testdata/sf0.001").collect()
    n = 1 << HOT_LVL
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pts = ev.selectExpr(f"{fixtures.EVENT_LON_SQL} AS lon",
                        f"{fixtures.EVENT_LAT_SQL} AS lat").toPandas()
    ix = np.clip(np.floor((pts.lon + 180.0) / 360.0 * n).astype(np.int64),
                 0, n - 1)
    iy = np.clip(np.floor((pts.lat + 85.0) / 170.0 * n).astype(np.int64),
                 0, n - 1)
    grid = np.zeros((n, n), dtype=np.int64)
    np.add.at(grid, (ix, iy), 1)
    occ = grid[grid > 0]
    thr = (2.0 * occ.sum()) / occ.size
    hot = {(int(x), int(y)) for x, y in zip(*np.where(grid >= thr))
           if grid[x, y] >= thr}
    # union-find flood fill
    parent = {c: c for c in hot}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for (x, y) in hot:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (x + dx, y + dy)
                if nb != (x, y) and nb in hot:
                    ra, rb = find((x, y)), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for c in hot:
        expect.setdefault(find(c), []).append(c)
    exp_stats = {min(x * n + y for x, y in mem):
                 (len(mem), int(sum(grid[x, y] for x, y in mem)))
                 for mem in expect.values()}
    got_stats = {r["cluster"]: (r["n_cells"], r["n_events"]) for r in out}
    assert got_stats == exp_stats
    # conservation: every hot cell is in exactly one cluster
    assert sum(v[0] for v in got_stats.values()) == len(hot)


def test_spatial_autocorr_vs_definitional_numpy(spark):
    """The integer-rearranged Moran's I / Geary's C must equal the textbook
    definitional formulas computed in numpy over the full lattice (empty
    cells are x=0 observations; queen contiguity with edge clamping)."""
    import numpy as np
    from spark_shp import fixtures
    from spark_shp.queries_curation import AC_LVL, q_spatial_autocorr
    r = q_spatial_autocorr(spark, "/root/testdata/sf0.001").collect()[0]
    n = 1 << AC_LVL
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pts = ev.selectExpr(f"{fixtures.EVENT_LON_SQL} AS lon",
                        f"{fixtures.EVENT_LAT_SQL} AS lat").toPandas()
    ix = np.clip(np.floor((pts.lon + 180.0) / 360.0 * n).astype(np.int64),
                 0, n - 1)
    iy = np.clip(np.floor((pts.lat + 85.0) / 170.0 * n).astype(np.int64),
                 0, n - 1)
    x = np.zeros((n, n), dtype=np.float64)
    np.add.at(x, (ix, iy), 1.0)
    xb = x.mean()
    d = x - xb
    num_m = 0.0   # sum over ordered adjacent pairs of d_i * d_j
    num_c = 0.0   # sum over ordered adjacent pairs of (x_i - x_j)^2
    w = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if (dx, dy) == (0, 0):
                continue
            a = d[max(0, dx):n + min(0, dx), max(0, dy):n + min(0, dy)]
            b = d[max(0, -dx):n + min(0, -dx), max(0, -dy):n + min(0, -dy)]
            num_m += (a * b).sum()
            num_c += ((a - b) ** 2).sum()
            w += a.size
    assert w == r["w_pairs"]
    s2 = (d * d).sum()
    moran = (n * n / w) * num_m / s2
    geary = (n * n - 1) * num_c / (2 * w * s2)
    assert abs(r["moran_i"] - moran) < 1e-6
    assert abs(r["geary_c"] - geary) < 1e-6
    # integer moments sanity: sx is the event count
    assert r["sx"] == len(pts)


def test_funnel_and_cohort_hand_computed(spark, tmp_path):
    """4-user funnel: full conversion, click-before-view (doesn't count),
    view-only, and no view at all (excluded); cohort matrix from the same
    events."""
    import datetime as dt
    from spark_shp.queries_rel import q_funnel_stages, q_cohort_retention
    t0 = dt.datetime(2024, 1, 1)

    def ts(days, secs=0):
        return t0 + dt.timedelta(days=days, seconds=secs)

    rows = [
        (1, ts(0), "view"), (1, ts(0, 60), "click"), (1, ts(1), "purchase"),
        (2, ts(0, 30), "click"), (2, ts(1), "view"),   # click precedes view
        (3, ts(2), "view"),
        (4, ts(0), "purchase"),                        # never views
        (1, ts(15), "view"),                           # week-2 activity
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts: timestamp, "
                                     "event_type: string")
    d = str(tmp_path / "sf")
    import os
    os.makedirs(d, exist_ok=True)
    df.write.parquet(f"{d}/events.parquet")

    f = {r["user_id"]: r for r in q_funnel_stages(spark, d).collect()}
    assert set(f) == {1, 2, 3}                         # user 4 excluded
    assert f[1]["depth"] == 3
    assert f[1]["view_to_click_us"] == 60 * 1_000_000
    assert f[1]["click_to_purchase_us"] == (86400 - 60) * 1_000_000
    assert f[2]["depth"] == 1 and f[2]["view_to_click_us"] is None
    assert f[3]["depth"] == 1

    c = {(r["cohort_week"], r["week_offset"]): r["n_users"]
         for r in q_cohort_retention(spark, d).collect()}
    # users 1,2,4 first active in week of Jan 1; user 3 on Jan 3 (same week);
    # user 1 active again 15 days later (offset 2)
    w0 = min(k[0] for k in c)
    assert c[(w0, 0)] == 4
    assert c[(w0, 2)] == 1 and len(c) == 2


def test_new_operator_plan_shapes(spark):
    """The late-round operators must stay pure JVM (no Python eval
    operators in the plan) with a bounded shuffle count — the plan
    discipline the 100 TB brief demands."""
    from spark_shp.queries_curation import (q_dedup_passages,
                                            q_focal_density,
                                            q_repetition_signals,
                                            q_tfidf_keywords)
    sf = "/root/testdata/sf0.001"
    budgets = {  # max Exchange hashpartitioning allowed
        q_focal_density: 2,       # cell counts + stencil re-aggregation
        q_dedup_passages: 2,      # passage-keyed window + doc_id agg
        q_repetition_signals: 5,  # 2x (explode agg + doc rollup) + join
        q_tfidf_keywords: 5,      # tf agg, df agg, term join, doc window
    }
    for fn, budget in budgets.items():
        df = fn(spark, sf)
        plan = df._jdf.queryExecution().toString()
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "ArrowEvalPython" not in plan, fn.__name__
        physical = df._jdf.queryExecution().executedPlan().toString()
        n = physical.count("Exchange hashpartitioning")
        assert n <= budget, f"{fn.__name__}: {n} shuffles > {budget}"


def test_dedup_containment_matches_bruteforce(spark):
    from spark_shp.queries_text import (CONTAIN_SNIP_MOD, CONTAIN_SNIP_OFF,
                                        q_dedup_containment)

    sf = "/root/testdata/sf0.001"
    got = {r["contained_id"]: (r["n_containers"], r["first_container"])
           for r in q_dedup_containment(spark, sf).collect()}

    # rebuild the corpus (docs + injected token-aligned snippets) in pandas
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text").toPandas()
    corpus = {int(r.doc_id): r.text for r in d.itertuples()}
    for r in d.itertuples():
        toks = r.text.split(" ")
        if int(r.doc_id) % CONTAIN_SNIP_MOD == 0 and len(toks) >= 10:
            corpus[int(r.doc_id) + CONTAIN_SNIP_OFF] = " ".join(toks[2:10])

    # brute force: token-boundary containment over all pairs (docs with
    # >= 3 tokens — shorter docs have no 3-token window and are out of
    # the operator's declared contract)
    want = {}
    for a, ta in corpus.items():
        if len(ta.split(" ")) < 3:
            continue
        cs = [b for b, tb in corpus.items()
              if b != a and len(ta) < len(tb)
              and f" {ta} " in f" {tb} "]
        if cs:
            want[a] = (len(cs), min(cs))
    assert got == want
    # every injected snippet with a >=3-token body is recovered
    inj = [k for k in corpus if k >= CONTAIN_SNIP_OFF]
    assert inj and all(k in got for k in inj)


def test_text_encoding_audit_recovers_injected_classes(spark):
    """The audit must flag exactly the injected corruption classes: docs
    with doc_id % 13 == 0 get class doc_id % 4; everything else is clean
    (python-side replay of the same injection)."""
    import pandas as pd
    from spark_shp.queries_text import ENC_MOD, q_text_encoding_audit

    sf = "/root/testdata/sf0.001"
    out = q_text_encoding_audit(spark, sf).toPandas().set_index("lang")
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "lang").toPandas()
    d["cls"] = d["doc_id"] % 4
    d["bad"] = d["doc_id"] % ENC_MOD == 0
    want = d.groupby("lang").apply(
        lambda g: pd.Series({
            "n_control": int((g.bad & (g.cls == 0)).sum()),
            "n_zero_width": int((g.bad & (g.cls == 1)).sum()),
            "n_mojibake": int((g.bad & (g.cls == 2)).sum()),
            "n_replacement": int((g.bad & (g.cls == 3)).sum()),
        }), include_groups=False)
    for lang, row in want.iterrows():
        got = out.loc[lang]
        for c in row.index:
            assert got[c] == row[c], (lang, c)
        # each corrupted doc loses >= 1 byte under the scrub
        assert got["reclaim_bytes"] >= row.sum()


def test_split_leakage_matches_python_and_finds_leaks(spark):
    """Python replication over the Spark-produced LSH pairs (the pair
    machinery itself is gate-verified; this pins the split tagging and
    class accounting), plus structure: leak classes exist, counts
    conserve, and same-split classes are flagged clean."""
    from spark_shp.hashing import mix
    from spark_shp.queries_curation import q_split_leakage_audit
    from spark_shp.queries_text import q_minhash_lsh_pairs
    sf = "/root/testdata/sf0.001"
    out = {(r["split_lo"], r["split_hi"]): r
           for r in q_split_leakage_audit(spark, sf).collect()}
    pairs = [(r["doc_a"], r["doc_b"], r["n_bands"])
             for r in q_minhash_lsh_pairs(spark, sf).collect()]
    assert pairs

    def split(d):
        v = int(mix(997 * d + 13)) % 100
        return "train" if v < 80 else ("val" if v < 90 else "test")

    expect = {}
    for a, b, nb in pairs:
        key = tuple(sorted((split(a), split(b))))
        e = expect.setdefault(key, [0, 0])
        e[0] += 1
        e[1] += nb
    assert set(out) == set(expect)
    for key, (n, sb) in expect.items():
        r = out[key]
        assert (r["n_pairs"], r["sum_bands"]) == (n, sb)
        assert r["is_leak"] == int(key[0] != key[1])
    assert sum(v[0] for v in expect.values()) == len(pairs)
    assert any(k[0] != k[1] for k in expect)      # leaks exist
    assert any(k[0] == k[1] for k in expect)      # clean classes exist


def test_semantic_dedup_matches_sequential_replay(spark):
    """SemDeDup replicated sequentially: LSH cluster assignment, exact
    int16 cosine pairs at the 24/25 rational threshold, keep-smallest-id
    survivors — per-cluster counts and survivor id-sums must match, and
    the survivor set must conserve (members = removed + survivors)."""
    import numpy as np
    from spark_shp.hashing import u01
    from spark_shp.queries_text import (SEMDEDUP_PLANES, SEMDEDUP_SEED,
                                        q_semantic_dedup)

    SF = "/root/testdata/sf0.001"
    out = {r["cid"]: r for r in q_semantic_dedup(spark, SF).collect()}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .orderBy("vec_id").collect()
    vids = np.array([r["vec_id"] for r in emb], dtype=np.int64)
    v = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                  for r in emb])
    q = np.rint(v * 1000.0).astype(np.int64)
    jj, ii = np.meshgrid(np.arange(SEMDEDUP_PLANES, dtype=np.int64),
                         np.arange(64, dtype=np.int64), indexing="ij")
    planes = np.rint((u01((SEMDEDUP_SEED + jj) * 64 + ii) - 0.5)
                     * 1000.0).astype(np.int64)
    cid = ((q @ planes.T >= 0).astype(np.int64)
           @ (1 << np.arange(SEMDEDUP_PLANES, dtype=np.int64)))
    agg = {}
    for c in np.unique(cid):
        m = cid == c
        mv, mq = vids[m], q[m]
        order = np.argsort(mv)
        mv, mq = mv[order], mq[order]
        dots = mq @ mq.T
        n2 = np.einsum("ij,ij->i", mq, mq)
        dup = (dots > 0) & (625 * dots * dots >= 576 * np.outer(n2, n2))
        removed = np.tril(dup, k=-1).any(axis=1)
        agg[int(c)] = (len(mv), int(removed.sum()),
                       int(mv[~removed].sum()))
    assert set(out) == set(agg)
    total_members = total_removed = 0
    for c, (n, nr, sid) in agg.items():
        r = out[c]
        assert (r["n_members"], r["n_removed"],
                r["survivor_idsum"]) == (n, nr, sid)
        total_members += n
        total_removed += nr
    assert total_members == len(vids)       # partition covers the corpus


def test_semantic_dedup_prunes_planted_duplicates(spark, tmp_path):
    """Planted near-identical vectors must be pruned to one survivor per
    group (keep-smallest-id), and unrelated vectors must all survive."""
    import numpy as np
    import pandas as pd
    from spark_shp.queries_text import q_semantic_dedup

    rng = np.random.default_rng(11)
    base = rng.normal(0, 0.3, (6, 64))
    rows = []
    vid = 0
    for g in range(6):
        for k in range(3):                   # 3 near-copies per group
            vec = base[g] + rng.normal(0, 1e-4, 64)
            rows.append((vid, vec.tolist()))
            vid += 1
    for _ in range(20):                      # unrelated singletons
        rows.append((vid, rng.normal(0, 0.3, 64).tolist()))
        vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    d = str(tmp_path / "sf")
    spark.createDataFrame(pdf).write.parquet(f"{d}/embeddings.parquet")
    out = q_semantic_dedup(spark, d).collect()
    total_removed = sum(r["n_removed"] for r in out)
    total_members = sum(r["n_members"] for r in out)
    assert total_members == 38
    # each planted triple collapses to one survivor IF the triple shares
    # a cluster (near-identical vectors always do: same LSH signs)
    assert total_removed == 12


def _sd_capped_reference(vids, q, cap, max_depth):
    """Sequential replay of semantic_dedup_capped's algorithm (base LSH
    cells, then k-d mean-splits on the max-variance dimension)."""
    from spark_shp.hashing import u01
    from spark_shp.queries_text import SEMDEDUP_PLANES, SEMDEDUP_SEED

    jj, ii = np.meshgrid(np.arange(SEMDEDUP_PLANES, dtype=np.int64),
                         np.arange(64, dtype=np.int64), indexing="ij")
    pl = np.rint((u01((SEMDEDUP_SEED + jj) * 64 + ii) - 0.5)
                 * 1000.0).astype(np.int64)
    w = 1 << np.arange(SEMDEDUP_PLANES, dtype=np.int64)
    cid = ((q @ pl.T >= 0).astype(np.int64) @ w)
    terminal = set()
    for depth in range(max_depth):
        uniq, counts = np.unique(cid, return_counts=True)
        hot = [int(c) for c, n in zip(uniq, counts)
               if n > cap and int(c) not in terminal]
        if not hot:
            break
        rules = {}
        for c in hot:
            m = cid == c
            qs = q[m]
            n = int(m.sum())
            s = qs.sum(axis=0)
            ssq = (qs * qs).sum(axis=0)
            var_n2 = ssq * n - s * s
            if var_n2.max() <= 0:
                terminal.add(c)
                continue
            dim = int(var_n2.argmax())
            rules[c] = (dim, n, int(s[dim]))
        if not rules:
            break
        shift = SEMDEDUP_PLANES + depth * 2
        for c, (dim, n, s) in rules.items():
            m = cid == c
            sub = (q[m, dim] * n > s).astype(np.int64)
            cid[m] = c | ((sub + 1) << shift)
    agg = {}
    removed_ids = set()
    for c in np.unique(cid):
        m = cid == c
        mv, mq = vids[m], q[m]
        order = np.argsort(mv)
        mv, mq = mv[order], mq[order]
        dots = mq @ mq.T
        n2 = np.einsum("ij,ij->i", mq, mq)
        dup = (dots > 0) & (625 * dots * dots >= 576 * np.outer(n2, n2))
        rem = np.tril(dup, k=-1).any(axis=1)
        removed_ids |= set(mv[rem].tolist())
        agg[int(c)] = (len(mv), int(rem.sum()), int(mv[~rem].sum()))
    return agg, removed_ids


def test_semantic_dedup_capped_bounds_hot_cluster(spark):
    """VERDICT r4 item 4: a 30%-hot LSH cell must split until every
    prune group holds <= cap members, planted duplicate pairs must still
    be pruned, and the whole output must match a sequential replay."""
    import pandas as pd
    from spark_shp.hashing import u01
    from spark_shp.queries_text import (SEMDEDUP_PLANES, SEMDEDUP_SEED,
                                        semantic_dedup_capped)

    rng = np.random.default_rng(77)
    jj, ii = np.meshgrid(np.arange(SEMDEDUP_PLANES, dtype=np.int64),
                         np.arange(64, dtype=np.int64), indexing="ij")
    planes = np.rint((u01((SEMDEDUP_SEED + jj) * 64 + ii) - 0.5)
                     * 1000.0).astype(np.int64)
    w = 1 << np.arange(SEMDEDUP_PLANES, dtype=np.int64)

    def cell_of(v):
        qv = np.rint(v * 1000.0).astype(np.int64)
        return int(((qv @ planes.T >= 0).astype(np.int64) @ w)[0]) \
            if v.ndim == 2 else None

    mu = rng.normal(0, 1, 64)
    mu /= np.linalg.norm(mu)
    target = cell_of(mu[None])
    hot_vecs = []
    while len(hot_vecs) < 168:          # ~30% of 600, one concentrated cell
        v = mu + rng.normal(0, 0.25, 64)
        if cell_of(v[None]) == target:
            hot_vecs.append(v)
    # 6 planted near-duplicate pairs inside the hot cell
    dup_pairs = []
    base_n = len(hot_vecs)
    for k in range(6):
        a = hot_vecs[k]
        hot_vecs.append(a * 1.0001)
        dup_pairs.append((k, base_n + k))
    vecs = hot_vecs + [rng.normal(0, 1, 64) for _ in range(420)]
    vids = np.arange(len(vecs), dtype=np.int64)
    v = np.stack(vecs)
    q = np.rint(v * 1000.0).astype(np.int64)

    emb_df = spark.createDataFrame(
        pd.DataFrame({"vec_id": vids, "embedding": list(v)}),
        "vec_id long, embedding array<double>")
    cap = 48
    out = {r["cid"]: (r["n_members"], r["n_removed"], r["survivor_idsum"])
           for r in semantic_dedup_capped(spark, None, cap=cap,
                                          emb_df=emb_df).collect()}
    ref, removed_ids = _sd_capped_reference(vids, q, cap, 16)
    assert out == ref
    # every final prune group is bounded by the cap
    assert max(n for n, _, _ in out.values()) <= cap
    # the hot cell really was hot (the cap had work to do)
    assert 168 + 6 > cap
    # planted duplicates survive the split: higher-id partner pruned
    for a, b in dup_pairs:
        assert int(vids[b]) in removed_ids
    assert sum(nr for _, nr, _ in out.values()) >= len(dup_pairs)


def test_semantic_dedup_kmeans_matches_sequential_replay(spark):
    """The k-means SemDeDup variant replicated sequentially: exact-int
    Lloyd (seeds = k smallest vec_ids, ties to smaller cid, floor-div
    centroids, empty keeps previous), then the shared cosine prune."""
    from spark_shp.queries_text import (SDK_K, SDK_ROUNDS, SDK_SHIFT,
                                        q_semantic_dedup_kmeans)

    SF = "/root/testdata/sf0.001"
    out = {r["cid"]: (r["n_members"], r["n_removed"], r["survivor_idsum"])
           for r in q_semantic_dedup_kmeans(spark, SF).collect()}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .orderBy("vec_id").collect()
    vids = np.array([r["vec_id"] for r in emb], dtype=np.int64)
    v = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                  for r in emb])
    q = np.rint(v * 1000.0).astype(np.int64)
    qs = q + SDK_SHIFT
    cents = qs[:SDK_K].copy()           # vids sorted ascending already
    for _ in range(SDK_ROUNDS):
        d2 = ((qs[:, None, :] - cents[None]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        nxt = cents.copy()
        for c in np.unique(a):
            m = a == c
            nxt[c] = qs[m].sum(axis=0) // int(m.sum())
        cents = nxt
    a = ((qs[:, None, :] - cents[None]) ** 2).sum(axis=2).argmin(axis=1)
    agg = {}
    for c in np.unique(a):
        m = a == c
        mv, mq = vids[m], q[m]
        order = np.argsort(mv)
        mv, mq = mv[order], mq[order]
        dots = mq @ mq.T
        n2 = np.einsum("ij,ij->i", mq, mq)
        dup = (dots > 0) & (625 * dots * dots >= 576 * np.outer(n2, n2))
        rem = np.tril(dup, k=-1).any(axis=1)
        agg[int(c)] = (len(mv), int(rem.sum()), int(mv[~rem].sum()))
    assert out == agg
    assert sum(n for n, _, _ in out.values()) == len(vids)


def test_dedup_substring_spans_matches_sequential_replay(spark):
    """Exact duplicated-substring spans (Lee et al. 2022 gate form)
    replicated sequentially: K-gram corpus counts, duplicated positions,
    per-doc maximal-span merge. A known duplicated phrase planted in the
    corpus must also surface with at least K covered chars per copy."""
    from spark_shp.queries_text import SUBSTR_K, q_dedup_substring_spans

    SF = "/root/testdata/sf0.001"
    out = {r["doc_id"]: (r["n_spans"], r["dup_chars"], r["total_chars"])
           for r in q_dedup_substring_spans(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text", "n_chars").collect()
    from collections import Counter
    counts = Counter()
    for r in docs:
        t = r["text"]
        for i in range(len(t) - SUBSTR_K + 1):
            counts[t[i:i + SUBSTR_K]] += 1
    agg = {}
    total_dup = 0
    for r in docs:
        t = r["text"]
        pos = [i + 1 for i in range(len(t) - SUBSTR_K + 1)
               if counts[t[i:i + SUBSTR_K]] >= 2]
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + SUBSTR_K)
            else:
                spans.append([p, p + SUBSTR_K])
        dup = sum(e - s for s, e in spans)
        agg[r["doc_id"]] = (len(spans), dup, r["n_chars"])
        total_dup += dup
    assert out == agg
    # synthetic template corpus must actually contain duplication
    assert total_dup > 0
    assert any(n > 0 for n, _, _ in out.values())
