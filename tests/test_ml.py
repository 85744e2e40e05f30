"""Independent twins for queries_ml: k-means inertia law + pandas argmin
replay, label-spreading growth/clamp invariants against a networkx-free
python propagation, isotonic vs a Fraction-exact PAVA, and a pandas DiD.
The cross-engine oracle gate proves Spark and DuckDB agree; these prove
the AGREED answer is the right algorithm (the repo's theil_sen lesson)."""

from fractions import Fraction

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_kmeans_inertia_decreases_and_matches_numpy(spark):
    from spark_shp import fixtures
    from spark_shp.queries_ml import (KM_INERTIA_Q, KM_SEEDS,
                                      q_kmeans_rounds)
    r1 = {r["cid"]: r for r in q_kmeans_rounds(spark, SF, rounds=1).collect()}
    r2 = {r["cid"]: r for r in q_kmeans_rounds(spark, SF, rounds=2).collect()}
    assert len(r2) == 4 and all(r["n_points"] > 0 for r in r2.values())
    # Lloyd's monotone-improvement law on the quantized inertia (each
    # re-quantized term moves < 1, so allow a 1-per-point slack)
    tot1 = sum(r["inertia_q"] for r in r1.values())
    tot2 = sum(r["inertia_q"] for r in r2.values())
    npts = sum(r["n_points"] for r in r2.values())
    assert tot2 <= tot1 + npts

    # full numpy replay of the 2-round recurrence
    pdf = (_events(spark).selectExpr(
        f"CAST(FLOOR(({fixtures.EVENT_LON_SQL} + 180.0) * 100000.0) "
        "AS BIGINT) AS qx",
        f"CAST(FLOOR(({fixtures.EVENT_LAT_SQL} + 85.0) * 100000.0) "
        "AS BIGINT) AS qy").toPandas())
    q = pdf[["qx", "qy"]].to_numpy(dtype=np.int64)
    c = np.array([[x, y] for _, x, y in KM_SEEDS], dtype=np.int64)
    for _ in range(2):
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)          # ties -> lowest cid (argmin behavior)
        c = np.stack([q[a == k].sum(axis=0) // max(1, (a == k).sum())
                      for k in range(4)])
    d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)
    for k in range(4):
        row = r2[k]
        assert row["n_points"] == int((a == k).sum())
        assert (row["cx"], row["cy"]) == (int(c[k, 0]), int(c[k, 1]))
        assert row["inertia_q"] == int(
            (d[np.arange(len(a)), a][a == k] // KM_INERTIA_Q).sum())


def test_label_spreading_clamps_and_grows(spark):
    from spark_shp.queries_ml import LS_SEED_MOD, q_label_spreading
    from spark_shp.queries_text import q_dedup_embedding_near
    out = q_label_spreading(spark, SF).toPandas()
    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .select("vec_id", "label").toPandas()
           .set_index("vec_id")["label"].to_dict())
    seeds = out[out["assigned_round"] == 0]
    assert len(seeds) == sum(1 for v in emb if v % LS_SEED_MOD == 0)
    # seeds are clamped to ground truth
    assert all(emb[v] == l for v, l in
               zip(seeds["vec_id"], seeds["label"]))
    # planted structure: propagation actually labeled new nodes
    spread = out[out["assigned_round"] > 0]
    assert len(spread) > 0
    assert out["vec_id"].is_unique

    # python replay of the synchronous recurrence
    pairs = q_dedup_embedding_near(spark, SF).toPandas()
    adj: dict = {}
    for a, b in zip(pairs["vec_a"], pairs["vec_b"]):
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    cur = {v: (l, 0) for v, l in emb.items() if v % LS_SEED_MOD == 0}
    for r in (1, 2):
        votes: dict = {}
        for s, (lab, _) in cur.items():
            for d in adj.get(s, ()):
                votes.setdefault(d, {}).setdefault(lab, 0)
                votes[d][lab] += 1
        newly = {}
        for d, vc in votes.items():
            if d in cur:
                continue
            best = min(vc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            newly[d] = (best, r)
        cur.update(newly)
    got = {int(v): (int(l), int(r)) for v, l, r in
           zip(out["vec_id"], out["label"], out["assigned_round"])}
    assert got == cur


def _pava_exact(s, c):
    """Fraction-exact pool-adjacent-violators on (sum, count) bins,
    expanded back to one fitted mean per input bin."""
    blocks = [(Fraction(int(si), int(ci)), int(ci), 1)
              for si, ci in zip(s, c)]
    st: list = []
    for m, wgt, nb in blocks:
        st.append((m, wgt, nb))
        while len(st) > 1 and st[-2][0] >= st[-1][0]:
            m2, w2, n2 = st.pop()
            m1, w1, n1 = st.pop()
            st.append(((m1 * w1 + m2 * w2) / (w1 + w2), w1 + w2, n1 + n2))
    fit = []
    for m, _, nb in st:
        fit.extend([m] * nb)
    return fit


def test_isotonic_monotone_and_near_exact_pava(spark):
    from spark_shp.queries_ml import ISO_Q, q_isotonic_calibration
    out = (q_isotonic_calibration(spark, SF).toPandas()
           .sort_values("hour").reset_index(drop=True))
    assert len(out) == 24
    iso = out["iso_q"].to_numpy()
    assert (np.diff(iso) >= 0).all()          # monotone nondecreasing
    assert iso.min() < iso.max() or len(set(out["rate_q"])) == 1
    exact = _pava_exact(out["n_pos"].tolist(), out["n"].tolist())
    # minimax over 1e-6-floor-quantized means sits within one quantum of
    # Fraction-exact PAVA (min/max are 1-Lipschitz in each window mean)
    for q, m in zip(iso, exact):
        assert abs(q / ISO_Q - float(m)) <= 1.0 / ISO_Q + 1e-12


def test_diff_in_diff_matches_pandas(spark):
    from spark_shp.queries_ml import DID_CUT, q_diff_in_diff
    out = q_diff_in_diff(spark, SF).collect()[0].asDict()
    e = (_events(spark).where("event_type = 'purchase'")
         .selectExpr("user_id", "ts",
                     "CAST(FLOOR(value * 100.0) AS BIGINT) AS yq")
         .toPandas())
    e["treat"] = (e["user_id"] % 2).astype(int)
    e["post"] = (e["ts"] >= pd.Timestamp(DID_CUT)).astype(int)
    g = e.groupby(["treat", "post"])["yq"].agg(["count", "sum"])
    m = {(t, p): g.loc[(t, p), "sum"] / g.loc[(t, p), "count"] / 100.0
         for t in (0, 1) for p in (0, 1)}
    for (t, p), stem in [((0, 0), "c00"), ((0, 1), "c01"),
                         ((1, 0), "c10"), ((1, 1), "c11")]:
        assert out[f"n_{stem}"] == g.loc[(t, p), "count"]
        assert abs(out[f"mean_{stem}"] - m[(t, p)]) < 1e-6
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    assert abs(out["did"] - did) < 1e-6
    # the gate's blind spot: all four cells must be populated
    assert all(out[f"n_{s}"] > 0 for s in ("c00", "c01", "c10", "c11"))


def test_target_encoding_is_out_of_fold(spark):
    from spark_shp.queries_ml import TE_FOLDS, q_target_encoding
    out = q_target_encoding(spark, SF).toPandas()
    o = (spark.read.parquet(f"{SF}/orders.parquet")
         .selectExpr("o_orderpriority AS cat",
                     f"CAST(o_orderkey % {TE_FOLDS} AS INT) AS fold",
                     "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y")
         .toPandas())
    for _, r in out.iterrows():
        oof = o[(o["cat"] == r["cat"]) & (o["fold"] != r["fold"])]
        assert abs(r["enc"] - oof["y"].mean()) < 2e-6
        assert r["n"] == len(o[(o["cat"] == r["cat"])
                               & (o["fold"] == r["fold"])])
    assert len(out) == out["cat"].nunique() * TE_FOLDS
    assert out["enc"].nunique() > 1          # non-degenerate


def test_cem_att_matches_pandas(spark):
    from spark_shp.queries_ml import (CEM_BIN, CEM_TREAT_MOD, q_cem_att)
    out = q_cem_att(spark, SF).toPandas().set_index("stratum")
    e = (spark.read.parquet(f"{SF}/events.parquet")
         .selectExpr("user_id", "event_type",
                     "CAST(FLOOR(value * 100.0) AS BIGINT) AS yq")
         .toPandas())
    g = e.groupby("user_id")
    u = pd.DataFrame({
        "n_ev": g.size(),
        "n_click": g.apply(lambda d: int((d["event_type"] == "click").sum()),
                           include_groups=False),
        "yq": g.apply(lambda d: int(d.loc[d["event_type"] == "purchase",
                                          "yq"].sum()),
                      include_groups=False)}).reset_index()
    u["treat"] = (u["user_id"] % CEM_TREAT_MOD == 0).astype(int)
    u["stratum"] = (10000 * u["n_click"] // u["n_ev"]) // CEM_BIN
    st = u.groupby(["stratum", "treat"]).agg(
        n=("yq", "size"), sy=("yq", "sum"))
    n_both = 0
    for s in u["stratum"].unique():
        if (s, 0) in st.index and (s, 1) in st.index:
            n_both += 1
            nt, syt = st.loc[(s, 1), "n"], st.loc[(s, 1), "sy"]
            nc, syc = st.loc[(s, 0), "n"], st.loc[(s, 0), "sy"]
            row = out.loc[s]
            assert (row["n_treated"], row["n_control"]) == (nt, nc)
            d = syt / nt - syc / nc
            assert abs(row["att_stratum"] - d / 100.0) < 3e-6
    assert len(out) == n_both and n_both > 1


def test_roc_auc_matches_sklearn_free_pair_count(spark):
    from spark_shp.queries_ml import q_roc_auc
    out = {r["seg"]: r for r in q_roc_auc(spark, SF).collect()}
    o = (spark.read.parquet(f"{SF}/orders.parquet")
         .selectExpr("o_orderpriority AS seg",
                     "CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS s",
                     "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y")
         .toPandas())
    for seg, g in o.groupby("seg"):
        pos = g[g.y == 1]["s"].to_numpy()
        neg = g[g.y == 0]["s"].to_numpy()
        # brute-force pair count (concordant + half-ties)
        conc = sum(int((p > neg).sum()) for p in pos)
        ties = sum(int((p == neg).sum()) for p in pos)
        r = out[seg]
        assert r["p"] == len(pos) and r["n"] == len(neg)
        assert r["num2"] == 2 * conc + ties
        auc = (conc + 0.5 * ties) / (len(pos) * len(neg))
        assert abs(r["auc"] - auc) < 2e-6
        assert 0.0 <= r["auc"] <= 1.0


def test_lift_gains_laws(spark):
    from spark_shp.queries_ml import q_lift_gains
    out = q_lift_gains(spark, SF).toPandas().sort_values("decile")
    assert list(out["decile"]) == list(range(1, 11))
    # NTILE balance: decile sizes differ by at most 1
    assert out["n"].max() - out["n"].min() <= 1
    # capture is monotone nondecreasing and ends at exactly 1
    cap = out["capture_q"].to_list()
    assert all(a <= b for a, b in zip(cap, cap[1:]))
    assert cap[-1] == 1_000_000
    # final cumulative lift is exactly 1 (whole population)
    assert out["lift_q"].iloc[-1] == 1_000_000
    # exact replay of decile positives from the raw table
    o = (spark.read.parquet(f"{SF}/orders.parquet")
         .selectExpr("CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS s",
                     "o_orderkey AS k",
                     "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y")
         .toPandas().sort_values(["s", "k"], ascending=[False, True])
         .reset_index(drop=True))
    n = len(o)
    base, rem = divmod(n, 10)
    sizes = [base + (1 if i < rem else 0) for i in range(10)]
    pos_by_decile, at = [], 0
    for sz in sizes:
        pos_by_decile.append(int(o["y"].iloc[at:at + sz].sum()))
        at += sz
    assert list(out["pos"]) == pos_by_decile


def test_naive_bayes_matches_pure_python(spark):
    import math
    from collections import Counter
    from spark_shp.queries_ml import q_naive_bayes
    out = {(r["true_lang"], r["pred_lang"]): (r["n_docs"], r["doc_checksum"])
           for r in q_naive_bayes(spark, SF).collect()}
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "lang", "text").collect())

    def qln(x):
        return math.floor(round(math.log(x), 6) * 1_000_000.0 + 0.5)

    wc, tc, nc, nd, vocab = {}, Counter(), Counter(), 0, set()
    for r in docs:
        if r["doc_id"] % 5 != 0:
            nc[r["lang"]] += 1
            nd += 1
            for w in r["text"].split(" "):
                if w:
                    wc[(r["lang"], w)] = wc.get((r["lang"], w), 0) + 1
                    tc[r["lang"]] += 1
                    vocab.add(w)
    v = len(vocab)
    classes = sorted(nc)
    exp = Counter()
    chk = Counter()
    for r in docs:
        if r["doc_id"] % 5 != 0:
            continue
        cnt = Counter(w for w in r["text"].split(" ") if w)
        if not cnt:
            continue
        scores = {}
        for c in classes:
            s = qln(nc[c] / nd)
            for w, k in cnt.items():
                s += k * qln((wc.get((c, w), 0) + 1) / (tc[c] + v))
            scores[c] = s
        pred = min(classes, key=lambda c: (-scores[c], c))
        exp[(r["lang"], pred)] += 1
        chk[(r["lang"], pred)] += r["doc_id"]
    assert out == {k: (exp[k], chk[k]) for k in exp}
    # non-degenerate: more than one predicted class must appear
    assert len({p for _, p in exp}) > 1


def test_logistic_gd_matches_numpy_and_learns(spark):
    import math

    from spark_shp.queries_ml import (LOGIT_Q, LOGIT_ROUNDS, _LOGIT_D10, _LOGIT_QN,
                                      _logit_y, q_logistic_gd)
    row = q_logistic_gd(spark, SF).collect()[0]

    pdf = (spark.read.parquet(f"{SF}/lineitem.parquet")
           .selectExpr(f"{_LOGIT_D10} - 5 AS f1", f"{_LOGIT_QN} - 25 AS f2",
                       f"{_logit_y()} AS y").toPandas())
    f1 = pdf["f1"].to_numpy(np.int64)
    f2 = pdf["f2"].to_numpy(np.int64)
    y = pdf["y"].to_numpy(np.int64)
    n = len(y)
    w0 = w1 = w2 = 0
    for _ in range(LOGIT_ROUNDS):
        z = (w0 * 50 + w1 * 5 * f1 + w2 * f2).astype(np.float64) \
            / float(50 * LOGIT_Q)
        p = 1.0 / (1.0 + np.exp(-z))
        r = np.floor((p - y) * LOGIT_Q).astype(np.int64)
        g0, g1, g2 = int(r.sum()), int((r * f1).sum()), int((r * f2).sum())
        w0 = math.floor(w0 - 2.0 * (g0 / (1.0 * n)))
        w1 = math.floor(w1 - 2.0 * (g1 / (10.0 * n)))
        w2 = math.floor(w2 - 2.0 * (g2 / (50.0 * n)))
    assert (row["w0_q"], row["w1_q"], row["w2_q"]) == (w0, w1, w2)

    zn = w0 * 50 + w1 * 5 * f1 + w2 * f2
    pred = (zn > 0).astype(np.int64)
    assert row["n"] == n and row["n_pos"] == int(y.sum())
    assert row["n_correct"] == int((pred == y).sum())
    # the planted monotone signal must actually be LEARNED: accuracy
    # beats the majority-class baseline by a wide margin
    majority = max(row["n_pos"], n - row["n_pos"])
    assert row["n_correct"] > majority + n // 5
    # positive signal direction on both features
    assert w1 > 0 and w2 > 0


def test_als_user_factors_matches_numpy_ridge(spark):
    from spark_shp.queries_ml import ALS_LAMBDA, q_als_user_factors

    out = q_als_user_factors(spark, SF).toPandas()
    assert (out["det"] > 0).all()

    li = spark.read.parquet(f"{SF}/lineitem.parquet").selectExpr(
        "l_orderkey AS ok", "l_partkey AS p",
        "CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS r")
    o = spark.read.parquet(f"{SF}/orders.parquet").selectExpr(
        "o_orderkey AS ok", "o_custkey AS u")
    pdf = li.join(o, "ok").selectExpr(
        "u", "r", "p % 7 + 1 AS v1", "(p * 3) % 5 + 1 AS v2").toPandas()

    for u in sorted(pdf["u"].unique())[:5]:
        g = pdf[pdf["u"] == u]
        V = g[["v1", "v2"]].to_numpy(np.float64)
        r = g["r"].to_numpy(np.float64)
        M = V.T @ V + ALS_LAMBDA * np.eye(2)
        w = np.linalg.solve(M, V.T @ r)
        row = out[out["custkey"] == u].iloc[0]
        assert abs(row["w1"] - w[0]) < 1e-5
        assert abs(row["w2"] - w[1]) < 1e-5
        assert abs(row["pred_probe"] - (3 * w[0] + 2 * w[1])) < 1e-4


def test_ransac_matches_numpy_and_recovers_planted_line(spark):
    """Numpy replay of the full RANSAC program (selection, counting,
    packed argmin, refit) from the parquet event_ids, plus structure:
    the winning consensus must capture most of the inlier mass and its
    refit slope must sit near the planted y = 3x + 7, where a plain
    least-squares fit on ALL points is dragged away by the outliers."""
    from spark_shp.hashing import mix
    from spark_shp.queries_ml import (RANSAC_BIG, RANSAC_BKS, RANSAC_THR,
                                      q_ransac_line)
    rows = q_ransac_line(spark, SF).collect()
    out = {r["k"]: r for r in rows}

    e = pd.read_parquet(f"{SF}/events.parquet")
    eid = e["event_id"].to_numpy(dtype=np.int64)
    x = eid % 1024
    y = (3 * x + 7 + (mix(eid * 3 + 1).astype(np.int64) % 9) - 4
         + np.where(eid % 5 == 0,
                    2000 + (mix(eid * 3 + 2).astype(np.int64) % 3000), 0))
    # bucket-min selection
    sel = {}
    for b in set(RANSAC_BKS):
        m = (eid % 97) == b
        if m.any():
            j = np.argmin(np.where(m, eid, np.iinfo(np.int64).max))
            sel[b] = (int(x[j]), int(y[j]))
    expect = {}
    for k in range(8):
        (x1, y1), (x2, y2) = sel[RANSAC_BKS[2 * k]], sel[RANSAC_BKS[2 * k + 1]]
        dx, dy = x2 - x1, y2 - y1
        if dx < 0:
            dx, dy = -dx, -dy
        if dx == 0:
            continue
        inl = np.abs(dy * (x - x1) - dx * (y - y1)) <= RANSAC_THR * dx
        n = int(inl.sum())
        xs, ys = x[inl].astype(float), y[inl].astype(float)
        sx, sy = xs.sum(), ys.sum()
        sxx, sxy = (xs * xs).sum(), (xs * ys).sum()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        expect[k] = (dy, dx, n, slope, (sy - slope * sx) / n)
    assert set(out) == set(expect)
    bp = min((RANSAC_BIG - v[2]) * 16 + k for k, v in expect.items())
    for k, (dy, dx, n, slope, icpt) in expect.items():
        r = out[k]
        assert (r["dy"], r["dx"], r["n_inliers"]) == (dy, dx, n)
        best = (RANSAC_BIG - n) * 16 + k == bp
        assert r["is_best"] == int(best)
        if best:
            assert abs(r["slope"] - slope) < 1e-5
            assert abs(r["intercept"] - icpt) < 1e-5
            # planted structure: consensus captures most inliers...
            assert n > 0.5 * len(eid)
            assert abs(slope - 3.0) < 0.05
    # ...while ordinary least squares on ALL points is outlier-dragged:
    # the every-5th outliers are uniform in x, so they lift the OLS
    # INTERCEPT by ~0.2 * E[burst] =~ +700 while RANSAC's refit stays
    # at the planted +7
    xf, yf = x.astype(float), y.astype(float)
    ols_icpt = np.polyfit(xf, yf, 1)[1]
    assert ols_icpt > 300.0


def test_recsys_hitrate_matches_sequential_recommender(spark):
    """Dict-based python replay of the whole leave-last-out pipeline
    (holdout pick, train-only co-occurrence, top-8 neighbor prune,
    top-5 recommendation, hit accounting), plus structure: some but
    not all evaluated customers hit, and hit@5 >= hit@1."""
    from spark_shp.queries_ml import RECSYS_K, RECSYS_NBR, q_recsys_hitrate
    out = {r["segment"]: r for r in q_recsys_hitrate(spark, SF).collect()}

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    hold, train = {}, {}
    for c, g in m.groupby("o_custkey"):
        g = g.sort_values(["o_orderdate", "o_orderkey", "l_linenumber",
                           "l_partkey"], ascending=False)
        hp = int(g.iloc[0]["l_partkey"])
        hold[c] = hp
        tr = set(int(p) for p in g["l_partkey"]) - {hp}
        if tr:
            train[c] = tr
    cooc = {}
    for c, tr in train.items():
        for a in tr:
            for b in tr:
                if a != b:
                    cooc[(a, b)] = cooc.get((a, b), 0) + 1
    nbrs = {}
    for (a, b), n in cooc.items():
        nbrs.setdefault(a, []).append((-n, b))
    nbrs = {a: [(b, -mn) for mn, b in sorted(v)[:RECSYS_NBR]]
            for a, v in nbrs.items()}
    seg = dict(zip(cu["c_custkey"], cu["c_mktsegment"]))
    agg = {}
    for c, tr in train.items():
        score = {}
        for pitem in tr:
            for b, n in nbrs.get(pitem, []):
                score[b] = score.get(b, 0) + n
        cands = sorted(((s, cand) for cand, s in score.items()
                        if cand not in tr),
                       key=lambda t: (-t[0], t[1]))[:RECSYS_K]
        ranked = [cand for _, cand in cands]
        a = agg.setdefault(seg[c], [0, 0, 0])
        a[0] += 1
        a[1] += bool(ranked) and ranked[0] == hold[c]
        a[2] += hold[c] in ranked
    for sname, (n, h1, h5) in agg.items():
        r = out[sname]
        assert (r["n_customers"], r["hits_at_1"], r["hits_at_5"]) \
            == (n, h1, h5)
    tot5 = sum(r["hits_at_5"] for r in out.values())
    totn = sum(r["n_customers"] for r in out.values())
    tot1 = sum(r["hits_at_1"] for r in out.values())
    assert 0 < tot5 < totn and tot1 <= tot5


def test_als_full_loop_rmse_decreases(spark):
    """VERDICT r3 item 5: alternating the gated ridge half-step user↔item
    must drive training RMSE monotonically down over ≥3 alternations on a
    planted rank-2 matrix, and recover most of the planted structure."""
    import numpy as np
    from spark_shp import als

    # planted low-rank ratings: r = tu·ti with deterministic factors
    u = np.repeat(np.arange(120, dtype=np.int64), 40)
    i = np.tile(np.arange(40, dtype=np.int64), 120)
    tu = np.stack([(u % 7 + 1) / 7.0, (u % 5 + 1) / 5.0], axis=1)
    ti = np.stack([(i % 6 + 1) / 6.0, (i % 11 + 1) / 11.0], axis=1)
    r = (tu * ti).sum(axis=1)
    import pandas as pd
    inter = spark.createDataFrame(
        pd.DataFrame({"u": u, "i": i, "r": r}))

    rmses = []
    items = als.init_factors(
        inter.selectExpr("CAST(u AS BIGINT) u", "CAST(i AS BIGINT) i",
                         "CAST(r AS DOUBLE) r"), "i", 2).localCheckpoint()
    inter2 = inter.selectExpr("CAST(u AS BIGINT) u", "CAST(i AS BIGINT) i",
                              "CAST(r AS DOUBLE) r")
    users = None
    for _ in range(4):
        users = als.als_half_step(inter2, items, "u", "i", 2, 0.05,
                                  broadcast_fixed=True).localCheckpoint()
        items = als.als_half_step(inter2, users, "i", "u", 2,
                                  0.05).localCheckpoint()
        rmses.append(als.als_rmse(inter2, users, items, 2))
    # monotone decrease over the alternations, and real convergence
    assert all(b <= a + 1e-12 for a, b in zip(rmses, rmses[1:])), rmses
    # iteration 1 already lands near the planted solution on an exactly
    # rank-2 matrix; the loop must still halve the residual and end tiny
    assert rmses[-1] < 0.5 * rmses[0]
    assert rmses[-1] < 0.05


def test_als_train_wrapper_matches_manual_loop(spark):
    """als_train is exactly the manual alternation (same init, same
    order), so its outputs must reproduce the loop's RMSE."""
    import numpy as np
    import pandas as pd
    from spark_shp import als

    u = np.repeat(np.arange(30, dtype=np.int64), 12)
    i = np.tile(np.arange(12, dtype=np.int64), 30)
    r = ((u % 4 + 1) * (i % 3 + 1) / 12.0)
    inter = spark.createDataFrame(pd.DataFrame({"u": u, "i": i, "r": r}))
    users, items = als.als_train(inter, rank=2, iters=2, lam=0.05)
    rmse = als.als_rmse(
        inter.selectExpr("CAST(u AS BIGINT) u", "CAST(i AS BIGINT) i",
                         "CAST(r AS DOUBLE) r"), users, items, 2)
    assert rmse < 0.2
    assert users.count() == 30 and items.count() == 12


def test_isolation_grid_matches_python_replay(spark):
    """Random-partition forest replicated sequentially (dict leaf
    counting over the same folded cut literals) — the top-K most
    isolated orders and their occupancy sums must match exactly, and
    the winner must be rarer than the median point by construction."""
    from collections import Counter

    from spark_shp.queries_ml import (ISO_DEPTH, ISO_TOPK, ISO_TREES,
                                      _iso_cuts,
                                      q_isolation_grid_anomalies)

    SF = "/root/testdata/sf0.001"
    got = [(r["orderkey"], r["iso_q"])
           for r in q_isolation_grid_anomalies(spark, SF).collect()]
    rows = (spark.read.parquet(f"{SF}/orders.parquet")
            .selectExpr("o_orderkey AS ok",
                        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
                        " AS x1",
                        "CAST(datediff(o_orderdate, DATE'1970-01-01') "
                        "AS BIGINT) AS x2").collect())
    x1 = [r["x1"] for r in rows]
    x2 = [r["x2"] for r in rows]
    mn1, mx1 = float(min(x1)), float(max(x1))
    mn2, mx2 = float(min(x2)), float(max(x2))
    dims, fracs = _iso_cuts()
    leaves = {}
    for r in rows:
        ids = []
        for t in range(ISO_TREES):
            leaf = 0
            for lvl in range(ISO_DEPTH):
                if int(dims[t, lvl]) == 0:
                    thr = mn1 + float(fracs[t, lvl]) * (mx1 - mn1)
                    hit = float(r["x1"]) > thr
                else:
                    thr = mn2 + float(fracs[t, lvl]) * (mx2 - mn2)
                    hit = float(r["x2"]) > thr
                if hit:
                    leaf += 1 << lvl
            ids.append((t, leaf))
        leaves[r["ok"]] = ids
    occ = Counter(c for ids in leaves.values() for c in ids)
    score = {ok: sum(occ[c] for c in ids) for ok, ids in leaves.items()}
    want = sorted(score.items(), key=lambda t: (t[1], t[0]))[:ISO_TOPK]
    assert got == want
    med = sorted(score.values())[len(score) // 2]
    assert got[0][1] < med               # winner genuinely isolated


def test_plan_shapes_of_round4_ml_ops(spark):
    """VERDICT r4 item 8 — explain-based pins for the round-4 ML ops
    (the tile_pyramid/mining pins caught two real scan replays in r3):

    * betweenness_roads: every BFS/sigma/delta round is localCheckpoint-
      truncated, so the FINAL plan must be just the node rollup + top-k —
      one hash exchange, a TakeOrderedAndProject, no Python nodes.
    * isolation_grid_anomalies: pure codegen SQL — exactly its two
      grouping exchanges, zero sorts, zero Python nodes.
    * als_half_step(broadcast): the fixed side must broadcast (never a
      fact-fact shuffle join), the moment rollup is ONE map-side-
      combinable groupBy, and the only Python is the Arrow-batched
      solver — no row-at-a-time BatchEvalPython anywhere.
    """
    from pyspark.sql import functions as F
    from spark_shp import als
    from spark_shp.queries_ml import q_isolation_grid_anomalies
    from spark_shp.queries_patterns import q_betweenness_roads

    bt = q_betweenness_roads(spark, SF)
    p = bt._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange hashpartitioning") <= 1
    assert "TakeOrderedAndProject" in p        # top-k, never a full sort

    iso = q_isolation_grid_anomalies(spark, SF)
    p = iso._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange hashpartitioning") <= 2
    assert p.count("Sort ") == 0

    ev = spark.read.parquet(f"{SF}/events.parquet")
    inter = ev.selectExpr("CAST(user_id AS BIGINT) AS u",
                          "CAST(event_id % 50 AS BIGINT) AS i",
                          "CAST(value AS DOUBLE) AS r")
    items = als.init_factors(inter, "i", 2)
    half = als.als_half_step(inter, items, "u", "i", 2, 0.1,
                             broadcast_fixed=True)
    p = half._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p            # small side broadcast
    assert "BatchEvalPython" not in p          # Arrow solver only
    assert "MapInPandas" in p
    assert p.count("Exchange hashpartitioning") <= 2
