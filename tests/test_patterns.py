"""Independent (non-oracle) checks for the queries_patterns batch:
brute-force / reference-implementation cross-checks so a same-bug-both-
engines failure mode in the shared SQL can't hide behind the differential.
"""

import duckdb
import numpy as np

from spark_shp import cells, fixtures
from spark_shp.hashing import mix, u01
from spark_shp.queries_patterns import (
    CONVOY_LVL, CONVOY_MIN_RUN, CONVOY_SAMPLE_MOD, CONVOY_WIN_US,
    DP_DAY_US, SSSP_EDGE_FACTOR, SSSP_ROUNDS, q_convoy_pairs,
    q_dp_noisy_counts, q_sssp_roads)

SF = "/root/testdata/sf0.001"


def _events_np(sf=SF):
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, user_id, epoch_us(ts) AS us, event_type "
        f"FROM '{sf}/events.parquet'").fetchnumpy()


def test_convoy_pairs_matches_bruteforce():
    """Pure-python convoy mining: sets of co-located windows per pair,
    consecutive runs by literal integer scanning — no SQL windows, no
    gaps-and-islands trick. Runs at sf0.01 (15 sampled users): sf0.001's
    1-2 sampled users make the result vacuously empty."""
    sf = "/root/testdata/sf0.01"
    ev = _events_np(sf)
    eid = ev["event_id"].astype(np.int64)
    lon = u01(eid) * 360.0 - 180.0
    lat = u01(eid * 2 + 1) * 170.0 - 85.0
    cell = cells.cell_encode(lon, lat, CONVOY_LVL)
    win = ev["us"].astype(np.int64) // CONVOY_WIN_US
    uid = ev["user_id"].astype(np.int64)
    keep = uid % CONVOY_SAMPLE_MOD == 0
    presence = set(zip(uid[keep].tolist(), win[keep].tolist(),
                       cell[keep].tolist()))
    users = sorted({u for u, _, _ in presence})
    by_user = {u: {(w, c) for uu, w, c in presence if uu == u}
               for u in users}
    expected = {}
    for i, a in enumerate(users):
        for b in users[i + 1:]:
            wins = sorted({w for (w, c) in by_user[a]
                           if (w, c) in by_user[b]})
            if not wins:
                continue
            best, run = 1, 1
            for prev, cur in zip(wins, wins[1:]):
                run = run + 1 if cur == prev + 1 else 1
                best = max(best, run)
            if best >= CONVOY_MIN_RUN:
                expected[(a, b)] = (best, len(wins), wins[0])
    import tests.conftest  # noqa: F401  (fixture import order)
    from spark_shp.session import get_spark
    spark = get_spark(app="t_convoy", cpus=8)
    got = {(r.user_a, r.user_b): (r.max_run, r.n_windows, r.first_win)
           for r in q_convoy_pairs(spark, sf).collect()}
    assert got == expected
    assert len(got) > 0  # the gate must not be vacuously green


def test_sssp_matches_hoplimited_bellman_ford_dict():
    """Brute-force DP over (hops, node) with a python dict — no joins,
    no vectorization — must equal the Spark round-loop exactly."""
    con = duckdb.connect()
    v = con.execute(f"SELECT COUNT(DISTINCT user_id) "
                    f"FROM '{SF}/events.parquet'").fetchone()[0]
    edges = []
    for i in range(v - 1):
        edges.append((i, i + 1, 1 + int(mix(i * 7 + 3)) % 9))
    for j in range(SSSP_EDGE_FACTOR * v):
        s = int(mix(j * 3 + 11)) % v
        d = int(mix(j * 3 + 12)) % v
        if s != d:
            edges.append((s, d, 1 + int(mix(j * 3 + 13)) % 99))
    dist = {0: 0}
    for _ in range(SSSP_ROUNDS):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nxt.get(d, 1 << 60):
                nxt[d] = dist[s] + w
        dist = nxt
    from spark_shp.session import get_spark
    spark = get_spark(app="t_sssp", cpus=8)
    got = {r.node: r.dist for r in q_sssp_roads(spark, SF).collect()}
    assert got == dist
    # sanity: the backbone guarantees node 1 is reachable with weight <= 9
    assert got[1] <= 9


def test_dp_noise_is_exact_discrete_laplace_and_unbiased_shape():
    """Recompute the released values in pure numpy (geometric sample by
    literal bit-bucket search, not the SQL CASE) and check the noise
    distribution is the two-sided geometric the mechanism promises."""
    ev = _events_np()
    us = ev["us"].astype(np.int64)
    day = us // DP_DAY_US
    tcode = np.array([{"click": 0, "error": 1, "purchase": 2,
                       "signup": 3, "view": 4}.get(t, 5)
                      for t in ev["event_type"]])
    keys = {}
    for d, t in zip(day.tolist(), tcode.tolist()):
        keys[(d, t)] = keys.get((d, t), 0) + 1

    def geom(u32: int) -> int:
        # literal search: G = m iff u32 in [2^32-2^(32-m), 2^32-2^(32-m-1))
        for m in range(32):
            if m == 31 or u32 < (1 << 32) - (1 << (32 - m - 1)):
                return m
        raise AssertionError

    expected = {}
    for (d, t), n in keys.items():
        k = d * 8 + t
        noise = geom(int(mix(k * 2 + 1))) - geom(int(mix(k * 2 + 2)))
        expected[(d, t)] = n + noise
    from spark_shp.session import get_spark
    spark = get_spark(app="t_dp", cpus=8)
    rows = q_dp_noisy_counts(spark, SF).collect()
    code = {"click": 0, "error": 1, "purchase": 2, "signup": 3, "view": 4}
    got = {(r.day, code[r.event_type]): r.n_noisy for r in rows}
    assert got == expected
    # distribution sanity on a large key sweep: P(G=0) = 1/2, mean(G) = 1
    g = np.array([geom(int(mix(i))) for i in range(20000)])
    assert abs((g == 0).mean() - 0.5) < 0.02
    assert abs(g.mean() - 1.0) < 0.05


def test_alignment_matches_classic_dp():
    """Classic textbook DTW / discrete-Fréchet DP (numpy, row-by-row — no
    anti-diagonal staging, no SQL) over the same blocked pairs."""
    from spark_shp.queries_patterns import (
        ALIGN_BLOCK_LVL, ALIGN_LEN, ALIGN_LVL, ALIGN_SAMPLE_MOD,
        q_trajectory_alignment)
    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_id, epoch_us(ts) AS us "
        f"FROM '{sf}/events.parquet' "
        f"WHERE user_id % {ALIGN_SAMPLE_MOD} = 0").fetchnumpy()
    eid = rows["event_id"].astype(np.int64)
    lon = u01(eid) * 360.0 - 180.0
    lat = u01(eid * 2 + 1) * 170.0 - 85.0
    n = 1 << ALIGN_LVL
    ix = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1)
    iy = np.clip(np.floor((lat + 85.0) / 170.0 * n), 0, n - 1)
    traj = {}
    order = np.lexsort((eid, rows["us"].astype(np.int64),
                        rows["user_id"].astype(np.int64)))
    for k in order:
        u = int(rows["user_id"][k])
        traj.setdefault(u, [])
        if len(traj[u]) < ALIGN_LEN:
            traj[u].append((int(ix[k]), int(iy[k])))
    traj = {u: p for u, p in traj.items() if len(p) == ALIGN_LEN}

    def dp(pa, pb):
        L = ALIGN_LEN
        c = np.array([[abs(pa[i][0] - pb[j][0]) + abs(pa[i][1] - pb[j][1])
                       for j in range(L)] for i in range(L)], dtype=np.int64)
        D = np.zeros((L, L), dtype=np.int64)
        Fm = np.zeros((L, L), dtype=np.int64)
        for i in range(L):
            for j in range(L):
                if i == 0 and j == 0:
                    D[0, 0] = c[0, 0]; Fm[0, 0] = c[0, 0]
                elif i == 0:
                    D[i, j] = D[i, j - 1] + c[i, j]
                    Fm[i, j] = max(Fm[i, j - 1], c[i, j])
                elif j == 0:
                    D[i, j] = D[i - 1, j] + c[i, j]
                    Fm[i, j] = max(Fm[i - 1, j], c[i, j])
                else:
                    D[i, j] = c[i, j] + min(D[i - 1, j], D[i, j - 1],
                                            D[i - 1, j - 1])
                    Fm[i, j] = max(c[i, j], min(Fm[i - 1, j], Fm[i, j - 1],
                                                Fm[i - 1, j - 1]))
        return int(D[-1, -1]), int(Fm[-1, -1])

    shift = 1 << (ALIGN_LVL - ALIGN_BLOCK_LVL)
    blk = {u: (p[0][0] // shift) * 2 + p[0][1] // shift
           for u, p in traj.items()}
    expected = {}
    us = sorted(traj)
    for i, a in enumerate(us):
        for b in us[i + 1:]:
            if blk[a] == blk[b]:
                expected[(a, b)] = dp(traj[a], traj[b])
    from spark_shp.session import get_spark
    spark = get_spark(app="t_align", cpus=8)
    got = {(r.user_a, r.user_b): (r.dtw, r.frechet)
           for r in q_trajectory_alignment(spark, sf).collect()}
    assert got == expected
    assert len(got) > 0


def test_betweenness_matches_sequential_brandes(spark):
    """Sampled-source Brandes replicated sequentially in python (dict
    BFS per source, level lists, integer-quantized dependency with the
    same per-term floor division) — the distributed top-K must match
    exactly, and the quantized estimate must rank a true high-traffic
    node first."""
    from collections import defaultdict

    from spark_shp.queries_patterns import (BC_ROUNDS, BC_SCALE,
                                            BC_SOURCES, BC_TOPK,
                                            SSSP_EDGE_FACTOR,
                                            q_betweenness_roads)

    got = [(r["node"], r["bc_q"], r["n_sources"])
           for r in q_betweenness_roads(spark, SF).collect()]

    v = (spark.read.parquet(f"{SF}/events.parquet")
         .selectExpr("user_id").distinct().count())
    edges = set()
    for i in range(v - 1):
        edges.add((i, i + 1))
    for j in range(SSSP_EDGE_FACTOR * v):
        s = mix(j * 3 + 11) % v
        d = mix(j * 3 + 12) % v
        if s != d:
            edges.add((s, d))
    adj = defaultdict(list)
    radj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
        radj[d].append(s)

    acc = defaultdict(lambda: [0, 0])
    for k in range(BC_SOURCES):
        src = mix(k * 5 + 17) % v
        dist = {src: 0}
        frontier = [src]
        levels = [[src]]
        for lvl in range(1, BC_ROUNDS + 1):
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = lvl
                        nxt.append(w)
            levels.append(nxt)
            frontier = nxt
        sigma = {src: 1}
        for lvl in range(1, BC_ROUNDS + 1):
            for w in levels[lvl]:
                sigma[w] = sum(sigma[u] for u in radj[w]
                               if dist.get(u) == lvl - 1)
        delta = {n: 0 for n in dist}
        for lvl in range(BC_ROUNDS - 1, -1, -1):
            for vtx in levels[lvl]:
                delta[vtx] += sum(
                    (sigma[vtx] * (BC_SCALE + delta[w])) // sigma[w]
                    for w in adj[vtx] if dist.get(w) == lvl + 1)
        for n, d in dist.items():
            if d > 0:
                acc[n][0] += delta[n]
                acc[n][1] += 1
    want = sorted(((n, dq, ns) for n, (dq, ns) in acc.items()),
                  key=lambda t: (-t[1], t[0]))[:BC_TOPK]
    assert got == want
    assert got[0][1] > BC_SCALE          # a genuinely central node exists
