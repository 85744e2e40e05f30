"""Distributed k-means + IVF index/search over an embedding column
(SURVEY.md LLM-pipeline ANN family; VERDICT r2 next-step #7).

The oracle-gated ``ann_ivf_search`` query keeps its deterministic
stand-in coarse quantizer (integer math DuckDB can replay); this module is
the production path behind the same interface: Lloyd k-means whose
per-iteration driver state is ONE (k, d) float64 matrix regardless of
corpus size, then nearest-centroid assignment and nprobe search as single
Arrow passes against the broadcast centroid matrix.

Scale shape at 10^12 rows: every iteration is one map pass emitting ≤
k rows per Arrow batch (partial sums), folded by a k-row groupBy — no
driver-proportional collect anywhere; assignment/search shuffle the corpus
once, keyed by centroid id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.window import Window as W


def _dists2(v: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Squared L2 (n, k) without the (n, k, d) broadcast intermediate."""
    return ((v * v).sum(axis=1)[:, None] - 2.0 * (v @ c.T)
            + (c * c).sum(axis=1)[None, :])


def kmeans_centroids(emb: DataFrame, k: int = 16, iters: int = 4,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> np.ndarray:
    """Distributed Lloyd k-means → (k, d) float64 centroid matrix.

    Deterministic: seeds are the k smallest ``id_col`` rows (a distributed
    top-k, not a full collect); ties inside an iteration go to the smaller
    centroid index; a cluster that receives no points keeps its previous
    centroid. Each iteration reads the corpus once."""
    spark = emb.sparkSession
    seeds = (emb.orderBy(id_col).limit(k)
             .select(id_col, vec_col).collect())
    seeds.sort(key=lambda r: r[0])
    cents = np.array([list(r[1]) for r in seeds], dtype=np.float64)
    d = cents.shape[1]
    part_schema = T.StructType([
        T.StructField("cid", T.IntegerType()),
        T.StructField("n", T.LongType()),
        T.StructField("vsum", T.ArrayType(T.DoubleType())),
    ])

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cents)

        def partials(batches):
            c = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                a = _dists2(v, c).argmin(axis=1)   # ties → smaller index
                out = []
                for cid in np.unique(a):
                    m = a == cid
                    out.append((int(cid), int(m.sum()),
                                v[m].sum(axis=0).tolist()))
                yield pd.DataFrame(out, columns=["cid", "n", "vsum"])

        folded = (emb.select(vec_col).mapInPandas(partials, part_schema)
                  .groupBy("cid")
                  .agg(F.sum("n").alias("n"),
                       *[F.sum(F.element_at("vsum", i + 1)).alias(f"s{i}")
                         for i in range(d)])
                  .collect())                       # ≤ k rows
        nxt = cents.copy()                          # empty cluster → keep
        for r in folded:
            nxt[r["cid"]] = np.array([r[f"s{i}"] for i in range(d)]) / r["n"]
        cents = nxt
    return cents


def ivf_assign(emb: DataFrame, cents: np.ndarray,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Corpus → (id, vec, cid): one Arrow pass against the broadcast
    centroid matrix. Downstream joins/searches key on ``cid``."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(cents)
    schema = T.StructType(list(emb.select(id_col, vec_col).schema)
                          + [T.StructField("cid", T.IntegerType())])

    def assign(batches):
        c = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            pdf = pdf.copy()
            pdf["cid"] = _dists2(v, c).argmin(axis=1).astype(np.int32)
            yield pdf

    return emb.select(id_col, vec_col).mapInPandas(assign, schema)


def ivf_search(indexed: DataFrame, queries: np.ndarray, qids: np.ndarray,
               cents: np.ndarray, nprobe: int = 2, topk: int = 10,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """nprobe IVF search: each query scans only its ``nprobe`` nearest
    inverted lists; per-batch partial top-k keeps the shuffle tiny
    (≤ n_queries × topk rows per batch). Returns (qid, nid, dot, rank).

    ``queries``/``qids`` are a BOUNDED query set (the cosine_topk pattern:
    never corpus-proportional); cosine ranking via dot product — pass
    L2-normalized vectors for true cosine."""
    spark = indexed.sparkSession
    probe = np.argsort(_dists2(queries.astype(np.float64), cents),
                       axis=1, kind="stable")[:, :nprobe]   # (nq, nprobe)
    probe_map: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in probe[qi]:
            probe_map.setdefault(int(c), []).append(qi)
    bc = spark.sparkContext.broadcast((queries.astype(np.float64),
                                       qids.astype(np.int64), probe_map,
                                       topk))
    schema = T.StructType([
        T.StructField("qid", T.LongType()),
        T.StructField("nid", T.LongType()),
        T.StructField("dot", T.DoubleType()),
    ])

    def search(batches):
        qmat, qids_, pmap, k_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            out_q, out_n, out_d = [], [], []
            for cid, grp in pdf.groupby("cid"):
                qlist = pmap.get(int(cid))
                if not qlist:
                    continue
                v = np.stack(grp[vec_col].to_numpy()).astype(np.float64)
                nid = grp[id_col].to_numpy(dtype=np.int64)
                dots = v @ qmat[qlist].T            # (m, len(qlist))
                for j, qi in enumerate(qlist):
                    keep = nid != qids_[qi]         # exclude self
                    dj, nj = dots[keep, j], nid[keep]
                    if len(dj) > k_:                # per-batch partial top-k
                        top = np.argpartition(-dj, k_ - 1)[:k_]
                        dj, nj = dj[top], nj[top]
                    out_q.extend([int(qids_[qi])] * len(nj))
                    out_n.extend(nj.tolist())
                    out_d.extend(dj.tolist())
            yield pd.DataFrame({"qid": out_q, "nid": out_n, "dot": out_d})

    hits = (indexed.repartition("cid")    # co-locate each inverted list
            .mapInPandas(search, schema))
    w = W.partitionBy("qid").orderBy(F.col("dot").desc(),
                                     F.col("nid").asc())
    return (hits.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= topk))


# --- IVF-PQ: product-quantized ADC search (the 10^12-scale memory path) ------
#
# At 10^12 vectors the float corpus cannot be held or scanned; product
# quantization stores each vector as m uint8 sub-codes (d·4 bytes →
# m bytes, 16-32x), and asymmetric-distance (ADC) search scans only the
# codes: per query, one (m, ksub) table of exact query-to-centroid
# sub-distances, then each candidate's distance is m table lookups.
# Training state on the driver is one (m, ksub, d/m) codebook tensor —
# never corpus-proportional; encode is one Arrow map pass; search reuses
# the IVF inverted-list routing (repartition by cid, nprobe lists only).


def pq_train(emb: DataFrame, m: int = 4, ksub: int = 16, iters: int = 8,
             sample: int = 4096, id_col: str = "vec_id",
             vec_col: str = "embedding") -> np.ndarray:
    """→ (m, ksub, dsub) float64 codebooks via per-subspace Lloyd on a
    BOUNDED deterministic sample (the ``sample`` smallest ids — PQ
    codebooks are classically trained on a fixed-size sample; the bound
    is a parameter, never corpus-proportional)."""
    rows = (emb.orderBy(id_col).limit(sample)
            .select(vec_col).collect())            # ≤ `sample` rows
    v = np.array([list(r[0]) for r in rows], dtype=np.float64)
    n, d = v.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.zeros((m, ksub, dsub))
    for s in range(m):
        sub = v[:, s * dsub:(s + 1) * dsub]
        cents = sub[:ksub].copy()                  # deterministic seeds
        for _ in range(iters):
            a = _dists2(sub, cents).argmin(axis=1)
            for c in range(ksub):
                pts = sub[a == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        books[s] = cents
    return books


def pq_encode(indexed: DataFrame, books: np.ndarray,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, vec, cid) → (id, cid, code: array<int> of length m): one
    Arrow pass against the broadcast codebooks. The float vector is
    DROPPED — downstream search touches only the m-byte codes."""
    spark = indexed.sparkSession
    bc = spark.sparkContext.broadcast(books)
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("cid", T.IntegerType()),
        T.StructField("code", T.ArrayType(T.IntegerType())),
    ])

    def enc(batches):
        bks = bc.value
        m, _, dsub = bks.shape
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.zeros((len(v), m), dtype=np.int32)
            for s in range(m):
                codes[:, s] = _dists2(
                    v[:, s * dsub:(s + 1) * dsub], bks[s]).argmin(axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(np.int64),
                "cid": pdf["cid"].to_numpy(np.int32),
                "code": list(codes)})

    return indexed.select(id_col, vec_col, "cid").mapInPandas(enc, schema)


def ivfpq_search(codes: DataFrame, queries: np.ndarray, qids: np.ndarray,
                 cents: np.ndarray, books: np.ndarray, nprobe: int = 2,
                 topk: int = 10, id_col: str = "vec_id") -> DataFrame:
    """ADC search over PQ codes: per (query, probed list), distance =
    Σ_s table[s, code_s] from the per-query (m, ksub) lookup table —
    the corpus pass reads ONLY integer codes (the 10^12-scale property).
    Returns (qid, nid, adist, rank) with rank 1 = nearest (smallest
    approximate L2)."""
    spark = codes.sparkSession
    q = queries.astype(np.float64)
    m, ksub, dsub = books.shape
    # (nq, m, ksub) exact query-to-subcentroid squared distances
    tables = np.stack([
        _dists2(q[:, s * dsub:(s + 1) * dsub], books[s])
        for s in range(m)], axis=1)
    probe = np.argsort(_dists2(q, cents), axis=1,
                       kind="stable")[:, :nprobe]
    probe_map: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in probe[qi]:
            probe_map.setdefault(int(c), []).append(qi)
    bc = spark.sparkContext.broadcast(
        (tables, qids.astype(np.int64), probe_map, topk))
    schema = T.StructType([
        T.StructField("qid", T.LongType()),
        T.StructField("nid", T.LongType()),
        T.StructField("adist", T.DoubleType()),
    ])

    def search(batches):
        tabs, qids_, pmap, k_ = bc.value
        m_ = tabs.shape[1]
        for pdf in batches:
            if not len(pdf):
                continue
            out_q, out_n, out_d = [], [], []
            for cid, grp in pdf.groupby("cid"):
                qlist = pmap.get(int(cid))
                if not qlist:
                    continue
                cmat = np.stack(grp["code"].to_numpy()).astype(np.int64)
                nid = grp[id_col].to_numpy(dtype=np.int64)
                for qi in qlist:
                    t = tabs[qi]                   # (m, ksub)
                    dist = t[np.arange(m_), cmat].sum(axis=1)
                    keep = nid != qids_[qi]
                    dj, nj = dist[keep], nid[keep]
                    if len(dj) > k_:
                        top = np.argpartition(dj, k_ - 1)[:k_]
                        dj, nj = dj[top], nj[top]
                    out_q.extend([int(qids_[qi])] * len(nj))
                    out_n.extend(nj.tolist())
                    out_d.extend(dj.tolist())
            yield pd.DataFrame({"qid": out_q, "nid": out_n,
                                "adist": out_d})

    hits = codes.repartition("cid").mapInPandas(search, schema)
    w = W.partitionBy("qid").orderBy(F.col("adist").asc(),
                                     F.col("nid").asc())
    return (hits.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= topk))
