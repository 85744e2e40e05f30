"""Hot-cluster SemDeDup bench (VERDICT r4 item 4 evidence).

The uncapped prune's n²/k bound collapses when one LSH cell captures a
large corpus fraction: the pair matrix of a single applyInPandas group is
O(n_hot²) in BOTH time and memory, concentrated in ONE task (a straggler
at any cluster size). `semantic_dedup_capped` splits oversized cells
before the prune shuffle, so per-task work is ≤ cap².

Scenario: N_TOTAL vectors with ~30% concentrated in one base cell (the
pytest's construction at volume), run through (a) the uncapped prune over
base cells and (b) the capped variant. Records wall time, the largest
prune group each path actually executed, and the survivor conservation
check between the two paths (splits may merge-miss some near-dup pairs —
the documented recall tradeoff — but totals must conserve).

Usage: python tools/bench_semdedup.py   # writes BENCH/SEMDEDUP_CAP.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TOTAL = int(os.environ.get("SEMDEDUP_BENCH_N", "120000"))
HOT_FRAC = 0.3
CAP = 256


def main():
    import pandas as pd

    from spark_shp.hashing import u01
    from spark_shp.queries_text import (SEMDEDUP_PLANES, SEMDEDUP_SEED,
                                        _sd_prune, _sd_prune_out_schema,
                                        _sd_quantized,
                                        semantic_dedup_capped)
    from spark_shp.session import get_spark

    spark = get_spark("semdedup_bench", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic corpus: ~30% rejection-sampled into one base cell
    rng = np.random.default_rng(99)
    jj, ii = np.meshgrid(np.arange(SEMDEDUP_PLANES, dtype=np.int64),
                         np.arange(64, dtype=np.int64), indexing="ij")
    planes = np.rint((u01((SEMDEDUP_SEED + jj) * 64 + ii) - 0.5)
                     * 1000.0).astype(np.int64)
    w = 1 << np.arange(SEMDEDUP_PLANES, dtype=np.int64)

    def cells(v):
        q = np.rint(v * 1000.0).astype(np.int64)
        return (q @ planes.T >= 0).astype(np.int64) @ w

    mu = rng.normal(0, 1, 64)
    mu /= np.linalg.norm(mu)
    target = int(cells(mu[None])[0])
    n_hot = int(N_TOTAL * HOT_FRAC)
    hot = np.empty((0, 64))
    while len(hot) < n_hot:
        cand = mu[None] + rng.normal(0, 0.25, (2 * n_hot, 64))
        cand = cand[cells(cand) == target]
        hot = np.concatenate([hot, cand])[:n_hot]
    cold = rng.normal(0, 1, (N_TOTAL - n_hot, 64))
    v = np.concatenate([hot, cold])
    vids = np.arange(N_TOTAL, dtype=np.int64)
    emb_df = spark.createDataFrame(
        pd.DataFrame({"vec_id": vids, "embedding": list(v)}),
        "vec_id long, embedding array<double>").repartition(32).cache()
    emb_df.count()

    results = {"n_total": N_TOTAL, "hot_cell_members": n_hot, "cap": CAP}

    # (a) UNCAPPED: base-cell prune only (the q_semantic_dedup shape)
    qdf = _sd_quantized(spark, None, emb_df)
    bc = spark.sparkContext.broadcast(planes)
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("cid", T.LongType()),
        T.StructField("q", T.ArrayType(T.ShortType())),
    ])

    def assign(batches):
        pl = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(np.int64),
                "cid": ((q @ pl.T >= 0).astype(np.int64) @ w),
                "q": pdf["q"]})

    t0 = time.time()
    un = (qdf.mapInPandas(assign, schema).groupBy("cid")
          .applyInPandas(_sd_prune, _sd_prune_out_schema()).collect())
    t_uncapped = time.time() - t0
    results["uncapped"] = {
        "sec": round(t_uncapped, 2),
        "max_prune_group": int(max(r["n_members"] for r in un)),
        "n_groups": len(un),
        "total_members": int(sum(r["n_members"] for r in un)),
        "total_removed": int(sum(r["n_removed"] for r in un)),
    }
    print(f"# uncapped: {t_uncapped:.1f}s, max group "
          f"{results['uncapped']['max_prune_group']}", flush=True)

    # (b) CAPPED
    t0 = time.time()
    cp = semantic_dedup_capped(spark, None, cap=CAP,
                               emb_df=emb_df).collect()
    t_capped = time.time() - t0
    results["capped"] = {
        "sec": round(t_capped, 2),
        "max_prune_group": int(max(r["n_members"] for r in cp)),
        "n_groups": len(cp),
        "total_members": int(sum(r["n_members"] for r in cp)),
        "total_removed": int(sum(r["n_removed"] for r in cp)),
    }
    results["speedup"] = round(t_uncapped / t_capped, 2)
    results["conservation_ok"] = (
        results["capped"]["total_members"] == N_TOTAL
        and results["uncapped"]["total_members"] == N_TOTAL)
    print(f"# capped: {t_capped:.1f}s, max group "
          f"{results['capped']['max_prune_group']} "
          f"(speedup {results['speedup']}x)", flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "SEMDEDUP_CAP.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
