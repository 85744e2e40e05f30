"""Full alternating-least-squares matrix factorization (VERDICT r3 item 5
— the driver-loop completion of the gated ``als_user_factors`` half-step,
per the kmeans_rounds precedent: driver state is two tiny plan handles,
never data).

Scale shape per half-step: ONE equi-join of the interaction table with the
fixed-side factor table (broadcast when small) and ONE map-side-combinable
groupBy producing the k(k+1)/2 + k normal-equation moment columns as plain
SUMs — all codegen, no explode, no per-group Python.  The per-id k×k ridge
solve then runs as a vectorized ``np.linalg.solve`` over whole Arrow
batches in ``mapInPandas`` (one BLAS call per batch, NOT per user).  Factor
tables localCheckpoint each alternation so plan depth stays O(1) over any
number of iterations.

Reference anchor: the relational half-step is gated as ``als_user_factors``
(queries_ml.py); this module alternates exactly that shape user↔item.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def _factor_schema(id_col: str, rank: int) -> T.StructType:
    return T.StructType(
        [T.StructField(id_col, T.LongType())]
        + [T.StructField(f"f{a}", T.DoubleType()) for a in range(rank)])


def init_factors(inter: DataFrame, id_col: str, rank: int) -> DataFrame:
    """Deterministic hash-based init in (0, 1] — no RNG (replayable), and
    distinct ids only (one distinct shuffle, once)."""
    exprs = [id_col] + [
        f"(({id_col} * {2 * a + 3} + {a + 1}) % 97 + 1) / 97.0 AS f{a}"
        for a in range(rank)]
    return inter.select(id_col).distinct().selectExpr(*exprs)


def als_half_step(inter: DataFrame, fixed: DataFrame, solve_col: str,
                  fixed_col: str, rank: int, lam: float,
                  broadcast_fixed: bool = False) -> DataFrame:
    """Solve one side with the other held fixed: per solve_col id,
    w = (Σ f fᵀ + λI)⁻¹ Σ r·f from the joined interactions.

    inter: (u, i, r) rows; fixed: (fixed_col, f0..f{rank-1})."""
    rhs = F.broadcast(fixed) if broadcast_fixed else fixed
    j = inter.join(rhs, fixed_col)
    aggs = [F.count(F.lit(1)).alias("n")]
    for a in range(rank):
        for b in range(a, rank):
            aggs.append(F.expr(f"SUM(f{a} * f{b})").alias(f"m{a}{b}"))
    for a in range(rank):
        aggs.append(F.expr(f"SUM(r * f{a})").alias(f"b{a}"))
    m = j.groupBy(solve_col).agg(*aggs)
    schema = _factor_schema(solve_col, rank)

    def solve(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            n = len(pdf)
            A = np.zeros((n, rank, rank))
            for a in range(rank):
                for b in range(a, rank):
                    A[:, a, b] = A[:, b, a] = pdf[f"m{a}{b}"].to_numpy()
                A[:, a, a] += lam
            B = np.stack([pdf[f"b{a}"].to_numpy() for a in range(rank)],
                         axis=1)
            W = np.linalg.solve(A, B)        # one batched LAPACK call
            out = {solve_col: pdf[solve_col].to_numpy()}
            for a in range(rank):
                out[f"f{a}"] = W[:, a]
            yield pd.DataFrame(out)

    return m.mapInPandas(solve, schema)


def als_train(inter: DataFrame, rank: int = 2, iters: int = 3,
              lam: float = 0.1,
              broadcast_items: bool = False) -> tuple[DataFrame, DataFrame]:
    """Full ALS loop: init item factors, then alternate user-solve /
    item-solve ``iters`` times.  Returns (user_factors, item_factors).

    inter must have columns (u: long, i: long, r: double-coercible)."""
    inter = inter.selectExpr("CAST(u AS BIGINT) AS u",
                             "CAST(i AS BIGINT) AS i",
                             "CAST(r AS DOUBLE) AS r")
    items = init_factors(inter, "i", rank).localCheckpoint()
    users = None
    for _ in range(iters):
        users = als_half_step(inter, items, "u", "i", rank, lam,
                              broadcast_fixed=broadcast_items
                              ).localCheckpoint()
        items = als_half_step(inter, users, "i", "u", rank, lam
                              ).localCheckpoint()
    return users, items


def als_rmse(inter: DataFrame, users: DataFrame,
             items: DataFrame, rank: int) -> float:
    """Training RMSE of Σ f_u·f_i against r — two joins, one agg."""
    uf = users.selectExpr("u", *[f"f{a} AS uf{a}" for a in range(rank)])
    itf = items.selectExpr("i", *[f"f{a} AS if{a}" for a in range(rank)])
    pred = " + ".join(f"uf{a} * if{a}" for a in range(rank))
    j = (inter.join(uf, "u").join(itf, "i")
         .selectExpr(f"POWER(r - ({pred}), 2) AS se"))
    return float(j.agg(F.sqrt(F.avg("se"))).first()[0])
