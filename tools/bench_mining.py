"""Scale evidence for the round-3 mining operators: run the EXACT gated
query code paths (same functions __spark_entry__ serves) against a
synthesized 100M-row events table + 100M-row orders table, and record
throughput. Synthesis uses the same hash-formula family as the fixtures so
the data shape (user cardinality, value range, time span) matches the gate
tables at 1000x the sf0.1 volume.

Methodology per the repo bench rules: fresh plan per trial (the query
functions rebuild it), spark.catalog.clearCache() before each timed trial
(the CacheManager matches canonicalized plans across DataFrame objects),
min over trials.

Usage: python tools/bench_mining.py [n_rows]  (default 100_000_000)
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_shp.hashing import mix_sql, u01_sql  # noqa: E402
from spark_shp.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
OUT = "/tmp/bench_mining_sf"
TRIALS = 2


def synthesize(spark):
    if os.path.isdir(os.path.join(OUT, "customer.parquet")):
        if not os.path.isdir(os.path.join(OUT, "documents.parquet")):
            _synthesize_documents(spark)
        return  # reuse within a session (same N by construction)
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    # events: 1M users, 100 pings each, world-wide points, 90-day span
    ev = spark.range(0, N, 1, 256).selectExpr(
        "id AS event_id",
        f"timestamp_micros(1700000000000000 + CAST(({u01_sql('id * 3 + 1')})"
        " * 7776000000000.0 AS BIGINT)) AS ts",
        f"({mix_sql('id')}) % 1000000 AS user_id",
        f"CASE ({mix_sql('id * 2 + 1')}) % 5 WHEN 0 THEN 'view' "
        "WHEN 1 THEN 'click' WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup' "
        "ELSE 'error' END AS event_type",
        f"{u01_sql('id * 5 + 2')} * 490.0 + 0.01 AS value",
        "'' AS props")
    ev.write.parquet(f"{OUT}/events.parquet")
    # orders: 1.5M customers
    od = spark.range(0, N, 1, 256).selectExpr(
        "id AS o_orderkey",
        f"({mix_sql('id * 7 + 3')}) % 1500000 AS o_custkey",
        f"CASE ({mix_sql('id * 11 + 4')}) % 2 WHEN 0 THEN 'O' ELSE 'F' END"
        " AS o_orderstatus",
        f"{u01_sql('id * 13 + 5')} * 400000.0 + 900.0 AS o_totalprice",
        f"timestamp_micros(1500000000000000 + CAST(({u01_sql('id * 17 + 6')})"
        " * 200000000000000.0 AS BIGINT)) AS o_orderdate",
        f"CASE ({mix_sql('id * 19 + 7')}) % 5 WHEN 0 THEN '1-URGENT' "
        "WHEN 1 THEN '2-HIGH' WHEN 2 THEN '3-MEDIUM' WHEN 3 THEN "
        "'4-NOT SPECIFIED' ELSE '5-LOW' END AS o_orderpriority")
    od.write.parquet(f"{OUT}/orders.parquet")
    # customers: the hierarchy/rollup input (implicit binary tree on key)
    cu = spark.range(0, N, 1, 256).selectExpr(
        "id AS c_custkey",
        f"{u01_sql('id * 23 + 8')} * 11000.0 - 1000.0 AS c_acctbal")
    cu.write.parquet(f"{OUT}/customer.parquet")
    _synthesize_documents(spark)


def _synthesize_documents(spark):
    # documents: N/10 docs x 10 tokens from a 1000-word vocab (the token
    # ops measure tokens/s; text shape matches the gate corpus's
    # space-separated lowercase words)
    words = " || ' ' || ".join(
        f"concat('w', ({mix_sql(f'id * 10 + {k}')}) % 1000)"
        for k in range(10))
    dc = spark.range(0, N // 10, 1, 256).selectExpr(
        "id AS doc_id", f"{words} AS text",
        f"CASE ({mix_sql('id * 31 + 9')}) % 5 WHEN 0 THEN 'en' "
        "WHEN 1 THEN 'de' WHEN 2 THEN 'fr' WHEN 3 THEN 'es' "
        "ELSE 'pt' END AS lang")
    dc.write.parquet(f"{OUT}/documents.parquet")


def main():
    from spark_shp.queries_mining import (
        q_anova_f, q_association_rules, q_changepoint_detect,
        q_chisq_independence, q_convex_hull_groups, q_kaplan_meier,
        q_ks_test, q_max_drawdown,
        q_nearest_seed_zones, q_theil_sen_slope, q_trajectory_crossings,
        q_tree_rollup,
        q_distribution_drift, q_event_lag_correlation, q_gini_concentration,
        q_interval_coverage, q_mann_kendall, q_outlier_audit,
        q_sequence_motifs, q_trajectory_densify, q_trajectory_simplify,
        q_trend_regression, q_twap_values,
        q_flow_accumulation, q_flow_direction_d8, q_hll_registers,
        q_idw_interpolate,
        q_bpe_pair_counts, q_map_match_segments, q_vocab_growth,
        q_watershed_labels)

    spark = get_spark("bench_mining", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    synthesize(spark)
    gen_s = round(time.time() - t0, 1)

    ops = [
        ("convex_hull_groups", q_convex_hull_groups, N),
        ("trajectory_simplify", q_trajectory_simplify, N),
        ("twap_values", q_twap_values, N),
        ("sequence_motifs", q_sequence_motifs, N),
        ("event_lag_correlation", q_event_lag_correlation, N),
        ("interval_coverage", q_interval_coverage, N),
        ("outlier_audit", q_outlier_audit, N),
        # densify fans out <=48 samples per segment: run at N/10 input and
        # report BOTH input rows/s and emitted samples/s
        ("trajectory_densify", q_trajectory_densify, N // 10),
        # the stats family: all reduce to tiny aggregates
        ("anova_f", q_anova_f, N),
        ("trend_regression", q_trend_regression, N),
        ("mann_kendall", q_mann_kendall, N),
        ("changepoint_detect", q_changepoint_detect, N),
        ("gini_concentration", q_gini_concentration, N),
        ("distribution_drift", q_distribution_drift, N),
        # hierarchy rollup: ~27x ancestor fan-out through ONE shuffle
        ("tree_rollup", q_tree_rollup, N),
        ("association_rules", q_association_rules, N),
        ("theil_sen_slope", q_theil_sen_slope, N),
        ("ks_test", q_ks_test, N),
        ("kaplan_meier", q_kaplan_meier, N),
        ("max_drawdown", q_max_drawdown, N),
        ("chisq_independence", q_chisq_independence, N),
        # HLL: the corpus-scale pass is one (event_type, user_id) distinct
        ("hll_registers", q_hll_registers, N),
        # D8 raster pair: groupBy to a 256-cell grid (map-side combine),
        # then constant-size scatter/iteration — corpus cost is the scan
        ("flow_direction_d8", q_flow_direction_d8, N),
        ("flow_accumulation", q_flow_accumulation, N),
        ("idw_interpolate", q_idw_interpolate, N),
        # Voronoi zoning: ~16.7M occupied cells x 24 broadcast seeds
        ("nearest_seed_zones", q_nearest_seed_zones, N),
        # segment overlay: world scaled 64->4096 cells/axis so crossing
        # density per cell matches the gate fixture (quadratic otherwise).
        # The ~23M output pair rows are rolled up IN the measured plan —
        # a .collect() of 23M rows times the py4j transfer, not the
        # operator (measured: 176 s collect vs the rollup run)
        # map matching: 24 unrolled codegen LEAST terms, zero joins —
        # corpus cost is the occupied-cell groupBy
        ("map_match_segments", q_map_match_segments, N),
        # watershed: grid-bounded pointer doubling after one corpus scan
        ("watershed_labels", q_watershed_labels, N),
        # token ops run on the documents table: N/10 docs x 10 tokens
        ("bpe_pair_counts", q_bpe_pair_counts, N // 10, "docs"),
        ("vocab_growth", q_vocab_growth, N // 10, "docs"),
        ("trajectory_crossings",
         lambda s, d: q_trajectory_crossings(s, d, home=4096)
         .groupBy().agg(F.count(F.lit(1)).alias("n_pairs"),
                        F.sum("n_cross").alias("total_cross"),
                        F.sum("checksum").alias("checksum")), N),
    ]
    only = os.environ.get("BENCH_MINING_ONLY")
    if only:
        names = set(only.split(","))
        ops = [o for o in ops if o[0] in names]
    results = {}
    for name, fn, rows, *rest in ops:
        kind = rest[0] if rest else "events"
        sf_dir = OUT
        if rows != N and kind == "events":
            # subset via a limited rewrite once (cheap at N/10)
            sub = f"{OUT}_sub"
            if not os.path.isdir(f"{sub}/events.parquet"):
                os.makedirs(sub, exist_ok=True)
                (spark.read.parquet(f"{OUT}/events.parquet")
                 .where(f"event_id < {rows}")
                 .write.mode("overwrite").parquet(f"{sub}/events.parquet"))
            sf_dir = sub
        times, out_rows, extra = [], None, {}
        for _ in range(TRIALS):
            spark.catalog.clearCache()
            t = time.time()
            df = fn(spark, sf_dir)
            res = df.collect()
            times.append(time.time() - t)
            out_rows = len(res)
            if name == "trajectory_densify":
                extra["emitted_samples"] = int(
                    sum(r.n_samples for r in res))
        best = min(times)
        results[name] = {
            "input_rows": rows, "out_rows": out_rows,
            "sec": round(best, 2),
            "rows_per_sec": round(rows / best),
            **({"samples_per_sec": round(extra["emitted_samples"] / best),
                **extra} if extra else {}),
        }
        print(f"# {name}: {rows} rows in {best:.2f}s "
              f"({rows / best / 1e6:.1f}M rows/s)")
    doc = {
        "what": ("round-3 mining operators at 1000x the sf0.1 gate volume "
                 "— the EXACT gated code paths over synthesized "
                 "fixture-shaped tables"),
        "n_rows": N, "cpus": 32, "generation_sec": gen_s,
        "trials": TRIALS, "method": "min over fresh-plan trials, "
        "clearCache() before each (CacheManager canonical-plan pitfall)",
        "results": results,
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "MINING.json")
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            doc = json.load(f)
        doc["results"].update(results)
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: v["rows_per_sec"] for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
