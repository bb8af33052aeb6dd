"""Canonicalization guards for the driver's pandas-based value hasher.

The driver compares a Spark result and its DuckDB oracle by converting
BOTH to pandas and hashing sorted, stringified rows (evidence: round
1's multimodal_features crash trace shows ``DataFrame.sort_values``
inside the driver).  pandas conversion is lossy in ways the engines'
native results are not, so semantically-identical outputs can hash
differently:

  * DuckDB ``sum(BIGINT)`` returns HUGEINT -> float64 ("454.0"), while
    Spark's LONG sum stays int64 ("454")            -> ``bigints``
  * Spark DATE -> object(datetime.date) ("2024-01-14"), DuckDB DATE ->
    datetime64 ("2024-01-14 00:00:00")              -> ``dates``
  * Spark DECIMAL -> object(Decimal) (full precision string), DuckDB
    DECIMAL -> float64 (%.6g)                       -> ``doubles``
  * list cells make ``sort_values`` raise ``unhashable type: 'list'``
    (the round-1 multimodal_features crash)          -> ``arrays`` /
    ``double_arrays``

These are NOT result bugs — tools/driver_canon_check.py verified every
entry below fails ONLY on dtype class / cell sortability, never on
values — so the fix is a declarative projection applied at registration
time (oracles.spark_queries / duckdb_sql) rather than edits scattered
over 50 oracle_defs modules:

  * ``dates``         both sides -> 'YYYY-MM-DD' strings
  * ``bigints``       DuckDB side -> CAST(col AS BIGINT) (Spark already int64)
  * ``doubles``       both sides -> DOUBLE
  * ``arrays``        both sides -> ','-joined element strings
  * ``double_arrays`` both sides -> ','-joined %.6f element strings
                      (elements are pre-rounded to 6 dp, so fixed-point
                      formatting is exact and engine-repr-independent)

The SQL side uses DuckDB ``SELECT * REPLACE`` over the original query,
preserving column order and names.  tools/driver_canon_check.py re-runs
green over all ops with these guards applied; new ops that trip the
same traps should be added here (the checker names the column and
dtype pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIXUPS: dict[str, dict[str, list[str]]] = {
    "ab_test_events": {
        "bigints": [
            "ca",
            "cb"
        ]
    },
    "active_span_users": {
        "bigints": [
            "active_us"
        ]
    },
    "ams_f2_events": {
        "bigints": [
            "ams_estimate"
        ]
    },
    "array_funcs_stats": {
        "arrays": [
            "head_toks"
        ]
    },
    "array_setops_docs": {
        "arrays": [
            "common"
        ]
    },
    "arrow_brand_stats": {
        "bigints": [
            "price_cents"
        ]
    },
    "assortativity_events": {
        "bigints": [
            "n_edges"
        ]
    },
    "auc_nchars_en_docs": {
        "bigints": [
            "nn",
            "np"
        ]
    },
    "bpe_merges_docs": {
        "bigints": [
            "freq"
        ]
    },
    "changepoint_events": {
        "dates": [
            "split_day"
        ]
    },
    "churn_stump_users": {
        "bigints": [
            "thr"
        ]
    },
    "collation_ci_brands": {
        "bigints": [
            "price_cents"
        ]
    },
    "compat_extract_sets": {
        "arrays": [
            "geo_ids"
        ]
    },
    "conv_profile_synth": {
        "bigints": [
            "text_chars"
        ]
    },
    "cusum_events": {
        "dates": [
            "first_alarm_day"
        ]
    },
    "date_funcs_orders": {
        "dates": [
            "month_end"
        ]
    },
    "decimal_money_agg": {
        "doubles": [
            "discounted",
            "gross"
        ]
    },
    "distinct_agg_orders": {
        "bigints": [
            "sum_buckets"
        ]
    },
    "eb_shrinkage_users": {
        "bigints": [
            "clicks"
        ]
    },
    "ece_docs": {
        "bigints": [
            "n_total"
        ]
    },
    "esd_outliers_events": {
        "dates": [
            "day"
        ]
    },
    "f1_threshold_docs": {
        "bigints": [
            "tp"
        ]
    },
    "fd_check_orders": {
        "bigints": [
            "n_violating"
        ]
    },
    "gains_curve_docs": {
        "bigints": [
            "n_pos"
        ]
    },
    "hoeffding_seq_events": {
        "bigints": [
            "n_total"
        ],
        "dates": [
            "d"
        ]
    },
    "horvitz_thompson_docs": {
        "bigints": [
            "true_chars"
        ]
    },
    "influence_events": {
        "dates": [
            "day"
        ]
    },
    "interval_arith_orders": {
        "dates": [
            "review_due",
            "ship_by"
        ]
    },
    "join_card_estimate_events": {
        "bigints": [
            "actual"
        ]
    },
    "kaplan_meier_episodes": {
        "bigints": [
            "at_risk",
            "deaths"
        ]
    },
    "kernel_smoother_events": {
        "dates": [
            "day"
        ]
    },
    "key_skew_profile_events": {
        "bigints": [
            "total"
        ]
    },
    "kmeans_cells": {
        "double_arrays": [
            "centroid"
        ]
    },
    "kmeans_cells_arrow": {
        "double_arrays": [
            "centroid"
        ]
    },
    "length_batches_docs": {
        "bigints": [
            "padding_waste",
            "sum_len"
        ]
    },
    "ltv_cohorts_events": {
        "dates": [
            "cohort"
        ]
    },
    "mad_outliers_events": {
        "bigints": [
            "n_outliers"
        ]
    },
    "mahalanobis_outliers_events": {
        "dates": [
            "day"
        ]
    },
    "markov_backtest_events": {
        "bigints": [
            "n_correct"
        ]
    },
    "max_drawdown_events": {
        "dates": [
            "peak_day",
            "recovery_day",
            "trough_day"
        ]
    },
    "merkle_day_hashes_events": {
        "dates": [
            "day"
        ]
    },
    "minhash_calibration_docs": {
        "bigints": [
            "n_agree"
        ]
    },
    "new_users_curve_events": {
        "dates": [
            "d"
        ]
    },
    "p_chart_events": {
        "dates": [
            "day"
        ]
    },
    "peak_days_events": {
        "dates": [
            "day"
        ]
    },
    "pipe_syntax_pricing": {
        "bigints": [
            "gross_cents",
            "sum_qty"
        ]
    },
    "prequential_markov_events": {
        "dates": [
            "day"
        ]
    },
    "psi_drift_events": {
        "bigints": [
            "bin",
            "n_a",
            "n_b"
        ]
    },
    "quantize_embeddings": {
        "arrays": [
            "qvec"
        ]
    },
    "retention_cohorts_events": {
        "dates": [
            "cohort"
        ]
    },
    "rle_runs_events": {
        "bigints": [
            "run_idx"
        ]
    },
    "rolling_distinct_users": {
        "dates": [
            "d"
        ]
    },
    "seasonal_residuals_events": {
        "dates": [
            "d"
        ]
    },
    "sliding_window_rates": {
        "bigints": [
            "sum_v"
        ]
    },
    "slo_burn_events": {
        "bigints": [
            "errs"
        ]
    },
    "spectral_cut_events": {
        "bigints": [
            "hash_edge_cut",
            "n_edges",
            "spectral_edge_cut"
        ]
    },
    "sql_udf_netprice": {
        "bigints": [
            "net_cents"
        ]
    },
    "streaks_users": {
        "bigints": [
            "n_active_days"
        ]
    },
    "stump_threshold_docs": {
        "bigints": [
            "pos_left"
        ]
    },
    "table_checksum_orders": {
        "bigints": [
            "checksum"
        ]
    },
    "topp_contexts_docs": {
        "bigints": [
            "n_continuations_obs"
        ]
    },
    "tracking_signal_events": {
        "dates": [
            "day"
        ]
    },
    "variant_props_extract": {
        "bigints": [
            "sum_k"
        ]
    },
    "vwap_ohlc_events": {
        "dates": [
            "day"
        ]
    },
    "weighted_median_lineitem": {
        "bigints": [
            "total_weight"
        ]
    },
    "xml_roundtrip_events": {
        "bigints": [
            "sum_k"
        ]
    }
}


def fix_spark(df: DataFrame, spec: dict[str, list[str]]) -> DataFrame:
    for c in spec.get("dates", []):
        df = df.withColumn(c, F.date_format(F.col(c), "yyyy-MM-dd"))
    for c in spec.get("doubles", []):
        df = df.withColumn(c, F.col(c).cast("double"))
    for c in spec.get("arrays", []):
        df = df.withColumn(
            c, F.concat_ws(",", F.transform(F.col(c), lambda x: x.cast("string")))
        )
    for c in spec.get("double_arrays", []):
        df = df.withColumn(
            c, F.concat_ws(",", F.transform(F.col(c), lambda x: F.format_string("%.6f", x)))
        )
    return df


def fix_sql(sql: str, spec: dict[str, list[str]]) -> str:
    reps: list[str] = []
    for c in spec.get("dates", []):
        reps.append(f"strftime({c}, '%Y-%m-%d') AS {c}")
    for c in spec.get("bigints", []):
        reps.append(f"CAST({c} AS BIGINT) AS {c}")
    for c in spec.get("doubles", []):
        reps.append(f"CAST({c} AS DOUBLE) AS {c}")
    for c in spec.get("arrays", []):
        reps.append(f"array_to_string({c}, ',') AS {c}")
    for c in spec.get("double_arrays", []):
        reps.append(
            "array_to_string(list_transform(" + c + ", x -> format('{:.6f}', x)), ',') AS " + c
        )
    if not reps:
        return sql
    return "SELECT * REPLACE (" + ", ".join(reps) + ") FROM (\n" + sql + "\n)"
