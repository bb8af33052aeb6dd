"""Invariant tests for the sketch / eval / curation ops of
oracle_defs48-50 (their value equality vs DuckDB is covered by the
oracle sweep; these pin the semantic guarantees the value hash
can't express)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_countmin_never_underestimates(spark):
    from lnex_spark.oracle_defs48 import countmin_events

    rows = countmin_events(spark, SF).collect()
    assert rows, "expected heavy hitters"
    for r in rows:
        assert r.cm_est >= r.true_cnt, (r.key, r.true_cnt, r.cm_est)
        assert r.est_ge_true == 1


def test_auc_matches_bruteforce(spark):
    """AUC from the relational average-rank form equals the O(n^2)
    pair-counting definition (ties count 1/2) on the same data."""
    from lnex_spark.oracle_defs48 import auc_nchars_en_docs

    row = auc_nchars_en_docs(spark, SF).collect()[0]
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("n_chars", "lang").collect()
    pos = [r.n_chars for r in docs if r.lang == "en"]
    neg = [r.n_chars for r in docs if r.lang != "en"]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    brute = wins / (len(pos) * len(neg))
    assert row.np == len(pos) and row.nn == len(neg)
    assert abs(row.auc - brute) < 1e-6


def test_domain_cap_respects_quota_and_is_stable(spark):
    from lnex_spark.oracle_defs48 import domain_cap_docs

    out = domain_cap_docs(spark, SF)
    per_lang = {r.lang: r.cnt for r in out.groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
    assert per_lang and all(v <= 20 for v in per_lang.values())
    # stability: same kept set when the input is repartitioned
    ids1 = {r.doc_id for r in out.collect()}
    d = spark.read.parquet(f"{SF}/documents.parquet").repartition(7)
    d.createOrReplaceTempView("_cap_tmp")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    keyed = d.select(
        "doc_id", "lang",
        F.md5(F.concat(F.lit("cap-v1#"), F.col("doc_id").cast("string"))).alias("sk"),
    )
    w = Window.partitionBy("lang").orderBy("sk", "doc_id")
    ids2 = {
        r.doc_id
        for r in keyed.select("doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .collect()
    }
    assert ids1 == ids2


def test_fs_weights_are_discriminative(spark):
    """Agreement on every field must be evidence FOR a match
    (m > u ⇒ w_agree > 0): lang and length bucket because clones
    preserve them, and source because even the 20% preservation rate
    towers over the near-zero rate at which two DISTINCT adjacent
    docs share a source.  Disagreement weights must be negative for
    the preserved fields."""
    from lnex_spark.oracle_defs49 import fs_weights_docs

    w = {r.field: r for r in fs_weights_docs(spark, SF).collect()}
    assert w["lang"].m_prob > 0.9
    for f in ["lang", "source", "len_bucket"]:
        assert w[f].m_prob > w[f].u_prob and w[f].w_agree > 0, w[f]
    assert w["lang"].w_disagree < 0 and w["len_bucket"].w_disagree < 0


def test_golden_record_prefers_complete_member(spark):
    """Every multi-member cluster's golden record must be an original
    (doc_id < 1e6): originals strictly dominate their truncated clones
    on text length whenever truncation actually shortened the text,
    and ties fall back to the lower doc_id — also the original."""
    from lnex_spark.oracle_defs49 import golden_record_docs

    rows = golden_record_docs(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.golden_doc_id < 1000000


def test_length_batches_partition_docs_exactly(spark):
    from pyspark.sql import functions as F

    from lnex_spark.oracle_defs50 import length_batches_docs

    out = length_batches_docs(spark, SF)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert total == n_docs
    bad = out.filter((F.col("n_docs") > 8) | (F.col("padding_waste") < 0)).count()
    assert bad == 0


def test_bootstrap_ci_brackets_mean(spark):
    from lnex_spark.oracle_defs50 import bootstrap_ci_orders

    r = bootstrap_ci_orders(spark, SF).collect()[0]
    assert r.ci_lo <= r.ci_hi
    # the point estimate should fall inside a 2/32-trimmed bootstrap interval
    assert r.ci_lo <= r.mean_all <= r.ci_hi
    assert r.n_reps == 32
