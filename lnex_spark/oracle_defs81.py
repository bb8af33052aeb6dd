"""Eighty-first oracle-registry module: feature-store PIT join and
LSH parameter planning.

  * pit_features_events — the point-in-time (PIT) feature join a
    feature store runs to avoid label leakage: each event is
    enriched with the LATEST feature snapshot at-or-before its
    timestamp per entity key (snapshots derived deterministically
    from orders: key = o_custkey%50, hourly snap times from
    o_orderkey, value = integer order cents; duplicate (key, ts)
    snapshots pre-deduped by max_by orderkey so the as-of target is
    unique).  Spark side reuses operators/asof.asof_join_backward —
    the union+window form, one keyed shuffle, no range blowup; the
    DuckDB twin is the native ASOF LEFT JOIN, so the value match
    cross-checks the window rewrite against a native asof implementation
    on a SECOND schema beyond clicks/errors.  Aggregated readout
    (match rates + exact integer cent sums per type) keeps the
    compare float-free.

  * lsh_tuning_docs — the (bands, rows) S-curve planner run BEFORE
    committing to an LSH config: over labeled pairs with EXACT
    trigram-shingle Jaccard (clone pairs = doc + token-appended copy,
    near-miss pairs = adjacent docs), evaluate b×r ∈ {16×1, 8×2,
    4×4, 2×8} via p = 1-(1-s^r)^b, emitting expected candidate mass
    and expected recall over true positives (s ≥ 0.5) per config.
    The closed-form complement of the measured
    minhash_calibration_docs / blocking_quality_docs loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_PIT_SQL = """
    WITH snaps0 AS (
      SELECT o_custkey % 50 AS k,
             TIMESTAMP '2024-01-01 00:00:00'
               + (o_orderkey % 720) * INTERVAL 1 HOUR AS ts,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey
      FROM orders
    ),
    snaps AS (
      SELECT k, ts, arg_max(cents, o_orderkey) AS cents
      FROM snaps0 GROUP BY k, ts
    ),
    ev AS (
      SELECT event_id, event_type, user_id % 50 AS k, ts FROM events
    ),
    joined AS (
      SELECT e.event_id, e.event_type, s.cents
      FROM ev e ASOF LEFT JOIN snaps s
        ON e.k = s.k AND s.ts <= e.ts
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN cents IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_matched,
           CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS sum_feature_cents
    FROM joined GROUP BY event_type
"""


@register("pit_features_events", _PIT_SQL)
def pit_features_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.operators.asof import asof_join_backward

    o = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    snaps = (
        o.select(
            (F.col("o_custkey") % 50).alias("k"),
            F.expr(
                "timestampadd(HOUR, cast(o_orderkey % 720 as int),"
                " timestamp'2024-01-01 00:00:00')"
            ).alias("ts"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_orderkey",
        )
        .groupBy("k", "ts")
        .agg(F.max_by("cents", "o_orderkey").alias("cents"))
    )
    left = ev.select(
        "event_id", "event_type", (F.col("user_id") % 50).alias("k"), "ts"
    )
    joined = asof_join_backward(left, snaps, on=["k"], ts_col="ts", value_cols=["cents"])
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("asof_cents").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_matched"),
        F.coalesce(F.sum("asof_cents"), F.lit(0)).cast("long").alias(
            "sum_feature_cents"
        ),
    )


_LSH_SQL = r"""
    WITH uni AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 1000
      UNION ALL
      SELECT doc_id + 1000000, text || ' zq17x' FROM documents
      WHERE doc_id < 1000 AND doc_id % 7 = 0
    ),
    toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM uni),
    pos AS (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks WHERE len(t) >= 3),
    sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle FROM pos),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND b.doc_id = a.doc_id + 1
      GROUP BY 1, 2
      UNION ALL
      SELECT a.doc_id, b.doc_id, count(*)
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND b.doc_id = a.doc_id + 1000000
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b,
             n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common) AS s
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    ),
    grid AS (
      SELECT 16 AS bands, 1 AS rws UNION ALL SELECT 8, 2
      UNION ALL SELECT 4, 4 UNION ALL SELECT 2, 8
    ),
    scored AS (
      SELECT g.bands, g.rws, p.s,
             1.0 - pow(1.0 - pow(p.s, g.rws), g.bands) AS pc
      FROM grid g, pairs p
    )
    SELECT bands, rws,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN s >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           ROUND(SUM(pc), 4) AS exp_candidates,
           ROUND(SUM(CASE WHEN s >= 0.5 THEN pc ELSE 0.0 END)
                 / NULLIF(SUM(CASE WHEN s >= 0.5 THEN 1 ELSE 0 END), 0), 6)
             AS exp_recall
    FROM scored GROUP BY bands, rws
"""


@register("lsh_tuning_docs", _LSH_SQL)
def lsh_tuning_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    uni = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zq17x")).alias("text"),
        )
    )
    toks = uni.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t")
    ).filter(F.size("t") >= 3)
    pos = toks.select(
        "doc_id", "t", F.explode(F.sequence(F.lit(1), F.size("t") - 2)).alias("i")
    )
    sh = pos.select(
        "doc_id", F.array_join(F.slice("t", F.col("i"), 3), " ").alias("shingle")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    def common_for(offset: int) -> DataFrame:
        a = sh.select(F.col("doc_id").alias("a_doc"), F.col("shingle").alias("a_sh"))
        b = sh.select(
            (F.col("doc_id") - offset).alias("b_anchor"), F.col("shingle").alias("b_sh")
        )
        return (
            a.join(b, (a["a_doc"] == b["b_anchor"]) & (a["a_sh"] == b["b_sh"]))
            .groupBy(F.col("a_doc").alias("doc_a"))
            .agg(F.count("*").alias("n_common"))
            .select("doc_a", (F.col("doc_a") + offset).alias("doc_b"), "n_common")
        )

    common = common_for(1).unionByName(common_for(1000000))
    pairs = (
        common.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .select(
            (F.col("n_common") * 1.0 / (F.col("na") + F.col("nb") - F.col("n_common"))).alias("s")
        )
    )
    grid = spark.createDataFrame([(16, 1), (8, 2), (4, 4), (2, 8)], "bands int, rws int")
    scored = grid.crossJoin(pairs).select(
        "bands",
        "rws",
        "s",
        (1.0 - F.pow(1.0 - F.pow(F.col("s"), F.col("rws")), F.col("bands"))).alias("pc"),
    )
    return scored.groupBy("bands", "rws").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.when(F.col("s") >= 0.5, 1).otherwise(0)).cast("long").alias("n_pos"),
        F.round(F.sum("pc"), 4).alias("exp_candidates"),
        F.round(
            F.sum(F.when(F.col("s") >= 0.5, F.col("pc")).otherwise(0.0))
            / F.nullif(
                F.sum(F.when(F.col("s") >= 0.5, 1).otherwise(0)).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("exp_recall"),
    )
