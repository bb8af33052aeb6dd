"""Eightieth oracle-registry module: membership sketching and index
storage planning.

  * bloom_fpr_users — an explicit m=2048-bit, k=3 Bloom filter over
    the first half-month's distinct (user|type|day) activity keys,
    probed with the second half's NEW keys (guaranteed non-members
    via anti-join), reporting the measured false-positive rate
    against the exact theory (1-(1-1/m)^(kn))^k.  Relationally the
    filter is just the DISTINCT bit set (at most m rows however
    large the key set); a probe is positive iff every one of its
    distinct bits is present — the filter-before-shuffle gadget the
    runtime bloom join (tests/test_runtime_opts.py) applies inside
    Catalyst, here built openly so its error is measurable.

  * posting_compression_docs — storage sizing for the inverted
    index (phrase_query_docs' structure): per-token sorted doc_id
    postings are delta-encoded (first gap = doc_id+1, then
    successive differences) and varint-costed at ceil(bitlen/7)
    bytes per gap, vs 8 bytes raw — total bytes both ways, the
    compression ratio, and mean bits per posting.  Bit lengths via
    length(bin(gap)) on both engines — integer-exact, no log2
    boundary risk.  The back-of-envelope every index deployment
    runs before choosing a posting format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lnex_spark.oracles import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_BF_M = 2048
_BF_K = 3

_BF_SQL = f"""
    WITH keyed AS (
      SELECT DISTINCT
             CAST(user_id AS VARCHAR) || '|' || event_type || '|' ||
               CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS key,
             ts < TIMESTAMP '2024-01-16' AS in_train
      FROM events
    ),
    members AS (SELECT DISTINCT key FROM keyed WHERE in_train),
    probes AS (
      SELECT DISTINCT key FROM keyed WHERE NOT in_train
      EXCEPT SELECT key FROM members
    ),
    member_bits AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5('bf' || CAST(j.j AS VARCHAR) || '#' || m.key), 1, 8))
                  AS BIGINT) % {_BF_M} AS bit
      FROM members m, (SELECT unnest(range(0, {_BF_K})) AS j) j
    ),
    probe_bits AS (
      SELECT p.key,
             CAST(('0x' || substr(md5('bf' || CAST(j.j AS VARCHAR) || '#' || p.key), 1, 8))
                  AS BIGINT) % {_BF_M} AS bit
      FROM probes p, (SELECT unnest(range(0, {_BF_K})) AS j) j
    ),
    verdicts AS (
      SELECT pb.key,
             COUNT(DISTINCT pb.bit) AS n_bits,
             COUNT(DISTINCT CASE WHEN mb.bit IS NOT NULL THEN pb.bit END) AS n_hit
      FROM probe_bits pb LEFT JOIN member_bits mb ON pb.bit = mb.bit
      GROUP BY pb.key
    ),
    counts AS (
      SELECT (SELECT COUNT(*) FROM members) AS n_members,
             COUNT(*) AS n_probes,
             CAST(SUM(CASE WHEN n_hit = n_bits THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_pos
      FROM verdicts
    )
    SELECT n_members, n_probes, n_false_pos,
           ROUND(n_false_pos * 1.0 / n_probes, 6) AS measured_fpr,
           ROUND(pow(1.0 - pow(1.0 - 1.0 / {_BF_M}, {_BF_K} * n_members), {_BF_K}), 6)
             AS theory_fpr
    FROM counts
"""


@register("bloom_fpr_users", _BF_SQL)
def bloom_fpr_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    keyed = ev.select(
        F.concat_ws(
            "|",
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.to_date(F.date_trunc("day", F.col("ts"))).cast("string"),
        ).alias("key"),
        (F.col("ts") < F.lit("2024-01-16").cast("timestamp")).alias("in_train"),
    ).distinct()
    members = keyed.filter("in_train").select("key").distinct()
    probes = (
        keyed.filter(~F.col("in_train"))
        .select("key")
        .distinct()
        .join(members, "key", "left_anti")
    )

    def bits(df):
        return df.select(
            "key", F.explode(F.sequence(F.lit(0), F.lit(_BF_K - 1))).alias("j")
        ).select(
            "key",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("bf"), F.col("j").cast("string"), F.lit("#"), F.col("key"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(_BF_M),
            ).alias("bit"),
        )

    member_bits = bits(members).select("bit").distinct()
    probe_bits = bits(probes)
    verdicts = (
        probe_bits.join(
            member_bits.select(F.col("bit").alias("mbit")),
            probe_bits["bit"] == F.col("mbit"),
            "left",
        )
        .groupBy("key")
        .agg(
            F.countDistinct("bit").alias("n_bits"),
            F.countDistinct(F.when(F.col("mbit").isNotNull(), F.col("bit"))).alias(
                "n_hit"
            ),
        )
    )
    counts = verdicts.agg(
        F.count("*").alias("n_probes"),
        F.sum(F.when(F.col("n_hit") == F.col("n_bits"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
    ).crossJoin(members.agg(F.count("*").alias("n_members")))
    theory = F.pow(
        1.0 - F.pow(F.lit(1.0) - 1.0 / _BF_M, _BF_K * F.col("n_members")), F.lit(_BF_K)
    )
    return counts.select(
        "n_members",
        "n_probes",
        "n_false_pos",
        F.round(F.col("n_false_pos") * 1.0 / F.col("n_probes"), 6).alias("measured_fpr"),
        F.round(theory, 6).alias("theory_fpr"),
    )


_PC_SQL = r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE doc_id < 2000
    ),
    postings AS (SELECT DISTINCT tok, doc_id FROM toks WHERE len(tok) > 0),
    gaps AS (
      SELECT tok,
             CASE WHEN lag(doc_id) OVER w IS NULL THEN doc_id + 1
                  ELSE doc_id - lag(doc_id) OVER w END AS gap
      FROM postings
      WINDOW w AS (PARTITION BY tok ORDER BY doc_id)
    ),
    costed AS (
      SELECT tok, gap,
             CAST(ceil(length(bin(gap)) / 7.0) AS BIGINT) AS vbytes
      FROM gaps
    )
    SELECT COUNT(*) AS n_postings,
           COUNT(DISTINCT tok) AS n_tokens,
           CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes,
           CAST(SUM(vbytes) AS BIGINT) AS varint_bytes,
           ROUND(SUM(vbytes) * 1.0 / (COUNT(*) * 8), 6) AS compression_ratio,
           ROUND(SUM(vbytes) * 8.0 / COUNT(*), 6) AS bits_per_posting
    FROM costed
"""


@register("posting_compression_docs", _PC_SQL)
def posting_compression_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    postings = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .select("tok", "doc_id")
        .distinct()
    )
    w = Window.partitionBy("tok").orderBy("doc_id")
    gaps = postings.select(
        "tok",
        F.when(F.lag("doc_id").over(w).isNull(), F.col("doc_id") + 1)
        .otherwise(F.col("doc_id") - F.lag("doc_id").over(w))
        .alias("gap"),
    )
    costed = gaps.select(
        "tok", F.ceil(F.length(F.bin(F.col("gap"))) / 7.0).cast("long").alias("vbytes")
    )
    return costed.agg(
        F.count("*").alias("n_postings"),
        F.countDistinct("tok").alias("n_tokens"),
        (F.count("*") * 8).cast("long").alias("raw_bytes"),
        F.sum("vbytes").cast("long").alias("varint_bytes"),
        F.round(F.sum("vbytes") * 1.0 / (F.count("*") * 8), 6).alias(
            "compression_ratio"
        ),
        F.round(F.sum("vbytes") * 8.0 / F.count("*"), 6).alias("bits_per_posting"),
    )
