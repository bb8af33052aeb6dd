"""Gazetteer build: scan → normalize → explode variants → skip-gram
augment → noise filter → unigram LM → broadcast match structure
(G1-G7, SURVEY.md §2A).

Everything set-oriented is a Catalyst-planned DataFrame transform
(built-in functions only — whole-stage codegen'd); the single pandas
UDF is the G4 skip-gram generator (general subset-removal is not
expressible with array built-ins alone). The final matching structure
is collected and broadcast — the Spark correspondence of the
reference's process-global dictionaries (LNEx ``set_global_env``,
``LNEx/core.py``; mount empty, see SURVEY.md §0).

Scale notes (100 TB / planet-OSM):
  * the gazetteer is region-scoped BEFORE augmentation (G1 bbox filter
    → partition pruning on a `region`-partitioned table), so the
    broadcast stays city-sized even when the source table is planet-
    sized;
  * every stage before G7 is shuffle-free except the two hash
    aggregations (distinct variants, unigram counts) — both keyed on
    short strings, partial+final aggregated by Catalyst;
  * if a region's gazetteer ever exceeds broadcast limits the L1 link
    join degrades gracefully to sort-merge (Catalyst decides); the
    match structure would shard by token-prefix — documented fallback,
    not needed at city scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lnex_spark.gazetteer import augment as A

GAZETTEER_SCHEMA = T.StructType(
    [
        T.StructField("geo_id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("alt_names", T.ArrayType(T.StringType()), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("region", T.StringType(), True),
    ]
)

from lnex_spark.common import CATEGORY_PRIORITY, DEFAULT_CATEGORY_PRIORITY


def scan_gazetteer(spark: SparkSession, path_or_df, bbox: list[float] | None = None) -> DataFrame:
    """G1: load the gazetteer table and scope it to a bounding box
    ``[min_lat, min_lon, max_lat, max_lon]`` (reference:
    LNEx/osm_gazetteer.py ``build_bb_gazetteer`` — an Elasticsearch
    query there; a pruned columnar scan here)."""
    df = path_or_df if isinstance(path_or_df, DataFrame) else spark.read.parquet(path_or_df)
    if bbox is not None:
        mn_lat, mn_lon, mx_lat, mx_lon = bbox
        df = df.filter(
            F.col("lat").between(mn_lat, mx_lat) & F.col("lon").between(mn_lon, mx_lon)
        )
    return df


def normalize_names_col(c: Column) -> Column:
    """G2 as a pure built-in column chain — parity with
    ``augment.normalize_name`` is asserted in tests."""
    s = F.lower(c)
    s = F.regexp_replace(s, r"[^\x00-\x7F]", " ")
    s = F.regexp_replace(s, r"[-/_]+", " ")
    s = F.regexp_replace(s, r"[^a-z0-9 ']", " ")
    s = F.regexp_replace(s, r"(^|\s)'+|'+(\s|$)", " ")  # edge apostrophes per token
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return s


@F.pandas_udf(T.ArrayType(T.StringType()))
def _variants_udf(norm: pd.Series) -> pd.Series:
    """G4 skip-gram generator (the one vectorized UDF of the build)."""
    return norm.map(lambda s: sorted(A.name_variants(s, "hp")))


@F.pandas_udf(T.ArrayType(T.StringType()))
def _variants_hr_udf(norm: pd.Series) -> pd.Series:
    return norm.map(lambda s: sorted(A.name_variants(s, "hr")))


def build_name_variants(
    gaz: DataFrame, stopwords: DataFrame, mode: str = "hp"
) -> DataFrame:
    """G2+G3+G4+G5: one row per (norm variant, geo entity).

    Output: norm, geo_id, match_type (1 exact / 0 augmented), category,
    lat, lon, region, cat_priority.
    """
    # G3: every name variant is its own key pointing at the same geo id
    names = gaz.select(
        "geo_id",
        "category",
        "lat",
        "lon",
        "region",
        F.explode(
            F.array_distinct(
                F.array_union(
                    F.array(F.col("name")),
                    F.coalesce(F.col("alt_names"), F.array().cast("array<string>")),
                )
            )
        ).alias("raw_name"),
    )
    # G2
    names = names.withColumn("norm", normalize_names_col(F.col("raw_name"))).filter(
        F.length("norm") > 0
    )
    # G4: exact rows + exploded augmented rows
    var_udf = _variants_hr_udf if mode == "hr" else _variants_udf
    exact = names.select(
        "norm", "geo_id", "category", "lat", "lon", "region", F.lit(1).alias("match_type")
    )
    augmented = (
        names.withColumn("variants", var_udf(F.col("norm")))
        .select(
            F.explode("variants").alias("norm"),
            "geo_id",
            "category",
            "lat",
            "lon",
            "region",
            F.lit(0).alias("match_type"),
        )
    )
    variants = exact.unionByName(augmented)
    # an augmented variant that collides with an exact name of the same
    # entity keeps the exact row only
    variants = variants.groupBy("norm", "geo_id").agg(
        F.max("match_type").alias("match_type"),
        F.first("category", ignorenulls=True).alias("category"),
        F.first("lat", ignorenulls=True).alias("lat"),
        F.first("lon", ignorenulls=True).alias("lon"),
        F.first("region", ignorenulls=True).alias("region"),
    )
    # G5: noise filter — built-in predicates + broadcast anti-join
    variants = variants.filter(
        (F.length("norm") > 0) & (~F.regexp_replace("norm", " ", "").rlike(r"^[0-9]+$"))
    )
    generic = F.array([F.lit(w) for w in sorted(A.CATEGORY_WORDS | A.MODIFIER_WORDS | A.NAME_STOPWORDS)])
    variants = variants.filter(
        F.col("norm").contains(" ") | ~F.array_contains(generic, F.col("norm"))
    )
    variants = variants.join(
        F.broadcast(stopwords.select(F.col("word").alias("norm"))), on="norm", how="left_anti"
    )
    cat_prio = F.create_map(
        *[x for k, v in CATEGORY_PRIORITY.items() for x in (F.lit(k), F.lit(v))]
    )
    return variants.withColumn(
        "cat_priority", F.coalesce(cat_prio[F.col("category")], F.lit(DEFAULT_CATEGORY_PRIORITY))
    )


def build_unigram_lm(variants: DataFrame, wordlist: DataFrame | None) -> DataFrame:
    """G6: unigram counts over gazetteer variant tokens ∪ wordlist.
    Pure hash aggregation (partial+final by Catalyst)."""
    toks = variants.select(F.explode(F.split("norm", " ")).alias("word")).filter(
        F.length("word") > 0
    )
    counts = toks.groupBy("word").agg(F.count("*").alias("freq"))
    if wordlist is not None:
        counts = (
            counts.unionByName(wordlist.select("word", "freq"))
            .groupBy("word")
            .agg(F.sum("freq").alias("freq"))
        )
    return counts


class MatchStruct:
    """G7: the driver-built matching structure shipped to executors.

    LNEx's process-global dicts ≙ one Spark broadcast variable:
      full_names  — every matchable normalized variant
      prefixes    — every space-joined token prefix of every variant
                    (bottom-up n-gram growth pruning, paper §4.1)
      unigram     — G6 freq dict for hashtag segmentation
      max_tokens  — longest variant length, caps n-gram growth
    """

    __slots__ = ("full_names", "prefixes", "unigram", "max_tokens")

    def __init__(self, full_names: frozenset, prefixes: frozenset, unigram: dict, max_tokens: int):
        self.full_names = full_names
        self.prefixes = prefixes
        self.unigram = unigram
        self.max_tokens = max_tokens


def build_match_struct(
    spark: SparkSession,
    variants: DataFrame,
    unigram: DataFrame,
    max_names: int = 5_000_000,
):
    """Collect the (small, region-scoped) variant names + LM and
    broadcast the matching structure.

    ``max_names`` is a driver-OOM guard: the struct is meant for a
    REGION-SCOPED gazetteer (city ≈ 10^4-10^5 names ≈ a few MB
    broadcast). 5M names ≈ ~0.5 GB driver-side — past that the caller
    forgot the bbox scope (G1) or genuinely needs the documented
    sharded fallback (shard the gazetteer by token prefix, run one
    extraction pass per shard, union mentions — same results because
    matches are independent per name). The limit bounds the collect
    itself, so the guard cannot OOM while checking."""
    names = [
        r[0]
        for r in variants.select("norm").distinct().limit(max_names + 1).collect()
    ]
    if len(names) > max_names:
        raise ValueError(
            f"match structure would exceed {max_names} names; scope the "
            "gazetteer with a bounding box (scan_gazetteer bbox) or shard "
            "by token prefix and union per-shard mentions"
        )
    full_names = frozenset(names)
    prefixes = set()
    max_tokens = 1
    for n in names:
        toks = n.split(" ")
        max_tokens = max(max_tokens, len(toks))
        for i in range(1, len(toks) + 1):
            prefixes.add(" ".join(toks[:i]))
    unigram_d = {r[0]: int(r[1]) for r in unigram.collect()}
    struct = MatchStruct(full_names, frozenset(prefixes), unigram_d, max_tokens)
    return spark.sparkContext.broadcast(struct)
