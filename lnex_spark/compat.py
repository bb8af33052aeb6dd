"""LNEx-shaped compatibility API — the migration surface for users of
the reference (halolimat/LNEx). Mirrors its three entry points
([PK LNEx/__init__.py]; reference mount empty — see SURVEY.md §0):

  reference                          here
  ---------                          ----
  lnex.initialize(bb, augmentType,   initialize(spark, gazetteer_df,
      cache, force_download)             bb, augment_type) -> Model
  lnex.initialize_using_files(       initialize_using_files(spark,
      geo_locations, geo_info,           geo_locations_path,
      extended_words3)                   geo_info_path, words_path)
  lnex.extract(tweet) -> [(spotted,  extract(model, transcripts_df)
      (start,end), names, geo_ids)]      -> DataFrame, one row per
                                         mention with the FULL
                                         candidate sets

Differences are the Spark-native ones only: text units come in as a
DataFrame column instead of one Python str per call, and results go
out as a DataFrame. Semantics (preprocess, augmentation, bottom-up
n-gram matching, candidate sets — the reference returns ALL candidate
geo ids per mention, it does not pick a winner) are preserved; the
scored/canonicalized variant is this engine's extension (pipeline.py).

File formats for ``initialize_using_files`` follow the reference's
pickled/JSON dicts re-expressed as JSON:
  geo_locations.json   {"normalized name": [geo_id, ...], ...}
  geo_info.json        {"<geo_id>": {"name": ..., "geo_item":
                           {"point": {"lat": .., "lon": ..}}}, ...}
  extended_words3.json ["word", ...]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lnex_spark.gazetteer.build import GAZETTEER_SCHEMA
from lnex_spark.pipeline import GazetteerModel, build_gazetteer


def initialize(
    spark: SparkSession,
    gazetteer_df: DataFrame,
    bb: list[float] | None = None,
    augment_type: str = "HP",
    stopwords_df: DataFrame | None = None,
    wordlist_df: DataFrame | None = None,
) -> GazetteerModel:
    """Reference ``initialize(bb, augmentType=...)``: scope the
    gazetteer to the bounding box ``[min_lat, min_lon, max_lat,
    max_lon]``, augment (HP = high precision, HR = high recall), build
    the broadcast matching structure. The gazetteer is a table here,
    not an Elasticsearch service — the only structural difference."""
    if stopwords_df is None:
        stopwords_df = spark.createDataFrame([], "word string")
    return build_gazetteer(
        spark,
        gazetteer_df,
        stopwords_df,
        wordlist_df,
        bbox=bb,
        mode=augment_type.lower(),
    )


def initialize_using_files(
    spark: SparkSession,
    geo_locations_path: str,
    geo_info_path: str,
    extended_words_path: str | None = None,
    augment_type: str = "HP",
) -> GazetteerModel:
    """Reference ``initialize_using_files``: build the model from
    LNEx-format JSON files instead of a live gazetteer table. All
    parsing is from_json with explicit schemas (no schema inference —
    deterministic on a cluster)."""
    # geo_locations: {"name": [geo_id, ...]}
    geo_loc = (
        spark.read.text(geo_locations_path, wholetext=True)
        .select(
            F.explode(
                F.from_json(F.col("value"), T.MapType(T.StringType(), T.ArrayType(T.LongType())))
            ).alias("name", "geo_ids")
        )
        .select("name", F.explode("geo_ids").alias("geo_id"))
    )
    # geo_info: {"<id>": {"name":..., "geo_item": {"point": {...}}}}
    info_schema = T.MapType(
        T.StringType(),
        T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("category", T.StringType()),
                T.StructField(
                    "geo_item",
                    T.StructType(
                        [
                            T.StructField(
                                "point",
                                T.StructType(
                                    [
                                        T.StructField("lat", T.DoubleType()),
                                        T.StructField("lon", T.DoubleType()),
                                    ]
                                ),
                            )
                        ]
                    ),
                ),
            ]
        ),
    )
    geo_info = (
        spark.read.text(geo_info_path, wholetext=True)
        .select(F.explode(F.from_json(F.col("value"), info_schema)).alias("gid", "info"))
        .select(
            F.col("gid").cast("long").alias("geo_id"),
            F.col("info.name").alias("info_name"),
            F.col("info.category").alias("category"),
            F.col("info.geo_item.point.lat").alias("lat"),
            F.col("info.geo_item.point.lon").alias("lon"),
        )
    )
    # one gazetteer row per geo id; every surface form in geo_locations
    # pointing at it becomes an alt name (the reference keeps the same
    # many-names -> one-entity shape)
    gaz = (
        geo_loc.join(geo_info, "geo_id", "left")
        .groupBy("geo_id")
        .agg(
            F.coalesce(F.first("info_name", ignorenulls=True), F.first("name")).alias("name"),
            F.sort_array(F.collect_set("name")).alias("alt_names"),
            F.first("category", ignorenulls=True).alias("category"),
            F.first("lat", ignorenulls=True).alias("lat"),
            F.first("lon", ignorenulls=True).alias("lon"),
        )
        .withColumn("region", F.lit(None).cast("string"))
        .select(*[f.name for f in GAZETTEER_SCHEMA.fields])
    )
    wordlist = None
    if extended_words_path is not None:
        wordlist = (
            spark.read.text(extended_words_path, wholetext=True)
            .select(
                F.explode(F.from_json(F.col("value"), T.ArrayType(T.StringType()))).alias("word")
            )
            .select("word", F.lit(1).alias("freq"))
        )
    stop = spark.createDataFrame([], "word string")
    return build_gazetteer(spark, gaz, stop, wordlist, mode=augment_type.lower())


def extract(model: GazetteerModel, transcripts: DataFrame) -> DataFrame:
    """Reference ``extract(tweet)`` over a transcripts DataFrame.

    One row per mention with the reference's 4-tuple as columns:
    (conv_id, turn_idx, spotted_text, start, end, candidate_names,
    geo_ids) — candidate sets, NO winner selection, exactly like the
    reference's return value. Sets are sorted arrays for determinism."""
    from lnex_spark.operators.extract import extract_mentions_df

    mentions = extract_mentions_df(transcripts, model.bc_struct)
    linked = mentions.join(
        F.broadcast(model.variants.select("norm", "geo_id")), on="norm", how="inner"
    )
    return (
        linked.groupBy("conv_id", "turn_idx", "start", "end")
        .agg(
            F.first("surface").alias("spotted_text"),
            F.sort_array(F.collect_set("norm")).alias("candidate_names"),
            F.sort_array(F.collect_set("geo_id")).alias("geo_ids"),
        )
        .select(
            "conv_id", "turn_idx", "spotted_text", "start", "end", "candidate_names", "geo_ids"
        )
    )
