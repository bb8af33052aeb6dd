"""Derive a transcripts table from the driver's ``documents`` parquet
(TESTDATA.md) — pure built-in column expressions, fully deterministic,
no driver-side loops, so the same derivation scales from sf0.001 smoke
to sf0.1 bench to a real cluster.

Shape per BASELINE.json input_hint: (conv_id string, turn_idx int32,
role string, text string, tool string, ts timestamp) with long-tail
conv_id skew (~20% of turns land in conversation 0) and planted
gazetteer mentions (exact names, skip-gram variants, hashtag forms)
in a deterministic doc_id-keyed rotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lnex_spark.data.fixtures import gen_gazetteer
from lnex_spark.gazetteer.augment import name_variants, normalize_name


def mention_menu(event: str = "chennai") -> list[str]:
    """Deterministic planted-mention strings for one event's gazetteer:
    exact names, augmented variants (title-cased), and hashtag forms."""
    menu: list[str] = []
    for i, e in enumerate(gen_gazetteer(event)):
        norm = normalize_name(e["name"])
        style = i % 4
        if style == 0:
            menu.append(e["name"])
        elif style == 1 and e["alt_names"]:
            menu.append(e["alt_names"][0])
        elif style == 2:
            vs = sorted(name_variants(norm, "hp"))
            menu.append(vs[i % len(vs)].title() if vs else e["name"])
        else:
            menu.append("#" + norm.replace(" ", ""))
    return menu


def transcripts_from_documents(
    docs: DataFrame,
    event: str = "chennai",
    n_convs: int = 200,
    mention_every: int = 5,
    replicas: int = 1,
    dense_turn_idx: bool = True,
) -> DataFrame:
    """documents(doc_id, text, ...) → transcripts. Skew: row_id % 5 == 0
    routes to the hot conversation (~20% of turns). ``replicas``
    multiplies the corpus via explode(sequence(...)) — each replica
    plants a different mention — so bench scales turn volume without
    new source data (and without any driver-side loop)."""
    menu = mention_menu(event)
    menu_arr = F.array(*[F.lit(m) for m in menu])
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"))

    rows = docs.select("doc_id", "text")
    if replicas > 1:
        rows = rows.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("_r"),
        ).select(
            (F.col("doc_id") * replicas + F.col("_r")).alias("doc_id"), "text"
        )

    conv_no = F.when(F.pmod(F.col("doc_id"), F.lit(5)) == 0, F.lit(0)).otherwise(
        F.pmod(F.col("doc_id"), F.lit(n_convs - 1)) + 1
    )
    base = F.substring(F.col("text"), 1, 240)
    planted = F.when(
        F.pmod(F.col("doc_id"), F.lit(mention_every)) < 2,
        F.concat(
            base,
            F.lit(" near "),
            F.element_at(menu_arr, (F.pmod(F.col("doc_id"), F.lit(len(menu))) + 1).cast("int")),
            F.lit(" today"),
        ),
    ).otherwise(base)

    t = rows.select(
        F.concat(F.lit(f"{event}-c"), F.lpad(conv_no.cast("string"), 6, "0")).alias("conv_id"),
        F.col("doc_id").alias("_doc_id"),
        planted.alias("text"),
    )
    if dense_turn_idx:
        # contiguous 0..n-1 per conversation (FIXTURES.md shape) — costs
        # one shuffle with a hot partition (conv 0 holds 20% of turns)
        w = Window.partitionBy("conv_id").orderBy("_doc_id")
        turn_idx = (F.row_number().over(w) - 1).cast("int")
    else:
        # shuffle-free variant for throughput benchmarks: any
        # deterministic per-conv-unique order works as turn_idx
        turn_idx = F.col("_doc_id").cast("int")
    return t.select(
        "conv_id",
        turn_idx.alias("turn_idx"),
        F.element_at(roles, (F.pmod(F.col("_doc_id"), F.lit(3)) + 1).cast("int")).alias("role"),
        "text",
        F.when(F.pmod(F.col("_doc_id"), F.lit(7)) == 0, F.lit("search")).otherwise(F.lit("")).alias("tool"),
        F.timestamp_seconds(F.lit(1767225600) + F.col("_doc_id") * 17).alias("ts"),
    )
