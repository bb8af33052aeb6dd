"""Triple emission + graph materialization (K1, K2 — the north rule's
KG layer; not present in the reference, which stops at mention lists).

mention_triples(subj='conv_id#turn_idx', pred='mentionsLocation',
obj=geo_id) and region_triples(subj=geo_id, pred='locatedIn',
obj=region). Writes are partitioned and idempotent (overwrite by
partition) so a resumed job converges to the same table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRED_MENTIONS = "mentionsLocation"
PRED_LOCATED_IN = "locatedIn"


def mention_triples(linked_mentions: DataFrame) -> DataFrame:
    """K1a: (conv_id#turn_idx, mentionsLocation, geo_id), distinct."""
    return (
        linked_mentions.select(
            F.concat_ws("#", F.col("conv_id"), F.col("turn_idx")).alias("subj"),
            F.lit(PRED_MENTIONS).alias("pred"),
            F.col("geo_id").cast("long").alias("obj"),
        )
        .distinct()
    )


def region_triples(gazetteer: DataFrame) -> DataFrame:
    """K1b: (geo_id, locatedIn, region), distinct."""
    return (
        gazetteer.select(
            F.col("geo_id").cast("long").alias("subj"),
            F.lit(PRED_LOCATED_IN).alias("pred"),
            F.col("region").alias("obj"),
        )
        .distinct()
    )


def write_triples(df: DataFrame, path: str, partition_cols: list[str] | None = None, mode: str = "overwrite") -> None:
    """K2 via the TableFormat seam (parquet locally, Iceberg on a
    cluster — see sources.tableformat)."""
    from lnex_spark.sources.tableformat import write_table

    write_table(df, path, partition_cols=partition_cols, mode=mode)
