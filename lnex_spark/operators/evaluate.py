"""Triple-level precision/recall/F1 vs gold annotations (E1).

Mirrors the reference's evaluation protocol (gold-annotated tweet sets
for the Chennai 2015 / Louisiana 2016 / Houston 2016 floods, paper §5):
emitted (subj, pred, obj) triples vs gold triples, set semantics.
Pure joins + counts — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gold_triples(annotations: DataFrame) -> DataFrame:
    """annotations(conv_id, turn_idx, start, end, surface, geo_id) →
    distinct gold (subj, pred, obj)."""
    return (
        annotations.select(
            F.concat_ws("#", "conv_id", "turn_idx").alias("subj"),
            F.lit("mentionsLocation").alias("pred"),
            F.col("geo_id").cast("long").alias("obj"),
        )
        .distinct()
    )


def precision_recall(emitted: DataFrame, gold: DataFrame) -> dict[str, float]:
    e = emitted.select("subj", "pred", "obj").distinct()
    g = gold.select("subj", "pred", "obj").distinct()
    tp = e.join(g, ["subj", "pred", "obj"], "inner").count()
    n_e = e.count()
    n_g = g.count()
    p = tp / n_e if n_e else 0.0
    r = tp / n_g if n_g else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "emitted": n_e, "gold": n_g}
