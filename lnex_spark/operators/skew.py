"""Skew handling for the long-tail conv_id distribution (X2).

The transcripts table's conv_id is long-tail skewed (one conversation
can hold a large fraction of all turns). AQE's skew-join splitting
only fixes *joins*; the heavy stage here is the extraction UDF, so we
salt explicitly: repartition on (conv_id, salt) where salt =
pmod(hash(conv_id, turn_idx), S). Deterministic (no rand()) so a
resumed job produces identical partitioning, and turn-level — a hot
conversation spreads across S tasks.

The extraction stage is per-turn stateless, so salting is always
safe; downstream stages that need conv-level grouping (T1 ordering)
re-shuffle on conv_id anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salt_repartition(df: DataFrame, num_partitions: int, salt_buckets: int | None = None) -> DataFrame:
    """salt_buckets must comfortably exceed num_partitions: a hot
    conv_id only spreads across min(salt_buckets, num_partitions)
    tasks, so too few buckets re-creates the skew at high parallelism
    (defaults to 4x partitions)."""
    if salt_buckets is None:
        salt_buckets = num_partitions * 4
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.col("conv_id"), F.col("turn_idx")), F.lit(salt_buckets))
    )
    return salted.repartition(num_partitions, F.col("conv_id"), F.col("_salt")).drop("_salt")


def turn_order(df: DataFrame) -> DataFrame:
    """T1: deterministic per-conversation turn numbering — the ordering
    contract under which per-turn text equality vs the reference holds."""
    w = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").asc())
    return df.withColumn("turn_rank", F.row_number().over(w))


def suggest_salt_partitions(
    df: DataFrame,
    target_parallelism: int,
    max_rows_per_task_factor: float = 1.5,
    sample_fraction: float | None = None,
) -> int | None:
    """Probe the conv_id distribution and decide whether (and how wide)
    to salt before the extraction stage.

    Returns None when the corpus is balanced enough that the hottest
    conversation fits in ~max_rows_per_task_factor x the mean task
    load at ``target_parallelism`` — salting then only buys an extra
    shuffle. Otherwise returns a partition count sized so even the
    hottest key spreads thin: the driver-side cost is ONE tiny
    aggregation (top-1 conv share), optionally over a deterministic
    sample for very large inputs. The decision is made from data, not
    configuration — the same job self-tunes from a uniform corpus to
    one where a single agent conversation holds 20% of all turns.
    """
    probe = df
    if sample_fraction:
        gate = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(1_000_000))
        probe = df.filter(gate < int(sample_fraction * 1_000_000))
    stats = (
        probe.groupBy("conv_id")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("hot"), F.sum("n").alias("total"))
        .first()
    )
    if not stats or not stats.total:
        return None
    mean_task = stats.total / target_parallelism
    if stats.hot <= max_rows_per_task_factor * mean_task:
        return None
    return target_parallelism


def key_skew_profile(df: DataFrame, key: str = "conv_id") -> DataFrame:
    """One-row concentration report of a key distribution: the
    measurement behind ``suggest_salt_partitions``'s yes/no decision,
    kept as an auditable artifact (how skewed IS this corpus?).

    Columns: ``n_keys``, ``total`` rows, ``gini`` (0 = uniform,
    →1 = one key holds everything; computed from the exact rank-
    weighted form 2·Σ i·c_(i) / (k·Σc) − (k+1)/k over counts sorted
    ascending), ``top1_share`` and ``top10_share`` (fraction of all
    rows held by the hottest 1 / 10 keys).

    The rank runs over the per-key COUNT table (key-cardinality-sized)
    — but key cardinality is itself raw-scale for conv_id at 10^12
    turns (up to ~10^9 distinct keys), so the rank is computed with
    the DISTRIBUTED form (operators/scalable_windows.attach_rank:
    range-partition + per-partition offsets — no single-partition
    window over the count table; converted in the round-4 global-
    window audit).  The descending "hot" rank is derived arithmetically
    (rk_hot = n_keys − rk + 1: ordering by (c desc, key desc) is the
    exact reverse of (c asc, key asc)) rather than ranked twice.
    Ordering is fully specified (count, then key) so ranks — and
    therefore the Gini sum — are deterministic under ties.
    """
    from lnex_spark.operators.scalable_windows import attach_rank

    cnt = df.groupBy(key).agg(F.count("*").alias("c"))
    n_keys = cnt.agg(F.count("*").alias("k"))
    ranked = (
        attach_rank(cnt, [F.col("c").asc(), F.col(key).asc()], rank_col="rk")
        .crossJoin(F.broadcast(n_keys))
        .select("c", "rk", (F.col("k") - F.col("rk") + 1).alias("rk_hot"))
    )
    return ranked.agg(
        F.count("*").alias("n_keys"),
        F.sum("c").alias("total"),
        F.round(
            2.0 * F.sum(F.col("rk") * F.col("c")) / (F.count("*") * F.sum("c"))
            - (F.count("*") + 1.0) / F.count("*"),
            6,
        ).alias("gini"),
        F.round(
            F.sum(F.when(F.col("rk_hot") <= 1, F.col("c")).otherwise(0)) / F.sum("c"),
            6,
        ).alias("top1_share"),
        F.round(
            F.sum(F.when(F.col("rk_hot") <= 10, F.col("c")).otherwise(0)) / F.sum("c"),
            6,
        ).alias("top10_share"),
    )
