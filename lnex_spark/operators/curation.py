"""Training-data curation operators: deterministic splits, class
rebalancing, PII scrubbing, benchmark-contamination detection, and a
quality-filter funnel with drop-reason attribution.

These are the corpus-hygiene steps a 100 TB pretraining pipeline runs
between raw ingestion and tokenization.  Everything is built-in
column expressions — no Python UDFs — so each op whole-stage-codegens
and scales as a single scan (+ one hash agg where counting).

Determinism is the design constraint throughout: split assignment and
sampling use content hashing (md5 prefix gating), never engine RNG,
so assignments are stable across engines, reruns, repartitioning, and
cluster sizes — the property that makes a split auditable and a
resumable job idempotent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16-bit hash space for md5-prefix gating (4 hex chars)
_HASH_SPACE = 1 << 16


def hash_bucket(id_col: Column, salt: str) -> Column:
    """Deterministic bucket in [0, 65536) from md5(salt # id)."""
    h = F.md5(F.concat(F.lit(salt + "#"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long")


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Append a ``split`` column assigning each row to a named split.

    Cumulative md5-bucket thresholds: a row lands in the first split
    whose cumulative weight exceeds its bucket fraction.  Adding rows
    never reassigns existing ones; changing ``salt`` draws a fresh
    assignment.  Pure projection — no shuffle, no RNG.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = hash_bucket(F.col(id_col), salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(cum * _HASH_SPACE)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def class_weights(df: DataFrame, label_col: str = "label") -> DataFrame:
    """(label, n, weight) inverse-frequency rebalancing weights:
    weight = N / (k · n_label), so a perfectly balanced corpus gets
    weight 1.0 everywhere.  Two tiny aggs; the (k, N) scalars ride a
    1-row broadcast cross join, never the driver."""
    per = df.groupBy(label_col).agg(F.count("*").alias("n"))
    tot = per.agg(F.sum("n").alias("total"), F.count("*").alias("k"))
    return per.crossJoin(F.broadcast(tot)).select(
        label_col,
        "n",
        F.round(F.col("total") / (F.col("k") * F.col("n")), 6).alias("weight"),
    )


# PII patterns — deliberately RE2-compatible (no backrefs, no
# lookaround) so the same pattern string runs in Spark (Java regex),
# DuckDB (RE2), and Flink/Trino if ported.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<email>"),
    (r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<phone>"),
    (r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<ip>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text", out_col: str = "scrubbed") -> DataFrame:
    """Replace emails, phone numbers, and IPv4 addresses with typed
    placeholder tokens.  A chain of regexp_replace — one codegen'd
    projection, order matters (emails first: an email must not be
    half-eaten by the phone pattern)."""
    c = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return df.withColumn(out_col, c)


def contamination(
    train: DataFrame, bench: DataFrame, n: int = 5
) -> DataFrame:
    """Per-benchmark-doc n-gram contamination against a training corpus.

    (doc_id, n_grams, n_hit, contaminated) — n_hit is how many of the
    bench doc's distinct word n-grams appear anywhere in train.  The
    join runs shingle-keyed (one shuffle on the n-gram string); at
    100 TB the train side is the big one, so Spark hash-partitions
    both on the shingle and the bench side (tiny) broadcasts if under
    threshold — either plan gives the same counts.
    """
    from lnex_spark.operators.dedup import shingles

    t_sh = shingles(train, n=n).select("shingle").distinct()
    b_sh = shingles(bench, n=n)
    per = b_sh.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        b_sh.join(t_sh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        per.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def quality_funnel(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """First-failing-rule attribution for a filter chain:
    too_short → high_punct → dup_fingerprint → kept.

    Returns (reason, n) counts.  Rules are evaluated as one CASE
    projection; the duplicate rule keeps the smallest doc_id per
    normalized-text fingerprint (deterministic survivor), which needs
    the one hash agg in the op.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.when(F.length(F.trim(t)) == 0, 0).otherwise(F.size(F.split(F.trim(t), r"\s+")))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    fp = F.md5(F.lower(F.trim(t)))

    with_fp = docs.select(F.col("doc_id"), t.alias("_t"), fp.alias("_fp"))
    survivor = with_fp.groupBy("_fp").agg(F.min("doc_id").alias("_keep_id"))
    flagged = with_fp.join(survivor, "_fp").select(
        "doc_id",
        F.col("_t").alias(text_col),
        (F.col("doc_id") != F.col("_keep_id")).alias("_is_dup"),
    )
    reason = (
        F.when(n_tokens < 5, "too_short")
        .when(punct_ratio > 0.2, "high_punct")
        .when(F.col("_is_dup"), "dup_fingerprint")
        .otherwise("kept")
    )
    return flagged.select(reason.alias("reason")).groupBy("reason").agg(
        F.count("*").alias("n")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "wsamp-v1",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis exponential sort): each row gets
    ``skey = -ln(u) / w`` with ``u`` an md5-gated uniform on the
    16-bit lattice, and the k smallest keys win — inclusion odds
    proportional to weight, yet a pure function of content, so the
    sample is identical across engines, reruns, and repartitionings
    (``df.sample``'s engine-private RNG is neither).  Quantized-u
    collisions at equal weight produce exactly equal keys on both
    engines; the id column breaks those ties.  The global top-k plans
    as TakeOrderedAndProject — per-partition heaps, no full sort.
    """
    u = (hash_bucket(F.col(id_col), salt) + 1) / float(_HASH_SPACE + 1)
    key = -F.log(u) / F.col(weight_col)
    return (
        df.withColumn("skey", key)
        .orderBy(F.col("skey").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pack_sequences(
    docs: DataFrame, budget: int = 128, shard_size: int = 100
) -> DataFrame:
    """Greedy first-fit sequence packing — the batch-construction step
    of an LLM training pipeline: assign documents, in doc_id order, to
    token-budgeted bins (a new bin starts whenever adding the next doc
    would exceed ``budget``; an oversized doc gets a bin to itself).

    Packing is inherently sequential, so it is SHARDED: docs are
    grouped into contiguous ``doc_id // shard_size`` shards and packed
    independently per shard — embarrassingly parallel, one
    ``applyInPandas`` island whose per-group state is a shard, not the
    corpus (this is how production packers scale: sequentiality is
    confined to a bounded shard, global order across shards is
    irrelevant to the training batches).  Deterministic: bin ids are a
    pure function of (doc_id, n_tokens) per shard.

    Returns ``(doc_id, shard, bin, n_tokens)`` — bin numbering is
    per-shard, starting at 0.
    """
    from lnex_spark.operators.textquality import token_count_col

    d = docs.select(
        "doc_id",
        F.expr(f"doc_id DIV {int(shard_size)}").alias("shard"),
        token_count_col(F.col("text")).alias("n_tokens"),
    )

    def pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins: list[int] = []
        cur, b = 0, 0
        for i, n in enumerate(pdf["n_tokens"]):
            n = int(n)
            if i == 0:
                cur = n
            elif cur + n > budget:
                b += 1
                cur = n
            else:
                cur += n
            bins.append(b)
        pdf["bin"] = bins
        return pdf[["doc_id", "shard", "bin", "n_tokens"]]

    return d.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard long, bin long, n_tokens long"
    )


def curate_transcripts(
    t: DataFrame,
    budget: int = 120,
    shards: int = 8,
    min_turns: int = 10,
    len_band: tuple[float, float] = (5.0, 200.0),
) -> DataFrame:
    """The transcript-curation flagship composition: conversation-level
    exact dedup → conversation quality gate → digit-run PII mask →
    previous-3-turn context assembly → sharded greedy sequence packing.
    Input: (conv_id, turn_idx, role, text); output one row per packed
    training sequence (seq_id, n_pairs, n_tokens).

    Scale shape: ONE groupBy(conv_id) computes fingerprint + gate stats
    (sort_array(collect_list(struct)) keeps in-group order deterministic
    without a window pass); the survivor list is conversation-cardinality
    and broadcasts back; context assembly and the packing cumsum are
    windows over conv_id / an md5-derived shard key — nothing global, so
    no single-partition running sum at 10^12 turns.  Sequences never
    straddle shards, so per-shard budgets lose nothing.  Zero Python rows.
    Oracle twin: oracle_defs224.curation_flagship."""
    from pyspark.sql import Window

    fp = t.groupBy("conv_id").agg(
        F.md5(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s["text"],
                ),
            )
        ).alias("fingerprint"),
        F.count("*").alias("n_turns"),
        F.avg(F.length("text")).alias("mean_len"),
    )
    keep = fp.groupBy("fingerprint").agg(F.min("conv_id").alias("conv_id"))
    gated = (
        fp.join(keep.select("conv_id"), "conv_id")
        .where(
            (F.col("n_turns") >= min_turns)
            & F.col("mean_len").between(*len_band)
        )
        .select("conv_id")
    )
    clean = t.join(F.broadcast(gated), "conv_id").withColumn(
        "text", F.regexp_replace("text", r"[0-9]{4,}", "<NUM>")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(-3, -1)
    pairs = clean.withColumn(
        "context", F.concat_ws(" <SEP> ", F.collect_list("text").over(w))
    ).where(F.col("role") == "assistant")
    toks = pairs.select(
        "conv_id",
        "turn_idx",
        F.size(F.split(F.trim(F.concat_ws(" ", "context", "text")), r"\s+")).alias(
            "n_tok"
        ),
        (F.conv(F.substring(F.md5("conv_id"), 1, 2), 16, 10).cast("int") % shards).alias(
            "shard"
        ),
    )
    cum_w = (
        Window.partitionBy("shard")
        .orderBy("conv_id", "turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = toks.withColumn("cum", F.sum("n_tok").over(cum_w))
    return packed.groupBy(
        (F.col("shard") * 1000000 + F.floor((F.col("cum") - F.col("n_tok")) / budget))
        .cast("long")
        .alias("seq_id")
    ).agg(
        F.count("*").alias("n_pairs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
