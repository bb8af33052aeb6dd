"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the 100 TB story):
  * exact: hash-groupBy on a normalized md5 fingerprint — one shuffle
    keyed by a 32-char string, partial+final aggregated;
  * MinHash+LSH: shingle → k minhashes → band buckets → bucket-join.
    The self-join is on (band, band_hash) buckets, never all-pairs:
    candidate volume is O(sum of bucket^2), controlled by band width;
  * n-gram Jaccard: exact verification on LSH candidates only (or,
    below a row threshold, on shared-shingle pairs);
  * SimHash: one pandas UDF per doc batch producing a 64-bit
    signature; near-dup = Hamming distance via xor+popcount built-ins.

Hashing is md5-based (not xxhash/murmur) so every step is
reproducible in ANSI SQL for the correctness oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lnex_spark.operators.textquality import fingerprint


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) texts: fingerprint,
    group size, representative (min doc_id). Keep-one policy =
    keep the representative."""
    fp = fingerprint(docs, text_col)
    return (
        fp.groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).

    Built-ins only. The token array is MATERIALIZED in its own
    projection before the higher-order transform: lambda bodies are
    re-evaluated per element, so referencing the raw split() inside
    the lambda would re-split the text once per shingle (measured 5.2s
    -> 0.5s at sf0.1 for this one change)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = docs.select("doc_id", toks.alias("_toks")).where(F.size(F.col("_toks")) >= n)
    return base.select("doc_id", F.explode(_grams(F.col("_toks"), n)).alias("shingle")).distinct()


def _grams(t, n: int):
    """Word n-gram array over a token-array column. TOTAL expression:
    Catalyst does not guarantee a .where() is evaluated before the
    select that follows it, so the short-row case must yield an empty
    array instead of an out-of-bounds element_at (this bit in prod:
    sequence(0, size-n) on a 1-token row produces a DESCENDING
    sequence [0,-1] and the gram lambda then indexes past the array)."""
    idx = F.when(F.size(t) >= n, F.sequence(F.lit(0), F.size(t) - n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j + 1) for j in range(n)])
    )


def minhash_signatures(docs: DataFrame, k: int = 8, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, h in 0..k-1, minhash): minhash_i = min(md5(i || ':' ||
    shingle)). md5-as-hex min over strings ≡ min over the 128-bit
    integer — stable across engines.

    Round-2 plan rewrite (was: explode(sequence(0,k-1)) then
    groupBy(doc_id, h) — the exchange carried k× the shingle volume):
    ONE groupBy(doc_id) with k ``min`` aggregate columns, the k hashes
    computed inline map-side, then an unpivot of the k-ary result.
    The shuffle now carries one k-column row per doc per partition.
    The shingle ``distinct()`` shuffle is also gone: ``min`` is
    idempotent over duplicates, so the minhash over the shingle
    multiset equals the minhash over the distinct set — dedup via
    ``array_distinct`` map-side only, no exchange."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = docs.select("doc_id", toks.alias("_toks")).where(F.size(F.col("_toks")) >= n)
    sh = base.select(
        "doc_id", F.explode(F.array_distinct(_grams(F.col("_toks"), n))).alias("shingle")
    )
    wide = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"_mh{i}")
            for i in range(k)
        ]
    )
    structs = F.array(
        *[
            F.struct(F.lit(i).cast("int").alias("h"), F.col(f"_mh{i}").alias("minhash"))
            for i in range(k)
        ]
    )
    return wide.select("doc_id", F.explode(structs).alias("_s")).select(
        "doc_id", F.col("_s.h").alias("h"), F.col("_s.minhash").alias("minhash")
    )


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 4, max_bucket: int | None = None
) -> DataFrame:
    """Band the k minhashes into ``bands`` buckets; docs sharing any
    (band, band_key) are candidate pairs (a < b). THE scale step:
    pairs are generated per-bucket, never all-pairs.

    Form: group each bucket's doc ids into a sorted array and unroll
    the i<j pairs with array transforms — ONE pass over the signature
    pipeline. (The equivalent self-join evaluates the whole upstream
    plan twice: Catalyst does not reuse the exchange across the two
    aliases of a non-cached self-join.)

    ``max_bucket`` drops degenerate buckets bigger than the limit (a
    bucket of B docs yields B² pairs — on real corpora a boilerplate
    near-identical cluster can otherwise emit billions of pairs);
    None keeps exact LSH semantics."""
    banded = (
        sigs.withColumn("band", F.pmod(F.col("h"), F.lit(bands)))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("|", F.sort_array(F.collect_list("minhash")))).alias("band_key"))
    )
    buckets = (
        banded.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    ids = F.col("ids")
    pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids) - i - 1),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    candidates: DataFrame | None = None,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for near-dup pairs.

    With ``candidates`` (from LSH) verifies only those pairs — the
    scale path. Without, pairs come from shared shingles: each
    shingle's (doc_id, n_sh) postings are grouped into an array and
    the i<j pairs unrolled — ONE pass over the shingle pipeline
    (a naive self-join evaluates it twice and still needs a third
    pass for sizes; n_sh rides along from the pre-explode array size
    instead).

    ``max_doc_freq`` drops shingles occurring in more than that many
    docs ("stop shingles" — boilerplate n-grams whose postings create
    quadratic pair blowups; a B-doc shingle yields B² candidate pairs).
    None keeps exact semantics; with a cap, pairs whose ONLY shared
    shingles are boilerplate are missed — the standard trade."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = docs.select("doc_id", toks.alias("_toks")).where(F.size(F.col("_toks")) >= n)
    sh = base.select(
        "doc_id", F.array_distinct(_grams(F.col("_toks"), n)).alias("_g")
    ).select("doc_id", F.size("_g").alias("n_sh"), F.explode("_g").alias("shingle"))

    postings = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ps")
    ).filter(F.size("ps") > 1)
    if max_doc_freq is not None:
        postings = postings.filter(F.size("ps") <= max_doc_freq)
    ps = F.col("ps")
    pairs = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + F.lit(2), F.size(ps) - i - 1),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    y["doc_id"].alias("doc_b"),
                    x["n_sh"].alias("n_a"),
                    y["n_sh"].alias("n_b"),
                ),
            ),
        )
    )
    common = (
        postings.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.n_a", "p.n_b")
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_common"))
    )
    if candidates is not None:
        common = common.join(candidates, ["doc_a", "doc_b"], "left_semi")
    return common.select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc — fully relational since round 2 (the
    round-1 pandas UDF looped Python-side over tokens with one
    hashlib.md5 call each; at 100 TB that loop IS the stage).

    Plan: explode tokens → JVM-side md5 → split the first 16 hex chars
    into two 32-bit halves (``conv`` hex→decimal; each half fits a
    long) → 64 ``sum(bit*2-1)`` aggregate columns in ONE
    groupBy(doc_id) (map-side partial: the exchange carries one 64-ary
    row per doc per partition, not 64× the token volume) → reassemble
    the signature with bit 63 as -(2^63) for two's-complement.  Every
    step is whole-stage-codegen built-ins; bit values are identical to
    the old UDF (hv = big-endian first 8 md5 bytes, bit b = (hv>>b)&1,
    majority vote acc>0), so the DuckDB oracle is unchanged."""
    tok = (
        docs.select("doc_id", F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"))
        .filter(F.length("tok") > 0)
        .withColumn("w", F.lit(1))
    )
    # zero-weight sentinel per doc keeps empty/whitespace-only/null texts
    # in the aggregate (their acc stays 0 → sig 0, like the old UDF)
    # without a doc-spine join after the groupBy
    sentinel = docs.select("doc_id", F.lit("").alias("tok"), F.lit(0).alias("w"))
    tok = tok.unionByName(sentinel)
    h16 = F.substring(F.md5("tok"), 1, 16)
    hi = F.conv(F.substring(h16, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h16, 9, 8), 16, 10).cast("long")
    aggs = []
    for b in range(64):
        src, sh = (lo, b) if b < 32 else (hi, b - 32)
        bit = F.shiftrightunsigned(src, sh).bitwiseAND(F.lit(1))
        aggs.append(F.sum((bit * 2 - 1) * F.col("w")).alias(f"_a{b}"))
    wide = tok.groupBy("doc_id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(64):
        term = F.lit(-(1 << 63)) if b == 63 else F.lit(1 << b)
        sig = sig + F.when(F.col(f"_a{b}") > 0, term).otherwise(F.lit(0))
    return wide.select("doc_id", sig.alias("simhash"))


def simhash_near_dups(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dups by SimHash Hamming distance. Blocking on 16-bit bands
    (a pair within distance 3 shares at least one of 4 bands exact) —
    same LSH trick, built-ins only: xor + bit_count.

    Bucket-array pair unrolling (not a self-join): a self-join would
    evaluate the whole signature plan twice (64-column hash agg + its
    exchange) — see lsh_candidate_pairs for the pattern rationale."""
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("ps"))
        .filter(F.size("ps") > 1)
    )
    ps = F.col("ps")
    pairs = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + F.lit(2), F.size(ps) - i - 1),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    y["doc_id"].alias("doc_b"),
                    F.bit_count(x["simhash"].bitwiseXOR(y["simhash"])).alias("hamming"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def blocking_quality(
    candidates: DataFrame, truth: DataFrame, universe: DataFrame
) -> DataFrame:
    """One-row blocking-evaluation report for entity resolution /
    near-dup detection: did the cheap candidate generator (LSH bands,
    blocking keys) keep the pairs that matter while pruning the
    quadratic pair space?

      * reduction_ratio   = 1 - |candidates| / (n·(n-1)/2)
        — how much of the all-pairs comparison space was pruned
      * pair_completeness = |candidates ∩ truth| / |truth|
        — recall of the true near-dup pairs (the LSH guarantee)

    ``universe`` is the doc set the pair space is counted over.  All
    inputs are pair/doc-count-sized aggregates: three counts + one
    left-semi join, no quadratic work — the report itself must stay
    cheap at corpus scale or it defeats the blocking it evaluates.
    """
    cand = candidates.select("doc_a", "doc_b").distinct()
    tr = truth.select("doc_a", "doc_b").distinct()
    caught = cand.join(tr, ["doc_a", "doc_b"], "left_semi")
    n_c = cand.agg(F.count("*").alias("n_candidates"))
    n_t = tr.agg(F.count("*").alias("n_true"))
    n_g = caught.agg(F.count("*").alias("n_caught"))
    n_u = universe.agg(F.count("*").alias("n_docs"))
    return (
        n_c.crossJoin(n_t)
        .crossJoin(n_g)
        .crossJoin(n_u)
        .select(
            "n_docs",
            "n_candidates",
            "n_true",
            "n_caught",
            F.round(
                1.0 - F.col("n_candidates") / (F.col("n_docs") * (F.col("n_docs") - 1) / 2.0),
                6,
            ).alias("reduction_ratio"),
            F.round(F.col("n_caught") * 1.0 / F.col("n_true"), 6).alias(
                "pair_completeness"
            ),
        )
    )


def prefix_filter_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """AllPairs/PPJoin-style prefix-filtered exact set-similarity join.

    Emits every doc pair with shingle-Jaccard >= ``threshold`` —
    exactly (no candidate loss) — but generates candidates from
    PREFIXES only: with each doc's distinct shingles sorted
    rarest-first (global doc-frequency order), two docs can reach
    Jaccard t only if they share a shingle among each one's first
    ``|s| - ceil(t*|s|) + 1`` shingles (Bayardo, Ma & Srikant,
    "Scaling Up All Pairs Similarity Search", WWW'07).  Joining on
    prefix shingles instead of all shingles — plus the length filter
    ``t*|a| <= |b|`` — bounds the candidate blowup that makes the
    naive shared-shingle join quadratic on boilerplate n-grams, and
    the prefix entries are by construction the RAREST shingles, so
    their postings lists are the shortest ones in the corpus.

    Scale shape: one hash agg for doc frequencies (vocabulary-sized —
    broadcastable), one shingle-keyed join to attach df, one per-doc
    sort+collect, then the prefix self-join and an exact
    array_intersect verify over the candidate pairs.  Complements
    ``jaccard_pairs`` (postings-unroll with a lossy stop-shingle cap)
    and ``lsh_candidate_pairs`` (probabilistic): this path is exact
    AND bounded.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = docs.select("doc_id", toks.alias("_toks")).where(F.size(F.col("_toks")) >= n)
    sh = base.select("doc_id", F.array_distinct(_grams(F.col("_toks"), n)).alias("_g"))
    ex = sh.select(
        "doc_id", F.size("_g").alias("n_sh"), F.explode("_g").alias("shingle")
    )
    dfreq = ex.groupBy("shingle").agg(F.count("*").alias("df"))
    ordered = (
        ex.join(dfreq, "shingle")
        .groupBy("doc_id", "n_sh")
        .agg(F.sort_array(F.collect_list(F.struct("df", "shingle"))).alias("os"))
    )
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + F.lit(1)
    ).cast("int")
    pref = ordered.select(
        "doc_id",
        "n_sh",
        F.explode(
            F.transform(F.slice("os", F.lit(1), prefix_len), lambda s: s["shingle"])
        ).alias("shingle"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.n_sh") >= F.lit(threshold) * F.col("a.n_sh"))
            & (F.col("a.n_sh") >= F.lit(threshold) * F.col("b.n_sh")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ga = sh.select(F.col("doc_id").alias("doc_a"), F.col("_g").alias("_ga"))
    gb = sh.select(F.col("doc_id").alias("doc_b"), F.col("_g").alias("_gb"))
    inter = F.size(F.array_intersect("_ga", "_gb"))
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                inter / (F.size("_ga") + F.size("_gb") - inter), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
