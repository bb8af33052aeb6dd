"""Broadcast-free (planet-scale) matcher: relational n-gram join form.

``extract_mentions_df`` ships the whole gazetteer to every worker as a
broadcast dict — the right call for region-scoped gazetteers (city ≈
10^4-10^5 names, a few MB). When the gazetteer CANNOT be broadcast
(whole-planet OSM ≈ 10^8+ name variants), this module provides the
same extraction as a distributed plan in which the gazetteer stays a
DataFrame end to end:

  A. tokenize (mapInPandas, gazetteer-FREE — only the tiny unigram LM
     for hashtag segmentation is broadcast, and it's optional):
     token rows (conv_id, turn_idx, seg, pos, norm, start, end); a
     new ``seg`` starts at every break token (URL/@mention/punct) or
     hashtag-group boundary, so n-grams can never cross one — the
     relational encoding of the matcher's adjacency rules.
  B. n-gram candidates via ONE window (partition (conv,turn,seg),
     order pos): gram_k = norm ⊕ lead(norm,1) ⊕ … ⊕ lead(norm,k-1),
     end_k = lead(end,k-1), k = 1..max_tokens — all leads share the
     single keyed shuffle; candidates unrolled array-side.
  C. left-semi JOIN against the gazetteer's distinct norms — a plain
     distributed equi-join: Catalyst picks shuffle-hash/SMJ by size,
     AQE handles skew. THIS is the line that scales past broadcast.
  D. exact greedy longest-match-wins per turn (applyInPandas over the
     few matched candidates per turn — same sort key and accept loop
     as the broadcast matcher, so semantics are IDENTICAL, not just
     containment-approximate), then a keyed join back to transcripts
     to cut the surface strings.

Trade: stages B-D cost two keyed shuffles plus the gazetteer join the
broadcast path doesn't pay, and the candidate blow-up is
turns × avg_tokens × max_tokens rows into the join. The differential
test (tests/test_relational_matcher.py) asserts both paths emit
byte-identical mentions on the event fixtures, hashtags included.

The sub-gram prefix pruning of the broadcast matcher is unnecessary
here: pruning exists to avoid probing a dict per grown n-gram; the
join probes every k-gram exactly once by construction.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lnex_spark.operators.textproc import HashtagSegmenter, build_token_stream

TOKEN_SCHEMA = (
    "conv_id string, turn_idx int, seg int, pos int, norm string, start int, end int"
)
_CAND_SCHEMA = "conv_id string, turn_idx int, start int, end int, norm string"


def tokenize_relational(transcripts: DataFrame, bc_unigram=None) -> DataFrame:
    """Stage A: gazetteer-free token rows with segment ids."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        segmenter = (
            HashtagSegmenter(bc_unigram.value) if bc_unigram is not None else None
        )
        for pdf in batches:
            conv, turn, seg_c, pos_c, norm_c, s_c, e_c = [], [], [], [], [], [], []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"].values, pdf["turn_idx"].values, pdf["text"].values
            ):
                if not text:
                    continue
                seg, pos, prev_group = 0, 0, -1
                for norm, start, end, brk, group in build_token_stream(text, segmenter):
                    if brk or not norm:
                        seg, pos, prev_group = seg + 1, 0, -1
                        continue
                    if group != prev_group:
                        if prev_group != -1 or group != -1:
                            seg, pos = seg + 1, 0
                        prev_group = group
                    conv.append(conv_id)
                    turn.append(turn_idx)
                    seg_c.append(seg)
                    pos_c.append(pos)
                    norm_c.append(norm)
                    s_c.append(start)
                    e_c.append(end)
                    pos += 1
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(conv, dtype="object"),
                    "turn_idx": pd.Series(turn, dtype="int32"),
                    "seg": pd.Series(seg_c, dtype="int32"),
                    "pos": pd.Series(pos_c, dtype="int32"),
                    "norm": pd.Series(norm_c, dtype="object"),
                    "start": pd.Series(s_c, dtype="int32"),
                    "end": pd.Series(e_c, dtype="int32"),
                }
            )

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        run, schema=TOKEN_SCHEMA
    )


def ngram_candidates(tokens: DataFrame, max_tokens: int = 4) -> DataFrame:
    """Stage B: all 1..max_tokens grams per segment, one shuffle."""
    w = Window.partitionBy("conv_id", "turn_idx", "seg").orderBy("pos")
    # window exprs can't live under explode — materialize gram_k/end_k
    # as plain columns first (all leads share the one window spec)
    proj = [F.col("conv_id"), F.col("turn_idx"), F.col("start")]
    gram_expr = F.col("norm")
    for k in range(1, max_tokens + 1):
        if k > 1:
            nxt = F.lead("norm", k - 1).over(w)
            gram_expr = F.when(
                nxt.isNotNull(), F.concat(gram_expr, F.lit(" "), nxt)
            )
        end_k = F.col("end") if k == 1 else F.lead("end", k - 1).over(w)
        proj.append(gram_expr.alias(f"g{k}"))
        proj.append(end_k.alias(f"e{k}"))
    staged = tokens.select(*proj)
    unrolled = staged.select(
        "conv_id",
        "turn_idx",
        "start",
        F.explode(
            F.array(
                *[
                    F.struct(F.col(f"g{k}").alias("g"), F.col(f"e{k}").alias("e"))
                    for k in range(1, max_tokens + 1)
                ]
            )
        ).alias("c"),
    )
    return unrolled.where(F.col("c.g").isNotNull()).select(
        "conv_id", "turn_idx", "start", F.col("c.e").alias("end"), F.col("c.g").alias("norm")
    )


def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
    cands = sorted(
        zip(pdf["start"].values, pdf["end"].values, pdf["norm"].values),
        key=lambda c: (-(c[1] - c[0]), c[0], c[2]),
    )
    accepted: list[tuple[int, int, str]] = []
    for s, e, g in cands:
        if all(e <= as_ or s >= ae for as_, ae, _ in accepted):
            accepted.append((int(s), int(e), g))
    accepted.sort()
    return pd.DataFrame(
        {
            "conv_id": pd.Series([pdf["conv_id"].iat[0]] * len(accepted), dtype="object"),
            "turn_idx": pd.Series([pdf["turn_idx"].iat[0]] * len(accepted), dtype="int32"),
            "start": pd.Series([a[0] for a in accepted], dtype="int32"),
            "end": pd.Series([a[1] for a in accepted], dtype="int32"),
            "norm": pd.Series([a[2] for a in accepted], dtype="object"),
        }
    )


def extract_mentions_relational(
    transcripts: DataFrame,
    variants: DataFrame,
    max_tokens: int = 4,
    bc_unigram=None,
) -> DataFrame:
    """The full broadcast-free path (module docstring). ``variants``
    needs only a ``norm`` column; it is never collected."""
    tokens = tokenize_relational(transcripts, bc_unigram)
    cands = ngram_candidates(tokens, max_tokens)
    matched = cands.join(
        variants.select("norm").distinct(), "norm", "left_semi"
    )
    resolved = matched.groupBy("conv_id", "turn_idx").applyInPandas(
        _greedy, schema=_CAND_SCHEMA
    )
    return resolved.join(
        transcripts.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"]
    ).select(
        "conv_id",
        "turn_idx",
        "start",
        "end",
        F.expr("substring(text, start + 1, end - start)").alias("surface"),
        "norm",
    )
