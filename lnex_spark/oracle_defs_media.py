"""Real-media-decode oracle pairs (BMP/PPM/WAV/VID0 — media_codec.py).

Round 1's multimodal pillar was plumbing-real but compute-fake.  These
ops make the compute real AND value-checked end-to-end: the Spark side
synthesizes actual encoded payloads (deterministic from doc_id), decodes
them byte-for-byte with the pure-numpy codecs, and emits integer-exact
statistics; the DuckDB oracle recomputes every statistic from the
closed-form pixel/sample formulas (see multimodal._synth_payload) —
never seeing the bytes.  A match therefore proves the encoder AND
decoder agree with the spec: a BGR/RGB swap, a bottom-up row flip, a
missed BMP row pad, or a RIFF chunk-walk bug each breaks a different
statistic (y_sum is the channel-order canary; px_sum catches padding;
frame sums catch container slicing; resize sums catch the NN gather).

All outputs are integer sums/counts — the one value class a pandas-based
canonicalizer cannot format-diverge on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lnex_spark.oracles import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lnex_spark.operators.multimodal import synthesize_real_media

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return synthesize_real_media(docs)


@register(
    "media_image_stats",
    """
    WITH img AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 0),
    cols AS (SELECT media_id, c FROM img, LATERAL (SELECT unnest(range(0, 32)) AS c) t),
    v AS (SELECT media_id, (c + ch + media_id) % 256 AS v
          FROM cols, LATERAL (SELECT unnest(range(0, 3)) AS ch) t2),
    agg_v AS (SELECT media_id,
                     CAST(16 * sum(v) AS BIGINT) AS px_sum,
                     CAST(min(v) AS INT) AS px_min,
                     CAST(max(v) AS INT) AS px_max
              FROM v GROUP BY media_id),
    agg_y AS (SELECT media_id,
                     CAST(16 * sum((77 * ((c + media_id) % 256)
                                  + 150 * ((c + 1 + media_id) % 256)
                                  + 29 * ((c + 2 + media_id) % 256)) // 256) AS BIGINT) AS y_sum
              FROM cols GROUP BY media_id)
    SELECT media_id,
           CASE WHEN media_id % 2 = 0 THEN 'bmp' WHEN media_id % 4 = 1 THEN 'ppm' ELSE 'png' END AS fmt,
           CAST(32 AS INT) AS width, CAST(16 AS INT) AS height,
           px_sum, px_min, px_max, y_sum
    FROM agg_v JOIN agg_y USING (media_id)
    """,
)
def media_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode real BMP/P6 bytes (format sniffed per row) → integer pixel
    stats.  The oracle never decodes — it recomputes the closed form, so
    a codec bug (BGR order, row flip, row padding) fails the hash."""
    from lnex_spark.operators.multimodal import image_stats

    return image_stats(_media(spark, sf_dir))


@register(
    "media_audio_stats",
    """
    WITH aud AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 1),
    s AS (SELECT media_id, i, (7 * i + media_id) % 512 - 256 AS v
          FROM aud, LATERAL (SELECT unnest(range(0, 2000)) AS i) t),
    lagged AS (SELECT media_id, v,
                      lag(v) OVER (PARTITION BY media_id ORDER BY i) AS pv
               FROM s)
    SELECT media_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(16000 AS INT) AS sample_rate,
           CAST(sum(v) AS BIGINT) AS amp_sum,
           CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
           CAST(max(abs(v)) AS INT) AS peak,
           CAST(count(*) FILTER (WHERE pv IS NOT NULL AND pv * v < 0) AS BIGINT) AS zero_cross
    FROM lagged GROUP BY media_id
    """,
)
def media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode real RIFF/WAVE PCM16 bytes (chunk walk, not a fixed 44-byte
    assumption) → integer sample stats vs the closed-form oracle."""
    from lnex_spark.operators.multimodal import audio_stats_op

    return audio_stats_op(_media(spark, sf_dir))


@register(
    "media_frame_stats",
    """
    WITH vid AS (SELECT doc_id AS media_id, doc_id % 5 + 1 AS nf
                 FROM documents WHERE doc_id % 3 = 2),
    fr AS (SELECT media_id, f FROM vid, LATERAL (SELECT unnest(range(0, nf)) AS f) t),
    px AS (SELECT media_id, f, (c + 3 * f + ch + media_id) % 256 AS v
           FROM fr,
                LATERAL (SELECT unnest(range(0, 8)) AS c) t1,
                LATERAL (SELECT unnest(range(0, 3)) AS ch) t2)
    SELECT media_id, CAST(f AS INT) AS frame_no, CAST(16 * sum(v) AS BIGINT) AS px_sum
    FROM px GROUP BY media_id, f
    """,
)
def media_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real frame extraction: walk VID0 length prefixes, decode each P6
    frame, emit per-frame pixel sums.  One input row fans out to
    n_frames output rows inside the Arrow batch."""
    from lnex_spark.operators.multimodal import frame_stats

    return frame_stats(_media(spark, sf_dir))


@register(
    "media_resize_stats",
    """
    WITH img AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 0),
    px AS (SELECT media_id, (4 * cc + ch + media_id) % 256 AS v
           FROM img,
                LATERAL (SELECT unnest(range(0, 8)) AS cc) t1,
                LATERAL (SELECT unnest(range(0, 3)) AS ch) t2)
    SELECT media_id, CAST(8 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
           CAST(8 * sum(v) AS BIGINT) AS px_sum
    FROM px GROUP BY media_id
    """,
)
def media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → nearest-neighbor 8×8 resize → pixel sum.  The oracle
    recomputes through the NN index map (src_c = 4·dst_c for 32→8, rows
    constant), so the gather itself is value-checked."""
    from lnex_spark.operators.multimodal import resize_stats

    return resize_stats(_media(spark, sf_dir), out_h=8, out_w=8)
