"""Group I — multimodal columns: opaque binary payloads + typed metadata.

- I1 `mm_binary_meta` — build a binary payload column (deterministically
  derived from document text, standing in for image/audio bytes) and extract
  typed metadata: byte length, magic-prefix hex, content digest, and
  hash-derived fake decode dims (width/height/frames).

The decode/resize/frame-sample plumbing (I2) lives in
`australian_company_etl_spark/operators/multimodal.py` — real mapInPandas
schema/batch plumbing, stubbed decoder (no image libs in this environment).

Scale: stateless column expressions over a binary column — the 100 TB story
is parquet binary chunks scanned with column pruning (payload column only
read where needed) and all metadata derivable without shipping bytes to
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from australian_company_etl_spark.functions.partitioning import spread_if_narrow
from australian_company_etl_spark.functions.textfns import phash_spark, phash_sql
from australian_company_etl_spark.sources.registry import load_tables


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1 — binary payload + typed metadata (hash-derived decode dims)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    payload = F.encode(F.col("text"), "UTF-8")
    d = docs.withColumn("h", phash_spark(F.col("text")))
    return d.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("byte_len"),
        F.lower(F.hex(F.encode(F.substring(F.col("text"), 1, 8), "UTF-8"))).alias("magic_hex"),
        F.md5("text").alias("digest"),
        (64 + F.col("h") % 1857).cast("int").alias("width"),
        # integer div: double division would lose precision on 60-bit hashes
        (64 + F.expr("h div 1857") % 1017).cast("int").alias("height"),
        (1 + F.col("h") % 240).cast("int").alias("n_frames"),
    )


MM_BINARY_META_SQL = f"""
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS byte_len,
       lower(hex(encode(substring(text, 1, 8)))) AS magic_hex,
       md5(text) AS digest,
       (64 + {phash_sql('text')} % 1857)::INT AS width,
       (64 + ({phash_sql('text')} // 1857) % 1017)::INT AS height,
       (1 + {phash_sql('text')} % 240)::INT AS n_frames
FROM documents
"""


# ── I3/I4 — REAL audio codec roundtrip (WAV/PCM, no stub) ───────────────────
# Unlike images/video (codec libs absent → declared stub), audio needs only
# struct + numpy: documents synthesize to genuine RIFF/WAVE 16-bit PCM bytes
# (readable by stdlib `wave` — tests verify), which a chunk-walking decoder
# parses back inside Arrow-batched mapInPandas. Every feature is exact
# integer arithmetic, so DuckDB reproduces the numbers straight from the
# text characters without ever seeing the binary — an INDEPENDENT oracle on
# a real codec path.


def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3 — text → WAV bytes → decode → exact PCM features
    (encode + decode both real codec passes over the Arrow boundary)."""
    from australian_company_etl_spark.operators.multimodal import (
        attach_wav_payload,
        audio_features,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    docs = spread_if_narrow(docs, "doc_id")
    return audio_features(attach_wav_payload(docs))


def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4 — the audio 'resize': 4× stride decimation, re-encoded and
    re-decoded through the codec, then the same exact features."""
    from australian_company_etl_spark.operators.multimodal import (
        attach_wav_payload,
        audio_features,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    docs = spread_if_narrow(docs, "doc_id")
    return audio_features(attach_wav_payload(docs), decimate=4)


def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5 — REAL image codec path: text → 24bpp BMP bytes (padded bottom-up
    rows per spec) → header-parsing decode → exact integer pixel features.
    Compressed formats (PNG/JPEG/video) remain the declared stub."""
    from australian_company_etl_spark.operators.multimodal import (
        attach_bmp_payload,
        image_features,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    docs = spread_if_narrow(docs, "doc_id")
    return image_features(attach_bmp_payload(docs))


# the encoders synthesize from text.encode('ascii', errors='replace'):
# every non-ASCII character becomes '?' (63). The oracles model that with
# an explicit >127→63 clamp, so parity is exact for ANY unicode text, not
# just the ASCII corpus (an unclamped codepoint ≥192 would also overflow
# the WAV path's int16 on the Spark side).
_PX = "CASE WHEN ascii(substring(text, i, 1)) > 127 THEN 63 ELSE ascii(substring(text, i, 1)) END"

_IMAGE_SQL = f"""
SELECT doc_id,
       16 AS width,
       CAST(greatest((length(text) + 15) // 16, 1) AS INT) AS height,
       CAST(16 * greatest((length(text) + 15) // 16, 1) AS BIGINT) AS n_px,
       CAST(coalesce(list_sum(px), 0) AS BIGINT) AS sum_px,
       CAST(coalesce(list_max(px), 0) AS INT) AS max_px,
       CAST(CASE WHEN length(text) > 0
                 THEN floor(coalesce(list_sum(px), 0)::DOUBLE
                            / (16 * greatest((length(text) + 15) // 16, 1)) * 10000)
                 ELSE 0 END AS BIGINT) AS mean_e4
FROM (SELECT doc_id, text,
             list_transform(range(1, length(text) + 1),
                            i -> {_PX}) AS px
      FROM documents)
"""


def _audio_sql(step: int) -> str:
    # samples from characters: (clamped codepoint − 64) · 256, 1-based index
    # with stride `step` — identical to the decoded PCM by construction
    samples = (
        f"list_transform(range(1, length(text) + 1, {step}), "
        f"i -> CAST((({_PX}) - 64) * 256 AS BIGINT))"
    )
    # coalesce(len(s), 0): NULL text yields a NULL sample list here, but
    # the encoder's contract is NULL text → empty (0-sample) WAV, so the
    # decoded Spark side reports n_samples=0 — the one feature column that
    # was missing the coalesce its siblings already carry (NULL-heavy-
    # corpus sweep finding)
    return f"""
SELECT doc_id,
       8000 AS sample_rate,
       CAST(coalesce(len(s), 0) AS BIGINT) AS n_samples,
       CAST(coalesce(list_max(list_transform(s, x -> abs(x))), 0) AS BIGINT) AS peak,
       CAST(coalesce(list_sum(list_transform(s, x -> x * x)), 0) AS BIGINT) AS sum_sq,
       CAST(CASE WHEN len(s) > 0
                 THEN floor(sqrt(list_sum(list_transform(s, x -> x * x))::DOUBLE / len(s)) * 10000)
                 ELSE 0 END AS BIGINT) AS rms_e4
FROM (SELECT doc_id, {samples} AS s FROM documents)
"""


def mm_video_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I6 — REAL video container path: text → uncompressed RIFF/AVI bytes
    (24bpp DIB frames in the standard hdrl/movi layout) → chunk-walking
    decode → every 2nd frame sampled → exact integer pixel features over
    the sampled frames. This is the keyframe-sampling dataflow of a video
    preprocessing pipeline with a real demuxer; only compressed codecs
    (H.264/JPEG) remain behind the declared stub."""
    from australian_company_etl_spark.operators.multimodal import (
        attach_avi_payload,
        video_frame_sample_features,
    )

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    docs = spread_if_narrow(docs, "doc_id")
    return video_frame_sample_features(attach_avi_payload(docs), stride=2)


# frames hold 32 chars each (8×4, zero-padded); stride-2 sampling keeps
# frames 0,2,4,… — i.e. chars whose 0-based frame index is even. The zero
# padding adds nothing to sum/max, so the oracle reproduces every feature
# from the characters alone.
_VIDEO_SQL = f"""
WITH base AS (
  SELECT doc_id,
         greatest((length(text) + 31) // 32, 1) AS n_frames,
         list_transform(range(1, length(text) + 1),
                        i -> CASE WHEN ((i - 1) // 32) % 2 = 0
                                  THEN {_PX} END) AS px0
  FROM documents
),
s AS (
  SELECT doc_id, n_frames,
         (n_frames + 1) // 2 AS n_sampled,
         list_filter(px0, x -> x IS NOT NULL) AS px
  FROM base
)
SELECT doc_id,
       n_frames::INT AS n_frames,
       n_sampled::INT AS n_sampled,
       (32 * n_sampled)::BIGINT AS n_px,
       CAST(coalesce(list_sum(px), 0) AS BIGINT) AS sum_px,
       CAST(coalesce(list_max(px), 0) AS INT) AS max_px,
       CAST(floor(coalesce(list_sum(px), 0)::DOUBLE / (32 * n_sampled) * 10000)
            AS BIGINT) AS mean_e4
FROM s
"""


QUERIES = {
    "mm_binary_meta": mm_binary_meta,
    "mm_audio_features": mm_audio_features,
    "mm_audio_resample": mm_audio_resample,
    "mm_image_features": mm_image_features,
    "mm_video_framesample": mm_video_framesample,
}
ORACLES = {
    "mm_binary_meta": MM_BINARY_META_SQL,
    "mm_audio_features": _audio_sql(1),
    "mm_audio_resample": _audio_sql(4),
    "mm_image_features": _IMAGE_SQL,
    "mm_video_framesample": _VIDEO_SQL,
}
