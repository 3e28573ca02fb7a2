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
#
# Char-FANOUT form, not substring-in-lambda (round 11, long_doc regime):
# `substring(text, i, 1)` inside a per-position lambda is O(n) per call on
# a large VARCHAR in DuckDB (codepoint seek against the captured string),
# so the old per-position list_transform was O(n²) per document — the
# same defect class as the round-10 shingle SQL, invisible at 4k chars and
# a hang at the 1M-token envelope. One regexp_extract_all pass splits the
# text to codepoints in O(n); positions zip in via a parallel unnest.
_CHARS_CTE = """chars AS (
  SELECT doc_id, pos,
         CASE WHEN ascii(ch) > 127 THEN 63 ELSE ascii(ch) END AS px
  FROM (SELECT doc_id, unnest(cs) AS ch, unnest(range(1, len(cs) + 1)) AS pos
        FROM (SELECT doc_id, regexp_extract_all(text, '(?s).') AS cs FROM documents))
)"""

_IMAGE_SQL = f"""
WITH {_CHARS_CTE},
agg AS (SELECT doc_id, sum(px) AS s, max(px) AS m FROM chars GROUP BY doc_id)
SELECT d.doc_id,
       16 AS width,
       CAST(greatest((length(d.text) + 15) // 16, 1) AS INT) AS height,
       CAST(16 * greatest((length(d.text) + 15) // 16, 1) AS BIGINT) AS n_px,
       CAST(coalesce(a.s, 0) AS BIGINT) AS sum_px,
       CAST(coalesce(a.m, 0) AS INT) AS max_px,
       CAST(CASE WHEN length(d.text) > 0
                 THEN floor(coalesce(a.s, 0)::DOUBLE
                            / (16 * greatest((length(d.text) + 15) // 16, 1)) * 10000)
                 ELSE 0 END AS BIGINT) AS mean_e4
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def _audio_sql(step: int) -> str:
    # samples from characters: (clamped codepoint − 64) · 256, 1-based
    # positions 1, 1+step, … — identical to the decoded PCM by
    # construction. NULL/empty text yields no char rows, so every feature
    # coalesces to 0 — the encoder's NULL text → empty (0-sample) WAV
    # contract (NULL-heavy-corpus sweep finding).
    return f"""
WITH {_CHARS_CTE},
s AS (
  SELECT doc_id, CAST((px - 64) * 256 AS BIGINT) AS x
  FROM chars WHERE (pos - 1) % {step} = 0
),
agg AS (
  SELECT doc_id, count(*) AS n, max(abs(x)) AS peak, sum(x * x) AS ssq
  FROM s GROUP BY doc_id
)
SELECT d.doc_id,
       8000 AS sample_rate,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_samples,
       CAST(coalesce(a.peak, 0) AS BIGINT) AS peak,
       CAST(coalesce(a.ssq, 0) AS BIGINT) AS sum_sq,
       CAST(CASE WHEN coalesce(a.n, 0) > 0
                 THEN floor(sqrt(a.ssq::DOUBLE / a.n) * 10000)
                 ELSE 0 END AS BIGINT) AS rms_e4
FROM documents d LEFT JOIN agg a USING (doc_id)
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
# from the characters alone (char-fanout form — see _CHARS_CTE).
_VIDEO_SQL = f"""
WITH {_CHARS_CTE},
agg AS (
  SELECT doc_id, sum(px) AS s, max(px) AS m
  FROM chars WHERE ((pos - 1) // 32) % 2 = 0
  GROUP BY doc_id
),
s AS (
  SELECT d.doc_id,
         greatest((length(d.text) + 31) // 32, 1) AS n_frames,
         (greatest((length(d.text) + 31) // 32, 1) + 1) // 2 AS n_sampled,
         coalesce(a.s, 0) AS sum_px,
         coalesce(a.m, 0) AS max_px
  FROM documents d LEFT JOIN agg a USING (doc_id)
)
SELECT doc_id,
       n_frames::INT AS n_frames,
       n_sampled::INT AS n_sampled,
       (32 * n_sampled)::BIGINT AS n_px,
       CAST(sum_px AS BIGINT) AS sum_px,
       CAST(max_px AS INT) AS max_px,
       CAST(floor(sum_px::DOUBLE / (32 * n_sampled) * 10000)
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
