"""I2 — multimodal mapInPandas plumbing: schema, batching, stub gating."""

from __future__ import annotations

import pytest

from australian_company_etl_spark.operators.multimodal import (
    attach_payload,
    decode_meta,
    fake_decode,
    real_decode,
    sample_frames,
)
from australian_company_etl_spark.sources.registry import load_tables


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ["documents"])["documents"]


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        real_decode(b"\x89PNG")


def test_decode_meta_schema_and_determinism(spark, sf_dir):
    mm = attach_payload(_docs(spark, sf_dir))
    out = decode_meta(mm, decoder=fake_decode)
    assert out.columns == ["doc_id", "byte_len", "width", "height", "channels", "mean_byte"]
    rows = {r.doc_id: r for r in out.collect()}
    docs = {r.doc_id: r.text for r in _docs(spark, sf_dir).collect()}
    assert len(rows) == len(docs)
    # fake decoder is a pure function of the bytes
    some = next(iter(rows))
    w, h, c, mean = fake_decode(docs[some].encode())
    r = rows[some]
    assert (r.width, r.height, r.channels) == (w, h, c)
    assert abs(r.mean_byte - mean) < 1e-9
    assert r.byte_len == len(docs[some].encode())


def test_wav_codec_roundtrip_and_stdlib_compat():
    """I3 — wav_encode output is a REAL WAV: Python's stdlib `wave` module
    (an independent reference decoder) reads back the identical PCM, and
    our chunk-walking decoder roundtrips exactly."""
    import io
    import wave

    import numpy as np

    from australian_company_etl_spark.operators.multimodal import (
        WAV_SAMPLE_RATE,
        text_to_samples,
        wav_decode,
        wav_encode,
    )

    text = "the quick brown fox 123"
    samples = text_to_samples(text)
    payload = wav_encode(samples)
    # independent decoder: stdlib wave
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == WAV_SAMPLE_RATE
        ref = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert np.array_equal(ref, samples)
    # our decoder
    rate, got = wav_decode(payload)
    assert rate == WAV_SAMPLE_RATE
    assert np.array_equal(got, samples)


def test_bmp_codec_roundtrip_and_spec_fields():
    """I5 — bmp_encode output is a spec-compliant 24bpp BMP (magic, pixel
    offset, declared sizes, 4-byte row padding) and our decoder roundtrips
    the pixels exactly, including the padded tail row."""
    import struct

    import numpy as np

    from australian_company_etl_spark.operators.multimodal import (
        bmp_decode,
        bmp_encode,
        text_to_pixels,
    )

    text = "the quick brown fox jumps over it"  # 33 chars → 16×3 grid, 15 pad px
    gray = text_to_pixels(text)
    payload = bmp_encode(gray)
    magic, file_size, _, _, pixel_offset = struct.unpack("<2sIHHI", payload[:14])
    assert magic == b"BM" and file_size == len(payload) and pixel_offset == 54
    _, width, height, planes, bpp, compression = struct.unpack("<IiiHHI", payload[14:34])
    assert (width, height, planes, bpp, compression) == (16, 3, 1, 24, 0)
    # 16 px × 3 bytes = 48 bytes/row → already 4-byte aligned (pad 0)
    assert len(payload) - pixel_offset == 3 * 48
    w, h, px = bmp_decode(payload)
    assert (w, h) == (16, 3)
    expect = np.zeros(48, dtype=np.uint8)
    expect[:33] = gray
    assert np.array_equal(px, expect)
    # odd width exercises real row padding: 5 px × 3 = 15 bytes → stride 16
    payload5 = bmp_encode(np.arange(7, dtype=np.uint8), width=5)
    w5, h5, px5 = bmp_decode(payload5)
    assert (w5, h5) == (5, 2)
    assert np.array_equal(px5[:7], np.arange(7, dtype=np.uint8))


def test_audio_features_decimation_law(spark, sf_dir):
    """I4 — 4× decimation keeps ceil(n/4) samples and never raises peak."""
    from australian_company_etl_spark.plans.multimodal import (
        mm_audio_features,
        mm_audio_resample,
    )

    full = {r.doc_id: r for r in mm_audio_features(spark, sf_dir).collect()}
    deci = {r.doc_id: r for r in mm_audio_resample(spark, sf_dir).collect()}
    assert full.keys() == deci.keys() and len(full) > 0
    for k in full:
        assert deci[k].n_samples == -(-full[k].n_samples // 4)  # ceil
        assert deci[k].peak <= full[k].peak
        assert deci[k].sample_rate == full[k].sample_rate == 8000


def test_sample_frames_shape(spark, sf_dir):
    mm = attach_payload(_docs(spark, sf_dir).limit(20))
    frames = sample_frames(mm, stride=64, max_frames=3)
    rows = frames.collect()
    assert {r.frame_idx for r in rows} <= {0, 1, 2}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 20
    for frs in by_doc.values():
        # frames are contiguous byte windows, ≤ stride bytes each
        assert [f.frame_idx for f in sorted(frs, key=lambda f: f.frame_idx)] == list(
            range(len(frs))
        )
        assert all(len(bytes(f.frame_bytes)) <= 64 for f in frs)


def test_avi_codec_roundtrip_and_container_fields():
    """I6 — encode→decode recovers every frame exactly, and the container
    carries the standard RIFF/AVI chunk layout (hdrl avih, strl strh/strf,
    movi 00db) with consistent sizes."""
    import struct

    import numpy as np

    from australian_company_etl_spark.operators.multimodal import (
        avi_decode,
        avi_encode,
        text_to_frames,
    )

    text = "the quick brown fox jumps over the lazy dog " * 3
    frames = text_to_frames(text)
    payload = avi_encode(frames)
    # container invariants
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    (riff_size,) = struct.unpack("<I", payload[4:8])
    assert riff_size == len(payload) - 8
    assert b"hdrl" in payload and b"movi" in payload
    assert payload.count(b"00db") == len(frames)
    # lossless roundtrip
    w, h, back = avi_decode(payload)
    assert (w, h) == (8, 4) and len(back) == len(frames)
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)
    # empty doc still yields one decodable all-zero frame
    _, _, empty = avi_decode(avi_encode(text_to_frames("")))
    assert len(empty) == 1 and int(empty[0].sum()) == 0
