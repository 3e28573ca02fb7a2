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


def test_png_codec_roundtrip_all_filters():
    """I2/I5 — png_encode emits a spec-compliant non-interlaced 8-bit gray
    PNG (signature, CRC-checked chunks) and png_decode inverts every
    scanline filter type exactly, pinned one at a time and cycling."""
    import numpy as np

    from australian_company_etl_spark.operators.multimodal import (
        PNG_SIG,
        png_decode,
        png_encode,
        text_to_pixels,
    )

    gray = text_to_pixels("the quick brown fox jumps over the lazy dog! " * 3)
    for ft in (0, 1, 2, 3, 4, None):  # None = cycling default
        payload = png_encode(gray, filter_type=ft)
        assert payload[:8] == PNG_SIG
        w, h, px = png_decode(payload)
        assert w == 16 and h == -(-len(gray) // 16)
        assert np.array_equal(px[: len(gray)], gray), f"filter {ft} corrupted pixels"
        assert not px[len(gray):].any(), "pad pixels must be zero"
    # adversarial pixel patterns through the Paeth/Average predictors
    for pattern in (
        np.arange(256, dtype=np.uint8),
        np.full(100, 255, dtype=np.uint8),
        np.tile(np.array([0, 255], dtype=np.uint8), 50),
        (np.arange(97, dtype=np.uint16) * 71 % 256).astype(np.uint8),
    ):
        for ft in (3, 4, None):
            w, h, px = png_decode(png_encode(pattern, filter_type=ft))
            assert np.array_equal(px[: len(pattern)], pattern)


def test_png_decode_rejects_corruption_and_unsupported():
    import struct

    import numpy as np
    import pytest

    from australian_company_etl_spark.operators.multimodal import (
        png_decode,
        png_encode,
    )

    payload = bytearray(png_encode(np.arange(32, dtype=np.uint8)))
    # flip one IDAT byte → CRC must catch it
    payload[60] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(payload))
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"JFIF....")
    # interlaced header must be rejected, not mis-decoded: rebuild IHDR
    # with interlace=1 and a fresh CRC (decoder checks CRC first)
    import zlib

    good = png_encode(np.arange(32, dtype=np.uint8))
    ihdr_body = bytearray(good[16:29])
    ihdr_body[-1] = 1  # interlace byte
    crc = struct.pack(">I", zlib.crc32(b"IHDR" + bytes(ihdr_body)) & 0xFFFFFFFF)
    tampered = good[:16] + bytes(ihdr_body) + crc + good[33:]
    with pytest.raises(ValueError, match="interlace"):
        png_decode(tampered)


def test_png_pipeline_features_equal_bmp_pipeline(spark, sf_dir):
    """The decode stage is format-transparent: the SAME text encoded as PNG
    and as BMP must produce IDENTICAL image features through the Spark
    mapInPandas pipeline (pixels are the invariant, the container is not)."""
    from australian_company_etl_spark.operators.multimodal import (
        attach_bmp_payload,
        attach_png_payload,
        image_features,
    )
    from australian_company_etl_spark.sources.registry import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"].limit(64)
    via_bmp = {
        r.doc_id: r for r in image_features(attach_bmp_payload(docs)).collect()
    }
    via_png = {
        r.doc_id: r for r in image_features(attach_png_payload(docs)).collect()
    }
    assert via_bmp.keys() == via_png.keys() and len(via_bmp) == 64
    for k in via_bmp:
        assert via_bmp[k] == via_png[k], f"doc {k}: {via_bmp[k]} != {via_png[k]}"
    # and the PNG payloads really are compressed deflate streams, not raw
    one = attach_png_payload(docs.limit(1)).collect()[0].payload
    assert bytes(one[:8]) == b"\x89PNG\r\n\x1a\n"


def test_jpeg_codec_roundtrip_and_markers():
    """I2 — jpeg_encode emits a baseline JFIF stream (SOI/DQT/SOF0/DHT/SOS/
    EOI) and jpeg_decode inverts it: exact at quality=100 up to DCT float
    rounding (≤2 grey levels), bounded error at quality=75 on smooth data."""
    import numpy as np

    from australian_company_etl_spark.operators.jpegcodec import (
        jpeg_decode,
        jpeg_encode,
    )

    patterns = [
        np.arange(256, dtype=np.uint8),  # gradient: every DCT frequency
        np.full(100, 200, dtype=np.uint8),  # flat: DC-only blocks + EOB path
        (np.arange(97, dtype=np.uint16) * 71 % 256).astype(np.uint8),  # pseudo-noise
        np.tile(np.array([0, 255], dtype=np.uint8), 64),  # max-frequency stress
    ]
    for pattern in patterns:
        payload = jpeg_encode(pattern, width=16, quality=100)
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda", b"JFIF"):
            assert marker in payload
        w, h, px = jpeg_decode(payload)
        assert w == 16 and h == -(-len(pattern) // 16)
        err = np.abs(px[: len(pattern)].astype(int) - pattern.astype(int))
        assert err.max() <= 2, f"q100 loss {err.max()} exceeds DCT rounding bound"
    # lossy-but-bounded at a real quality setting, and actually compressed
    smooth = (np.sin(np.arange(512) / 40) * 100 + 120).astype(np.uint8)
    payload = jpeg_encode(smooth, width=32, quality=75)
    w, h, px = jpeg_decode(payload)
    err = np.abs(px[:512].astype(int) - smooth.astype(int))
    assert err.max() <= 12 and len(payload) < 512


def test_jpeg_decode_rejects_non_baseline():
    import numpy as np
    import pytest

    from australian_company_etl_spark.operators.jpegcodec import (
        jpeg_decode,
        jpeg_encode,
    )

    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"BMxxxxxx")
    # progressive (SOF2) must be rejected, not mis-decoded
    good = bytearray(jpeg_encode(np.arange(64, dtype=np.uint8)))
    sof = bytes(good).find(b"\xff\xc0")
    good[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(bytes(good))


def test_jpeg_restart_interval_roundtrip():
    """I2 — DRI/RSTn streams (the camera-MJPG framing): encode with a
    restart interval, check the markers are really in the entropy data,
    and decode back within the q100 bound. An out-of-sequence RSTn must
    be a clean ValueError."""
    import numpy as np
    import pytest

    from australian_company_etl_spark.operators.jpegcodec import (
        jpeg_decode,
        jpeg_encode,
    )

    pattern = (np.arange(1024, dtype=np.uint16) * 37 % 256).astype(np.uint8)
    plain = jpeg_encode(pattern, width=64, quality=100)
    withrst = jpeg_encode(pattern, width=64, quality=100, restart_interval=3)
    assert b"\xff\xdd" in withrst and b"\xff\xd0" in withrst
    assert b"\xff\xdd" not in plain
    w, h, px = jpeg_decode(withrst)
    assert (w, h) == (64, 16)
    err = np.abs(px[: len(pattern)].astype(int) - pattern.astype(int))
    assert err.max() <= 2
    # corrupt the first RST0 into RST5: decoder must flag the sequence break
    broken = withrst.replace(b"\xff\xd0", b"\xff\xd5", 1)
    with pytest.raises(ValueError, match="restart marker"):
        jpeg_decode(broken)


def test_jpeg_tables_omitted_mjpg_convention():
    """I2 — MJPG frames may omit DHT (decoders assume the Annex-K tables,
    per OpenDML); stripping the DHT segment from this encoder's output
    must decode identically since it writes exactly those tables. A frame
    with no DQT at all stays a clean error."""
    import numpy as np
    import pytest

    from australian_company_etl_spark.operators.jpegcodec import (
        jpeg_decode,
        jpeg_encode,
    )
    import struct

    pattern = np.arange(256, dtype=np.uint8)
    payload = jpeg_encode(pattern, width=16, quality=100)

    def strip_segment(buf: bytes, marker: bytes) -> bytes:
        i = buf.find(marker)
        (ln,) = struct.unpack(">H", buf[i + 2 : i + 4])
        return buf[:i] + buf[i + 2 + ln :]

    no_dht = strip_segment(payload, b"\xff\xc4")
    assert b"\xff\xc4" not in no_dht
    w, h, px = jpeg_decode(no_dht)
    w2, h2, px2 = jpeg_decode(payload)
    assert (w, h) == (w2, h2) and (px == px2).all()
    with pytest.raises(ValueError, match="quant table"):
        jpeg_decode(strip_segment(payload, b"\xff\xdb"))


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker; real
    muxers emit them for alignment. Decoder must skip them."""
    import numpy as np

    from australian_company_etl_spark.operators.jpegcodec import (
        jpeg_decode,
        jpeg_encode,
    )

    pattern = np.arange(128, dtype=np.uint8)
    payload = jpeg_encode(pattern, width=16, quality=100)
    sof = payload.find(b"\xff\xc0")
    padded = payload[:sof] + b"\xff\xff\xff" + payload[sof:]
    w, h, px = jpeg_decode(padded)
    w2, h2, px2 = jpeg_decode(payload)
    assert (w, h) == (w2, h2) and (px == px2).all()


def test_jpeg_pipeline_dims_match_bmp_pipeline(spark, sf_dir):
    """Format-transparent decode stage, lossy edition: JPEG payloads give
    the same geometry (width/height/n_px) as BMP for the same text, and at
    quality=100 the pixel means agree within the DCT rounding bound."""
    from australian_company_etl_spark.operators.multimodal import (
        attach_bmp_payload,
        attach_jpeg_payload,
        image_features,
    )
    from australian_company_etl_spark.sources.registry import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"].limit(32)
    via_bmp = {
        r.doc_id: r for r in image_features(attach_bmp_payload(docs)).collect()
    }
    via_jpg = {
        r.doc_id: r
        for r in image_features(attach_jpeg_payload(docs, quality=100)).collect()
    }
    assert via_bmp.keys() == via_jpg.keys() and len(via_bmp) == 32
    for k in via_bmp:
        b, j = via_bmp[k], via_jpg[k]
        assert (b.width, b.height, b.n_px) == (j.width, j.height, j.n_px)
        # mean_e4 is floor(mean*1e4); ≤2 grey levels of per-pixel loss
        assert abs(b.mean_e4 - j.mean_e4) <= 2 * 10000


def test_mjpeg_avi_roundtrip_and_header_fields():
    """I2/I6 — codec='mjpg' writes a Motion-JPEG AVI (MJPG fourcc in strh
    and strf.biCompression, '00dc' chunks, each a standalone baseline
    JPEG) and avi_decode reads it back within the DCT rounding bound;
    the uncompressed DIB path stays bit-exact and format-sniffed."""
    import struct

    import numpy as np

    from australian_company_etl_spark.operators.multimodal import (
        AVI_H,
        AVI_W,
        avi_decode,
        avi_encode,
        text_to_frames,
    )

    frames = text_to_frames("pack my box with five dozen liquor jugs " * 3)
    assert len(frames) >= 3
    payload = avi_encode(frames, codec="mjpg", quality=100)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    assert b"MJPG" in payload and b"00dc" in payload and b"00db" not in payload
    # every frame chunk is a standalone JPEG (SOI right after the chunk hdr)
    off = payload.find(b"00dc")
    assert payload[off + 8 : off + 10] == b"\xff\xd8"
    w, h, back = avi_decode(payload)
    assert (w, h) == (AVI_W, AVI_H) and len(back) == len(frames)
    for a, b in zip(frames, back):
        assert int(np.abs(a.astype(int) - b.astype(int)).max()) <= 2
    # DIB stays exact through the same decoder
    w, h, exact = avi_decode(avi_encode(frames))
    assert all(np.array_equal(a, b) for a, b in zip(frames, exact))
    # a 00dc stream without the MJPG fourcc must be rejected, not guessed:
    # zero out strf.biCompression (strf body starts 8 bytes after the tag)
    tampered = bytearray(payload)
    strf = tampered.index(b"strf")
    tampered[strf + 8 + 16 : strf + 8 + 20] = struct.pack("<I", 0)
    import pytest

    with pytest.raises(ValueError, match="not MJPG"):
        avi_decode(bytes(tampered))


def test_nonascii_text_exact_oracle_parity(spark, tmp_path):
    """CONFIRMED review finding: a codepoint ≥ 192 overflowed the int16 PCM
    synth — numpy 1.x silently wrapped ('é' → −22272), numpy ≥ 2 raises.
    The encoders now ASCII-replace ('?' = 63) and the SQL oracles clamp
    >127→63, so multimodal parity is exact for ANY unicode text."""
    import duckdb
    import numpy as np

    from australian_company_etl_spark.operators.multimodal import (
        text_to_pixels,
        text_to_samples,
    )

    s = text_to_samples("Café")  # é → '?': (63 − 64) · 256 = −256
    assert s.dtype == np.int16
    assert list(s) == [(ord(c) - 64) * 256 for c in "Caf"] + [-256]
    assert list(text_to_pixels("Café")) == [ord(c) for c in "Caf"] + [63]

    docs = spark.createDataFrame(
        [(1, "Café Pty Ltd — ünïcode ☃"), (2, "plain ascii co"), (3, "é" * 40)],
        "doc_id bigint, text string",
    )
    d = str(tmp_path / "nonascii")
    docs.write.parquet(d + "/documents.parquet")
    from australian_company_etl_spark.plans import multimodal as mmplans
    from tests.oracle_compare import compare

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/**/*.parquet')"
    )
    for key in (
        "mm_audio_features",
        "mm_audio_resample",
        "mm_image_features",
        "mm_video_framesample",
    ):
        res = compare(mmplans.QUERIES[key](spark, d), con, mmplans.ORACLES[key])
        assert res["ok"], (key, res)
