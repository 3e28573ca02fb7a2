"""I2 — multimodal decode / feature-extract plumbing over binary columns.

Images/audio/video are opaque `binary` columns with typed metadata. The
Spark-side plumbing is real — schema contracts, `mapInPandas` Arrow
batching, partition-preserving shape — and so are five codecs, written
against their specs with only numpy + the stdlib: RIFF/WAVE PCM audio,
24bpp BMP, RIFF/AVI video (uncompressed DIB and Motion-JPEG variants),
zlib-deflated grayscale PNG (deflate + the five scanline filters), and
baseline JPEG (8×8 DCT + Annex-K Huffman entropy coding,
operators/jpegcodec.py). Only motion-compensated video (H.264 class)
stays behind a declared `NotImplementedError` gate (`real_decode`) or
the deterministic fake — inter-frame prediction codecs are beyond what
ships in this environment.

Scale: `mapInPandas` streams Arrow record batches through Python without
collecting a partition in memory, so payload size per batch — not per
partition — bounds the Python heap. Decode parallelism equals input
partitions; `repartition(n)` before decoding is the throughput knob. Only
the payload + requested meta columns cross the Arrow boundary (select
before decode → parquet column pruning keeps undecoded bytes unread).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, byte_len int, width int, height int, channels int, mean_byte double"
)

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes binary"


def real_decode(payload: bytes) -> tuple[int, int, int, float]:
    """The residual codec boundary: H.264-class compressed video. Plug
    ffmpeg here on a cluster with codecs. (NOT stubbed: WAV/PCM audio,
    24bpp BMP, RIFF/AVI, grayscale PNG, and baseline JPEG are all real
    codecs — see `decode_image` for the format-sniffing image routing.)"""
    raise NotImplementedError(
        "no compressed-video codecs in this environment — use fake_decode for tests"
    )


# ── AVI: a REAL video container codec (pure struct + numpy) ─────────────────
# Uncompressed 24bpp DIB frames ('00db' chunks) in a standard RIFF/AVI
# container: LIST hdrl (avih + strl(strh 'vids'/'DIB ', strf
# BITMAPINFOHEADER)) followed by LIST movi — the layout every AVI demuxer
# expects; media tools open these bytes directly. Decode walks the RIFF
# chunk tree (word-aligned sizes), reads geometry from avih/strf, and
# un-pads/un-flips each frame's DIB rows. Only JPEG and H.264-class
# compressed codecs remain behind the declared `real_decode` stub (PNG is
# real — see the zlib codec below).

AVI_W, AVI_H = 8, 4  # 32 px per frame
AVI_FPS = 10


def _dib_body(gray: "np.ndarray", width: int, height: int) -> bytes:
    import numpy as np

    grid = gray.reshape(height, width)
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    return b"".join(
        np.repeat(grid[r], 3).astype(np.uint8).tobytes() + b"\x00" * pad
        for r in range(height - 1, -1, -1)
    )


def avi_encode(
    frames: list["np.ndarray"],
    width: int = AVI_W,
    height: int = AVI_H,
    codec: str = "dib",
    quality: int = 100,
) -> bytes:
    """List of width·height grayscale frames → RIFF/AVI bytes.

    codec="dib": uncompressed 24bpp DIB frames ('00db' chunks).
    codec="mjpg": Motion JPEG — each frame is a full baseline JPEG
    ('00dc' chunks, MJPG fourcc), the intra-frame compressed video format
    real cameras emit; built on operators/jpegcodec.py."""
    import struct

    n = len(frames)
    row_bytes = width * 3
    dib_bytes = (row_bytes + ((-row_bytes) % 4)) * height
    if codec == "dib":
        handler, compression = b"DIB ", 0
        chunks = [_dib_body(f, width, height) for f in frames]
        chunk_id = b"00db"
    elif codec == "mjpg":
        from australian_company_etl_spark.operators.jpegcodec import jpeg_encode

        handler = b"MJPG"
        compression = int.from_bytes(b"MJPG", "little")
        chunks = [jpeg_encode(f, width=width, quality=quality) for f in frames]
        chunk_id = b"00dc"
    else:
        raise ValueError(f"unsupported AVI codec {codec!r}")
    buf_size = max((len(c) for c in chunks), default=dib_bytes)
    avih = struct.pack(
        "<4sI14I",
        b"avih", 56,
        1_000_000 // AVI_FPS, buf_size * AVI_FPS, 0, 0,
        n, 0, 1, buf_size, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4sI4s4sIHHIIIIIIIIHHHH",
        b"strh", 56, b"vids", handler,
        0, 0, 0, 0, 1, AVI_FPS, 0, n, buf_size, 0, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<4sIIiiHHIIiiII",
        b"strf", 40, 40, width, height, 1, 24, compression, dib_bytes, 2835, 2835, 0, 0
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl" + avih + strl
    movi_chunks = b"".join(
        chunk_id + struct.pack("<I", len(c)) + c + (b"\x00" * (len(c) % 2))
        for c in chunks
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_chunks)) + b"movi" + movi_chunks
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode(payload: bytes) -> tuple[int, int, list["np.ndarray"]]:
    """(width, height, top-down grayscale frames) from an AVI — either
    uncompressed DIB ('00db') or Motion-JPEG ('00dc' + MJPG fourcc)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    width = height = None
    compression = 0
    frames: list[np.ndarray] = []

    def walk(buf: bytes, off: int, end: int) -> None:
        nonlocal width, height, compression
        while off + 8 <= end:
            cid = buf[off : off + 4]
            (size,) = struct.unpack("<I", buf[off + 4 : off + 8])
            data_off = off + 8
            if cid == b"LIST":
                walk(buf, data_off + 4, data_off + size)
            elif cid == b"avih":
                fields = struct.unpack("<14I", buf[data_off : data_off + 56])
                width, height = fields[8], fields[9]
            elif cid == b"strf":
                # BITMAPINFOHEADER: biCompression at byte 16
                (compression,) = struct.unpack(
                    "<I", buf[data_off + 16 : data_off + 20]
                )
            elif cid == b"00db" and width:
                row_bytes = width * 3
                stride = row_bytes + ((-row_bytes) % 4)
                rows = []
                for r in range(height):
                    ro = data_off + r * stride
                    rows.append(
                        np.frombuffer(buf[ro : ro + row_bytes], dtype=np.uint8)[::3]
                    )
                rows.reverse()  # DIB rows are bottom-up
                frames.append(np.concatenate(rows))
            elif cid == b"00dc" and width:
                if compression != int.from_bytes(b"MJPG", "little"):
                    raise ValueError("compressed AVI stream is not MJPG")
                from australian_company_etl_spark.operators.jpegcodec import jpeg_decode

                w, h, px = jpeg_decode(buf[data_off : data_off + size])
                if (w, h) != (width, height):
                    raise ValueError("MJPG frame geometry disagrees with AVI header")
                frames.append(px)
            off = data_off + size + (size % 2)  # chunks are word-aligned

    walk(payload, 12, len(payload))
    return width, height, frames


def text_to_frames(text: str) -> list["np.ndarray"]:
    """Deterministic frames from text: 32 chars (codepoint bytes) per
    8×4 frame, zero-padded; ≥ 1 frame so empty docs still decode."""
    import numpy as np

    px = text_to_pixels(text)
    per = AVI_W * AVI_H
    n_frames = max(1, -(-len(px) // per))
    padded = np.zeros(n_frames * per, dtype=np.uint8)
    padded[: len(px)] = px
    return [padded[i * per : (i + 1) * per] for i in range(n_frames)]


def _attach_payload(docs: DataFrame, encode_one: Callable[[str], bytes]) -> DataFrame:
    """Shared encode-stage shape for every container codec: (doc_id, text)
    → (doc_id, payload bytes) in one Arrow-batched mapInPandas pass. The
    select before mapInPandas keeps parquet column pruning intact."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [encode_one(t or "") for t in pdf["text"]],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        _encode, schema="doc_id bigint, payload binary"
    )


def attach_avi_payload(docs: DataFrame) -> DataFrame:
    """Encode stage: text → real AVI bytes, Arrow-batched."""
    return _attach_payload(docs, lambda t: avi_encode(text_to_frames(t)))


VIDEO_FEATURES_SCHEMA = (
    "doc_id bigint, n_frames int, n_sampled int, n_px bigint, sum_px bigint, "
    "max_px int, mean_e4 bigint"
)


def video_frame_sample_features(mm: DataFrame, stride: int = 2) -> DataFrame:
    """Decode + frame-sample stage: AVI payload → every `stride`-th frame →
    exact integer pixel features over the SAMPLED frames only (the
    keyframe-sampling shape of a video preprocessing pipeline)."""
    import math

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, frames = avi_decode(bytes(payload))
                sampled = frames[::stride]
                px = np.concatenate(sampled) if sampled else np.array([], dtype=np.uint8)
                n_px = int(px.size)
                s = int(px.sum(dtype=np.int64))
                rows.append(
                    (
                        doc_id,
                        len(frames),
                        len(sampled),
                        n_px,
                        s,
                        int(px.max()) if n_px else 0,
                        math.floor(s / n_px * 10000) if n_px else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_sampled", "n_px", "sum_px", "max_px", "mean_e4",
                ],
            )

        # select BEFORE the Arrow boundary (the module contract): only the
    # key + payload cross into the Python worker, whatever width the
    # caller's frame carries
    mm = mm.select("doc_id", "payload")
    return mm.mapInPandas(_features, schema=VIDEO_FEATURES_SCHEMA)


# ── WAV/PCM: a REAL audio codec (pure struct + numpy, no external libs) ─────
# 16-bit little-endian mono PCM in a standard RIFF/WAVE container — bytes
# produced here open in any audio tool (and in Python's stdlib `wave`,
# which the tests use as an independent reference decoder). Decode walks the
# chunk list properly (fmt / data discovery, word-aligned chunk sizes), so
# it accepts any compliant mono 16-bit WAV, not just our own output.

WAV_SAMPLE_RATE = 8000


def wav_encode(samples: "np.ndarray") -> bytes:
    import struct

    data = samples.astype("<i2").tobytes()
    n = len(data)
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + n,
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        1,  # mono
        WAV_SAMPLE_RATE,
        WAV_SAMPLE_RATE * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
        b"data",
        n,
    )
    return header + data


def wav_decode(payload: bytes) -> tuple[int, "np.ndarray"]:
    """(sample_rate, int16 samples) from a mono 16-bit PCM WAV."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[pos : pos + 16]
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError("only mono 16-bit PCM supported")
        elif cid == b"data":
            data = payload[pos : pos + size]
        pos += size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return rate, np.frombuffer(data, dtype="<i2")


def text_to_samples(text: str) -> "np.ndarray":
    """Deterministic PCM synth from text: one int16 sample per char,
    (codepoint − 64) · 256. Non-ASCII characters are replaced with '?'
    (codepoint 63) BEFORE the synth — the same normalization as
    text_to_pixels, mirrored in the SQL oracles with a >127→63 clamp —
    because an unsanitized codepoint ≥ 192 overflows int16: numpy 1.x
    silently wrapped it ('é' → −22272 instead of 43264) and numpy ≥ 2
    raises OverflowError, either way diverging from the oracle's exact
    character model. After the replace every sample is in
    [−16384, 16128], safely representable."""
    import numpy as np

    b = text.encode("ascii", errors="replace")
    return ((np.frombuffer(b, dtype=np.uint8).astype(np.int16) - 64) * 256).astype(
        np.int16
    )


def attach_wav_payload(docs: DataFrame) -> DataFrame:
    """Encode stage: text → real WAV bytes, Arrow-batched."""
    return _attach_payload(docs, lambda t: wav_encode(text_to_samples(t)))


# ── BMP: a REAL image codec (pure struct + numpy, no external libs) ─────────
# 24-bit uncompressed bottom-up BMP (BITMAPFILEHEADER + BITMAPINFOHEADER),
# rows padded to 4-byte boundaries per the spec — any image viewer opens
# these bytes. Decode parses both headers and un-pads/un-flips the pixel
# rows, so it reads any compliant 24bpp uncompressed BMP. Compressed
# formats (PNG/JPEG, video) stay behind the declared `real_decode` stub.

BMP_WIDTH = 16


def bmp_encode(gray: "np.ndarray", width: int = BMP_WIDTH) -> bytes:
    """Grayscale byte array → 24bpp BMP (r=g=b), padded rows, bottom-up."""
    import struct

    import numpy as np

    from australian_company_etl_spark.operators.jpegcodec import to_grid

    grid = to_grid(gray, width)
    height = grid.shape[0]
    # same padded bottom-up 24bpp body the AVI DIB frames use — one
    # implementation, so the two containers cannot drift on padding or
    # channel order
    body = _dib_body(grid.reshape(-1), width, height)
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(body)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_header + info_header + body


def bmp_decode(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """(width, height, top-down grayscale pixels) from a 24bpp BMP."""
    import struct

    import numpy as np

    magic, _, _, _, pixel_offset = struct.unpack("<2sIHHI", payload[:14])
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, width, height, _, bpp, compression = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if (bpp, compression) != (24, 0):
        raise ValueError("only uncompressed 24bpp BMP supported")
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    bottom_up = height > 0
    height = abs(height)
    rows = []
    for r in range(height):
        off = pixel_offset + r * stride
        row = np.frombuffer(payload[off : off + row_bytes], dtype=np.uint8)
        rows.append(row[::3])  # grayscale: every 3rd byte (b == g == r)
    if bottom_up:
        rows.reverse()
    return width, height, np.concatenate(rows)


def text_to_pixels(text: str) -> "np.ndarray":
    """Deterministic grayscale pixels from text: one byte per char
    (ASCII codepoint), so the SQL oracle reproduces the exact pixels."""
    import numpy as np

    return np.frombuffer(text.encode("ascii", errors="replace"), dtype=np.uint8)


def attach_bmp_payload(docs: DataFrame) -> DataFrame:
    """Encode stage: text → real BMP bytes, Arrow-batched."""
    return _attach_payload(docs, lambda t: bmp_encode(text_to_pixels(t)))


# ── PNG: a REAL compressed image codec (pure zlib + struct, no libs) ────────
# 8-bit grayscale (colour type 0), non-interlaced: signature + IHDR + IDAT
# (zlib-deflated, per-scanline filter byte) + IEND, CRC-checked chunks per
# the spec — any image viewer opens these bytes. The decoder inflates IDAT
# and inverts all five scanline filters (None/Sub/Up/Average/Paeth), so it
# reads any compliant non-interlaced 8-bit gray PNG, whichever filters the
# producing encoder chose. The encoder cycles filters row-by-row, so every
# round-trip exercises every decode path. JPEG and H.264 remain behind the
# declared `real_decode` gate (DCT/Huffman codecs don't ship here).

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_predict(ft: int, a: int, b: int, c: int) -> int:
    """The PNG scanline predictor, shared by filter (encode) and unfilter
    (decode) so the two directions can never desynchronize. a = left,
    b = above, c = upper-left, per the spec's filter definitions."""
    if ft == 0:
        return 0
    if ft == 1:
        return a
    if ft == 2:
        return b
    if ft == 3:
        return (a + b) >> 1
    if ft == 4:  # Paeth
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
    raise ValueError(f"bad PNG filter type {ft}")


def _png_filter_row(ft: int, raw: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward scanline filter (encoder side), per the PNG spec."""
    out = bytearray(len(raw))
    for i in range(len(raw)):
        a = raw[i - bpp] if i >= bpp else 0
        c = prev[i - bpp] if i >= bpp else 0
        out[i] = (raw[i] - _png_predict(ft, a, prev[i], c)) & 0xFF
    return bytes(out)


def _png_unfilter_row(ft: int, cur: bytearray, prev: bytes, bpp: int) -> None:
    """Invert a scanline filter in place (decoder side)."""
    if ft == 0:
        return
    for i in range(len(cur)):
        a = cur[i - bpp] if i >= bpp else 0
        c = prev[i - bpp] if i >= bpp else 0
        cur[i] = (cur[i] + _png_predict(ft, a, prev[i], c)) & 0xFF


def png_encode(
    gray: "np.ndarray", width: int = BMP_WIDTH, filter_type: int | None = None
) -> bytes:
    """Grayscale byte array → real 8-bit gray PNG. ``filter_type`` pins one
    scanline filter (0-4); default cycles r % 5 so a round-trip covers all
    five decode paths."""
    import struct
    import zlib

    from australian_company_etl_spark.operators.jpegcodec import to_grid

    grid = to_grid(gray, width)
    height = grid.shape[0]
    raw_lines = []
    prev = bytes(width)
    for r in range(height):
        row = grid[r].tobytes()
        ft = (r % 5) if filter_type is None else filter_type
        raw_lines.append(bytes([ft]) + _png_filter_row(ft, row, prev, 1))
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(raw_lines), 9))
        + _png_chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """(width, height, top-down grayscale pixels) from a non-interlaced
    8-bit gray PNG; verifies chunk CRCs and inverts whatever filters the
    encoder used."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    off = 8
    width = height = None
    idat = bytearray()
    while off + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[off : off + 4])
        tag = payload[off + 4 : off + 8]
        body = payload[off + 8 : off + 8 + length]
        (crc,) = struct.unpack(">I", payload[off + 8 + length : off + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt) != (8, 0, 0, 0):
                raise ValueError("only non-interlaced 8-bit grayscale PNG supported")
            if interlace != 0:
                raise ValueError("Adam7 interlace not supported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        off += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = 1 + width
    if len(raw) != stride * height:
        raise ValueError("PNG pixel data size mismatch")
    rows = []
    prev = bytes(width)
    for r in range(height):
        line = raw[r * stride : (r + 1) * stride]
        cur = bytearray(line[1:])
        _png_unfilter_row(line[0], cur, prev, 1)
        prev = bytes(cur)
        rows.append(np.frombuffer(prev, dtype=np.uint8))
    return width, height, np.concatenate(rows)


def attach_png_payload(docs: DataFrame) -> DataFrame:
    """Encode stage: text → real PNG bytes, Arrow-batched."""
    return _attach_payload(docs, lambda t: png_encode(text_to_pixels(t)))


def attach_jpeg_payload(docs: DataFrame, quality: int = 90) -> DataFrame:
    """Encode stage: text → real baseline JPEG bytes, Arrow-batched."""
    from australian_company_etl_spark.operators.jpegcodec import jpeg_encode

    return _attach_payload(
        docs, lambda t: jpeg_encode(text_to_pixels(t), quality=quality)
    )


def decode_image(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Format-sniffing image decode: routes BMP ('BM'), PNG, and baseline
    JPEG (SOI marker) payloads to their codecs; anything else sits behind
    the declared `real_decode` gate."""
    if payload[:2] == b"BM":
        return bmp_decode(payload)
    if payload[:8] == PNG_SIG:
        return png_decode(payload)
    if payload[:2] == b"\xff\xd8":
        from australian_company_etl_spark.operators.jpegcodec import jpeg_decode

        return jpeg_decode(payload)
    raise ValueError("unrecognized image payload (only H.264-class video sits behind real_decode)")


IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, n_px bigint, sum_px bigint, "
    "max_px int, mean_e4 bigint"
)


def image_features(mm: DataFrame) -> DataFrame:
    """Decode stage: BMP payload → exact integer pixel features.
    mean_e4 = floor(sum_px / n_px · 1e4) — exact int64 in, bit-identical
    double math in any engine."""
    import math

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_image(bytes(payload))
                n = len(px)
                s = int(np.sum(px.astype(np.int64)))
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        n,
                        s,
                        int(np.max(px)) if n else 0,
                        int(math.floor(s / n * 10000)) if n else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_px", "sum_px", "max_px", "mean_e4"],
            )

        # select BEFORE the Arrow boundary (the module contract): only the
    # key + payload cross into the Python worker, whatever width the
    # caller's frame carries
    mm = mm.select("doc_id", "payload")
    return mm.mapInPandas(_features, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, peak bigint, "
    "sum_sq bigint, rms_e4 bigint"
)


def audio_features(mm: DataFrame, decimate: int = 1) -> DataFrame:
    """Decode stage: WAV payload → exact integer features (+ optional
    stride decimation — the audio 'resize' — re-encoded and re-decoded so
    the decimated path exercises the full codec roundtrip).

    rms_e4 = floor(sqrt(sum_sq / n) · 1e4): sum_sq is an exact int64 and
    stays < 2^53, so the double math is bit-identical in any engine."""
    import math

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, samples = wav_decode(bytes(payload))
                if decimate > 1:
                    rate, samples = wav_decode(wav_encode(samples[::decimate]))
                s = samples.astype(np.int64)
                n = len(s)
                sum_sq = int(np.dot(s, s))
                peak = int(np.max(np.abs(s))) if n else 0
                rms_e4 = int(math.floor(math.sqrt(sum_sq / n) * 10000)) if n else 0
                rows.append((doc_id, rate, n, peak, sum_sq, rms_e4))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_samples",
                    "peak",
                    "sum_sq",
                    "rms_e4",
                ],
            )

        # select BEFORE the Arrow boundary (the module contract): only the
    # key + payload cross into the Python worker, whatever width the
    # caller's frame carries
    mm = mm.select("doc_id", "payload")
    return mm.mapInPandas(_features, schema=AUDIO_FEATURES_SCHEMA)


def fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in decoder: dims/stats derived from the bytes."""
    n = len(payload)
    width = 64 + n % 1857
    height = 64 + (n * 31) % 1017
    mean = (sum(payload[:256]) / min(n, 256)) if n else 0.0
    return width, height, 3, float(mean)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Build the canonical multimodal frame: (doc_id, payload binary)."""
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))


def decode_meta(
    mm: DataFrame, decoder: Callable[[bytes], tuple[int, int, int, float]] = real_decode
) -> DataFrame:
    """Decode payloads to typed metadata via Arrow-batched mapInPandas."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                w, h, c, mean = decoder(b)
                rows.append((doc_id, len(b), w, h, c, mean))
            yield pd.DataFrame(
                rows, columns=["doc_id", "byte_len", "width", "height", "channels", "mean_byte"]
            )

        # select BEFORE the Arrow boundary (the module contract): only the
    # key + payload cross into the Python worker, whatever width the
    # caller's frame carries
    mm = mm.select("doc_id", "payload")
    return mm.mapInPandas(_decode, schema=DECODED_SCHEMA)


def sample_frames(mm: DataFrame, stride: int = 1024, max_frames: int = 4) -> DataFrame:
    """Frame-sample a 'video' payload: fixed-stride byte windows as frames.

    Output is exploded (one row per frame) — the shape a real
    frame-extraction over video bytes produces.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                for i in range(min(max_frames, max(1, (len(b) + stride - 1) // stride))):
                    rows.append((doc_id, i, b[i * stride : (i + 1) * stride]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

        # select BEFORE the Arrow boundary (the module contract): only the
    # key + payload cross into the Python worker, whatever width the
    # caller's frame carries
    mm = mm.select("doc_id", "payload")
    return mm.mapInPandas(_frames, schema=FRAME_SCHEMA)
