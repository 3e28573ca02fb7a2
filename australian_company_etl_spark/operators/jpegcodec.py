"""Baseline JPEG (ITU-T T.81) grayscale codec — pure numpy + stdlib.

The last image format behind the declared codec gate, implemented from
the spec: 8×8 block DCT, quantization with the Annex-K luminance table
(libjpeg quality scaling), zigzag + DC-differential + run/size AC
entropy coding with the standard Annex-K Huffman tables, JFIF marker
framing with 0xFF byte stuffing, optional DRI/RSTn restart intervals.
Single-component (grayscale), baseline sequential — the subset every
JPEG decoder reads.

Encode is deterministic (fixed tables, fixed float→int rounding); decode
reads baseline single-component JPEGs with 8-bit quant tables, including
restart-interval streams and MJPG-style frames that omit DHT (the
Annex-K tables are assumed, per OpenDML). Progressive (SOF2), 16-bit
quant tables, and multi-component color remain out of scope. Lossy by
nature: round-trip tests assert bounded error (≤2 grey levels at
quality=100, where the quant table collapses to all-ones and the only
loss is DCT float rounding).

Reference parity note: the reference repo has no multimodal path at all;
this module exists for the SURVEY §2 I2 row (training-data pipelines
carry image bytes as opaque binary columns — reference:
extract_commoncrawl.py processes WARC payloads the same way).
"""

from __future__ import annotations

import struct

import numpy as np

# ── tables (ITU-T T.81 Annex K) ─────────────────────────────────────────────

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# standard luminance DC table (K.3): 12 categories
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# standard luminance AC table (K.5): 162 run/size symbols
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical code assignment per the spec."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(ln, code): sym for sym, (code, ln) in _huff_encode_table(bits, vals).items()}


# 8-point orthonormal DCT-II matrix (the JPEG FDCT up to the standard
# normalization): T[u,x] = c(u)/2 * cos((2x+1) u pi / 16)
def _dct_matrix() -> np.ndarray:
    T = np.zeros((8, 8))
    for u in range(8):
        c = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            T[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return T


_T = _dct_matrix()


def _scale_quant(quality: int) -> np.ndarray:
    """libjpeg quality semantics: 1 (worst) .. 100 (all-ones table)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (QUANT_LUMA * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec

    def append_marker(self, marker: int) -> None:
        """Emit a standalone marker (RSTn) at a byte boundary — raw, not
        subject to byte stuffing."""
        self.byte_align()
        self.buf += bytes([0xFF, marker & 0xFF])

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG bitstream exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy data")
                self.pos += 1  # skip stuffed 0x00
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, expected_n: int) -> None:
        """Consume an RSTn marker at a byte boundary (T.81 E.2.4): discard
        the current partial byte's padding bits, then the next two bytes
        must be FF D0+n (modulo-8 sequence checked by the caller)."""
        self.nbits = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("JPEG stream ends where a restart marker is due")
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        if b0 != 0xFF or not (0xD0 <= b1 <= 0xD7):
            raise ValueError(f"expected restart marker, got {b0:02x}{b1:02x}")
        if b1 - 0xD0 != expected_n:
            raise ValueError(
                f"restart marker out of sequence: got RST{b1 - 0xD0}, "
                f"expected RST{expected_n}"
            )
        self.pos += 2


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map `size`-bit magnitude code to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def to_grid(gray: np.ndarray, width: int) -> np.ndarray:
    """Pad a flat byte array to a zero-filled (height, width) pixel grid —
    the shared raster shape of every image encoder here (BMP/PNG/JPEG)."""
    n = len(gray)
    height = max(1, -(-n // width))
    px = np.zeros(width * height, dtype=np.uint8)
    px[:n] = gray
    return px.reshape(height, width)


def jpeg_encode(
    gray: np.ndarray, width: int = 16, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """Grayscale byte array → baseline JFIF JPEG (single component).

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (camera MJPG streams use restart intervals so one bit
    error can't corrupt a whole frame); 0 writes a single entropy run."""
    img = to_grid(gray, width)
    height, width = img.shape
    # pad to 8×8 block grid by edge replication (lossy formats must not
    # invent high-frequency content at the boundary)
    H = -(-height // 8) * 8
    W = -(-width // 8) * 8
    padded = np.pad(img, ((0, H - height), (0, W - width)), mode="edge").astype(np.float64)

    quant = _scale_quant(quality)
    dc_tab = _huff_encode_table(DC_BITS, DC_VALS)
    ac_tab = _huff_encode_table(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.append_marker(0xD0 + rst)
                rst = (rst + 1) % 8
                prev_dc = 0
            mcu += 1
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coef = _T @ block @ _T.T
            q = np.round(coef / quant).astype(np.int64)
            zz = q.flatten()[ZIGZAG]
            # DC: differential, category + magnitude bits
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            size = _category(diff)
            code, ln = dc_tab[size]
            bw.write(code, ln)
            if size:
                bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
            # AC: run/size with ZRL and EOB
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    if k > last_nz:
                        code, ln = ac_tab[0x00]  # EOB
                        bw.write(code, ln)
                        break
                    run += 1
                    if run == 16:
                        code, ln = ac_tab[0xF0]  # ZRL
                        bw.write(code, ln)
                        run = 0
                    continue
                size = _category(v)
                code, ln = ac_tab[(run << 4) | size]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << size) - 1, size)
                run = 0
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xFFDB, bytes([0x00]) + bytes(int(v) for v in quant.flatten()[ZIGZAG]))
    sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS),
    )
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return b"\xff\xd8" + app0 + dqt + dri + sof0 + dht + sos + entropy + b"\xff\xd9"


def jpeg_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, top-down grayscale pixels) from a baseline
    single-component JPEG; reads DQT/DHT from the stream (any standard
    tables, not just the ones this encoder writes), honors DRI/RSTn
    restart intervals, and falls back to the Annex-K Huffman tables when
    DHT is omitted (the MJPG tables-omitted convention)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    width = height = None
    comp_dc = comp_ac = comp_q = 0
    restart_interval = 0
    entropy_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 4 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            off = 0
            while off < len(body):
                pq_tq = body[off]
                if pq_tq >> 4 != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(body[off + 1 : off + 65], dtype=np.uint8)
                quants[pq_tq & 0xF] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xFFC0:
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8 or ncomp != 1:
                raise ValueError("only 8-bit single-component baseline JPEG supported")
            comp_q = body[8]
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xFFC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                table = _huff_decode_table(bits, vals)
                if tc_th >> 4 == 0:
                    dc_dec[tc_th & 0xF] = table
                else:
                    ac_dec[tc_th & 0xF] = table
                off += 17 + nv
        elif marker == 0xFFDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFDA:
            comp_dc = body[2] >> 4
            comp_ac = body[2] & 0xF
            entropy_start = pos + 2 + length
            break
        pos += 2 + length
    if entropy_start is None or width is None:
        raise ValueError("JPEG missing SOS/SOF0")
    end = payload.rfind(b"\xff\xd9")
    br = _BitReader(payload[entropy_start : end if end > 0 else len(payload)])
    if comp_q not in quants:
        raise ValueError(f"JPEG references quant table {comp_q} but no DQT defines it")
    quant = quants[comp_q]
    # MJPG convention: frames may omit DHT entirely — decoders assume the
    # T.81 Annex-K tables (OpenDML). Only default a table id the stream
    # never defined; a defined-but-different id is still an error.
    dct = dc_dec.get(comp_dc)
    if dct is None:
        if dc_dec:
            raise ValueError(f"JPEG references undefined DC Huffman table {comp_dc}")
        dct = _huff_decode_table(DC_BITS, DC_VALS)
    act = ac_dec.get(comp_ac)
    if act is None:
        if ac_dec:
            raise ValueError(f"JPEG references undefined AC Huffman table {comp_ac}")
        act = _huff_decode_table(AC_BITS, AC_VALS)

    def read_symbol(table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in JPEG stream")

    H = -(-height // 8) * 8
    W = -(-width // 8) * 8
    out = np.zeros((H, W), dtype=np.float64)
    prev_dc = 0
    mcu = 0
    rst = 0
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.sync_restart(rst)
                rst = (rst + 1) % 8
                prev_dc = 0
            mcu += 1
            zz = np.zeros(64, dtype=np.int64)
            size = read_symbol(dct)
            prev_dc += _extend(br.read_bits(size), size)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = read_symbol(act)
                run, size = rs >> 4, rs & 0xF
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC run overflows block")
                zz[k] = _extend(br.read_bits(size), size)
                k += 1
            block = np.zeros(64, dtype=np.int64)
            block[ZIGZAG] = zz
            coef = block.reshape(8, 8) * quant
            out[by : by + 8, bx : bx + 8] = _T.T @ coef @ _T + 128.0
    pixels = np.clip(np.round(out[:height, :width]), 0, 255).astype(np.uint8)
    return width, height, pixels.flatten()
