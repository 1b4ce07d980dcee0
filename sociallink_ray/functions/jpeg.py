"""Vendored pure-python baseline JPEG codec (round-3 verdict item 6).

Implements the baseline sequential DCT process of ITU-T T.81 from the
public spec — encoder AND decoder — so the multimodal column family
(`stages/multimodal.py`) exercises the format 99% of real crawl images
use without Pillow in the container. The decoder is the production
fallback (`decode_compressed_image` routes JPEG here when PIL is
absent); the encoder exists to mint deterministic test fixtures and is
deliberately minimal (baseline, standard Annex K tables, 4:4:4 or
4:2:0, no progressive / arithmetic / 12-bit modes).

Scope notes:
- decoder: baseline DCT (SOF0/SOF1), 8-bit, grayscale or YCbCr with
  sampling factors 1-2, restart markers (DRI/RSTn), multi-table DQT /
  DHT segments. Progressive (SOF2) raises NotImplementedError.
- numerics: orthonormal separable float IDCT — not bit-identical to
  libjpeg's fixed-point path, differences are ±1-2 levels (tests use a
  PSNR-style tolerance, and PIL cross-checks run wherever Pillow IS
  installed).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# shared tables
# --------------------------------------------------------------------------

# zigzag scan order: ZIGZAG[i] = (row, col) flat index of the i-th
# coefficient in scan order
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K quantization tables (luminance / chrominance), row-major
STD_LUM_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
STD_CHROM_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
STD_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
STD_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    C = np.sqrt(2.0 / 8.0) * np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0)
    C[0, :] = np.sqrt(1.0 / 8.0)
    return C


_C = _dct_matrix()


def _canonical_codes(bits: list[int], huffval: list[int]):
    """T.81 C.2: generate canonical (code, size) per symbol."""
    sizes: list[int] = []
    for length, count in enumerate(bits, start=1):
        sizes.extend([length] * count)
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_size = sizes[0] if sizes else 0
    for sym, size in zip(huffval, sizes):
        code <<= size - prev_size
        prev_size = size
        codes[sym] = (code, size)
        code += 1
    return codes


# LUT cache keyed by the DHT payload — lives for the PROCESS, i.e. per
# map actor: corpora encoded with the Annex K default tables produce
# identical DHT bytes, so after the first image each decode skips
# table construction entirely (round-4 verdict item 8: per-actor
# Huffman state across batches). Bounded: optimized-Huffman encoders
# (libjpeg -optimize, mozjpeg, phone cameras) mint per-image tables at
# ~192 KB per entry, so a long-lived decode actor on a real crawl
# would otherwise accrete without limit — at the cap the oldest half
# is evicted (insertion order), keeping the resident set <~12 MB.
_LUT_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
_LUT_CACHE_MAX = 64


def _decode_lut(bits: list[int], huffval: list[int]):
    """16-bit prefix LUT for one Huffman table: index by the next 16
    bits (1-padded), read (symbol, code length) in O(1) — the decoder's
    hot path replaces the per-bit tree walk (<=16 read_bits(1) calls +
    dict probes per symbol) with one peek + two array loads."""
    key = (tuple(bits), tuple(huffval))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    for s, (code, size) in _canonical_codes(bits, huffval).items():
        lo = code << (16 - size)
        hi = (code + 1) << (16 - size)
        sym[lo:hi] = s
        ln[lo:hi] = size
    if len(_LUT_CACHE) >= _LUT_CACHE_MAX:
        for old in list(_LUT_CACHE)[: _LUT_CACHE_MAX // 2]:
            del _LUT_CACHE[old]
    _LUT_CACHE[key] = (sym, ln)
    return sym, ln


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = int(min(100, max(1, quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# bit I/O
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, size: int) -> None:
        self._acc = (self._acc << size) | (code & ((1 << size) - 1))
        self._nbits += size
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


class _BitReader:
    """Reads entropy-coded bits, unstuffing 0xFF00 and stopping at any
    real marker (left for the segment parser)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        # declared decode error on truncated entropy data (corrupt
        # crawl payloads must raise ValueError, not IndexError — the
        # production PIL-less fallback treats these as data errors)
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG: entropy data ends early")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG: dangling 0xFF")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-read: the caller handles
                # RST boundaries; treat as error if bits are demanded
                raise EOFError("hit RST marker while reading bits")
            else:
                raise EOFError("hit marker while reading bits")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def read_bits(self, n: int) -> int:
        while self._nbits < n:
            self._fill()
        self._nbits -= n
        val = (self._acc >> self._nbits) & ((1 << n) - 1)
        self._acc &= (1 << self._nbits) - 1
        return val

    def peek16(self) -> int:
        """Next 16 bits without consuming, 1-padded past the entropy
        segment's end (the encoder pads the final byte with 1s, so a
        valid stream never decodes into the pad)."""
        while self._nbits < 16:
            try:
                self._fill()
            except (EOFError, ValueError):
                break
        if self._nbits >= 16:
            return (self._acc >> (self._nbits - 16)) & 0xFFFF
        pad = 16 - self._nbits
        return ((self._acc << pad) | ((1 << pad) - 1)) & 0xFFFF

    def consume(self, n: int) -> None:
        if n > self._nbits:
            raise ValueError("truncated JPEG: entropy data ends early")
        self._nbits -= n
        self._acc &= (1 << self._nbits) - 1

    def byte_align(self) -> None:
        self._acc = 0
        self._nbits = 0

    def at_restart(self) -> bool:
        p = self.pos
        return (
            p + 1 < len(self.data)
            and self.data[p] == 0xFF
            and 0xD0 <= self.data[p + 1] <= 0xD7
        )

    def skip_restart(self) -> None:
        self.byte_align()
        self.pos += 2


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.read_bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


def _decode_huff_fast(r: _BitReader, lut_sym, lut_len) -> int:
    """LUT decode: one 16-bit peek + two array loads per symbol."""
    v = r.peek16()
    n = lut_len[v]
    if n == 0:
        raise ValueError("invalid Huffman code")
    r.consume(int(n))
    return int(lut_sym[v])


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _encode_block(
    block: np.ndarray, qt: np.ndarray, dc_codes, ac_codes, pred: int,
    w: _BitWriter,
) -> int:
    coef = _C @ (block - 128.0) @ _C.T
    q = np.round(coef.ravel() / qt.reshape(8, 8).ravel()).astype(np.int64)
    zz = q[ZIGZAG]
    # DC
    diff = int(zz[0]) - pred
    mag = abs(diff)
    size = int(mag).bit_length()
    code, csize = dc_codes[size]
    w.write(code, csize)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    # AC
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zs = ac_codes[0xF0]
            w.write(zc, zs)
            run -= 16
        size = abs(v).bit_length()
        code, csize = ac_codes[(run << 4) | size]
        w.write(code, csize)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        ec, es = ac_codes[0x00]
        w.write(ec, es)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray, quality: int = 90, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode HxWx3 (RGB) or HxW (grayscale) uint8 to baseline JFIF.
    ``subsample=True`` uses 4:2:0 chroma (2x2 box average); default is
    4:4:4. ``restart_interval`` > 0 emits DRI + RSTn markers every that
    many MCUs (exists mainly so the decoder's restart path has an
    in-container exerciser)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    H, W = img.shape[:2]
    lum_qt = _quality_scale(STD_LUM_QT, quality)
    chrom_qt = _quality_scale(STD_CHROM_QT, quality)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (two tables in one segment when color)
    ntab = 1 if gray else 2
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65 * ntab)
    out += bytes([0x00]) + bytes(lum_qt[ZIGZAG].tolist())
    if not gray:
        out += bytes([0x01]) + bytes(chrom_qt[ZIGZAG].tolist())
    # SOF0
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, H, W, ncomp)
    hv_y = 0x22 if (subsample and not gray) else 0x11
    out += bytes([1, hv_y, 0])
    if not gray:
        out += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    # DHT
    def _dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return (
            b"\xff\xc4"
            + struct.pack(">H", 2 + 1 + 16 + len(vals))
            + bytes([(cls << 4) | tid])
            + bytes(bits)
            + bytes(vals)
        )

    out += _dht(0, 0, STD_DC_LUM) + _dht(1, 0, STD_AC_LUM)
    if not gray:
        out += _dht(0, 1, STD_DC_CHROM) + _dht(1, 1, STD_AC_CHROM)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    out += bytes([1, 0x00])
    if not gray:
        out += bytes([2, 0x11]) + bytes([3, 0x11])
    out += bytes([0, 63, 0])

    dc_l = _canonical_codes(*STD_DC_LUM)
    ac_l = _canonical_codes(*STD_AC_LUM)
    dc_c = _canonical_codes(*STD_DC_CHROM)
    ac_c = _canonical_codes(*STD_AC_CHROM)
    w = _BitWriter()

    if gray:
        planes = [img.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]

    if gray or not subsample:
        # pad every plane to 8x8 multiples; MCU = one block per comp
        ph = (H + 7) // 8 * 8
        pw = (W + 7) // 8 * 8
        padded = [
            np.pad(p, ((0, ph - H), (0, pw - W)), mode="edge") for p in planes
        ]
        preds = [0] * len(planes)
        mcu_i = 0
        for by in range(ph // 8):
            for bx in range(pw // 8):
                if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                    w.flush()
                    out_rst = 0xD0 + (mcu_i // restart_interval - 1) % 8
                    w.out += bytes([0xFF, out_rst])
                    preds = [0] * len(planes)
                mcu_i += 1
                for ci, p in enumerate(padded):
                    qt = lum_qt if ci == 0 else chrom_qt
                    dc = dc_l if ci == 0 else dc_c
                    ac = ac_l if ci == 0 else ac_c
                    blk = p[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                    preds[ci] = _encode_block(blk, qt, dc, ac, preds[ci], w)
    else:
        # 4:2:0: pad to 16x16 MCUs; chroma = 2x2 box average
        ph = (H + 15) // 16 * 16
        pw = (W + 15) // 16 * 16
        y = np.pad(planes[0], ((0, ph - H), (0, pw - W)), mode="edge")
        cb = np.pad(planes[1], ((0, ph - H), (0, pw - W)), mode="edge")
        cr = np.pad(planes[2], ((0, ph - H), (0, pw - W)), mode="edge")
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        preds = [0, 0, 0]
        mcu_i = 0
        for my in range(ph // 16):
            for mx in range(pw // 16):
                if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                    w.flush()
                    out_rst = 0xD0 + (mcu_i // restart_interval - 1) % 8
                    w.out += bytes([0xFF, out_rst])
                    preds = [0, 0, 0]
                mcu_i += 1
                for sy in range(2):
                    for sx in range(2):
                        blk = y[
                            my * 16 + sy * 8: my * 16 + sy * 8 + 8,
                            mx * 16 + sx * 8: mx * 16 + sx * 8 + 8,
                        ]
                        preds[0] = _encode_block(
                            blk, lum_qt, dc_l, ac_l, preds[0], w
                        )
                for ci, p in ((1, cb), (2, cr)):
                    blk = p[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8]
                    preds[ci] = _encode_block(
                        blk, chrom_qt, dc_c, ac_c, preds[ci], w
                    )
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to an HxWx3 uint8 RGB array
    (grayscale replicates into 3 channels)."""
    data = payload
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG: dangling 0xFF at EOF")
        marker = data[pos + 1]
        if marker == 0xFF:
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
            # marker — skip them (treating the second 0xFF as a marker
            # would consume real marker bytes as a bogus segment length)
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG: segment length cut off")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("truncated JPEG: segment exceeds payload")
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT, possibly several tables
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                o += 1
                if pq:
                    vals = np.frombuffer(
                        seg[o:o + 128], dtype=">u2"
                    ).astype(np.int64)
                    o += 128
                else:
                    vals = np.frombuffer(
                        seg[o:o + 64], dtype=np.uint8
                    ).astype(np.int64)
                    o += 64
                qt = np.zeros(64, dtype=np.int64)
                qt[ZIGZAG] = vals
                qts[tq] = qt
        elif marker == 0xC4:  # DHT, possibly several tables
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = list(seg[o + 1: o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17: o + 17 + nv])
                huff[(tc, th)] = _decode_lut(bits, vals)
                o += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            if len(seg) < 6:
                raise ValueError("truncated JPEG: short SOF segment")
            _, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) not supported by the vendored "
                "baseline decoder"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated JPEG: short DRI segment")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i: 3 + 2 * i]
                scan.append({"id": cs, "td": tt >> 4, "ta": tt & 0x0F})
            pos += seglen
            return _decode_scan(
                data, pos, frame, scan, qts, huff, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS scan found")


def _decode_scan(data, pos, frame, scan, qts, huff, restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF")
    H, W = frame["h"], frame["w"]
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (W + 8 * hmax - 1) // (8 * hmax)
    mcuy = (H + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros(
            (mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64
        )
    order = [by_id[s["id"]] | {"td": s["td"], "ta": s["ta"]} for s in scan]
    preds = {c["id"]: 0 for c in comps}
    r = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                if r.at_restart():
                    r.skip_restart()
                    preds = {c["id"]: 0 for c in comps}
            for c in order:
                qt = qts[c["tq"]]
                dc_sym, dc_len = huff[(0, c["td"])]
                ac_sym, ac_len = huff[(1, c["ta"])]
                plane = planes[c["id"]]
                for sy in range(c["v"]):
                    for sx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        s = _decode_huff_fast(r, dc_sym, dc_len)
                        diff = _receive_extend(r, s)
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huff_fast(r, ac_sym, ac_len)
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _receive_extend(r, ss)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * qt[ZIGZAG]
                        blk = (
                            _C.T @ coef.reshape(8, 8) @ _C
                        ) + 128.0
                        y0 = (my * c["v"] + sy) * 8
                        x0 = (mx * c["h"] + sx) * 8
                        plane[y0:y0 + 8, x0:x0 + 8] = blk
            mcu_count += 1
    # upsample to full resolution and crop
    full = {}
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full[c["id"]] = p[:H, :W]
    if len(comps) == 1:
        y = np.clip(np.round(full[comps[0]["id"]]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    ids = [c["id"] for c in comps]
    return _ycbcr_to_rgb(full[ids[0]], full[ids[1]], full[ids[2]])
