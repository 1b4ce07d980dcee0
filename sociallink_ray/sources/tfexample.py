"""Hand-rolled TF ``Example`` proto + TFRecord writers (S12 byte-level
parity; no protobuf/tensorflow dependency).

The tensorflow ``Example`` message family is a tiny, fully public
protobuf schema (tensorflow/core/example/{example,feature}.proto):

    Example  { Features features = 1; }
    Features { map<string, Feature> feature = 1; }
    Feature  { oneof kind { BytesList bytes_list = 1;
                            FloatList float_list = 2;
                            Int64List int64_list = 3; } }
    BytesList { repeated bytes value = 1; }
    FloatList { repeated float value = 1 [packed]; }
    Int64List { repeated int64 value = 1 [packed]; }

This module emits spec-exact wire bytes for that schema (map entries
in insertion order — protobuf maps carry no canonical order, so
readers must not depend on one), a minimal decoder for round-trip
tests, and the two container layouts:

- ``write_example_pb``: ONE Example per raw ``.pb`` file — the
  reference's co-occurrence shard layout
  (vectorize/preprocessing/text/PopulateCooccurrenceMatrix.java:210-233
  writes ``shard-%03d-%03d.pb`` via ``Example.writeTo(stream)``).
- ``write_tfrecord``: length-framed records with masked CRC-32C (the
  TFRecord framing tf.data readers consume) — the generic
  training-data export container.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# protobuf wire primitives
# --------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1  # two's-complement 64-bit, per int64 encoding
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


# --------------------------------------------------------------------------
# Feature encoders
# --------------------------------------------------------------------------


def int64_list_feature(values) -> bytes:
    """Feature{int64_list: Int64List{packed varints}} wire bytes."""
    packed = b"".join(_varint(int(v)) for v in values)
    int64_list = _len_delim(1, packed) if len(packed) else b""
    return _len_delim(3, int64_list)


def float_list_feature(values) -> bytes:
    """Feature{float_list: FloatList{packed float32 LE}} wire bytes."""
    arr = np.asarray(list(values), dtype="<f4")
    float_list = _len_delim(1, arr.tobytes()) if arr.size else b""
    return _len_delim(2, float_list)


def bytes_list_feature(values) -> bytes:
    """Feature{bytes_list: BytesList{repeated bytes}} wire bytes."""
    body = b"".join(
        _len_delim(1, v if isinstance(v, bytes) else str(v).encode("utf-8"))
        for v in values
    )
    return _len_delim(1, body)


def encode_example(features: dict[str, bytes]) -> bytes:
    """Example wire bytes from {name: encoded Feature} (values from the
    *_feature helpers above), map entries in dict insertion order."""
    entries = b"".join(
        _len_delim(
            1, _len_delim(1, name.encode("utf-8")) + _tag(2, 2)
            + _varint(len(feat)) + feat
        )
        for name, feat in features.items()
    )
    return _len_delim(1, entries)  # Example.features


# --------------------------------------------------------------------------
# minimal decoder (round-trip tests; also a usable reader)
# --------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, buf[pos:pos + ln]
            pos += ln
        elif wire == 0:
            v, pos = _read_varint(buf, pos)
            yield field, v
        elif wire == 5:
            yield field, buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def decode_example(payload: bytes) -> dict[str, list]:
    """Parse Example wire bytes -> {name: list of int/float/bytes}."""
    out: dict[str, list] = {}
    for f, features in _fields(payload):
        if f != 1:
            continue
        for f2, entry in _fields(features):
            if f2 != 1:
                continue
            name, feat = None, b""
            for f3, v in _fields(entry):
                if f3 == 1:
                    name = v.decode("utf-8")
                elif f3 == 2:
                    feat = v
            vals: list = []
            for f4, kind in _fields(feat):
                if f4 == 3:  # Int64List
                    for f5, packed in _fields(kind):
                        if f5 == 1:
                            p = 0
                            while p < len(packed):
                                v64, p = _read_varint(packed, p)
                                if v64 >= 1 << 63:
                                    v64 -= 1 << 64
                                vals.append(int(v64))
                elif f4 == 2:  # FloatList
                    for f5, packed in _fields(kind):
                        if f5 == 1:
                            vals.extend(
                                np.frombuffer(packed, dtype="<f4").tolist()
                            )
                elif f4 == 1:  # BytesList
                    for f5, b in _fields(kind):
                        if f5 == 1:
                            vals.append(b)
            if name is not None:
                out[name] = vals
    return out


# --------------------------------------------------------------------------
# containers
# --------------------------------------------------------------------------


def write_example_pb(path: str, features: dict[str, bytes]) -> None:
    """One Example per raw .pb file (the reference shard layout)."""
    with open(path, "wb") as f:
        f.write(encode_example(features))


_CRC32C_TABLE: np.ndarray | None = None


def _crc32c_table() -> np.ndarray:
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        poly = np.uint32(0x82F63B78)  # reflected Castagnoli
        tbl = np.zeros(256, dtype=np.uint32)
        for i in range(256):
            c = np.uint32(i)
            for _ in range(8):
                c = (c >> np.uint32(1)) ^ (
                    poly if c & np.uint32(1) else np.uint32(0)
                )
            tbl[i] = c
        _CRC32C_TABLE = tbl
    return _CRC32C_TABLE


def crc32c(data: bytes) -> int:
    tbl = _crc32c_table()
    crc = np.uint32(0xFFFFFFFF)
    for b in np.frombuffer(data, dtype=np.uint8):
        crc = tbl[(crc ^ b) & np.uint32(0xFF)] ^ (crc >> np.uint32(8))
    return int(crc ^ np.uint32(0xFFFFFFFF))


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


def write_tfrecord(path: str, examples) -> int:
    """TFRecord container: u64le length + masked-crc32c(length) +
    payload + masked-crc32c(payload) per record. Returns record count."""
    n = 0
    with open(path, "wb") as f:
        for ex in examples:
            ln = struct.pack("<Q", len(ex))
            f.write(ln)
            f.write(struct.pack("<I", _masked_crc(ln)))
            f.write(ex)
            f.write(struct.pack("<I", _masked_crc(ex)))
            n += 1
    return n


def read_tfrecord(path: str) -> list[bytes]:
    """Parse a TFRecord file, verifying both CRCs per record."""
    out = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        ln_bytes = data[pos:pos + 8]
        (ln,) = struct.unpack("<Q", ln_bytes)
        (lcrc,) = struct.unpack("<I", data[pos + 8:pos + 12])
        if lcrc != _masked_crc(ln_bytes):
            raise ValueError("TFRecord length CRC mismatch")
        payload = data[pos + 12:pos + 12 + ln]
        (pcrc,) = struct.unpack(
            "<I", data[pos + 12 + ln:pos + 16 + ln]
        )
        if pcrc != _masked_crc(payload):
            raise ValueError("TFRecord payload CRC mismatch")
        out.append(payload)
        pos += 16 + ln
    return out
