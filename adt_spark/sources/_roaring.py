"""Deletion-vector bitmap codec — pure-Python decoder (and test-side
encoder) for Delta Lake's 64-bit ``RoaringBitmapArray`` "portable"
format, as specified publicly in:

- Delta PROTOCOL.md §Deletion Vectors (storage types ``i``/``u``/``p``,
  Z85 encoding, the 1-byte-version / [size|data|crc] file framing)
- the RoaringBitmap interoperable serialization spec
  (RoaringFormatSpec: cookies 12346/12347, array/bitmap/run containers)

This is the analog of the reference's DV machinery
(``crates/providers/src/deltatable.rs:471-577``, SURVEY.md §2.A A9) —
there the kernel library decodes the bitmap and the reference
compiles it into parquet access plans; here we decode it ourselves
and row-filter (no access-plan hook in Spark's reader).

Only decoding is needed at runtime; ``encode_*`` exists so tests can
round-trip hand-crafted DVs (delta-spark, which would write real
ones, is not in this container).
"""

from __future__ import annotations

import struct
import zlib

MAGIC = 1681511377  # RoaringBitmapArray portable-format magic number

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4

# --- Z85 (ZeroMQ base-85, used by Delta for inline DVs and UUID paths) ----

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_MAP = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("Z85 length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for ch in text[i : i + 5]:
            acc = acc * 85 + _Z85_MAP[ch]
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("Z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            chunk.append(_Z85_CHARS[rem])
        out += reversed(chunk)
    return "".join(out)


# --- 32-bit RoaringBitmap (standard interoperable serialization) ----------


def _decode_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one serialized 32-bit RoaringBitmap at ``pos``; return
    (sorted values, new pos)."""
    (cookie16,) = struct.unpack_from("<H", buf, pos)
    values: list[int] = []
    if cookie16 == _SERIAL_COOKIE:
        (n_minus1,) = struct.unpack_from("<H", buf, pos + 2)
        n = n_minus1 + 1
        pos += 4
        run_bytes = (n + 7) // 8
        run_flags = buf[pos : pos + run_bytes]
        pos += run_bytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    else:
        (cookie32,) = struct.unpack_from("<I", buf, pos)
        if cookie32 != _SERIAL_COOKIE_NO_RUN:
            raise ValueError(f"bad roaring cookie {cookie32}")
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True

    keys_cards = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        keys_cards.append((key, card_m1 + 1))
        pos += 4
    if has_offsets:
        pos += 4 * n  # offset header (we read sequentially)

    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + v for v in range(start, start + length + 1))
        elif card > 4096:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
    return values, pos


def decode_bitmap_array(data: bytes) -> list[int]:
    """Serialized 64-bit RoaringBitmapArray → sorted row positions."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<Q", data, 4)
    pos = 12
    out: list[int] = []
    for high in range(n_bitmaps):
        vals, pos = _decode_rb32(data, pos)
        out.extend((high << 32) | v for v in vals)
    return out


def decode_dv(dv: dict, table_location: str, read_bytes=None) -> list[int]:
    """Deletion-vector descriptor (the ``deletionVector`` struct of an
    ``add`` action) → sorted deleted row positions.

    ``read_bytes``: optional ``path -> bytes`` reader for 'u'/'p'
    storage; the delta_native caller injects a Hadoop-FS-capable one
    so DV files resolve on object stores too.  Default: local open.
    """
    import os

    storage = dv["storageType"]
    if storage == "i":
        blob = z85_decode(dv["pathOrInlineDv"])
        return decode_bitmap_array(blob)
    if storage in ("u", "p"):
        if storage == "u":
            coded = dv["pathOrInlineDv"]
            prefix, uuid_part = coded[:-20], coded[-20:]
            uuid_bytes = z85_decode(uuid_part)
            import uuid as _uuid

            name = f"deletion_vector_{_uuid.UUID(bytes=uuid_bytes)}.bin"
            path = os.path.join(table_location, *( [prefix] if prefix else [] ), name)
        else:
            path = dv["pathOrInlineDv"]
        if read_bytes is not None:
            blob = read_bytes(path)
        else:
            with open(path, "rb") as fh:
                blob = fh.read()
        if blob[0] != 1:
            raise ValueError(f"unsupported DV file format version {blob[0]}")
        offset = dv.get("offset", 1)
        (size,) = struct.unpack_from(">I", blob, offset)
        data = blob[offset + 4 : offset + 4 + size]
        (crc,) = struct.unpack_from(">I", blob, offset + 4 + size)
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError("DV checksum mismatch")
        return decode_bitmap_array(data)
    raise ValueError(f"unknown DV storageType {storage!r}")


# --- encoders (test support: round-trip hand-crafted DVs) -----------------


def _encode_rb32(values: list[int]) -> bytes:
    """Standard no-run serialization (cookie 12346) of a 32-bit set."""
    containers: dict[int, list[int]] = {}
    for v in sorted(values):
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header
    data_parts = []
    for k in keys:
        vals = containers[k]
        if len(vals) > 4096:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            data_parts.append(struct.pack("<1024Q", *words))
        else:
            data_parts.append(struct.pack(f"<{len(vals)}H", *vals))
    offset = len(out) + 4 * len(keys)
    for part in data_parts:
        out += struct.pack("<I", offset)
        offset += len(part)
    for part in data_parts:
        out += part
    return bytes(out)


def encode_bitmap_array(positions: list[int]) -> bytes:
    """Row positions → serialized 64-bit RoaringBitmapArray."""
    highs: dict[int, list[int]] = {}
    for p in sorted(positions):
        highs.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    if highs and sorted(highs) != list(range(max(highs) + 1)):
        # the portable format stores bitmaps densely by high word;
        # delta DV positions are file-row offsets, so highs start at 0
        for h in range(max(highs) + 1):
            highs.setdefault(h, [])
    out = bytearray(struct.pack("<iQ", MAGIC, len(highs)))
    for h in sorted(highs):
        out += _encode_rb32(highs[h])
    return bytes(out)


def encode_inline_dv(positions: list[int]) -> dict:
    """Build an inline (``storageType="i"``) DV descriptor."""
    data = encode_bitmap_array(positions)
    pad = (-len(data)) % 4
    data += b"\x00" * pad  # Z85 needs 4-byte alignment; trailing zero
    # bytes after the last bitmap are ignored by the decoder
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data),
        "sizeInBytes": len(data),
        "cardinality": len(positions),
    }
