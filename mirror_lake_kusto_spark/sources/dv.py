"""Deletion-vector codec + resolution (public Delta PROTOCOL.md,
"Deletion Vectors" + "Deletion Vector Descriptor Schema" sections, and
the public RoaringFormatSpec for the bitmap payload).

A deletion vector marks PHYSICAL ROW INDICES of a parquet data file as
deleted without rewriting the file (merge-on-read).  The descriptor
rides the add action:

    {"storageType": "i"|"u"|"p", "pathOrInlineDv": ...,
     "offset": int?, "sizeInBytes": int, "cardinality": int}

- ``i``: payload inline — pathOrInlineDv is the Z85-encoded serialized
  bitmap.
- ``u``: payload in a file under the table root named
  ``<prefix>/deletion_vector_<uuid>.bin`` where pathOrInlineDv is
  ``<prefix><z85(uuid bytes)>`` (prefix possibly empty, uuid = last 20
  z85 chars); ``offset`` points at the 4-byte big-endian length that
  precedes the payload (followed by a CRC-32 of the payload).
- ``p``: pathOrInlineDv is an absolute path to such a file.

Payload = RoaringBitmapArray "portable" serialization: int32-LE magic
1681511377, int64-LE count of 32-bit bitmaps, then each bitmap in the
standard RoaringFormatSpec layout (array / bitset / run containers);
bitmap ``i`` holds the low 32 bits of indices with high 32 bits = i.

The reference predates deletion vectors entirely
(TransactionLogEntry.cs parses only classic actions and the engine
refused such tables); this module upgrades the READ side so current
Delta writers' tables (DV-enabled by default) can be queried, while
the mirror pipeline still refuses to ingest DV'd files loudly.

Scale posture: descriptors and compressed bitmaps are KB-scale driver
metadata (same class as the log itself); EXPANSION to row indices
happens executor-side (see delta_log.read_snapshot) — the driver never
materializes a deleted-row list.
"""

from __future__ import annotations

import struct
import zlib

from . import fs as _fs

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

MAGIC = 1681511377


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 encodes 4-byte blocks")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        block = []
        for _ in range(5):
            block.append(_Z85_CHARS[n % 85])
            n //= 85
        out.extend(reversed(block))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 decodes 5-char blocks")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            n = n * 85 + _Z85_INDEX[c]
        out += n.to_bytes(4, "big")
    return bytes(out)


# -- RoaringBitmapArray (portable) ---------------------------------------

_SERIAL_COOKIE = 12347
_SERIAL_COOKIE_NO_RUNS = 12346
_NO_OFFSET_THRESHOLD = 4


def _deserialize_bitmap32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One standard 32-bit roaring bitmap starting at ``pos``; returns
    (values, next_pos)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    start = pos
    pos += 4
    run_bits = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nb = (n + 7) // 8
        run_bits = buf[pos : pos + nb]
        pos += nb
    elif cookie == _SERIAL_COOKIE_NO_RUNS:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys, cards = [], []
    for _ in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(k)
        cards.append(c + 1)
    has_offsets = cookie == _SERIAL_COOKIE_NO_RUNS or n >= _NO_OFFSET_THRESHOLD
    offsets = None
    if has_offsets:
        offsets = list(struct.unpack_from(f"<{n}I", buf, pos))
        pos += 4 * n
    values: list[int] = []
    for i in range(n):
        if offsets is not None:
            pos = start + offsets[i]
        base = keys[i] << 16
        is_run = bool(run_bits and (run_bits[i // 8] >> (i % 8)) & 1)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                lo, ln = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + lo, base + lo + ln + 1))
        elif cards[i] <= 4096:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
    return values, pos


def deserialize(data: bytes) -> list[int]:
    """Serialized RoaringBitmapArray -> sorted 64-bit row indices."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    (count,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for hi in range(count):
        vals, pos = _deserialize_bitmap32(data, pos)
        out.extend((hi << 32) | v for v in vals)
    return out


def _serialize_bitmap32(values: list[int]) -> bytes:
    """Standard portable serialization (array/bitset containers only —
    the simplest legal writer; every reader must accept it)."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(values):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    n = len(by_key)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUNS, n)
    desc = b"".join(
        struct.pack("<HH", k, len(vs) - 1) for k, vs in sorted(by_key.items())
    )
    # offsets are mandatory with the no-run cookie
    conts = []
    for _k, vs in sorted(by_key.items()):
        if len(vs) <= 4096:
            conts.append(struct.pack(f"<{len(vs)}H", *vs))
        else:
            words = [0] * 1024
            for v in vs:
                words[v >> 6] |= 1 << (v & 63)
            conts.append(struct.pack("<1024Q", *words))
    base = len(head) + len(desc) + 4 * n
    offsets, cur = [], base
    for c in conts:
        offsets.append(cur)
        cur += len(c)
    return (
        head
        + desc
        + struct.pack(f"<{n}I", *offsets)
        + b"".join(conts)
    )


def serialize(indices: list[int]) -> bytes:
    """Sorted-or-not 64-bit row indices -> RoaringBitmapArray bytes."""
    by_hi: dict[int, list[int]] = {}
    for v in indices:
        by_hi.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    if not by_hi:
        return struct.pack("<iq", MAGIC, 0)
    n_bitmaps = max(by_hi) + 1
    out = [struct.pack("<iq", MAGIC, n_bitmaps)]
    for hi in range(n_bitmaps):
        out.append(_serialize_bitmap32(by_hi.get(hi, [])))
    return b"".join(out)


# -- descriptor resolution ------------------------------------------------


def inline_descriptor(indices: list[int]) -> dict:
    """An ``i`` (inline) descriptor for a row-index set — fixture and
    writer helper."""
    payload = serialize(indices)
    pad = (-len(payload)) % 4
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(payload + b"\x00" * pad),
        "sizeInBytes": len(payload),
        "cardinality": len(set(indices)),
    }


def write_dv_file(
    table_path: str, indices: list[int], prefix: str = ""
) -> dict:
    """Author a ``u`` (UUID-file) deletion vector under the table root
    and return its descriptor — the on-disk shape current Delta
    writers produce (1-byte format version, then per-DV: 4-byte BE
    length + payload + 4-byte BE CRC-32)."""
    import uuid as _uuid

    u = _uuid.uuid4()
    payload = serialize(indices)
    blob = (
        b"\x01"
        + struct.pack(">i", len(payload))
        + payload
        + struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF)
    )
    name = f"deletion_vector_{u}.bin"
    rel = f"{prefix}/{name}" if prefix else name
    fs = _fs.get_fs(table_path)
    full = _fs.join(table_path, rel)
    if "/" in rel:
        fs.makedirs(full.rsplit("/", 1)[0])
    fs.write_bytes(full, blob)
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(u.bytes),
        "offset": 1,
        "sizeInBytes": len(payload),
        "cardinality": len(set(indices)),
    }


def pack_dv_file(
    table_path: str, payloads: list[tuple[bytes, int]], prefix: str = ""
) -> list[dict]:
    """Write ONE ``u``-storage deletion-vector file holding every
    payload of a commit (the layout current Delta writers produce: a
    shared .bin with per-DV offsets) and return one descriptor per
    payload, in order.  ``payloads`` = (serialized bitmap, cardinality)
    pairs."""
    import uuid as _uuid

    u = _uuid.uuid4()
    blob = bytearray(b"\x01")
    descs: list[dict] = []
    enc = prefix + z85_encode(u.bytes)
    for payload, card in payloads:
        off = len(blob)
        blob += struct.pack(">i", len(payload))
        blob += payload
        blob += struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF)
        descs.append(
            {
                "storageType": "u",
                "pathOrInlineDv": enc,
                "offset": off,
                "sizeInBytes": len(payload),
                "cardinality": int(card),
            }
        )
    name = f"deletion_vector_{u}.bin"
    rel = f"{prefix}/{name}" if prefix else name
    fs = _fs.get_fs(table_path)
    full = _fs.join(table_path, rel)
    if "/" in rel:
        fs.makedirs(full.rsplit("/", 1)[0])
    fs.write_bytes(full, bytes(blob))
    return descs


def dv_file_rel_path(desc: dict) -> str | None:
    """Table-relative path of a ``u``-storage descriptor's .bin file
    (None for inline/absolute) — vacuum uses this to keep live DV
    files."""
    if desc.get("storageType") != "u":
        return None
    import uuid as _uuid

    enc = desc["pathOrInlineDv"]
    prefix, uid = enc[:-20], enc[-20:]
    u = _uuid.UUID(bytes=z85_decode(uid))
    rel = f"deletion_vector_{u}.bin"
    return f"{prefix}/{rel}" if prefix else rel


def dv_payload(
    table_path: str, desc: dict, blob_cache: dict | None = None
) -> bytes:
    """Resolve a descriptor to its serialized bitmap bytes (KB-scale
    driver metadata; the expansion to row indices runs executor-side).
    ``blob_cache`` (path -> bytes) memoizes the .bin reads across a
    batch of descriptors — delete_dv packs a whole commit's vectors
    into ONE shared file, so N descriptors otherwise re-read and
    re-CRC the same blob N times."""
    st = desc["storageType"]
    size = int(desc["sizeInBytes"])
    if st == "i":
        return z85_decode(desc["pathOrInlineDv"])[:size]
    if st == "u":
        full = _fs.join(table_path, dv_file_rel_path(desc))
    elif st == "p":
        full = desc["pathOrInlineDv"]
    else:
        raise ValueError(f"unknown deletion-vector storageType {st!r}")
    if blob_cache is not None and full in blob_cache:
        blob = blob_cache[full]
    else:
        blob = _fs.get_fs(full if st == "p" else table_path).read_bytes(
            full
        )
        if blob_cache is not None:
            blob_cache[full] = blob
    off = desc.get("offset") or 0
    (ln,) = struct.unpack_from(">i", blob, off)
    if ln != size:
        raise ValueError(
            f"deletion vector length {ln} != descriptor sizeInBytes {size}"
        )
    payload = blob[off + 4 : off + 4 + ln]
    (crc,) = struct.unpack_from(">I", blob, off + 4 + ln)
    if crc != (zlib.crc32(payload) & 0xFFFFFFFF):
        raise ValueError("deletion vector payload failed CRC-32 check")
    return payload
