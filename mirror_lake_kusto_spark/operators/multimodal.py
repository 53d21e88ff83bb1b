"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata structs, with decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` operators.

The container has no image/audio codecs, so the decode kernels are
STUBBED behind ``_decode_image_real`` (raises NotImplementedError) with
a deterministic fake used by default; everything Spark-side — schema,
partitioning, UDF signatures, Arrow batch shapes — is real and tested.

Design for 100 TB: binary payloads never pass through Python row-wise;
they arrive as Arrow buffers per batch.  Metadata-only transformations
(routing, filtering by media type) stay JVM-side so payload columns are
never even deserialized.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, byte_len bigint, "
    "content_digest string, feat_mean double, feat_dim int"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture adapter: wrap a text table into the engine's multimodal
    layout (binary payload + typed metadata), as an ingest of raw media
    blobs would.  Payload = utf-8 bytes; metadata derived
    deterministically so tests have stable expectations."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            (F.pmod(F.col(id_col), F.lit(64)) * 16 + 16).cast("int").alias("width"),
            (F.pmod(F.col(id_col), F.lit(48)) * 16 + 16).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.pmod(F.col(id_col), F.lit(240)) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode_gray(w: int, h: int, pix: bytes) -> bytes:
    """Minimal PNG writer (grayscale 8-bit, filter 0, stdlib zlib) —
    lets tests and oracle fixtures synthesize REAL image payloads with
    no codec dependency.  Spec: the public PNG format (RFC 2083)."""
    import struct
    import zlib

    if len(pix) != w * h:
        raise ValueError(f"need {w * h} pixels, got {len(pix)}")

    def chunk(typ: bytes, data: bytes) -> bytes:
        c = typ + data
        return (
            struct.pack(">I", len(data))
            + c
            + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pix[y * w:(y + 1) * w] for y in range(h)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_decode_gray(data: bytes) -> tuple[int, int, bytes]:
    """Minimal PNG reader: 8-bit grayscale, non-interlaced, all five
    standard scanline filters (RFC 2083 §6).  Pure stdlib — the
    fallback codec when pillow is absent.  Raises NotImplementedError
    for shapes outside that envelope (color, 16-bit, interlaced)."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG payload")
    pos, idat = 8, b""
    w = h = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype != 0 or interlace != 0:
                raise NotImplementedError(
                    "fallback PNG decoder handles 8-bit grayscale "
                    f"non-interlaced only (depth={depth} color={ctype})"
                )
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise NotImplementedError("PNG missing IHDR")
    raw = zlib.decompress(idat)
    stride = w + 1
    out = bytearray()
    prev = bytearray(w)
    for y in range(h):
        f = raw[y * stride]
        row = bytearray(raw[y * stride + 1:(y + 1) * stride])
        if f == 1:  # Sub
            for x in range(1, w):
                row[x] = (row[x] + row[x - 1]) & 255
        elif f == 2:  # Up
            for x in range(w):
                row[x] = (row[x] + prev[x]) & 255
        elif f == 3:  # Average
            for x in range(w):
                left = row[x - 1] if x else 0
                row[x] = (row[x] + (left + prev[x]) // 2) & 255
        elif f == 4:  # Paeth
            for x in range(w):
                a = row[x - 1] if x else 0
                b, c = prev[x], (prev[x - 1] if x else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                row[x] = (row[x] + pred) & 255
        elif f != 0:
            raise NotImplementedError(f"PNG filter {f}")
        out += row
        prev = row
    return w, h, bytes(out)


def _decode_image_real(payload: bytes, meta) -> "object":
    """Real decode path: pillow when importable, else the vendored
    pure-Python PNG reader above (grayscale 8-bit) — so the REAL
    bytes-to-pixels path runs even in codec-less CI.  Non-PNG payloads
    without pillow raise NotImplementedError (the Spark plumbing —
    schema, partitioning, Arrow batch shape — is identical either
    way)."""
    payload = bytes(payload)
    try:
        from PIL import Image
    except ImportError:
        w, h, pix = png_decode_gray(payload)  # NotImplementedError if not PNG
        n = w * h
        return {
            "digest": hashlib.sha256(payload).hexdigest(),
            "mean": (sum(pix) / n) if n else 0.0,
            "dim": n,
        }
    import io

    import numpy as np

    img = Image.open(io.BytesIO(payload)).convert("L")
    arr = np.asarray(img, dtype=np.float64)
    return {
        "digest": hashlib.sha256(payload).hexdigest(),
        "mean": float(arr.mean()) if arr.size else 0.0,
        "dim": int(img.width * img.height),
    }


def wav_encode_pcm16(sample_rate: int, samples) -> bytes:
    """Minimal RIFF/WAVE writer (mono, 16-bit PCM) through the stdlib
    ``wave`` module — tests and oracle fixtures synthesize REAL audio
    containers with no codec dependency.  Spec: the public RIFF/WAVE
    format (the same container every PCM .wav file uses)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def wav_decode_pcm16(data: bytes) -> tuple[int, list[int]]:
    """RIFF/WAVE reader (stdlib ``wave``): mono 16-bit PCM in, sample
    values out.  Real container parsing — RIFF chunk walk, fmt
    validation, frame extraction — not metadata echo.  Raises
    NotImplementedError for payloads outside the mono/16-bit envelope
    or non-WAV bytes."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(bytes(data)), "rb") as w:
            if w.getnchannels() != 1 or w.getsampwidth() != 2:
                raise NotImplementedError(
                    "fallback WAV decoder handles mono 16-bit PCM only "
                    f"(channels={w.getnchannels()}, "
                    f"sampwidth={w.getsampwidth()})"
                )
            rate = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
    except (wave.Error, EOFError) as exc:
        # wave raises EOFError (not wave.Error) on truncated headers
        raise NotImplementedError(f"not a WAV payload: {exc}") from None
    return rate, list(struct.unpack(f"<{n}h", raw))


def _decode_audio_real(payload: bytes, meta) -> dict:
    """Real audio decode: parse the RIFF/WAVE container and reduce the
    PCM samples to the engine's fixed feature shape (mean sample value,
    sample count) — same contract as the image twin above."""
    payload = bytes(payload)
    _rate, samples = wav_decode_pcm16(payload)
    n = len(samples)
    return {
        "digest": hashlib.sha256(payload).hexdigest(),
        "mean": (sum(samples) / n) if n else 0.0,
        "dim": n,
    }


_Y4M_MAGIC = b"YUV4MPEG2 "


def y4m_encode_gray(w: int, h: int, frames, fps: int = 25) -> bytes:
    """Minimal YUV4MPEG2 writer, ``Cmono`` colorspace (luma plane only)
    — a REAL public video container (the uncompressed interchange
    format of mjpegtools/ffmpeg), trivially seekable: stream header,
    then ``FRAME\\n`` + raw plane per frame."""
    for i, f in enumerate(frames):
        if len(f) != w * h:
            raise ValueError(f"frame {i}: need {w * h} bytes, got {len(f)}")
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode()
    return head + b"".join(b"FRAME\n" + bytes(f) for f in frames)


def y4m_decode_gray(data: bytes) -> tuple[int, int, list[bytes]]:
    """YUV4MPEG2 reader for the ``Cmono`` envelope: parse the stream
    header (W/H/C tags), then walk FRAME markers extracting luma
    planes.  Real container parsing — not stride arithmetic over
    synthetic metadata.  Raises NotImplementedError outside the mono
    envelope (chroma-ful colorspaces need a real pixel pipeline)."""
    data = bytes(data)
    if not data.startswith(_Y4M_MAGIC):
        raise NotImplementedError("not a YUV4MPEG2 payload")
    nl = data.index(b"\n")
    w = h = None
    cspace = "C420jpeg"  # spec default when the C tag is absent
    for tag in data[len(_Y4M_MAGIC):nl].split(b" "):
        if not tag:
            continue
        k, v = chr(tag[0]), tag[1:].decode()
        if k == "W":
            w = int(v)
        elif k == "H":
            h = int(v)
        elif k == "C":
            cspace = "C" + v
    if w is None or h is None:
        raise NotImplementedError("YUV4MPEG2 header missing W/H")
    if cspace != "Cmono":
        raise NotImplementedError(
            f"fallback Y4M decoder handles Cmono only (got {cspace})"
        )
    frames: list[bytes] = []
    pos = nl + 1
    fsize = w * h
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos:pos + 5] != b"FRAME":
            raise NotImplementedError(
                f"YUV4MPEG2: expected FRAME marker at offset {pos}"
            )
        body = data[fnl + 1:fnl + 1 + fsize]
        if len(body) != fsize:
            raise NotImplementedError(
                f"YUV4MPEG2: truncated frame {len(frames)}"
            )
        frames.append(body)
        pos = fnl + 1 + fsize
    return w, h, frames


FRAME_FEATURE_SCHEMA = (
    "doc_id bigint, frame_idx int, width int, height int, "
    "frame_mean double"
)


def frame_sample_decode(
    media: DataFrame, every_n: int = 1, decode_fn=y4m_decode_gray
) -> DataFrame:
    """Frame sampling with a REAL container parse: decode each video
    payload (Y4M by default), keep every ``every_n``-th frame, and emit
    per-frame luma statistics.  Arrow-batched ``mapInPandas`` — one
    Python invocation per batch, payload bytes decoded executor-side;
    the per-doc fan-out happens inside the batch, so no JVM explode of
    binary columns.  Complements :func:`frame_sample`, which is the
    metadata-only (no-decode) planner for when payloads should stay
    untouched."""
    vids = media.filter(F.col("media_type") == "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, idxs, ws, hs, means = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, frames = decode_fn(bytes(payload))
                n = w * h
                for fi in range(0, len(frames), every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    ws.append(w)
                    hs.append(h)
                    means.append(
                        math.floor(sum(frames[fi]) / n * 10000 + 0.5) / 10000
                        if n
                        else 0.0
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "width": ws,
                    "height": hs,
                    "frame_mean": means,
                }
            )

    return vids.mapInPandas(run, FRAME_FEATURE_SCHEMA)


def _decode_fake(payload: bytes, meta) -> dict:
    """Deterministic stand-in for a decoder: digest + mean byte value
    stand in for pixel/sample statistics."""
    return {
        "digest": hashlib.sha256(payload).hexdigest(),
        "mean": float(sum(payload)) / max(len(payload), 1),
        "dim": len(payload) % 512,
    }


def extract_features(media: DataFrame, decode_fn=_decode_fake) -> DataFrame:
    """Decode each payload and emit fixed-width feature rows.

    Arrow-batched: one Python invocation per batch, payloads exposed as
    bytes objects; output schema is fixed (FEATURE_SCHEMA) so
    downstream joins/aggregations stay fully typed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [decode_fn(p, m) for p, m in zip(pdf["payload"], pdf["meta"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "content_digest": [f["digest"] for f in feats],
                    # half-up, not Python's banker's rounding: SQL
                    # ROUND() (and the DuckDB oracle) round ties away
                    # from zero
                    "feat_mean": [
                        math.floor(f["mean"] * 10000 + 0.5) / 10000 for f in feats
                    ],
                    "feat_dim": [f["dim"] for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Explode videos into sampled frame rows (frame index plumbing —
    decode itself is the stubbed kernel above).  JVM-side sequence +
    explode; payload column is carried by reference, not copied per
    frame in Python."""
    vids = media.filter(F.col("media_type") == "video")
    return vids.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
        "payload",
        "meta",
    )


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Metadata-only resize planning: compute target dims JVM-side; the
    pixel transform is the stubbed decode kernel."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("meta.width"), F.col("meta.height")).cast("double"),
    )
    return media.select(
        "doc_id",
        "media_type",
        "payload",
        "meta",
        F.round(F.col("meta.width") * scale).cast("int").alias("target_width"),
        F.round(F.col("meta.height") * scale).cast("int").alias("target_height"),
    )
