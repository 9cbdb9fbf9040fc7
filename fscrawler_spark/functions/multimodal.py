"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via mapInPandas.

Decode is conditionally REAL for images: ``extract_media_features`` and
``resize_images`` run a true PIL decode (feature stats / LANCZOS resize)
whenever PIL imports on the executors, with per-row failures captured in
``decode_error``; without PIL they raise NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder derives
pixel-stat stand-ins from the payload bytes — the Spark-side plumbing
(schema, Arrow batch shape, partitioning, UDF signatures) is identical
on both paths. Video frame sampling remains fake-only (no ffmpeg).

``probe_media_headers`` is the ALWAYS-real tier: container-format
header parsing (PNG IHDR, JPEG SOF marker walk, GIF logical screen,
BMP info header, WEBP VP8/VP8L/VP8X) is pure byte arithmetic — no
image library — so width/height/channels/bit-depth metadata extraction
runs for real in any environment, exactly the fields Tika's image
parser family surfaces as metadata (tika/.../TikaInstance.java:136-186
wires ImageParser/JpegParser, whose output is dimensions + EXIF-ish
metadata, not pixels). Pixel statistics stay PIL-gated above.

Analog in the reference: Tika's image parsers are wired into the parser
composition but OCR auto-disables when the tesseract binary is missing
(TikaInstance.java:151-207) — same gate-on-capability pattern.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_error", T.StringType()),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': byte-histogram-ish feature vector.
    Stands in for PIL decode / librosa features / frame sampling."""
    if not payload:
        return [0.0] * dim
    buckets = [0] * dim
    for i, b in enumerate(payload[:4096]):
        buckets[b % dim] += 1
    total = sum(buckets) or 1
    return [round(x / total, 6) for x in buckets]


# --- container-format header probe (stdlib-only, always real) -----------
#
# Each parser reads ONLY the container header — a few dozen bytes of
# struct arithmetic per item, no pixel decode — which is why this tier
# needs no image library and costs O(1) per item regardless of payload
# size. Formats: the five raster containers the extractor's MIME sniffer
# already dispatches to needs_ocr (functions/sniff.py magics) plus WEBP,
# TIFF and RIFF/WAVE audio.

_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color_type -> samples/pixel


def _u16be(b: bytes, i: int) -> int:
    return (b[i] << 8) | b[i + 1]


def _u32be(b: bytes, i: int) -> int:
    return (b[i] << 24) | (b[i + 1] << 16) | (b[i + 2] << 8) | b[i + 3]


def _u16le(b: bytes, i: int) -> int:
    return b[i] | (b[i + 1] << 8)


def _u24le(b: bytes, i: int) -> int:
    return b[i] | (b[i + 1] << 8) | (b[i + 2] << 16)


def _u32le(b: bytes, i: int) -> int:
    return b[i] | (b[i + 1] << 8) | (b[i + 2] << 16) | (b[i + 3] << 24)


def _probe_png(b: bytes) -> dict | None:
    # 8-byte signature, then the IHDR chunk MUST come first (PNG spec
    # 5.6): length(4) 'IHDR'(4) width(4) height(4) depth(1) color(1)
    if len(b) < 26 or b[12:16] != b"IHDR":
        return None
    color = b[25]
    return {
        "mime": "image/png",
        "width": _u32be(b, 16),
        "height": _u32be(b, 20),
        "channels": _PNG_CHANNELS.get(color),
        "bit_depth": b[24],
    }


def _probe_jpeg(b: bytes) -> dict | None:
    # marker walk to the first SOFn frame header: precision(1)
    # height(2) width(2) components(1) after the 2-byte segment length
    i, n = 2, len(b)
    while i + 9 < n:
        if b[i] != 0xFF:
            return None  # lost sync — not a well-formed JPEG stream
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in _JPEG_SOF:
            return {
                "mime": "image/jpeg",
                "width": _u16be(b, i + 7),
                "height": _u16be(b, i + 5),
                "channels": b[i + 9],
                "bit_depth": b[i + 4],
            }
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:  # standalone
            i += 2
            continue
        if marker == 0xD9 or marker == 0xDA:  # EOI / entropy data: give up
            return None
        i += 2 + _u16be(b, i + 2)
    return None


def _probe_gif(b: bytes) -> dict | None:
    if len(b) < 11:
        return None
    packed = b[10]
    return {
        "mime": "image/gif",
        "width": _u16le(b, 6),
        "height": _u16le(b, 8),
        "channels": 3,  # palette entries are RGB triples
        "bit_depth": ((packed >> 4) & 0x7) + 1,  # color resolution field
    }


def _probe_bmp(b: bytes) -> dict | None:
    if len(b) < 30 or _u32le(b, 14) < 40:  # BITMAPINFOHEADER or later
        return None
    bitcount = _u16le(b, 28)
    w = _u32le(b, 18)
    h = _u32le(b, 22)
    if h >= 1 << 31:  # negative i32 = top-down row order
        h = (1 << 32) - h
    return {
        "mime": "image/bmp",
        "width": w,
        "height": h,
        "channels": {32: 4, 24: 3, 16: 3}.get(bitcount, 1),
        "bit_depth": {32: 8, 24: 8, 16: 5}.get(bitcount, bitcount),
    }


def _probe_webp(b: bytes) -> dict | None:
    if len(b) < 25 or b[8:12] != b"WEBP":
        return None
    four = b[12:16]
    if four == b"VP8 " and len(b) >= 30 and b[23:26] == b"\x9d\x01\x2a":  # lossy sync
        return {
            "mime": "image/webp",
            "width": _u16le(b, 26) & 0x3FFF,
            "height": _u16le(b, 28) & 0x3FFF,
            "channels": 3,
            "bit_depth": 8,
        }
    if four == b"VP8L" and b[20] == 0x2F:  # lossless signature byte
        bits = _u32le(b, 21)
        return {
            "mime": "image/webp",
            "width": (bits & 0x3FFF) + 1,
            "height": ((bits >> 14) & 0x3FFF) + 1,
            "channels": 4 if (bits >> 28) & 1 else 3,
            "bit_depth": 8,
        }
    if four == b"VP8X" and len(b) >= 30:  # extended: flags, 3 reserved, two u24-1
        return {
            "mime": "image/webp",
            "width": _u24le(b, 24) + 1,
            "height": _u24le(b, 27) + 1,
            "channels": 4 if b[20] & 0x10 else 3,
            "bit_depth": 8,
        }
    return None


def _probe_tiff(b: bytes) -> dict | None:
    # IFD walk for ImageWidth(256)/ImageLength(257)/BitsPerSample(258)/
    # SamplesPerPixel(277); inline SHORT/LONG values only (the common
    # baseline-TIFF layout). Bounded: first IFD, <=256 entries.
    le = b[:2] == b"II"
    u16 = _u16le if le else _u16be
    u32 = _u32le if le else _u32be
    if len(b) < 8 or u16(b, 2) != 42:
        return None
    ifd = u32(b, 4)
    if ifd + 2 > len(b):
        return None
    n = min(u16(b, ifd), 256)
    vals: dict[int, int] = {}
    for k in range(n):
        e = ifd + 2 + 12 * k
        if e + 12 > len(b):
            break
        tag, typ = u16(b, e), u16(b, e + 2)
        if tag in (256, 257, 258, 277) and typ in (3, 4):
            vals[tag] = u16(b, e + 8) if typ == 3 else u32(b, e + 8)
    if 256 not in vals or 257 not in vals:
        return None
    return {
        "mime": "image/tiff",
        "width": vals[256],
        "height": vals[257],
        "channels": vals.get(277, 1),
        "bit_depth": vals.get(258, 1),
    }


def _probe_wav(b: bytes) -> dict | None:
    # RIFF/WAVE chunk walk to 'fmt ' (channels/rate/bits) and 'data'
    # (byte length -> duration). Chunks are word-aligned.
    if len(b) < 12 or b[8:12] != b"WAVE":
        return None
    out = {"mime": "audio/wav", "channels": None, "bit_depth": None,
           "sample_rate": None, "duration_ms": None}
    i, byte_rate, data_len = 12, None, None
    while i + 8 <= len(b):
        cid, clen = b[i : i + 4], _u32le(b, i + 4)
        if cid == b"fmt " and i + 24 <= len(b):
            out["channels"] = _u16le(b, i + 10)
            out["sample_rate"] = _u32le(b, i + 12)
            byte_rate = _u32le(b, i + 16)
            if i + 24 + 2 <= len(b):
                out["bit_depth"] = _u16le(b, i + 22)
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen & 1)
    if byte_rate and data_len is not None:
        out["duration_ms"] = int(data_len * 1000 // byte_rate)
    if out["sample_rate"] is None:
        return None
    return out


def probe_media_header(payload: bytes) -> dict | None:
    """Parse one payload's container header: dict with at least ``mime``
    (plus width/height/channels/bit_depth for images, channels/
    sample_rate/bit_depth/duration_ms for WAV audio), or None when no
    known container matches. Pure stdlib byte arithmetic — total, never
    raises on hostile bytes (a truncated/garbled header is just None)."""
    b = payload or b""
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            return _probe_png(b)
        if b[:2] == b"\xff\xd8":
            return _probe_jpeg(b)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            return _probe_gif(b)
        if b[:2] == b"BM":
            return _probe_bmp(b)
        if b[:4] == b"RIFF":
            return _probe_webp(b) or _probe_wav(b)
        if b[:4] in (b"II*\x00", b"MM\x00*"):
            return _probe_tiff(b)
    except IndexError:  # truncated header mid-parse
        return None
    return None


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def probe_media_headers(
    df: DataFrame, header_prefix_bytes: int | None = 65536
) -> DataFrame:
    """REAL (no library, any environment) media metadata extraction:
    mapInPandas over binary payloads parsing container headers only —
    PNG/JPEG/GIF/BMP/WEBP/TIFF dimensions + channels + bit depth, WAV
    channel/rate/duration. Unrecognized payloads get
    decode_error='unrecognized_container' and NULL metadata, never a
    job failure. Stateless per batch: partitioning free-form, scales
    embarrassingly parallel, O(header) per item.

    ``header_prefix_bytes`` (default 64 KiB) slices each payload
    JVM-side BEFORE the Arrow boundary — the probe never needs pixel/
    sample data, so gigabyte media items must not ride the Python
    transfer (byte_len still reports the FULL length, computed in the
    same codegen projection). 64 KiB clears every fixed-offset header
    plus JPEG marker walks past typical EXIF/thumbnail APP segments;
    raise it for JPEGs with pathological metadata prefixes, or pass
    None to ship whole payloads (fixture-scale only). All chunk-walk
    parsers (JPEG/WAV/TIFF) are truncation-total: a header beyond the
    prefix degrades to 'unrecognized_container', never a wrong value
    — WAV's duration in particular needs only the data-chunk HEADER
    (its recorded length), not the samples."""

    cols = [F.col("media_id"), F.col("kind")]
    if header_prefix_bytes is not None:
        if header_prefix_bytes < 32:
            raise ValueError(
                f"header_prefix_bytes must be >= 32 (the largest fixed "
                f"header region), got {header_prefix_bytes}"
            )
        src = df.select(
            *cols,
            F.length(F.col("payload")).alias("_full_len"),
            F.substring(F.col("payload"), 1, header_prefix_bytes).alias("payload"),
        )
    else:
        src = df.select(
            *cols, F.length(F.col("payload")).alias("_full_len"), F.col("payload")
        )

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {k.name: [] for k in PROBE_SCHEMA.fields}
            for mid, kind, flen, p in zip(
                pdf["media_id"], pdf["kind"], pdf["_full_len"], pdf["payload"]
            ):
                b = bytes(p) if p is not None else b""
                info = probe_media_header(b)
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["byte_len"].append(0 if pd.isna(flen) else int(flen))
                rows["mime"].append(info["mime"] if info else None)
                for f in ("width", "height", "channels", "bit_depth",
                          "sample_rate", "duration_ms"):
                    rows[f].append(info.get(f) if info else None)
                rows["decode_error"].append(
                    None if info else "unrecognized_container"
                )
            yield pd.DataFrame(rows)

    return src.mapInPandas(gen, PROBE_SCHEMA)


def _pil_features(Image, payload: bytes) -> list[float]:
    """Real image features from a decoded payload: [width, height, bands,
    mean_r, mean_g, mean_b, std_r, std_g, std_b]. Stats are computed on a
    bounded (64x64 thumbnail) RGB view so the per-item cost is constant
    regardless of source resolution; width/height report the ORIGINAL
    size. Raises on undecodable bytes — callers turn that into a per-row
    decode_error."""
    import io

    import numpy as np

    img = Image.open(io.BytesIO(payload))
    width, height = img.size
    bands = len(img.getbands())
    rgb = img.convert("RGB")
    rgb.thumbnail((64, 64))
    arr = np.asarray(rgb, dtype=np.float64) / 255.0
    means = arr.mean(axis=(0, 1))
    stds = arr.std(axis=(0, 1))
    return (
        [float(width), float(height), float(bands)]
        + [round(float(x), 6) for x in means]
        + [round(float(x), 6) for x in stds]
    )


def extract_media_features(df: DataFrame, fake: bool = True, feature_dim: int = 8) -> DataFrame:
    """mapInPandas over binary payloads -> per-item feature rows.

    Batched with Arrow; each pandas batch is independent (stateless), so
    partitioning is free-form and the op scales embarrassingly parallel.

    fake=True (default): the deterministic byte-histogram decoder — the
    oracle-stable fixture path (q_media_features pins it). fake=False:
    REAL decode via PIL when importable on the executors — 9-dim
    [width, height, bands, RGB means, RGB stds] per image (see
    _pil_features; per-row decode failures, including audio/video
    payloads PIL cannot open, land in decode_error and never fail the
    job), else NotImplementedError. Same conditional-capability gate as
    resize_images — the reference auto-disables OCR the same way when
    tesseract is missing (tika/.../TikaInstance.java:151-207)."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        if not fake:
            try:
                from PIL import Image
            except ImportError as e:
                raise NotImplementedError(
                    "real media feature decode requires PIL on the executors; "
                    "run with fake=True"
                ) from e
        for pdf in batches:
            feats, errs = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                try:
                    feats.append(
                        _fake_decode(b, feature_dim) if fake else _pil_features(Image, b)
                    )
                    errs.append(None)
                except Exception as e:  # never fail the job on one item
                    feats.append(None)
                    errs.append(f"decode_error: {type(e).__name__}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    return df.mapInPandas(gen, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("decode_error", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("ts_ms", T.IntegerType()),
    ]
)


def resize_images(df: DataFrame, width: int = 224, height: int = 224, fake: bool = True) -> DataFrame:
    """Image resize over binary payloads (mapInPandas).

    fake=True (default): deterministic byte block of the target size so
    schema/batching/partitioning are exercised end-to-end without any
    image library. fake=False: REAL decode via PIL when importable on
    the executors (decode → LANCZOS resize → PNG re-encode; per-row
    decode failures land in decode_error, never fail the job), else
    NotImplementedError — the env-gate is honest: the real path runs
    wherever PIL exists (skip-marked test in tests/test_round4_misc.py),
    and this container intentionally lacks it."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        if not fake:
            try:
                from PIL import Image
            except ImportError as e:
                raise NotImplementedError(
                    "real resize requires PIL on the executors; run with fake=True"
                ) from e
        for pdf in batches:
            payloads, errs = [], []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                if fake:
                    seed = (sum(b[:64]) if b else 0) % 256
                    payloads.append(bytes([seed]) * min(width * height // 64, 4096))
                    errs.append(None)
                    continue
                try:
                    import io

                    img = Image.open(io.BytesIO(b))
                    out = io.BytesIO()
                    img.resize((width, height), Image.LANCZOS).save(out, format="PNG")
                    payloads.append(out.getvalue())
                    errs.append(None)
                except Exception as e:  # one bad image never fails the batch
                    payloads.append(None)
                    errs.append(f"decode_error: {type(e).__name__}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                    "decode_error": errs,
                }
            )

    return df.mapInPandas(gen, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 8, fake: bool = True) -> DataFrame:
    """Video frame sampling: one input row -> N frame rows (mapInPandas is
    a flat map, so the 1->N fan-out is native). STUB decode: deterministic
    byte slices stand in for decoded frames."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": [], "ts_ms": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError("real frame decode requires ffmpeg; run with fake=True")
                b = bytes(p) if p is not None else b""
                n = min(max_frames, max(1, len(b) // 256))
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame"].append(b[i * 256 : (i + 1) * 256])
                    out["ts_ms"].append(i * every_ms)
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "video").mapInPandas(gen, FRAME_SCHEMA)


def _kind_index(df: DataFrame) -> F.Column:
    """1-based round-robin index over the 3 kinds, dispatched on the id
    TYPE: numeric ids keep the oracle-pinned `doc_id % 3` (DuckDB twin:
    CASE doc_id % 3), while string ids (the real docs table's sha256
    doc_id) hash first — a bare `% 3` on a hex string throws
    CAST_INVALID_INPUT under Spark 4 ANSI."""
    from pyspark.sql import types as T

    if isinstance(df.schema["doc_id"].dataType, T.NumericType):
        return (F.col("doc_id") % 3 + 1).cast("int")
    return (F.pmod(F.xxhash64(F.col("doc_id")), F.lit(3)) + 1).cast("int")


def _synth_png(width: int, height: int) -> bytes:
    """Author a complete, spec-valid RGB8 PNG (zlib stream + CRCs) —
    stdlib-only, deterministic. Used by the media fixture so the probe
    runs against REAL container bytes, not stand-ins."""
    import struct
    import zlib
    from binascii import crc32

    def chunk(typ: bytes, data: bytes) -> bytes:
        return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", crc32(typ + data))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes((width * 3) % 251 for _ in range(width * 3))
    idat = zlib.compress(row * height, 1)
    return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def _synth_wav(channels: int, rate: int, frames: int) -> bytes:
    """Author a complete RIFF/WAVE file via the stdlib ``wave`` encoder
    (16-bit PCM) — an independent implementation of the format the
    probe parses."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * frames * channels)
    return buf.getvalue()


def media_probe_fixture(df: DataFrame) -> DataFrame:
    """Deterministic REAL-container media fixture from a numeric-id text
    table: image rows carry a spec-valid PNG sized (id%64+1, id%37+1),
    audio rows a stdlib-`wave`-encoded PCM file ((id%10+1)*80 frames at
    8 kHz, id%2+1 channels — exactly (id%10+1)*10 ms), video rows an
    unrecognizable payload (frame decode is the documented stub tier).
    Every probed field is closed-form in doc_id, so a plain-SQL oracle
    can value-check the whole probe→metadata path (q_media_features)."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "kind": [], "payload": []}
            for did in pdf["doc_id"]:
                i = int(did)
                k = ("image", "audio", "video")[i % 3]
                if k == "image":
                    p = _synth_png(i % 64 + 1, i % 37 + 1)
                elif k == "audio":
                    p = _synth_wav(i % 2 + 1, 8000, (i % 10 + 1) * 80)
                else:
                    p = b"\x00opaque-video-payload:" + str(i).encode()
                out["media_id"].append(str(i))
                out["kind"].append(k)
                out["payload"].append(p)
            yield pd.DataFrame(out)

    return df.select("doc_id").mapInPandas(
        gen, "media_id string, kind string, payload binary"
    )


def media_table_from_documents(df: DataFrame) -> DataFrame:
    """Derive a deterministic media fixture from a text table: payload =
    UTF-8 bytes, kind round-robins by id. Used by tests and the smoke
    queries — real deployments read true binary columns instead."""
    return df.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            _kind_index(df),
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
