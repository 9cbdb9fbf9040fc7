"""Round 5: stdlib container-header probe (the always-real multimodal
metadata tier, functions/multimodal.py probe_media_header[s]).

Ground truth is independent of the parser: every fixture is AUTHORED
byte-by-byte from its public container spec (PNG: RFC 2083 / W3C,
JPEG: ITU T.81 marker syntax, GIF89a spec, BMP BITMAPINFOHEADER,
WEBP container spec, TIFF 6.0, RIFF/WAVE) — and the WAV case is
written by the stdlib ``wave`` module, a fully independent encoder.
"""

import io
import struct
import wave
import zlib
from binascii import crc32

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fscrawler_spark.functions.multimodal import (
    probe_media_header,
    probe_media_headers,
)


# --- authored fixtures ------------------------------------------------


def make_png(width, height, color_type=2, bit_depth=8):
    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    row = b"\x00" + b"\x80" * (width * channels * bit_depth // 8)
    idat = zlib.compress(row * height)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def make_gif(width, height):
    # GIF89a logical screen descriptor; color resolution field = 7 (8 bits)
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([0xF7, 0, 0])
        + b"\x3b"
    )


def make_jpeg(width, height, sof=0xC0, components=3, precision=8):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    comp = b"".join(bytes([i + 1, 0x22 if i == 0 else 0x11, i and 1]) for i in range(components))
    sofdata = struct.pack(">BHHB", precision, height, width, components) + comp
    sofseg = bytes([0xFF, sof]) + struct.pack(">H", 2 + len(sofdata)) + sofdata
    return b"\xff\xd8" + app0 + sofseg + b"\xff\xd9"


def make_bmp(width, height, bitcount=24, topdown=False):
    h = -height if topdown else height
    info = struct.pack("<IiiHHIIiiII", 40, width, h, 1, bitcount, 0, 0, 2835, 2835, 0, 0)
    filehdr = b"BM" + struct.pack("<IHHI", 14 + 40, 0, 0, 14 + 40)
    return filehdr + info


def make_webp_vp8l(width, height, alpha=False):
    bits = (width - 1) | ((height - 1) << 14) | ((1 << 28) if alpha else 0)
    data = b"\x2f" + struct.pack("<I", bits)
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(data)) + b"WEBP" + b"VP8L" + struct.pack("<I", len(data)) + data


def make_webp_vp8(width, height):
    data = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", width, height)
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(data)) + b"WEBP" + b"VP8 " + struct.pack("<I", len(data)) + data


def make_webp_vp8x(width, height, alpha=True):
    data = bytes([0x10 if alpha else 0, 0, 0, 0]) + struct.pack("<I", width - 1)[:3] + struct.pack("<I", height - 1)[:3]
    return b"RIFF" + struct.pack("<I", 4 + 8 + len(data)) + b"WEBP" + b"VP8X" + struct.pack("<I", len(data)) + data


def make_tiff(width, height, big_endian=False, bits=8, samples=3):
    bo, u16, u32 = ("MM", ">H", ">I") if big_endian else ("II", "<H", "<I")

    def entry(tag, typ, val):
        # inline SHORT (left-justified in the 4-byte value slot) or LONG
        if typ == 3:
            return struct.pack(u16, tag) + struct.pack(u16, typ) + struct.pack(u32, 1) + struct.pack(u16, val) + b"\x00\x00"
        return struct.pack(u16, tag) + struct.pack(u16, typ) + struct.pack(u32, 1) + struct.pack(u32, val)

    entries = (
        entry(256, 4, width)
        + entry(257, 3, height)
        + entry(258, 3, bits)
        + entry(277, 3, samples)
    )
    hdr = bo.encode() + struct.pack(u16, 42) + struct.pack(u32, 8)
    ifd = struct.pack(u16, 4) + entries + struct.pack(u32, 0)
    return hdr + ifd


def make_wav(seconds=0.5, rate=8000, channels=2, sampwidth=2):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(b"\x00" * int(seconds * rate) * channels * sampwidth)
    return buf.getvalue()


# --- pure-function cases ----------------------------------------------


def test_png_rgb():
    info = probe_media_header(make_png(3, 2))
    assert info == {"mime": "image/png", "width": 3, "height": 2, "channels": 3, "bit_depth": 8}


def test_png_variants():
    assert probe_media_header(make_png(640, 480, color_type=6))["channels"] == 4
    g16 = probe_media_header(make_png(10, 10, color_type=0, bit_depth=16))
    assert (g16["channels"], g16["bit_depth"]) == (1, 16)
    pal = probe_media_header(make_png(16, 8, color_type=3, bit_depth=8))
    assert pal["channels"] == 1


def test_gif():
    info = probe_media_header(make_gif(7, 5))
    assert info == {"mime": "image/gif", "width": 7, "height": 5, "channels": 3, "bit_depth": 8}


def test_jpeg_baseline_and_progressive():
    for sof in (0xC0, 0xC2):
        info = probe_media_header(make_jpeg(20, 10, sof=sof))
        assert (info["mime"], info["width"], info["height"]) == ("image/jpeg", 20, 10)
        assert info["channels"] == 3 and info["bit_depth"] == 8
    gray = probe_media_header(make_jpeg(4, 4, components=1))
    assert gray["channels"] == 1


def test_jpeg_twelve_bit():
    assert probe_media_header(make_jpeg(8, 8, sof=0xC1, precision=12))["bit_depth"] == 12


def test_bmp_bottom_up_and_top_down():
    for topdown in (False, True):
        info = probe_media_header(make_bmp(4, 3, topdown=topdown))
        assert (info["mime"], info["width"], info["height"]) == ("image/bmp", 4, 3)
        assert info["channels"] == 3
    assert probe_media_header(make_bmp(2, 2, bitcount=32))["channels"] == 4


def test_webp_all_three_layouts():
    lossless = probe_media_header(make_webp_vp8l(16, 9, alpha=True))
    assert (lossless["width"], lossless["height"], lossless["channels"]) == (16, 9, 4)
    lossy = probe_media_header(make_webp_vp8(12, 7))
    assert (lossy["width"], lossy["height"], lossy["channels"]) == (12, 7, 3)
    ext = probe_media_header(make_webp_vp8x(100, 50))
    assert (ext["width"], ext["height"], ext["channels"]) == (100, 50, 4)
    assert all(i["mime"] == "image/webp" for i in (lossless, lossy, ext))


def test_tiff_both_byte_orders():
    for be in (False, True):
        info = probe_media_header(make_tiff(33, 44, big_endian=be))
        assert (info["mime"], info["width"], info["height"]) == ("image/tiff", 33, 44)
        assert (info["channels"], info["bit_depth"]) == (3, 8)


def test_wav_via_stdlib_encoder():
    info = probe_media_header(make_wav(seconds=0.5, rate=8000, channels=2, sampwidth=2))
    assert info["mime"] == "audio/wav"
    assert info["channels"] == 2
    assert info["sample_rate"] == 8000
    assert info["bit_depth"] == 16
    assert info["duration_ms"] == 500


def test_unrecognized_and_truncated():
    assert probe_media_header(b"") is None
    assert probe_media_header(b"not an image at all") is None
    assert probe_media_header(None) is None
    # truncated mid-header: recognized magic, incomplete fields -> None
    assert probe_media_header(make_png(3, 2)[:12]) is None
    assert probe_media_header(b"\xff\xd8\xff") is None
    assert probe_media_header(b"RIFF\x04\x00\x00\x00WEBP") is None
    assert probe_media_header(b"II*\x00\x08\x00\x00\x00") is None


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=128))
def test_probe_is_total_on_hostile_bytes(b):
    info = probe_media_header(b)
    assert info is None or isinstance(info.get("mime"), str)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=64), st.sampled_from(["png", "gif", "jpeg", "bmp", "webp", "tiff", "wav"]))
def test_probe_is_total_on_truncated_real_headers(b, kind):
    full = {
        "png": make_png(9, 9), "gif": make_gif(9, 9), "jpeg": make_jpeg(9, 9),
        "bmp": make_bmp(9, 9), "webp": make_webp_vp8l(9, 9),
        "tiff": make_tiff(9, 9), "wav": make_wav(0.01),
    }[kind]
    for cut in (2, 6, 10, 15, 21, len(full) // 2):
        probe_media_header(full[:cut] + b)  # must not raise


# --- Spark operator ----------------------------------------------------


def test_probe_media_headers_operator(spark):
    rows = [
        ("png1", "image", make_png(3, 2)),
        ("jpg1", "image", make_jpeg(20, 10)),
        ("wav1", "audio", make_wav()),
        ("junk", "video", b"\x00\x01\x02 junk payload"),
        ("null", "image", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, kind string, payload binary")
    out = {r["media_id"]: r.asDict() for r in probe_media_headers(df).collect()}

    assert out["png1"]["mime"] == "image/png" and out["png1"]["width"] == 3
    assert out["jpg1"]["height"] == 10 and out["jpg1"]["decode_error"] is None
    assert out["wav1"]["duration_ms"] == 500 and out["wav1"]["width"] is None
    assert out["junk"]["decode_error"] == "unrecognized_container"
    assert out["null"]["byte_len"] == 0 and out["null"]["decode_error"] == "unrecognized_container"
    assert out["png1"]["byte_len"] == len(make_png(3, 2))


def test_probe_schema_stable_on_empty_input(spark):
    df = spark.createDataFrame([], "media_id string, kind string, payload binary")
    out = probe_media_headers(df)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "media_id", "kind", "byte_len", "mime", "width", "height",
        "channels", "bit_depth", "sample_rate", "duration_ms", "decode_error",
    ]


def test_header_prefix_slices_before_python_but_reports_full_len(spark):
    # a real PNG header followed by megabytes of trailing payload: the
    # probe must still decode it from the 64 KiB prefix AND report the
    # full byte length (computed JVM-side, not from the sliced bytes)
    big = make_png(31, 17) + b"\x00" * (2 * 1024 * 1024)
    df = spark.createDataFrame(
        [("big", "image", big), ("wav", "audio", make_wav())],
        "media_id string, kind string, payload binary",
    )
    out = {r["media_id"]: r.asDict() for r in probe_media_headers(df).collect()}
    assert out["big"]["width"] == 31 and out["big"]["height"] == 17
    assert out["big"]["byte_len"] == len(big)
    assert out["wav"]["duration_ms"] == 500  # data-chunk HEADER suffices

    # tiny prefix: a header past it degrades to unrecognized, never wrong
    tiny = {r["media_id"]: r.asDict()
            for r in probe_media_headers(df, header_prefix_bytes=32).collect()}
    assert tiny["big"]["width"] == 31  # PNG IHDR fits in 32 bytes
    assert tiny["big"]["byte_len"] == len(big)

    with pytest.raises(ValueError, match=">= 32"):
        probe_media_headers(df, header_prefix_bytes=8)


def test_header_prefix_none_ships_whole_payload(spark):
    df = spark.createDataFrame(
        [("x", "image", make_png(5, 5))],
        "media_id string, kind string, payload binary",
    )
    out = probe_media_headers(df, header_prefix_bytes=None).collect()[0]
    assert out["width"] == 5 and out["byte_len"] == len(make_png(5, 5))
