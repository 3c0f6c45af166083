"""Real (stdlib-only) multimodal decoders: container-header parsing for
PNG/GIF/BMP/JPEG, WAV audio metadata, and true BMP pixel resize. The
fake=True dataflow stays oracle-gated in __spark_entry__; these tests pin
the real-decode tier on crafted real-format payloads."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from glue_hudi_spark.operators import multimodal as M


def make_bmp(w: int, h: int, pixel_fn) -> bytes:
    """Uncompressed 24-bit bottom-up BMP; pixel_fn(x, y) -> (b, g, r)."""
    row_size = (w * 3 + 3) // 4 * 4
    rows = bytearray()
    for y in reversed(range(h)):  # bottom-up
        row = bytearray()
        for x in range(w):
            row.extend(pixel_fn(x, y))
        row.extend(b"\x00" * (row_size - len(row)))
        rows.extend(row)
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    )
    return bytes(header + rows)


def make_png_header(w: int, h: int, color_type: int = 2) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    )


def make_jpeg_header(w: int, h: int, channels: int = 3) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * channels, 8, h, w, channels)
    return b"\xff\xd8" + app0 + sof0 + b"\x00" * 3 * channels


def make_wav(n_frames: int = 1600, rate: int = 8000, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(channels)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(b"\x01\x02" * n_frames * channels)
    return buf.getvalue()


def test_sniff_image_headers():
    assert M.sniff_image_header(make_png_header(640, 480)) == ("png", 640, 480, 3)
    assert M.sniff_image_header(make_png_header(10, 20, color_type=6)) == ("png", 10, 20, 4)
    assert M.sniff_image_header(b"GIF89a" + struct.pack("<HH", 320, 200)) == ("gif", 320, 200, 3)
    assert M.sniff_image_header(make_bmp(4, 2, lambda x, y: (0, 0, 0)))[:3] == ("bmp", 4, 2)
    assert M.sniff_image_header(make_jpeg_header(800, 600)) == ("jpeg", 800, 600, 3)
    assert M.sniff_image_header(b"not an image at all") is None


def _media_df(spark, payloads):
    rows = [(i, p, "image", f"mem://{i}") for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_decode_image_metadata_real(spark):
    df = _media_df(
        spark,
        [
            make_png_header(640, 480),
            make_bmp(4, 2, lambda x, y: (1, 2, 3)),
            b"unrecognized payload bytes",
        ],
    )
    got = {r["media_id"]: r for r in M.decode_image_metadata(df).collect()}
    assert (got[0]["width"], got[0]["height"], got[0]["channels"]) == (640, 480, 3)
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (4, 2, 3)
    assert got[2]["width"] is None and got[2]["n_bytes"] > 0  # graceful null


def test_decode_audio_metadata_wav(spark):
    df = _media_df(spark, [make_wav(1600, 8000, 1), b"not audio"])
    got = {r["media_id"]: r for r in M.decode_audio_metadata(df).collect()}
    assert got[0]["n_channels"] == 1
    assert got[0]["sample_rate"] == 8000
    assert got[0]["n_frames"] == 1600
    assert got[0]["duration_s"] == pytest.approx(0.2)
    assert got[1]["n_channels"] is None


def test_resize_bmp_real_pixels(spark):
    # 4x2 image: left half blue-ish, right half red-ish
    src = make_bmp(4, 2, lambda x, y: (255, 0, 0) if x < 2 else (0, 0, 255))
    df = _media_df(spark, [src, b"\xff\xd8 not bmp"])
    got = {r["media_id"]: r for r in M.resize_images(df, 2, 1).collect()}
    out = got[0]
    assert (out["width"], out["height"]) == (2, 1)
    parsed = M.sniff_image_header(bytes(out["payload"]))
    assert parsed == ("bmp", 2, 1, 3)
    # nearest-neighbor: pixel 0 from the blue half, pixel 1 from the red half
    body = bytes(out["payload"])[54:]
    assert body[0:3] == b"\xff\x00\x00" and body[3:6] == b"\x00\x00\xff"
    assert got[1]["payload"] is None  # non-BMP degrades to null, not an error


def test_resize_roundtrip_identity(spark):
    src = make_bmp(3, 3, lambda x, y: (x * 10, y * 10, 100))
    df = _media_df(spark, [src])
    out = M.resize_images(df, 3, 3).collect()[0]
    assert bytes(out["payload"])[54:] == src[54:]  # same pixel array


def make_topdown_bmp(w: int, h: int, pixel_fn) -> bytes:
    """24-bit BMP with NEGATIVE height — rows stored top-down."""
    row_size = (w * 3 + 3) // 4 * 4
    rows = bytearray()
    for y in range(h):  # top-down
        row = bytearray()
        for x in range(w):
            row.extend(pixel_fn(x, y))
        row.extend(b"\x00" * (row_size - len(row)))
        rows.extend(row)
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    )
    return bytes(header + rows)


def test_resize_topdown_bmp_not_mirrored(spark):
    # 2x2: TOP row red, BOTTOM row blue (in visual orientation)
    src = make_topdown_bmp(
        2, 2, lambda x, y: (0, 0, 255) if y == 0 else (255, 0, 0)
    )
    df = _media_df(spark, [src])
    out = M.resize_images(df, 2, 2).collect()[0]
    payload = bytes(out["payload"])
    w, h = struct.unpack("<ii", payload[18:26])
    assert h == 2  # output is declared bottom-up
    body = payload[54:]
    # bottom-up storage: first stored row is the visual BOTTOM row (blue);
    # the round-2 bug left rows top-down under a positive-height header,
    # which read back vertically mirrored
    assert body[0:3] == b"\xff\x00\x00"  # bottom row blue (b,g,r)
    assert body[8:11] == b"\x00\x00\xff"  # top row red


def test_jpeg_sniff_fill_bytes_and_rst_markers():
    # fill bytes before APP0, a TEM marker, and an SOF5 frame
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof5 = b"\xff\xc5" + struct.pack(">HBHHB", 11, 8, 600, 800, 3)
    data = b"\xff\xd8" + b"\xff" * 3 + app0 + b"\xff\x01" + sof5 + b"\x00" * 9
    assert M.sniff_image_header(data) == ("jpeg", 800, 600, 3)


def test_jpeg_sniff_skips_dht_and_reads_sof2():
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00" * 3
    sof2 = b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 10, 20, 1)
    data = b"\xff\xd8" + dht + sof2 + b"\x00" * 3
    assert M.sniff_image_header(data) == ("jpeg", 20, 10, 1)


def test_jpeg_sniff_truncated_returns_nulls():
    # APP0 whose declared length runs past the end of the payload
    data = b"\xff\xd8\xff\xe0" + struct.pack(">H", 64) + b"JFIF"
    assert M.sniff_image_header(data) == ("jpeg", None, None, None)
