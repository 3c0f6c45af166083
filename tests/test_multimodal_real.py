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


# ---------------------------------------------------------------- JPEG
# Baseline JPEG codec (operators.jpeg): stdlib+numpy encode/decode.

import numpy as np

from glue_hudi_spark.operators import jpeg as J


def _gradient_rgb(h=45, w=61):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256],
                    axis=-1).astype(np.uint8)


def test_jpeg_roundtrip_rgb_non_multiple_of_8():
    img = _gradient_rgb()
    data = J.encode_baseline(img, quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = J.decode_baseline(data)
    assert out is not None and out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_jpeg_roundtrip_gray_and_solid_exact():
    g = ((np.arange(20)[:, None] * 5 + np.arange(33)[None, :] * 3) % 200
         ).astype(np.uint8)
    out = J.decode_baseline(J.encode_baseline(g, quality=95))
    assert out is not None and out.shape == g.shape
    # solid color survives exactly (DC-only blocks)
    solid = np.full((16, 24, 3), 200, dtype=np.uint8)
    o2 = J.decode_baseline(J.encode_baseline(solid, 90))
    assert np.array_equal(o2, solid)


def test_jpeg_decode_third_party_baseline_file():
    import os
    p = ("/root/.pyenv/versions/3.11.7/lib/python3.11/site-packages/"
         "IPython/core/tests/2x2.jpg")
    if not os.path.exists(p):
        pytest.skip("no third-party jpeg on this machine")
    out = J.decode_baseline(open(p, "rb").read())
    assert out is not None and out.shape == (2, 2)


def test_jpeg_progressive_and_garbage_rejected_not_raised():
    # progressive: SOF2 frame marker
    prog = b"\xff\xd8\xff\xc2" + struct.pack(">H", 11) + bytes(9)
    assert J.decode_baseline(prog) is None
    assert J.decode_baseline(b"\xff\xd8\x00\x01\x02") is None
    assert J.decode_baseline(b"") is None


def test_jpeg_decode_420_subsampled():
    """Validate the subsampled-MCU decode path with a test-side 4:2:0
    encoder built from the module's own primitives: luma at full res
    (2x2 blocks per MCU), chroma at half res. A flat color image is
    DC-only in every block, so the decode must reproduce it exactly."""
    rgb = np.full((32, 48, 3), 0, dtype=np.uint8)
    rgb[...] = (90, 160, 40)
    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    half = lambda p: p[::2, ::2]
    qt_l, qt_c = J._scaled_tables(90)
    zz_y = J._fdct_quant(y, qt_l)
    zz_cb = J._fdct_quant(half(cb), qt_c)
    zz_cr = J._fdct_quant(half(cr), qt_c)
    out = bytearray(b"\xff\xd8")
    out += J._seg(0xDB, bytes([0]) + bytes(
        qt_l.reshape(-1)[J.ZIGZAG].astype(np.uint8)))
    out += J._seg(0xDB, bytes([1]) + bytes(
        qt_c.reshape(-1)[J.ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, 32, 48, 3)
    sof += bytes([1, 0x22, 0])  # luma 2x2
    sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += J._seg(0xC0, sof)
    out += J._seg(0xC4, J._dht_payload(0x00, J.DC_LUMA_BITS, J.DC_LUMA_VALS))
    out += J._seg(0xC4, J._dht_payload(0x10, J.AC_LUMA_BITS, J.AC_LUMA_VALS))
    out += J._seg(0xC4, J._dht_payload(0x01, J.DC_CHROMA_BITS,
                                       J.DC_CHROMA_VALS))
    out += J._seg(0xC4, J._dht_payload(0x11, J.AC_CHROMA_BITS,
                                       J.AC_CHROMA_VALS))
    out += J._seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    dc_l = J._build_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac_l = J._build_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    dc_c = J._build_codes(J.DC_CHROMA_BITS, J.DC_CHROMA_VALS)
    ac_c = J._build_codes(J.AC_CHROMA_BITS, J.AC_CHROMA_VALS)
    wtr = J._BitWriter()
    preds = [0, 0, 0]
    for my in range(2):          # 32 / (8*2)
        for mx in range(3):      # 48 / (8*2)
            for byy in range(2):
                for bxx in range(2):
                    preds[0] = J._encode_plane_blocks(
                        wtr, zz_y[2 * my + byy:2 * my + byy + 1,
                                  2 * mx + bxx:2 * mx + bxx + 1],
                        dc_l, ac_l, preds[0])
            preds[1] = J._encode_plane_blocks(
                wtr, zz_cb[my:my + 1, mx:mx + 1], dc_c, ac_c, preds[1])
            preds[2] = J._encode_plane_blocks(
                wtr, zz_cr[my:my + 1, mx:mx + 1], dc_c, ac_c, preds[2])
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    dec = J.decode_baseline(bytes(out))
    assert dec is not None and dec.shape == (32, 48, 3)
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 2


def test_decode_pixels_dispatch():
    bmp = make_bmp(6, 4, lambda x, y: (y, x, 7))
    px = M.decode_pixels(bmp)
    assert px.shape == (4, 6, 3)
    assert tuple(px[2, 5]) == (7, 5, 2)  # BGR file order → RGB array
    jp = J.encode_baseline(_gradient_rgb(16, 16), 90)
    assert M.decode_pixels(jp).shape == (16, 16, 3)
    assert M.decode_pixels(make_png_header(4, 4)) is None
    assert M.decode_pixels(b"junk") is None


def test_image_pixel_stats_and_ahash_dedup(spark):
    """Spark surface: BMP and JPEG encodings of the SAME picture get the
    same perceptual ahash (dims/codec-invariant), a different picture
    gets a different one, junk rows go null — never poison the batch."""
    img = _gradient_rgb(32, 32)
    bmp = make_bmp(32, 32, lambda x, y: tuple(int(v) for v in img[y, x][::-1]))
    jp = J.encode_baseline(img, 95)
    other = make_bmp(32, 32, lambda x, y: ((x * 37) % 256, 0, (y * 11) % 256))
    df = spark.createDataFrame(
        [(1, bytearray(bmp), "image", "s"), (2, bytearray(jp), "image", "s"),
         (3, bytearray(other), "image", "s"), (4, bytearray(b"nope"), "image", "s")],
        "media_id long, payload binary, media_type string, source_uri string")
    rows = {r["media_id"]: r for r in M.image_pixel_stats(df).collect()}
    assert rows[1]["width"] == rows[2]["width"] == 32
    assert rows[1]["ahash"] == rows[2]["ahash"]          # same picture
    assert rows[3]["ahash"] != rows[1]["ahash"]          # different picture
    assert rows[4]["ahash"] is None and rows[4]["width"] is None
    # mild recompression keeps the hash close (perceptual robustness)
    jp_low = J.encode_baseline(img, 60)
    h1 = int(rows[1]["ahash"], 16)
    h2 = int(M._ahash_bits(J.decode_baseline(jp_low)), 16)
    assert bin(h1 ^ h2).count("1") <= 6


def test_resize_jpeg_real(spark):
    img = _gradient_rgb(40, 40)
    jp = J.encode_baseline(img, 90)
    df = spark.createDataFrame(
        [(1, bytearray(jp), "image", "s")],
        "media_id long, payload binary, media_type string, source_uri string")
    row = M.resize_images(df, 16, 12).collect()[0]
    assert (row["width"], row["height"]) == (16, 12)
    out = J.decode_baseline(bytes(row["payload"]))
    assert out.shape == (12, 16, 3)
    # resampled content, not noise: corners map to source corners
    assert abs(int(out[0, 0, 0]) - int(img[0, 0, 0])) <= 12
