"""Baseline JPEG codec, stdlib + numpy only — the real-tier pixel path
for the multimodal surface (this container ships no image libraries).

Implements ITU-T T.81 baseline sequential DCT with Huffman entropy
coding, from the public spec (Annex K tables, JFIF YCbCr conversion):

* ``encode_baseline(pixels, quality)`` — grayscale (h, w) or RGB
  (h, w, 3) uint8 → JPEG bytes. 4:4:4 (no chroma subsampling), standard
  Annex K Huffman tables, IJG-style quality scaling of the Annex K
  quantization tables.
* ``decode_baseline(data)`` — JPEG bytes → (h, w) or (h, w, 3) uint8,
  or None for streams outside the supported envelope (progressive SOF2,
  arithmetic coding, chroma subsampling ≠ 4:4:4) — a bad payload
  degrades to a null row, never a poisoned executor batch.

Scale/placement: this codec runs INSIDE Arrow-batched ``mapInPandas``
workers (operators.multimodal) — one Python call per image, numpy for
every per-pixel loop (DCT/IDCT are two 8×8 matmuls per block over a
blocked reshape, Huffman coding is the only per-symbol Python). It is a
correctness/portability tier: swap in a codec library for raw
throughput without touching the Spark plumbing that calls it.

No reference counterpart (the reference stops at CDC merge over Glue —
processData.py:1-405); part of the multimodal extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- tables
# ITU-T T.81 Annex K (public spec constants).

QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

# (BITS[1..16], HUFFVAL) per Annex K.3
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int32)

# 8x8 DCT-II basis: C[u, x] = a(u) * cos((2x+1)uπ/16); DCT = C B Cᵀ,
# IDCT = Cᵀ B C (orthonormal).
_x = np.arange(8)
_DCT_C = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) / 2.0
_DCT_C[0, :] = 1.0 / np.sqrt(8.0)


def _scaled_tables(quality: int):
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def s(t):
        return np.clip((t * scale + 50) // 100, 1, 255).astype(np.int32)
    return s(QT_LUMA), s(QT_CHROMA)


def _build_codes(bits, vals):
    """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 C.2."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits, vals):
    """(BITS, HUFFVAL) → {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1-bits


def _magnitude(v: int):
    """(category, magnitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(h8, w8) float plane → (n_blocks_y, n_blocks_x, 64) quantized
    zigzag coefficients. Blocked matmul — no per-pixel Python."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,ybxv,wv->ybuw", _DCT_C, blocks, _DCT_C,
                     optimize=True)
    q = np.round(coef / qt).astype(np.int32)
    return q.reshape(by, bx, 64)[:, :, ZIGZAG]


def _encode_plane_blocks(writer, zz, dc_codes, ac_codes, pred):
    """Entropy-code one plane's zigzag blocks in raster order."""
    for row in zz:
        for blk in row:
            diff = int(blk[0]) - pred
            pred = int(blk[0])
            size, bits = _magnitude(diff)
            code, ln = dc_codes[size]
            writer.put(code, ln)
            if size:
                writer.put(bits, size)
            run = 0
            nz = np.nonzero(blk[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    writer.put(code, ln)
                    run -= 16
                size, bits = _magnitude(v)
                code, ln = ac_codes[(run << 4) | size]
                writer.put(code, ln)
                writer.put(bits, size)
                run = 0
            if last < 63:
                code, ln = ac_codes[0x00]  # EOB
                writer.put(code, ln)
    return pred


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(tc_th: int, bits, vals) -> bytes:
    return bytes([tc_th]) + bytes(bits) + bytes(vals)


def encode_baseline(pixels: np.ndarray, quality: int = 85) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 → baseline JPEG
    (4:4:4, Annex K Huffman tables)."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError("encode_baseline expects uint8 pixels")
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("expects (h, w) gray or (h, w, 3) RGB")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l, qt_c = _scaled_tables(quality)

    if gray:
        planes = [px.astype(np.float64)]
    else:
        f = px.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]        # edge replication
        pp[:, w:] = pp[:, w - 1:w]
        padded.append(pp)

    zzs = [_fdct_quant(p, qt_l if i == 0 else qt_c)
           for i, p in enumerate(padded)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0]) + bytes(
        qt_l.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(
            qt_c.reshape(-1)[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # 1x1 sampling
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0x00, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _seg(0xC4, _dht_payload(0x10, AC_LUMA_BITS, AC_LUMA_VALS))
    if not gray:
        out += _seg(0xC4, _dht_payload(0x01, DC_CHROMA_BITS,
                                       DC_CHROMA_VALS))
        out += _seg(0xC4, _dht_payload(0x11, AC_CHROMA_BITS,
                                       AC_CHROMA_VALS))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    writer = _BitWriter()
    # 4:4:4 interleaved MCU = one block per component
    by, bx = ph // 8, pw // 8
    preds = [0] * ncomp
    tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (ncomp - 1)
    for yb in range(by):
        for xb in range(bx):
            for ci in range(ncomp):
                dc, ac = tables[ci]
                preds[ci] = _encode_plane_blocks(
                    writer, zzs[ci][yb:yb + 1, xb:xb + 1], dc, ac,
                    preds[ci])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decode


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        before = self.nbits
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = (self.data[self.pos + 1]
                       if self.pos + 1 < len(self.data) else None)
                if nxt == 0x00:
                    self.pos += 2  # stuffed 0xFF data byte
                else:
                    break  # a marker (EOI/RSTn): stop consuming here
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        if self.nbits == before:
            # exhausted or parked at a marker: zero-pad so bit reads
            # always terminate (trailing pad bits of the last byte)
            self.acc <<= 8
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_baseline(data: bytes):
    """Decode a baseline JPEG → uint8 (h, w) or (h, w, 3), or None when
    the stream is outside the supported envelope (progressive,
    arithmetic, subsampled) or malformed."""
    try:
        return _decode(data)
    except Exception:
        return None


def _decode(data: bytes):
    if data[:2] != b"\xff\xd8":
        return None
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps = []  # (id, qt_id)
    h = w = 0
    scan_comps = []
    restart_interval = 0
    i = 2
    n = len(data)
    while i + 1 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        i += 2
        if marker in (0x01, 0xD9) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[i:i + 2])
        seg = data[i + 2:i + seglen]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables: out of envelope
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(
                    seg[j + 1:j + 65], dtype=np.uint8).astype(np.int32)
                qts[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                (ac_tabs if tc else dc_tabs)[th] = _build_decoder(bits,
                                                                  vals)
                j += 17 + nv
        elif marker == 0xC0:
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            ns = seg[0]
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cid, tabs >> 4, tabs & 0x0F))
            i += seglen
            break
        i += seglen
    if not comps or not scan_comps or h == 0:
        return None
    scan = data[i:]

    # sampling geometry (4:4:4, 4:2:2, 4:2:0, …): the MCU interleaves
    # hi×vi blocks per component; each chroma plane decodes at its own
    # resolution and is nearest-neighbor upsampled afterwards
    ncomp = len(comps)
    samp = {cid: (hi, vi) for cid, hi, vi, _ in comps}
    qt_of = {cid: qts[tq] for cid, _, _, tq in comps}
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        return None
    if any(hmax % hi or vmax % vi for _, hi, vi, _ in comps):
        return None  # non-integer upsample ratios: out of envelope
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {cid: np.zeros((mcuy * 8 * vi, mcux * 8 * hi))
              for cid, hi, vi, _ in comps}
    reader = _BitReader(scan)
    preds = {cid: 0 for cid, _, _ in scan_comps}
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # align to byte + skip RST marker, reset predictors
                reader.nbits = 0
                reader.acc = 0
                while (reader.pos + 1 < len(reader.data)
                       and not (reader.data[reader.pos] == 0xFF
                                and 0xD0 <= reader.data[reader.pos + 1]
                                <= 0xD7)):
                    reader.pos += 1
                reader.pos += 2
                preds = {cid: 0 for cid, _, _ in scan_comps}
            for cid, dct, act in scan_comps:
                hi, vi = samp[cid]
                for byy in range(vi):
                    for bxx in range(hi):
                        zz = np.zeros(64, dtype=np.int32)
                        size = reader.huff(dc_tabs[dct])
                        diff = _extend(reader.bits(size), size)
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            sym = reader.huff(ac_tabs[act])
                            if sym == 0x00:
                                break  # EOB
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0 and run == 15:
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                break
                            zz[k] = _extend(reader.bits(size), size)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = (
                            zz * qt_of[cid].reshape(-1)[ZIGZAG])
                        blk = blk.reshape(8, 8)
                        pix = _DCT_C.T @ blk @ _DCT_C + 128.0
                        y0 = (my * vi + byy) * 8
                        x0 = (mx * hi + bxx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = pix
            mcu += 1

    full = []
    for cid, hi, vi, _ in comps:
        p = planes[cid]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0),
                          hmax // hi, axis=1)
        full.append(p[:h, :w])
    if ncomp == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if ncomp != 3:
        return None
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
