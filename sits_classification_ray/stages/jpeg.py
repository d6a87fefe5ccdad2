"""Baseline JPEG (ITU T.81) encode + decode, stdlib-only — the last
compressed-bitstream codec class the multimodal layer stubbed
(reference analog: GDAL-read compressed rasters in the predict path,
``pytorch/predict.py:346-455``).

Scope: baseline sequential DCT, 8-bit GRAYSCALE (one component, no
subsampling), standard Annex-K luminance quantization + Huffman
tables. The full marker/entropy layer is real: DQT / SOF0 / DHT / SOS
parsing, canonical Huffman code reconstruction, byte unstuffing
(FF 00), differential DC, run-length AC with ZRL/EOB, dequantize +
IDCT.

Determinism contract: the DCT/IDCT are exact 8×8 matrix products with
the orthonormal DCT-II matrix, quantization is ``np.round`` (half to
even) — identical arithmetic on both the engine and the golden twin,
so ``decode(encode(img))`` is a pure function of the pixels and the
twin reproduces it WITHOUT touching the bitstream (which proves the
engine's Huffman + marker layer is exactly lossless around the lossy
quantization core).
"""

from __future__ import annotations

import numpy as np

# ---- constants (ITU T.81 Annex K) ---------------------------------------

#: Annex K.1 luminance quantization table (quality 50), raster order.
Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)

#: zigzag scan order: ZIGZAG[k] = raster index of the k-th coefficient
_zz = []
for s in range(15):
    idxs = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
    if s % 2 == 0:
        idxs = idxs[::-1]
    _zz.extend(i * 8 + j for i, j in idxs)
ZIGZAG = np.array(_zz, dtype=np.int64)
del _zz

#: Annex K.3.1: DC luminance Huffman spec (BITS counts, values)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
#: Annex K.3.2: AC luminance Huffman spec
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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

#: orthonormal DCT-II matrix: C[k, n] = s_k·cos((2n+1)kπ/16)
_n = np.arange(8)
DCT_M = np.cos((2 * _n[None, :] + 1) * _n[:, None] * np.pi / 16.0)
DCT_M[0] *= 1.0 / np.sqrt(2.0)
DCT_M *= 0.5
del _n


def _canonical_codes(bits: list, vals: list) -> dict:
    """symbol → (code, length) per the T.81 canonical assignment."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(DC_BITS, DC_VALS)
_AC_CODES = _canonical_codes(AC_BITS, AC_VALS)


def _category(v: int) -> int:
    """Bit size class of a DC diff / AC value (T.81 table F.1)."""
    return int(abs(v)).bit_length()


class _BitWriterJ:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)          # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)     # pad with 1-bits
        return bytes(self.buf)


def _blocks_of(img: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(n_blocks, 8, 8) float blocks (edge-replicated padding)."""
    h, w = img.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.empty((H, W), np.float64)
    pad[:h, :w] = img
    if W > w:
        pad[:h, w:] = img[:, -1:]
    if H > h:
        pad[h:, :] = pad[h - 1:h, :]
    bl = pad.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    return bl.reshape(-1, 8, 8), H // 8, W // 8


def quantized_blocks(img: np.ndarray) -> np.ndarray:
    """(n_blocks, 64) int32 zigzagged quantized DCT coefficients —
    the shared lossy core (also used directly by the golden twin)."""
    blocks, _, _ = _blocks_of(np.asarray(img, np.float64) - 128.0)
    coefs = np.einsum("ij,bjk,lk->bil", DCT_M, blocks, DCT_M)
    q = np.round(coefs / Q_LUMA[None, :, :]).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def dequantized_pixels(qzz: np.ndarray, n_bh: int, n_bw: int,
                       h: int, w: int) -> np.ndarray:
    """Inverse of the lossy core: de-zigzag → dequantize → IDCT →
    +128, clipped uint8, cropped to (h, w)."""
    q = np.zeros((len(qzz), 64), np.float64)
    q[:, ZIGZAG] = qzz
    q = q.reshape(-1, 8, 8) * Q_LUMA[None, :, :]
    pix = np.einsum("ji,bjk,kl->bil", DCT_M, q, DCT_M) + 128.0
    pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    out = pix.reshape(n_bh, n_bw, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(n_bh * 8, n_bw * 8)
    return out[:h, :w]


def make_jpeg(img: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 grayscale image as a REAL baseline JPEG
    (markers + standard tables + Huffman-entropy-coded scan)."""
    import struct

    img = np.asarray(img, np.uint8)
    h, w = img.shape
    qzz = quantized_blocks(img)

    bw = _BitWriterJ()
    prev_dc = 0
    for blk in qzz:
        diff = int(blk[0]) - prev_dc
        prev_dc = int(blk[0])
        cat = _category(diff)
        code, ln = _DC_CODES[cat]
        bw.write(code, ln)
        if cat:
            v = diff if diff > 0 else diff + (1 << cat) - 1
            bw.write(v, cat)
        run = 0
        nz = np.flatnonzero(blk[1:])
        pos = 0
        for idx in nz:
            run = int(idx) - pos
            while run >= 16:
                code, ln = _AC_CODES[0xF0]      # ZRL
                bw.write(code, ln)
                run -= 16
            v = int(blk[1 + idx])
            cat = _category(v)
            code, ln = _AC_CODES[(run << 4) | cat]
            bw.write(code, ln)
            vv = v if v > 0 else v + (1 << cat) - 1
            bw.write(vv, cat)
            pos = int(idx) + 1
        if pos < 63:
            code, ln = _AC_CODES[0x00]          # EOB
            bw.write(code, ln)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    qt = bytes([0]) + bytes(Q_LUMA.reshape(64)[ZIGZAG].astype(np.uint8))
    sof = (bytes([8]) + struct.pack(">HH", h, w) + bytes([1])
           + bytes([1, 0x11, 0]))
    dht_dc = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (b"\xff\xd8" + seg(0xDB, qt) + seg(0xC0, sof)
            + seg(0xC4, dht_dc) + seg(0xC4, dht_ac) + seg(0xDA, sos)
            + scan + b"\xff\xd9")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Full baseline decode of a single-component JPEG: marker walk,
    canonical Huffman reconstruction from the stream's own DHT,
    entropy decode with FF00 unstuffing, de-zigzag, dequantize, IDCT.
    Raises ``NotImplementedError`` for multi-component / progressive
    streams (honest scope)."""
    import struct

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtab = None
    h = w = None
    huff: dict = {}
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            if body[0] & 0x0F == 0:
                z = np.frombuffer(body[1:65], np.uint8).astype(np.int32)
                qtab = np.zeros(64, np.int32)
                qtab[ZIGZAG] = z
                qtab = qtab.reshape(8, 8)
        elif marker == 0xC0:
            _, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise NotImplementedError("only 1-component baseline")
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline sequential DCT")
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1:off + 17])
                nv = sum(bits)
                vals = list(body[off + 17:off + 17 + nv])
                huff[tc_th] = _canonical_codes(bits, vals)
                off += 17 + nv
        elif marker == 0xDA:
            scan = data[pos + 2 + ln:]
            break
        pos += 2 + ln
    if qtab is None or h is None or scan is None:
        raise ValueError("missing JPEG segments")
    # decode tables: (code, length) → symbol
    dc_dec = {v: k for k, v in huff[0x00].items()}
    ac_dec = {v: k for k, v in huff[0x10].items()}

    # unstuff FF00 and stop at the next marker
    raw = bytearray()
    i = 0
    while i < len(scan):
        b = scan[i]
        if b == 0xFF:
            if i + 1 < len(scan) and scan[i + 1] == 0x00:
                raw.append(0xFF)
                i += 2
                continue
            break                                # a real marker (EOI)
        raw.append(b)
        i += 1
    raw = bytes(raw)

    n_bh, n_bw = -(-h // 8), -(-w // 8)
    n_blocks = n_bh * n_bw
    qzz = np.zeros((n_blocks, 64), np.int32)
    acc = bits = 0
    bpos = 0

    def read_bit():
        nonlocal acc, bits, bpos
        if bits == 0:
            acc = raw[bpos]
            bpos += 1
            bits = 8
        bits -= 1
        return (acc >> bits) & 1

    def read_val(cat):
        v = 0
        for _ in range(cat):
            v = (v << 1) | read_bit()
        if cat and v < (1 << (cat - 1)):
            v -= (1 << cat) - 1
        return v

    def read_symbol(table):
        code, ln = 0, 0
        while True:
            code = (code << 1) | read_bit()
            ln += 1
            sym = table.get((code, ln))
            if sym is not None:
                return sym
            if ln > 16:
                raise ValueError("bad Huffman stream")

    prev_dc = 0
    for b in range(n_blocks):
        cat = read_symbol(dc_dec)
        diff = read_val(cat)
        prev_dc += diff
        qzz[b, 0] = prev_dc
        k = 1
        while k < 64:
            sym = read_symbol(ac_dec)
            if sym == 0x00:                      # EOB
                break
            run, cat = sym >> 4, sym & 0x0F
            if sym == 0xF0:                      # ZRL
                k += 16
                continue
            k += run
            qzz[b, k] = read_val(cat)
            k += 1
    # dequantize against the STREAM'S OWN table (== Q_LUMA when the
    # stream came from make_jpeg, but the decoder trusts the file)
    q = np.zeros((n_blocks, 64), np.float64)
    q[:, ZIGZAG] = qzz
    q = q.reshape(-1, 8, 8) * qtab[None, :, :].astype(np.float64)
    pix = np.einsum("ji,bjk,kl->bil", DCT_M, q, DCT_M) + 128.0
    pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    out = pix.reshape(n_bh, n_bw, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(n_bh * 8, n_bw * 8)
    return out[:h, :w]
