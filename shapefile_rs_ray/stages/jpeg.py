"""Baseline JPEG (ITU-T T.81) codec — the LAST compressed multimodal
format that was an honest stub: a REAL decoder (marker walk, DQT/SOF0/
DHT/SOS parse, Huffman entropy decode with byte-unstuffing, dequantize,
inverse zigzag, fixed-point integer IDCT, fixed-point YCbCr->RGB) plus a
deterministic baseline encoder used to synthesize payloads.

Integer determinism contract (what makes a bit-exact scalar twin
possible): entropy decode yields INTEGER coefficients; dequantization is
an integer multiply; the IDCT is the classic fixed-point formulation
(libjpeg's jidctint idea): a (64, 64) basis matrix B = round(basis *
2^20) in int64, pixel = ((B @ coef) + 2^19) >> 20 + 128 clipped — an
ORDER-FREE integer dot product both numpy matmul and a pure-Python loop
reproduce exactly. Colour conversion uses libjpeg's public fixed-point
constants (round(c * 65536), +32768 bias, >> 16). No float op survives
past the basis-matrix derivation, which both sides re-derive from
math.cos identically.

The encoder is 4:4:4 baseline sequential with the T.81 Annex K
quantization and Huffman tables written into DQT/DHT (the decoder reads
tables FROM the stream — self-describing, like every conformant
decoder). Encoding uses float DCT + np.round; lossy, so tests assert
decode(encode(smooth gradient)) within a small tolerance plus exact
constant-block reconstruction, and the oracle golden is the scalar twin
decoding the SAME bytes.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------- tables
# T.81 Annex K.1 quantization tables (public constants)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int64)

# zigzag scan order (coef index -> (row, col) flat index)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int64)

# T.81 Annex K.3 typical Huffman tables (public constants)
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

IDCT_SHIFT = 20
IDCT_HALF = 1 << (IDCT_SHIFT - 1)


def idct_basis_q20() -> np.ndarray:
    """(64, 64) int64 fixed-point IDCT basis: pixel p=(y*8+x) from coef
    k=(v*8+u): B[p, k] = round( c(u) c(v) / 4 * cos((2x+1)u pi/16) *
    cos((2y+1)v pi/16) * 2^20 ), c(0)=1/sqrt(2). Derived identically by
    the pure-Python twin (same math.cos, same half-even round)."""
    import math
    B = np.empty((64, 64), np.int64)
    for y in range(8):
        for x in range(8):
            for v in range(8):
                for u in range(8):
                    cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
                    cv = 1.0 / math.sqrt(2.0) if v == 0 else 1.0
                    val = (cu * cv / 4.0
                           * math.cos((2 * x + 1) * u * math.pi / 16.0)
                           * math.cos((2 * y + 1) * v * math.pi / 16.0))
                    B[y * 8 + x, v * 8 + u] = round(val * (1 << IDCT_SHIFT))
    return B


_IDCT_B = idct_basis_q20()

# libjpeg jdcolor fixed-point constants: round(c * 65536)
_FIX_1_402 = 91881
_FIX_0_344136 = 22554
_FIX_0_714136 = 46802
_FIX_1_772 = 116130


def ycbcr_to_rgb_int(Y: np.ndarray, Cb: np.ndarray,
                     Cr: np.ndarray) -> np.ndarray:
    """Fixed-point BT.601 full-range YCbCr -> RGB (int64 in, uint8 out):
    R = Y + (91881*(Cr-128) + 32768 >> 16), etc. Arithmetic >> floors on
    negatives in BOTH numpy int64 and pure Python — order-free."""
    cb = Cb.astype(np.int64) - 128
    cr = Cr.astype(np.int64) - 128
    y = Y.astype(np.int64)
    r = y + ((_FIX_1_402 * cr + 32768) >> 16)
    g = y - ((_FIX_0_344136 * cb + _FIX_0_714136 * cr + 32768) >> 16)
    b = y + ((_FIX_1_772 * cb + 32768) >> 16)
    return np.stack([np.clip(r, 0, 255), np.clip(g, 0, 255),
                     np.clip(b, 0, 255)], axis=-1).astype(np.uint8)


# --------------------------------------------------------------- encoder


def _build_huff_codes(bits: list[int], vals: list[int]) -> dict:
    """T.81 C.2 canonical code assignment: symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)      # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    D = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0) / 2.0
    D[0] /= np.sqrt(2.0)
    return D


_DCT_D = _dct_matrix()


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_blocks(writer: _BitWriter, blocks: np.ndarray, dc_tab: dict,
                   ac_tab: dict, pred: int) -> int:
    """blocks: (n, 64) int zigzag coefficient rows, one component."""
    for row in blocks:
        diff = int(row[0]) - pred
        pred = int(row[0])
        s = _category(diff)
        code, ln = dc_tab[s]
        writer.write(code, ln)
        if s:
            writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = 0
        nz = np.nonzero(row[1:])[0]
        last_nz = int(nz[-1]) + 1 if len(nz) else 0
        for i in range(1, last_nz + 1):
            v = int(row[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]     # ZRL
                writer.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_tab[(run << 4) | s]
            writer.write(code, ln)
            writer.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = ac_tab[0x00]         # EOB
            writer.write(code, ln)
    return pred


def _component_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(H8, W8) padded uint8 plane -> (n_blocks, 64) quantized zigzag
    rows in MCU (row-major block) order."""
    h8, w8 = plane.shape
    shifted = plane.astype(np.float64) - 128.0
    by, bx = h8 // 8, w8 // 8
    blocks = (shifted.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
              .reshape(by * bx, 8, 8))
    F = np.einsum("ux,nxy,vy->nuv", _DCT_D, blocks, _DCT_D)
    q = np.round(F.reshape(by * bx, 64) / quant[None, :]).astype(np.int64)
    return q[:, ZIGZAG]


def rgb_to_ycbcr_int(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                               np.ndarray]:
    """Fixed-point forward colour transform (encoder side): round via
    +32768 >> 16 on the 65536-scaled BT.601 constants."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    cb = ((-11059 * r - 21710 * g + 32768 * b + 32768) >> 16) + 128
    cr = ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16) + 128
    return (np.clip(y, 0, 255).astype(np.uint8),
            np.clip(cb, 0, 255).astype(np.uint8),
            np.clip(cr, 0, 255).astype(np.uint8))


def encode_jpeg_rgb(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> baseline sequential 4:4:4 JFIF bytes with the
    Annex K quantization + Huffman tables written into DQT/DHT."""
    h, w = rgb.shape[0], rgb.shape[1]
    y, cb, cr = rgb_to_ycbcr_int(rgb)
    h8, w8 = (h + 7) & ~7, (w + 7) & ~7
    planes = []
    for plane in (y, cb, cr):
        p = np.empty((h8, w8), np.uint8)
        p[:h, :w] = plane
        p[h:, :w] = plane[h - 1:h, :]      # edge replicate pad
        p[:, w:] = p[:, w - 1:w]
        planes.append(p)
    zz_luma = _component_blocks(planes[0], QUANT_LUMA)
    zz_cb = _component_blocks(planes[1], QUANT_CHROMA)
    zz_cr = _component_blocks(planes[2], QUANT_CHROMA)

    dc_l = _build_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_c = _build_huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_l = _build_huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    ac_c = _build_huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    wbuf = _BitWriter()
    # interleaved 4:4:4 MCU = one block per component
    pred = [0, 0, 0]
    n_mcu = len(zz_luma)
    for m in range(n_mcu):
        pred[0] = _encode_blocks(wbuf, zz_luma[m:m + 1], dc_l, ac_l,
                                 pred[0])
        pred[1] = _encode_blocks(wbuf, zz_cb[m:m + 1], dc_c, ac_c, pred[1])
        pred[2] = _encode_blocks(wbuf, zz_cr[m:m + 1], dc_c, ac_c, pred[2])
    wbuf.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = b"\xff\xd8"                                   # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(QUANT_LUMA[ZIGZAG].tolist()))
    out += seg(0xDB, b"\x01" + bytes(QUANT_CHROMA[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += seg(0xC0, sof)                               # SOF0
    out += seg(0xC4, bytes([0x00] + DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10] + AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    out += seg(0xC4, bytes([0x01] + DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
    out += seg(0xC4, bytes([0x11] + AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos)
    out += bytes(wbuf.out)
    out += b"\xff\xd9"                                  # EOI
    return out


# --------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_lookup(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol for sequential bit-by-bit decode."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(rd: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | rd.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def parse_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JFIF (8-bit, 3-component 4:4:4, interleaved
    single scan) -> (h, w, 3) uint8 RGB. Real decode: marker walk,
    in-stream DQT/DHT tables, Huffman entropy decode with 0xFF00
    unstuffing, integer dequantize + fixed-point IDCT (vectorized int64
    matmul over all blocks) + fixed-point colour transform."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []    # (id, sampling, tq)
    scan: list[tuple[int, int, int]] = []     # (comp idx, dc tab, ac tab)
    data = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq_tq = body[off]
                if pq_tq >> 4 != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(body, np.uint8, 64,
                                    off + 1).astype(np.int64)
                dq = np.empty(64, np.int64)
                dq[ZIGZAG] = tbl               # de-zigzag to natural order
                quant[pq_tq & 15] = dq
                off += 65
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc != 3:
                raise ValueError("only 8-bit 3-component baseline")
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("only 4:4:4 (no subsampling)")
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1:off + 17])
                nv = sum(bits)
                vals = list(body[off + 17:off + 17 + nv])
                tbl = _huff_lookup(bits, vals)
                if tc_th >> 4 == 0:
                    huff_dc[tc_th & 15] = tbl
                else:
                    huff_ac[tc_th & 15] = tbl
                off += 17 + nv
        elif marker == 0xDA:
            ns = body[0]
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(i for i, (q, _, _) in enumerate(comps)
                           if q == cid)
                scan.append((idx, tabs >> 4, tabs & 15))
            # entropy data runs until the next real marker (unstuff FF00)
            end = pos + 2 + ln
            raw = bytearray()
            p = end
            while p < len(payload):
                b = payload[p]
                if b == 0xFF:
                    nxt = payload[p + 1] if p + 1 < len(payload) else 0xD9
                    if nxt == 0x00:
                        raw.append(0xFF)
                        p += 2
                        continue
                    break                      # EOI or another marker
                raw.append(b)
                p += 1
            data = bytes(raw)
            break
        pos += 2 + ln
    if data is None or not comps or h == 0 or w == 0:
        raise ValueError("missing SOF0/SOS")

    h8, w8 = (h + 7) & ~7, (w + 7) & ~7
    n_mcu = (h8 // 8) * (w8 // 8)
    rd = _BitReader(data)
    coefs = [np.zeros((n_mcu, 64), np.int64) for _ in comps]
    pred = [0, 0, 0]
    for m in range(n_mcu):
        for ci, tdc, tac in scan:
            row = coefs[ci][m]
            s = _huff_decode(rd, huff_dc[tdc])
            diff = _extend(rd.bits(s), s) if s else 0
            pred[ci] += diff
            row[0] = pred[ci]
            k = 1
            while k < 64:
                rs = _huff_decode(rd, huff_ac[tac])
                if rs == 0x00:                 # EOB
                    break
                run, s = rs >> 4, rs & 15
                if s == 0:
                    if run != 15:
                        raise ValueError("bad AC run/size")
                    k += 16                    # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC index overflow")
                row[k] = _extend(rd.bits(s), s)
                k += 1

    planes = []
    for ci, (_, _, tq) in enumerate(comps):
        zz = coefs[ci]
        deq = np.zeros_like(zz)
        deq[:, ZIGZAG] = zz * quant[tq][ZIGZAG][None, :]
        # fixed-point IDCT: order-free int64 matmul over all blocks
        px = (deq @ _IDCT_B.T + IDCT_HALF) >> IDCT_SHIFT
        px = np.clip(px + 128, 0, 255)
        by, bx = h8 // 8, w8 // 8
        plane = (px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(h8, w8))
        planes.append(plane[:h, :w])
    return ycbcr_to_rgb_int(planes[0], planes[1], planes[2])


class JpegDecodeStage:
    """REAL baseline-JPEG decode stage: bytes -> pixels via Huffman
    entropy decode + integer IDCT, then the shared integer stats layout
    (key, width, height, sum_r, sum_g, sum_b, thumb_sum) with the 8x8
    nearest-neighbor thumbnail kernel."""

    THUMB = 8

    def __init__(self, bytes_col: str = "jpg", key_col: str = "doc_id"):
        self.bytes_col = bytes_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bytes_col].to_pylist()
        n = len(payloads)
        wid = np.empty(n, np.int64)
        hei = np.empty(n, np.int64)
        sums = np.empty((n, 3), np.int64)
        th = np.empty(n, np.int64)
        t = self.THUMB
        for i, p in enumerate(payloads):
            px = parse_jpeg(p)
            hh, ww = px.shape[0], px.shape[1]
            wid[i], hei[i] = ww, hh
            sums[i] = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
            yi = (np.arange(t, dtype=np.int64) * hh) // t
            xi = (np.arange(t, dtype=np.int64) * ww) // t
            th[i] = int(px[yi][:, xi].astype(np.int64).sum())
        return pa.table({
            self.key_col: batch[self.key_col],
            "width": pa.array(wid, pa.int64()),
            "height": pa.array(hei, pa.int64()),
            "sum_r": pa.array(sums[:, 0], pa.int64()),
            "sum_g": pa.array(sums[:, 1], pa.int64()),
            "sum_b": pa.array(sums[:, 2], pa.int64()),
            "thumb_sum": pa.array(th, pa.int64()),
        })


def synth_jpeg_bytes(doc_id: int) -> bytes:
    """Deterministic smooth-gradient RGB JPEG keyed by doc id:
    w = 24 + 8*(id%3), h = 16 + 8*(id%2); pixel (x, y) built from slow
    ramps (smooth content keeps baseline quantization error small and
    the payload realistic). Encoded with the in-repo baseline encoder."""
    w = 24 + 8 * (doc_id % 3)
    h = 16 + 8 * (doc_id % 2)
    a, b = doc_id % 5 + 1, doc_id % 7 + 1
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = (64 + a * x + b * y + doc_id) % 256
    g = (128 + b * x + a * y) % 256
    bl = (32 + x + 2 * y + doc_id % 11) % 256
    rgb = np.stack([r, g, bl], axis=-1).astype(np.uint8)
    return encode_jpeg_rgb(rgb)
