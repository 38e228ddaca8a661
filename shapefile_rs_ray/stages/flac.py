"""FLAC lossless audio codec — real encoder + decoder, from scratch.

This replaces the last honest audio stub tier with a genuine compressed
format: FLAC (the format CC-scale audio curation actually meets for
lossless payloads). Both directions are implemented from the public
format spec (RFC 9639 / xiph.org documentation — knowledge, not code):

- `encode_flac`: STREAMINFO (incl. the real MD5 of the decoded stream),
  fixed-blocksize frames, per-channel subframe selection over CONSTANT /
  FIXED orders 0-4 / (optionally) integer-quantized LPC, Rice-coded
  residuals, stereo decorrelation (left-side / mid-side), frame CRC-8
  header + CRC-16 footer.
- `parse_flac`: general subset decoder — all frame-header blocksize /
  sample-rate / sample-size encodings, UTF-8 frame numbers, channel
  assignments 0-10 (independent + left/right/mid-side), subframe types
  CONSTANT / VERBATIM / FIXED 0-4 / LPC 1-32, wasted bits, Rice methods
  0 and 1 with any partition order, CRC-8 / CRC-16 verification and the
  STREAMINFO MD5 check over the reconstructed stream.

Distribution shape (the Ray part): entropy decode is bit-serial by the
format's nature (every FLAC implementation is), so parallelism comes
from the actor pool — one file decodes independently per row, exactly
how a 100 TB audio corpus shards. Predictor reconstruction IS
vectorized: a FIXED order-k residual is the k-th finite difference of
the signal, so reconstruction is k cumulative sums (numpy cumsum), not
a per-sample Python loop.

Reference parity anchor: the reference's decode discipline is
byte-exact record decode + golden tests (/root/reference/src/record/
mod.rs, tests/read_tests.rs); this module holds the same bar for audio
— the oracle twin in pipelines/oracles.py re-decodes every synth file
with an independent pure-Python implementation.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# ------------------------------------------------------------- CRC tables

# CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 — FLAC frame header
_CRC8_TABLE = np.zeros(256, np.uint8)
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07 if _c & 0x80 else _c << 1) & 0xFF
    _CRC8_TABLE[_i] = _c

# CRC-16, polynomial 0x8005 (x^16+x^15+x^2+1), init 0 — FLAC frame footer
_CRC16_TABLE = np.zeros(256, np.uint16)
for _i in range(256):
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005 if _c & 0x8000 else _c << 1) & 0xFFFF
    _CRC16_TABLE[_i] = _c


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TABLE[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TABLE[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ------------------------------------------------------------ bit writer


class _BitWriter:
    """MSB-first bit accumulator (FLAC is big-endian bit order)."""

    def __init__(self):
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)        # q zeros then a 1

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0
        return bytes(self._out)


class _BitReader:
    """MSB-first reader: byte cursor + small accumulator (O(1) per read
    — a whole-payload big-int shifts O(n) bits per read and makes frame
    decode quadratic)."""

    def __init__(self, data: bytes, start: int = 0):
        """`start` = byte offset to begin at — frame decode passes the
        absolute frame offset instead of slicing the payload per frame
        (slicing made decode O(frames x file_size): ~200 GB of copying
        for a 40 MB / 10k-frame file)."""
        self._data = data
        self._start = start
        self._total = (len(data) - start) * 8
        self._i = start                 # next byte index (absolute)
        self._acc = 0
        self._n = 0                     # bits in accumulator
        self._pos = 0                   # bits consumed since `start`

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self._pos + nbits > self._total:
            raise ValueError("flac: bitstream underrun")
        while self._n < nbits:
            self._acc = (self._acc << 8) | self._data[self._i]
            self._i += 1
            self._n += 8
        self._n -= nbits
        self._pos += nbits
        v = (self._acc >> self._n) & ((1 << nbits) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def read_unary(self) -> int:
        """Zeros-then-one, consuming whole zero bytes at a time
        (bit_length finds the terminator in O(1) per refill instead of
        a Python call per bit)."""
        q = 0
        while True:
            if self._n == 0:
                if self._i >= len(self._data):
                    raise ValueError("flac: bitstream underrun")
                self._acc = self._data[self._i]
                self._i += 1
                self._n = 8
            if self._acc == 0:
                q += self._n
                self._pos += self._n
                self._n = 0
                continue
            top = self._acc.bit_length()
            zeros = self._n - top
            q += zeros
            self._pos += zeros + 1
            self._n = top - 1
            self._acc &= (1 << self._n) - 1
            return q

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def align(self) -> None:
        rem = self._pos % 8
        if rem:
            self.read(8 - rem)

    def byte_pos(self) -> int:
        """Bytes consumed since `start` (requires byte alignment)."""
        assert self._pos % 8 == 0
        return self._pos // 8

    def at_end(self, slack_bits: int = 7) -> bool:
        return self._total - self._pos <= slack_bits


# ------------------------------------------------------- UTF-8 frame no.


def _utf8_encode(n: int) -> bytes:
    """FLAC's extended UTF-8 coded number (frame/sample index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    for _ in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    lead_mask = (0xFF00 >> nbytes) & 0xFF
    out.append(lead_mask | n)
    return bytes(reversed(out))


def _utf8_decode(rd: _BitReader) -> int:
    b0 = rd.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac: bad UTF-8 coded number")
    n = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = rd.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("flac: bad UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# ----------------------------------------------------------- Rice coding

_FIXED_COEFFS = {          # prediction from past samples, orders 0-4
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _zigzag(res: np.ndarray) -> np.ndarray:
    """Signed residual -> unsigned Rice symbol (0,-1,1,-2,... order)."""
    r = res.astype(np.int64)
    return np.where(r >= 0, r << 1, (-r << 1) - 1).astype(np.uint64)


def _rice_param(res: np.ndarray) -> int:
    """Deterministic parameter choice: smallest k with mean(u) < 2^k
    (the standard streamsize heuristic), capped to the 4-bit escape-free
    range 0..14."""
    if len(res) == 0:
        return 0
    u = _zigzag(res)
    mean = int(u.sum()) // max(len(u), 1)
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def _write_rice(wr: _BitWriter, res: np.ndarray, k: int) -> None:
    for u in _zigzag(res):
        u = int(u)
        wr.write_unary(u >> k)
        wr.write(u, k)


def _rice_cost(res: np.ndarray, k: int) -> int:
    u = _zigzag(res)
    return int((u >> np.uint64(k)).sum()) + len(u) * (k + 1)


# --------------------------------------------------------------- encoder


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _encode_subframe(wr: _BitWriter, x: np.ndarray, bps: int,
                     force_lpc: bool = False) -> None:
    """One subframe: CONSTANT if flat, else best FIXED order by Rice
    cost (or a genuine quantized-LPC subframe when force_lpc, to keep
    the decoder's LPC path exercised by real streams)."""
    x = x.astype(np.int64)
    if len(x) and np.all(x == x[0]):
        wr.write(0, 1)                      # zero pad bit
        wr.write(0b000000, 6)               # CONSTANT
        wr.write(0, 1)                      # no wasted bits
        wr.write(int(x[0]), bps)
        return
    if force_lpc and len(x) > 4:
        # order-2 LPC, precision 12, shift 9: coeffs ~ [1.9, -0.9]
        order, prec, shift = 2, 12, 9
        coefs = [973, -461]                 # * 2^-9
        wr.write(0, 1)
        wr.write(0b100000 | (order - 1), 6)  # LPC, order
        wr.write(0, 1)
        for w in x[:order]:                 # warm-up
            wr.write(int(w), bps)
        wr.write(prec - 1, 4)
        wr.write(shift, 5)
        for c in coefs:
            wr.write(c, prec)
        pred = (coefs[0] * x[1:-1] + coefs[1] * x[:-2]) >> shift
        res = x[2:] - pred
        k = _rice_param(res)
        wr.write(0, 2)                      # residual method 0 (4-bit)
        wr.write(0, 4)                      # partition order 0
        wr.write(k, 4)
        _write_rice(wr, res, k)
        return
    best_order, best_cost, best_res = 0, None, x
    for order in range(min(5, len(x))):
        res = _fixed_residual(x, order)
        cost = _rice_cost(res, _rice_param(res)) + order * bps
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_res = order, cost, res
    wr.write(0, 1)
    wr.write(0b001000 | best_order, 6)      # FIXED
    wr.write(0, 1)
    for w in x[:best_order]:
        wr.write(int(w), bps)
    k = _rice_param(best_res)
    wr.write(0, 2)
    wr.write(0, 4)
    wr.write(k, 4)
    _write_rice(wr, best_res, k)


# sample-rate -> 4-bit frame-header code (the spec's fixed table)
_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
               96000: 11}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8,
                    512: 9, 1024: 10, 2048: 11, 4096: 12, 8192: 13,
                    16384: 14, 32768: 15}


def encode_flac(samples: np.ndarray, sample_rate: int, *,
                block_size: int = 1024, bps: int = 16,
                stereo_mode: str = "auto",
                lpc_every: int = 0) -> bytes:
    """Encode int samples (n, ch) or (n,) to a FLAC stream.

    stereo_mode: 'independent' | 'left_side' | 'mid_side' | 'auto'
    (auto = per-frame cheapest by residual magnitude, like real
    encoders). lpc_every=k forces channel 0 of every k-th frame to a
    genuine LPC subframe so decoders' LPC path sees real data.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if ch not in (1, 2):
        raise ValueError("flac: 1 or 2 channels only")
    samples = samples.astype(np.int64)
    lim = 1 << (bps - 1)
    if samples.min() < -lim or samples.max() >= lim:
        raise ValueError("flac: samples exceed bps range")

    # ---- STREAMINFO
    md5 = hashlib.md5()
    md5.update(samples.astype("<i2" if bps == 16 else "<i4")
               [:, :ch].reshape(-1).tobytes() if bps == 16 else
               b"".join(int(v).to_bytes((bps + 7) // 8, "little",
                                        signed=True)
                        for v in samples.reshape(-1)))
    info = _BitWriter()
    last_block = min(block_size, n) if n else block_size
    info.write(block_size if n > block_size else last_block, 16)
    info.write(block_size, 16)
    info.write(0, 24)                       # min frame size unknown
    info.write(0, 24)                       # max frame size unknown
    info.write(sample_rate, 20)
    info.write(ch - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    si = info.getvalue() + md5.digest()
    out = [b"fLaC", bytes([0x80, 0, 0, len(si)]), si]

    # ---- frames
    for fi, start in enumerate(range(0, max(n, 1), block_size)):
        blk = samples[start:start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)                     # reserved
        hdr.write(0, 1)                     # fixed blocksize strategy
        bs_code = _BLOCKSIZE_CODES.get(bs, 7 if bs > 256 else 6)
        hdr.write(bs_code, 4)
        sr_code = _RATE_CODES.get(sample_rate, 0)
        hdr.write(sr_code, 4)

        if ch == 1:
            mode = "mono"
            chan_code = 0
        else:
            mode = stereo_mode
            if mode == "auto":
                l, r = blk[:, 0], blk[:, 1]
                side = l - r
                costs = {
                    "independent": int(np.abs(np.diff(l)).sum()
                                       + np.abs(np.diff(r)).sum()),
                    "left_side": int(np.abs(np.diff(l)).sum()
                                     + np.abs(np.diff(side)).sum()),
                    "mid_side": int(np.abs(np.diff((l + r) >> 1)).sum()
                                    + np.abs(np.diff(side)).sum()),
                }
                mode = min(costs, key=lambda m: (costs[m], m))
            chan_code = {"independent": 1, "left_side": 8,
                         "right_side": 9, "mid_side": 10}[mode]
        hdr.write(chan_code, 4)
        hdr.write(_BPS_CODES[bps], 3)
        hdr.write(0, 1)                     # reserved
        head = hdr.getvalue() + _utf8_encode(fi)
        tail = _BitWriter()
        if bs_code == 6:
            tail.write(bs - 1, 8)
        elif bs_code == 7:
            tail.write(bs - 1, 16)
        if sr_code == 0 and sample_rate not in _RATE_CODES:
            pass                            # 0b0000: get from STREAMINFO
        head += tail.getvalue()
        head += bytes([crc8(head)])

        body = _BitWriter()
        force = bool(lpc_every) and fi % lpc_every == 0
        if ch == 1:
            _encode_subframe(body, blk[:, 0], bps, force_lpc=force)
        elif chan_code == 1:
            _encode_subframe(body, blk[:, 0], bps, force_lpc=force)
            _encode_subframe(body, blk[:, 1], bps)
        elif chan_code == 8:                # left-side: left, l-r (+1 bit)
            _encode_subframe(body, blk[:, 0], bps, force_lpc=force)
            _encode_subframe(body, blk[:, 0] - blk[:, 1], bps + 1)
        elif chan_code == 9:                # right-side: l-r, right
            _encode_subframe(body, blk[:, 0] - blk[:, 1], bps + 1,
                             force_lpc=force)
            _encode_subframe(body, blk[:, 1], bps)
        elif chan_code == 10:               # mid-side
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            side = blk[:, 0] - blk[:, 1]
            _encode_subframe(body, mid, bps, force_lpc=force)
            _encode_subframe(body, side, bps + 1)
        body.align()
        frame = head + body.getvalue()
        frame += crc16(frame).to_bytes(2, "big")
        out.append(frame)
    return b"".join(out)


# --------------------------------------------------------------- decoder


def _read_subframe(rd: _BitReader, bs: int, bps: int) -> np.ndarray:
    if rd.read(1) != 0:
        raise ValueError("flac: subframe pad bit set")
    typ = rd.read(6)
    wasted = 0
    if rd.read(1):                          # wasted-bits flag
        wasted = 1 + rd.read_unary()
        bps -= wasted
    if typ == 0b000000:                     # CONSTANT
        x = np.full(bs, rd.read_signed(bps), np.int64)
    elif typ == 0b000001:                   # VERBATIM
        x = np.array([rd.read_signed(bps) for _ in range(bs)], np.int64)
    elif 0b001000 <= typ <= 0b001100:       # FIXED 0-4
        order = typ & 0x07
        warm = [rd.read_signed(bps) for _ in range(order)]
        res = _read_residual(rd, bs, order)
        x = np.empty(bs, np.int64)
        x[:order] = warm
        # order-k fixed predictor == k-th difference: cumsum k times,
        # each seeded by the appropriate finite difference of the warmup
        seq = res.astype(np.int64)
        for lvl in range(order, 0, -1):
            seed = _fixed_residual(np.asarray(warm, np.int64), lvl - 1)
            seq = np.concatenate(([seed[-1]], seq)).cumsum()[1:] \
                if len(seed) else seq.cumsum()
        x[order:] = seq
    elif typ >= 0b100000:                   # LPC
        order = (typ & 0x1F) + 1
        warm = [rd.read_signed(bps) for _ in range(order)]
        prec = rd.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid LPC precision escape")
        shift = rd.read(5)
        coefs = [rd.read_signed(prec) for _ in range(order)]
        res = _read_residual(rd, bs, order)
        x = np.empty(bs, np.int64)
        x[:order] = warm
        for i in range(order, bs):          # IIR: inherently sequential
            p = 0
            for j, c in enumerate(coefs):
                p += c * x[i - 1 - j]
            x[i] = res[i - order] + (p >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {typ:#08b}")
    return x << wasted if wasted else x


def _read_residual(rd: _BitReader, bs: int, order: int) -> np.ndarray:
    method = rd.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = 0xF if method == 0 else 0x1F
    porder = rd.read(4)
    nparts = 1 << porder
    if bs % nparts or (bs >> porder) <= order:
        raise ValueError("flac: bad partition order")
    out = np.empty(bs - order, np.int64)
    pos = 0
    for p in range(nparts):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        k = rd.read(pbits)
        if k == escape:
            nb = rd.read(5)                 # unencoded fixed-width
            for i in range(cnt):
                out[pos + i] = rd.read_signed(nb) if nb else 0
        else:
            _read_rice_block(rd, cnt, k, out, pos)
        pos += cnt
    return out


def _read_rice_block(rd: _BitReader, cnt: int, k: int,
                     out: np.ndarray, pos: int) -> None:
    """Hot loop: cnt Rice(k) symbols decoded over LOCAL ints (the
    method-call-per-bit form measured ~2x slower; this is the whole
    per-sample cost of FLAC decode, everything else is vectorized)."""
    data, i, acc, n = rd._data, rd._i, rd._acc, rd._n
    end = len(data)
    kmask = (1 << k) - 1
    for j in range(cnt):
        q = 0
        while True:
            if n == 0:
                if i >= end:
                    raise ValueError("flac: bitstream underrun")
                acc = data[i]
                i += 1
                n = 8
            if acc == 0:
                q += n
                n = 0
                continue
            top = acc.bit_length()
            q += n - top
            n = top - 1
            acc &= (1 << n) - 1
            break
        while n < k:
            if i >= end:
                raise ValueError("flac: bitstream underrun")
            acc = (acc << 8) | data[i]
            i += 1
            n += 8
        n -= k
        u = (q << k) | ((acc >> n) & kmask)
        acc &= (1 << n) - 1
        out[pos + j] = (u >> 1) ^ -(u & 1)
    rd._i, rd._acc, rd._n = i, acc, n
    # reader invariant: pos == (i - start)*8 - n
    rd._pos = (i - rd._start) * 8 - n


_RATE_DECODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                11: 96000}
_BPS_DECODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def parse_flac(payload: bytes, *, verify_md5: bool = True
               ) -> tuple[int, int, np.ndarray]:
    """Full decode -> (sample_rate, n_channels, samples[n, ch] int64).
    Verifies every frame CRC-8/CRC-16 and (when the header carries one)
    the STREAMINFO MD5 of the decoded stream."""
    if payload[:4] != b"fLaC":
        raise ValueError("flac: bad magic")
    pos = 4
    si = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("flac: truncated metadata")
        hdr = payload[pos]
        ln = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + ln]
        if hdr & 0x7F == 0:
            if ln != 34:
                raise ValueError("flac: bad STREAMINFO length")
            si = body
        pos += 4 + ln
        if hdr & 0x80:
            break
    if si is None:
        raise ValueError("flac: missing STREAMINFO")
    v = int.from_bytes(si[10:18], "big")
    sr_si = v >> 44
    ch_si = ((v >> 41) & 0x7) + 1
    bps_si = ((v >> 36) & 0x1F) + 1
    total = v & ((1 << 36) - 1)
    md5_want = si[18:34]

    frames_samples = []
    data = payload
    fpos = pos
    while fpos < len(data):
        rd = _BitReader(data, fpos)
        if rd.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        rd.read(1)
        rd.read(1)                          # blocking strategy
        bs_code = rd.read(4)
        sr_code = rd.read(4)
        chan_code = rd.read(4)
        bps_code = rd.read(3)
        rd.read(1)
        _utf8_decode(rd)
        if bs_code == 0:
            raise ValueError("flac: reserved blocksize code")
        elif bs_code == 6:
            bs = rd.read(8) + 1
        elif bs_code == 7:
            bs = rd.read(16) + 1
        elif bs_code == 1:
            bs = 192
        elif 2 <= bs_code <= 5:
            bs = 576 << (bs_code - 2)
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0:
            sr = sr_si
        elif sr_code in _RATE_DECODE:
            sr = _RATE_DECODE[sr_code]
        elif sr_code == 12:
            sr = rd.read(8) * 1000
        elif sr_code == 13:
            sr = rd.read(16)
        elif sr_code == 14:
            sr = rd.read(16) * 10
        else:
            raise ValueError("flac: invalid sample-rate code")
        if bps_code == 0:
            bps = bps_si
        elif bps_code in _BPS_DECODE:
            bps = _BPS_DECODE[bps_code]
        else:
            raise ValueError("flac: reserved bits-per-sample code")
        head_len = rd.byte_pos() if rd._pos % 8 == 0 else rd._pos // 8
        # CRC-8 covers header bytes up to (not incl.) the CRC byte
        want = rd.read(8)
        if crc8(data[fpos:fpos + head_len]) != want:
            raise ValueError("flac: frame header CRC-8 mismatch")

        if chan_code <= 7:
            nch = chan_code + 1
            subs = [_read_subframe(rd, bs, bps) for _ in range(nch)]
        elif chan_code == 8:                # left-side
            left = _read_subframe(rd, bs, bps)
            side = _read_subframe(rd, bs, bps + 1)
            subs = [left, left - side]
            nch = 2
        elif chan_code == 9:                # right-side
            side = _read_subframe(rd, bs, bps + 1)
            right = _read_subframe(rd, bs, bps)
            subs = [right + side, right]
            nch = 2
        elif chan_code == 10:               # mid-side
            mid = _read_subframe(rd, bs, bps)
            side = _read_subframe(rd, bs, bps + 1)
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
            nch = 2
        else:
            raise ValueError("flac: reserved channel assignment")
        if nch != ch_si:
            raise ValueError("flac: channel count mismatch")
        rd.align()
        body_end = rd.byte_pos()
        want16 = int.from_bytes(data[fpos + body_end:fpos + body_end + 2],
                                "big")
        if crc16(data[fpos:fpos + body_end]) != want16:
            raise ValueError("flac: frame CRC-16 mismatch")
        frames_samples.append(np.stack(subs, axis=1))
        fpos += body_end + 2
    out = (np.concatenate(frames_samples, axis=0) if frames_samples
           else np.zeros((0, ch_si), np.int64))
    if total and len(out) != total:
        raise ValueError("flac: sample count mismatch")
    if verify_md5 and md5_want != b"\x00" * 16:
        if bps_si == 16:
            raw = out.astype("<i2").reshape(-1).tobytes()
        else:
            raw = b"".join(int(s).to_bytes((bps_si + 7) // 8, "little",
                                           signed=True)
                           for s in out.reshape(-1))
        if hashlib.md5(raw).digest() != md5_want:
            raise ValueError("flac: stream MD5 mismatch")
    return sr_si, ch_si, out


# ------------------------------------------------------------ Ray stage


class FlacDecodeStage:
    """Actor-pool FLAC decode: one file per row, integer waveform stats
    (same output contract as WavDecodeStage/AdpcmDecodeStage so the
    audio suite composes)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["flac"].to_pylist()
        n = len(blobs)
        sr = np.empty(n, np.int64)
        nch = np.empty(n, np.int64)
        ns = np.empty(n, np.int64)
        sab = np.empty(n, np.int64)
        ssq = np.empty(n, np.int64)
        pk = np.empty(n, np.int64)
        for i, blob in enumerate(blobs):
            r, c, x = parse_flac(blob)
            sr[i], nch[i], ns[i] = r, c, len(x)
            a = np.abs(x.astype(np.int64))
            sab[i] = int(a.sum())
            ssq[i] = int((x.astype(np.int64) ** 2).sum())
            pk[i] = int(a.max()) if len(x) else 0
        return pa.table({
            "doc_id": batch["doc_id"],
            "sample_rate": pa.array(sr, pa.int64()),
            "n_channels": pa.array(nch, pa.int64()),
            "n_samples": pa.array(ns, pa.int64()),
            "sum_abs": pa.array(sab, pa.int64()),
            "sum_sq": pa.array(ssq, pa.int64()),
            "peak": pa.array(pk, pa.int64()),
        })


def synth_flac_bytes(doc_id: int) -> bytes:
    """Deterministic per-doc FLAC payload with real coverage variety:
    mono/stereo, three sample rates (one forcing the STREAMINFO-ref
    rate path), auto stereo decorrelation, periodic LPC subframes, a
    constant-channel doc, and non-power-of-two tails."""
    rng = np.random.default_rng(0xF1AC ^ (doc_id * 2654435761 & 0xFFFFFFFF))
    ch = 1 + (doc_id % 2)
    rate = (44100, 22050, 11025)[doc_id % 3]    # 11025 -> sr code 0 path
    n = 900 + (doc_id * 181) % 1700
    t = np.arange(n)
    base = (3000 * np.sin(2 * np.pi * t * (40 + doc_id % 23) / 997)
            ).astype(np.int64)
    noise = rng.integers(-300, 301, size=(n, ch))
    x = base[:, None] + noise
    if ch == 2:
        x[:, 1] = x[:, 0] - (noise[:, 1] >> 2)  # correlated: exercises L/S
    if doc_id % 11 == 5:
        x[:, 0] = 1234                          # CONSTANT subframe doc
    x = np.clip(x, -32768, 32767)
    return encode_flac(x, rate, block_size=512,
                       stereo_mode="auto" if ch == 2 else "independent",
                       lpc_every=3 if doc_id % 7 == 3 else 0)
