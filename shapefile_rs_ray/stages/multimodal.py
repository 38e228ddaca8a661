"""Multimodal-column stages: opaque binary payloads (html/image/audio/
video) processed by actor-pool map_batches with typed metadata outputs.

REAL decoders (no imaging/audio library needed, all scalar-twin
goldened at the gate): WAV (RIFF PCM), BMP 24bpp, PNG (zlib inflate +
5-filter scanline defilter, stages here), baseline JPEG (Huffman +
integer IDCT, stages/jpeg.py), GIF (from-scratch LZW + de-interlace,
stages here), Y4M (YUV4MPEG2 demux).
`ImageDecodeStub` sniffs those formats and decodes them genuinely; only
unrecognized formats fall back to the deterministic fake (or raise in
`strict` mode the way a missing codec would). The remaining stub-only
formats are the patent-heavy compressed ones (MP3/H.264/...) — the
Ray-side plumbing (schema, batch sizing for wide binary rows, actor
signature, output layout) is identical and tested end-to-end either way.

`extract_html_text` is NOT a stub: it really parses the html bytes with RE2
kernels (strip tags, entity-free corpus) and is oracle-checked against
DuckDB's regexp on the same bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def extract_html_text(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """html:binary -> extracted_text:string by deleting every <...> tag.

    RE2 `<[^>]*>` on both sides (pyarrow here, DuckDB regexp_replace with
    the 'g' flag in the oracle) keeps the outputs byte-identical.
    """
    as_text = pc.cast(batch[html_col], pa.string())
    stripped = pc.replace_substring_regex(as_text, "<[^>]*>", "")
    return batch.append_column("extracted_text", stripped)


HTML_EXTRACT_SQL_EXPR = "regexp_replace(CAST(html AS VARCHAR), '<[^>]*>', '', 'g')"


class ImageDecodeStub:
    """Actor-pool stage for an image-bytes column.

    __init__ loads the (stubbed) codec once per actor; __call__ emits one
    metadata row per image: (key, n_bytes, sha16, width, height, channels).
    Deterministic fake dimensions derive from the content hash; `strict`
    raises NotImplementedError like a missing codec would.
    """

    OUTPUT_SCHEMA = pa.schema([
        ("page_id", pa.int64()), ("n_bytes", pa.int64()),
        ("sha16", pa.string()), ("width", pa.int64()),
        ("height", pa.int64()), ("channels", pa.int64()),
    ])

    def __init__(self, bytes_col: str = "html", key_col: str = "page_id",
                 strict: bool = False):
        self.bytes_col = bytes_col
        self.key_col = key_col
        self.strict = strict
        self.codec = None  # real impl: PIL.Image loaded here, once per actor

    def _decode(self, payload: bytes) -> tuple[int, int, int]:
        # REAL formats first (round 5): PNG / baseline JPEG / BMP payloads
        # decode genuinely; only unknown formats hit the stub fallback
        if payload[:8] == _PNG_SIG:
            px = _parse_png(payload)
            return px.shape[1], px.shape[0], px.shape[2]
        if payload[:2] == b"\xff\xd8":
            from .jpeg import parse_jpeg
            px = parse_jpeg(payload)
            return px.shape[1], px.shape[0], px.shape[2]
        if payload[:2] == b"BM":
            px = _parse_bmp(payload)
            return px.shape[1], px.shape[0], px.shape[2]
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            px = _parse_gif(payload)
            return px.shape[1], px.shape[0], px.shape[2]
        if self.strict:
            raise NotImplementedError(
                "unrecognized image format; real decoders exist for "
                "PNG/JPEG-baseline/BMP/GIF — others need an imaging "
                "library not present in this environment")
        d = hashlib.sha256(payload).digest()
        return (64 + d[0] % 192, 64 + d[1] % 192, 1 + d[2] % 4)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bytes_col].to_pylist()
        n = len(payloads)
        w = np.empty(n, np.int64)
        h = np.empty(n, np.int64)
        c = np.empty(n, np.int64)
        sha = []
        for i, p in enumerate(payloads):
            p = p or b""
            w[i], h[i], c[i] = self._decode(p)
            sha.append(hashlib.sha256(p).hexdigest()[:16])
        return pa.table({
            self.key_col: batch[self.key_col],
            "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
            "sha16": pa.array(sha, pa.string()),
            "width": pa.array(w), "height": pa.array(h),
            "channels": pa.array(c),
        })


class AudioFrameSampleStub:
    """Actor-pool stage for an audio-bytes column: emits frame-sample
    metadata rows (one row per sampled frame), the flat-map layout a real
    frame sampler produces. Sample positions are deterministic in the
    content; the PCM decode itself is the stub."""

    def __init__(self, bytes_col: str = "html", key_col: str = "page_id",
                 frames: int = 4):
        self.bytes_col = bytes_col
        self.key_col = key_col
        self.frames = frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[self.key_col], np.int64)
        lens = pc.binary_length(batch[self.bytes_col]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(keys)
        f = self.frames
        rep = np.repeat(keys, f)
        frame_idx = np.tile(np.arange(f, dtype=np.int64), n)
        offs = (np.repeat(lens, f) * (frame_idx + 1)) // (f + 1)
        return pa.table({
            self.key_col: pa.array(rep, pa.int64()),
            "frame": pa.array(frame_idx, pa.int64()),
            "byte_offset": pa.array(offs, pa.int64()),
        })


class VideoFrameSampleStub:
    """Actor-pool stage for a video-bytes column: one output row per
    SAMPLED frame with its timestamp — the flat-map layout a real frame
    sampler (ffmpeg) produces. The container parse is the stub: frame
    count and fps derive deterministically from the content hash
    (`strict` raises like a missing codec); the sample positions and
    timestamps are exact integer arithmetic, fully SQL-oracled.

    REAL counterparts exist for open formats: Y4mDecodeStage (raw
    YUV4MPEG2) and stages/avi.AviFrameSampleStage (MJPEG AVI with
    index-seek sampling + genuine JPEG decode); this stub remains only
    for patent-heavy codecs (H.264/H.265) a from-scratch engine cannot
    honestly ship."""

    def __init__(self, bytes_col: str = "html", key_col: str = "page_id",
                 samples: int = 4, strict: bool = False):
        self.bytes_col = bytes_col
        self.key_col = key_col
        self.samples = samples
        self.strict = strict
        self.codec = None  # real impl: ffmpeg/pyav opened here, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "video demux requires a codec library not present in this "
                "environment; deterministic fake used by default")
        keys = np.asarray(batch[self.key_col], np.int64)
        digests = [hashlib.sha256(p or b"").digest()
                   for p in batch[self.bytes_col].to_pylist()]
        n_frames = 16 + np.array([d[0] for d in digests], np.int64) % 240
        fps = 12 + np.array([d[1] for d in digests], np.int64) % 24
        s = self.samples
        n = len(keys)
        j = np.tile(np.arange(s, dtype=np.int64), n)
        frame = j * np.repeat(n_frames // s, s)
        ts_ms = frame * 1000 // np.repeat(fps, s)
        return pa.table({
            self.key_col: pa.array(np.repeat(keys, s), pa.int64()),
            "sample": pa.array(j, pa.int64()),
            "frame": pa.array(frame, pa.int64()),
            "ts_ms": pa.array(ts_ms, pa.int64()),
            "n_frames": pa.array(np.repeat(n_frames, s), pa.int64()),
        })


# ---------------------------------------------------------------------------
# REAL decoders (round 4): containers decodable with pure numpy/struct.
# WAV (RIFF PCM) and BMP (24bpp uncompressed) need no codec library, so
# these are not stubs — they parse the actual bytes. The compressed
# formats (JPEG/MP4/...) stay honest strict-raising stubs above.
# ---------------------------------------------------------------------------


def _parse_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE parse -> (sample_rate, n_channels, int16 samples).
    Walks chunks (fmt before data not assumed); PCM 16-bit only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)          # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported wav format {audio_fmt}/{bits}bit")
    samples = np.frombuffer(data, "<i2")
    return rate, n_ch, samples


class WavDecodeStage:
    """REAL audio decode: parse RIFF PCM wav bytes per row and emit
    integer waveform statistics — (key, sample_rate, n_channels,
    n_samples, sum_abs, sum_sq, peak). All-int outputs merge order-free
    and compare bit-exactly against an independent scalar-twin golden.

    Scale: per-batch work is one np.frombuffer + three reductions per
    payload; actor-pool it with small batch_size when payloads are
    large (binary rows dominate block bytes)."""

    def __init__(self, bytes_col: str = "wav", key_col: str = "doc_id"):
        self.bytes_col = bytes_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bytes_col].to_pylist()
        n = len(payloads)
        rate = np.empty(n, np.int64)
        nch = np.empty(n, np.int64)
        nsamp = np.empty(n, np.int64)
        sabs = np.empty(n, np.int64)
        ssq = np.empty(n, np.int64)
        peak = np.empty(n, np.int64)
        for i, p in enumerate(payloads):
            r, c, s = _parse_wav(p)
            rate[i], nch[i] = r, c
            nsamp[i] = len(s)
            a = np.abs(s.astype(np.int64))
            sabs[i] = int(a.sum())
            ssq[i] = int((a * a).sum())
            peak[i] = int(a.max()) if len(a) else 0
        return pa.table({
            self.key_col: batch[self.key_col],
            "sample_rate": pa.array(rate, pa.int64()),
            "n_channels": pa.array(nch, pa.int64()),
            "n_samples": pa.array(nsamp, pa.int64()),
            "sum_abs": pa.array(sabs, pa.int64()),
            "sum_sq": pa.array(ssq, pa.int64()),
            "peak": pa.array(peak, pa.int64()),
        })


def _parse_bmp(payload: bytes) -> np.ndarray:
    """BMP (BITMAPINFOHEADER, 24bpp, uncompressed) -> (h, w, 3) uint8
    RGB array. Handles 4-byte row padding and bottom-up row order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    hdr_sz = int.from_bytes(payload[14:18], "little")
    if hdr_sz < 40:
        raise ValueError("unsupported BMP header")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP {bpp}bpp comp={comp}")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=abs(h) * stride,
                         offset=off).reshape(abs(h), stride)
    px = rows[:, :w * 3].reshape(abs(h), w, 3)
    if h > 0:
        px = px[::-1]                      # bottom-up storage
    return px[:, :, ::-1]                  # BGR -> RGB


class BmpDecodeStage:
    """REAL image decode + nearest-neighbor thumbnail: parse 24bpp BMP
    bytes, emit (key, width, height, sum_r, sum_g, sum_b, thumb_sum)
    where thumb_sum is the integer pixel sum of an 8x8 nearest-neighbor
    downsample (the resize kernel, exercised without float resampling
    so the scalar twin is bit-trivial)."""

    THUMB = 8

    def __init__(self, bytes_col: str = "bmp", key_col: str = "doc_id"):
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
            px = _parse_bmp(p)
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


# -- deterministic payload builders (vectorized engine side; the scalar
# twins in pipelines/oracles.py re-build the same bytes independently) --


def synth_wav_bytes(doc_id: int) -> bytes:
    """Integer triangle-ish waveform keyed by doc id: sample[t] =
    ((t * (id%31+1)) % 2048) - 1024 as int16, n = 400 + id%100 frames,
    rate 8000+100*(id%5), mono 16-bit PCM."""
    k = doc_id % 31 + 1
    n = 400 + doc_id % 100
    rate = 8000 + 100 * (doc_id % 5)
    t = np.arange(n, dtype=np.int64)
    samples = (((t * k) % 2048) - 1024).astype("<i2")
    data = samples.tobytes()
    fmt = (np.int64(1).astype("<u2").tobytes()
           + np.int64(1).astype("<u2").tobytes()
           + np.int64(rate).astype("<u4").tobytes()
           + np.int64(rate * 2).astype("<u4").tobytes()
           + np.int64(2).astype("<u2").tobytes()
           + np.int64(16).astype("<u2").tobytes())
    body = (b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def synth_bmp_bytes(doc_id: int) -> bytes:
    """Gradient image keyed by doc id: pixel (x, y) channel c =
    (x*(id%7+1) + y*(id%11+1) + c*37 + id) % 256; w = 16 + id%17,
    h = 12 + id%13; 24bpp bottom-up BMP with row padding."""
    w = 16 + doc_id % 17
    h = 12 + doc_id % 13
    a, b = doc_id % 7 + 1, doc_id % 11 + 1
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    rgb = ((x * a + y * b + c * 37 + doc_id) % 256).astype(np.uint8)
    bgr = rgb[:, :, ::-1]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    pixel_bytes = rows[::-1].tobytes()     # bottom-up
    info = (b"(\x00\x00\x00"               # header size 40
            + w.to_bytes(4, "little") + h.to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + len(pixel_bytes).to_bytes(4, "little")
            + b"\x00" * 16)
    off = 14 + 40
    hdr = (b"BM" + (off + len(pixel_bytes)).to_bytes(4, "little")
           + b"\x00" * 4 + off.to_bytes(4, "little"))
    return hdr + info + pixel_bytes


def _parse_y4m(payload: bytes):
    """YUV4MPEG2 parse -> (width, height, fps_num, fps_den, frames) where
    frames is a list of luma (Y) planes as (h, w) uint8 arrays. The Y4M
    container is plain bytes (no codec): a space-separated text header,
    then per-frame 'FRAME\\n' markers followed by raw 4:2:0 planes."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\x0a")
    w = h = 0
    fn, fd = 25, 1
    for tok in payload[10:nl].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            fn, fd = (int(x) for x in tok[1:].split(b":"))
    if w <= 0 or h <= 0 or w % 2 or h % 2:
        raise ValueError(f"bad Y4M geometry {w}x{h}")
    frame_bytes = w * h + 2 * ((w // 2) * (h // 2))   # 4:2:0
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\x0a", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        body = payload[fnl + 1:fnl + 1 + frame_bytes]
        if len(body) < frame_bytes:
            raise ValueError("truncated frame")
        frames.append(np.frombuffer(body, np.uint8,
                                    count=w * h).reshape(h, w))
        pos = fnl + 1 + frame_bytes
    return w, h, fn, fd, frames


class Y4mDecodeStage:
    """REAL video demux + frame sampling: parse YUV4MPEG2 bytes, sample
    `samples` evenly-spaced frames, emit one row per sampled frame with
    its exact timestamp and integer luma sum — the flat-map layout of a
    real frame sampler, with the decode genuinely performed.

    Output: (key, sample, frame, ts_ms, n_frames, luma_sum)."""

    def __init__(self, bytes_col: str = "y4m", key_col: str = "doc_id",
                 samples: int = 4):
        self.bytes_col = bytes_col
        self.key_col = key_col
        self.samples = samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[self.key_col], np.int64)
        out_k, out_s, out_f, out_t, out_n, out_l = \
            [], [], [], [], [], []
        for key, payload in zip(keys, batch[self.bytes_col].to_pylist()):
            w, h, fn, fd, frames = _parse_y4m(payload)
            n = len(frames)
            take = min(self.samples, n)
            for j in range(take):
                fi = (j * n) // take
                out_k.append(int(key))
                out_s.append(j)
                out_f.append(fi)
                out_t.append(fi * 1000 * fd // fn)
                out_n.append(n)
                out_l.append(int(frames[fi].astype(np.int64).sum()))
        return pa.table({
            self.key_col: pa.array(out_k, pa.int64()),
            "sample": pa.array(out_s, pa.int64()),
            "frame": pa.array(out_f, pa.int64()),
            "ts_ms": pa.array(out_t, pa.int64()),
            "n_frames": pa.array(out_n, pa.int64()),
            "luma_sum": pa.array(out_l, pa.int64()),
        })


# ---------------------------------------------------------------------------
# PNG (round 5): a REAL compressed-format decoder — stdlib zlib inflate +
# per-scanline defilter (None/Sub/Up/Average/Paeth), no imaging library.
# This retires one of the "compressed formats are stubs" gaps: the famous
# CC-scale image format is now genuinely parsed from bytes to pixels.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG spec PaethPredictor(left, above, upper-left)."""
    p = a + b - c
    pa_ = abs(p - a)
    pb_ = abs(p - b)
    pc_ = abs(p - c)
    if pa_ <= pb_ and pa_ <= pc_:
        return a
    if pb_ <= pc_:
        return b
    return c


def _parse_png(payload: bytes) -> np.ndarray:
    """PNG (8-bit RGB, colour type 2, non-interlaced) -> (h, w, 3) uint8.

    Real decode: chunk walk with length/type framing, multi-IDAT concat,
    zlib inflate, then scanline defiltering. Filters 0 (None) / 2 (Up)
    reconstruct with whole-row vector ops; 1 (Sub) is an exact per-lane
    uint8 cumulative sum (recon[x] = Σ raw ≤ x within the byte lane, mod
    256 — the prefix dependency vectorizes); 3/4 (Average/Paeth) keep the
    spec's sequential-in-x reconstruction (per-pixel, vector over lanes).
    """
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) < ln:
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln                      # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            f"unsupported PNG layout depth={depth} colour={ctype} "
            f"comp={comp} filter={filt} interlace={interlace}")
    import zlib
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("bad inflated scanline length")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prior = np.zeros(stride, np.uint8)
    bpp = 3
    for y in range(h):
        ft = int(ftypes[y])
        r = data[y]
        if ft == 0:
            rec = r.copy()
        elif ft == 1:                       # Sub: per-lane cumsum mod 256
            rec = r.reshape(-1, bpp).cumsum(axis=0, dtype=np.uint64)
            rec = (rec % 256).astype(np.uint8).reshape(stride)
        elif ft == 2:                       # Up
            rec = r + prior                 # uint8 wraparound == mod 256
        elif ft == 3:                       # Average
            rec = np.empty(stride, np.uint8)
            left = np.zeros(bpp, np.uint16)
            for x in range(0, stride, bpp):
                px = (r[x:x + bpp]
                      + ((left + prior[x:x + bpp]) >> 1)).astype(np.uint8)
                rec[x:x + bpp] = px
                left = px.astype(np.uint16)
        elif ft == 4:                       # Paeth
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                c = int(prior[x - bpp]) if x >= bpp else 0
                rec[x] = (int(r[x]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec
        prior = rec
    return out.reshape(h, w, 3)


class PngDecodeStage:
    """REAL compressed-image decode: PNG bytes -> pixels via chunk walk +
    zlib inflate + scanline defilter, then the same integer stats as
    BmpDecodeStage — (key, width, height, sum_r, sum_g, sum_b, thumb_sum)
    with the 8x8 nearest-neighbor thumbnail kernel.

    Scale: one inflate + O(pixels) defilter per payload inside the actor
    pool; compressed rows are small so default (whole-block) batches are
    right. The reference's decode discipline (tests/read_tests.rs golden
    exactness) is matched by the byte-offset scalar twin golden."""

    THUMB = 8

    def __init__(self, bytes_col: str = "png", key_col: str = "doc_id"):
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
            px = _parse_png(p)
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


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    import zlib
    return (len(body).to_bytes(4, "big") + typ + body
            + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big"))


def synth_png_bytes(doc_id: int) -> bytes:
    """Deterministic RGB PNG keyed by doc id: w = 14 + id%19,
    h = 10 + id%15, pixel (x, y, c) = (x*(id%5+2) + y*(id%9+2) + c*53
    + id) % 256. Scanline y uses filter (y + id) % 5, so every payload
    exercises None/Sub/Up/Average/Paeth; the compressed stream splits
    into two IDAT chunks to exercise multi-IDAT concat."""
    import zlib
    w = 14 + doc_id % 19
    h = 10 + doc_id % 15
    a, b = doc_id % 5 + 2, doc_id % 9 + 2
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    rgb = ((x * a + y * b + c * 53 + doc_id) % 256).astype(np.uint8)
    stride = w * 3
    flat = rgb.reshape(h, stride)
    bpp = 3
    lines = []
    prior = np.zeros(stride, np.uint8)
    for yy in range(h):
        row = flat[yy]
        ft = (yy + doc_id) % 5
        if ft == 0:
            f = row.copy()
        elif ft == 1:
            f = row.copy()
            f[bpp:] = row[bpp:] - row[:-bpp]
        elif ft == 2:
            f = row - prior
        elif ft == 3:
            left = np.zeros(stride, np.uint16)
            left[bpp:] = row[:-bpp]
            f = row - ((left + prior) >> 1).astype(np.uint8)
        else:
            f = np.empty(stride, np.uint8)
            for xx in range(stride):
                aa = int(row[xx - bpp]) if xx >= bpp else 0
                bb = int(prior[xx])
                cc = int(prior[xx - bpp]) if xx >= bpp else 0
                f[xx] = (int(row[xx]) - _paeth(aa, bb, cc)) & 0xFF
        lines.append(bytes([ft]) + f.tobytes())
        prior = row
    comp = zlib.compress(b"".join(lines), 6)
    half = max(1, len(comp) // 2)
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", comp[:half])
            + _png_chunk(b"IDAT", comp[half:])
            + _png_chunk(b"IEND", b""))


def synth_y4m_bytes(doc_id: int) -> bytes:
    """Deterministic tiny clip keyed by doc id: 6+id%5 frames of
    (16+2*(id%5)) x (12+2*(id%3)) 4:2:0 video at F24:1 or F30:1; luma
    pixel (x, y, t) = (x*3 + y*5 + t*7 + id) % 256, chroma constant 128."""
    w = 16 + 2 * (doc_id % 5)
    h = 12 + 2 * (doc_id % 3)
    n = 6 + doc_id % 5
    fn = 24 if doc_id % 2 == 0 else 30
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    chroma = np.full(((h // 2) * (w // 2)), 128, np.uint8).tobytes()
    out = [f"YUV4MPEG2 W{w} H{h} F{fn}:1 Ip A1:1 C420\x0a".encode()]
    for t in range(n):
        luma = ((x * 3 + y * 5 + t * 7 + doc_id) % 256).astype(np.uint8)
        out.append(b"FRAME\x0a" + luma.tobytes() + chroma + chroma)
    return b"".join(out)


# -- perceptual image hash (pHash) + near-duplicate image detection ------


_PHASH_N = 32      # downsample grid edge
_PHASH_Q = 20      # fixed-point shift of the DCT basis


def _dct32_q20() -> np.ndarray:
    """32-point DCT-II orthonormal basis as q20 fixed-point int64:
    entry [k, n] = floor(s_k * cos(pi*(2n+1)*k/64) * 2^20 + 0.5) with
    s_0 = sqrt(1/32), s_k = sqrt(2/32). The scalar twin replays the
    IDENTICAL float op sequence with math.cos/math.sqrt/math.floor
    (numpy == libm on this host, see the jpeg basis tests); from the
    rounded table on, everything is exact int64."""
    k = np.arange(_PHASH_N, dtype=np.int64)[:, None]
    n = np.arange(_PHASH_N, dtype=np.int64)[None, :]
    ang = np.pi * (2 * n + 1) * k / 64.0
    c = np.cos(ang)
    s = np.full((_PHASH_N, 1), np.sqrt(2.0 / 32.0))
    s[0, 0] = np.sqrt(1.0 / 32.0)
    return np.floor(c * s * (1 << _PHASH_Q) + 0.5).astype(np.int64)


def phash64(gray32: np.ndarray) -> np.ndarray:
    """(n, 32, 32) int64 grayscale -> (n,) int64 pHash. Fixed-point 2D
    DCT-II (T = D G D^T, exact int64: |D| < 2^18, G < 2^8, 32x32 terms
    -> |T| < 2^54), keep the top-left 8x8 low-frequency block, set bit k
    iff coeff k exceeds the LOWER MEDIAN of the block's 63 AC coeffs
    (integer median: element 31 of the sorted ACs — no float mean, so
    the twin is bit-trivial). The DC coeff (k=0) compares like any
    other bit (it is essentially always 1 — a constant bit costs one
    hamming degree of freedom but keeps the kernel branch-free)."""
    d = _dct32_q20()
    t = np.einsum("ij,njk,lk->nil", d, gray32.astype(np.int64), d)
    blk = t[:, :8, :8].reshape(len(gray32), 64)
    med = np.sort(blk[:, 1:], axis=1)[:, 31]
    bits = (blk > med[:, None]).astype(np.uint64)
    h = np.zeros(len(gray32), np.uint64)
    for b in range(64):
        h |= bits[:, b] << np.uint64(b)
    return h.view(np.int64)


class PhashStage:
    """BMP bytes -> 64-bit perceptual hash: integer BT.601 luma
    ((77R + 150G + 29B) >> 8), 32x32 nearest-neighbor downsample
    (yi = i*h // 32 — the BmpDecodeStage thumbnail kernel), then
    `phash64`. Emits (key, phash). The per-payload parse is the only
    Python loop; the DCT runs batched over the whole (n, 32, 32) stack."""

    def __init__(self, bytes_col: str = "bmp", key_col: str = "doc_id"):
        self.bytes_col = bytes_col
        self.key_col = key_col
        self.idx = np.arange(_PHASH_N, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bytes_col].to_pylist()
        grids = np.empty((len(payloads), _PHASH_N, _PHASH_N), np.int64)
        for i, p in enumerate(payloads):
            px = _parse_bmp(p).astype(np.int64)
            luma = (px[:, :, 0] * 77 + px[:, :, 1] * 150
                    + px[:, :, 2] * 29) >> 8
            hh, ww = luma.shape
            grids[i] = luma[(self.idx * hh) // _PHASH_N][
                :, (self.idx * ww) // _PHASH_N]
        return pa.table({
            self.key_col: batch[self.key_col],
            "phash": pa.array(phash64(grids), pa.int64())})


def synth_phash_bmp_bytes(doc_id: int) -> bytes:
    """Clustered near-duplicate image corpus: 4 variants per base image
    (cluster g = id//4, variant v = id%4). The base is a multiplicative-
    hash TEXTURE, not a gradient — gradient DCTs concentrate in one
    row/col and alias across clusters, collapsing every image into one
    LSH band bucket. Variant v XORs bit 2 of v deterministic 3x3 patches
    (v=3 replays v=2's patches exactly -> a true byte-identical clone
    pair per cluster), so intra-cluster pHashes sit a few bits apart
    while cross-cluster hashes are ~uniform (expected hamming ~32)."""
    w, h = 64, 48
    g, v = doc_id // 4, doc_id % 4
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    m = (x * 73856093 + y * 19349663
         + (x * y + 7) * (2 * g + 1) * 83492791) % 65536
    base = (m * 40503 % 65536) >> 8
    for r in range(min(v, 2)):
        py = (g * 7 + r * 13) % (h - 5)
        pxo = (g * 11 + r * 5) % (w - 5)
        base[py:py + 5, pxo:pxo + 5] ^= 24
    c = np.arange(3, dtype=np.int64)[None, None, :]
    rgb = ((base[:, :, None] + c * 37) % 256).astype(np.uint8)
    bgr = rgb[:, :, ::-1]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    pixel_bytes = rows[::-1].tobytes()
    info = (b"(\x00\x00\x00"
            + w.to_bytes(4, "little") + h.to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + len(pixel_bytes).to_bytes(4, "little")
            + b"\x00" * 16)
    off = 14 + 40
    hdr = (b"BM" + (off + len(pixel_bytes)).to_bytes(4, "little")
           + b"\x00" * 4 + off.to_bytes(4, "little"))
    return hdr + info + pixel_bytes


def phash_neardup(images, *, id_col: str = "doc_id",
                  bytes_col: str = "bmp", max_hamming: int = 7,
                  dparts: int = 127):
    """Image near-duplicate detection: pHash every image (actor pool),
    find ALL pairs within `max_hamming` bits EXACTLY via 8x8-bit band
    blocking (pigeonhole: <=7 differing bits leave >=1 of 8 bands
    identical), then attach per-image partner counts. Returns one row
    per image: (id, phash, n_near).

    Scale shape: images never shuffle — only (id, phash) int pairs do.
    The count attach is a tag-union co-partition (hash rows pos=-1,
    pair sides pos=1) on a coarse id-hash, local np.unique reduce; no
    per-distinct-key groupby and no driver state."""
    from .dedup import hamming64_band_pairs

    sigs = images.map_batches(PhashStage, batch_format="pyarrow",
                              fn_constructor_kwargs={
                                  "bytes_col": bytes_col,
                                  "key_col": id_col},
                              concurrency=(1, 4)).materialize()
    pairs = hamming64_band_pairs(sigs, id_col=id_col, sig_col="phash",
                                 bands=8, max_hamming=max_hamming)

    def hash_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], np.int64)
        return pa.table({
            "doc": pa.array(ids, pa.int64()),
            "phash": batch["phash"],
            "cnt": pa.array(np.full(len(ids), -1, np.int64), pa.int64()),
            "__dp": pa.array(ids % dparts, pa.int64())})

    def pair_sides(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["id_a"], np.int64)
        b = np.asarray(batch["id_b"], np.int64)
        doc = np.concatenate([a, b])
        return pa.table({
            "doc": pa.array(doc, pa.int64()),
            "phash": pa.array(np.zeros(len(doc), np.int64), pa.int64()),
            "cnt": pa.array(np.ones(len(doc), np.int64), pa.int64()),
            "__dp": pa.array(doc % dparts, pa.int64())})

    def attach(part: pa.Table) -> pa.Table:
        doc = np.asarray(part["doc"], np.int64)
        cnt = np.asarray(part["cnt"], np.int64)
        ph = np.asarray(part["phash"], np.int64)
        is_hash = cnt < 0
        hdoc, hph = doc[is_hash], ph[is_hash]
        pdoc = doc[~is_hash]
        u, counts = np.unique(pdoc, return_counts=True)
        n = np.zeros(len(hdoc), np.int64)
        pos = np.searchsorted(u, hdoc)
        found = (pos < len(u))
        ok = np.nonzero(found)[0]
        ok = ok[u[pos[ok]] == hdoc[ok]]
        n[ok] = counts[pos[ok]]
        return pa.table({
            id_col: pa.array(hdoc, pa.int64()),
            "phash": pa.array(hph, pa.int64()),
            "n_near": pa.array(n, pa.int64())})

    hrows = sigs.map_batches(hash_rows, batch_format="pyarrow")
    prows = pairs.map_batches(pair_sides, batch_format="pyarrow")
    return (hrows.union(prows).groupby("__dp")
            .map_groups(attach, batch_format="pyarrow"))


# -- REAL GIF decode (LZW, GIF87a/89a) -----------------------------------


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_compress(indices: bytes, min_code: int = 8) -> bytes:
    """GIF-flavor LZW: variable-width codes (min_code+1 .. 12 bits),
    CLEAR/EOI codes, dictionary reset at 4096, LSB-first bit packing.
    Used only by the payload synthesizer — the decoder is the product."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = n_acc = 0

    def emit(code: int, width: int):
        nonlocal acc, n_acc
        acc |= code << n_acc
        n_acc += width
        while n_acc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    table = {bytes([i]): i for i in range(1 << min_code)}
    next_code, width = eoi + 1, min_code + 1
    emit(clear, width)
    cur = b""
    for byte in indices:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << min_code)}
            next_code, width = eoi + 1, min_code + 1
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if n_acc:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code: int, n_px: int) -> bytes:
    """GIF LZW decode: LSB-first variable-width codes, CLEAR reset, the
    KwKwK first-use case, anticipatory width growth (the decoder lags
    the encoder's dictionary by one assignment, so it bumps when the
    NEXT index to assign reaches 2^width — the count, not the content,
    is what the encoder's width depends on). Stops at EOI or once n_px
    indices are out."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    first_dyn = eoi + 1
    strs: list[bytes] = []          # dictionary strings, code = first_dyn+i
    width = min_code + 1
    out = bytearray()
    acc = n_acc = pos = 0
    prev: bytes | None = None
    while len(out) < n_px:
        while n_acc < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << n_acc
            n_acc += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_acc -= width
        if code == clear:
            strs = []
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < (1 << min_code):
            entry = bytes([code])
        elif first_dyn <= code < first_dyn + len(strs):
            entry = strs[code - first_dyn]
        elif code == first_dyn + len(strs) and prev is not None:
            entry = prev + prev[:1]          # KwKwK
        else:
            raise ValueError(f"GIF: invalid LZW code {code}")
        if prev is not None:
            strs.append(prev + entry[:1])
            if first_dyn + len(strs) == (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry
    return bytes(out)


def _parse_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a -> (h, w, 3) uint8 RGB of the FIRST image frame:
    logical-screen walk, global/local color table, extension-block skip
    (GCE et al.), LZW decompress, 4-pass de-interlace. Palette mapping
    is a single numpy gather."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:                          # extension: label + blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:                        # image descriptor
            w = int.from_bytes(payload[pos + 5:pos + 7], "little")
            h = int.from_bytes(payload[pos + 7:pos + 9], "little")
            ip = payload[pos + 9]
            pos += 10
            ct = gct
            if ip & 0x80:                      # local color table
                n = 2 << (ip & 7)
                ct = np.frombuffer(payload, np.uint8, n * 3,
                                   pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF: no color table")
            minc = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            idx = np.frombuffer(
                _lzw_decompress(bytes(data), minc, w * h),
                np.uint8, w * h).reshape(h, w)
            if ip & 0x40:                      # de-interlace
                order = np.concatenate([
                    np.arange(start, h, step)
                    for start, step in _GIF_INTERLACE_PASSES])
                de = np.empty_like(idx)
                de[order] = idx
                idx = de
            return ct[idx]
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
    raise ValueError("GIF: no image data")


class GifDecodeStage:
    """REAL GIF decode (LZW + de-interlace): same output layout as the
    other image stages — (key, width, height, sum_r, sum_g, sum_b,
    thumb_sum) with the 8x8 nearest-neighbor thumbnail sum."""

    THUMB = 8

    def __init__(self, bytes_col: str = "gif", key_col: str = "doc_id"):
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
            px = _parse_gif(p)
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


def synth_gif_bytes(doc_id: int) -> bytes:
    """Deterministic GIF keyed by doc id: 256-color global palette
    (entry i -> ((i*7+id)%256, (i*11+3*id)%256, (i*13+5*id)%256)),
    indices (x*(id%5+1) + y*(id%7+1) + id) % 256, w = 20+id%13,
    h = 16+id%9. Odd ids write INTERLACED rows (4-pass order); ids
    divisible by 3 are GIF89a with a Graphic Control Extension (the
    decoder's extension-skip path); the LZW stream is produced by the
    real variable-width compressor."""
    w = 20 + doc_id % 13
    h = 16 + doc_id % 9
    interlaced = doc_id % 2 == 1
    gce = doc_id % 3 == 0
    i = np.arange(256, dtype=np.int64)
    pal = np.stack([(i * 7 + doc_id) % 256,
                    (i * 11 + 3 * doc_id) % 256,
                    (i * 13 + 5 * doc_id) % 256], axis=1).astype(np.uint8)
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    idx = ((x * (doc_id % 5 + 1) + y * (doc_id % 7 + 1) + doc_id)
           % 256).astype(np.uint8)
    if interlaced:
        order = np.concatenate([np.arange(start, h, step)
                                for start, step in _GIF_INTERLACE_PASSES])
        idx = idx[order]
    comp = _lzw_compress(idx.tobytes(), 8)
    out = bytearray()
    out += b"GIF89a" if gce else b"GIF87a"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | 0x70 | 0x07, 0, 0])   # GCT, 256 colors
    out += pal.tobytes()
    if gce:
        out += bytes([0x21, 0xF9, 4, 0, doc_id % 100, 0, 0, 0])
    packed = 0x40 if interlaced else 0
    out += (b"\x2c" + b"\x00" * 4
            + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([packed, 8]))
    for s in range(0, len(comp), 255):
        blk = comp[s:s + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# IMA (DVI4) ADPCM — a REAL compressed-audio codec (4 bits/sample), the
# audio counterpart of the PNG/JPEG/GIF decoders above. Container is the
# standard WAV format-0x11 block layout: per block a 4-byte state header
# (predictor int16 LE = the block's FIRST output sample, step index uint8,
# reserved 0) followed by block_align-4 nibble bytes, low nibble first;
# a `fact` chunk carries the true frame count so padded nibbles in the
# final block truncate away. Tables and update rules are the public IMA
# "Recommended Practices for Enhancing Digital Audio Compatibility" ones.
# Decode is SEQUENTIAL per block but data-parallel ACROSS blocks — the
# engine decoder loops over nibble positions with numpy ops spanning every
# block of the payload (the same across-units vectorization the Y4M and
# PNG stages use); the oracle twin in pipelines/oracles.py re-decodes the
# same bytes with pure-Python ints, no numpy, no shared control flow.
# ---------------------------------------------------------------------------

_IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], np.int64)

_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int64)


def _ima_reconstruct(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One scalar IMA decode step -> (new_pred, new_index). Shared by the
    ENCODER only (the encoder must track the decoder's reconstruction);
    the engine decoder below re-implements this vectorized and the oracle
    twin re-implements it scalar."""
    step = int(_IMA_STEP_TABLE[index])
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_IMA_INDEX_TABLE[nibble & 7])))
    return pred, index


def _ima_adpcm_encode(samples: np.ndarray, block_align: int) -> bytes:
    """Mono IMA ADPCM encoder (payload synthesis side). Each block
    consumes 1 + 2*(block_align-4) input samples: the first is stored
    verbatim in the header, the rest quantize to nibbles against the
    running reconstruction. Short final blocks pad with 0-nibbles (the
    fact chunk's frame count truncates them on decode)."""
    spb = 1 + 2 * (block_align - 4)
    out = bytearray()
    pred, index = 0, 0
    pos = 0
    n = len(samples)
    while pos < n:
        pred = int(samples[pos])
        out += pred.to_bytes(2, "little", signed=True)
        out += bytes([index, 0])
        pos += 1
        nibbles = []
        for j in range(2 * (block_align - 4)):
            if pos + j < n:
                target = int(samples[pos + j])
                step = int(_IMA_STEP_TABLE[index])
                delta = target - pred
                nib = 8 if delta < 0 else 0
                delta = abs(delta)
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
            else:
                nib = 0                     # pad; truncated by fact count
            pred, index = _ima_reconstruct(pred, index, nib)
            nibbles.append(nib)
        pos += 2 * (block_align - 4)
        for k in range(0, len(nibbles), 2):
            out += bytes([nibbles[k] | (nibbles[k + 1] << 4)])
    assert len(out) % block_align == 0
    return bytes(out), spb


def synth_adpcm_bytes(doc_id: int) -> bytes:
    """Deterministic IMA-ADPCM WAV keyed by doc id: the int16 source is
    an integer triangle wave (period 2*(60+id%37), per-sample slope
    700+id%131 — trackable by the codec so the step index adapts up AND
    down rather than saturating) plus a small dither term ((t*k2)%61),
    centered so large ids clip at the int16 rails (clamp exercise);
    n = 500 + id%203 frames, rate 8000+100*(id%5), mono, block_align 132
    (257 frames/block -> 2-3 blocks per payload, a padded partial final
    block for most ids)."""
    k2 = doc_id % 17 + 3
    n = 500 + doc_id % 203
    rate = 8000 + 100 * (doc_id % 5)
    p = 60 + doc_id % 37
    a = 700 + doc_id % 131
    t = np.arange(n, dtype=np.int64)
    tri = np.abs((t + doc_id) % (2 * p) - p)
    wave = (tri - p // 2) * a + (t * k2) % 61
    samples = np.clip(wave, -32768, 32767)
    block_align = 132
    data, spb = _ima_adpcm_encode(samples, block_align)
    fmt = (np.int64(0x11).astype("<u2").tobytes()
           + np.int64(1).astype("<u2").tobytes()          # mono
           + np.int64(rate).astype("<u4").tobytes()
           + np.int64(rate * block_align // spb).astype("<u4").tobytes()
           + np.int64(block_align).astype("<u2").tobytes()
           + np.int64(4).astype("<u2").tobytes()          # bits/sample
           + np.int64(2).astype("<u2").tobytes()          # cbSize
           + np.int64(spb).astype("<u2").tobytes())       # samples/block
    fact = np.int64(n).astype("<u4").tobytes()
    body = (b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"fact" + len(fact).to_bytes(4, "little") + fact
            + b"data" + len(data).to_bytes(4, "little") + data)
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def _parse_adpcm_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE IMA-ADPCM (fmt 0x11, mono) -> (rate, 1, int16 samples).

    Vectorized ACROSS blocks: all state headers load in one strided
    frombuffer, nibbles expand to an (n_blocks, samples-1) matrix, and
    the sequential predictor/index recurrence runs once per nibble
    POSITION with numpy ops spanning every block (blocks are independent
    by construction — each header restates the codec state)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data, fact = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact":
            fact = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None or fact is None:
        raise ValueError("missing fmt/fact/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 0x11 or bits != 4 or n_ch != 1:
        raise ValueError(f"unsupported adpcm wav {audio_fmt}/{bits}/{n_ch}")
    n_frames = int.from_bytes(fact[0:4], "little")
    if len(data) % block_align:
        raise ValueError("data not block-aligned")
    nb = len(data) // block_align
    raw = np.frombuffer(data, np.uint8).reshape(nb, block_align)
    pred = raw[:, 0:2].copy().view("<i2")[:, 0].astype(np.int64)
    index = raw[:, 2].astype(np.int64)
    if index.max(initial=0) > 88:
        raise ValueError("step index out of range")
    nib_bytes = raw[:, 4:]
    nibs = np.empty((nb, 2 * (block_align - 4)), np.int64)
    nibs[:, 0::2] = nib_bytes & 0x0F
    nibs[:, 1::2] = nib_bytes >> 4
    out = np.empty((nb, 1 + nibs.shape[1]), np.int64)
    out[:, 0] = pred
    for j in range(nibs.shape[1]):
        n4 = nibs[:, j]
        step = _IMA_STEP_TABLE[index]
        diff = ((step >> 3) + np.where(n4 & 4, step, 0)
                + np.where(n4 & 2, step >> 1, 0)
                + np.where(n4 & 1, step >> 2, 0))
        pred = np.clip(np.where(n4 & 8, pred - diff, pred + diff),
                       -32768, 32767)
        index = np.clip(index + _IMA_INDEX_TABLE[n4 & 7], 0, 88)
        out[:, j + 1] = pred
    samples = out.reshape(-1)[:n_frames].astype(np.int16)
    return rate, 1, samples


class AdpcmDecodeStage:
    """REAL compressed-audio decode: IMA ADPCM WAV payloads (4
    bits/sample) fully decompressed per row, emitting the same integer
    waveform statistics as WavDecodeStage — (key, sample_rate,
    n_channels, n_samples, sum_abs, sum_sq, peak) — so the scalar-twin
    golden discipline is identical.

    Scale: one strided header load + one numpy recurrence pass per
    payload (vectorized across blocks); actor-pool with the usual small
    batch_size when payloads are large."""

    def __init__(self, bytes_col: str = "adpcm", key_col: str = "doc_id"):
        self.bytes_col = bytes_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.bytes_col].to_pylist()
        n = len(payloads)
        rate = np.empty(n, np.int64)
        nch = np.empty(n, np.int64)
        nsamp = np.empty(n, np.int64)
        sabs = np.empty(n, np.int64)
        ssq = np.empty(n, np.int64)
        peak = np.empty(n, np.int64)
        for i, p in enumerate(payloads):
            r, c, s = _parse_adpcm_wav(p)
            rate[i], nch[i] = r, c
            nsamp[i] = len(s)
            a = np.abs(s.astype(np.int64))
            sabs[i] = int(a.sum())
            ssq[i] = int((a * a).sum())
            peak[i] = int(a.max()) if len(a) else 0
        return pa.table({
            self.key_col: batch[self.key_col],
            "sample_rate": pa.array(rate, pa.int64()),
            "n_channels": pa.array(nch, pa.int64()),
            "n_samples": pa.array(nsamp, pa.int64()),
            "sum_abs": pa.array(sabs, pa.int64()),
            "sum_sq": pa.array(ssq, pa.int64()),
            "peak": pa.array(peak, pa.int64()),
        })
