"""Multimodal-column stages: opaque binary payloads (html/image/audio)
processed by actor-pool map_batches with typed metadata outputs.

The image/audio decoders themselves are STUBS (the sandbox has no
imaging/audio libraries): `decode=strict` raises NotImplementedError the way
the real stage would surface a missing codec, while the default
deterministic fake derives metadata purely from the bytes so the Ray-side
plumbing — schema, batch sizing for wide binary rows, actor signature,
output layout — is real and tested end-to-end. Swapping in PIL/libsndfile
is a one-method change.

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
        if self.strict:
            raise NotImplementedError(
                "image decode requires an imaging library not present in "
                "this environment; deterministic fake used by default")
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
    timestamps are exact integer arithmetic, fully SQL-oracled."""

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
