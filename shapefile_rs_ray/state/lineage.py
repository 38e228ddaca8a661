"""Checkpoint/resume with per-partition lineage manifests.

Output layout (the "resumable output" contract of BASELINE.md):

    out_dir/
      part=000123/data.parquet        # one directory per deterministic key range
      part=000123/manifest.json       # {rows, key range, text_sha256, status}
      _done/part=000123.json          # hard-linked manifest marking completion

Partitions are keyed by `key_col // partition_size` — a pure function of the
data, NOT of block boundaries — so a re-run assigns identical rows to
identical partitions regardless of execution order, and `resume_filter`
can skip completed partitions by key range alone. Writes go to a temp file
then `os.replace` (atomic on POSIX), so a killed run never leaves a
half-written partition that passes the manifest check.

The per-partition `text_sha256` chains the lineage invariant (byte-identical
extracted text per url, BASELINE.json input_hint): it hashes (url, text)
pairs in key order, so any stage that corrupts or reorders text changes the
manifest and the resume test fails loudly.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def partition_key(ids: np.ndarray, partition_size: int) -> np.ndarray:
    return np.asarray(ids, np.int64) // partition_size


def completed_partitions(out_dir: str) -> set[int]:
    done = set()
    d = os.path.join(out_dir, "_done")
    if os.path.isdir(d):
        for f in os.listdir(d):
            if f.startswith("part=") and f.endswith(".json"):
                done.add(int(f[5:-5]))
    return done


class PartitionWriter:
    """map_groups callable: writes one partition directory atomically.

    Emits the manifest row. Safe to re-run: an existing completed partition
    is left untouched (idempotent writes under task retry)."""

    def __init__(self, out_dir: str, key_col: str = "page_id",
                 text_col: str | None = "text", url_col: str | None = "url",
                 partition_size: int = 1 << 14):
        self.out_dir = out_dir
        self.key_col = key_col
        self.text_col = text_col
        self.url_col = url_col
        self.partition_size = partition_size
        os.makedirs(os.path.join(out_dir, "_done"), exist_ok=True)

    def __call__(self, group: pa.Table) -> pa.Table:
        keys = np.asarray(group[self.key_col], np.int64)
        part = int(keys[0]) // self.partition_size
        pdir = os.path.join(self.out_dir, f"part={part:06d}")
        done_marker = os.path.join(self.out_dir, "_done",
                                   f"part={part:06d}.json")
        if os.path.exists(done_marker):
            return pa.table({"part": pa.array([part], pa.int64()),
                             "rows": pa.array([group.num_rows], pa.int64()),
                             "skipped": pa.array([True])})
        os.makedirs(pdir, exist_ok=True)
        order = np.argsort(keys, kind="stable")
        group = group.take(pa.array(order))

        text_sha = None
        if self.text_col and self.text_col in group.column_names:
            h = hashlib.sha256()
            urls = (group[self.url_col].to_pylist()
                    if self.url_col and self.url_col in group.column_names
                    else [""] * group.num_rows)
            for u, t in zip(urls, group[self.text_col].to_pylist()):
                h.update(u.encode("utf-8"))
                h.update(b"\x00")
                h.update((t or "").encode("utf-8"))
                h.update(b"\x01")
            text_sha = h.hexdigest()

        t0 = time.monotonic()
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        pq.write_table(group, tmp)
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        manifest = {
            "part": part, "rows": group.num_rows,
            "key_min": int(keys.min()), "key_max": int(keys.max()),
            "text_sha256": text_sha, "status": "done",
            # per-partition metrics (rows above, plus volume + timing;
            # read_manifests() aggregates these into the job report)
            "bytes": int(group.nbytes),
            "write_s": round(time.monotonic() - t0, 4),
        }
        mtmp = os.path.join(pdir, ".manifest.json.tmp")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(pdir, "manifest.json"))
        with open(done_marker + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(done_marker + ".tmp", done_marker)
        return pa.table({"part": pa.array([part], pa.int64()),
                         "rows": pa.array([group.num_rows], pa.int64()),
                         "skipped": pa.array([False])})


def write_partitioned(ds, out_dir: str, *, key_col: str = "page_id",
                      partition_size: int = 1 << 14,
                      text_col: str | None = "text",
                      url_col: str | None = "url", resume: bool = True):
    """Write `ds` as resumable keyed partitions; returns the manifest
    Dataset (part, rows, skipped). With resume=True, rows in completed
    partitions are dropped at the map stage (cheap vectorized filter) before
    the shuffle."""
    done = completed_partitions(out_dir) if resume else set()

    def key_and_filter(batch: pa.Table) -> pa.Table:
        part = partition_key(np.asarray(batch[key_col], np.int64),
                             partition_size)
        batch = batch.append_column("__part", pa.array(part, pa.int64()))
        if done:
            mask = ~np.isin(part, list(done))
            batch = batch.filter(pa.array(mask))
        return batch

    keyed = ds.map_batches(key_and_filter, batch_format="pyarrow")
    writer = PartitionWriter(out_dir, key_col=key_col, text_col=text_col,
                             url_col=url_col, partition_size=partition_size)

    def write_group(group: pa.Table) -> pa.Table:
        return writer(group)

    return keyed.groupby("__part").map_groups(write_group,
                                              batch_format="pyarrow")


def read_manifests(out_dir: str) -> list[dict]:
    out = []
    d = os.path.join(out_dir, "_done")
    if os.path.isdir(d):
        for f in sorted(os.listdir(d)):
            if f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    out.append(json.load(fh))
    return out


def job_metrics(out_dir: str) -> dict:
    """Aggregate the per-partition manifests into one job report:
    partitions, rows, bytes, write seconds, key coverage — the
    driver-side summary for a resumable run (cheap: reads only the
    _done marker files, never the data)."""
    ms = read_manifests(out_dir)
    return {
        "partitions": len(ms),
        "rows": sum(m.get("rows", 0) for m in ms),
        "bytes": sum(m.get("bytes", 0) for m in ms),
        "write_s": round(sum(m.get("write_s", 0.0) for m in ms), 4),
        "key_min": min((m["key_min"] for m in ms), default=None),
        "key_max": max((m["key_max"] for m in ms), default=None),
    }
