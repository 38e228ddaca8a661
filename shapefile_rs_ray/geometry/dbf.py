"""dBase (.dbf) attribute table reader/writer over numpy fixed-width slices.

The reference delegates to the `dbase` crate (re-exported at src/lib.rs:60,
zipped 1:1 with shapes in ShapeRecordIterator, src/reader.rs:164-193) and
selects the text encoding by sniffing an optional `.cpg` sidecar
(<=1025 bytes, BOM-trimmed — src/reader.rs:664-684; golden GBK test
tests/read_tests.rs:832-845). This is an independent implementation of the
public dBase III/IV layout, columnar: each field is decoded with one numpy
fixed-width slice over the whole record block, not row by row.

Supported field types (the dbase::FieldValue variants the reference surfaces):
C (Character -> utf8), N (Numeric -> f64 or None), F (Float -> f64),
L (Logical -> bool/None), D (Date -> date32), I (Integer, binary LE -> int32),
T (DateTime, two LE i32 julian-day/milliseconds -> timestamp[ms]),
Y (Currency, LE i64 scaled 1e-4 -> f64),
M (Memo -> utf8 via the sibling .dbt block file; None when absent).
"""

from __future__ import annotations

import datetime as _dt
import os
import struct
from dataclasses import dataclass

import numpy as np
import pyarrow as pa


@dataclass
class DbfField:
    name: str
    ftype: str
    length: int
    decimals: int


def sniff_cpg(path_like: str) -> str | None:
    """Read a `.cpg` sidecar next to `path_like` (any extension) and map its
    label to a Python codec. Mirrors src/reader.rs:664-684: at most 1025
    bytes, BOM trimmed, whitespace stripped; unknown label -> None."""
    cpg = os.path.splitext(path_like)[0] + ".cpg"
    if not os.path.exists(cpg):
        return None
    with open(cpg, "rb") as f:
        raw = f.read(1025)
    label = raw.decode("utf-8", "replace").lstrip("﻿").strip().lower()
    aliases = {
        "utf-8": "utf-8", "utf8": "utf-8", "65001": "utf-8",
        "gbk": "gbk", "cp936": "gbk", "936": "gbk",
        "big5": "big5", "cp950": "big5",
        "cp1252": "cp1252", "1252": "cp1252", "windows-1252": "cp1252",
        "iso-8859-1": "latin-1", "latin1": "latin-1", "8859part1": "latin-1",
        "ascii": "ascii",
    }
    return aliases.get(label)


def _parse_header(buf: bytes) -> tuple[int, int, int, list[DbfField]]:
    if len(buf) < 32:
        raise ValueError("dbf too short")
    num_records = struct.unpack("<I", buf[4:8])[0]
    header_size, record_size = struct.unpack("<HH", buf[8:12])
    fields: list[DbfField] = []
    pos = 32
    while pos < header_size - 1 and pos + 32 <= len(buf) and buf[pos] != 0x0D:
        desc = buf[pos:pos + 32]
        name = desc[:11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(desc[11])
        length = desc[16]
        decimals = desc[17]
        fields.append(DbfField(name, ftype, length, decimals))
        pos += 32
    return num_records, header_size, record_size, fields


def _decode_block(block: np.ndarray, fields: list[DbfField], encoding: str,
                  memo: bytes | None) -> pa.Table:
    cols: dict[str, pa.Array] = {}
    off = 1
    for f in fields:
        raw = block[:, off:off + f.length]
        off += f.length
        cols[f.name] = _decode_field(raw, f, encoding, memo)
    return pa.table(cols)


def read_dbf_bytes(buf: bytes, encoding: str = "utf-8",
                   skip_deleted: bool = False,
                   memo: bytes | None = None) -> pa.Table:
    """Decode a whole .dbf buffer into an Arrow table.

    `skip_deleted=False` keeps '*'-flagged rows so attribute rows stay
    positionally 1:1 with .shp records (the zip invariant of
    ShapeRecordIterator, src/reader.rs:164-193 — a deleted dbf row still
    occupies its slot); pass True for standalone attribute reads that want
    the dbase-crate behavior of dropping them. `memo` is the sibling .dbt
    buffer for 'M' fields.
    """
    num_records, header_size, record_size, fields = _parse_header(buf)
    block = np.frombuffer(buf, np.uint8, count=num_records * record_size,
                          offset=header_size).reshape(num_records, record_size)
    if skip_deleted:
        block = block[block[:, 0] != ord("*")]
    return _decode_block(block, fields, encoding, memo)


def read_dbf_range(path: str, start: int, count: int,
                   encoding: str = "utf-8") -> pa.Table:
    """Decode only records [start, start+count) by seeking past the header —
    a split-planned ReadTask pays one header read + its own byte range, not
    the whole attribute file."""
    with open(path, "rb") as f:
        head = f.read(32)
        if len(head) < 32:
            raise ValueError("dbf too short")
        header_size = struct.unpack("<HH", head[8:12])[0]
        num_records, header_size, record_size, fields = _parse_header(
            head + f.read(max(header_size - 32, 0)))
        count = max(0, min(count, num_records - start))
        f.seek(header_size + start * record_size)
        data = f.read(count * record_size)
    # the whole .dbt is loaded only when an 'M' field actually exists —
    # otherwise a split read would re-pay the memo file once per task
    memo = (_sibling_memo(path)
            if any(fl.ftype == "M" for fl in fields) else None)
    block = np.frombuffer(data, np.uint8,
                          count=count * record_size).reshape(count,
                                                             record_size)
    return _decode_block(block, fields, encoding, memo)


def _sibling_memo(path_like: str) -> bytes | None:
    for ext in (".dbt", ".DBT"):
        p = os.path.splitext(path_like)[0] + ext
        if os.path.exists(p):
            with open(p, "rb") as f:
                return f.read()
    return None


def _memo_text(memo: bytes, block_no: int, encoding: str,
               block_size: int = 512) -> str | None:
    """dBase III .dbt: text at block_no*512, 0x1A-terminated."""
    if block_no <= 0 or block_no * block_size >= len(memo):
        return None
    chunk = memo[block_no * block_size:]
    end = chunk.find(b"\x1a")
    raw = chunk if end < 0 else chunk[:end]
    return raw.decode(encoding, "replace")


_UNIX_ORDINAL_OFFSET = 1721425   # proleptic-Gregorian ordinal = JDN - this


def _decode_field(raw: np.ndarray, f: DbfField, encoding: str,
                  memo: bytes | None = None) -> pa.Array:
    n = len(raw)
    if f.ftype == "I":
        vals = raw[:, :4].copy().view("<i4").ravel()
        return pa.array(vals, pa.int32())
    if f.ftype == "Y":
        # Currency: LE i64 scaled by 1e-4 (dBase 7 / VFP layout); divide
        # (correctly-rounded) rather than multiply by 1e-4 (double-rounds)
        vals = raw[:, :8].copy().view("<i8").ravel()
        return pa.array(vals.astype(np.float64) / 10000.0, pa.float64())
    if f.ftype == "T":
        # DateTime: LE i32 julian day number + LE i32 milliseconds-of-day
        pair = raw[:, :8].copy().view("<i4").reshape(n, 2)
        jdn = pair[:, 0].astype(np.int64)
        ms = pair[:, 1].astype(np.int64)
        # null on zero day AND on all-spaces padding (0x20202020 would
        # otherwise decode as a silent year-1.47M garbage timestamp)
        blank = (raw[:, :8] == 0x20).all(axis=1)
        # days since Unix epoch = (JDN - offset) - date(1970,1,1).toordinal()
        days = (jdn - _UNIX_ORDINAL_OFFSET) - _dt.date(1970, 1, 1).toordinal()
        out = days * 86_400_000 + ms
        return pa.array(out, pa.timestamp("ms"), mask=(jdn == 0) | blank)
    texts = [bytes(raw[i]).decode(encoding, "replace") for i in range(n)]
    if f.ftype == "M":
        if memo is None:
            return pa.array([None] * n, pa.string())
        out = []
        for t in texts:
            t = t.strip()
            out.append(_memo_text(memo, int(t), encoding)
                       if t.isdigit() else None)
        return pa.array(out, pa.string())
    if f.ftype == "C":
        return pa.array([t.strip() for t in texts], pa.string())
    if f.ftype in ("N", "F"):
        out = []
        for t in texts:
            t = t.strip()
            out.append(float(t) if t and t != "*" * len(t) else None)
        if f.ftype == "N" and f.decimals == 0 and f.length < 10:
            return pa.array([None if v is None else int(v) for v in out],
                            pa.int64())
        return pa.array(out, pa.float64())
    if f.ftype == "L":
        out = []
        for t in texts:
            c = t.strip()[:1].upper()
            out.append(True if c in "YT" else False if c in "NF" else None)
        return pa.array(out, pa.bool_())
    if f.ftype == "D":
        out = []
        for t in texts:
            t = t.strip()
            if len(t) == 8 and t.isdigit():
                out.append(_dt.date(int(t[:4]), int(t[4:6]), int(t[6:8])))
            else:
                out.append(None)
        return pa.array(out, pa.date32())
    # unknown type: surface raw text
    return pa.array(texts, pa.string())


def read_dbf(path: str, encoding: str | None = None,
             skip_deleted: bool = False) -> pa.Table:
    if encoding is None:
        encoding = sniff_cpg(path) or "utf-8"
    with open(path, "rb") as f:
        return read_dbf_bytes(f.read(), encoding, skip_deleted=skip_deleted,
                              memo=_sibling_memo(path))


# codec -> the label the reference writer would record in a .cpg sidecar
# (inverse of the sniff_cpg alias table; src/writer.rs:352-372 carries the
# encoding end-to-end on write)
CPG_LABELS = {
    "utf-8": "UTF-8", "gbk": "CP936", "big5": "BIG5",
    "cp1252": "CP1252", "latin-1": "ISO-8859-1", "ascii": "ASCII",
}


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

_ARROW_TO_DBF = [
    (pa.types.is_integer, lambda: ("N", 18, 0)),
    (pa.types.is_floating, lambda: ("N", 20, 8)),
    (pa.types.is_boolean, lambda: ("L", 1, 0)),
    (pa.types.is_date, lambda: ("D", 8, 0)),
]


def write_dbf(table: pa.Table, encoding: str = "utf-8",
              date: tuple[int, int, int] = (2000, 1, 1)) -> bytes:
    """Encode an Arrow table as dBase III (no memo sidecar: long strings
    truncate at 254 — use `write_dbf_with_memo` for Memo fidelity).
    `date` is the header's last-update stamp — fixed by default so
    outputs are deterministic/resumable."""
    dbf, _ = _write_dbf_impl(table, encoding, date, memo_cols=(),
                             currency_cols=(), memo_threshold=None)
    return dbf


def write_dbf_with_memo(table: pa.Table, encoding: str = "utf-8",
                        date: tuple[int, int, int] = (2000, 1, 1),
                        memo_cols: tuple[str, ...] = (),
                        currency_cols: tuple[str, ...] = (),
                        memo_threshold: int = 254
                        ) -> tuple[bytes, bytes | None]:
    """dBase III+ write with the reference writer's full field surface
    (the dbase crate behind /root/reference/src/writer.rs:311-334 writes
    Memo/.dbt, Currency and DateTime): returns (dbf_bytes, dbt_bytes or
    None when no memo field was needed).

    - string columns named in `memo_cols`, or containing any value longer
      than `memo_threshold` encoded bytes, become 'M' fields whose
      10-byte block numbers point into a dBase III .dbt (512-byte blocks,
      0x1A 0x1A terminator, header block 0 carries the next-free-block
      count and the 0x03 version byte);
    - float columns named in `currency_cols` (and decimal columns) become
      'Y' Currency fields: LE i64 of round(value * 10^4), the layout the
      reader decodes. LOSSY NULLS: the fixed i64 layout has no blank
      representation, so a null currency value writes as integer 0 and
      reads back 0.0 — indistinguishable from a legitimate zero.
      Pre-filter or sentinel-encode nulls if the distinction matters;
    - timestamps stay 'T' (LE i32 julian day + LE i32 ms-of-day).

    The .dbf version byte is 0x83 (III + memo) when a memo field exists.
    """
    return _write_dbf_impl(table, encoding, date, memo_cols=memo_cols,
                           currency_cols=currency_cols,
                           memo_threshold=memo_threshold)


_DBT_BLOCK = 512


def _write_dbf_impl(table: pa.Table, encoding: str,
                    date: tuple[int, int, int],
                    memo_cols: tuple[str, ...],
                    currency_cols: tuple[str, ...],
                    memo_threshold: int | None
                    ) -> tuple[bytes, bytes | None]:
    fields: list[DbfField] = []
    pycols: list[list] = []
    memo_blocks: list[bytes] = []     # payloads in block order
    next_block = 1                    # block 0 is the .dbt header

    def memo_field(name: str, enc_vals: list[bytes | None]):
        nonlocal next_block
        blocks = []
        for v in enc_vals:
            if v is None:
                blocks.append(None)
                continue
            payload = v + b"\x1a\x1a"
            n_blk = -(-len(payload) // _DBT_BLOCK)
            memo_blocks.append(payload + b"\x00" * (n_blk * _DBT_BLOCK
                                                    - len(payload)))
            blocks.append(next_block)
            next_block += n_blk
        fields.append(DbfField(name[:10], "M", 10, 0))
        pycols.append(blocks)

    for name, col in zip(table.column_names, table.columns):
        vals = col.to_pylist()
        typ = col.type
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            enc = [None if v is None else v.encode(encoding) for v in vals]
            ln = max([len(e) for e in enc if e is not None] + [1])
            if memo_threshold is not None and (
                    name in memo_cols or ln > memo_threshold):
                memo_field(name, enc)
                continue
            enc = [b"" if e is None else e for e in enc]
            fields.append(DbfField(name[:10], "C", min(ln, 254), 0))
            pycols.append(enc)
        elif pa.types.is_decimal(typ) or (name in currency_cols
                                          and pa.types.is_floating(typ)):
            fields.append(DbfField(name[:10], "Y", 8, 4))
            pycols.append([None if v is None else
                           int(round(float(v) * 10000.0)) for v in vals])
        elif pa.types.is_boolean(typ):
            fields.append(DbfField(name[:10], "L", 1, 0))
            pycols.append(vals)
        elif pa.types.is_date(typ):
            fields.append(DbfField(name[:10], "D", 8, 0))
            pycols.append(vals)
        elif pa.types.is_timestamp(typ):
            # 'T' DateTime: LE i32 julian day + LE i32 ms-of-day (the same
            # binary layout the reader decodes)
            fields.append(DbfField(name[:10], "T", 8, 0))
            pycols.append(vals)
        elif pa.types.is_integer(typ):
            w = max([len(str(int(v))) for v in vals if v is not None] + [1])
            fields.append(DbfField(name[:10], "N", min(max(w, 1), 254), 0))
            pycols.append(vals)
        elif pa.types.is_floating(typ):
            w = max([len(f"{float(v):.8f}")
                     for v in vals if v is not None] + [1])
            fields.append(DbfField(name[:10], "N", min(max(w, 10), 254), 8))
            pycols.append(vals)
        else:
            enc = [str(v).encode(encoding) for v in vals]
            ln = max([len(e) for e in enc] + [1])
            fields.append(DbfField(name[:10], "C", min(ln, 254), 0))
            pycols.append(enc)

    record_size = 1 + sum(f.length for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    n = table.num_rows
    has_memo = any(f.ftype == "M" for f in fields)
    out = bytearray()
    out += struct.pack("<BBBB", 0x83 if has_memo else 0x03,
                       date[0] % 100, date[1], date[2])
    out += struct.pack("<IHH", n, header_size, record_size)
    out += b"\x00" * 20
    for f in fields:
        name = f.name.encode("ascii", "replace")[:11]
        out += name + b"\x00" * (11 - len(name))
        out += f.ftype.encode("ascii")
        out += b"\x00" * 4
        out += struct.pack("<BB", f.length, f.decimals)
        out += b"\x00" * 14
    out += b"\x0d"

    for i in range(n):
        out += b" "
        for f, col in zip(fields, pycols):
            v = col[i]
            if f.ftype == "C":
                b = v[:f.length]
                out += b + b" " * (f.length - len(b))
            elif f.ftype == "L":
                out += b"?" if v is None else (b"T" if v else b"F")
            elif f.ftype == "D":
                out += (v.strftime("%Y%m%d").encode() if v is not None
                        else b" " * 8)
            elif f.ftype == "T":
                if v is None:
                    out += b"\x00" * 8     # jdn 0 -> null on read
                else:
                    jdn = v.date().toordinal() + _UNIX_ORDINAL_OFFSET
                    ms = ((v.hour * 3600 + v.minute * 60 + v.second) * 1000
                          + v.microsecond // 1000)
                    out += struct.pack("<ii", jdn, ms)
            elif f.ftype == "Y":
                # null currency encodes as 0 (reads back 0.0): the i64
                # layout has no blank representation the reader could
                # distinguish from a real value — documented lossy-null
                out += struct.pack("<q", 0 if v is None else v)
            elif f.ftype == "M":
                out += (b" " * 10 if v is None
                        else str(v).rjust(10).encode("ascii"))
            else:  # N
                if v is None:
                    out += b" " * f.length
                else:
                    if f.decimals:
                        s = f"{float(v):.{f.decimals}f}"
                    else:
                        s = str(int(v))
                    b = s.encode()
                    if len(b) > f.length:
                        raise ValueError(
                            f"numeric value {s!r} exceeds dbf field width "
                            f"{f.length} for column {f.name!r}")
                    out += b" " * (f.length - len(b)) + b
    out += b"\x1a"

    if not has_memo:
        return bytes(out), None
    dbt = bytearray()
    dbt += struct.pack("<I", next_block)          # next free block
    dbt += b"\x00" * 12
    dbt += b"\x03"                                # dBase III version
    dbt += b"\x00" * (_DBT_BLOCK - len(dbt))
    for blk in memo_blocks:
        dbt += blk
    return bytes(out), bytes(dbt)
