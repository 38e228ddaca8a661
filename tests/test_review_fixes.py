"""Regression tests for the round-1 code-review findings."""

import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from shapefile_rs_ray.geometry import shp
from shapefile_rs_ray.geometry.shp_write import write_shp


def _file_with_null_record() -> bytes:
    """Point-type .shp: [point(1,2), NullShape, point(3,4)]."""
    recs = []
    for i, payload in enumerate([
            struct.pack("<i", 1) + struct.pack("<dd", 1.0, 2.0),
            struct.pack("<i", 0),
            struct.pack("<i", 1) + struct.pack("<dd", 3.0, 4.0)]):
        recs.append(struct.pack(">ii", i + 1, len(payload) // 2) + payload)
    body = b"".join(recs)
    flen = (100 + len(body)) // 2
    head = (struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", flen)
            + struct.pack("<ii", 1000, 1)
            + np.array([1.0, 2.0, 3.0, 4.0, 0, 0, 0, 0]).tobytes())
    return head + body


def test_null_shape_roundtrip():
    buf = _file_with_null_record()
    h, st = shp.read_shp_bytes(buf)
    assert st.num_shapes == 3
    np.testing.assert_array_equal(st.is_null, [False, True, False])
    np.testing.assert_array_equal(st.x, [1.0, 3.0])
    b, bx = write_shp(st)
    h2, st2 = shp.read_shp_bytes(b, bx)
    np.testing.assert_array_equal(st2.is_null, st.is_null)
    np.testing.assert_array_equal(st2.x, st.x)
    np.testing.assert_array_equal(st2.y, st.y)
    assert h2.file_length * 2 == len(b)


def test_dbf_wide_integers_roundtrip_and_overflow_guard():
    from shapefile_rs_ray.geometry import dbf
    big = 9223372036854775807
    t = pa.table({"v": pa.array([big, -big, 0], pa.int64())})
    out = dbf.read_dbf_bytes(dbf.write_dbf(t))
    assert out["v"].to_pylist() == [float(big), float(-big), 0.0]
    # a value whose rendering exceeds the 254-char dbf field cap must raise,
    # never silently truncate (the original corruption bug)
    with pytest.raises(ValueError):
        dbf.write_dbf(pa.table({"v": pa.array([1e300], pa.float64())}))


def test_dbf_deleted_rows_positional():
    from shapefile_rs_ray.geometry import dbf
    t = pa.table({"a": pa.array(["x", "y", "z"])})
    raw = bytearray(dbf.write_dbf(t))
    # flag the middle record deleted
    header_size, record_size = struct.unpack("<HH", raw[8:12])
    raw[header_size + record_size] = ord("*")
    kept = dbf.read_dbf_bytes(bytes(raw))                 # positional default
    assert kept.num_rows == 3
    dropped = dbf.read_dbf_bytes(bytes(raw), skip_deleted=True)
    assert dropped["a"].to_pylist() == ["x", "z"]


def test_tumbling_window_small_window_seconds(ray_session):
    import ray
    from shapefile_rs_ray.stages.windows import tumbling_window_counts
    ev = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["user_id", "ts", "value"])
    got = (tumbling_window_counts(ev, window_s=300).to_pandas()
           .sort_values(["user_id", "window"]).reset_index(drop=True))
    df = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id", "ts", "value"])
    df["window"] = df.ts.astype("int64") // (300 * 1_000_000)
    exp = (df.groupby(["user_id", "window"])
           .agg(n_events=("value", "size"), max_value=("value", "max"))
           .reset_index().sort_values(["user_id", "window"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes))


def test_knn_exact_distance_ties_break_by_site_id():
    from shapefile_rs_ray.stages.knn import KnnStage
    # 4 sites symmetric around the query -> identical d2; ids shuffled
    sid = np.array([9, 3, 7, 5], np.int64)
    slon = np.array([1.0, -1.0, 0.0, 0.0])
    slat = np.array([0.0, 0.0, 1.0, -1.0])
    stage = KnnStage((sid, slon, slat), k=3, keep_cols=("page_id",))
    batch = pa.table({"page_id": pa.array([1], pa.int64()),
                      "lon": pa.array([0.0]), "lat": pa.array([0.0])})
    out = stage(batch)
    assert out["site_id"].to_pylist() == [3, 5, 7]   # ids asc among ties


def test_cosine_topk_corpus_smaller_than_k(ray_session):
    import ray
    from shapefile_rs_ray.stages.ann import cosine_topk
    corpus = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
                              pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(corpus)
    out = cosine_topk(ds, corpus, k=5).to_pandas()
    # self excluded, so 2 neighbors per query, no crash
    assert len(out) == 6
    assert set(out["rank"]) == {1, 2}


def test_zonal_integer_sums_exact():
    from shapefile_rs_ray.stages.zonal import zonal_stats  # noqa: F401
    # direct kernel check on values past float53 granularity
    zones = np.array([0, 0, 1], np.int64)
    vals = np.array([(1 << 53), 1, 7], np.int64)
    uniq, inv = np.unique(zones, return_inverse=True)
    s = np.zeros(len(uniq), np.int64)
    np.add.at(s, inv, vals)
    assert s.tolist() == [(1 << 53) + 1, 7]   # float64 would round to 2^53


def test_null_shape_survives_arrow_roundtrip():
    from shapefile_rs_ray.geometry.schema import (arrow_to_shape_table,
                                                  shape_table_to_arrow)
    buf = _file_with_null_record()
    _, st = shp.read_shp_bytes(buf)
    st2 = arrow_to_shape_table(shape_table_to_arrow(st))
    np.testing.assert_array_equal(st2.is_null, [False, True, False])
    b, _ = write_shp(st2)
    _, st3 = shp.read_shp_bytes(b)
    np.testing.assert_array_equal(st3.x, st.x)
    np.testing.assert_array_equal(st3.is_null, st.is_null)
