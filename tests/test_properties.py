"""Property-based tests (hypothesis) for the pure kernels — coverage
the reference does not have (SURVEY.md §5: its tests are golden-count
E2E only). Each property is a round-trip or algebraic invariant over
the full input domain, not a fixture."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_io_spark.functions import cells as C
from osm_io_spark.functions import geometry as G
from osm_io_spark.sources.pbf import proto as P

lat_s = st.floats(min_value=-90.0, max_value=90.0,
                  allow_nan=False, allow_infinity=False)
lon_s = st.floats(min_value=-180.0, max_value=180.0,
                  allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=0, max_size=200))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, np.uint64)
    assert (P.decode_varints(P.encode_varints(arr)) == arr).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-2**62, max_value=2**62 - 1),
                min_size=0, max_size=200))
def test_sint_delta_roundtrip_property(vals):
    arr = np.array(vals, np.int64)
    assert (P.decode_sint_packed(P.encode_sint_packed(arr)) == arr).all()
    assert (P.delta_decode(P.delta_encode(arr)) == arr).all()


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_morton_bijective_property(x, y):
    xa = np.array([x], np.uint64)
    ya = np.array([y], np.uint64)
    m = C.morton_np(xa, ya)
    assert C._compact1by1_np(m >> np.uint64(1))[0] == x
    assert C._compact1by1_np(m)[0] == y


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s, st.integers(min_value=0, max_value=C.MAX_RES))
def test_cell_contains_its_point_property(lat, lon, res):
    cell = C.cell_at_np(np.array([lat]), np.array([lon]), res)
    left, bottom, right, top = C.cell_bounds_np(cell, res)
    # floor+clamp semantics: the point lies in [left, right] x
    # [bottom, top] of its own cell (boundary points clamp inward)
    assert left[0] - 1e-9 <= lon <= right[0] + 1e-9 or lon in (180.0, -180.0)
    assert bottom[0] - 1e-9 <= lat <= top[0] + 1e-9 or lat in (90.0, -90.0)
    # parent relationship: the same point at res-1 is the cell's parent
    if res >= 1:
        parent = C.cell_at_np(np.array([lat]), np.array([lon]), res - 1)
        assert C.cell_parent_np(cell)[0] == parent[0]


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s)
def test_zorder_tile_in_range_property(lat, lon):
    t = C.zorder_tile_np(np.array([lat]), np.array([lon]))[0]
    assert 0 <= t < 1 << 32


@settings(max_examples=200, deadline=None)
@given(st.floats(-180, 180, allow_nan=False),
       st.floats(-90, 90, allow_nan=False),
       st.floats(-180, 180, allow_nan=False),
       st.floats(-90, 90, allow_nan=False))
def test_bbox_str_roundtrip_property(left, bottom, right, top):
    bb = (left, bottom, right, top)
    assert G.bbox_from_str(G.bbox_to_str(bb)) == bb


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.floats(-100, 100, allow_nan=False,
                                    allow_infinity=False),
                          st.floats(-100, 100, allow_nan=False,
                                    allow_infinity=False)),
                min_size=3, max_size=12),
       st.floats(-100, 100, allow_nan=False),
       st.floats(-100, 100, allow_nan=False))
def test_pip_matches_matplotlib_free_winding(ring, px, py):
    """Even-odd ray cast agrees with a brute-force angle-sum-free
    reference implementation (crossing number computed per edge with
    plain Python)."""
    r = np.asarray(ring, np.float64)
    got = bool(G.points_in_polygon(np.array([px]), np.array([py]), [r])[0])
    crossings = 0
    m = len(r)
    for i in range(m):
        x1, y1 = r[i]
        x2, y2 = r[(i + 1) % m]
        if (y1 > py) != (y2 > py):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            if px < xint:
                crossings += 1
    assert got == (crossings % 2 == 1)
