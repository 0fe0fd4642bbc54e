"""Geometry kernels vs brute-force / analytic references."""

import numpy as np

from osm_io_spark.functions import geometry as G

SQUARE = [np.array([(0, 0), (4, 0), (4, 4), (0, 4)], float)]
SQUARE_WITH_HOLE = [
    np.array([(0, 0), (4, 0), (4, 4), (0, 4)], float),
    np.array([(1, 1), (3, 1), (3, 3), (1, 3)], float),
]
CONCAVE = [np.array([(0, 0), (4, 0), (4, 4), (2, 2), (0, 4)], float)]


def test_pip_square():
    px = np.array([2.0, 5.0, -1.0, 3.9])
    py = np.array([2.0, 2.0, 2.0, 3.9])
    got = G.points_in_polygon(px, py, SQUARE)
    assert got.tolist() == [True, False, False, True]


def test_pip_hole_even_odd():
    px = np.array([2.0, 0.5, 3.5])
    py = np.array([2.0, 0.5, 3.5])
    got = G.points_in_polygon(px, py, SQUARE_WITH_HOLE)
    assert got.tolist() == [False, True, True]


def test_pip_concave():
    px = np.array([2.0, 2.0, 1.0])
    py = np.array([3.0, 1.0, 3.4])
    got = G.points_in_polygon(px, py, CONCAVE)
    assert got.tolist() == [False, True, False]


def test_pip_closed_ring_equivalent():
    closed = [np.array([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], float)]
    rng = np.random.default_rng(3)
    px, py = rng.uniform(-1, 5, 300), rng.uniform(-1, 5, 300)
    assert (G.points_in_polygon(px, py, SQUARE)
            == G.points_in_polygon(px, py, closed)).all()


def test_rect_intersects_polygon():
    assert G.rect_intersects_polygon(1, 1, 2, 2, SQUARE)        # rect inside
    assert G.rect_intersects_polygon(-1, -1, 5, 5, SQUARE)      # poly inside rect
    assert G.rect_intersects_polygon(3, 3, 5, 5, SQUARE)        # overlap
    assert not G.rect_intersects_polygon(5, 5, 6, 6, SQUARE)    # disjoint
    assert G.rect_intersects_polygon(3.5, -1, 6, 5, CONCAVE)    # edge cross only


def test_bbox_and_centroid():
    assert G.polygon_bbox(CONCAVE) == (0.0, 0.0, 4.0, 4.0)
    cx, cy = G.polygon_centroid(SQUARE)
    assert abs(cx - 2.0) < 1e-12 and abs(cy - 2.0) < 1e-12


def test_haversine_known():
    # quarter circumference: equator to pole
    d = G.haversine_np([0.0], [0.0], [90.0], [0.0])[0]
    assert abs(d - np.pi / 2 * G.EARTH_RADIUS_M) < 1.0
    assert G.haversine_np([10.0], [20.0], [10.0], [20.0])[0] == 0.0


def test_bbox_from_str_valid():
    # mirrors bounding_box.rs:129-137 (test_from_str)
    assert G.bbox_from_str("-180.0, -90.0, 180.0, 90.0") == (
        -180.0, -90.0, 180.0, 90.0)
    # no whitespace, extra precision
    assert G.bbox_from_str("-170.1595029,-19.3548665,-169.5647229,-18.7534559") == (
        -170.1595029, -19.3548665, -169.5647229, -18.7534559)
    # round-trip through the Display form
    bb = (-1.5, -2.5, 3.5, 4.5)
    assert G.bbox_from_str(G.bbox_to_str(bb)) == bb


def test_bbox_from_str_invalid():
    import pytest
    # mirrors bounding_box.rs:139-144 (test_invalid_values)
    with pytest.raises(ValueError):
        G.bbox_from_str("-180.1, -90.0, 180.0, 90.0")
    with pytest.raises(ValueError):
        G.bbox_from_str("-180.0, -90.0, 180.0")      # <4 parts
    with pytest.raises(ValueError):
        G.bbox_from_str("a, b, c, d")                # non-numeric
    with pytest.raises(ValueError):
        G.bbox_from_str("0, -91.0, 10, 90.0")        # lat out of range
