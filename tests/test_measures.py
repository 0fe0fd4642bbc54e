"""Geodesic measures (operators/measures.py): way great-circle length
and spherical ring area.

Verification strategy (rows-only registry entry — trig is not
cross-engine bit-exact, the established pattern for the S2 family):
analytic goldens with closed forms (equator/meridian arcs, the octant
ring = πR²/2), an INDEPENDENT Girard angle-sum referee implemented
here with a different algorithm than the shipped Van Oosterom &
Strackee fan, and plan audits pinning the hot path to whole-stage
codegen Columns (no Python)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_io_spark import queries as Q
from osm_io_spark.functions.geometry import EARTH_RADIUS_M, haversine_np
from osm_io_spark.operators import measures as ME

R = EARTH_RADIUS_M


# --------------------------------------------------------------------
# independent referee: Girard interior-angle sum (different algorithm
# than the shipped solid-angle fan; calibrated on the octant golden)
# --------------------------------------------------------------------

def _xyz(lat, lon):
    la, lo = np.radians(lat), np.radians(lon)
    return np.array([np.cos(la) * np.cos(lo),
                     np.cos(la) * np.sin(lo),
                     np.sin(la)])


def girard_area_m2(lats, lons):
    """Signed spherical area via interior-angle sum (CCW positive)."""
    if (lats[0], lons[0]) == (lats[-1], lons[-1]):
        lats, lons = lats[:-1], lons[:-1]
    v = np.array([_xyz(la, lo) for la, lo in zip(lats, lons)])
    n = len(v)
    tot = 0.0
    for i in range(n):
        p_prev, p, p_next = v[(i - 1) % n], v[i], v[(i + 1) % n]
        t_prev = p_prev - p * np.dot(p, p_prev)
        t_next = p_next - p * np.dot(p, p_next)
        ang = np.arctan2(np.dot(p, np.cross(t_next, t_prev)),
                         np.dot(t_next, t_prev))
        if ang < 0:
            ang += 2 * np.pi
        tot += ang
    return (tot - (n - 2) * np.pi) * R * R


def _rings_df(spark, rings, pid=1, source="way"):
    rows = [(pid, source,
             [[{"lon": float(lo), "lat": float(la)} for lo, la in ring]
              for ring in rings])]
    return spark.createDataFrame(
        rows, "polygon_id long, source string, "
              "rings array<array<struct<lon:double,lat:double>>>")


def _areas(spark, rings, **kw):
    return {r["ring_idx"]: r for r in
            ME.ring_areas(_rings_df(spark, rings, **kw)).collect()}


# --------------------------------------------------------------------
# length
# --------------------------------------------------------------------

def test_haversine_column_matches_numpy(spark):
    rng = np.random.default_rng(7)
    la1, la2 = rng.uniform(-89, 89, 64), rng.uniform(-89, 89, 64)
    lo1, lo2 = rng.uniform(-180, 180, 64), rng.uniform(-180, 180, 64)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(d))
         for a, b, c, d in zip(la1, lo1, la2, lo2)],
        "la1 double, lo1 double, la2 double, lo2 double")
    got = np.array([r[0] for r in df.select(
        ME.haversine_m(F.col("la1"), F.col("lo1"),
                       F.col("la2"), F.col("lo2"))).collect()])
    want = haversine_np(la1, lo1, la2, lo2)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def _length_of(spark, refs, node_coords):
    ways = spark.createDataFrame([(1, 1, refs)],
                                 "id long, version int, refs array<long>")
    nodes = spark.createDataFrame(
        [(nid, float(la), float(lo)) for nid, la, lo in node_coords],
        "id long, lat double, lon double")
    row = ME.way_lengths(ways, nodes).collect()[0]
    return row["length_m"], row["n_segments"]


def test_way_length_analytic_arcs(spark):
    # quarter equator: (0,0) -> (0,90) = πR/2 (haversine exact here)
    lm, nseg = _length_of(spark, [1, 2], [(1, 0, 0), (2, 0, 90)])
    assert nseg == 1
    assert lm == pytest.approx(math.pi * R / 2, rel=1e-12)
    # meridian in two hops: (0,0) -> (45,0) -> (90,0) = πR/2 total
    lm, nseg = _length_of(spark, [1, 2, 3],
                          [(1, 0, 0), (2, 45, 0), (3, 90, 0)])
    assert nseg == 2
    assert lm == pytest.approx(math.pi * R / 2, rel=1e-12)


def test_way_length_missing_node_drops_ref(spark):
    # ref 99 unresolved: path contracts to 1 -> 3 (the way_lines
    # inner-join contract), NOT 0
    lm, nseg = _length_of(spark, [1, 99, 3], [(1, 0, 0), (3, 0, 10)])
    assert nseg == 1
    assert lm == pytest.approx(haversine_np([0], [0], [0], [10])[0],
                               rel=1e-12)
    # <2 resolved nodes ⇒ zero length, zero segments
    lm, nseg = _length_of(spark, [1, 99], [(1, 0, 0)])
    assert (lm, nseg) == (0.0, 0)


def test_way_length_matches_numpy_referee(spark):
    rng = np.random.default_rng(11)
    lats = rng.uniform(-60, 60, 12)
    lons = rng.uniform(-170, 170, 12)
    refs = list(range(1, 13))
    lm, nseg = _length_of(
        spark, refs, [(i + 1, lats[i], lons[i]) for i in range(12)])
    want = haversine_np(lats[:-1], lons[:-1], lats[1:], lons[1:]).sum()
    assert nseg == 11
    assert lm == pytest.approx(want, rel=1e-12)


# --------------------------------------------------------------------
# area
# --------------------------------------------------------------------

OCTANT = [(0.0, 0.0), (90.0, 0.0), (0.0, 90.0)]  # (lon, lat), CCW


def test_ring_area_octant_golden(spark):
    a = _areas(spark, [OCTANT])[0]
    assert a["n_vertices"] == 3
    assert a["excess_sr"] == pytest.approx(math.pi / 2, rel=1e-12)
    assert a["area_m2"] == pytest.approx(math.pi * R * R / 2, rel=1e-12)
    # reversed (CW) ring: same magnitude, negative excess
    b = _areas(spark, [OCTANT[::-1]])[0]
    assert b["excess_sr"] == pytest.approx(-math.pi / 2, rel=1e-12)
    assert b["area_m2"] == pytest.approx(a["area_m2"], rel=1e-12)


def test_ring_area_closed_equals_open(spark):
    ring = [(-78.0, 39.0), (-76.0, 39.0), (-76.0, 41.0), (-78.0, 41.0)]
    a = _areas(spark, [ring])[0]
    b = _areas(spark, [ring + [ring[0]]])[0]
    assert a["excess_sr"] == pytest.approx(b["excess_sr"], rel=1e-12)
    ref = girard_area_m2([la for _, la in ring], [lo for lo, _ in ring])
    assert a["area_m2"] == pytest.approx(ref, rel=1e-8)


def test_ring_area_concave_vs_girard_referee(spark):
    # the S2 test family's concave L (CCW)
    lats = [40.0, 40.0, 44.0, 44.0, 42.0, 42.0]
    lons = [-80.0, -74.0, -74.0, -77.0, -77.0, -80.0]
    a = _areas(spark, [list(zip(lons, lats))])[0]
    assert a["excess_sr"] > 0
    assert a["area_m2"] == pytest.approx(girard_area_m2(lats, lons),
                                         rel=1e-8)


def test_ring_area_random_simple_polygons_vs_referee(spark):
    rng = np.random.default_rng(23)
    for _ in range(6):
        cla = rng.uniform(-55, 55)
        clo = rng.uniform(-150, 150)
        n = int(rng.integers(4, 9))
        # star-shaped simple polygon: bearings must WRAP the center
        # (evenly spaced + bounded jitter — purely random sorted angles
        # can all fall in a half-plane, leaving the center outside and
        # the ring self-intersecting), in LOCALLY-SCALED coords (lon
        # compressed by cos(lat)) so the ring stays simple on the
        # sphere at high |lat|
        th = (2 * np.pi * (np.arange(n) + rng.uniform(0.05, 0.95, n))
              / n)
        rad = rng.uniform(0.5, 4.0, n)
        lats = cla + rad * np.sin(th)
        lons = clo + rad * np.cos(th) / np.cos(np.radians(cla))
        a = _areas(spark, [list(zip(map(float, lons),
                                    map(float, lats)))])[0]
        ref = girard_area_m2(list(lats), list(lons))
        assert ref > 0
        assert a["area_m2"] == pytest.approx(ref, rel=1e-8)


def test_ring_area_holes_net_even_odd(spark):
    outer = [(-80.0, 39.0), (-74.0, 39.0), (-74.0, 45.0), (-80.0, 45.0)]
    inner = [(-78.0, 41.0), (-78.0, 43.0), (-76.0, 43.0), (-76.0, 41.0)]  # CW
    rows = _areas(spark, [outer, inner])
    assert rows[0]["excess_sr"] > 0 > rows[1]["excess_sr"]
    net = rows[0]["area_m2"] - rows[1]["area_m2"]
    ref_out = girard_area_m2([la for _, la in outer],
                             [lo for lo, _ in outer])
    ref_in = girard_area_m2([la for _, la in inner[::-1]],
                            [lo for lo, _ in inner[::-1]])
    assert net == pytest.approx(ref_out - ref_in, rel=1e-8)


def test_ring_area_degenerate_rings_zero(spark):
    # fan triangles with a repeated vertex are mathematically zero but
    # leave cross/dot float residue of order R²·eps ≈ 0.01 m² — assert
    # the documented noise floor, not exact zero
    rows = _areas(spark, [[(10.0, 10.0)],
                          [(10.0, 10.0), (11.0, 10.0)],
                          [(10.0, 10.0), (11.0, 10.0), (10.0, 10.0)]])
    for r in rows.values():
        assert r["area_m2"] < 1e-2


# --------------------------------------------------------------------
# planar centroid
# --------------------------------------------------------------------

def _centroids(spark, rings, **kw):
    return {r["ring_idx"]: r for r in
            ME.ring_planar_centroids(_rings_df(spark, rings, **kw))
            .collect()}


def test_ring_centroid_matches_numpy_twin(spark):
    from osm_io_spark.functions.geometry import polygon_centroid
    rng = np.random.default_rng(31)
    for _ in range(5):
        n = int(rng.integers(3, 9))
        ring = [(float(lo), float(la))
                for lo, la in zip(rng.uniform(-10, 10, n),
                                  rng.uniform(-10, 10, n))]
        got = _centroids(spark, [ring])[0]
        want = polygon_centroid([ring])
        assert (got["cx"], got["cy"]) == pytest.approx(want, rel=1e-12)


def test_ring_centroid_square_and_orientation(spark):
    sq = [(2.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0)]
    a = _centroids(spark, [sq, sq[::-1]])
    assert a[0]["area"] == pytest.approx(4.0)
    assert a[1]["area"] == pytest.approx(-4.0)  # CW ⇒ negative
    for r in a.values():  # centroid invariant under orientation
        assert (r["cx"], r["cy"]) == pytest.approx((3.0, 1.0))


def test_ring_centroid_closed_dup_and_degenerate(spark):
    sq = [(2.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0)]
    a = _centroids(spark, [sq + [sq[0]]])[0]  # dup endpoint: same result
    assert a["area"] == pytest.approx(4.0)
    assert (a["cx"], a["cy"]) == pytest.approx((3.0, 1.0))
    # collinear ring ⇒ vertex-mean fallback (the numpy twin's contract)
    d = _centroids(spark, [[(0.0, 0.0), (1.0, 1.0), (2.0, 2.0)]])[0]
    assert d["area"] == 0.0
    assert (d["cx"], d["cy"]) == pytest.approx((1.0, 1.0))


def test_ring_centroid_oracle_parity_closed_form(spark, duck):
    """The registry entry's own check, run tight: general windowed
    operator vs the DuckDB triangle closed form, bit-exact."""
    import pandas as pd
    for t in ("part",):
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")
    got = (Q.q_ring_centroid(spark, "/root/testdata/sf0.001")
           .toPandas().sort_values("polygon_id").reset_index(drop=True))
    want = (duck.execute(Q.SQL_RING_CENTROID).df()
            .sort_values("polygon_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False, rtol=0, atol=0)


# --------------------------------------------------------------------
# plan + registry
# --------------------------------------------------------------------

def test_measures_plans_stay_jvm_side(spark):
    ways = spark.createDataFrame([(1, 1, [1, 2])],
                                 "id long, version int, refs array<long>")
    nodes = spark.createDataFrame([(1, 0.0, 0.0), (2, 0.0, 1.0)],
                                  "id long, lat double, lon double")
    for df in (ME.way_lengths(ways, nodes),
               ME.ring_areas(_rings_df(spark, [OCTANT]))):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan
        assert "Window" in plan  # per-way/ring lag, never a global sort


def test_registry_entry_runs(spark):
    rows = {r["kind"]: r
            for r in Q.q_osm_geodesic_stats(spark, "unused").collect()}
    assert set(rows) == {"way_length_m", "ring_area_m2"}
    for r in rows.values():
        assert r["n"] > 0 and r["sum_v"] > 0 and r["max_v"] > 0
    # the fixture's ways span city-scale extents — sanity bands
    assert rows["way_length_m"]["max_v"] < 2 * math.pi * R
