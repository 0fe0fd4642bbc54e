"""Geodesic measures over assembled OSM geometry: way great-circle
length and spherical ring area — the ST_Length / ST_Area analytics of
the reference's domain, computed distributively.

The reference assembles ways/relations into geometry
(way_relations_reader.rs:69-160, relation.rs:3-49) but leaves measures
to downstream consumers; any engine replacing it for analytics needs
them. Both operators are pure whole-stage-codegen Column math (trig is
JVM ``sin``/``cos``/``atan2`` — no Python in the hot path) over the
same explode → join → window-lag plan:

- **Length**: haversine per consecutive node pair. One shuffle to the
  ``(way, pos)`` window (the node-coordinate join already shuffled by
  node id), then the ``groupBy(way)`` reuses the window's partitioning.
- **Area**: per-ring spherical excess by a Van Oosterom & Strackee
  (1983, "The solid angle of a plane triangle") signed-solid-angle fan
  from the ring's first vertex: for fan triangle (a, b, c) of unit
  vectors, Ω = 2·atan2(a·(b×c), 1 + a·b + b·c + c·a). Exact for
  great-circle-edged rings (the S2 path's edge model), sign-positive
  for CCW (interior-left) rings, robust for concave loops. Contract:
  each ring sub-hemisphere (the ``s2_cover_polygon_np`` contract);
  verified against an independent Girard angle-sum referee and the
  analytic octant golden in tests/test_measures.py.

Scale notes (100 TB): no driver-side geometry, no ragged-array Arrow
crossing (rings are exploded to a flat vertex table in Column space —
the CLAUDE.md nested-geometry rule), windows are keyed per way/ring
(millions of small partitions, never a single-task global window), and
every aggregate is a partial-agg groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geometry import EARTH_RADIUS_M


def haversine_m(lat1: Column, lon1: Column,
                lat2: Column, lon2: Column) -> Column:
    """Great-circle meters between two lat/lon points — the Column twin
    of functions/geometry.haversine_np (same formula, same radius)."""
    la1, lo1 = F.radians(lat1), F.radians(lon1)
    la2, lo2 = F.radians(lat2), F.radians(lon2)
    h = (F.pow(F.sin((la2 - la1) / 2), 2)
         + F.cos(la1) * F.cos(la2) * F.pow(F.sin((lo2 - lo1) / 2), 2))
    # fp noise can push h a hair past 1.0 for antipodal pairs
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(F.least(h, F.lit(1.0))))


def _xyz(lat: Column, lon: Column) -> tuple[Column, Column, Column]:
    la, lo = F.radians(lat), F.radians(lon)
    return (F.cos(la) * F.cos(lo), F.cos(la) * F.sin(lo), F.sin(la))


def way_lengths(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """(id, version, n_segments, length_m) per way: sum of haversine
    segment lengths along the ordered node refs. Ways referencing
    missing nodes drop those refs (inner join — the way_lines
    contract); a way with <2 resolved nodes has length 0."""
    w = ways.select("id", "version", F.posexplode("refs").alias("pos", "ref"))
    n = nodes.select(F.col("id").alias("ref"), "lat", "lon")
    j = w.join(n, "ref")
    win = Window.partitionBy("id", "version").orderBy("pos")
    seg = j.select(
        "id", "version",
        F.lag("lat").over(win).alias("plat"),
        F.lag("lon").over(win).alias("plon"),
        "lat", "lon")
    step = F.when(F.col("plat").isNull(), F.lit(0.0)).otherwise(
        haversine_m(F.col("plat"), F.col("plon"), F.col("lat"), F.col("lon")))
    return (seg.groupBy("id", "version")
            .agg(F.sum(F.when(F.col("plat").isNull(), 0).otherwise(1))
                 .alias("n_segments"),
                 F.sum(step).alias("length_m")))


def ring_areas(polygons: DataFrame) -> DataFrame:
    """(polygon_id, source, ring_idx, n_vertices, excess_sr, area_m2)
    per ring of a polygons table (schemas.POLYGONS shape:
    rings array<array<struct<lon,lat>>>).

    ``excess_sr`` is the SIGNED spherical excess (steradians, positive
    CCW / interior-left); ``area_m2`` its absolute area. Even-odd
    callers net holes as Σ|outer| − Σ|inner|. Duplicate closing
    vertices contribute zero-area fan triangles, so open and closed
    ring encodings agree. Noise floor: degenerate/repeated-vertex fans
    cancel to cross/dot float residue of order R²·eps ≈ 0.01 m², not
    exact zero."""
    v = (polygons
         .select("polygon_id", "source",
                 F.posexplode("rings").alias("ring_idx", "ring"))
         .select("polygon_id", "source", "ring_idx",
                 F.posexplode("ring").alias("pos", "pt")))
    cx, cy, cz = _xyz(F.col("pt.lat"), F.col("pt.lon"))
    v = v.select("polygon_id", "source", "ring_idx", "pos",
                 cx.alias("cx"), cy.alias("cy"), cz.alias("cz"))
    win = Window.partitionBy("polygon_id", "source", "ring_idx").orderBy("pos")
    v = v.select(
        "polygon_id", "source", "ring_idx",
        # fan anchor a = ring's first vertex (frame: unbounded..current)
        F.first("cx").over(win).alias("ax"),
        F.first("cy").over(win).alias("ay"),
        F.first("cz").over(win).alias("az"),
        F.lag("cx").over(win).alias("bx"),
        F.lag("cy").over(win).alias("by"),
        F.lag("cz").over(win).alias("bz"),
        "cx", "cy", "cz")
    a_dot_bxc = (F.col("ax") * (F.col("by") * F.col("cz")
                                - F.col("bz") * F.col("cy"))
                 + F.col("ay") * (F.col("bz") * F.col("cx")
                                  - F.col("bx") * F.col("cz"))
                 + F.col("az") * (F.col("bx") * F.col("cy")
                                  - F.col("by") * F.col("cx")))
    den = (F.lit(1.0)
           + F.col("ax") * F.col("bx") + F.col("ay") * F.col("by")
           + F.col("az") * F.col("bz")
           + F.col("bx") * F.col("cx") + F.col("by") * F.col("cy")
           + F.col("bz") * F.col("cz")
           + F.col("cx") * F.col("ax") + F.col("cy") * F.col("ay")
           + F.col("cz") * F.col("az"))
    # num == 0 ⇒ degenerate fan triangle (first/last edge, repeated or
    # antipodal-plane vertices): force 0 — atan2(0, den<0) would add π
    term = F.when(F.col("bx").isNull() | (a_dot_bxc == 0.0), F.lit(0.0)) \
        .otherwise(2 * F.atan2(a_dot_bxc, den))
    return (v.groupBy("polygon_id", "source", "ring_idx")
            .agg(F.count(F.lit(1)).alias("n_vertices"),
                 F.sum(term).alias("excess_sr"))
            .withColumn("area_m2",
                        F.abs(F.col("excess_sr"))
                        * F.lit(EARTH_RADIUS_M) * F.lit(EARTH_RADIUS_M)))


def ring_planar_centroids(polygons: DataFrame) -> DataFrame:
    """(polygon_id, source, ring_idx, n_vertices, area, cx, cy) per
    ring: planar shoelace area (signed, lon/lat degrees², CCW positive)
    and area-weighted centroid — the distributed Column twin of
    functions/geometry.polygon_centroid (same formula, same degenerate
    fallback to the vertex mean below |area| 1e-12). Pure arithmetic
    (no trig), so it is CROSS-ENGINE BIT-EXACT and SQL-oracle-able:
    the per-ring sums accumulate in vertex order (the window sort puts
    each ring's rows on one partition in ``pos`` order, so the partial
    aggregate adds terms pos-ascending — write the oracle's sums in
    the same order). Closing edge: the first row's missing lag pairs
    with the ring's LAST vertex, so every edge of the closed ring
    contributes exactly once whether or not the ring repeats its first
    vertex (a repeated endpoint adds one zero-cross edge; the
    degenerate vertex-mean fallback then averages the stored vertices
    verbatim, duplicate included — the numpy twin's convention)."""
    v = (polygons
         .select("polygon_id", "source",
                 F.posexplode("rings").alias("ring_idx", "ring"))
         .select("polygon_id", "source", "ring_idx",
                 F.posexplode("ring").alias("pos", "pt"))
         .select("polygon_id", "source", "ring_idx", "pos",
                 F.col("pt.lon").alias("x"), F.col("pt.lat").alias("y")))
    win = Window.partitionBy("polygon_id", "source", "ring_idx").orderBy("pos")
    wfull = win.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    px = F.coalesce(F.lag("x").over(win), F.last("x").over(wfull))
    py = F.coalesce(F.lag("y").over(win), F.last("y").over(wfull))
    cross = px * F.col("y") - F.col("x") * py
    g = (v.select("polygon_id", "source", "ring_idx", "x", "y",
                  cross.alias("_c"),
                  ((px + F.col("x")) * cross).alias("_cx"),
                  ((py + F.col("y")) * cross).alias("_cy"))
         .groupBy("polygon_id", "source", "ring_idx")
         .agg(F.count(F.lit(1)).alias("n_vertices"),
              F.sum("_c").alias("_s"),
              F.sum("_cx").alias("_sx"), F.sum("_cy").alias("_sy"),
              F.sum("x").alias("_mx"), F.sum("y").alias("_my")))
    area = F.col("_s") / 2
    degen = F.abs(area) < 1e-12
    return g.select(
        "polygon_id", "source", "ring_idx", "n_vertices",
        area.alias("area"),
        F.when(degen, F.col("_mx") / F.col("n_vertices"))
         .otherwise(F.col("_sx") / (6 * area)).alias("cx"),
        F.when(degen, F.col("_my") / F.col("n_vertices"))
         .otherwise(F.col("_sy") / (6 * area)).alias("cy"))
