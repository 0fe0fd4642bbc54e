"""Geometry assembly: ways + nodes → polylines/rings, relations →
multipolygons (SURVEY.md J2/J3/A4 re-expressed as DataFrame joins).

The reference reassembles ways by joining way_nodes (ordered by
sequence_id) against node coordinates via streaming merge joins
(way_relations_reader.rs:69-160). Spark-first: posexplode preserves ref
order as a position column, an equi-join fetches coordinates, and
sort_array(collect_list(struct(pos, …))) restores order — Catalyst
picks SMJ/shuffle-hash as appropriate.

Multipolygon semantics (documented minimal subset, FIXTURES.md §4):
relation members of type Way with roles outer/inner, each member way a
closed ring; ring 0..k outer rings first (member order preserved), then
inner rings. Containment uses the even-odd rule, so inner rings punch
holes without explicit nesting analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .current import current_view


def way_lines(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """(id, version, tags, ring, left, bottom, right, top) for every way;
    ``ring`` is the ordered array<struct<lon,lat>> of its node coords.
    Ways referencing missing nodes are dropped (inner join), matching
    the apidb FK expectation."""
    w = ways.select("id", "version", "tags",
                    F.posexplode("refs").alias("pos", "ref"))
    n = nodes.select(F.col("id").alias("ref"), "lat", "lon")
    j = w.join(n, "ref")
    pts = F.array_sort(F.collect_list(F.struct("pos", "lon", "lat")))
    return (j.groupBy("id", "version")
            .agg(F.first("tags").alias("tags"),
                 pts.alias("_pts"),
                 F.count("*").alias("_n"),
                 F.min("lon").alias("left"), F.min("lat").alias("bottom"),
                 F.max("lon").alias("right"), F.max("lat").alias("top"))
            .withColumn("ring", F.transform(
                F.col("_pts"),
                lambda p: F.struct(p["lon"].alias("lon"), p["lat"].alias("lat"))))
            .drop("_pts"))


def way_polygons(ways: DataFrame, nodes: DataFrame,
                 require_closed: bool = True) -> DataFrame:
    """Closed ways → single-ring polygons (schemas.POLYGONS shape)."""
    lines = way_lines(ways, nodes)
    if require_closed:
        closed = (F.element_at("refs", 1) == F.element_at("refs", -1)) & \
                 (F.size("refs") >= 4)
        ids = ways.filter(closed).select("id", "version")
        lines = lines.join(ids, ["id", "version"], "left_semi")
    return lines.select(
        F.col("id").alias("polygon_id"), F.lit("way").alias("source"),
        F.array("ring").alias("rings"),
        "left", "bottom", "right", "top", "tags")


def relation_polygons(relations: DataFrame, ways: DataFrame,
                      nodes: DataFrame) -> DataFrame:
    """type=multipolygon relations → multi-ring polygons. Outer member
    rings first (member order preserved), then inner rings."""
    is_mp = F.exists("tags", lambda t: (t["k"] == F.lit("type"))
                     & (t["v"] == F.lit("multipolygon")))
    mem = (relations.filter(is_mp)
           .select(F.col("id").alias("rel_id"), F.col("tags").alias("rel_tags"),
                   F.posexplode("members").alias("mpos", "m"))
           .filter((F.col("m.type") == "Way")
                   & F.col("m.role").isin("outer", "inner"))
           .select("rel_id", "rel_tags", "mpos",
                   F.col("m.id").alias("id"), F.col("m.role").alias("role")))
    rings = way_lines(ways, nodes).select("id", "ring", "left", "bottom",
                                          "right", "top")
    j = mem.join(rings, "id")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(
            F.when(F.col("role") == "outer", 0).otherwise(1).alias("rk"),
            F.col("mpos").alias("mpos"), F.col("ring").alias("ring")))),
        lambda s: s["ring"])
    return (j.groupBy("rel_id")
            .agg(F.first("rel_tags").alias("tags"),
                 ordered.alias("rings"),
                 F.min("left").alias("left"), F.min("bottom").alias("bottom"),
                 F.max("right").alias("right"), F.max("top").alias("top"))
            .select(F.col("rel_id").alias("polygon_id"),
                    F.lit("relation").alias("source"),
                    "rings", "left", "bottom", "right", "top", "tags"))


def assemble_polygons(elements: DataFrame) -> DataFrame:
    """Unified PBF element frame → polygons table (ways ∪ relations).
    History-aware: only current (latest-version visible) elements
    participate (A5 before assembly)."""
    nodes = current_view(elements.filter(F.col("etype") == "node"))
    ways = current_view(elements.filter(F.col("etype") == "way"))
    rels = current_view(elements.filter(F.col("etype") == "relation"))
    wp = way_polygons(ways, nodes)
    rp = relation_polygons(rels, ways, nodes)
    # ways consumed by a multipolygon relation stay available standalone —
    # minimal semantics; OSM proper would suppress role-member ways with
    # no own tags. Documented subset.
    return wp.unionByName(rp)
