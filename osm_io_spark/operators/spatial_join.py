"""Spatial equi-join on cell ids + exact refinement (SURVEY.md J7/J8).

Plan shape (scale-first):
  build side:  polygons → covering cells (exploded)     [small vs probe]
  probe side:  images   → single cell id (JVM expression, codegen'd)
  join:        equi-join on ``cell`` — Catalyst broadcasts the build side
               when small; AQE handles moderate skew at runtime
  refine:      exact geometry predicate after the coarse cell match —
               JVM column comparisons for rectangles, vectorized numpy
               ray-casting (Arrow-batched) for general polygons
  skew:        explicit salting for hot cells (Zipf-distributed geodata;
               AQE alone is not sufficient at 10^12 rows) — see
               ``salted_cell_join``.

Because each probe row carries exactly ONE cell, a (probe, polygon) pair
can match in at most one cell → no post-join dedup shuffle is needed.

Reference precedent for the cell key: the Z-order tile of
/root/reference/src/osm/apidb_dump/sql.rs:50-61 (indexed in the apidb
schema, structure.sql:2629). The join itself is the reference's roadmap
item (README.md:44-45) realized Spark-first.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

import json

from .. import schemas
from ..functions import cells as C
from ..functions import geometry as G
from .util import widen

# The Arrow<->pandas bridge rejects ragged array<array<struct>> columns
# (numpy "inhomogeneous shape") when polygons have differing ring
# counts, so ring geometry crosses pandas-UDF boundaries as JSON and is
# restored JVM-side with from_json.
_RINGS_TYPE = schemas.POLYGONS["rings"].dataType


def _rings_to_np(rings_json: str):
    rings = json.loads(rings_json)
    import numpy as _np
    return [_np.array([(p["lon"], p["lat"]) for p in ring]) for ring in rings]


# ---------------------------------------------------------------------------
# covers
# ---------------------------------------------------------------------------

def tag_probe_cells(df: DataFrame, res: int,
                    lat: str = "lat", lon: str = "lon",
                    out: str = "cell") -> DataFrame:
    """Attach the single res-``res`` cell id to a point table (pure JVM)."""
    return df.withColumn(out, C.cell_at_col(F.col(lat), F.col(lon), res))


def cover_bbox_cells(df: DataFrame, res: int,
                     left: str = "left", bottom: str = "bottom",
                     right: str = "right", top: str = "top",
                     out: str = "cell") -> DataFrame:
    """Explode each bbox row into its covering res-``res`` cells.

    Pure Column expressions (sequence + explode + Morton interleave) —
    no Python in the loop, so the cover runs inside whole-stage codegen
    and scales with the build side.
    """
    n = 1 << res
    nf = F.lit(float(n))

    def grid(c: Column, offset: float, span: float) -> Column:
        v = F.floor((c + F.lit(offset)) / F.lit(span) * nf).cast("long")
        return F.greatest(F.lit(0), F.least(F.lit(n - 1), v))

    x0, x1 = grid(F.col(left), 180.0, 360.0), grid(F.col(right), 180.0, 360.0)
    y0, y1 = grid(F.col(bottom), 90.0, 180.0), grid(F.col(top), 90.0, 180.0)
    lead = F.lit(1 << (2 * res))
    return (df
            .withColumn("_x", F.explode(F.sequence(x0, x1)))
            .withColumn("_y", F.explode(F.sequence(y0, y1)))
            .withColumn(out, lead.bitwiseOR(C.morton_col(F.col("_x"), F.col("_y"))))
            .drop("_x", "_y"))


def cover_polygon_cells_json(polygons: DataFrame, res: int,
                             refine: bool = True,
                             out: str = "cell") -> DataFrame:
    """Explode general ring polygons (schemas.POLYGONS) into covering
    cells, rings carried as a JSON string column ``_rings_json``
    (serialized ONCE per polygon, before the cover explode — the Arrow
    bridge rejects ragged array<array<struct>> columns, and keeping the
    string form end-to-end avoids re-serializing per cover cell and per
    matched pair). Optional exact rect∩polygon refinement drops cover
    cells that don't actually touch the polygon (tighter cover →
    smaller join)."""
    jsonified = (widen(polygons)
                 .withColumn("_rings_json", F.to_json("rings"))
                 .drop("rings"))
    covered = cover_bbox_cells(jsonified, res, out=out)
    if not refine:
        return covered
    schema = covered.schema

    def _refine(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            keep = np.ones(len(pdf), bool)
            bounds = C.cell_bounds_np(pdf[out].to_numpy(), res)
            ring_cache: dict[str, list] = {}
            for i, (rj, cl, cb, cr, ct) in enumerate(
                    zip(pdf["_rings_json"], bounds[0], bounds[1],
                        bounds[2], bounds[3])):
                rr = ring_cache.get(rj)
                if rr is None:
                    rr = ring_cache[rj] = _rings_to_np(rj)
                keep[i] = G.rect_intersects_polygon(cl, cb, cr, ct, rr)
            yield pdf[keep]

    return covered.mapInPandas(_refine, schema=schema)


def cover_polygon_cells(polygons: DataFrame, res: int, refine: bool = True,
                        out: str = "cell") -> DataFrame:
    """Struct-rings façade over cover_polygon_cells_json."""
    c = cover_polygon_cells_json(polygons, res, refine=refine, out=out)
    return (c.withColumn("rings", F.from_json("_rings_json", _RINGS_TYPE))
            .drop("_rings_json"))


# ---------------------------------------------------------------------------
# refinement predicates
# ---------------------------------------------------------------------------

def refine_rect(df: DataFrame, lat: str = "lat", lon: str = "lon",
                strict: bool = True) -> DataFrame:
    """Exact point-in-rectangle (left/bottom/right/top columns) — JVM."""
    if strict:
        pred = ((F.col(lon) > F.col("left")) & (F.col(lon) < F.col("right"))
                & (F.col(lat) > F.col("bottom")) & (F.col(lat) < F.col("top")))
    else:
        pred = ((F.col(lon) >= F.col("left")) & (F.col(lon) <= F.col("right"))
                & (F.col(lat) >= F.col("bottom")) & (F.col(lat) <= F.col("top")))
    return df.filter(pred)


def refine_pip_json(df: DataFrame, lat: str = "lat",
                    lon: str = "lon") -> DataFrame:
    """Exact point-in-polygon over rows carrying ``_rings_json`` via the
    vectorized even-odd ray-cast kernel
    (osm_io_spark.functions.geometry.points_in_polygon), applied
    Arrow-batch-at-a-time grouped by polygon within each batch."""
    schema = df.schema

    def _pip(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            keep = np.zeros(len(pdf), bool)
            for _, idx in pdf.groupby("polygon_id").groups.items():
                idx = np.asarray(idx)
                rr = _rings_to_np(pdf["_rings_json"].iloc[idx[0]])
                keep[idx] = G.points_in_polygon(
                    pdf[lon].to_numpy()[idx], pdf[lat].to_numpy()[idx], rr)
            yield pdf[keep]

    return df.mapInPandas(_pip, schema=schema)


def refine_pip(df: DataFrame, lat: str = "lat", lon: str = "lon",
               rings_col: str = "rings") -> DataFrame:
    """Struct-rings façade over refine_pip_json."""
    jsonified = (df.withColumn("_rings_json", F.to_json(rings_col))
                 .drop(rings_col))
    refined = refine_pip_json(jsonified, lat=lat, lon=lon)
    return (refined.withColumn(rings_col, F.from_json("_rings_json", _RINGS_TYPE))
            .drop("_rings_json"))


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

def cell_join(probe: DataFrame, build_cells: DataFrame,
              cell: str = "cell", broadcast_build: bool | None = None) -> DataFrame:
    """Coarse equi-join on the cell id."""
    if broadcast_build is None:
        broadcast_build = True  # build side (polygon covers) ≪ probe side
    b = F.broadcast(build_cells) if broadcast_build else build_cells
    return probe.join(b, on=cell, how="inner")


def hot_cells(probe: DataFrame, cell: str = "cell",
              threshold_rows: int = 2_000_000, top_n: int = 1024) -> list[int]:
    """Cells whose probe-row count exceeds ``threshold_rows`` (Zipf heads).
    One cheap count aggregation; result is driver-side (bounded by top_n)."""
    rows = (probe.groupBy(cell).count()
            .filter(F.col("count") > threshold_rows)
            .orderBy(F.desc("count")).limit(top_n).collect())
    return [r[cell] for r in rows]


def salted_cell_join(probe: DataFrame, build_cells: DataFrame,
                     n_salt: int, hot: list[int],
                     cell: str = "cell", probe_key: str = "image_id") -> DataFrame:
    """Explicit skew handling: for hot cells, replicate build rows
    ``n_salt``× and scatter probe rows by ``pmod(hash(probe_key), n_salt)``
    so one Zipf-head cell fans across n_salt reducers; cold cells join
    plainly. Layered UNDER AQE skew-join (which splits at partition
    granularity but cannot split a single giant key without salting)."""
    if not hot or n_salt <= 1:
        return cell_join(probe, build_cells, cell=cell)
    # NO filter on the probe's cell column: a Filter predicate inlines
    # the (self-duplicating) Morton expression where whole-stage-codegen
    # CSE does not reach — measured 60x slower than evaluating the same
    # expression in a Project (119s vs 2s on a 20M-row probe). Hot and
    # cold cells are disjoint, so two unfiltered joins partition the
    # matches exactly: hot probe rows only match build_hot (on cell +
    # salt), cold rows only match build_cold (on cell).
    hot_vals = [int(h) for h in hot]

    probe_s = probe.withColumn(
        "_salt", F.pmod(F.hash(F.col(probe_key)), F.lit(n_salt)))
    build_hot = (build_cells.filter(F.col(cell).isin(hot_vals))
                 .withColumn("_salt", F.explode(
                     F.sequence(F.lit(0), F.lit(n_salt - 1)))))
    build_cold = build_cells.filter(~F.col(cell).isin(hot_vals))

    joined_hot = probe_s.join(build_hot, on=[cell, "_salt"],
                              how="inner").drop("_salt")
    joined_cold = probe.join(F.broadcast(build_cold), on=cell, how="inner")
    return joined_hot.unionByName(joined_cold)


def resolve_salt(probe: DataFrame, salt, hot: list[int] | None,
                 cell: str = "cell",
                 threshold_rows: int = 2_000_000,
                 max_salt: int = 64) -> tuple[int, list[int]]:
    """Resolve salt='auto' into (n_salt, hot_cells): measure the probe's
    per-cell counts once, salt only when a Zipf head actually exists,
    and size n_salt so the hottest cell splits into ~threshold-sized
    shards. Returns the inputs unchanged for explicit settings."""
    if salt != "auto":
        return (salt or 0), (hot or [])
    # filter BEFORE the bounded collect: only above-threshold cells come
    # back, so the hot set is never silently truncated by a top-N cap;
    # the 4097-row guard only trips if >4096 cells each exceed the
    # threshold, which is logged (and means the threshold is set far too
    # low for the corpus, not that cells were dropped silently)
    rows = (probe.groupBy(cell).count()
            .filter(F.col("count") > threshold_rows)
            .orderBy(F.desc("count")).limit(4097).collect())
    if len(rows) > 4096:
        import warnings
        warnings.warn(
            f"resolve_salt: >4096 cells exceed threshold_rows="
            f"{threshold_rows}; salting only the hottest 4096 "
            f"(raise the threshold)")
        rows = rows[:4096]
    hot_auto = [r[cell] for r in rows]
    if not hot_auto:
        return 0, []
    n_salt = min(max_salt, -(-max(r["count"] for r in rows) // threshold_rows))
    return max(2, n_salt), hot_auto


def spatial_join_rect(images: DataFrame, rects: DataFrame, res: int,
                      salt: int | str = 0,
                      hot: list[int] | None = None,
                      salt_threshold_rows: int = 2_000_000) -> DataFrame:
    """images(image-ish id, lat, lon) ⋈ rects(polygon_id, left, bottom,
    right, top) → matched rows with exact strict containment.
    ``salt='auto'`` measures per-cell probe counts and salts Zipf-head
    cells automatically (no-op when no cell exceeds the threshold)."""
    probe = tag_probe_cells(images, res)
    build = cover_bbox_cells(rects, res)
    salt, hot = resolve_salt(probe, salt, hot,
                             threshold_rows=salt_threshold_rows)
    if salt and hot:
        joined = salted_cell_join(probe, build, salt, hot)
    else:
        joined = cell_join(probe, build)
    return refine_rect(joined)


def spatial_join_polygons(images: DataFrame, polygons: DataFrame, res: int,
                          refine_cover: bool = True,
                          salt: int | str = 0,
                          hot: list[int] | None = None,
                          salt_threshold_rows: int = 2_000_000) -> DataFrame:
    """General-polygon spatial join: cell cover + numpy ray-cast refine.
    ``salt='auto'`` as in spatial_join_rect."""
    probe = tag_probe_cells(images, res)
    salt, hot = resolve_salt(probe, salt, hot,
                             threshold_rows=salt_threshold_rows)
    # rings stay in their JSON string form through cover → join → PIP:
    # one serialization per polygon total, instead of a struct→JSON→
    # struct round trip per cover cell and again per matched pair
    build = cover_polygon_cells_json(polygons, res, refine=refine_cover)
    if salt and hot:
        joined = salted_cell_join(probe, build, salt, hot)
    else:
        joined = cell_join(probe, build)
    refined = refine_pip_json(joined)
    return (refined.withColumn("rings", F.from_json("_rings_json", _RINGS_TYPE))
            .drop("_rings_json"))


def s2_containment_join(points: DataFrame, covers: DataFrame,
                        cell: str = "s2_cell", cover: str = "cover_id",
                        broadcast_covers: bool | str = "auto",
                        max_broadcast_rows: int = 4_000_000) -> DataFrame:
    """Hierarchical S2 containment join: every (point, cover) pair where
    the point's leaf cell is a descendant of the cover cell (covers may
    mix levels — a real S2 cell cover is a union of cells at different
    levels).

    Semantically this is the 1-D range join
    ``point.cell BETWEEN range_min(cover) AND range_max(cover)`` (the
    Hilbert prefix property; the DuckDB oracle runs exactly that), but a
    range predicate forces a nested-loop/IEJoin physical plan. Because a
    cover at level L contains a leaf iff the leaf's level-L ancestor
    EQUALS the cover id, the join decomposes into one hash equi-join per
    distinct cover level — at most 31 joins, each shuffle-partitioned on
    the ancestor key (salting-compatible, AQE-friendly), which is the
    shape that survives 10^12 probe rows. The distinct-level collect is
    bounded by 31 rows.

    ``broadcast_covers='auto'`` (default) broadcasts each per-level
    cover slice only when the WHOLE cover table holds at most
    ``max_broadcast_rows`` rows (counted once on the pinned
    checkpoint); larger covers degrade to a shuffled hash join per
    level instead of OOMing the driver (ADVICE r4).

    Skew: on the broadcast path the probe side never shuffles at all,
    so hot cells (one cover cell over a dense city at 10^12 images)
    cost nothing beyond their row count — no reducer ever owns a key.
    On the shuffled path the join keys are level-L ancestors whose
    fan-in is bounded by cover granularity, and AQE skew-join splits
    any oversized probe partition (inner join: build rows duplicate
    across splits), so no explicit salting layer is needed here —
    unlike the banded self-joins, where a single band key explodes
    quadratically (salted_self_band_join)."""
    from ..functions import s2 as S2
    # covers fans out: the level collect + one filtered branch per level
    # would re-execute its upstream plan each time (CLAUDE.md fan-out
    # rule) — pin it once
    covers = covers.localCheckpoint(eager=False)
    if broadcast_covers == "auto":
        broadcast_covers = covers.count() <= max_broadcast_rows
    lv = covers.select(S2.s2_level_col(F.col(cover)).alias("_lv")).distinct()
    levels = sorted(r["_lv"] for r in lv.collect())
    out = None
    for l in levels:
        cov_l = covers.filter(
            S2.s2_level_col(F.col(cover)) == F.lit(l))
        if broadcast_covers:
            cov_l = F.broadcast(cov_l)
        hit = points.join(
            cov_l, S2.s2_parent_col(F.col(cell), l) == F.col(cover), "inner")
        out = hit if out is None else out.unionByName(hit)
    if out is None:
        return points.limit(0).crossJoin(covers.limit(0))
    return out


def s2_distance_join(probe: DataFrame, sites: DataFrame, radius_m: float,
                     max_level: int = 10, max_cells: int = 64,
                     probe_id: str = "img_id", site_id: str = "site_id",
                     probe_lat: str = "lat", probe_lon: str = "lon",
                     site_lat: str = "slat", site_lon: str = "slon",
                     max_sites: int = 65536) -> DataFrame:
    """Spherical distance join (the ST_DWithin analogue) on the true S2
    index: every (site, probe) pair within ``radius_m`` great-circle
    meters. Completes the spatial-predicate family of the reference's
    spatial-index roadmap item (/root/reference/README.md:44-45)
    alongside containment (J7/J8, s2_containment_join), kNN (J9,
    knn.s2_knn_join) and tile assignment (J10).

    Plan (the cover+refine shape of J7/J8, on the sphere):

    * sites → driver-side spherical-cap covers
      (functions/s2.s2_cover_cap_np — COMPLETE: it never prunes an
      intersecting leaf, so no true match can be lost), one disjoint
      mixed-level cell set per site, unioned into a
      ``(site_id, cover_id)`` table of ≤ n_sites·max_cells rows;
    * probe → leaf S2 cell per row (with_s2_cell, pure codegen'd
      Columns), pinned ONCE with a lazy localCheckpoint — the
      containment join fans the encode out per distinct cover level
      (CLAUDE.md fan-out rule);
    * candidates → hierarchical containment join (one broadcast
      equi-join per distinct cover level; the probe side never
      shuffles on the broadcast path);
    * refine → exact ``haversine_m <= radius_m`` (codegen trig
      Columns, JVM-side).

    Each site's cap cover is a DISJOINT cell union and each probe row
    carries exactly one leaf cell, so a (site, probe) pair can match at
    most one cover cell — no post-join dedup shuffle.

    The site list is a driver-bounded QUERY PARAMETER (like the
    polygon covers of the other geo-joins): cover planning is
    driver-side numpy, so ``max_sites`` guards the driver memory and
    the broadcast. Past the budget this raises toward the symmetric
    alternatives (knn.s2_knn_join for nearest-site semantics, or a
    two-sided fixed-level cell-grid join) instead of silently building
    an oversized driver-side cover — the ngram ``method='auto'``
    router precedent.

    Returns the probe columns + ``site_id`` + ``dist_m``.
    """
    from ..functions import s2 as S2
    from .measures import haversine_m

    head = (sites.select(site_id, site_lat, site_lon)
            .dropDuplicates([site_id]))
    rows = head.take(max_sites + 1)
    if len(rows) > max_sites:
        raise ValueError(
            f"s2_distance_join: site table exceeds max_sites="
            f"{max_sites} — cover planning is driver-side; for "
            f"site tables past the budget use knn.s2_knn_join "
            f"(nearest-site) or a fixed-level two-sided cell join")
    radius_rad = float(radius_m) / G.EARTH_RADIUS_M
    cover_rows = [
        (r[site_id], int(c)) for r in rows
        for c in S2.s2_cover_cap_np(float(r[site_lat]), float(r[site_lon]),
                                    radius_rad, max_level=max_level,
                                    max_cells=max_cells)]
    spark = probe.sparkSession
    sid_dt = sites.schema[site_id].dataType.simpleString()
    covers = spark.createDataFrame(
        cover_rows, f"{site_id} {sid_dt}, cover_id long")
    x, y, z = S2.latlon_xyz_cols(F.col(probe_lat), F.col(probe_lon))
    pts = S2.with_s2_cell(
        probe, x, y, z).localCheckpoint(eager=False)
    cand = s2_containment_join(pts, covers, cell="s2_cell",
                               cover="cover_id")
    site_pos = F.broadcast(head)
    dist = haversine_m(F.col(probe_lat), F.col(probe_lon),
                       F.col(site_lat), F.col(site_lon))
    return (cand.join(site_pos, site_id)
            .withColumn("dist_m", dist)
            .filter(F.col("dist_m") <= F.lit(float(radius_m)))
            .drop("cover_id", "s2_cell", site_lat, site_lon))


def _poly_key_cols(polygons: DataFrame,
                   poly_cols: tuple[str, ...]) -> list[str]:
    """Identity columns actually present on the polygon frame —
    OSM polygon_id is unique only per source (way vs relation), so the
    default key is the pair."""
    return [c for c in poly_cols if c in polygons.columns]


def s2_read_region_pruned(table, spark, cover_cells,
                          cell_col: str = "s2_cell"):
    """Read ONLY the data of an S2 region from a cell-keyed snapshot
    table: manifest min/max skipping over the cover's descendant-id
    ranges (one manifest pass, SnapshotTable.read_pruned_multi), then
    the exact containment filter as one ``parent(cell).isin(...)``
    predicate per distinct cover level (hash-set lookups — never a
    256-branch BETWEEN chain, which would push the fused filter past
    the JIT's huge-method limit; see CLAUDE.md). This is the read-path
    payoff of the Hilbert id: 2-D locality == 1-D id locality, so a
    table range-partitioned by ``cell_col`` serves a city-sized region
    from a handful of files out of a 100 TB table — no filesystem
    listing, no full scan. Returns (DataFrame, kept partition names)."""
    import numpy as np

    from ..functions import s2 as S2
    cells = np.asarray(cover_cells, np.int64)
    rn, rx = S2.s2_range_np(cells)
    df, kept = table.read_pruned_multi(
        spark, cell_col, list(zip(rn.tolist(), rx.tolist())))
    if len(cells) == 0:
        # empty region ⇒ empty result (not df.filter(None) / TypeError)
        return df.filter(F.lit(False)), kept
    levels = S2.s2_level_np(cells)
    cond = None
    for lvl in sorted(set(levels.tolist())):
        ids = [int(c) for c, l in zip(cells, levels) if l == lvl]
        pred = S2.s2_parent_col(F.col(cell_col), int(lvl)).isin(ids)
        cond = pred if cond is None else (cond | pred)
    return df.filter(cond), kept


def s2_cover_polygons(polygons: DataFrame, max_level: int = 12,
                      max_cells: int = 64,
                      poly_cols: tuple[str, ...] = ("polygon_id", "source"),
                      ) -> DataFrame:
    """Distributed per-polygon S2 cover: (*poly_cols, cover_id) rows,
    one normalized mixed-level cover per polygon, computed as a numpy
    kernel in mapInPandas — cover planning scales with the POLYGON
    table (the planet has ~10^8 polygons; driver-side planning as in
    the synthetic-cap queries would not survive that), while each
    single cover stays a bounded ≤max_cells driver-free computation.
    Rings cross the Arrow boundary as JSON (ragged
    array<array<struct>> rule, see _RINGS_TYPE above); the cover is
    the normalized union over ALL rings (multipolygons may carry
    several outer rings; holes never make a cover incomplete —
    functions/s2.s2_cover_rings_np). The ≤max_cells budget is TOTAL
    across a polygon's rings (parent-lifting in s2_cover_rings_np),
    so per-polygon candidate fan-out stays capped even for a
    hundreds-of-rings coastline multipolygon."""
    from ..functions import s2 as S2
    keep = _poly_key_cols(polygons, poly_cols)
    src = polygons.select(*keep, F.to_json("rings").alias("_rings_json"))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in polygons.schema if f.name in keep) + ", cover_id long"

    def _cover(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            outs = []
            for k in range(len(pdf)):
                rings = json.loads(pdf["_rings_json"].iloc[k])
                rl = [(np.array([p["lat"] for p in ring], np.float64),
                       np.array([p["lon"] for p in ring], np.float64))
                      for ring in rings]
                cells = S2.s2_cover_rings_np(rl, max_level=max_level,
                                             max_cells=max_cells)
                rep = pdf.iloc[[k]][keep]
                rep = rep.loc[rep.index.repeat(len(cells))].reset_index(
                    drop=True)
                rep["cover_id"] = cells.astype(np.int64)
                outs.append(rep)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return src.mapInPandas(_cover, out_schema)


def s2_refine_rings(cand: DataFrame, px: str = "px", py: str = "py",
                    pz: str = "pz") -> DataFrame:
    """Exact even-odd winding refine over candidate rows carrying
    ``_rings_json`` + unit-vector point components: batched numpy
    kernel grouped by polygon within each Arrow batch (per CLAUDE.md,
    per-row trig chains never run as interpreted HOF Columns)."""
    from ..functions import s2 as S2
    schema = cand.schema

    def _refine(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf
                continue
            keep = np.zeros(len(pdf), bool)
            ring_cache: dict[str, list[np.ndarray]] = {}
            # group by the geometry itself: polygon_id alone is
            # ambiguous across way/relation sources
            for rj, idx in pdf.groupby("_rings_json").groups.items():
                idx = np.asarray(idx)
                rings = ring_cache.get(rj)
                if rings is None:
                    parsed = json.loads(rj)
                    rings = []
                    for ring in parsed:
                        la = np.array([p["lat"] for p in ring], np.float64)
                        lo = np.array([p["lon"] for p in ring], np.float64)
                        if len(la) > 1 and la[0] == la[-1] and lo[0] == lo[-1]:
                            la, lo = la[:-1], lo[:-1]
                        rings.append(np.stack(
                            S2._latlon_xyz_np(la, lo), axis=1))
                    ring_cache[rj] = rings
                keep[idx] = S2.point_in_spherical_rings_np(
                    pdf[px].to_numpy()[idx], pdf[py].to_numpy()[idx],
                    pdf[pz].to_numpy()[idx], rings)
            yield pdf[keep]

    return cand.mapInPandas(_refine, schema=schema)


def s2_spatial_join_polygons(images: DataFrame, polygons: DataFrame,
                             lat: str = "lat", lon: str = "lon",
                             max_level: int = 12, max_cells: int = 64,
                             broadcast_covers: bool | str = "auto",
                             broadcast_dim: bool | str = "auto",
                             max_broadcast_dim_rows: int = 500_000,
                             ) -> DataFrame:
    """The north-star spine on the SPHERE: OSM-assembled polygons ⋈
    image points on the true S2 index — the spherical sibling of
    :func:`spatial_join_polygons` (planar Morton path, J7/J8).

    Plan, stage by stage:
      images   → unit vector + leaf S2 cell (whole-stage-codegen Column
                 chain, functions/s2.with_s2_cell)
      polygons → mixed-level covers, DISTRIBUTED per polygon
                 (s2_cover_polygons, mapInPandas numpy kernel)
      join     → hierarchical containment: one hash equi-join per
                 distinct cover level, broadcast auto-gated on cover
                 size (s2_containment_join). Cover cells of one polygon
                 are disjoint (the descend emits a cell XOR its
                 children), so each (image, polygon) candidate appears
                 at most once — no post-join dedup shuffle.
      refine   → exact even-odd winding PIP incl. inner-ring holes
                 (s2_refine_rings, batched numpy), ring geometry joined
                 back as a dim so the cover explode never duplicates
                 ring JSON per cell. ``broadcast_dim='auto'`` (default)
                 broadcasts the rings dim only when the polygon table
                 is ≤ ``max_broadcast_dim_rows`` rows — the threshold
                 is deliberately lower than the cover gate because a
                 dim row carries full ring JSON (KBs, not a long). Past
                 the gate the dim joins as a shuffled hash join on the
                 polygon key (Catalyst may still broadcast if it fits
                 its byte threshold — size-aware, so safe).

    Returns matched rows: every image column, plus ``s2_cell`` (the
    per-image tile assignment) and the polygon identity columns
    (``polygon_id`` + ``source`` when present — OSM ids are unique
    only per element type)."""
    from ..functions import s2 as S2
    # polygons feeds two branches (covers + rings dim) — pin once
    # (CLAUDE.md fan-out rule)
    polygons = polygons.localCheckpoint(eager=False)
    keep = _poly_key_cols(polygons, ("polygon_id", "source"))
    covers = s2_cover_polygons(polygons, max_level=max_level,
                               max_cells=max_cells)
    clash = {"px", "py", "pz", "s2_cell"} & set(images.columns)
    if clash:
        raise ValueError(
            f"s2_spatial_join_polygons scratch/output columns collide "
            f"with image columns {sorted(clash)}; rename them first "
            f"(same guard as s2.with_s2_cell)")
    x, y, z = S2.latlon_xyz_cols(F.col(lat), F.col(lon))
    base = images.select("*", x.alias("px"), y.alias("py"), z.alias("pz"))
    pts = S2.with_s2_cell(base, F.col("px"), F.col("py"), F.col("pz"))
    cand = s2_containment_join(pts, covers,
                               broadcast_covers=broadcast_covers)
    dim = polygons.select(*keep, F.to_json("rings").alias("_rings_json"))
    if broadcast_dim == "auto":
        broadcast_dim = polygons.count() <= max_broadcast_dim_rows
    cand = cand.join(F.broadcast(dim) if broadcast_dim else dim, keep)
    refined = s2_refine_rings(cand)
    return refined.select(*images.columns, "s2_cell", *keep)


def s2_multires_rollup(df: DataFrame, levels, aggs,
                       cell: str = "s2_cell") -> DataFrame:
    """Cascaded multi-resolution aggregation on the S2 hierarchy — the
    spherical sibling of the planar ROLLUP (q_rollup_multires /
    raster.py parent-tile arithmetic), built the way a hypertable
    rollup has to be built at 10^12 leaf rows: the leaf table is
    aggregated ONCE (at ``levels[0]``, the finest), and every coarser
    level re-aggregates the PREVIOUS level's partial table via the
    parent bit-math (``s2_parent_col`` — mask + lsb, no geometry
    recompute). Each cascade step shrinks the input ~4^Δlevel, so the
    total work past the first groupBy is a vanishing fraction of the
    leaf pass — vs one-pass ROLLUP, which shuffles the full leaf table
    once per grouping set.

    ``levels``: strictly decreasing S2 levels, e.g. ``(10, 6, 4)``.
    ``aggs``: mapping ``alias -> (kind, col)`` with kind in
    ``count | sum | min | max`` (col ignored for count; may be a str or
    Column). Only re-aggregable kinds are accepted: count cascades as
    sum-of-counts, sum as sum-of-sums, min/max as themselves. Float
    sums are NOT cascade-exact (fp addition is non-associative) — pass
    an integral column/cast for ``sum`` when bit-exact parity matters
    (the registry oracle proves the cascade == direct-from-leaves on
    integer sums).

    Each level's partial fans out (output union + next cascade step) —
    pinned with a lazy localCheckpoint per the fan-out rule, which also
    caps the cascade's lineage depth.

    Returns ``(level int, cell long, *aliases)``, all levels unioned.
    """
    from ..functions import s2 as S2

    levels = list(levels)
    if len(levels) < 1 or len(set(levels)) != len(levels) or \
            levels != sorted(levels, reverse=True):
        raise ValueError("levels must be strictly decreasing S2 levels")
    from .util import cascade_aggs
    leaf_aggs, re_aggs = cascade_aggs(aggs)
    cur = (df.groupBy(S2.s2_parent_col(F.col(cell), levels[0])
                      .alias("cell"))
           .agg(*leaf_aggs)
           .select(F.lit(levels[0]).alias("level"), "*")
           .localCheckpoint(eager=False))
    out = cur
    for lv in levels[1:]:
        cur = (cur.groupBy(S2.s2_parent_col(F.col("cell"), lv)
                           .alias("cell"))
               .agg(*re_aggs)
               .select(F.lit(lv).alias("level"), "*")
               .localCheckpoint(eager=False))
        out = out.unionByName(cur)
    return out


def _cover_fanout_guard(df: DataFrame, res: int, left: str, bottom: str,
                        right: str, top: str, max_cells: int) -> DataFrame:
    """In-task scale guard for bbox cell covers: raises when one box
    would explode into more than ``max_cells`` res-``res`` cells (a
    world-spanning box at res 10 is ~10^6 rows). The raise_error is
    folded into a column the cover actually uses (the tiles.tile_cover
    pattern — a guard in a dropped column is pruned by Catalyst)."""
    n = 1 << res

    def g(c, off, span):
        v = F.floor((F.col(c) + F.lit(off)) / F.lit(span)
                    * F.lit(float(n))).cast("long")
        return F.greatest(F.lit(0), F.least(F.lit(n - 1), v))

    ncells = ((g(right, 180.0, 360.0) - g(left, 180.0, 360.0) + 1)
              * (g(top, 90.0, 180.0) - g(bottom, 90.0, 180.0) + 1))
    msg = F.concat(
        F.lit(f"overlap_join_rect: a box covers > {max_cells} cells at "
              f"res {res} (box: "),
        F.col(left).cast("string"), F.lit(".."),
        F.col(right).cast("string"),
        F.lit("); pre-split giant boxes or lower res / raise "
              "max_cells_per_box"))
    return df.withColumn(left, F.when(
        ncells <= F.lit(int(max_cells)), F.col(left)
    ).otherwise(F.raise_error(msg).cast("double")))


def overlap_join_rect(a: DataFrame, b: DataFrame, res: int,
                      a_id: str = "polygon_id",
                      b_id: str = "polygon_id",
                      max_cells_per_box: int | None = 4096) -> DataFrame:
    """Rectangle↔rectangle OVERLAP join — the conflation predicate
    (old vs new footprints, polygon sets from two sources) completing
    the planar family next to containment (J7/J8), kNN (J9) and
    raster assignment (J10).

    Scale shape: both sides explode into their res-``res`` covering
    cells (``cover_bbox_cells`` — pure Column, codegen) and meet in ONE
    hash equi-join on the cell id. A pair sharing k cells would emit k
    duplicates; instead of a post-join DISTINCT (a second full shuffle
    of the pair set), each pair is emitted ONLY by the cell containing
    its intersection's bottom-left corner ``(max(lefts), max(bottoms))``
    — that corner lies inside both rectangles, so its cell is in both
    covers, and it is unique per pair: duplicate-free output with ZERO
    additional shuffle (the reference-domain analogue of the classic
    partition-based spatial-merge ownership rule). Exact strict-overlap
    refine + the ownership filter run in the join's own stage.

    Returns (a_id, b_id, il, ib, ir, it, inter_area, iou) where the i*
    columns are the intersection bbox and ``iou`` the standard
    conflation score inter/(area_a + area_b - inter) — every float is
    greatest/least/±/× of identically-derived input edges, so the
    whole row stays cross-engine hash-stable."""
    pa = (a.select(F.col(a_id).alias("a_id"),
                   F.col("left").alias("al"), F.col("bottom").alias("ab"),
                   F.col("right").alias("ar"), F.col("top").alias("at")))
    pb = (b.select(F.col(b_id).alias("b_id"),
                   F.col("left").alias("bl"), F.col("bottom").alias("bb"),
                   F.col("right").alias("br"), F.col("top").alias("bt")))
    if max_cells_per_box is not None:
        pa = _cover_fanout_guard(pa, res, "al", "ab", "ar", "at",
                                 max_cells_per_box)
        pb = _cover_fanout_guard(pb, res, "bl", "bb", "br", "bt",
                                 max_cells_per_box)
    ca = cover_bbox_cells(pa, res, left="al", bottom="ab",
                          right="ar", top="at")
    cb = cover_bbox_cells(pb, res, left="bl", bottom="bb",
                          right="br", top="bt")
    j = ca.join(cb, on="cell", how="inner")
    overlap = ((F.col("al") < F.col("br")) & (F.col("bl") < F.col("ar"))
               & (F.col("ab") < F.col("bt")) & (F.col("bb") < F.col("at")))
    il = F.greatest(F.col("al"), F.col("bl"))
    ib = F.greatest(F.col("ab"), F.col("bb"))
    ir = F.least(F.col("ar"), F.col("br"))
    it = F.least(F.col("at"), F.col("bt"))
    own = F.col("cell") == C.cell_at_col(ib, il, res)
    inter = (ir - il) * (it - ib)
    area_a = (F.col("ar") - F.col("al")) * (F.col("at") - F.col("ab"))
    area_b = (F.col("br") - F.col("bl")) * (F.col("bt") - F.col("bb"))
    return (j.filter(overlap & own)
            .select("a_id", "b_id", il.alias("il"), ib.alias("ib"),
                    ir.alias("ir"), it.alias("it"),
                    inter.alias("inter_area"),
                    (inter / (area_a + area_b - inter)).alias("iou")))
