"""Planar geometry kernels (pure numpy — no shapely in this environment).

Convention: x = lon, y = lat. Polygons are lists of rings; ring 0 is the
outer ring, subsequent rings are holes; containment uses the even-odd rule
(ray casting), so holes need no special-casing. Rings may be closed
(first == last) or open — a closing edge is implied.

BoundingBox semantics mirror /root/reference/src/osm/model/bounding_box.rs:
merge_point / merge_bounding_box are min/max folds over (lon, lat).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_008.8


def _ring_edges(ring: np.ndarray):
    """ring: (m, 2) array of (lon, lat). Returns x1, y1, x2, y2 edge arrays
    (implied closing edge included; degenerate duplicate-closure edge is
    harmless for even-odd counting since it has zero y-span)."""
    r = np.asarray(ring, np.float64)
    x1, y1 = r[:, 0], r[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    return x1, y1, x2, y2


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings) -> np.ndarray:
    """Vectorized even-odd ray cast: (n,) bool for n points vs one polygon.

    Broadcasts points against all edges of all rings; memory is
    O(n_points * n_edges) per call — callers batch points (the spatial
    join applies this per (polygon, candidate-point-batch) group).
    """
    px = np.asarray(px, np.float64)[:, None]
    py = np.asarray(py, np.float64)[:, None]
    inside = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        if len(ring) < 3:
            continue
        x1, y1, x2, y2 = _ring_edges(ring)
        crosses = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        hits = crosses & (px < xint)
        inside ^= hits.sum(axis=1).astype(np.int64) % 2 == 1
    return inside


def _segments_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> bool:
    """Proper/improper segment intersection via orientation signs."""

    def orient(ox, oy, px_, py_, qx, qy):
        return np.sign((px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox))

    d1 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d2 = orient(bx1, by1, bx2, by2, ax2, ay2)
    d3 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    if d1 != d2 and d3 != d4:
        return True
    return False


def rect_intersects_polygon(left, bottom, right, top, rings) -> bool:
    """Does an axis-aligned rect intersect the polygon (edge or area)?
    Used to refine bbox cell covers into tight covers."""
    # polygon vertex inside rect
    for ring in rings:
        r = np.asarray(ring, np.float64)
        if ((r[:, 0] >= left) & (r[:, 0] <= right)
                & (r[:, 1] >= bottom) & (r[:, 1] <= top)).any():
            return True
    # rect corner inside polygon
    cx = np.array([left, right, right, left])
    cy = np.array([bottom, bottom, top, top])
    if points_in_polygon(cx, cy, rings).any():
        return True
    # edge crossings
    rect_edges = [
        (left, bottom, right, bottom),
        (right, bottom, right, top),
        (right, top, left, top),
        (left, top, left, bottom),
    ]
    for ring in rings:
        x1, y1, x2, y2 = _ring_edges(np.asarray(ring, np.float64))
        for (rx1, ry1, rx2, ry2) in rect_edges:
            for j in range(len(x1)):
                if _segments_intersect(x1[j], y1[j], x2[j], y2[j], rx1, ry1, rx2, ry2):
                    return True
    return False


WORLD_BBOX = (-180.0, -90.0, 180.0, 90.0)


def bbox_from_str(s: str) -> tuple[float, float, float, float]:
    """Parse 'left,bottom,right,top' (optional whitespace around commas)
    into a validated bbox tuple — C9, mirroring the FromStr impl at
    /root/reference/src/osm/model/bounding_box.rs:89-115 (range checks
    lon ∈ [-180,180], lat ∈ [-90,90]; <4 parts rejected; extra parts
    ignored, as there).

    Raises ValueError with the offending input on malformed or
    out-of-range values.
    """
    err = ValueError(
        "Bounding box string must be in the form 'left,bottom,right,top' "
        f"as in -180.0, -90.0, 180.0, 90.0 with optional white space "
        f"around commas. Got {s!r} instead")
    parts = [p.strip() for p in s.split(",")]
    if len(parts) < 4:
        raise err
    try:
        left, bottom, right, top = (float(p) for p in parts[:4])
    except ValueError:
        raise err from None
    if not (-180.0 <= left <= 180.0 and -90.0 <= bottom <= 90.0
            and -180.0 <= right <= 180.0 and -90.0 <= top <= 90.0):
        raise err
    return (left, bottom, right, top)


def bbox_to_str(bbox) -> str:
    """Inverse of bbox_from_str (Display impl, bounding_box.rs:83-87
    uses named fields; we emit the parsable comma form)."""
    left, bottom, right, top = bbox
    return f"{left}, {bottom}, {right}, {top}"


def polygon_bbox(rings) -> tuple[float, float, float, float]:
    """(left, bottom, right, top) — merge fold as in
    /root/reference/src/osm/model/bounding_box.rs:30-64."""
    pts = np.concatenate([np.asarray(r, np.float64) for r in rings], axis=0)
    return (float(pts[:, 0].min()), float(pts[:, 1].min()),
            float(pts[:, 0].max()), float(pts[:, 1].max()))


def polygon_centroid(rings) -> tuple[float, float]:
    """Area-weighted centroid of the outer ring (shoelace); falls back to
    vertex mean for degenerate area."""
    r = np.asarray(rings[0], np.float64)
    x, y = r[:, 0], r[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    cross = x * y2 - x2 * y
    a = cross.sum() / 2.0
    if abs(a) < 1e-12:
        return float(x.mean()), float(y.mean())
    cx = ((x + x2) * cross).sum() / (6.0 * a)
    cy = ((y + y2) * cross).sum() / (6.0 * a)
    return float(cx), float(cy)


def haversine_np(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters (vectorized)."""
    la1, lo1, la2, lo2 = (np.radians(np.asarray(a, np.float64))
                          for a in (lat1, lon1, lat2, lon2))
    dla, dlo = la2 - la1, lo2 - lo1
    h = np.sin(dla / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlo / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(h))
