"""Web-Mercator XYZ ("slippy map") tile math — numpy / Column / SQL.

The reference's tiling surface is the planar Morton tile of
/root/reference/src/osm/apidb_dump/sql.rs:50-61 (exposed here as
``functions.cells``); real map-tile delivery, however, is keyed by the
published OSM slippy-map scheme (zoom/x/y on the spherical-Mercator
projection).  This module adds that scheme as a first-class cell
family, with the repo's usual three bit-identical implementations:

- numpy kernels (``tile_xy_np``) for mapInPandas operators,
- pure-Column expressions (``tile_x_col`` / ``tile_y_col``) that stay
  inside whole-stage codegen for the hot encode path,
- SQL text (``tile_x_sql`` / ``tile_y_sql``) for the DuckDB oracles.

Published formula (OSM wiki, "Slippy map tilenames"):

    n = 2^zoom
    x = floor((lon + 180) / 360 * n)
    y = floor((1 - asinh(tan(lat_rad)) / pi) / 2 * n)

DuckDB has no ``asinh``, so all three implementations spell it as
``ln(tan(r) + 1/cos(r))`` — algebraically identical for the clamped
latitude domain (tan + sec > 0) and therefore the same double result
in IEEE arithmetic on every engine that computes ``tan``/``cos``/``ln``
to <1 ulp.  Latitudes are clamped to the Mercator singularity bound
±85.05112878° and outputs to [0, n-1] (poles land in the edge rows,
matching the published scheme's domain).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# Mercator latitude bound: atan(sinh(pi)) in degrees (published constant).
MAX_LAT = 85.05112878


def tile_xy_np(lat, lon, zoom: int):
    """(x, y) tile indices at ``zoom`` for arrays of degrees."""
    n = float(1 << zoom)
    la = np.clip(np.asarray(lat, np.float64), -MAX_LAT, MAX_LAT)
    lo = np.asarray(lon, np.float64)
    r = np.radians(la)
    x = np.floor((lo + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / math.pi)
                 / 2.0 * n).astype(np.int64)
    hi = np.int64((1 << zoom) - 1)
    return np.clip(x, 0, hi), np.clip(y, 0, hi)


def tile_bounds_np(x, y, zoom: int):
    """(left, bottom, right, top) degree bounds of tiles (y grows
    southward per the slippy scheme, so ``top`` comes from ``y`` and
    ``bottom`` from ``y + 1``)."""
    n = float(1 << zoom)
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    left = x / n * 360.0 - 180.0
    right = (x + 1.0) / n * 360.0 - 180.0

    def _lat(yy):
        return np.degrees(np.arctan(np.sinh(math.pi * (1.0 - 2.0 * yy / n))))

    top = _lat(y)
    bottom = _lat(y + 1.0)
    return left, bottom, right, top


def _clamp_col(v: Column, lo: float, hi: float) -> Column:
    return F.least(F.greatest(v, F.lit(lo)), F.lit(hi))


def tile_x_col(lon: Column, zoom: int) -> Column:
    n = float(1 << zoom)
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    return _clamp_col(raw, 0.0, float((1 << zoom) - 1)).cast("long")


def tile_y_col(lat: Column, zoom: int) -> Column:
    n = float(1 << zoom)
    r = F.radians(_clamp_col(lat, -MAX_LAT, MAX_LAT))
    merc = F.log(F.tan(r) + F.lit(1.0) / F.cos(r))
    raw = F.floor((F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0) * F.lit(n))
    return _clamp_col(raw, 0.0, float((1 << zoom) - 1)).cast("long")


def tile_x_sql(lon: str, zoom: int) -> str:
    n = float(1 << zoom)
    hi = float((1 << zoom) - 1)
    return (f"CAST(least(greatest(floor(({lon} + 180.0) / 360.0 * {n}), "
            f"0.0), {hi}) AS BIGINT)")


def tile_y_sql(lat: str, zoom: int) -> str:
    n = float(1 << zoom)
    hi = float((1 << zoom) - 1)
    r = f"radians(least(greatest({lat}, {-MAX_LAT}), {MAX_LAT}))"
    merc = f"ln(tan({r}) + 1.0 / cos({r}))"
    return (f"CAST(least(greatest(floor((1.0 - {merc} / pi()) / 2.0 * {n}), "
            f"0.0), {hi}) AS BIGINT)")


def tile_xc_col(lon: Column, zoom: int) -> Column:
    """CONTINUOUS tile x coordinate (double in [0, 2^zoom)) — floor is
    the tile index, fraction the in-tile position."""
    n = float(1 << zoom)
    raw = (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)
    return _clamp_col(raw, 0.0, math.nextafter(n, 0.0))


def tile_yc_col(lat: Column, zoom: int) -> Column:
    n = float(1 << zoom)
    r = F.radians(_clamp_col(lat, -MAX_LAT, MAX_LAT))
    merc = F.log(F.tan(r) + F.lit(1.0) / F.cos(r))
    raw = (F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0) * F.lit(n)
    return _clamp_col(raw, 0.0, math.nextafter(n, 0.0))


def tile_xc_sql(lon: str, zoom: int) -> str:
    """SQL twin of tile_xc_col — float repr round-trips, so the
    nextafter(n, 0) clamp bound parses to the same double in DuckDB."""
    n = float(1 << zoom)
    hi = repr(math.nextafter(n, 0.0))
    return (f"least(greatest(({lon} + 180.0) / 360.0 * {n}, 0.0), {hi})")


def tile_yc_sql(lat: str, zoom: int) -> str:
    n = float(1 << zoom)
    hi = repr(math.nextafter(n, 0.0))
    r = f"radians(least(greatest({lat}, {-MAX_LAT}), {MAX_LAT}))"
    merc = f"ln(tan({r}) + 1.0 / cos({r}))"
    return (f"least(greatest((1.0 - {merc} / pi()) / 2.0 * {n}, 0.0), {hi})")


# ---------------------------------------------------------------------------
# Bing quadkey addressing (published Bing Maps Tile System)
# ---------------------------------------------------------------------------
# The quadkey of tile (x, y, zoom) is the zoom-digit base-4 string whose
# i-th digit (MSB first) is 2*y_bit + x_bit at bit (zoom-1-i) — i.e. the
# base-4 representation of the y-major Morton interleave, zero-padded to
# ``zoom`` digits.  Quadkeys have the PREFIX property (a parent tile's
# key is its children's common prefix), which makes them the standard
# string key for tile stores: a region read is a key-prefix range scan,
# the string sibling of the S2 descendant-id range used by
# s2_read_region_pruned.  All three implementations are bit-identical;
# published golden vectors (tile (3,5)@3 = "213" etc.) are pinned in
# tests/test_tiles.py.


def quadkey_np(x, y, zoom: int) -> list[str]:
    """Quadkeys for tile-index arrays (driver/test-side helper)."""
    from .cells import morton_np
    m = morton_np(np.asarray(y, np.uint64), np.asarray(x, np.uint64))
    out = []
    for v in m:
        v = int(v)
        out.append("".join(str((v >> (2 * (zoom - 1 - i))) & 3)
                           for i in range(zoom)))
    return out


def quadkey_to_xyz_np(quadkeys) -> tuple[np.ndarray, np.ndarray, int]:
    """Inverse (test referee): (x, y, zoom) from same-length quadkeys."""
    zoom = len(quadkeys[0])
    x = np.zeros(len(quadkeys), np.int64)
    y = np.zeros(len(quadkeys), np.int64)
    for n, qk in enumerate(quadkeys):
        assert len(qk) == zoom
        for c in qk:
            d = ord(c) - 48
            x[n] = (x[n] << 1) | (d & 1)
            y[n] = (y[n] << 1) | (d >> 1)
    return x, y, zoom


def quadkey_col(x: Column, y: Column, zoom: int) -> Column:
    """Pure-Column quadkey: y-major Morton interleave (codegen bit
    math) rendered base-4 by ``conv`` and zero-padded — no UDF."""
    from .cells import morton_col
    m = morton_col(y, x)
    return F.lpad(F.conv(m.cast("string"), 10, 4), zoom, "0")


def quadkey_sql(x: str, y: str, zoom: int) -> str:
    """SQL twin — DuckDB spells base conversion ``to_base``."""
    from .cells import morton_sql
    return f"lpad(to_base({morton_sql(y, x)}, 4), {zoom}, '0')"
