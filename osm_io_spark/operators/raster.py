"""Raster-tile ↔ vector assignment (SURVEY.md J10).

Every image footprint is a raster tile: the res-``res`` cell containing
its geotag. Assignment maps each image tile to every polygon whose bbox
intersects that tile's rectangle — a pure cell-prefix equi-join:

    probe:  image → its res-R cell (one row)
    build:  polygon bbox → covering res-R cells (exploded)
    join:   equi on cell

Intersection-with-tile IS cell-cover membership, so no residual
predicate is needed (unlike J7, which refines with exact containment).
Parent-tile rollups come free from cell arithmetic (cell >> 2k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import spatial_join as SJ


def raster_vector_assign(images: DataFrame, rect_polygons: DataFrame,
                         res: int) -> DataFrame:
    """(image cols + polygon cols + cell) for every image-tile × polygon
    bbox overlap."""
    probe = SJ.tag_probe_cells(images, res)
    build = SJ.cover_bbox_cells(rect_polygons, res)
    return SJ.cell_join(probe, build)
