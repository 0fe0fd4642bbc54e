"""Trajectory segmentation (movement analytics over geotagged event
streams) — the spatio-temporal sibling of batch sessionization
(queries.q_w2_sessionize_batch / streaming.events.sessionize).

A user's time-ordered event stream splits into TRIP SEGMENTS at every
point where consecutive events are either far apart in space
(``dist_sq > gap_deg²`` under the exact squared-euclidean-degree
metric shared with kNN/DBSCAN — pure IEEE ops, oracle-hash-stable) or
far apart in time (``Δepoch > max_dt_s``). This is distance-gap
segmentation: simpler than Li et al. stay-point detection (which
needs an anchored scan) but fully window-expressible, hence exactly
oracle-checkable — the same trade the repo's sessionize makes.

Plan shape: one window partitioned by user (lag + running sum — never
a global single-task window; skew = events-per-user, the same profile
w2 already carries) and one groupBy for the per-segment reduction.
All aggregates are exact (counts, epoch min/max, coordinate extrema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def trip_segments(events: DataFrame, gap_deg: float, max_dt_s: int,
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id", lat_col: str = "lat",
                  lon_col: str = "lon") -> DataFrame:
    """(user_id, seg_id, n_events, start_epoch, end_epoch, minlat,
    maxlat, minlon, maxlon) — seg_id is the running count of breaks
    within the user's (ts, id)-ordered stream, starting at 1."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    dlat = F.col(lat_col) - F.lag(lat_col).over(w)
    dlon = F.col(lon_col) - F.lag(lon_col).over(w)
    brk = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts))
           > max_dt_s)
        | (dlat * dlat + dlon * dlon > F.lit(gap_deg * gap_deg)),
        1).otherwise(0)
    seg = (events.withColumn("_brk", brk)
           .withColumn("seg_id", F.sum("_brk").over(w).cast("long")))
    return (seg.groupBy(user_col, "seg_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(F.unix_timestamp(ts_col)).alias("start_epoch"),
                 F.max(F.unix_timestamp(ts_col)).alias("end_epoch"),
                 F.min(lat_col).alias("minlat"),
                 F.max(lat_col).alias("maxlat"),
                 F.min(lon_col).alias("minlon"),
                 F.max(lon_col).alias("maxlon")))
