"""Trajectory segmentation (operators/trajectory.trip_segments) —
hand fixtures for the break semantics. Cross-engine hash parity for
the registry entry lives in tests/test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt

from osm_io_spark import queries as Q
from osm_io_spark.operators import trajectory as TJ


def _ev(uid, minute, eid, lat, lon):
    return (uid, dt.datetime(2024, 1, 1, 12, minute), eid,
            float(lat), float(lon))


SCHEMA = "user_id LONG, ts TIMESTAMP, event_id LONG, lat DOUBLE, lon DOUBLE"


def test_spatial_and_time_breaks(spark):
    rows = [
        _ev(1, 0, 1, 10.0, 10.0),
        _ev(1, 5, 2, 10.1, 10.0),    # near in space+time → same trip
        _ev(1, 10, 3, 15.0, 10.0),   # 4.9° hop → spatial break
        _ev(1, 50, 4, 15.0, 10.1),   # 40 min gap → time break
        _ev(2, 0, 9, -20.0, 30.0),   # other user → own first trip
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {(r["user_id"], r["seg_id"]): r.asDict()
           for r in TJ.trip_segments(df, gap_deg=1.0,
                                     max_dt_s=1800).collect()}
    assert set(got) == {(1, 1), (1, 2), (1, 3), (2, 1)}
    t1 = got[(1, 1)]
    assert t1["n_events"] == 2
    assert (t1["minlat"], t1["maxlat"]) == (10.0, 10.1)
    assert t1["end_epoch"] - t1["start_epoch"] == 300
    assert got[(1, 2)]["n_events"] == 1
    assert got[(1, 3)]["n_events"] == 1


def test_boundary_is_strictly_greater(spark):
    """dist == gap² exactly and Δt == max_dt exactly do NOT break
    (the predicate is strict >)."""
    rows = [
        _ev(1, 0, 1, 0.0, 0.0),
        _ev(1, 30, 2, 1.0, 0.0),  # dist² = 1 = gap², Δt = 1800 = max
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = TJ.trip_segments(df, gap_deg=1.0, max_dt_s=1800).collect()
    assert len(got) == 1 and got[0]["n_events"] == 2


def test_corpus_has_both_break_kinds(spark):
    """The synthetic geotag corpus must keep exercising both break
    predicates: more segments than time-only sessionization alone
    produces (camp hops add spatial breaks), and multi-event segments
    must exist."""
    trips = Q.q_trip_segments(spark, "/root/testdata/sf0.001").toPandas()
    sess = Q.q_w2_sessionize_batch(spark, "/root/testdata/sf0.001").toPandas()
    assert len(trips) > len(sess)
    assert (trips.n_events > 1).any()