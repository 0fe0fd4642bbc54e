"""Replication diff application (operators/replication.py): OsmChange
semantics — create/modify/delete keyed by (type, id, version), delete =
visible=false (the reference's history model, current_object.rs:18-31,
replication state in file_info.rs:11-13).

Hand cases pin every precedence rule the synthetic TPC-H derivation
exercises statistically; the snapshot round-trip proves the diff chain
is resumable (apply → commit epoch → time travel back).
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from osm_io_spark.operators import replication as REPL

SCHEMA = ("etype string, id long, version int, visible boolean, "
          "payload string")


def _els(spark, rows, n_parts=5):
    df = spark.createDataFrame(
        [Row(etype=e, id=i, version=v, visible=vis, payload=p)
         for (e, i, v, vis, p) in rows], schema=SCHEMA)
    return df.repartition(n_parts, "id")


BASE = [
    ("node", 1, 1, True, "a"),    # modified by the diff
    ("node", 2, 2, True, "b"),    # deleted by the diff
    ("node", 3, 1, True, "c"),    # untouched
    ("node", 4, 3, True, "d"),    # diff re-states version 3 -> diff wins
    ("way", 1, 1, True, "w"),     # same numeric id, other type namespace
]

DIFF = [
    ("node", 1, 2, True, "a2"),
    ("node", 2, 3, False, "b-del"),
    ("node", 4, 3, True, "d-restated"),
    ("node", 5, 1, True, "e-created"),
    ("node", 6, 1, False, "f-created-then-deleted"),
    ("node", 6, 2, False, "f-still-deleted"),
]


def test_apply_diff_precedence(spark):
    out = {(r.etype, r.id): r for r in REPL.apply_diff(
        _els(spark, BASE), _els(spark, DIFF)).collect()}
    assert out[("node", 1)].version == 2
    assert out[("node", 1)].payload == "a2"
    assert ("node", 2) not in out                      # deleted
    assert out[("node", 3)].payload == "c"             # untouched
    assert out[("node", 4)].payload == "d-restated"    # diff wins the tie
    assert out[("node", 5)].payload == "e-created"
    assert ("node", 6) not in out                      # born deleted
    assert out[("way", 1)].payload == "w"              # type namespace held


def test_apply_diff_keep_invisible_history(spark):
    out = {(r.etype, r.id): r for r in REPL.apply_diff(
        _els(spark, BASE), _els(spark, DIFF), keep_invisible=True).collect()}
    assert out[("node", 2)].visible is False
    assert out[("node", 2)].payload == "b-del"
    assert out[("node", 6)].version == 2


def test_diff_stats_classification(spark):
    got = {(r.etype, r.action): r.n for r in REPL.diff_stats(
        _els(spark, BASE), _els(spark, DIFF)).collect()}
    assert got == {("node", "modified"): 2,   # ids 1 and 4
                   ("node", "deleted"): 1,    # id 2
                   ("node", "created"): 1,    # id 5
                   ("node", "deleted_unknown"): 1}  # id 6


def test_advance_replication_state():
    st = REPL.advance_replication_state(41, 1700000000, 6)
    assert st["osmosis_replication_sequence_number"] == 42
    assert st["osmosis_replication_timestamp"] == 1700000000
    assert st["n_changes_applied"] == 6


def test_diff_chain_through_snapshot_epochs(spark, tmp_path):
    """The resumable path: base snapshot (epoch 1, replication seq 41)
    → apply the diff → commit epoch 2 carrying the advanced osmosis
    state in the lineage → time travel reproduces the pre-diff view."""
    from osm_io_spark.plans.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path), "planet")
    e1 = t.write_partition(_els(spark, BASE), "full",
                           lineage=REPL.advance_replication_state(
                               40, 1600000000, len(BASE)))
    t.commit_partitions([e1], operation="ingest")

    base = t.read(spark)
    applied = REPL.apply_diff(base, _els(spark, DIFF))
    st = REPL.advance_replication_state(41, 1700000000,
                                        len(DIFF))
    e2 = t.write_partition(applied, "full", lineage=st)
    t.commit_partitions([e2], operation="apply_diff", replace=True)

    now = {(r.etype, r.id) for r in t.read(spark).collect()}
    assert ("node", 5) in now and ("node", 2) not in now
    then = {(r.etype, r.id) for r in t.read(spark, version=1).collect()}
    assert ("node", 2) in then and ("node", 5) not in then
    snap = t.snapshot()
    lin = list(snap.partitions.values())[0]["lineage"]
    assert lin["osmosis_replication_sequence_number"] == 42


def test_apply_diff_plan_has_no_global_sort(spark):
    """Scale audit: the latest-version window hash-partitions on the
    element key — no single-task global window, no cartesian."""
    plan = (REPL.apply_diff(_els(spark, BASE), _els(spark, DIFF))
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    # a global window would show an Exchange SinglePartition
    assert "SinglePartition" not in plan
