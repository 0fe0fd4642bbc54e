"""Structured Streaming: watermark windows, stateful sessionization,
stream-static cell join — batch-cross-checked via availableNow drains."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_io_spark.streaming import events as SE

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stream"))
    (spark.read.parquet(f"{SF_DIR}/events.parquet")
     .repartition(4).write.mode("overwrite").parquet(d))
    return d


def test_windowed_counts_match_batch(spark, events_dir, tmp_path):
    stream = SE.stream_events(spark, events_dir)
    agg = SE.windowed_counts(stream, window="1 hour", watermark="30 minutes")
    SE.run_available_now_complete(agg, str(tmp_path / "ckpt"), "win_counts")
    got = spark.table("win_counts")

    batch = (spark.read.parquet(events_dir)
             .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
             .agg(F.count("*").alias("n")))
    assert got.count() == batch.count()
    assert got.agg(F.sum("n")).collect()[0][0] == \
        spark.read.parquet(events_dir).count()


def test_windowed_counts_incremental_files(spark, events_dir, tmp_path):
    """Drain twice with new files arriving in between: the checkpoint
    resumes offsets; counts accumulate without reprocessing."""
    import os
    import shutil
    d = str(tmp_path / "inc")
    os.makedirs(d)
    parts = sorted(p for p in os.listdir(events_dir) if p.startswith("part-"))
    shutil.copy(os.path.join(events_dir, parts[0]), d)

    stream = SE.stream_events(spark, d)
    agg = SE.windowed_counts(stream)
    ckpt = str(tmp_path / "ckpt")
    SE.run_available_now_complete(agg, ckpt, "inc_counts")
    n1 = spark.table("inc_counts").agg(F.sum("n")).collect()[0][0]

    for p in parts[1:]:
        shutil.copy(os.path.join(events_dir, p), d)
    stream2 = SE.stream_events(spark, d)
    SE.run_available_now_complete(SE.windowed_counts(stream2), ckpt, "inc_counts2")
    n2 = spark.table("inc_counts2").agg(F.sum("n")).collect()[0][0]
    total = spark.read.parquet(events_dir).count()
    assert n1 < n2 == total


def test_sessionize_stateful(spark, events_dir, tmp_path):
    stream = SE.stream_events(spark, events_dir)
    sessions = SE.sessionize(stream, gap="30 minutes", watermark="1 hour")
    SE.run_available_now(sessions, str(tmp_path / "ckpt"), "sessions")
    got = spark.table("sessions").toPandas()
    assert len(got) > 0
    assert (got["session_end"] >= got["session_start"]).all()
    assert (got["n_events"] >= 1).all()
    assert set(got["closed_by"]) <= {"gap", "timeout"}

    # oracle: single-node pandas sessionization over the same rows.
    # availableNow drains everything, so gap-closed sessions must match
    # the batch gap-split exactly for every user with >1 session.
    ev = spark.read.parquet(events_dir).select("user_id", "ts").toPandas()
    gap = pd.Timedelta(minutes=30)
    expected_gap_sessions = 0
    for _uid, grp in ev.groupby("user_id"):
        ts = grp["ts"].sort_values()
        expected_gap_sessions += int((ts.diff() > gap).sum())
    got_gap = (got["closed_by"] == "gap").sum()
    assert got_gap == expected_gap_sessions


def test_stream_static_cell_join(spark, events_dir, tmp_path):
    from osm_io_spark import queries as Q
    from osm_io_spark.operators import spatial_join as SJ

    # build side: rectangles centered on the derived geotags of a few
    # user_ids, so the stream is guaranteed to hit them
    uids = [r[0] for r in (spark.read.parquet(events_dir)
                           .select("user_id").distinct().limit(5).collect())]
    rects = spark.createDataFrame(
        [(int(u),
          (u * 2654435761 % 120000000) / 1e6 - 60.0,
          (u * 2971215073 % 360000000) / 1e6 - 180.0) for u in uids],
        "polygon_id long, clat double, clon double").selectExpr(
        "polygon_id", "clon - 0.5 as left", "clon + 0.5 as right",
        "clat - 0.5 as bottom", "clat + 0.5 as top")
    covers = SJ.cover_bbox_cells(rects, res=6).select("cell", "polygon_id")

    stream = SE.stream_events(spark, events_dir)
    joined = SE.stream_cell_enrich(stream, covers, res=6)
    SE.run_available_now(joined.select("event_id", "polygon_id", "cell"),
                         str(tmp_path / "ckpt"), "enriched")
    got = spark.table("enriched")

    batch = SE.stream_cell_enrich(spark.read.parquet(events_dir), covers, res=6)
    assert got.count() == batch.count() > 0


def test_stream_to_snapshot_sink_incremental(spark, events_dir, tmp_path):
    """foreachBatch → snapshot commits: each epoch is one atomic
    partition with lineage; changes() exposes incremental epochs; a
    second drain with new files appends without duplicating."""
    import os
    import shutil

    from osm_io_spark.plans.snapshots import SnapshotCatalog, changes

    src = str(tmp_path / "src")
    os.makedirs(src)
    parts = sorted(p for p in os.listdir(events_dir) if p.startswith("part-"))
    shutil.copy(os.path.join(events_dir, parts[0]), src)

    cat = SnapshotCatalog(str(tmp_path / "cat"))
    t = cat.table("events_ingest")
    from osm_io_spark.streaming.snapshot_sink import run_stream_to_snapshots
    ckpt = str(tmp_path / "ckpt")

    run_stream_to_snapshots(
        SE.stream_events(spark, src, max_files_per_trigger=1), t, ckpt,
        "ingest_events", stats_columns=["user_id"])
    v1 = t.current_version()
    n1 = t.read(spark).count()
    assert n1 > 0 and v1 >= 1
    snap = t.snapshot()
    first = sorted(snap.partitions)[0]
    assert snap.partitions[first]["lineage"]["mode"] == "streaming"
    assert "user_id" in snap.partitions[first]["column_stats"]

    # more files arrive; only the new epochs appear in changes()
    for p in parts[1:]:
        shutil.copy(os.path.join(events_dir, p), src)
    run_stream_to_snapshots(
        SE.stream_events(spark, src, max_files_per_trigger=1), t, ckpt,
        "ingest_events", stats_columns=["user_id"])
    total = spark.read.parquet(events_dir).count()
    assert t.read(spark).count() == total  # no duplicates across drains

    inc, changed = changes(t, spark, from_version=v1)
    assert changed  # new epochs exist
    assert inc.count() == total - n1


def test_stream_dedup_drops_duplicates(spark, tmp_path):
    """dedup_stream over a tripled source yields exactly the distinct
    (event_id, ts) set — batch equivalence of the streaming dedup."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "dup_src")
    (ev.unionByName(ev).unionByName(ev).repartition(5)
     .write.mode("overwrite").parquet(src))
    dd = SE.dedup_stream(SE.stream_events(spark, src))
    SE.run_available_now(dd, str(tmp_path / "ckpt"), "t_stream_dedup")
    got = spark.table("t_stream_dedup")
    want = ev.select("event_id", "ts").distinct()
    assert got.count() == want.count()
    assert got.groupBy("event_id", "ts").count().filter("count > 1").count() == 0


def test_stream_image_dedup_batch_equivalence(spark):
    """image_dedup_stream: a 3x re-upload feed (same pixels, different
    ids, same event time) drains to exactly the batch-computed distinct
    (phash, ts) set — decode + phash happen inside the streaming plan."""
    from pyspark.sql import functions as F

    from osm_io_spark import queries as Q
    from osm_io_spark.operators import multimodal as MM
    from osm_io_spark.sources import synth as SY

    out = Q.q_stream_image_dedup(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0

    base = (SY.images_df(spark, 240, seed=42, partitions=8)
            .withColumn("ts_epoch", F.lit(1_700_000_000)
                        + F.pmod(F.xxhash64("image_id"), F.lit(86400))))
    stats = MM.decode_stats(base).select("image_id", "phash_calc")
    want = set(map(tuple, stats.join(base.select("image_id", "ts_epoch"),
                                     "image_id")
                   .select("phash_calc", "ts_epoch").distinct().collect()))
    got = set(map(tuple, out[["phash_calc", "ts_epoch"]].values))
    assert got == want
    # the 720-row feed really collapsed
    assert len(out) == len(want) <= 240
