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


def test_stream_static_s2_containment_join(spark, events_dir, tmp_path):
    """Round 5: the same stream-static shape on the TRUE S2 index —
    stateless leaf encode inside the stream, hierarchical containment
    join vs a static mixed-level cap cover; batch-equivalent."""
    import numpy as np

    from osm_io_spark.functions import s2 as S2

    # cap centered on one user's derived geotag → guaranteed hits
    u = spark.read.parquet(events_dir).select("user_id").first()[0]
    la = (u * 2654435761 % 120000000) / 1e6 - 60.0
    lo = (u * 2971215073 % 360000000) / 1e6 - 180.0
    cover = S2.s2_cover_cap_np(la, lo, 0.3, max_level=7, max_cells=64)
    covers = spark.createDataFrame(
        [(0, int(c)) for c in cover], "region_id int, cover_id long")

    stream = SE.stream_events(spark, events_dir)
    joined = SE.stream_s2_enrich(stream, covers)
    SE.run_available_now(joined.select("event_id", "s2_cell", "cover_id"),
                         str(tmp_path / "ckpt_s2"), "s2_enriched")
    got = spark.table("s2_enriched")

    batch = SE.stream_s2_enrich(spark.read.parquet(events_dir), covers)
    n_got, n_batch = got.count(), batch.count()
    assert n_got == n_batch > 0
    # every emitted leaf really is inside a cover range (exactness)
    leafs = np.array([r["s2_cell"] for r in got.collect()], np.int64)
    rn, rx = S2.s2_range_np(np.asarray(cover, np.int64))
    inside = np.zeros(len(leafs), bool)
    for a, b in zip(rn, rx):
        inside |= (leafs >= a) & (leafs <= b)
    assert inside.all()


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
    ids, DIFFERENT event times — +7s/+31s) drains to exactly the
    batch-computed distinct phash set — content-keyed
    dropDuplicatesWithinWatermark; decode + phash happen inside the
    streaming plan. The shifted timestamps are the point: the earlier
    (phash, ts)-keyed shape only collapsed same-second re-uploads."""
    from osm_io_spark import queries as Q
    from osm_io_spark.operators import multimodal as MM
    from osm_io_spark.sources import synth as SY

    out = Q.q_stream_image_dedup(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0

    base = SY.images_df(spark, 240, seed=42, partitions=8)
    want = {r[0] for r in (MM.decode_stats(base)
                           .select("phash_calc").distinct().collect())}
    got = set(out["phash_calc"])
    assert got == want
    # the 720-row feed really collapsed despite the ts shifts
    assert len(out) == len(want) <= 240


def test_stream_dedup_checkpoint_resume_exactly_once(spark, tmp_path):
    """Kill-and-resume: drain the time-ordered first half of the feed,
    then resume from the SAME checkpoint after the second half arrives
    — including re-uploads of drain-1 rows that are still INSIDE the
    watermark (a time-ordered split matters: the drain-1 watermark
    drops older rows as late, which would mask the dedup). The restored
    state store must swallow every in-watermark re-upload — union of
    both drains is exactly the distinct set, no key emitted twice
    (exactly-once output across the restart)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    t_mid = ev.agg(
        F.expr("percentile_approx(ts, 0.5)")).collect()[0][0]
    half1 = ev.filter(F.col("ts") <= F.lit(t_mid))
    half2 = ev.filter(F.col("ts") > F.lit(t_mid))
    # drain-1 rows a resumed query MUST still dedup: newer than the
    # drain-1 watermark (max(half1.ts) - 1h), so not droppable as late
    dups = half1.filter(
        F.col("ts") > F.lit(t_mid) - F.expr("INTERVAL 30 MINUTES"))
    assert dups.count() > 0

    src = str(tmp_path / "src")
    half1.repartition(3).write.mode("overwrite").parquet(src)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    SE.run_available_now_to_path(
        SE.dedup_stream(SE.stream_events(spark, src)), ckpt, out)
    got1 = spark.read.parquet(out).toPandas()
    assert len(got1) > 0

    # "crash": the first query object is gone; the rest of the feed
    # (plus the in-watermark re-uploads) lands, and a NEW query resumes
    # from the same checkpoint + sink
    (half2.unionByName(dups).repartition(3)
     .write.mode("append").parquet(src))
    SE.run_available_now_to_path(
        SE.dedup_stream(SE.stream_events(spark, src)), ckpt, out)
    both = spark.read.parquet(out).toPandas()

    keys = list(map(tuple, both[["event_id", "ts"]].values))
    assert len(keys) == len(set(keys)), (
        "resumed drain re-emitted keys the checkpointed state had seen")
    want = ev.select("event_id", "ts").distinct().count()
    assert len(keys) == want and len(both) > len(got1)


def test_stream_image_dedup_checkpoint_resume_exactly_once(spark, tmp_path):
    """Kill-and-resume for the perceptual image dedup: drain the base
    uploads, then resume from the same checkpoint after time-shifted
    re-uploads of the SAME content arrive. The restored phash state
    must swallow all of them — zero new rows, union still the distinct
    phash set."""
    from pyspark.sql import functions as F

    from osm_io_spark.sources import synth as SY

    base = (SY.images_df(spark, 240, seed=42, partitions=4)
            .withColumn("ts", F.timestamp_seconds(
                F.lit(1_700_000_000)
                + F.pmod(F.xxhash64("image_id"), F.lit(3600)))))
    src = str(tmp_path / "img_src")
    base.write.mode("overwrite").parquet(src)

    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    SE.run_available_now_to_path(
        SE.image_dedup_stream(SE.stream_images(spark, src)), ckpt, out)
    got1 = spark.read.parquet(out).toPandas()
    n_distinct = len(set(got1["phash_calc"]))
    assert len(got1) == n_distinct > 0

    (base.withColumn("image_id", F.concat("image_id", F.lit("-re")))
     .withColumn("ts", F.col("ts") + F.expr("INTERVAL 45 SECONDS"))
     .write.mode("append").parquet(src))
    SE.run_available_now_to_path(
        SE.image_dedup_stream(SE.stream_images(spark, src)), ckpt, out)
    both = spark.read.parquet(out).toPandas()
    assert len(both) == len(got1), (
        f"resumed drain re-emitted {len(both) - len(got1)} phashes for "
        "re-uploaded content the checkpointed state had already seen")
    assert set(both["phash_calc"]) == set(got1["phash_calc"])
