"""Plan-shape regression tests: the scale contract lives in the plan.

Each check pins the physical strategy we designed for 100 TB: flagship
spatial joins must broadcast their polygon-cover side and leave the
probe path shuffle-free; dimension lookups must broadcast, never SMJ;
scans must stay column-pruned.
"""

from __future__ import annotations

import os

import pytest

from osm_io_spark import queries as Q
from osm_io_spark.plans import audit as A

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


def test_j7_flagship_no_probe_shuffle(spark):
    df = Q.q_j7_spatial_cell_join(spark, SF_DIR)
    rep = A.audit(df, max_shuffles=0, min_broadcast_joins=1,
                  forbid_sort_merge_join=True,
                  max_scan_cols={"lineitem.parquet": 2, "part.parquet": 1})
    assert rep["broadcast_joins"] == 1


def test_j10_raster_no_probe_shuffle(spark):
    df = Q.q_j10_raster_vector(spark, SF_DIR)
    A.audit(df, max_shuffles=0, min_broadcast_joins=1,
            forbid_sort_merge_join=True)


def test_j4_dims_broadcast_not_smj(spark):
    df = Q.q_j4_broadcast_lookup(spark, SF_DIR)
    # final aggregation is the only legal shuffle
    A.audit(df, max_shuffles=1, min_broadcast_joins=2,
            forbid_sort_merge_join=True)


def test_entry_flagship_scan_pruned(spark):
    df = Q.q_entry_flagship(spark, SF_DIR)
    rep = A.audit(df, max_shuffles=0, min_broadcast_joins=1,
                  max_scan_cols={"lineitem.parquet": 2})
    # build side reads only the part key (geometry is derived)
    part_scans = [s for s in rep["scans"] if s["location"] == "part.parquet"]
    assert part_scans and all(s["n_cols"] == 1 for s in part_scans)


def test_f1_filter_pushdown_reaches_scan(spark):
    df = Q.q_f1_token_filter(spark, SF_DIR)
    rep = A.audit(df, max_shuffles=0)
    doc = [s for s in rep["scans"] if s["location"] == "documents.parquet"]
    assert doc and doc[0]["n_cols"] == 3  # doc_id, text, n_chars only


def test_a2_partial_agg_single_reduce(spark):
    df = Q.q_a2_bounding_box(spark, SF_DIR)
    rep = A.audit(df, max_shuffles=1)  # partial agg → single final exchange
    assert rep["sort_merge_joins"] == 0


def test_text_vocab_topk_is_bounded(spark):
    """Round-2 fix: vocabulary top-k must plan as TakeOrderedAndProject
    (per-partition heap, driver merge of k rows), and any rank Window
    must sit ABOVE the limit (bounded input) — never over the full
    corpus vocabulary."""
    df = Q.q_text_vocab(spark, SF_DIR)
    plan = A.formatted_plan(df)
    tree = A.operator_tree(plan)
    assert A.count_op(plan, "TakeOrderedAndProject") == 1, tree
    # the single shuffle is the token-count aggregation
    A.audit(df, max_shuffles=1)
    # the Window (rank) must consume the TakeOrderedAndProject output:
    # in the operator tree, Window's child is the bounded top-k
    lines = tree.splitlines()
    widx = [i for i, l in enumerate(lines) if "Window" in l]
    assert widx and "TakeOrderedAndProject" in lines[widx[0] + 1], tree


def test_o2_global_order_no_global_window(spark):
    """Round-2 fix: the global-position contract must not use a
    single-partition Window — offsets + per-partition arange only."""
    df = Q.q_o2_global_order(spark, SF_DIR)
    plan = A.formatted_plan(df)
    assert A.count_op(plan, "Window") == 0, A.operator_tree(plan)
    assert A.count_op(plan, "MapInPandas") == 1


def test_o2_positions_are_dense_and_ordered(spark):
    """pos must be exactly 1..n in (event_type, event_id) order even
    when the source arrives as many partitions (multi-block path —
    small-sf parity alone cannot see cross-partition offset bugs)."""
    from osm_io_spark.operators.order import with_global_position
    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .select("event_id", "event_type").repartition(13))
    got = with_global_position(ev, ["event_type", "event_id"], "pos").toPandas()
    got = got.sort_values("pos").reset_index(drop=True)
    assert list(got["pos"]) == list(range(1, len(got) + 1))
    want = got.sort_values(["event_type", "event_id"]).reset_index(drop=True)
    assert (got["event_id"] == want["event_id"]).all()


def test_dedup_band_joins_never_cartesian(spark):
    """The minhash and hamming candidate generators must always be
    bucketed equi-joins — a lost join key would silently degrade to a
    10^24-pair cross join at corpus scale."""
    for name in ["dedup_minhash_lsh", "dedup_phash_hamming",
                 "dedup_ngram_jaccard",
                 # image-modality candidate generators (round 3): the
                 # phash band join inside image_curation and the IVF
                 # centroid equi-join inside mm_embed_near_dup must
                 # obey the same rule (the IVF build's bounded centroid
                 # broadcasts run at construction, not in this plan)
                 "image_curation", "mm_embed_near_dup"]:
        df = Q.QUERIES[name](spark, SF_DIR)
        plan = A.formatted_plan(df)
        assert A.count_op(plan, "CartesianProduct") == 0, name
        assert A.count_op(plan, "BroadcastNestedLoopJoin") == 0, name


def test_bucketed_join_is_zero_exchange(spark, tmp_path):
    """Both sides bucketed+sorted on the join key → sort-merge join with
    NO shuffle exchange (bucket i joins bucket i in place) — the layout
    that makes repeated 10^12-row fact-fact joins affordable."""
    from osm_io_spark.plans import bucketing as B

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
                .withColumnRenamed("l_orderkey", "o_orderkey"))
    B.write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    B.write_bucketed(lineitem, "b_lineitem", "o_orderkey", n_buckets=8)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = B.bucketed_join(spark, "b_orders", "b_lineitem",
                                 "o_orderkey")
        rep = A.audit(joined, max_shuffles=0)
        assert rep["sort_merge_joins"] == 1
        n = joined.count()
        want = (orders.join(lineitem, "o_orderkey").count())
        assert n == want > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_pack_sequences_no_global_window(spark):
    """Round-4: sequence packing's global prefix sum must plan like
    o2 — per-partition offsets + Arrow cumsum, never a single-partition
    Window over the whole corpus."""
    df = Q.q_pack_sequences(spark, SF_DIR)
    plan = A.formatted_plan(df)
    assert A.count_op(plan, "Window") == 0, A.operator_tree(plan)
    assert A.count_op(plan, "MapInPandas") == 1


def test_new_candidate_joins_never_cartesian(spark):
    """Round-4 candidate generators (substring window match-back,
    caption-audit union of band + md5 equi-joins) must stay bucketed
    equi-joins — same rule as the round-3 generators."""
    for name in ["dedup_substring", "mm_caption_audit"]:
        df = Q.QUERIES[name](spark, SF_DIR)
        plan = A.formatted_plan(df)
        assert A.count_op(plan, "CartesianProduct") == 0, name
        assert A.count_op(plan, "BroadcastNestedLoopJoin") == 0, name


def test_dbscan_candidate_join_never_cartesian(spark):
    """Round-5f: DBSCAN's eps-pair candidate generation must stay a
    hash equi-join on the cell key (probe 3×3 fan-out vs build cell) —
    a lost key degrades to an n² cross join over the full point table.
    No Python eval anywhere: the whole operator is Column math +
    dedup_clusters' joins. Same rule for the conflation dissolve's
    overlap-edge generation."""
    for name in ("spatial_dbscan", "overlap_dissolve"):
        df = Q.QUERIES[name](spark, SF_DIR)
        plan = A.formatted_plan(df)
        assert A.count_op(plan, "CartesianProduct") == 0, name
        assert A.count_op(plan, "BroadcastNestedLoopJoin") == 0, name
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, name


def test_vector_tile_points_zero_shuffle_pruned(spark):
    """Point-feature fan-out is pure Column math: no exchange anywhere,
    no Python eval, and the lineitem scan reads only the two id
    columns the synthetic probe derives from."""
    df = Q.q_vector_tile_points(spark, SF_DIR)
    A.audit(df, max_shuffles=0,
            max_scan_cols={"lineitem.parquet": 2})
    plan = A.formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
