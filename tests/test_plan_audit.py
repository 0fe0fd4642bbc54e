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
