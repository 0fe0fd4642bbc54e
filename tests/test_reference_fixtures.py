"""Parity against the reference's OWN test fixtures (the north-star
correctness contract): decode the real niue-230109 PBF extracts and
reproduce the golden analysis facts osm-io's E2E tests assert
(/root/reference/tests/fixtures/*.analysis.json, tests/test_pbf_reader.rs,
tests/test_pbf_rw_pipe.rs), including a full round-trip through our own
writer and a cross-format equivalence check against the apidb dump
fixture of the same extract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from osm_io_spark.sources import apidb
from osm_io_spark.sources.pbf import decode as PD
from osm_io_spark.sources.pbf import encode as PE

FIX = "/root/reference/tests/fixtures"
NIUE = f"{FIX}/niue-230109.osm.pbf"
HISTORY = f"{FIX}/history-niue-230109.osm.pbf"
GOLDEN_BBOX = (-170.1595029, -19.3548665, -169.5647229, -18.7534559)

pytestmark = pytest.mark.skipif(
    not os.path.exists(NIUE), reason="reference fixtures not present")


def _counts(els):
    return {r["etype"]: r["n"] for r in
            els.groupBy("etype").agg(F.count("*").alias("n")).collect()}


@pytest.fixture(scope="module")
def niue_els(spark):
    df = PD.read_pbf(spark, NIUE).cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def history_els(spark):
    df = PD.read_pbf(spark, HISTORY).cache()
    yield df
    df.unpersist()


def test_blob_layout_one_header_block():
    blobs = PD.scan_blobs(NIUE)
    assert blobs[0]["blob_type"] == "OSMHeader"
    assert all(b["blob_type"] == "OSMData" for b in blobs[1:])


def test_header_features_and_bbox():
    info = PD.read_header(NIUE)
    assert info["required_features"] == ["OsmSchema-V0.6", "DenseNodes"]
    assert info["writingprogram"] == "osmium/1.14.0"
    assert tuple(round(v, 7) for v in info["bbox"]) == GOLDEN_BBOX


def test_niue_golden_counts_and_bbox(niue_els):
    """analysis.json data.count: nodes 41816 / ways 3007 / relations 125;
    bbox exact to 1e-7 (the A2 aggregate vs the golden value the
    reference asserts in test_bounding_box_calculator.rs)."""
    assert _counts(niue_els) == {"node": 41816, "way": 3007, "relation": 125}
    bb = (niue_els.filter("etype = 'node'")
          .agg(F.min("lon"), F.min("lat"), F.max("lon"), F.max("lat"))
          .collect()[0])
    assert tuple(round(v, 7) for v in bb) == GOLDEN_BBOX
    # single-version extract: every (id) appears once per type
    assert niue_els.groupBy("etype", "id").count().filter("count > 1").count() == 0


def test_history_golden_counts_and_versions(history_els):
    """history analysis.json: 61628 / 4728 / 197, multiple_versions=true;
    deleted versions carry the INT32_MAX/1e7 sentinel coordinate and are
    invisible — the visible-node bbox still matches the golden window."""
    assert _counts(history_els) == {"node": 61628, "way": 4728, "relation": 197}
    multi = (history_els.filter("etype = 'node'")
             .groupBy("id").count().filter("count > 1").count())
    assert multi > 0
    assert history_els.filter("NOT visible").count() > 0
    bb = (history_els.filter("etype = 'node' AND visible")
          .agg(F.min("lon"), F.min("lat"), F.max("lon"), F.max("lat"))
          .collect()[0])
    assert tuple(round(v, 7) for v in bb) == GOLDEN_BBOX


def test_niue_roundtrip_through_our_writer(spark, niue_els, tmp_path):
    """The reference's test_pbf_rw_pipe on real data: read → write with
    OUR ordered encoder → re-read → element-for-element identical."""
    out = str(tmp_path / "niue-rt.osm.pbf")
    PE.write_pbf(niue_els, out)
    back = PD.read_pbf(spark, out).cache()
    try:
        assert _counts(back) == {"node": 41816, "way": 3007, "relation": 125}
        blobs = PD.scan_blobs(out)
        assert blobs[0]["blob_type"] == "OSMHeader"

        cols = ["etype", "id", "version", "timestamp", "changeset", "uid",
                "user", "visible", "tags", "refs", "members"]
        cmp_a = niue_els.select(
            *cols,
            F.round(F.coalesce("lat", F.lit(0.0)) * 1e7).alias("lat7"),
            F.round(F.coalesce("lon", F.lit(0.0)) * 1e7).alias("lon7"))
        cmp_b = back.select(
            *cols,
            F.round(F.coalesce("lat", F.lit(0.0)) * 1e7).alias("lat7"),
            F.round(F.coalesce("lon", F.lit(0.0)) * 1e7).alias("lon7"))
        assert cmp_a.exceptAll(cmp_b).count() == 0
        assert cmp_b.exceptAll(cmp_a).count() == 0
    finally:
        back.unpersist()


def test_history_pbf_matches_apidb_dump_fixture(spark, history_els):
    """Cross-format: the history PBF and the apidb dump directory are the
    same extract — ways/relations reassembled from the star schema must
    equal the PBF-decoded elements (tag multisets, ordered refs, member
    multisets, changeset/timestamp/visible metadata)."""
    dump = f"{FIX}/history-niue-230109"
    if not os.path.exists(os.path.join(dump, "toc.dat")):
        pytest.skip("apidb dump fixture not present")
    ap = apidb.elements_from_apidb(apidb.read_apidb_dump(spark, dump)).cache()
    try:
        def canon(df, etype):
            return (df.filter(F.col("etype") == etype)
                    .select("id", "version", "timestamp", "changeset",
                            "visible",
                            F.array_sort("tags").alias("tags_s"),
                            F.coalesce("refs", F.array().cast(
                                "array<long>")).alias("refs"),
                            F.array_sort(F.coalesce("members", F.expr(
                                "CAST(array() AS array<struct<"
                                "type:string,id:bigint,role:string>>)"
                            ))).alias("members_s")))

        for etype in ("way", "relation"):
            a = canon(history_els, etype)
            b = canon(ap, etype)
            assert a.count() == b.count()
            assert a.exceptAll(b).count() == 0, etype
            assert b.exceptAll(a).count() == 0, etype
    finally:
        ap.unpersist()
