"""Edge cases of the single-pass partition encoder (sources/pbf/encode):
type purity per block, global Node < Way < Relation (id, version) order
across partition boundaries, and ≤8000-element block cap — the
Sort.Type_then_ID contract the reference enforces in its
ElementAccumulator (element_accumulator.rs:16-101) and ordered writer
(writer.rs:160-177)."""

from __future__ import annotations

import os
import tempfile

import pytest

from osm_io_spark.sources.pbf import decode as PD
from osm_io_spark.sources.pbf import encode as PE


def _mixed_elements(spark, n_nodes=20_005, n_ways=133, n_rels=7):
    rows = []
    for i in range(n_nodes, 0, -1):  # reversed input: writer must re-sort
        rows.append(("node", i, 1, float(i % 90), float(i % 180),
                     1600000000000 + i, 1, 1, "u", True, [], None, None))
    for i in range(n_ways):
        rows.append(("way", i + 1, 1, None, None, 1600000000000, 1, 1, "u",
                     True, [{"k": "highway", "v": "x"}], [1, 2, 3], None))
    for i in range(n_rels):
        rows.append(("relation", i + 1, 1, None, None, 1600000000000, 1, 1,
                     "u", True, [], None,
                     [{"type": "Way", "id": 1, "role": "outer"}]))
    return spark.createDataFrame(rows, schema=PD.ELEMENTS).repartition(13)


def test_blocks_are_type_pure_ordered_and_capped(spark):
    els = _mixed_elements(spark)
    path = os.path.join(tempfile.mkdtemp(), "mixed.osm.pbf")
    n_blocks = PE.write_pbf(els, path)
    assert n_blocks >= 1

    descs = [d for d in PD.scan_blobs(path) if d["blob_type"] == "OSMData"]
    assert len(descs) == n_blocks

    type_rank = {"node": 0, "way": 1, "relation": 2}
    last_key = None
    totals = {"node": 0, "way": 0, "relation": 0}
    for d in descs:
        pdf = PD.decode_block(
            PD._read_blob_body(path, d["offset"], d["length"]))
        assert 0 < len(pdf) <= PE.BLOCK_SIZE
        etypes = set(pdf["etype"])
        assert len(etypes) == 1, f"mixed-type block: {etypes}"
        et = etypes.pop()
        totals[et] += len(pdf)
        for _, row in pdf.iterrows():
            key = (type_rank[row["etype"]], row["id"], row["version"])
            assert last_key is None or key > last_key, (
                f"order violation: {last_key} -> {key}")
            last_key = key

    assert totals == {"node": 20_005, "way": 133, "relation": 7}


def test_roundtrip_preserves_way_and_relation_payloads(spark):
    els = _mixed_elements(spark, n_nodes=50, n_ways=9, n_rels=3)
    path = os.path.join(tempfile.mkdtemp(), "small.osm.pbf")
    PE.write_pbf(els, path)
    back = PD.read_pbf(spark, path)
    ways = back.filter("etype = 'way'").orderBy("id").collect()
    assert [w["refs"] for w in ways] == [[1, 2, 3]] * 9
    assert all(w["tags"][0]["k"] == "highway" for w in ways)
    rels = back.filter("etype = 'relation'").collect()
    assert all(r["members"][0]["role"] == "outer" for r in rels)
