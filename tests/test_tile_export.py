"""tile_export job: snapshot commit with lineage+metrics, crash-resume
skipping completed shards, z/x/y.mvt materialization, blob validity."""

from __future__ import annotations

import glob
import os

import numpy as np

from osm_io_spark.functions import mvt as MVT
from osm_io_spark.jobs import tile_export as TE
from osm_io_spark.plans.snapshots import SnapshotCatalog


def test_tile_export_end_to_end(spark, tmp_path):
    out = str(tmp_path / "tiles")
    mat = str(tmp_path / "files")
    summary = TE.main([
        "--sf-dir", "/root/testdata/sf0.001", "--out", out,
        "--zoom", "10", "--shards", "4", "--materialize", mat])
    assert summary["rows"] > 0
    assert summary["n_partitions"] == 4
    assert summary["materialized_files"] == summary["rows"]

    # snapshot manifest carries per-partition lineage + metrics
    table = SnapshotCatalog(out).table("tiles_z10")
    snap = table.snapshot()
    assert snap.lineage["job"] == "tile_export"
    for pk, entry in snap.partitions.items():
        assert pk.startswith("shard=")
        assert entry["rows"] >= 0 and entry["bytes"] > 0
        assert entry["lineage"]["partition_key"] == pk

    # every materialized file is a decodable MVT whose path matches a
    # snapshot row
    files = glob.glob(os.path.join(mat, "*", "*", "*.mvt"))
    assert len(files) == summary["rows"]
    f = sorted(files)[0]
    dec = MVT.decode_mvt(open(f, "rb").read())
    assert dec["version"] == 2 and len(dec["features"]) >= 1
    for _fid, rings in dec["features"]:
        for r in rings:
            assert len(np.asarray(r)) >= 3

    # resume: a second run has nothing to do — same snapshot version
    v1 = summary["version"]
    summary2 = TE.main([
        "--sf-dir", "/root/testdata/sf0.001", "--out", out,
        "--zoom", "10", "--shards", "4"])
    assert summary2["version"] == v1
    assert summary2["rows"] == summary["rows"]
