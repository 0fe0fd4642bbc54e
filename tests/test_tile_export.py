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


def test_morton_sharded_region_read_prunes(spark, tmp_path):
    """Morton-range sharding gives the manifest per-shard m min/max
    stats; a bbox region read must skip shards and return exactly the
    full-read rows of that region."""
    from osm_io_spark.operators import tiles as TL
    out = str(tmp_path / "tiles_m")
    TE.main(["--sf-dir", "/root/testdata/sf0.001", "--out", out,
             "--zoom", "10", "--shards", "8", "--shard-by", "morton"])
    table = SnapshotCatalog(out).table("tiles_z10")
    snap = table.snapshot()
    # stats recorded per shard, and morton ranges are disjoint across
    # shards (contiguity of the range sharding)
    stats = [(e["column_stats"]["m"]["min"], e["column_stats"]["m"]["max"])
             for e in snap.partitions.values() if e["rows"] > 0]
    stats.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(stats, stats[1:]):
        assert hi1 < lo2
    # region = a few tiles around an actually-exported tile (sf0.001
    # has only ~300 tiles worldwide; a fixed bbox can miss them all)
    import numpy as np
    from osm_io_spark.functions import webmercator as WM
    anchor = table.read(spark).orderBy("x", "y").first()
    x0, x1 = anchor.x - 2, anchor.x + 2
    y0, y1 = anchor.y - 2, anchor.y + 2
    l, b, _r, _t = WM.tile_bounds_np(np.array([x0]), np.array([y1]), 10)
    _l2, _b2, r, t = WM.tile_bounds_np(np.array([x1]), np.array([y0]), 10)
    eps = 1e-9  # stay strictly inside the corner tiles
    got, kept = TL.read_tile_region(table, spark, 10, l[0] + eps,
                                    b[0] + eps, r[0] - eps, t[0] - eps)
    full = table.read(spark).filter(
        f"x >= {x0} and x <= {x1} and y >= {y0} and y <= {y1}")
    got_keys = {(r.x, r.y) for r in got.select("x", "y").collect()}
    want_keys = {(r.x, r.y) for r in full.select("x", "y").collect()}
    assert got_keys == want_keys and len(want_keys) > 0
    n_shards = len([e for e in snap.partitions.values()])
    assert len(kept) < n_shards, (len(kept), n_shards)


def test_tile_export_layered(spark, tmp_path):
    """--layered exports the complete multi-layer tile: blobs decode to
    areas/roads/pois layers with correct geometry types, the snapshot
    resumes by version, and the layered table is distinct from the
    polygon-only one."""
    out = str(tmp_path / "tiles_l")
    summary = TE.main([
        "--sf-dir", "/root/testdata/sf0.001", "--out", out,
        "--zoom", "8", "--shards", "4", "--layered"])
    assert summary["rows"] > 0
    table = SnapshotCatalog(out).table("tiles_z8_layered")
    snap = table.snapshot()
    assert snap.lineage["inputs"]["layered"] is True
    rows = table.read(spark).collect()
    assert len(rows) == summary["rows"]
    names = set()
    types = set()
    for r in rows[:50]:
        dec = MVT.decode_mvt(bytes(r.mvt))
        assert r.n_layers == len(dec["layers"])
        for L in dec["layers"]:
            names.add(L["name"])
            types.update(L["types"])
    assert names <= {"areas", "roads", "pois"} and "pois" in names
    assert MVT.POINT in types
    # resume: second run reuses the snapshot
    summary2 = TE.main([
        "--sf-dir", "/root/testdata/sf0.001", "--out", out,
        "--zoom", "8", "--shards", "4", "--layered"])
    assert summary2["version"] == summary["version"]
