"""apidb pg_dump source/sink: toc scan parity, COPY decode, star-schema
reassembly, round-trip, current_* semantics (SURVEY.md S7/S8/S11)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from osm_io_spark.sources import apidb

REF_DUMP = "/root/reference/tests/fixtures/history-niue-230109"


def _synth_elements(spark, history=False):
    from osm_io_spark import queries as Q
    from osm_io_spark.sources.pbf import decode as PD
    path = Q._fixture_pbf_path(spark, history=history)
    return PD.read_pbf(spark, path)


def test_toc_parse_on_reference_fixture():
    """Behavioral twin of reader.rs get_table_def_strings on the real
    pg_dump binary toc."""
    if not os.path.exists(os.path.join(REF_DUMP, "toc.dat")):
        pytest.skip("reference fixture not present")
    toc = apidb.parse_toc(os.path.join(REF_DUMP, "toc.dat"))
    assert set(toc) == set(apidb.TABLES_OF_INTEREST)
    assert toc["nodes"]["file"] == "3839.dat"
    assert toc["way_nodes"]["file"] == "3845.dat"
    assert toc["nodes"]["fields"] == apidb.TABLE_FIELDS["nodes"]
    assert toc["users"]["fields"] == apidb.TABLE_FIELDS["users"]


def test_read_reference_dump_golden_counts(spark):
    """Golden counts from history-niue-230109.osm.pbf.analysis.json for
    the tables whose .dat files ship with the reference (the nodes data
    file 3839.dat is absent from the archive; missing file → empty)."""
    if not os.path.exists(os.path.join(REF_DUMP, "toc.dat")):
        pytest.skip("reference fixture not present")
    tables = apidb.read_apidb_dump(spark, REF_DUMP)
    assert tables["ways"].count() == 4728          # analysis.json data.count.ways
    assert tables["relations"].count() == 197      # data.count.relations
    assert tables["users"].count() == 172          # 3843.dat minus trailers
    # typed decode spot checks on real data
    w = tables["ways"].filter("way_id = 17781996 AND version = 1").collect()[0]
    assert w["changeset_id"] == 401998 and w["visible"] is True
    assert w["redaction_id"] is None
    els = apidb.elements_from_apidb(tables)
    by_type = {r["etype"]: r["n"] for r in
               els.groupBy("etype").agg(F.count("*").alias("n")).collect()}
    assert by_type["way"] == 4728
    assert by_type["relation"] == 197
    # ordered FK assembly: way 17781996 v1 refs start at 184252266
    refs = els.filter("etype = 'way' AND id = 17781996 AND version = 1") \
              .select("refs").collect()[0]["refs"]
    assert refs[0] == 184252266 and refs[1] == 184252289
    # broadcast user lookup: changeset 401998 → some display name
    u = els.filter("etype = 'way' AND id = 17781996 AND version = 1") \
           .select("uid", "user").collect()[0]
    assert u["uid"] is not None and u["user"]


def test_roundtrip_elements_apidb_elements(spark, tmp_path):
    """PBF fixture → apidb dump dir → read back → identical elements
    (tag multisets, ordered refs, member multisets, metadata)."""
    els = _synth_elements(spark)
    out = str(tmp_path / "dump")
    apidb.write_apidb_dump(els, out)
    back = apidb.elements_from_apidb(apidb.read_apidb_dump(spark, out))

    def canon(df):
        return df.select(
            "etype", "id", "version",
            F.round(F.coalesce("lat", F.lit(0.0)) * 1e7).cast("long").alias("lat7"),
            F.round(F.coalesce("lon", F.lit(0.0)) * 1e7).cast("long").alias("lon7"),
            "timestamp", "changeset", "uid", "user", "visible",
            F.array_sort("tags").alias("tags_sorted"),
            F.coalesce("refs", F.array().cast("array<long>")).alias("refs"),
            F.array_sort(F.coalesce("members", F.expr("CAST(array() AS array<struct<type:string,id:bigint,role:string>>)"))).alias("members_sorted"))

    a = canon(els)
    b = canon(back)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_full_table_surface_and_cold_readback(spark, tmp_path):
    """S11 complete surface: the written dump contains ALL 53 apidb
    tables (writer.rs:42-60 / table_data_writers.rs:9-138) under the
    reference's template file names (toc/mapping.json), aux tables
    empty-with-terminator; and a COLD python process re-parses our toc
    and reproduces the golden counts (guards toc format drift)."""
    import json
    import subprocess
    import sys

    els = _synth_elements(spark)
    out = str(tmp_path / "dump")
    mapping = apidb.write_apidb_dump(els, out)

    # complete table list, reference file names
    assert set(mapping) == set(apidb.TOC_FILE_MAPPING)
    assert len(mapping) == 53
    assert mapping["nodes"] == "4260.dat"
    assert mapping["changeset_tags"] == "4221.dat"
    toc = apidb.parse_toc(os.path.join(out, "toc.dat"))
    assert set(toc) == set(apidb.TOC_FILE_MAPPING)
    for name, td in toc.items():
        assert td["fields"] == (apidb.TABLE_FIELDS.get(name)
                                or apidb.AUX_TABLE_FIELDS[name]), name
        assert os.path.exists(os.path.join(out, td["file"])), name
    # aux tables: terminator-only, as table_data_writer.rs close()
    with open(os.path.join(out, mapping["gps_points"]), "rb") as fh:
        assert fh.read() == b"\\.\n"
    # synthesized changeset_tags: 2 rows per changeset (writer.rs:383-398)
    n_changesets = sum(1 for _ in open(os.path.join(out, mapping["changesets"]))) - 1
    n_cs_tags = sum(1 for _ in open(os.path.join(out, mapping["changeset_tags"]))) - 1
    assert n_cs_tags == 2 * n_changesets > 0

    script = f"""
import json, sys
sys.path.insert(0, "/root/repo")
from osm_io_spark.sources import apidb
toc = apidb.parse_toc({os.path.join(out, 'toc.dat')!r})
print(json.dumps({{"n_tables": len(toc), "nodes_file": toc["nodes"]["file"]}}))
"""
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = json.loads(proc.stdout.strip())
    assert got == {"n_tables": 53, "nodes_file": "4260.dat"}


def test_roundtrip_history_current_semantics(spark, tmp_path):
    """History fixture: current_* keeps latest-visible versions only and
    drops ids whose latest version is invisible (current_object.rs)."""
    els = _synth_elements(spark, history=True)
    out = str(tmp_path / "dump")
    apidb.write_apidb_dump(els, out)

    nodes_e = els.filter("etype = 'node'").cache()
    latest = (nodes_e.groupBy("id")
              .agg(F.max("version").alias("version")))
    expected_current = (nodes_e.join(latest, on=["id", "version"])
                        .filter("visible").count())
    toc = apidb.parse_toc(os.path.join(out, "toc.dat"))
    cur = apidb.read_table(
        spark, os.path.join(out, toc["current_nodes"]["file"]),
        apidb.TABLE_FIELDS["current_nodes"], "current_nodes")
    assert cur.count() == expected_current
    assert expected_current < nodes_e.count()  # history rows were dropped
    nodes_e.unpersist()


def test_copy_escape_roundtrip(spark, tmp_path):
    """Tag values with tabs/newlines/backslashes survive the COPY text
    encode/decode chain."""
    nasty = "a\tb\\c\nd\re"
    rows = [("node", 1, 1, 10.0, 20.0, 1000, 5, 7, "usr\\tab", True,
             [{"k": "note", "v": nasty}], None, None)]
    from osm_io_spark.sources.pbf.decode import ELEMENTS
    els = spark.createDataFrame(rows, schema=ELEMENTS)
    out = str(tmp_path / "dump")
    apidb.write_apidb_dump(els, out)
    back = apidb.elements_from_apidb(apidb.read_apidb_dump(spark, out))
    row = back.collect()[0]
    assert row["tags"][0]["v"] == nasty
    assert row["user"] == "usr\\tab"
    # the .dat file itself holds escaped bytes (no raw tab/newline in fields)
    toc = apidb.parse_toc(os.path.join(out, "toc.dat"))
    with open(os.path.join(out, toc["node_tags"]["file"])) as fh:
        line = fh.readline().rstrip("\n")
    assert "\\t" in line and "\\n" in line and "\\\\" in line


def test_zorder_tile_written_for_nodes(spark, tmp_path):
    """The nodes table carries the reference's Z-order tile column
    (sql.rs:50-61) — our C1 kernel writes it bit-for-bit."""
    els = _synth_elements(spark)
    tables = apidb.apidb_tables_from_elements(els)
    sample = tables["nodes"].select("latitude", "longitude", "tile").limit(50).collect()

    def ref_tile(lat: float, lon: float) -> int:
        # independent reimplementation of sql.rs:50-61 for the oracle
        x = round((lon + 180.0) * 65535.0 / 360.0)
        y = round((lat + 90.0) * 65535.0 / 180.0)
        t = 0
        for i in range(15, -1, -1):
            t = (t << 1) | ((x >> i) & 1)
            t = (t << 1) | ((y >> i) & 1)
        return t

    for r in sample:
        assert r["tile"] == ref_tile(r["latitude"] / 1e7, r["longitude"] / 1e7)


def test_convert_job_all_directions(spark, tmp_path):
    """jobs/convert: pbf→apidb→pbf→pbf preserves golden counts (the
    reference's conversion-pipe tests, SURVEY.md §3.3/§5)."""
    from osm_io_spark import queries as Q
    from osm_io_spark.jobs import convert
    pbf = Q._fixture_pbf_path(spark)
    d = str(tmp_path)
    r1 = convert.run(["--from", "pbf", "--to", "apidb", "--input", pbf,
                      "--output", f"{d}/dump", "--master", "local[4]"])
    r2 = convert.run(["--from", "apidb", "--to", "pbf", "--input", f"{d}/dump",
                      "--output", f"{d}/out.osm.pbf", "--master", "local[4]"])
    r3 = convert.run(["--from", "pbf", "--to", "pbf",
                      "--input", f"{d}/out.osm.pbf",
                      "--output", f"{d}/rt.osm.pbf", "--master", "local[4]"])
    assert r1["data"] == r2["data"] == r3["data"]
    assert r1["data"]["count"]["nodes"] == 2000
