"""Binary pg_dump directory-format toc: strict structural round-trip,
format validation against a real pg_dump archive, and the reference
scanner's recovery semantics on our generated toc."""

from __future__ import annotations

import os
import re

import pytest

from osm_io_spark.sources import apidb
from osm_io_spark.sources import pgdump_toc as PGT

REF_TOC = "/root/reference/tests/fixtures/history-niue-230109/toc.dat"


def _write_full_toc(path: str) -> list[PGT.TocEntry]:
    data = [PGT.table_data_entry(
        name, apidb.TABLE_FIELDS.get(name) or apidb.AUX_TABLE_FIELDS[name],
        apidb.TOC_FILE_MAPPING[name])
        for name in sorted(apidb.TOC_FILE_MAPPING)]
    entries = PGT.session_setup_entries() + data
    PGT.write_toc(path, entries)
    return entries


def test_strict_reader_parses_real_pg_dump_toc():
    """Our STRICT field-by-field reader must consume the reference
    fixture's genuine pg_dump 15.1 -Fd toc (456 entries, schema DDL
    included) to the last byte. If our understanding of the public
    archiver layout were wrong anywhere, this desynchronizes
    immediately. (The real consumer is also checked:
    test_pg_restore_lists_generated_toc runs the container's actual
    pg_restore binary against our generated archive.)"""
    template = "/root/reference/src/osm/apidb_dump/write/toc/toc.dat"
    checked = 0
    for toc_path, min_entries in [(REF_TOC, 50), (template, 400)]:
        if not os.path.exists(toc_path):
            continue
        checked += 1
        out = PGT.read_toc(toc_path)
        h = out["header"]
        assert h["version"] == (1, 14, 0)
        assert h["format"] == PGT._FMT_DIRECTORY
        assert h["dbname"] == "openstreetmap"
        assert len(out["entries"]) > min_entries
        data = {e.tag: e for e in out["entries"] if e.desc == "TABLE DATA"}
        # field-parse agrees with the lenient byte-scanner per table
        scanned = apidb.parse_toc(toc_path)
        assert set(scanned) <= set(data)
        for name, td in scanned.items():
            assert data[name].filename == td["file"], name
            assert data[name].copy_stmt.startswith(
                f"COPY public.{name} ("), name
            assert data[name].section == PGT.SECTION_DATA
    if not checked:
        pytest.skip("reference fixtures not present")


def test_write_read_roundtrip_full_surface(tmp_path):
    path = str(tmp_path / "toc.dat")
    entries = _write_full_toc(path)
    out = PGT.read_toc(path)
    assert out["header"]["version"] == (1, 14, 0)
    assert out["header"]["compression"] == 0
    assert len(out["entries"]) == len(entries) == 56  # 3 setup + 53 tables
    back = {e.tag: e for e in out["entries"] if e.desc == "TABLE DATA"}
    assert set(back) == set(apidb.TOC_FILE_MAPPING)
    for name, e in back.items():
        assert e.filename == apidb.TOC_FILE_MAPPING[name]
        assert e.dump_id == int(e.filename.split(".")[0])
        assert e.namespace == "public" and e.had_dumper
    pre = [e for e in out["entries"] if e.section == PGT.SECTION_PRE_DATA]
    assert [e.tag for e in pre] == ["ENCODING", "STDSTRINGS", "SEARCHPATH"]
    assert "client_encoding" in pre[0].defn


def test_reference_scanner_semantics_on_generated_toc(tmp_path):
    """Independent reimplementation of reader.rs:88-134's discovery
    (find ``COPY ``, cut at `` FROM stdin``, digit-run before the next
    ``.dat``) — deliberately NOT via apidb.parse_toc, so a shared bug
    can't hide — must recover all 53 tables + file names from the
    binary toc our sink writes."""
    path = str(tmp_path / "toc.dat")
    _write_full_toc(path)
    blob = open(path, "rb").read()
    found: dict[str, str] = {}
    for m in re.finditer(rb"COPY (.+?) FROM stdin", blob, re.DOTALL):
        tail = blob[m.end():]
        d = tail.find(b".dat")
        assert d >= 0
        s = d - 1
        while s >= 0 and chr(tail[s]).isdigit():
            s -= 1
        stmt = m.group(1).decode()
        table = stmt.split(" (")[0].split(".")[-1]
        found[table] = tail[s + 1:d + 4].decode()
    assert found == apidb.TOC_FILE_MAPPING

    # and the lenient scanner recovers identical fields
    toc = apidb.parse_toc(path)
    assert set(toc) == set(apidb.TOC_FILE_MAPPING)
    for name, td in toc.items():
        assert td["fields"] == (apidb.TABLE_FIELDS.get(name)
                                or apidb.AUX_TABLE_FIELDS[name]), name


def test_deterministic_and_malformed_rejected(tmp_path):
    p1, p2 = str(tmp_path / "a.dat"), str(tmp_path / "b.dat")
    _write_full_toc(p1)
    _write_full_toc(p2)
    b1, b2 = open(p1, "rb").read(), open(p2, "rb").read()
    assert b1 == b2  # byte-reproducible (fixed creation date)

    with open(p2, "wb") as fh:  # truncated
        fh.write(b1[:-7])
    with pytest.raises(ValueError):
        PGT.read_toc(p2)
    with open(p2, "wb") as fh:  # trailing garbage
        fh.write(b1 + b"xx")
    with pytest.raises(ValueError):
        PGT.read_toc(p2)
    with open(p2, "wb") as fh:  # bad magic
        fh.write(b"NOTPG" + b1[5:])
    with pytest.raises(ValueError):
        PGT.read_toc(p2)


def test_pg_restore_lists_generated_toc(tmp_path):
    """End-to-end validation with the REAL consumer: run the
    container's pg_restore (PostgreSQL 15.x) against a directory-format
    archive whose toc.dat our sink generated. `pg_restore --list` must
    accept the archive (rc 0) and list all 53 TABLE DATA entries plus
    the 3 session-setup entries — so any regression in the archiver
    layout fails CI with the genuine binary, not only with our own
    reimplementation of the format. Reference behavior being matched:
    write/toc.rs:6-13, read/reader.rs:88-134."""
    import shutil
    import subprocess

    if shutil.which("pg_restore") is None:
        pytest.skip("pg_restore not installed")
    path = str(tmp_path / "toc.dat")
    _write_full_toc(path)
    proc = subprocess.run(
        ["pg_restore", "--list", str(tmp_path)],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    lines = [ln for ln in proc.stdout.splitlines()
             if ln and not ln.startswith(";")]
    data = [ln for ln in lines if " TABLE DATA " in ln]
    assert len(data) == len(apidb.TOC_FILE_MAPPING) == 53, proc.stdout
    listed = {ln.split(" TABLE DATA public ")[1].split()[0]
              for ln in data}
    assert listed == set(apidb.TOC_FILE_MAPPING)
    # the 3 session-setup entries (ENCODING/STDSTRINGS/SEARCHPATH) are
    # "special" entries pg_restore counts but does not list — the
    # header's entry count is the visible evidence it parsed them
    assert "TOC Entries: 56" in proc.stdout
    # header metadata survives: the archive self-identifies as
    # directory-format against database openstreetmap
    assert "dbname: openstreetmap" in proc.stdout
    assert "Format: DIRECTORY" in proc.stdout
