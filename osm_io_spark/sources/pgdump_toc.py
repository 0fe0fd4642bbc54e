"""Minimal pg_dump directory-format (-Fd) binary toc.dat writer/reader.

The reference ships a verbatim pre-built binary toc template and writes
it unchanged (/root/reference/src/osm/apidb_dump/write/toc.rs:6-13);
copying those bytes is off the table, so this module GENERATES a
structurally real archive toc from the table surface we actually
write. The layout follows PostgreSQL's public archiver format
(src/bin/pg_dump/pg_backup_archiver.c — WriteHead/ReadHead and
WriteToc/ReadToc; the directory format's extra per-entry member is the
data file name, pg_backup_directory.c _WriteExtraToc), at archive
version 1.14 — the version a PostgreSQL 15 pg_dump emits, confirmed
against the observable header of the reference's fixture archive:

* header: ``PGDMP`` magic, version triple (1, 14, 0), intSize=4,
  offSize=8, format byte 3 (directory), compression int 0 (plain
  ``NNNN.dat`` members), creation date as seven ints (sec, min, hour,
  mday, 0-based mon, year-1900, isdst), then three strings: database
  name, server version, pg_dump version;
* integers: one sign byte (0/1) then ``intSize`` little-endian bytes of
  the magnitude; strings: length as such an int (−1 encodes NULL)
  followed by the raw bytes — no terminator;
* toc: entry count, then per entry dumpId, had-dumper flag, tableoid,
  oid, tag, desc, section, defn, dropStmt, copyStmt, namespace,
  tablespace, tableam (1.14+), owner, legacy with-oids string
  ("false"), the dependency list as stringified dumpIds closed by a
  NULL string, and finally the directory format's extra member: the
  entry's data file name ("" for non-data entries).

We emit a data-only archive: three session-setup entries (ENCODING,
STDSTRINGS, SEARCHPATH — SECTION_PRE_DATA=2) followed by one TABLE
DATA entry (SECTION_DATA=3) per table whose ``COPY public.<t> (<cols>)
FROM stdin;`` statement and ``NNNN.dat`` file name are exactly what
both our byte-scanner (apidb.parse_toc) and the reference's scanner
(read/reader.rs:88-134) recover — restoring assumes the apidb schema
already exists, the same contract as the reference's template dump.

``dump_id`` for data entries is the NNNN of the file name itself
(unique by construction), keeping file names and toc self-consistent
the way pg_dump's dumpId-derived names are.
"""

from __future__ import annotations

from dataclasses import dataclass, field

_MAGIC = b"PGDMP"
_VERSION = (1, 14, 0)
_INT_SIZE = 4
_OFF_SIZE = 8
_FMT_DIRECTORY = 3
SECTION_PRE_DATA = 2
SECTION_DATA = 3

# fixed creation date so dumps are byte-reproducible run-to-run (the
# field is informational; pg_restore only displays it)
_CREATED = (0, 0, 0, 1, 0, 126, 0)  # 2026-01-01 00:00:00, isdst 0


@dataclass
class TocEntry:
    dump_id: int
    tag: str
    desc: str
    section: int
    defn: str = ""
    copy_stmt: str = ""
    namespace: str | None = None
    owner: str | None = None
    had_dumper: bool = False
    filename: str = ""
    deps: list[int] = field(default_factory=list)


def _w_int(buf: bytearray, v: int) -> None:
    buf.append(1 if v < 0 else 0)
    buf.extend(abs(v).to_bytes(_INT_SIZE, "little"))


def _w_str(buf: bytearray, s: str | None) -> None:
    if s is None:
        _w_int(buf, -1)
        return
    b = s.encode("utf-8")
    _w_int(buf, len(b))
    buf.extend(b)


def session_setup_entries(start_id: int = 1) -> list[TocEntry]:
    """The standard pre-data session entries every pg_dump archive
    carries; restores run their defn statements before any data."""
    items = [
        ("ENCODING", "SET client_encoding = 'UTF8';\n"),
        ("STDSTRINGS", "SET standard_conforming_strings = 'on';\n"),
        ("SEARCHPATH",
         "SELECT pg_catalog.set_config('search_path', '', false);\n"),
    ]
    return [TocEntry(dump_id=start_id + i, tag=tag, desc=tag,
                     section=SECTION_PRE_DATA, defn=defn)
            for i, (tag, defn) in enumerate(items)]


def table_data_entry(table: str, fields: list[str], filename: str,
                     owner: str = "openstreetmap") -> TocEntry:
    quoted = [f'"{f}"' if f == "timestamp" else f for f in fields]
    return TocEntry(
        dump_id=int(filename.split(".")[0]),
        tag=table, desc="TABLE DATA", section=SECTION_DATA,
        copy_stmt=f"COPY public.{table} ({', '.join(quoted)}) "
                  "FROM stdin;\n",
        namespace="public", owner=owner, had_dumper=True,
        filename=filename)


def write_toc(path: str, entries: list[TocEntry],
              dbname: str = "openstreetmap",
              server_version: str = "15.1",
              dump_version: str = "15.1") -> None:
    buf = bytearray()
    buf.extend(_MAGIC)
    buf.extend(bytes(_VERSION))
    buf.append(_INT_SIZE)
    buf.append(_OFF_SIZE)
    buf.append(_FMT_DIRECTORY)
    _w_int(buf, 0)  # compression: none
    for v in _CREATED:
        _w_int(buf, v)
    _w_str(buf, dbname)
    _w_str(buf, server_version)
    _w_str(buf, dump_version)
    _w_int(buf, len(entries))
    for e in entries:
        _w_int(buf, e.dump_id)
        _w_int(buf, 1 if e.had_dumper else 0)
        _w_str(buf, "0")            # tableoid
        _w_str(buf, "0")            # oid
        _w_str(buf, e.tag)
        _w_str(buf, e.desc)
        _w_int(buf, e.section)
        _w_str(buf, e.defn or None)
        _w_str(buf, None)           # dropStmt
        _w_str(buf, e.copy_stmt or None)
        _w_str(buf, e.namespace)
        _w_str(buf, None)           # tablespace
        _w_str(buf, None)           # tableam (data entries carry none)
        _w_str(buf, e.owner)
        _w_str(buf, "false")        # legacy with-oids
        for d in e.deps:
            _w_str(buf, str(d))
        _w_str(buf, None)           # deps terminator
        _w_str(buf, e.filename)     # directory-format extra member
    with open(path, "wb") as fh:
        fh.write(bytes(buf))


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("truncated toc.dat")
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def r_int(self) -> int:
        sign = self.take(1)[0]
        v = int.from_bytes(self.take(_INT_SIZE), "little")
        return -v if sign else v

    def r_str(self) -> str | None:
        n = self.r_int()
        if n < 0:
            return None
        return self.take(n).decode("utf-8")


def read_toc(path: str) -> dict:
    """Strict field-by-field parse of a directory-format toc.dat —
    the structural validator parse_toc's lenient byte-scan cannot be.
    Returns {"header": {...}, "entries": [TocEntry, ...]}."""
    with open(path, "rb") as fh:
        r = _Reader(fh.read())
    if r.take(5) != _MAGIC:
        raise ValueError("not a pg_dump archive (bad magic)")
    vmaj, vmin, vrev = r.take(1)[0], r.take(1)[0], r.take(1)[0]
    int_size, off_size, fmt = r.take(1)[0], r.take(1)[0], r.take(1)[0]
    if (int_size, off_size) != (_INT_SIZE, _OFF_SIZE):
        raise ValueError(f"unsupported int/off sizes {int_size}/{off_size}")
    if fmt != _FMT_DIRECTORY:
        raise ValueError(f"not a directory-format archive (format {fmt})")
    compression = r.r_int()
    created = tuple(r.r_int() for _ in range(7))
    dbname, server_version, dump_version = r.r_str(), r.r_str(), r.r_str()
    n = r.r_int()
    entries = []
    for _ in range(n):
        dump_id = r.r_int()
        had_dumper = bool(r.r_int())
        r.r_str(), r.r_str()  # tableoid, oid
        tag, desc = r.r_str(), r.r_str()
        section = r.r_int()
        defn, _drop, copy_stmt = r.r_str(), r.r_str(), r.r_str()
        namespace, _tblspc, _am = r.r_str(), r.r_str(), r.r_str()
        owner = r.r_str()
        r.r_str()  # with-oids
        deps = []
        while (d := r.r_str()) is not None:
            deps.append(int(d))
        filename = r.r_str()
        entries.append(TocEntry(
            dump_id=dump_id, tag=tag or "", desc=desc or "",
            section=section, defn=defn or "", copy_stmt=copy_stmt or "",
            namespace=namespace, owner=owner, had_dumper=had_dumper,
            filename=filename or "", deps=deps))
    if r.pos != len(r.data):
        raise ValueError(f"{len(r.data) - r.pos} trailing bytes after toc")
    return {"header": {
        "version": (vmaj, vmin, vrev), "format": fmt,
        "compression": compression, "created": created,
        "dbname": dbname, "server_version": server_version,
        "dump_version": dump_version}, "entries": entries}
