"""PBF write path: ordered sink (S9), 8000-element same-type re-blocking
(S10), dictionary + delta encode (S12) — Spark-first:

  elements DataFrame
    → global order (type rank, id, version)       [O2 total order,
      element.rs:207-318; writer requirement writer.rs:160-163]
    → block id = row_number // 8000 per type      [element_accumulator.rs:18]
    → applyInPandas(encode_block) → (block_id, blob bytes)
    → driver drains toLocalIterator IN ORDER and appends to the file

The parallel-encode/ordered-write shape is exactly the reference's
ParallelWriter (encode pool + ordering buffer, parallel_writer.rs:250-289)
— Spark's sorted shuffle is the ordering buffer.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from . import proto as P

BLOCK_SIZE = 8000  # element_accumulator.rs:18
_TYPE_RANK = {"node": 0, "way": 1, "relation": 2}


class StringTableBuilder:
    """Per-block string dictionary; index 0 reserved empty
    (string_table_builder.rs:10-38)."""

    def __init__(self):
        self._idx: dict[str, int] = {"": 0}
        self._strings: list[str] = [""]

    def add(self, s: str) -> int:
        i = self._idx.get(s)
        if i is None:
            i = len(self._strings)
            self._idx[s] = i
            self._strings.append(s)
        return i

    def serialize(self) -> bytes:
        return b"".join(P.field_len(1, s.encode("utf-8")) for s in self._strings)


def _info_bytes(st: StringTableBuilder, row, date_gran: int) -> bytes:
    out = b""
    if row.version is not None and row.version >= 0:
        out += P.field_varint(1, int(row.version))
    if row.timestamp is not None and not pd.isna(row.timestamp):
        out += P.field_varint(2, int(row.timestamp) // date_gran)
    if row.changeset is not None and not pd.isna(row.changeset):
        out += P.field_varint(3, int(row.changeset))
    if row.uid is not None and not pd.isna(row.uid):
        out += P.field_varint(4, int(row.uid))
    if row.user is not None:
        out += P.field_varint(5, st.add(str(row.user)))
    if row.visible is not None and not row.visible:
        out += P.field_varint(6, 0)
    return out


def _kv_bytes(st: StringTableBuilder, tags) -> bytes:
    if tags is None or len(tags) == 0:
        return b""
    keys = [st.add(t["k"]) for t in tags]
    vals = [st.add(t["v"]) for t in tags]
    return P.field_packed_varints(2, keys) + P.field_packed_varints(3, vals)


def _delta_list(vals: list[int]) -> list[int]:
    if not vals:
        return []
    return [vals[0]] + [b - a for a, b in zip(vals, vals[1:])]


def encode_block(pdf: pd.DataFrame, granularity: int = 100,
                 date_granularity: int = 1000, compress: bool = True) -> bytes:
    """Encode one same-type element batch → framed bytes
    (4-byte BE len + BlobHeader + Blob), one primitive group per block."""
    st = StringTableBuilder()
    etype = pdf["etype"].iloc[0]
    assert (pdf["etype"] == etype).all(), "blocks must be single-type (S10)"

    if etype == "node":
        n = len(pdf)
        ids = pdf["id"].to_numpy(np.int64)
        lat = np.round(pdf["lat"].to_numpy(np.float64) * 1e9 / granularity).astype(np.int64)
        lon = np.round(pdf["lon"].to_numpy(np.float64) * 1e9 / granularity).astype(np.int64)
        kv: list[int] = []
        for tags in pdf["tags"]:
            if tags is not None:
                for t in tags:
                    kv.append(st.add(t["k"]))
                    kv.append(st.add(t["v"]))
            kv.append(0)
        versions = pdf["version"].fillna(-1).to_numpy(np.int64)
        ts = (pdf["timestamp"].fillna(0).to_numpy(np.int64) // date_granularity)
        cs = pdf["changeset"].fillna(0).to_numpy(np.int64)
        uid = pdf["uid"].fillna(0).to_numpy(np.int64)
        sids = np.array([st.add(u) if u is not None else 0
                         for u in pdf["user"]], np.int64)
        vis = pdf["visible"].fillna(True).to_numpy(bool).astype(np.uint64)

        dinfo = (P.field_packed_varints(1, versions.astype(np.uint64))
                 + P.field_packed_sints(2, P.delta_encode(ts))
                 + P.field_packed_sints(3, P.delta_encode(cs))
                 + P.field_packed_sints(4, P.delta_encode(uid))
                 + P.field_packed_sints(5, P.delta_encode(sids))
                 + P.field_packed_varints(6, vis))
        dense = (P.field_packed_sints(1, P.delta_encode(ids))
                 + P.field_len(5, dinfo)
                 + P.field_packed_sints(8, P.delta_encode(lat))
                 + P.field_packed_sints(9, P.delta_encode(lon))
                 + P.field_packed_varints(10, np.array(kv, np.uint64)))
        group = P.field_len(2, dense)

    elif etype == "way":
        parts = []
        for row in pdf.itertuples():
            body = P.field_varint(1, int(row.id))
            body += _kv_bytes(st, row.tags)
            body += P.field_len(4, _info_bytes(st, row, date_granularity))
            body += P.field_packed_sints(8, _delta_list([int(r) for r in row.refs]))
            parts.append(P.field_len(3, body))
        group = b"".join(parts)

    elif etype == "relation":
        mt = {"Node": 0, "Way": 1, "Relation": 2}
        parts = []
        for row in pdf.itertuples():
            body = P.field_varint(1, int(row.id))
            body += _kv_bytes(st, row.tags)
            body += P.field_len(4, _info_bytes(st, row, date_granularity))
            members = list(row.members) if row.members is not None else []
            body += P.field_packed_varints(8, [st.add(m["role"]) for m in members])
            body += P.field_packed_sints(9, _delta_list([int(m["id"]) for m in members]))
            body += P.field_packed_varints(10, [mt[m["type"]] for m in members])
            parts.append(P.field_len(4, body))
        group = b"".join(parts)
    else:
        raise ValueError(f"unknown element type {etype}")

    block = P.field_len(1, st.serialize()) + P.field_len(2, group)
    if granularity != 100:
        block += P.field_varint(17, granularity)
    if date_granularity != 1000:
        block += P.field_varint(18, date_granularity)
    return frame_blob("OSMData", block, compress)


def frame_blob(btype: str, payload: bytes, compress: bool) -> bytes:
    """payload → Blob (+zlib) → BlobHeader → 4-byte BE length framing
    (file_block.rs:171-212, writer.rs:145-158)."""
    if compress:
        blob = (P.field_varint(2, len(payload))
                + P.field_len(3, zlib.compress(payload, 6)))
    else:
        blob = P.field_len(1, payload) + P.field_varint(2, len(payload))
    header = (P.field_len(1, btype.encode()) + P.field_varint(3, len(blob)))
    return struct.pack(">I", len(header)) + header + blob


def header_block_bytes(bbox: list[float] | None, required: list[str],
                       optional: list[str], writingprogram: str = "osm-io-spark",
                       compress: bool = True, source: str | None = None,
                       osmosis_replication_timestamp: int | None = None,
                       osmosis_replication_sequence_number: int | None = None,
                       osmosis_replication_base_url: str | None = None) -> bytes:
    """HeaderBlock incl. the osmosis replication state (FileInfo round-
    trip, file_info.rs:4-14 / osm_header.rs:63-88): fields 17/32/33/34
    re-emitted so incremental-update pipelines can resume from the
    sequence number recorded in the file they produced."""
    body = b""
    if bbox is not None:
        left, bottom, right, top = bbox
        bb = (P.field_sint(1, int(round(left * 1e9)))
              + P.field_sint(2, int(round(right * 1e9)))
              + P.field_sint(3, int(round(top * 1e9)))
              + P.field_sint(4, int(round(bottom * 1e9))))
        body += P.field_len(1, bb)
    for s in required:
        body += P.field_len(4, s.encode())
    for s in optional:
        body += P.field_len(5, s.encode())
    body += P.field_len(16, writingprogram.encode())
    if source is not None:
        body += P.field_len(17, source.encode())
    if osmosis_replication_timestamp is not None:
        body += P.field_varint(
            32, int(osmosis_replication_timestamp) & 0xFFFFFFFFFFFFFFFF)
    if osmosis_replication_sequence_number is not None:
        body += P.field_varint(
            33, int(osmosis_replication_sequence_number) & 0xFFFFFFFFFFFFFFFF)
    if osmosis_replication_base_url is not None:
        body += P.field_len(34, osmosis_replication_base_url.encode())
    return frame_blob("OSMHeader", body, compress)


# ---------------------------------------------------------------------------
# Spark writer
# ---------------------------------------------------------------------------

_BLOCK_OUT = T.StructType([
    T.StructField("pid", T.IntegerType(), False),
    T.StructField("seq", T.LongType(), False),
    T.StructField("data", T.BinaryType(), False),
])


def _encode_partitions(elements: DataFrame, compress: bool) -> DataFrame:
    """Range-partition on the global order, then encode each partition's
    sorted run of elements into ≤8000-element same-type blobs IN PLACE —
    no per-type window (a planet has ~10^11 nodes; `Window.partitionBy(
    etype)` would funnel them through one task), no groupBy shuffle, no
    second pass. Partition-edge blocks may hold <8000 elements, which
    the format permits; type purity and global order are preserved
    because range partitions tile the (rank, id, version) total order.
    """
    rank = (F.when(F.col("etype") == "node", 0)
            .when(F.col("etype") == "way", 1).otherwise(2))
    spark = elements.sparkSession
    parts = max(spark.sparkContext.defaultParallelism,
                elements.rdd.getNumPartitions())
    df = (elements.withColumn("_rank", rank)
          .repartitionByRange(parts, "_rank", "id", "version")
          .sortWithinPartitions("_rank", "id", "version")
          .withColumn("_pid", F.spark_partition_id()))

    def _encode(batches):
        pid = None
        seq = 0
        pending: list[pd.DataFrame] = []
        pending_rows = 0

        def flush():
            nonlocal pending, pending_rows, seq
            if not pending:
                return None
            pdf = pd.concat(pending, ignore_index=True) if len(pending) > 1 else pending[0]
            pending, pending_rows = [], 0
            out = pd.DataFrame({"pid": [pid], "seq": [seq],
                                "data": [encode_block(pdf, compress=compress)]})
            seq += 1
            return out

        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            pdf = pdf.drop(columns=["_rank", "_pid"])
            # split the sorted batch at type changes and the 8000 cap
            while len(pdf):
                etype = pdf["etype"].iloc[0]
                run = int((pdf["etype"] == etype).values.argmin()) or len(pdf)
                take = min(run, BLOCK_SIZE - pending_rows)
                if pending_rows and pending[0]["etype"].iloc[0] != etype:
                    out = flush()
                    if out is not None:
                        yield out
                    take = min(run, BLOCK_SIZE)
                pending.append(pdf.iloc[:take])
                pending_rows += take
                pdf = pdf.iloc[take:]
                if pending_rows >= BLOCK_SIZE:
                    out = flush()
                    if out is not None:
                        yield out
        out = flush()
        if out is not None:
            yield out

    return df.mapInPandas(_encode, schema=_BLOCK_OUT)


def write_pbf(elements: DataFrame, path: str, compress: bool = True,
              history: bool = False, bbox: list[float] | None = None,
              file_info: dict | None = None) -> int:
    """Unified element DataFrame → .osm.pbf file. Returns #data blocks.

    ``file_info`` (the dict shape returned by decode.read_header) passes
    through writingprogram/source and the osmosis replication state so
    a read→write pipe preserves header metadata field-exact.

    Global order Node < Way < Relation then (id, version) — the
    Sort.Type_then_ID contract. Blocks encode in parallel on executors;
    the driver streams them back in block order and appends (the
    reference's ordering-buffer semantics via sorted partitions).
    """
    if bbox is None:
        agg = (elements.filter(F.col("etype") == "node")
               .agg(F.min("lon"), F.min("lat"), F.max("lon"), F.max("lat"))
               .collect()[0])
        bbox = [agg[0], agg[1], agg[2], agg[3]] if agg[0] is not None else None

    # Materialize the blob frame IN PARALLEL (persist + count), then
    # stream it to the file: toLocalIterator alone would compute the
    # partitions one-by-one, serializing the whole encode. The cached
    # frame holds only encoded blobs (≈ output file size, spills to
    # disk), and partitions drain in partition order — range partitions
    # tile the global (type, id, version) order, so the stream is
    # already the file order (the reference's ordering buffer for free).
    from pyspark import StorageLevel
    enc = _encode_partitions(elements, compress).persist(
        StorageLevel.MEMORY_AND_DISK)
    enc.count()

    required = ["OsmSchema-V0.6", "DenseNodes"]
    if history:
        required.append("HistoricalInformation")
    fi = file_info or {}
    n_blocks = 0
    # Drain strategy: the blob frame is ≈ the compressed output file.
    # When it fits comfortably in driver memory, ONE collect() beats
    # toLocalIterator by ~20x (the iterator schedules a sequential
    # mini-job per partition — measured 2.8s vs 0.14s on a 287-blob
    # file); beyond the guard, stream partitions (planet-scale single-
    # file output is inherently a sequential drain — prefer the
    # dir-of-parts layout there).
    total_bytes = enc.agg(F.sum(F.length("data"))).collect()[0][0] or 0
    try:
        with open(path, "wb") as f:
            f.write(header_block_bytes(
                bbox, required, ["Sort.Type_then_ID"], compress=compress,
                writingprogram=fi.get("writingprogram") or "osm-io-spark",
                source=fi.get("source"),
                osmosis_replication_timestamp=fi.get(
                    "osmosis_replication_timestamp"),
                osmosis_replication_sequence_number=fi.get(
                    "osmosis_replication_sequence_number"),
                osmosis_replication_base_url=fi.get(
                    "osmosis_replication_base_url")))
            if total_bytes < 2_000_000_000:
                for row in sorted(enc.collect(),
                                  key=lambda r: (r["pid"], r["seq"])):
                    f.write(bytes(row["data"]))
                    n_blocks += 1
            else:
                for row in enc.toLocalIterator():
                    f.write(bytes(row["data"]))
                    n_blocks += 1
    finally:
        enc.unpersist()
    return n_blocks
