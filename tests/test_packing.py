"""Sequence packing + exact-substring dedup: invariants and DuckDB
window-SQL parity. These two registry entries live in the engine-native
tail (adding a 51st ORACLES entry would push an oracled entry out of
the driver's 50-entry window), so their oracle parity is pinned HERE
with the same canonicalization the driver uses."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from osm_io_spark import queries as Q
from osm_io_spark.operators import dedup as DD
from osm_io_spark.operators import packing as PK
from osm_io_spark.operators.order import with_running_total

SF_DIR = "/root/testdata/sf0.001"


def _canon(pdf):
    import hashlib
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted("|".join(str(v) for v in t)
                  for t in pdf.astype(str).itertuples(index=False))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck_docs():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')")
    return con


def test_running_total_matches_window(spark):
    """with_running_total == SUM OVER (ORDER BY key ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING) — verified against the single-task
    window on a multi-partition frame with uneven values."""
    df = (spark.range(0, 997, 1, 7)
          .select(F.col("id"), (F.pmod(F.col("id") * 37, F.lit(11)))
                  .cast("long").alias("v")))
    got = {r["id"]: r["rb"]
           for r in with_running_total(df, ["id"], "v", "rb").collect()}
    rows = sorted((r["id"], r["v"]) for r in df.collect())
    acc = 0
    for i, v in rows:
        assert got[i] == acc, f"id={i}"
        acc += v


PACK_SQL = """
WITH counted AS (
  SELECT doc_id,
         CAST(CASE WHEN text = '' THEN 0
              ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_tokens
  FROM documents),
pos AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cb
  FROM counted WHERE n_tokens > 0)
SELECT doc_id, n_tokens, CAST(s.seq_id AS BIGINT) AS seq_id,
       GREATEST(0, s.seq_id * 64 - cb) AS tok_start,
       LEAST(n_tokens, (s.seq_id + 1) * 64 - cb)
         - GREATEST(0, s.seq_id * 64 - cb) AS tok_len,
       GREATEST(0, cb - s.seq_id * 64) AS seq_offset
FROM pos CROSS JOIN
  UNNEST(generate_series(cb // 64, (cb + n_tokens - 1) // 64)) AS s(seq_id)
"""


def test_pack_sequences_duckdb_parity(spark, duck_docs):
    got = Q.q_pack_sequences(spark, SF_DIR).toPandas()
    want = duck_docs.sql(PACK_SQL).df()
    assert len(got) == len(want) > 0
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got) == _canon(want)


def test_pack_sequences_invariants(spark):
    """Structural invariants of the packed layout: every sequence holds
    exactly seq_len tokens except the last; per-doc slices partition
    [0, n_tokens); slices never overlap within a sequence."""
    L = 64
    packed = Q.q_pack_sequences(spark, SF_DIR).toPandas()
    stats = packed.groupby("seq_id")["tok_len"].sum().sort_index()
    assert (stats.iloc[:-1] == L).all()
    assert 0 < stats.iloc[-1] <= L
    for doc_id, g in packed.groupby("doc_id"):
        g = g.sort_values("seq_id")
        n = g["n_tokens"].iloc[0]
        assert g["tok_start"].iloc[0] == 0
        assert (g["tok_start"] + g["tok_len"]).iloc[-1] == n
        # contiguous doc coverage across consecutive sequences
        assert (g["tok_start"].iloc[1:].to_numpy()
                == (g["tok_start"] + g["tok_len"]).iloc[:-1].to_numpy()).all()
    # within-sequence slices tile without overlap
    for seq_id, g in packed.groupby("seq_id"):
        g = g.sort_values("seq_offset")
        ends = (g["seq_offset"] + g["tok_len"]).to_numpy()
        assert (g["seq_offset"].to_numpy()[1:] == ends[:-1]).all()


def test_pack_sequences_rejects_bad_seq_len(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="seq_len"):
        PK.pack_sequences(docs, 0)


SPANS_SQL = f"""
WITH corpus AS ({Q.PARTIAL_SQL}),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
wins AS (
  SELECT doc_id, CAST(gs.i - 1 AS BIGINT) AS pos,
         md5(array_to_string(t[gs.i : gs.i + 7], ' ')) AS wh
  FROM toks CROSS JOIN UNNEST(generate_series(1, len(t) - 7)) AS gs(i)
  WHERE len(t) >= 8),
dup AS (SELECT wh FROM wins GROUP BY wh
        HAVING count(DISTINCT doc_id) >= 2),
marked AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (wh)),
isl AS (SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                 AS g
        FROM marked)
SELECT doc_id, min(pos) AS span_start,
       max(pos) - min(pos) + 8 AS span_len,
       count(*) AS n_windows
FROM isl GROUP BY doc_id, g
"""


def test_repeated_spans_duckdb_parity(spark, duck_docs):
    got = Q.q_dedup_substring(spark, SF_DIR).toPandas()
    want = duck_docs.sql(SPANS_SQL).df()
    assert len(got) == len(want) > 0
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got) == _canon(want)


def test_repeated_spans_hand_case(spark):
    """Hand-checkable: two docs share a 10-token run (k=4 → 7 shared
    windows merging into ONE span per doc); a third doc is disjoint; a
    run repeated only WITHIN one doc is not cross-doc and is ignored."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    docs = spark.createDataFrame(
        [(1, f"a1 a2 {shared} a3 a4"),
         (2, f"{shared} b1 b2 b3"),
         (3, "c1 c2 c3 c4 c5 c6 c7 c8"),
         (4, "r1 r2 r3 r4 x y z r1 r2 r3 r4")],
        "doc_id long, text string")
    got = {(r["doc_id"], r["span_start"]): (r["span_len"], r["n_windows"])
           for r in DD.repeated_window_spans(docs, k=4).collect()}
    # doc1: shared run at token offset 2; doc2: at 0. 10-token run with
    # k=4 → windows at relative 0..6 → span_len 10, n_windows 7
    assert got == {(1, 2): (10, 7), (2, 0): (10, 7)}


PII_SQL = r"""
WITH corpus AS (
  SELECT doc_id, CASE
    WHEN doc_id % 7 = 0 THEN text || ' contact user'
         || CAST(doc_id AS VARCHAR) || '@example.com now'
    WHEN doc_id % 7 = 1 THEN text || ' from 10.0.'
         || CAST(doc_id % 256 AS VARCHAR) || '.1 and 192.168.0.1'
    WHEN doc_id % 7 = 2 THEN text || ' call 555-867-5309'
    ELSE text END AS text
  FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'),
    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed,
  CAST(len(regexp_extract_all(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
    AS n_emails,
  CAST(len(regexp_extract_all(text,
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text,
    '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones
FROM corpus
"""


def test_pii_scrub_duckdb_parity(spark, duck_docs):
    got = Q.q_text_pii_scrub(spark, SF_DIR).toPandas()
    want = duck_docs.sql(PII_SQL).df()
    assert len(got) == len(want) > 0
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got) == _canon(want)
    # the injected residue classes actually exercise every pattern
    assert got["n_emails"].sum() > 0
    assert got["n_ipv4"].sum() > 0
    assert got["n_phones"].sum() > 0


def test_pii_scrub_hand_case(spark):
    from osm_io_spark.operators import textops as TX
    docs = spark.createDataFrame(
        [(1, "mail a.b+c@x-y.co and 1.2.3.4 then 555-123-4567 twice "
             "d@e.io end"),
         (2, "no pii here 123.456 1-2-3")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in TX.pii_scrub(docs).collect()}
    assert rows[1]["n_emails"] == 2
    assert rows[1]["n_ipv4"] == 1
    assert rows[1]["n_phones"] == 1
    assert rows[1]["scrubbed"] == (
        "mail <EMAIL> and <IPV4> then <PHONE> twice <EMAIL> end")
    assert rows[2]["n_emails"] == 0 and rows[2]["n_ipv4"] == 0 \
        and rows[2]["n_phones"] == 0
    assert rows[2]["scrubbed"] == "no pii here 123.456 1-2-3"
