"""Bucketed co-located joins (SURVEY.md §4 "Partitioning & shuffle").

At 10^12 rows the dominant cost of a fact-fact join is shuffling both
sides. Writing both tables bucketed (and sorted) on the join key makes
the join a zero-exchange sort-merge over co-located buckets: each task
reads bucket i of A and bucket i of B — the Spark-native equivalent of
the reference's pre-sorted merge-join inputs (its apidb reader
externally sorts every table by pkey before its streaming merge joins,
/root/reference/src/osm/apidb_dump/read/reader.rs:71-86).

The layout survives restarts (it's a table property in the metastore),
so repeated joins against a bucketed fact table never pay the shuffle
again — the write-once/join-many trade that pays for itself after one
reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   n_buckets: int = 32) -> None:
    """Persist df as a parquet table bucketed + sorted on ``key``."""
    keys = [key] if isinstance(key, str) else list(key)
    (df.write.mode("overwrite").format("parquet")
     .bucketBy(n_buckets, *keys).sortBy(*keys)
     .saveAsTable(table))


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables — planned as a zero-exchange SMJ
    (asserted in tests/test_plan_audit.py)."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table),
                                        on=keys, how=how)
