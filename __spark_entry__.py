"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship spatial cell-join (images × polygons →
exact containment, SURVEY.md J7) at sf0.001. ``queries``/``oracle_sql``
expose the full operator registry from ``osm_io_spark.queries``; every
oracle is ANSI SQL DuckDB executes over the same parquet views.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from osm_io_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_entry_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
