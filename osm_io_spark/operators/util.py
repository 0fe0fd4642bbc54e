"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame, factor: int = 1) -> DataFrame:
    """Ensure at least defaultParallelism·factor partitions before a
    map-heavy stage (hashing, shingling, pandas UDFs, cross joins).

    Small benchmark tables arrive as 1-2 parquet splits, which would pin
    all map-side work to 1-2 cores; at production scale (100 TB → many
    thousands of splits) the guard makes this a no-op, so the extra
    shuffle is only ever paid when it is trivially cheap.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
