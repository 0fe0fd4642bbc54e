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


def cascade_aggs(aggs):
    """(leaf_aggs, re_aggs) Column lists for a cascaded (hypertable)
    rollup: the leaf table is aggregated once at the finest level and
    every coarser level re-aggregates the previous PARTIAL. Only
    re-aggregable kinds are accepted — count cascades as sum-of-counts,
    sum as sum-of-sums, min/max as themselves. Float sums are not
    cascade-exact (fp addition is non-associative): pass an integral
    column when bit-exact parity matters. Shared by the S2 multires
    rollup (spatial_join.s2_multires_rollup) and the slippy tile
    pyramid (tiles.tile_pyramid_rollup)."""
    from pyspark.sql import functions as F

    leaf_aggs, re_aggs = [], []
    for alias, (kind, col) in aggs.items():
        col = F.col(col) if isinstance(col, str) else col
        if kind == "count":
            leaf_aggs.append(F.count(F.lit(1)).alias(alias))
            re_aggs.append(F.sum(alias).alias(alias))
        elif kind == "sum":
            leaf_aggs.append(F.sum(col).alias(alias))
            re_aggs.append(F.sum(alias).alias(alias))
        elif kind in ("min", "max"):
            fn = getattr(F, kind)
            leaf_aggs.append(fn(col).alias(alias))
            re_aggs.append(fn(alias).alias(alias))
        else:
            raise ValueError(f"non-re-aggregable agg kind: {kind!r}")
    return leaf_aggs, re_aggs
