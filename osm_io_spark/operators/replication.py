"""Replication diff application — OsmChange semantics over element
frames.

The reference carries osmosis replication state end-to-end
(/root/reference/src/osm/pbf/file_info.rs:11-13 reads/writes
``osmosis_replication_{timestamp,sequence_number,base_url}``; our PBF
encoder mirrors those header fields, sources/pbf/encode.py): a planet
snapshot names the diff sequence that produced it, and the OSM
ecosystem advances a snapshot by APPLYING the next OsmChange diff —
create/modify/delete records keyed by (type, id, version), a delete
being a row with ``visible = false`` (exactly the history model the
reference decodes from history extracts and the apidb schema's
``visible`` column, current_object.rs:18-31).

Spark-first shape: applying a diff is a union + latest-version window
per (type, id) — the ``current_*`` semantics (operators/current.py)
over base ∪ changes with a deterministic tie-break when a diff
re-states an existing version. One hash-partitioned window shuffle on
the element key; no global sort, no driver loop. At 10^12-row scale a
daily diff is ≪1% of the base, so the union is scan-dominated and the
window keys partition uniformly (element ids are dense integers).

``diff_stats`` classifies the diff against the base (created /
modified / deleted / unchanged) with one aggregation per side and a
single join on the element key — the bookkeeping osmium's
apply-changes prints, and the per-partition metrics hook the north
rule asks snapshots to carry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_diff(base: DataFrame, changes: DataFrame,
               key_cols: tuple[str, ...] = ("etype", "id"),
               version_col: str = "version",
               visible_col: str = "visible",
               tie_breakers: tuple[str, ...] = (),
               keep_invisible: bool = False) -> DataFrame:
    """New snapshot = latest (key, version) across base ∪ changes.

    A change row at a version the base already has WINS (diffs are
    authoritative re-statements — osmosis replication may re-send the
    current version), encoded as a source-priority tie-break below the
    version. ``tie_breakers`` adds payload columns to make the order
    total when inputs carry duplicate (key, version) rows (the
    dup-key-aware-oracle rule). Deletes (latest version invisible) are
    dropped unless ``keep_invisible`` — the current_* contract
    (current_object.rs:55-68).
    """
    pri_base = base.withColumn("_src_pri", F.lit(0))
    pri_chg = changes.withColumn("_src_pri", F.lit(1))
    merged = pri_base.unionByName(pri_chg)
    order: list[Column] = [F.col(version_col).desc(), F.col("_src_pri").desc()]
    order += [F.col(c).desc() for c in tie_breakers]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    latest = (merged.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn", "_src_pri"))
    if keep_invisible:
        return latest
    return latest.filter(F.col(visible_col))


def diff_stats(base: DataFrame, changes: DataFrame,
               key_cols: tuple[str, ...] = ("etype", "id"),
               version_col: str = "version",
               visible_col: str = "visible") -> DataFrame:
    """Classify the diff per element type: created (key absent from
    base), deleted (present in base, diff's latest is invisible),
    modified (present, latest visible). One agg per side + one join on
    the key — both sides collapse to one row per key BEFORE the join,
    so the join input is bounded by distinct keys, not row counts.
    """
    def _latest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(version_col).desc(), F.col(visible_col).desc())
        return (df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(*key_cols, F.col(visible_col).alias("_vis")))

    b = _latest(base).withColumnRenamed("_vis", "_base_vis")
    c = _latest(changes).withColumnRenamed("_vis", "_chg_vis")
    joined = c.join(b, on=list(key_cols), how="left")
    action = (F.when(F.col("_base_vis").isNull(),
                     F.when(F.col("_chg_vis"), F.lit("created"))
                     .otherwise(F.lit("deleted_unknown")))
              .when(~F.col("_chg_vis"), F.lit("deleted"))
              .otherwise(F.lit("modified")))
    etype = key_cols[0]
    return (joined.select(F.col(etype), action.alias("action"))
            .groupBy(etype, "action")
            .agg(F.count("*").alias("n")))


def advance_replication_state(sequence_number: int, timestamp: int,
                              n_applied: int) -> dict:
    """The osmosis bookkeeping triple the new snapshot's header carries
    (file_info.rs:11-13): sequence advances by one diff, timestamp to
    the diff's, plus the applied row count for lineage metrics."""
    return {"osmosis_replication_sequence_number": sequence_number + 1,
            "osmosis_replication_timestamp": timestamp,
            "n_changes_applied": n_applied}
