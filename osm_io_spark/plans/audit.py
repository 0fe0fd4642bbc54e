"""Physical-plan audit: assert the plans we ship are the plans we want.

The reference hand-builds its physical strategy (thread pools, merge
joins, ordered writers); our engine delegates to Catalyst, so the
scale contract lives in the *plan*: broadcast where a side is small, no
shuffle on the probe path of the flagship join, column-pruned scans.
This module extracts the formatted plan and runs structural checks so
a regression (e.g. a lost broadcast hint turning the flagship join into
a sort-merge shuffle of 10^12 rows) fails loudly in CI, not in prod.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def operator_tree(plan: str) -> str:
    """The physical operator tree (header section) of a formatted plan."""
    return plan.split("\n\n")[0]


def scan_summaries(plan: str) -> list[dict]:
    """One dict per parquet scan: ReadSchema column count + pushed filters."""
    out = []
    for m in re.finditer(
            r"\(\d+\) Scan parquet ?\n(.*?)(?:\n\n|\Z)", plan, re.S):
        body = m.group(1)
        loc = re.search(r"Location:.*?\[(.*?)\]", body)
        schema = re.search(r"ReadSchema: struct<(.*)>", body)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", body)
        cols = [c for c in (schema.group(1) if schema else "").split(",") if ":" in c]
        out.append({
            "location": loc.group(1).rsplit("/", 1)[-1] if loc else "?",
            "n_cols": len(cols),
            "cols": [c.split(":")[0] for c in cols],
            "pushed": pushed.group(1) if pushed else "",
        })
    return out


def count_op(plan: str, op: str) -> int:
    tree = operator_tree(plan)
    return len(re.findall(rf"\b{re.escape(op)}\b", tree))


def audit(df: DataFrame,
          max_shuffles: int | None = None,
          min_broadcast_joins: int | None = None,
          forbid_sort_merge_join: bool = False,
          forbid_cartesian: bool = True,
          max_scan_cols: dict[str, int] | None = None) -> dict:
    """Run structural checks; returns a report dict; raises AssertionError
    with the operator tree attached on violation."""
    plan = formatted_plan(df)
    tree = operator_tree(plan)
    # \bExchange\b matches only the shuffle node — "BroadcastExchange"
    # has no word boundary before "Exchange" and is counted separately
    report = {
        "shuffles": count_op(plan, "Exchange"),
        "broadcast_joins": count_op(plan, "BroadcastHashJoin")
        + count_op(plan, "BroadcastNestedLoopJoin"),
        "sort_merge_joins": count_op(plan, "SortMergeJoin"),
        "cartesian": count_op(plan, "CartesianProduct"),
        "scans": scan_summaries(plan),
    }

    def chk(ok, msg):
        assert ok, f"{msg}\n--- plan ---\n{tree}"

    if max_shuffles is not None:
        chk(report["shuffles"] <= max_shuffles,
            f"{report['shuffles']} shuffle exchanges > allowed {max_shuffles}")
    if min_broadcast_joins is not None:
        chk(report["broadcast_joins"] >= min_broadcast_joins,
            f"expected >= {min_broadcast_joins} broadcast joins, "
            f"got {report['broadcast_joins']}")
    if forbid_sort_merge_join:
        chk(report["sort_merge_joins"] == 0,
            "sort-merge join in a plan that must broadcast")
    if forbid_cartesian:
        chk(report["cartesian"] == 0, "cartesian product in plan")
    for scan in report["scans"]:
        if max_scan_cols and scan["location"] in max_scan_cols:
            cap = max_scan_cols[scan["location"]]
            chk(scan["n_cols"] <= cap,
                f"scan of {scan['location']} reads {scan['n_cols']} cols "
                f"({scan['cols']}) > pruning budget {cap}")
    return report
