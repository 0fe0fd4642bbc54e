"""Connected-components round-count evidence (dedup_clusters).

Two CC algorithms ship behind dedup_clusters (operators/dedup.py):
hash-min label propagation (O(diameter) rounds — cheap per round, wins
on the near-clique graphs banded LSH dedup actually produces) and
large-star/small-star contraction (O(log n) rounds on ANY shape — the
escape hatch for adversarial long chains, where propagation would need
diameter/2 driver-synchronous materializations and correctly refuses
via its convergence guard instead of mislabeling).

This job measures ROUNDS and wall time for both on both graph shapes
at a configurable scale and writes the evidence table:

    python -m osm_io_spark.jobs.cc_bench --n 1000000 --out BENCH/CC.md

Graphs (deterministic, no external data):
  * chain:       1-2-3-...-n (diameter n-1, the propagation worst case)
  * near-clique: n/m clusters of m vertices, each vertex linked to its
    cluster head and its predecessor (diameter 2, avg degree ~3.7 — the
    shape real near-dup pair graphs take)
"""
from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F

from ..operators.dedup import dedup_clusters
from ..session import get_spark


def run(argv: list[str] | None = None) -> list[dict]:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--m", type=int, default=20,
                    help="near-clique cluster size")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", default=None)
    args = ap.parse_args(argv)

    spark = get_spark("cc-bench", master=(
        f"local[{args.cpus}]" if args.cpus else None))
    spark.sparkContext.setLogLevel("ERROR")
    n, m = args.n, args.m
    par = spark.sparkContext.defaultParallelism * 2
    rows: list[dict] = []

    def timed(graph, method, pairs, verts, check):
        stats: dict = {}
        t0 = time.perf_counter()
        out = dedup_clusters(pairs, verts, method=method, stats=stats)
        ok = check(out)
        ran = stats.get("method")
        if stats.get("fallback"):
            ran = (f"{ran} (fallback after "
                   f"{stats['propagation_rounds']} propagation rounds)")
        rows.append({"graph": graph, "requested": method,
                     "ran": ran,
                     "rounds": stats.get("rounds"),
                     "s": round(time.perf_counter() - t0, 2),
                     "verified": bool(ok)})
        print(f"# {graph} {method}: ran={stats.get('method')} "
              f"rounds={stats.get('rounds')} {rows[-1]['s']}s ok={ok}",
              flush=True)

    # adversarial chain, diameter n-1: star must converge in O(log n)
    # materializations; explicit propagation at default max_iter=50
    # would cover only diameter 100 and raises (guard tested in
    # tests/test_ann.py), so it is not run here — that refusal IS its
    # documented behavior. `auto` burns its bounded propagation budget
    # (auto_budget=8 rounds) and then falls back to star.
    chain = (spark.range(1, n, 1, par)
             .select(F.col("id").alias("id_a"),
                     (F.col("id") + 1).alias("id_b")))
    cverts = spark.range(1, n + 1, 1, par).select(F.col("id").alias("doc_id"))
    timed(f"chain n={n:,} (diameter {n - 1:,})", "star", chain, cverts,
          lambda out: out.filter(F.col("cluster_id") == 1).count() == n)
    timed(f"chain n={n:,} (diameter {n - 1:,})", "auto", chain, cverts,
          lambda out: out.filter(F.col("cluster_id") == 1).count() == n)

    # near-clique: the banded-LSH regime both algorithms serve daily
    base = spark.range(0, n, 1, par)
    head = base.filter(F.col("id") % m != 0).select(
        F.col("id").alias("id_a"),
        (F.col("id") - F.col("id") % m).alias("id_b"))
    pred = base.filter(F.col("id") % m >= 2).select(
        F.col("id").alias("id_a"), (F.col("id") - 1).alias("id_b"))
    pairs = head.unionByName(pred)
    nverts = base.select(F.col("id").alias("doc_id"))
    k = (n + m - 1) // m
    for method in ("propagation", "star", "auto"):
        timed(f"near-clique {k:,}x{m}", method, pairs, nverts,
              lambda out: out.filter("keep").count() == k)

    print(json.dumps(rows))
    if args.out:
        from .mdout import write_preserving
        md = ("# dedup_clusters round-count evidence\n\n"
              f"`python -m osm_io_spark.jobs.cc_bench --n {n} --m {m}` on "
              f"local[{spark.sparkContext.defaultParallelism}]. "
              "`rounds` counts driver-synchronous materializations "
              "(propagation does TWO hash-min steps per round). "
              "`verified` asserts the exact component structure "
              "(single component for the chain; one keep per cluster "
              "for the near-clique). Explicit propagation is not run "
              "on the chain: diameter exceeds its budget and it raises "
              "by design (the convergence guard). `auto` is "
              "propagation-first with a bounded budget (8 rounds) and "
              "a star fallback — on the chain it pays the failed "
              "budget then contracts; on the near-clique it IS "
              "propagation with zero extra jobs.\n\n"
              "| graph | requested | ran | rounds | seconds | verified |\n"
              "|---|---|---|---|---|---|\n")
        for r in rows:
            md += (f"| {r['graph']} | {r['requested']} | {r['ran']} | "
                   f"{r['rounds']} | {r['s']} | {r['verified']} |\n")
        write_preserving(args.out, md)
    return rows


if __name__ == "__main__":
    run()
