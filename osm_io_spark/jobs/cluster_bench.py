"""Clustering-family evidence: throughput + two-parallelism scaling
for the round-5f operators (operators/cluster.py — spatial DBSCAN and
the conflation dissolve).

    python -m osm_io_spark.jobs.cluster_bench --out BENCH/CLUSTER.md

Methodology is scaling_bench's (no real cluster in the sandbox: the
IDENTICAL job runs at local[N] and local[4N] in separate JVMs via
subprocess, efficiency = (thr_N / thr_4N) / 4; check ``uptime`` before
trusting any number on this shared box; one subprocess per (stage,
parallelism) cell — tiles_bench showed same-JVM stages inherit heap/GC
state). Corpora are range-generated and identical at both levels:

- ``control``  pure-codegen groupBy count on the same range — the
               box's scaling ceiling, reported next to every number
               per CLAUDE.md.
- ``dbscan``   full DBSCAN over n points in n/16 tight 16-point
               cliques (cluster diameter ≪ eps, so every point is
               core and the CC sees n/16 components): candidate
               self-join + degree agg + CC + assembly, end to end.
- ``dissolve`` full dissolve over m rects in 8-long overlap CHAINS
               (rect i overlaps i±1 only — transitivity must come
               from the closure, the adversarial shape for one-round
               label propagation).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_EPS = 0.02      # res 13 grid (cell 0.0220°x0.0440°) — cells match
_MIN_PTS = 6     # cluster spacing, so the 3x3 disk sees ~one clique


def _points(spark, n: int, parts: int):
    """n points in n/16 TRULY ISOLATED cliques: site centers on a
    disjoint slot grid (2800 x-slots × 0.1°, y-slots × 0.1° — slot
    spacing 5× eps, so no two cliques ever share a candidate pair;
    the first version's prime-modular lattice packed sites 0.0009°
    apart and silently merged everything into giant blobs, 132M
    candidates instead of ~32M). Offsets within ±0.004° keep a
    clique's diameter (< 0.012°) inside eps = 0.02°. Supports
    n ≤ 48M (1080 y-rows)."""
    from pyspark.sql import functions as F

    n_sites = n // 16
    site = F.col("id") % n_sites
    clat = (site / 2800).cast("long").cast("double") * 0.1 - 54.0
    clon = (site % 2800).cast("double") * 0.1 - 140.0
    olat = ((F.col("id") * 48271) % 8001).cast("double") / 1e6 - 0.004
    olon = ((F.col("id") * 69621) % 8001).cast("double") / 1e6 - 0.004
    return (spark.range(0, n, 1, parts)
            .select(F.col("id").alias("pt_id"),
                    (clat + olat).alias("lat"),
                    (clon + olon).alias("lon")))


def _rects(spark, m: int, parts: int):
    """m rects in m/8 chains of 8: chain anchors on a DISJOINT slot
    grid (700 x-slots × 0.4°, y-slots × 0.1° — chain span 0.33° and
    rect height 0.05° stay inside a slot, so chains never touch each
    other; a prime-modular lattice here collided massively and merged
    everything into 2 giant components). Member i sits at anchor +
    (i%8)·0.04 with width 0.05 — consecutive members overlap by
    0.01°, non-consecutive never touch. The 8-long chain is the
    adversarial shape for label propagation: the min label needs 7
    hops, right at the auto budget's edge."""
    from pyspark.sql import functions as F

    chain = (F.col("id") / 8).cast("long")
    seq = F.col("id") % 8
    ax = (chain % 700).cast("double") * 0.4 - 140.0
    ay = (chain / 700).cast("long").cast("double") * 0.1 - 54.0
    left = ax + seq.cast("double") * 0.04
    bottom = ay
    return (spark.range(0, m, 1, parts)
            .select(F.col("id").alias("polygon_id"),
                    left.alias("left"), bottom.alias("bottom"),
                    (left + 0.05).alias("right"),
                    (bottom + 0.05).alias("top")))


def run_one(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--m", type=int, default=1_000_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--stage", default="all",
                    choices=["all", "control", "dbscan", "dissolve"])
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from ..operators import cluster as CL
    from ..session import get_spark

    # shuffle partitions sized so the pair-frame sorts fit executor
    # memory: at n=8M the eps-graph is 128M directed pairs, and
    # max(cpus, 8) partitions put 8M-row sorts × 16 concurrent tasks
    # into the 12g heap — UNABLE_TO_ACQUIRE_MEMORY. cpus*8 keeps
    # per-task sorts ~1M rows (the CLAUDE.md spill-aware rule).
    spark = get_spark(f"cluster-bench-{args.cpus}",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus * 8)
    spark.sparkContext.setLogLevel("ERROR")
    parts = args.cpus * 4

    def best(fn):
        b = None
        last = None
        for _ in range(args.repeats):
            t0 = time.time()
            last = fn()
            dt = time.time() - t0
            b = dt if b is None else min(b, dt)
        return b, last

    res = {"cpus": args.cpus, "n_points": args.n, "m_rects": args.m}

    # the control sizes itself independently of n: it exists to read
    # the box's codegen scaling ceiling, which needs enough work to
    # amortize scheduling latency (context_bench uses 200M too)
    control_n = 200_000_000

    def control():
        return (spark.range(0, control_n, 1, parts)
                .groupBy((F.col("id") % 1_000_000).alias("k"))
                .count().count())

    if args.stage in ("all", "control"):
        res["control_s"], _ = best(control)

    def dbscan():
        stats: dict = {}
        out = CL.dbscan(_points(spark, args.n, parts), eps=_EPS,
                        min_pts=_MIN_PTS, id_col="pt_id", stats=stats)
        n_rows = out.count()
        return {"rows": n_rows, **stats}

    if args.stage in ("all", "dbscan"):
        res["dbscan_s"], info = best(dbscan)
        res["dbscan_rows"] = info["rows"]
        res["dbscan_candidates"] = info["candidate_pairs"]
        res["dbscan_cc"] = info["cc"]
        res["dbscan_pts_per_s"] = args.n / res["dbscan_s"]

    def dissolve():
        out = CL.dissolve_rects(_rects(spark, args.m, parts), res=10)
        return out.count()

    if args.stage in ("all", "dissolve"):
        res["dissolve_s"], res["dissolve_components"] = best(dissolve)
        res["dissolve_rects_per_s"] = args.m / res["dissolve_s"]

    print(json.dumps(res))
    return res


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH/CLUSTER.md")
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--m", type=int, default=1_000_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--cpus", type=int, nargs=2, default=(4, 16))
    args = ap.parse_args(argv)

    loads = []
    results = {}
    for cpus in args.cpus:
        loads.append(os.getloadavg())
        merged = {"cpus": cpus}
        for stage in ("control", "dbscan", "dissolve"):
            p = subprocess.run(
                [sys.executable, "-m", "osm_io_spark.jobs.cluster_bench",
                 "--run-one", "--stage", stage, "--cpus", str(cpus),
                 "--n", str(args.n), "--m", str(args.m),
                 "--repeats", str(args.repeats)],
                capture_output=True, text=True, check=True)
            merged.update(json.loads(p.stdout.strip().splitlines()[-1]))
        results[cpus] = merged

    lo, hi = args.cpus
    rl, rh = results[lo], results[hi]

    def eff(key):
        return (rl[key] / rh[key]) / (hi / lo)

    body = [
        "# BENCH/CLUSTER — clustering-family evidence (round 5f)\n",
        "Methodology: scaling_bench's (separate JVM per (stage, "
        f"parallelism) cell, best of {args.repeats}, same input); "
        f"loadavg before runs: {loads[0]} / {loads[1]}.\n",
        f"corpora: DBSCAN — {args.n:,} points in {args.n // 16:,} "
        f"16-point cliques (eps {_EPS}°, min_pts {_MIN_PTS}; "
        f"{rh['dbscan_candidates']:,} exact directed candidates, CC "
        f"{rh['dbscan_cc']}); dissolve — {args.m:,} rects in "
        f"{args.m // 8:,} 8-long overlap chains "
        f"({rh['dissolve_components']:,} components).\n",
        f"| stage | local[{lo}] s | local[{hi}] s | scaling eff |",
        "|---|---|---|---|",
        f"| pure-codegen control | {rl['control_s']:.2f} | "
        f"{rh['control_s']:.2f} | {eff('control_s'):.3f} |",
        f"| spatial_dbscan ({rh['dbscan_rows']:,} labeled) | "
        f"{rl['dbscan_s']:.2f} | {rh['dbscan_s']:.2f} | "
        f"{eff('dbscan_s'):.3f} |",
        f"| overlap_dissolve ({rh['dissolve_components']:,} comps) | "
        f"{rl['dissolve_s']:.2f} | {rh['dissolve_s']:.2f} | "
        f"{eff('dissolve_s'):.3f} |",
        "",
        f"dbscan throughput: {rl['dbscan_pts_per_s']:,.0f} pts/s at "
        f"{lo} threads, {rh['dbscan_pts_per_s']:,.0f} at {hi}; "
        f"dissolve: {rl['dissolve_rects_per_s']:,.0f} rects/s at {lo}, "
        f"{rh['dissolve_rects_per_s']:,.0f} at {hi}.\n",
    ]
    from .mdout import write_preserving
    write_preserving(args.out, "\n".join(body))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    if "--run-one" in sys.argv:
        sys.argv.remove("--run-one")
        run_one()
    else:
        main()
