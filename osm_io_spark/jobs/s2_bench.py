"""S2 encode throughput + cap-cover quality evidence.

The 30-level Hilbert encode is a pure-Column projection chain stepping
4 levels per LOOKUP4 table lookup (no UDF, no shuffle — BENCH/PLANS.md
pins the plan); this job measures its
codegen throughput at two parallelism levels on a generated probe, and
the cap cover's candidate precision (exact hits / cover candidates)
against dense sampling:

    python -m osm_io_spark.jobs.s2_bench --n 20000000 --out BENCH/S2.md

Deterministic input (hash-mixed grid directions), no external data.
Separate JVM per parallelism level; best-of-N wall; a pure-codegen
control (`sum(pmod)`) in the same JVM gives the box's own ceiling, as
in BENCH/BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

import numpy as np

from .mdout import write_preserving

_WORKER = """
import json, sys, time
from pyspark.sql import functions as F
from osm_io_spark.session import get_spark
from osm_io_spark.functions import s2

n, cpus, repeats = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark("s2-bench", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")

# Non-periodic directions (seeded xxhash64 mixes, full-range doubles).
# The probe is REBUILT fresh for every timed run: repeated .collect()
# on the SAME DataFrame object reuses AQE's materialized shuffle
# stages, so the pre-shuffle encode (the thing being measured!) would
# only run once and every repeat after warm-up would time ~nothing
# (observed: 0.077s/"260M ids/s" at 20M rows — an artifact).
def probe():
    df = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), 2000000) / 1000000.0 - 1.0 + 1e-7).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 2000000) / 1000000.0 - 1.0 + 1e-7).alias("y"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 2000000) / 1000000.0 - 1.0 + 1e-7).alias("z"))
    out = s2.with_s2_cell(df, F.col("x"), F.col("y"), F.col("z"))
    return out.agg(F.expr("bit_xor(s2_cell)").alias("h"))

def control():
    return spark.range(n).agg(
        F.sum(F.pmod(F.col("id") * 48271, 97)).alias("s"))

def timed(build):
    build().collect()  # warm-up: codegen compile + JIT
    best = None
    for _ in range(repeats):
        q = build()
        t0 = time.time()
        q.collect()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best

best = timed(probe)
cbest = timed(control)
print(json.dumps({"cpus": cpus, "seconds": best, "rows_per_sec": n / best,
                  "control_seconds": cbest}))
spark.stop()
"""


_JOIN_WORKER = """
import json, sys, time
import numpy as np
from pyspark.sql import functions as F
from osm_io_spark.session import get_spark
from osm_io_spark.functions import s2 as S2
from osm_io_spark.operators import spatial_join as SJ
from osm_io_spark import queries as Q

sf_dir, cpus, repeats = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
spark = get_spark("s2-join-bench", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
w = spark.range(0, 256, 1, cpus)
w.mapInPandas(lambda it: it, w.schema).count()  # python-worker warm-up

# Stage decomposition of the three S2 bench rows (round-5 verdict task
# #7): the registry functions interleave cover planning, the eager
# checkpoint materialization of the 30-level encode, and the actual
# join, so a regression in the ~5s bench rows was unattributable. This
# re-expresses each query with explicit stage boundaries (mirroring
# queries.q_s2_containment_join / q_s2_cap_cover_join /
# q_s2_polygon_cover_join line by line); every repeat rebuilds all
# frames fresh (same-object re-collect reuses AQE shuffle stages).

def containment_stages():
    t = {}
    t0 = time.time()
    pts = (Q._s2_points(spark, sf_dir, ("l_orderkey", "l_quantity"))
           .localCheckpoint(eager=False))
    pts.count()
    t["encode+checkpoint"] = time.time() - t0
    t0 = time.time()
    cov4 = (pts.filter(F.col("l_orderkey") % 97 == 0)
            .select(S2.s2_parent_col(F.col("s2_cell"), 4).alias("cover_id"))
            .distinct())
    cov8 = (pts.filter(F.col("l_orderkey") % 193 == 0)
            .select(S2.s2_parent_col(F.col("s2_cell"), 8).alias("cover_id"))
            .distinct())
    covers = cov4.unionByName(cov8).localCheckpoint(eager=False)
    covers.count()
    t["cover build"] = time.time() - t0
    t0 = time.time()
    joined = SJ.s2_containment_join(pts, covers)
    (joined.groupBy("cover_id")
     .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
     .count())
    t["join+agg"] = time.time() - t0
    return t

def cap_stages():
    t = {}
    t0 = time.time()
    cover_rows = [(cid, int(cell)) for cid, la, lo, r in Q._S2_CAPS
                  for cell in S2.s2_cover_cap_np(la, lo, r, max_level=10,
                                                 max_cells=256)]
    t["cover planning (driver)"] = time.time() - t0
    covers = spark.createDataFrame(cover_rows, "cap_id INT, cover_id LONG")
    caps = spark.createDataFrame(list(Q._S2_CAPS),
                                 "cap_id INT, cap_lat DOUBLE, "
                                 "cap_lon DOUBLE, cap_r DOUBLE")
    t0 = time.time()
    img = Q.images_probe(spark, sf_dir)
    x, y, z = S2.latlon_xyz_cols(F.col("lat"), F.col("lon"))
    pts = S2.with_s2_cell(
        img.select("img_id", x.alias("px"), y.alias("py"), z.alias("pz")),
        F.col("px"), F.col("py"), F.col("pz")).localCheckpoint(eager=False)
    pts.count()
    t["encode+checkpoint"] = time.time() - t0
    t0 = time.time()
    cand = SJ.s2_containment_join(pts, covers)
    qx, qy, qz = S2.latlon_xyz_cols(F.col("cap_lat"), F.col("cap_lon"))
    dot = (F.col("px") * qx + F.col("py") * qy + F.col("pz") * qz)
    hit = F.when(dot >= F.cos(F.col("cap_r")), 1).otherwise(0)
    (cand.join(F.broadcast(caps), "cap_id").groupBy("cap_id")
     .agg(F.count(F.lit(1)).alias("nc"), F.sum(hit).alias("ni")).count())
    t["join+refine+agg"] = time.time() - t0
    return t

def polygon_stages():
    t = {}
    t0 = time.time()
    cover_rows = [(pid, int(cell)) for pid, las, los in Q._S2_POLYS
                  for cell in S2.s2_cover_polygon_np(
                      np.asarray(las), np.asarray(los),
                      max_level=10, max_cells=256)]
    t["cover planning (driver)"] = time.time() - t0
    covers = spark.createDataFrame(cover_rows, "poly_id INT, cover_id LONG")
    t0 = time.time()
    img = Q.images_probe(spark, sf_dir)
    x, y, z = S2.latlon_xyz_cols(F.col("lat"), F.col("lon"))
    pts = S2.with_s2_cell(
        img.select("img_id", x.alias("px"), y.alias("py"), z.alias("pz")),
        F.col("px"), F.col("py"), F.col("pz")).localCheckpoint(eager=False)
    pts.count()
    t["encode+checkpoint"] = time.time() - t0
    t0 = time.time()
    cand = SJ.s2_containment_join(pts, covers)
    import pandas as pd
    polys = {pid: np.stack(S2._latlon_xyz_np(np.asarray(las),
                                             np.asarray(los)), axis=1)
             for pid, las, los in Q._S2_POLYS}
    def refine(batches):
        for b in batches:
            pid_arr = b["poly_id"].to_numpy()
            hit = np.zeros(len(b), np.int32)
            for pid, verts in polys.items():
                m = pid_arr == pid
                if m.any():
                    hit[m] = S2.point_in_spherical_polygon_np(
                        b["px"].to_numpy()[m], b["py"].to_numpy()[m],
                        b["pz"].to_numpy()[m], verts).astype(np.int32)
            yield pd.DataFrame({"poly_id": pid_arr, "hit": hit})
    (cand.select("poly_id", "px", "py", "pz")
     .mapInPandas(refine, "poly_id int, hit int")
     .groupBy("poly_id").agg(F.count(F.lit(1)).alias("nc"),
                             F.sum("hit").alias("ni")).count())
    t["join+refine+agg"] = time.time() - t0
    return t

def distance_stages():
    # mirrors queries.q_s2_distance_join / SJ.s2_distance_join line by
    # line with explicit stage boundaries (r5e)
    t = {}
    t0 = time.time()
    sites = (Q._t(spark, sf_dir, "nation")
             .select(F.col("n_nationkey").cast("long").alias("site_id"))
             .distinct()
             .withColumn("slat", F.expr(Q._SLAT))
             .withColumn("slon", F.expr(Q._SLON)))
    rows = sites.take(65537)
    rad = Q._DIST_RADIUS_M / 6371008.8
    cover_rows = [(r["site_id"], int(c)) for r in rows
                  for c in S2.s2_cover_cap_np(r["slat"], r["slon"], rad,
                                              max_level=10, max_cells=64)]
    t["cover planning (driver)"] = time.time() - t0
    covers = spark.createDataFrame(cover_rows, "site_id long, cover_id long")
    t0 = time.time()
    img = Q.images_probe(spark, sf_dir)
    x, y, z = S2.latlon_xyz_cols(F.col("lat"), F.col("lon"))
    pts = S2.with_s2_cell(img, x, y, z).localCheckpoint(eager=False)
    pts.count()
    t["encode+checkpoint"] = time.time() - t0
    t0 = time.time()
    from osm_io_spark.operators.measures import haversine_m
    cand = SJ.s2_containment_join(pts, covers)
    head = spark.createDataFrame(rows)
    dist = haversine_m(F.col("lat"), F.col("lon"),
                       F.col("slat"), F.col("slon"))
    (cand.join(F.broadcast(head), "site_id")
     .filter(dist <= F.lit(Q._DIST_RADIUS_M)).count())
    t["join+refine+agg"] = time.time() - t0
    return t

out = {}
for name, fn in (("s2_containment_join", containment_stages),
                 ("s2_cap_cover_join", cap_stages),
                 ("s2_polygon_cover_join", polygon_stages),
                 ("s2_distance_join", distance_stages)):
    best = None
    for _ in range(repeats):
        t = fn()
        if best is None or sum(t.values()) < sum(best.values()):
            best = t
    out[name] = {k: round(v, 3) for k, v in best.items()}
print(json.dumps(out))
spark.stop()
"""


def run(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    # the JIT'd LOOKUP4 chain sustains ~3M ids/s/core, so small n is
    # pure task overhead — default deep enough that local[32] still
    # runs whole seconds
    ap.add_argument("--n", type=int, default=400_000_000)
    ap.add_argument("--cpus", type=int, nargs=2, default=(8, 32))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1",
                    help="sf dir for the join-stage decomposition")
    ap.add_argument("--join-cpus", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    levels = {}
    for cpus in args.cpus:
        res = subprocess.run(
            [sys.executable, "-c", _WORKER, str(args.n), str(cpus),
             str(args.repeats)],
            capture_output=True, text=True, check=True)
        levels[cpus] = json.loads(res.stdout.strip().splitlines()[-1])

    # cap-cover quality: exact in-cap fraction of the cover candidates
    from ..functions import s2 as S2
    rng = np.random.default_rng(17)
    cover_rows = []
    for lat0, lon0, rad in ((43.1, -79.2, 0.05), (41.0, 45.0, 0.12),
                            (-35.7, 149.2, 0.08)):
        cover = S2.s2_cover_cap_np(lat0, lon0, rad, max_level=10,
                                   max_cells=256)
        m = 400_000
        lat = rng.uniform(max(-89.9, lat0 - 10), min(89.9, lat0 + 10), m)
        lon = (rng.uniform(lon0 - 15, lon0 + 15, m) + 180.0) % 360.0 - 180.0
        phi, th = np.radians(lat), np.radians(lon)
        px = np.cos(phi) * np.cos(th)
        py = np.cos(phi) * np.sin(th)
        pz = np.sin(phi)
        q0, q1 = np.radians(lat0), np.radians(lon0)
        dist = np.arccos(np.clip(
            px * np.cos(q0) * np.cos(q1) + py * np.cos(q0) * np.sin(q1)
            + pz * np.sin(q0), -1, 1))
        leaf = S2.s2_from_latlon_np(lat, lon)
        rn, rx = S2.s2_range_np(cover)
        inside = np.zeros(m, bool)
        for a, b in zip(rn, rx):
            inside |= (leaf >= a) & (leaf <= b)
        n_cand = int(inside.sum())
        n_hit = int((dist <= rad).sum())
        assert not np.any((dist <= rad) & ~inside)  # completeness
        cover_rows.append({"cap": f"({lat0}, {lon0}, r={rad})",
                           "cells": len(cover),
                           "levels": sorted(set(
                               S2.s2_level_np(cover).tolist())),
                           "candidates": n_cand, "exact_hits": n_hit,
                           "precision": round(n_hit / max(1, n_cand), 4)})

    # polygon-cover quality: exact in-polygon fraction of the cover
    # candidates, same sampling discipline (registry polygons)
    from ..queries import _S2_POLYS
    poly_rows = []
    for pid, las, los in _S2_POLYS:
        cover = S2.s2_cover_polygon_np(np.asarray(las), np.asarray(los),
                                       max_level=10, max_cells=256)
        m = 400_000
        lat = rng.uniform(max(-89.9, min(las) - 8),
                          min(89.9, max(las) + 8), m)
        lon = rng.uniform(-180.0, 180.0, m)
        px, py, pz = S2._latlon_xyz_np(lat, lon)
        vx, vy, vz = S2._latlon_xyz_np(np.asarray(las), np.asarray(los))
        verts = np.stack([vx, vy, vz], axis=1)
        in_poly = S2.point_in_spherical_polygon_np(px, py, pz, verts)
        leaf = S2.s2_from_latlon_np(lat, lon)
        rn, rx = S2.s2_range_np(cover)
        inside = np.zeros(m, bool)
        for a, b in zip(rn, rx):
            inside |= (leaf >= a) & (leaf <= b)
        n_cand = int(inside.sum())
        n_hit = int(in_poly.sum())
        assert not np.any(in_poly & ~inside)  # completeness
        poly_rows.append({"polygon": f"poly_{pid} ({len(las)} verts)",
                          "cells": len(cover),
                          "levels": sorted(set(
                              S2.s2_level_np(cover).tolist())),
                          "candidates": n_cand, "exact_hits": n_hit,
                          "precision": round(n_hit / max(1, n_cand), 4)})

    # join-stage decomposition (separate JVM, same discipline)
    jres = subprocess.run(
        [sys.executable, "-c", _JOIN_WORKER, args.sf_dir,
         str(args.join_cpus), str(args.repeats)],
        capture_output=True, text=True, check=True)
    join_stages = json.loads(jres.stdout.strip().splitlines()[-1])

    lo, hi = sorted(levels)
    eff = (levels[hi]["rows_per_sec"] / levels[lo]["rows_per_sec"]) / (hi / lo)
    ceff = (levels[lo]["control_seconds"] / levels[hi]["control_seconds"]) / (hi / lo)
    result = {"encode": levels, "efficiency": round(eff, 3),
              "control_efficiency": round(ceff, 3), "covers": cover_rows,
              "polygon_covers": poly_rows, "join_stages": join_stages}
    print(json.dumps(result))

    if args.out:
        md = ["# BENCH/S2 — true S2 encode throughput + cap cover quality",
              "",
              f"Encode: `with_s2_cell` over {args.n:,} generated directions "
              f"(pure-Column LOOKUP4 Hilbert chain; plan in "
              f"BENCH/PLANS.md). Best of {args.repeats} after warm-up, "
              "probe REBUILT per run (same-object re-collect reuses AQE "
              "shuffle stages and times nothing), separate JVM per "
              "level; control = `sum(pmod)` same JVM.",
              "",
              "| parallelism | wall s | ids/s | control s |",
              "|---|---|---|---|"]
        for cpus in sorted(levels):
            r = levels[cpus]
            md.append(f"| local[{cpus}] | {r['seconds']:.3f} | "
                      f"{r['rows_per_sec']:,.0f} | "
                      f"{r['control_seconds']:.3f} |")
        md.append(f"| | | **efficiency {eff:.3f}** | control {ceff:.3f} |")
        md += ["", "Cap covers (max_level=10, max_cells=256; completeness "
               "asserted against 400k sampled points per cap):", "",
               "| cap | cells | levels | candidates | exact hits | precision |",
               "|---|---|---|---|---|---|"]
        for c in cover_rows:
            md.append(f"| {c['cap']} | {c['cells']} | {c['levels']} | "
                      f"{c['candidates']:,} | {c['exact_hits']:,} | "
                      f"{c['precision']} |")
        md += ["", "Polygon covers (registry polygons: face-corner "
               "triangle, antimeridian quad, concave L, southern quad; "
               "same sampling discipline):", "",
               "| polygon | cells | levels | candidates | exact hits "
               "| precision |",
               "|---|---|---|---|---|---|"]
        for c in poly_rows:
            md.append(f"| {c['polygon']} | {c['cells']} | {c['levels']} | "
                      f"{c['candidates']:,} | {c['exact_hits']:,} | "
                      f"{c['precision']} |")
        md += ["", f"S2 join bench rows decomposed by stage (sf dir "
               f"`{args.sf_dir}`, local[{args.join_cpus}], best total of "
               f"{args.repeats} rebuilds — attributes any future "
               "regression in the ~5s rows to cover planning, the eager "
               "30-level-encode checkpoint, or the join itself):", "",
               "| query | stage | seconds |",
               "|---|---|---|"]
        for qname, stages in join_stages.items():
            for sname, secs in stages.items():
                md.append(f"| {qname} | {sname} | {secs} |")
            md.append(f"| {qname} | **total** | "
                      f"**{round(sum(stages.values()), 3)}** |")
        md += ["", "Reproduce:", "",
               f"    python -m osm_io_spark.jobs.s2_bench --n {args.n} "
               f"--out BENCH/S2.md", ""]
        write_preserving(args.out, "\n".join(md))
    return result


if __name__ == "__main__":
    run()
