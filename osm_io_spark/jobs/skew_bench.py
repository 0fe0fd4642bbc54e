"""Skew-handling demonstration: salted vs unsalted cell join under
Zipf-head skew with a non-broadcastable build side.

At 10^12 rows the polygon-cover build side exceeds broadcast limits, so
the cell join becomes a shuffle join — and geodata cell frequencies are
Zipf-distributed (planet hot spots), so ONE cell can hold a double-digit
percentage of all probe rows. AQE's skew-join can split a skewed SMJ
partition at runtime, but only where it applies (plain two-table SMJ; it
declines in bucketed joins, stream-static joins, and multi-join stages)
and only after the skewed shuffle files are written; explicit salting
(spatial_join.salted_cell_join) replicates the build rows of hot cells
n_salt x and scatters their probe rows BEFORE the shuffle, turning the
one straggler reducer into n_salt parallel ones under any join strategy.
Run with --no-aqe-skew for the regime where salting is the only defense.

This bench constructs that regime in miniature: --n-images probe rows
with --hot-frac of them in one cell, broadcast disabled, and times the
unsalted vs salted plans. Prints one JSON line; the salted/unsalted
ratio is the headline.

    python -m osm_io_spark.jobs.skew_bench --n-images 20000000
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F

from ..functions import cells as C
from ..operators import spatial_join as SJ
from ..session import get_spark


def run(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["cell", "bands"], default="cell",
                    help="cell: spatial Zipf-head cell join; bands: "
                         "hamming band self-join over a boilerplate-"
                         "heavy fingerprint corpus (one hot band)")
    ap.add_argument("--n-images", type=int, default=20_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    ap.add_argument("--res", type=int, default=10)
    ap.add_argument("--n-salt", type=int, default=16)
    ap.add_argument("--cpus", default=None)
    ap.add_argument("--no-aqe-skew", action="store_true",
                    help="disable AQE skew-join: the regime where explicit"
                         " salting is the only skew defense")
    args = ap.parse_args(argv)
    if args.mode == "bands":
        return run_bands(args)

    spark = get_spark("skew-bench", master=(
        f"local[{args.cpus}]" if args.cpus else None),
        extra_conf={
            # the at-scale regime: build side too big to broadcast
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.enabled": str(not args.no_aqe_skew).lower(),
        })
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    hot_lat, hot_lon = 48.85, 2.35      # one Zipf-head cell
    hot_cell = int(C.cell_at_np(
        __import__("numpy").array([hot_lat]),
        __import__("numpy").array([hot_lon]), args.res)[0])

    n = args.n_images
    probe = (spark.range(0, n, 1, cores * 4)
             .select(F.col("id").alias("img_id"))
             .withColumn("_u", F.pmod(F.col("img_id") * 2654435761, F.lit(1_000_000)))
             .withColumn("lat", F.when(
                 F.col("_u") < int(args.hot_frac * 1_000_000), F.lit(hot_lat))
                 .otherwise((F.col("_u").cast("double") / 1e4) - 50.0))
             .withColumn("lon", F.when(
                 F.col("_u") < int(args.hot_frac * 1_000_000), F.lit(hot_lon))
                 .otherwise((F.pmod(F.col("img_id") * 2971215073,
                                    F.lit(3_000_000)).cast("double") / 1e4) - 150.0))
             .drop("_u"))
    probe = SJ.tag_probe_cells(probe, args.res)

    # build: one polygon over the hot cell + many cold polygons
    build = (spark.range(0, 50_000)
             .select(F.col("id").alias("polygon_id"))
             .withColumn("cell", F.when(F.col("polygon_id") == 0, F.lit(hot_cell))
                         .otherwise(F.pmod(F.xxhash64("polygon_id"),
                                           F.lit(1 << (2 * args.res)))
                                    + F.lit(1 << (2 * args.res)))))

    def timed(df):
        t0 = time.perf_counter()
        n_out = df.count()
        return round(time.perf_counter() - t0, 3), n_out

    unsalted = probe.join(build, on="cell")
    salted = SJ.salted_cell_join(probe, build, n_salt=args.n_salt,
                                 hot=[hot_cell], probe_key="img_id")
    # force the cold side of the salted plan through the same shuffle
    # join (broadcast is globally disabled above) — identical semantics
    timed(unsalted)  # warm
    t_un, n_un = timed(unsalted)
    t_sa, n_sa = timed(salted)
    assert n_un == n_sa, (n_un, n_sa)

    out = {
        "metric": "skew_salting_speedup",
        "n_images": n,
        "hot_frac": args.hot_frac,
        "n_salt": args.n_salt,
        "cores": cores,
        "aqe_skew_join": not args.no_aqe_skew,
        "unsalted_s": t_un,
        "salted_s": t_sa,
        "speedup": round(t_un / t_sa, 2),
        "n_matches": n_un,
    }
    print(json.dumps(out))
    return out


def run_bands(args) -> dict:
    """Hot-BAND skew: a boilerplate-heavy fingerprint corpus (constant
    image region ⇒ ``hot_frac`` of all 64-bit phashes share one band's
    bits) drives the hamming band self-join. The hot band key holds m
    rows ⇒ m² joined candidates from ONE reducer unsalted — a single
    giant key AQE cannot split (skew-join splits partitions, not keys).
    salted_self_band_join scatters the m² work across n_salt reducers;
    pair sets are identical (asserted)."""
    spark = get_spark("skew-bench-bands", master=(
        f"local[{args.cpus}]" if args.cpus else None),
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.enabled": str(not args.no_aqe_skew).lower(),
        })
    spark.sparkContext.setLogLevel("ERROR")
    from ..operators import dedup as DD

    n = args.n_images
    hot_m = int(n * args.hot_frac)
    # 64-bit fp, max_k=2 ⇒ bands of 22+21+21 bits (hamming_near_dup_pairs
    # gives the remainder bits to the LEADING bands). Boilerplate rows
    # must agree on ALL 22 low bits so the whole hot mass lands on ONE
    # band-0 key (a 21-bit constant would split it across two keys of
    # ~m/2 and halve the skew — ADVICE r2); they are random above, so
    # they collide in band 0 yet almost never pass the exact hamming
    # filter, isolating the join-skew cost from output volume.
    band0_bits = 64 // 3 + 1  # matches the sizes formula in dedup.py
    fp = F.when(
        F.col("doc_id") < hot_m,
        F.shiftleft(F.xxhash64("doc_id"), band0_bits)
        .bitwiseOR(F.lit(0x2AAAAA))
    ).otherwise(F.xxhash64(F.col("doc_id") + F.lit(10_000_000_000)))
    corpus = (spark.range(0, n, 1,
                          spark.sparkContext.defaultParallelism * 4)
              .select(F.col("id").alias("doc_id"))
              .withColumn("fp", fp))

    def timed(df):
        t0 = time.perf_counter()
        n_out = df.count()
        return round(time.perf_counter() - t0, 3), n_out

    unsalted = DD.hamming_near_dup_pairs(corpus, max_k=2, nbits=64,
                                         salt=0)
    # measured salting: 'auto' resolves (n_salt, hot bands) from actual
    # per-band counts, sized so the hot band splits ~n_salt ways
    auto = DD.hamming_near_dup_pairs(
        corpus, max_k=2, nbits=64, salt="auto",
        salt_threshold_rows=max(1000, hot_m // args.n_salt))
    timed(unsalted)  # warm
    t_un, n_un = timed(unsalted)
    t_sa, n_sa = timed(auto)
    assert n_un == n_sa, (n_un, n_sa)

    out = {
        "metric": "band_salting_speedup",
        "mode": "bands",
        "n_rows": n,
        "hot_frac": args.hot_frac,
        "n_salt": args.n_salt,
        "cores": spark.sparkContext.defaultParallelism,
        "aqe_skew_join": not args.no_aqe_skew,
        "unsalted_s": t_un,
        "salted_s": t_sa,
        "speedup": round(t_un / t_sa, 2),
        "n_matches": n_un,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    run()
