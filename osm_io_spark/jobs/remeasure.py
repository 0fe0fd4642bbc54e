"""Targeted best-of-N re-measurement of specific bench entries.

Round-4 verdict item #3/#6: three entries regressed ≥15% in the r4
driver bench run in the same session where ten others regressed and
twelve improved — the signature of ambient load on this shared VM, not
of a code change. This job re-times ONLY the named entries on demand
with the exact bench.py methodology (same session config, same
construct-in-timer set, same warm-up) at a higher repeat count, and
records uptime/loadavg alongside so the number is interpretable.

    python -m osm_io_spark.jobs.remeasure \
        --queries dedup_embedding_ivf,corpus_curation,dedup_phash_hamming \
        --repeats 5 --out BENCH/R5_REMEASURE.md
"""

from __future__ import annotations

import argparse
import json
import os
import time

from ..benchdefs import BENCH_OVERRIDES, CONSTRUCT_IN_TIMER
from ..session import get_spark


def run(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True,
                    help="comma-separated registry names")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    with open("/proc/loadavg") as f:
        load_before = f.read().split()[:3]

    spark = get_spark("remeasure", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    wdf = spark.range(0, 256, 1, args.cpus)
    wdf.mapInPandas(lambda it: it, wdf.schema).count()  # worker warm-up

    from .. import queries as Q

    results = {}
    for name in args.queries.split(","):
        fn = BENCH_OVERRIDES.get(name, Q.QUERIES[name])
        df = None if name in CONSTRUCT_IN_TIMER else fn(spark, args.sf_dir)
        samples = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            n = (df if df is not None else fn(spark, args.sf_dir)).count()
            samples.append(round(time.perf_counter() - t0, 3))
        results[name] = {"best": min(samples), "all": samples, "rows": n}
        print(f"# {name}: best={min(samples)} all={samples}", flush=True)

    with open("/proc/loadavg") as f:
        load_after = f.read().split()[:3]
    out = {"results": results, "cpus": args.cpus, "sf_dir": args.sf_dir,
           "loadavg_before": load_before, "loadavg_after": load_after}
    print(json.dumps(out))

    if args.out:
        from .mdout import write_preserving
        md = ["# BENCH/R5_REMEASURE — targeted re-timing of r4 bench "
              "regressions", "",
              f"bench.py methodology (local[{args.cpus}], `{args.sf_dir}`, "
              f"construct-in-timer per bench.py), best of {args.repeats}; "
              f"loadavg before {' '.join(load_before)} / after "
              f"{' '.join(load_after)} (CLAUDE.md: check load before "
              "timing anything).", "",
              "| query | best s | all samples | rows |",
              "|---|---|---|---|"]
        for name, r in results.items():
            md.append(f"| {name} | {r['best']} | {r['all']} | {r['rows']} |")
        md.append("")
        write_preserving(args.out, "\n".join(md))
    return out


if __name__ == "__main__":
    run()
