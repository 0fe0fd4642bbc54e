"""ngram-Jaccard method evidence: inverted vs PPJoin-prefix vs router.

Exact set-similarity self-join cost is corpus-SHAPE-dependent, so
``ngram_jaccard_pairs`` ships three methods behind one output contract
(operators/dedup.py — identical rows, one SQL oracle):

  * inverted — index ALL shingles; the pair-count shuffle is quadratic
    in hot-shingle counts. Fewest stages: wins when candidates are
    sparse.
  * prefix — PPJoin prefix + positional candidates (Bayardo WWW'07 /
    Xiao VLDB'08): index only each doc's rarest
    |s| - ceil(t·|s|) + 1 shingles, so BOILERPLATE shingles (shared
    footers, headers, templates — the dominant web-corpus shape) never
    enter the pair join; exact inter via array_intersect on survivors.
  * auto (default) — one cheap aggregation (Σ count(shingle)², an
    upper bound on inverted's candidate rows) routes: inverted under
    budget, else prefix, else raise→minhash.

This job synthesizes the boilerplate shape (n docs, 8 unique tokens +
a shared 12-token footer → every doc pair shares 10 hot trigrams but
ZERO true near-dups) and measures both methods at a size where
inverted is still runnable, plus prefix at 10x that size where
inverted's candidate volume is ~hopeless:

    python -m osm_io_spark.jobs.ngram_bench --n 2000 --out BENCH/NGRAM.md

The duplicate-SATURATED contrast (candidates ≈ true output, prefix can
only tie inverted: 97.7s vs 102.4s at the 10x replica corpus) lives in
BENCH/SF1.md's dedup_ngram_exact_* rows.
"""
from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..session import get_spark

FOOTER = ("subscribe to our newsletter for updates "
          "terms of service apply today")  # 12 tokens


def boilerplate_docs(spark, n: int):
    """n docs, 8 unique tokens + the shared footer — deterministic."""
    return (spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ",
                    *[F.concat(F.lit(f"w{j}_"), F.col("id"))
                      for j in range(8)],
                    F.lit(FOOTER)).alias("text"))
        .localCheckpoint(eager=True))


def run(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--big-inverted", action="store_true",
                    help="also time the inverted method at 10n (pushes "
                         "the full hot-shingle candidate volume — slow "
                         "by construction; this is the cost the prefix "
                         "method avoids)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", default=None)
    args = ap.parse_args(argv)

    spark = get_spark("ngram-bench", master=(
        f"local[{args.cpus}]" if args.cpus else None))
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        rows = fn()
        dt = round(time.perf_counter() - t0, 2)
        results[name] = {"s": dt, "rows": rows}
        print(f"# {name}: {dt}s rows={rows}", flush=True)

    def vol(docs):
        sh = (docs.select("doc_id",
                          DD.shingle_array(F.col("text"), 3).alias("_a"))
              .select(F.explode("_a").alias("shingle")))
        return int(sh.groupBy("shingle").count()
                   .agg(F.sum(F.col("count") * F.col("count")))
                   .collect()[0][0])

    small = boilerplate_docs(spark, args.n)
    v_small = vol(small)
    timed(f"inverted_n{args.n}",
          lambda: DD.ngram_jaccard_pairs(
              small, n=3, min_pct=50, method="inverted",
              max_candidate_pairs=None).count())
    timed(f"prefix_n{args.n}",
          lambda: DD.ngram_jaccard_pairs(
              small, n=3, min_pct=50, method="prefix",
              max_candidate_pairs=None).count())

    big = boilerplate_docs(spark, args.n * 10)
    v_big = vol(big)
    timed(f"prefix_n{args.n * 10}",
          lambda: DD.ngram_jaccard_pairs(
              big, n=3, min_pct=50, method="prefix",
              max_candidate_pairs=None).count())
    # the router must pick prefix here without raising (inverted volume
    # is far past the budget, prefix volume far under it)
    timed(f"auto_n{args.n * 10}",
          lambda: DD.ngram_jaccard_pairs(
              big, n=3, min_pct=50).count())
    if args.big_inverted:
        timed(f"inverted_n{args.n * 10}",
              lambda: DD.ngram_jaccard_pairs(
                  big, n=3, min_pct=50, method="inverted",
                  max_candidate_pairs=None).count())

    out = {"metric": "ngram_method_bench", "n": args.n,
           "inverted_vol_small": v_small, "inverted_vol_big": v_big,
           "cores": spark.sparkContext.defaultParallelism,
           "queries": results}
    print(json.dumps(out))

    if args.out:
        from .mdout import write_preserving
        md = (
            "# ngram-Jaccard method evidence (boilerplate shape)\n\n"
            f"Corpus: n docs × (8 unique tokens + a shared 12-token "
            f"footer) on local[{out['cores']}] — every doc pair shares "
            "10 hot trigrams, zero true near-dups (the web-boilerplate "
            "shape). Both methods return the same (empty) exact "
            "answer; the cost difference is the candidate volume: "
            f"inverted must push Σ count(shingle)² ≈ {v_small:,} "
            f"(n={args.n}) / {v_big:,} (n={args.n * 10}) rows through "
            "its pair-count shuffle, while the prefix method indexes "
            "only each doc's rarest half — the footer trigrams never "
            "enter the join. `auto` (the registry default) routes this "
            "shape to prefix off one cheap aggregation.\n\n"
            "| run | seconds | rows |\n|---|---|---|\n")
        for name, r in results.items():
            md += f"| {name} | {r['s']} | {r['rows']} |\n"
        write_preserving(args.out, md)
    return out


if __name__ == "__main__":
    run()
