"""Training-data curation pipeline: the end-to-end document-cleaning
job a 100 TB corpus run would use, checkpoint-resumable per bucket.

    spark-submit --py-files engine.zip -m osm_io_spark.jobs.curate \
        --sf-dir /root/testdata/sf0.01 --out /tmp/curated --buckets 8

Stages (all pure DataFrame plans from osm_io_spark.operators):
  1. quality + language gate   textops.quality_score / language_id
  2. exact dedup               min-id winner per content hash
  3. near-dup removal          MinHash-LSH candidates, Jaccard-verified,
                               resolved into TRANSITIVE duplicate
                               clusters (dedup.dedup_clusters connected
                               components); each cluster keeps its min
                               id — A~B, B~C drops both B and C even
                               though (A,C) was never a pair
  4. snapshot commit           per-bucket parquet + manifest row counts
                               and bytes; re-running skips completed
                               buckets (ResumableJob)
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..operators import textops as TX
from ..plans.snapshots import SnapshotCatalog, ResumableJob
from ..queries import ensure_shipped
from ..session import get_spark


def curated_documents(spark, sf_dir: str,
                      min_quality: float = 1.5,
                      lang: str = "en",
                      near_dup_pct: int = 60):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    q = TX.quality_score(docs).select("doc_id", "quality")
    l = TX.language_id(docs).select("doc_id", "lang_pred")
    gated = (docs.join(q, "doc_id").join(l, "doc_id")
             .filter((F.col("quality") >= min_quality)
                     & (F.col("lang_pred") == lang)))

    exact = DD.exact_dedup(gated)
    gated = gated.join(exact.select(F.col("keep_id").alias("doc_id")), "doc_id")

    pairs = DD.minhash_lsh_pairs(gated, n_perm=8, band_size=2)
    sh = DD.ngram_jaccard_pairs(gated, n=3, min_pct=near_dup_pct)
    verified = pairs.join(sh, on=["id_a", "id_b"])  # LSH candidates verified
    clusters = DD.dedup_clusters(verified, gated.select("doc_id"))
    return gated.join(clusters.filter("keep").select("doc_id"), "doc_id")


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--min-quality", type=float, default=1.5)
    args = ap.parse_args(argv)

    spark = get_spark("curate")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_shipped(spark)

    curated = curated_documents(spark, args.sf_dir,
                                min_quality=args.min_quality)
    curated = curated.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(args.buckets)))

    catalog = SnapshotCatalog(args.out)
    table = catalog.table("curated_documents")
    job = ResumableJob(table, "curate",
                       inputs={"sf_dir": args.sf_dir,
                               "min_quality": args.min_quality})
    plan = [f"bucket={b}" for b in range(args.buckets)]

    def build(partition: str):
        b = int(partition.split("=")[1])
        return curated.filter(F.col("bucket") == b).drop("bucket")

    snap = job.run(plan, build)
    summary = {
        "metric": "curated_documents",
        "n_partitions": snap.summary["n_partitions"],
        "rows": snap.summary["total_rows"],
        "version": snap.version,
        "out": args.out,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
