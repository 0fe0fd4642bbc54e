"""osm_io_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing capabilities of
navigatorsguild/osm-io (reference at /root/reference, Rust) as idiomatic
Spark: DataFrame/SQL logical plans, Catalyst physical planning, vectorized
Arrow/pandas UDF kernels for the binary codec paths, and explicit
partitioning/skew handling for planet-scale spatial joins.

Subpackages
-----------
functions   scalar kernels: cell index (Z-order/multi-res), geometry (PIP,
            haversine), image codecs (raw/quantized, PSNR, phash), stable
            cross-engine hashing, text analysis.
sources     PBF binary scan/decode/encode (mapInPandas kernels), apidb
            COPY-text star schema reader/writer, deterministic synthetic
            fixture generators.
operators   way/relation→polygon assembly, cell spatial join + PIP refine
            (salting + AQE skew), kNN ring expansion, raster↔vector
            assignment, dedup family (exact/MinHash-LSH/SimHash/Jaccard/
            embedding-cosine), ANN top-k, latest-version dedup.
plans       snapshot/manifest layer: atomic commits, per-partition lineage
            + row/byte metrics, checkpoint-resume.
streaming   Structured Streaming over the events table.
jobs        spark-submit entrypoints.
"""

__version__ = "0.1.0"
