"""Similarity search over embedding columns (training-data pipeline op).

Embeddings are quantized to integers (round(x*1000)) before any
arithmetic so dot products and norms are EXACT — reproducible across
engines, partitionings and reruns (no float-sum order sensitivity);
cosine = dot / (sqrt(na)*sqrt(nb)) is then a single deterministic
float expression.

- ``brute_force_topk``: exact baseline — broadcast the (small) query set
  against all candidates; JVM-side zip_with/aggregate dot products.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets candidate
  vectors; queries probe only their bucket (+ multiprobe neighbors),
  then exact re-rank. Approximate; recall measured in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import hash64_py
from .util import widen


def quantize(col: Column, scale: int = 1000) -> Column:
    """array<float> → array<long>, elementwise round-half-up at `scale`."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def norm_sq_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_q(dot: Column, na: Column, nb: Column) -> Column:
    return dot.cast("double") / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")))


def brute_force_topk(queries: DataFrame, candidates: DataFrame, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(query_id, rank, cand_id, cos) — exact top-k by cosine, ties by
    cand_id. Queries are broadcast (small set); candidates stream."""
    q = (queries.select(F.col(id_col).alias("query_id"),
                        quantize(F.col(vec_col)).alias("_qv"))
         .withColumn("_qn", norm_sq_q(F.col("_qv"))))
    c = (widen(candidates).select(F.col(id_col).alias("cand_id"),
                                  quantize(F.col(vec_col)).alias("_cv"))
         .withColumn("_cn", norm_sq_q(F.col("_cv"))))
    pairs = (c.crossJoin(F.broadcast(q))
             .filter(F.col("cand_id") != F.col("query_id"))
             .withColumn("_dot", dot_q(F.col("_qv"), F.col("_cv")))
             .withColumn("cos", cosine_q(F.col("_dot"), F.col("_qn"), F.col("_cn"))))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "cand_id", "cos"))


def with_recall(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """Append per-query ``recall_at_k`` (|approx∩exact| / k) to an
    approximate top-k result — a checkable accuracy figure the driver's
    rows-only gate can see alongside every approximate ANN result."""
    ex = exact.select("query_id", "cand_id")
    hits = (approx.select("query_id", "cand_id").join(ex, ["query_id", "cand_id"])
            .groupBy("query_id")
            .agg((F.count("*").cast("double") / F.lit(k)).alias("recall_at_k")))
    return (approx.join(F.broadcast(hits), "query_id", "left")
            .fillna({"recall_at_k": 0.0}))


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from the stable hash."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hash64_py(f"lsh:{seed}:{p}:{d}")
            row.append((h % 2_000_001) / 1_000_000.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection bucket id (one bit per hyperplane)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lits = F.array(*[F.lit(v) for v in plane])
        proj = F.aggregate(F.zip_with(vec_col, lits, lambda x, y: x.cast("double") * y),
                           F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(queries: DataFrame, candidates: DataFrame, k: int,
             n_planes: int = 8, dim: int = 64, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             multiprobe: int = 0) -> DataFrame:
    """Approximate top-k: bucket join on LSH signature, exact re-rank
    within bucket. At planet scale the bucket join replaces the cross
    join — candidates shuffle once by bucket; queries broadcast.

    ``multiprobe=1`` also probes every bucket at signature Hamming
    distance 1 (each hyperplane bit flipped) — the standard multiprobe
    trick: (1+n_planes)/2^n_planes of the corpus searched instead of
    1/2^n_planes, recovering the near-misses that fall just across one
    hyperplane, at zero extra candidate-side shuffle (only the
    broadcast query set fans out)."""
    planes = _hyperplanes(dim, n_planes, seed)
    q = (queries.select(F.col(id_col).alias("query_id"),
                        quantize(F.col(vec_col)).alias("_qv"),
                        lsh_bucket(F.col(vec_col), planes).alias("_bucket"))
         .withColumn("_qn", norm_sq_q(F.col("_qv"))))
    if multiprobe >= 1:
        variants = F.array(
            F.col("_bucket"),
            *[F.col("_bucket").bitwiseXOR(F.lit(1 << i))
              for i in range(n_planes)])
        q = (q.withColumn("_bucket", F.explode(variants)))
    c = (widen(candidates).select(F.col(id_col).alias("cand_id"),
                                  quantize(F.col(vec_col)).alias("_cv"),
                                  lsh_bucket(F.col(vec_col), planes).alias("_bucket"))
         .withColumn("_cn", norm_sq_q(F.col("_cv"))))
    pairs = (c.join(F.broadcast(q), on="_bucket")
             .filter(F.col("cand_id") != F.col("query_id"))
             .withColumn("_dot", dot_q(F.col("_qv"), F.col("_cv")))
             .withColumn("cos", cosine_q(F.col("_dot"), F.col("_qn"), F.col("_cn"))))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "cand_id", "cos"))


def ivf_build(candidates: DataFrame, n_centroids: int = 32,
              id_col: str = "vec_id", vec_col: str = "embedding",
              n_assign: int = 1) -> tuple[DataFrame, DataFrame]:
    """Build the IVF-flat index: (centroids, index) DataFrames.

    1. Seed centroids: the ``n_centroids`` candidates with the smallest
       stable hash of their id (deterministic sample, no RNG).
    2. One Lloyd refinement: assign every candidate to its nearest seed
       under exact integer squared-L2 on quantized vectors, recompute
       centroids as element-wise means (exact long sums → deterministic
       doubles regardless of aggregation order).
    3. Index: candidates tagged with their ``n_assign`` nearest final
       cluster ids (n_assign>1 = multi-assignment for near-dup candidate
       generation) — at planet scale the one shuffle, reusable across
       query batches.

    centroids: (centroid_id, _sv, _sn); index: (cand_id, _cv, _cn,
    centroid_id) with n_assign rows per candidate.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    c = (widen(candidates).select(F.col(id_col).alias("cand_id"),
                                  quantize(F.col(vec_col)).alias("_cv"))
         .withColumn("_cn", norm_sq_q(F.col("_cv")))
         # assignment reads c twice (seed pass + final pass) — pin it
         .localCheckpoint(eager=False))

    # Assignment runs as numpy int64 GEMMs inside mapInPandas —
    # centroids are bounded (n_centroids rows) so they ride along as a
    # driver-side matrix in the closure; the earlier crossJoin +
    # higher-order-function dot per (candidate, centroid) was
    # interpreted, not codegen'd, and dominated the build.
    def _assign_fn(S: np.ndarray, Sn: np.ndarray, k: int):
        def fn(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf["_cv"].to_numpy()).astype(np.int64)
                cn = pdf["_cn"].to_numpy(np.int64)
                D = cn[:, None] + Sn[None, :] - 2 * (V @ S.T)
                if k == 1:
                    # argmin → first (= smallest centroid_id) on ties
                    nearest = D.argmin(axis=1)
                    out = pdf.copy()
                    out["centroid_id"] = nearest.astype(np.int64)
                    yield out
                else:
                    # stable argsort ties by centroid_id, top-k
                    order = np.argsort(D, axis=1, kind="stable")[:, :k]
                    reps = np.repeat(np.arange(len(pdf)), k)
                    out = pdf.iloc[reps].copy()
                    out["centroid_id"] = order.ravel().astype(np.int64)
                    yield out
        return fn

    assign_schema = T.StructType(list(c.schema.fields) + [
        T.StructField("centroid_id", T.LongType(), False)])

    seeds_pdf = (c.withColumn("_h", F.xxhash64(F.col("cand_id")))
                 .orderBy("_h", "cand_id").limit(n_centroids)
                 .orderBy("cand_id").select("_cv", "_cn").toPandas())
    S0 = np.stack(seeds_pdf["_cv"].to_numpy()).astype(np.int64)
    S0n = seeds_pdf["_cn"].to_numpy(np.int64)

    assigned0 = c.mapInPandas(_assign_fn(S0, S0n, 1), assign_schema)

    # element-wise mean per cluster from exact long sums (one Lloyd step)
    dim_df = (assigned0.select("centroid_id",
                               F.posexplode("_cv").alias("_i", "_x"))
              .groupBy("centroid_id", "_i")
              .agg(F.sum("_x").alias("_s"), F.count("*").alias("_n")))
    centroids = (dim_df.withColumn("_m", F.col("_s").cast("double") / F.col("_n"))
                 .groupBy("centroid_id")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("_i", "_m"))),
                     lambda s: F.floor(s["_m"] + F.lit(0.5)).cast("long")
                 ).alias("_sv")))
    centroids = centroids.withColumn("_sn", norm_sq_q(F.col("_sv")))

    cent_pdf = centroids.orderBy("centroid_id").toPandas()
    # empty clusters vanish from the mean aggregation: re-index by the
    # surviving centroid_id order (positions in S1 = row order) and
    # rebuild the centroids frame so ids match positions
    S1 = np.stack(cent_pdf["_sv"].to_numpy()).astype(np.int64)
    S1n = cent_pdf["_sn"].to_numpy(np.int64)
    spark = candidates.sparkSession
    centroids = spark.createDataFrame(pd.DataFrame({
        "centroid_id": np.arange(len(cent_pdf), dtype=np.int64),
        "_sv": [list(map(int, v)) for v in S1],
        "_sn": [int(v) for v in S1n]}))

    index = c.mapInPandas(_assign_fn(S1, S1n, n_assign), assign_schema)
    return centroids, index


def ivf_topk(queries: DataFrame, candidates: DataFrame, k: int,
             n_centroids: int = 32, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             built: tuple[DataFrame, DataFrame] | None = None) -> DataFrame:
    """IVF-flat approximate top-k (the inverted-file scale path): build
    via ivf_build, then each (broadcast) query probes its ``n_probe``
    nearest clusters with exact cosine re-rank inside them.

    Pass ``built=(centroids, index)`` (persisted ivf_build output) to
    amortize the index across query batches — the build is the
    expensive half (two assignment passes over all candidates); search
    itself touches only the probed clusters.

    Approximate by construction; recall vs brute_force_topk is measured
    in tests/test_ann.py.
    """
    centroids, index = built or ivf_build(candidates, n_centroids,
                                          id_col, vec_col)

    q = (queries.select(F.col(id_col).alias("query_id"),
                        quantize(F.col(vec_col)).alias("_qv"))
         .withColumn("_qn", norm_sq_q(F.col("_qv"))))
    probes = (q.crossJoin(F.broadcast(centroids))
              .withColumn("_d", F.col("_qn") + F.col("_sn")
                          - 2 * dot_q(F.col("_qv"), F.col("_sv"))))
    wq = Window.partitionBy("query_id").orderBy(F.col("_d").asc(),
                                                F.col("centroid_id").asc())
    probes = (probes.withColumn("_rn", F.row_number().over(wq))
              .filter(F.col("_rn") <= n_probe)
              .select("query_id", "_qv", "_qn", "centroid_id"))

    pairs = (index.join(F.broadcast(probes), on="centroid_id")
             .filter(F.col("cand_id") != F.col("query_id"))
             .withColumn("_dot", dot_q(F.col("_qv"), F.col("_cv")))
             .withColumn("cos", cosine_q(F.col("_dot"), F.col("_qn"), F.col("_cn"))))
    wr = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                                F.col("cand_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "cand_id", "cos"))
