"""Deduplication family for training-data pipelines.

All hashes derive from MD5 (``functions.hashing``) so every variant is
deterministic and engine-portable; all operators are pure DataFrame
plans (explode → aggregate → join) with no Python in the row path.

- exact: group by content hash, keep min id.
- MinHash + LSH: shingle → seeded-min signatures → banded bucket join.
- SimHash: per-token hash bits, majority vote per bit → fingerprint.
- n-gram Jaccard: shingle-explode + pair-wise intersection counts
  (inverted-index join — never a full cross join).
- embedding cosine near-dup: quantized dot products (see operators.ann).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64_col
from .ann import cosine_q, dot_q, norm_sq_q, quantize
from .util import widen


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(text_md5, keep_id, n_copies) — keep the smallest id per content."""
    return (docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
            .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")))


def minhash_signatures(docs: DataFrame, n_perm: int, shingle_n: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per doc: minhash_0..minhash_{n-1} over DISTINCT word
    n-gram shingles. Shingles (not raw tokens) keep the signature
    discriminative on small-vocabulary corpora — with raw tokens every
    doc's token SET converges to the vocabulary and all pairs collide."""
    toks = (shingles_df(docs, shingle_n, id_col, text_col)
            .withColumnRenamed("shingle", "tok"))
    aggs = [F.min(hash64_col(F.concat(F.lit(f"{p}:"), F.col("tok")))).alias(f"minhash_{p}")
            for p in range(n_perm)]
    return toks.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, n_perm: int = 8, band_size: int = 2,
                      shingle_n: int = 3,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs sharing ≥1 LSH band."""
    sig = minhash_signatures(docs, n_perm, shingle_n, id_col, text_col)
    n_bands = n_perm // band_size
    # ONE projection with an exploded band array — a unionByName of
    # per-band selects would re-run the whole shingle+signature pipeline
    # once per band (4x the work; measured dominant at sf0.1)
    keys = []
    for b in range(n_bands):
        parts = [F.col(f"minhash_{b * band_size + j}").cast("string")
                 for j in range(band_size)]
        keys.append(hash64_col(F.concat_ws("_", F.lit(str(b)), *parts)))
    allbands = sig.select(F.col(id_col).alias("_id"),
                          F.explode(F.array(*keys)).alias("_band"))
    # lazy local checkpoint: the self-join reads allbands twice; without
    # it each side recomputes the signatures from raw text
    allbands = allbands.localCheckpoint(eager=False)
    left = allbands.select(F.col("_id").alias("id_a"), "_band")
    right = allbands.select(F.col("_id").alias("id_b"), "_band")
    return (left.join(right, on="_band")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def simhash(docs: DataFrame, nbits: int = 16,
            id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — majority-vote bit folding of per-token hashes
    (token OCCURRENCES, not distinct — repeated tokens vote repeatedly)."""
    toks = (widen(docs).select(F.col(id_col),
                               F.explode(tokens_col(F.col(text_col))).alias("tok"))
            .withColumn("_h", hash64_col(F.col("tok"))))
    aggs = [F.sum(F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1,
                         F.lit(1)).otherwise(F.lit(-1))).alias(f"_v{b}")
            for b in range(nbits)]
    votes = toks.groupBy(id_col).agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(nbits):
        sim = sim + F.when(F.col(f"_v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return votes.select(F.col(id_col), sim.alias("simhash"))


def shingle_array(text_col: Column, n: int = 3) -> Column:
    """array<string> of DISTINCT word n-gram shingles (pure Column)."""
    toks = tokens_col(text_col)
    # 1-indexed element_at windows: shingle i = tokens[i..i+n-1]
    m = F.size(toks) - (n - 1)
    idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
        F.expr("cast(array() as array<int>)"))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j).cast("int"))
                                     for j in range(n)]))
    return F.array_distinct(sh)


def shingles_df(docs: DataFrame, n: int = 3,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per DISTINCT n-gram shingle per doc."""
    return (widen(docs)
            .select(F.col(id_col),
                    F.explode(shingle_array(F.col(text_col), n)).alias("shingle")))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, min_pct: int = 12,
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id_a, id_b, inter, union_n, jaccard) for pairs with
    jaccard*100 ≥ min_pct. Inverted-index join on shingle → only pairs
    sharing ≥1 shingle are ever materialized; the threshold test is
    integer-exact (inter*100 ≥ min_pct*union_n)."""
    # shingle-set size computed AT EXPLODE TIME (size of the distinct
    # array) — no aggregate and no size-lookup join, which would need a
    # non-broadcastable 1-row-per-doc build side at 10^12 docs.
    # Lazy local checkpoint: sh feeds both self-join sides.
    sh = (widen(docs)
          .select(F.col(id_col),
                  shingle_array(F.col(text_col), n).alias("_arr"))
          .select(F.col(id_col), F.size("_arr").alias("_sz"),
                  F.explode("_arr").alias("shingle"))
          .localCheckpoint(eager=False))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle",
                  F.col("_sz").alias("_sza"))
    b = sh.select(F.col(id_col).alias("id_b"), "shingle",
                  F.col("_sz").alias("_szb"))
    # lossless length filter (PPJoin-style): J(A,B) ≤ min/max of the set
    # sizes, so pairs failing min·100 ≥ t·max can be dropped INSIDE the
    # shingle join — before the pair-count shuffle, which is the operator's
    # scale bottleneck on skewed (hot-shingle) corpora
    inter = (a.join(b, on="shingle")
             .filter((F.col("id_a") < F.col("id_b"))
                     & (F.least("_sza", "_szb") * 100
                        >= F.lit(min_pct) * F.greatest("_sza", "_szb")))
             .groupBy("id_a", "id_b", "_sza", "_szb")
             .agg(F.count("*").alias("inter")))
    out = (inter
           .withColumn("union_n", F.col("_sza") + F.col("_szb") - F.col("inter"))
           .filter(F.col("inter") * 100 >= F.lit(min_pct) * F.col("union_n"))
           .withColumn("jaccard", F.col("inter").cast("double") / F.col("union_n").cast("double")))
    return out.select("id_a", "id_b", "inter", "union_n", "jaccard")


def embedding_near_dup_pairs(vecs: DataFrame, threshold_pct: int = 20,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """(id_a, id_b, dot_q, cos) pairs with cosine ≥ threshold_pct/100.
    Threshold test is integer-exact: dot>0 ∧ dot²·10⁴ ≥ pct²·na·nb."""
    q = (widen(vecs)
         .select(F.col(id_col).alias("_id"), quantize(F.col(vec_col)).alias("_v"))
         .withColumn("_n", norm_sq_q(F.col("_v"))))
    a = q.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = q.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    pairs = (a.crossJoin(b)
             .filter(F.col("id_a") < F.col("id_b"))
             .withColumn("dot_q", dot_q(F.col("_va"), F.col("_vb")))
             .filter((F.col("dot_q") > 0)
                     & (F.col("dot_q") * F.col("dot_q") * 10000
                        >= F.lit(threshold_pct * threshold_pct) * F.col("_na") * F.col("_nb")))
             .withColumn("cos", cosine_q(F.col("dot_q"), F.col("_na"), F.col("_nb"))))
    return pairs.select("id_a", "id_b", "dot_q", "cos")
