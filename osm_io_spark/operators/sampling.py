"""Deterministic sampling / data-mixing operators.

A training-data pipeline never uses ``df.sample()`` for corpus
construction: RNG-based sampling is partition-dependent and
unrepeatable, so two runs (or a resumed run) would train on different
data. These operators derive the sampling decision from a stable
per-row hash (functions.hashing: md5-based, engine-portable) —

* same row ⇒ same decision, in any engine, any partitioning, any rerun;
* the sample is a pure filter: pushes down, no shuffle, no state;
* nested samples are consistent: rate 0.1 ⊂ rate 0.2 (the classic
  hash-threshold property, so growing a mixture never resamples).

``mixture_sample`` is the multi-source form: per-source rates (the
"data mixing weights" of LLM corpus construction) applied in one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64_col

# hash64 yields 60 bits (15 hex chars) — the threshold domain
_HASH_SPACE = 1 << 60


def sample_u(key: Column, salt: str) -> Column:
    """Deterministic u ∈ [0, 1) per key (salted, so independent samples
    from the same key space don't correlate)."""
    h = hash64_col(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return h.cast("double") / F.lit(float(_HASH_SPACE))


def deterministic_sample(df: DataFrame, rate: float, key_col: str,
                         salt: str = "sample") -> DataFrame:
    """Keep rows with u(key) < rate — reproducible hash-threshold
    Bernoulli sampling (nested across rates)."""
    return df.filter(sample_u(F.col(key_col), salt) < F.lit(float(rate)))


def mixture_sample(df: DataFrame, source_col: str,
                   rates: dict[str, float], key_col: str,
                   default_rate: float = 0.0,
                   salt: str = "mix") -> DataFrame:
    """One-pass multi-source mixture: each row keeps with its source's
    rate (unlisted sources use ``default_rate``). The rate lookup is a
    CASE expression — no join, fully pushed down."""
    rate = F.lit(float(default_rate))
    expr = None
    for src, r in sorted(rates.items()):
        cond = F.col(source_col) == F.lit(src)
        expr = F.when(cond, F.lit(float(r))) if expr is None \
            else expr.when(cond, F.lit(float(r)))
    rate = expr.otherwise(rate) if expr is not None else rate
    return (df.withColumn("_rate", rate)
            .filter(sample_u(F.col(key_col), salt) < F.col("_rate"))
            .drop("_rate"))


def sample_u_sql(key_expr: str, salt: str) -> str:
    """DuckDB twin of sample_u (same md5-derived threshold)."""
    from ..functions.hashing import hash64_sql
    h = hash64_sql(f"'{salt}:' || CAST(({key_expr}) AS VARCHAR)")
    return f"(CAST({h} AS DOUBLE) / {float(_HASH_SPACE)})"
