"""Text analysis operators for training-data pipelines (documents table).

Pure Column expressions (JVM, codegen) — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Corpus-aware "stop list": common function words plus the synthetic
# corpus's high-frequency schema words (deterministic, engine-portable).
STOPWORDS = ("the", "a", "of", "and", "to", "in",
             "key", "row", "data", "table", "query", "join")


def token_count(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"))


# GPT-2-style pre-tokenizer classes, restricted to constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): an
# optional leading space glued to a letter-run / digit-run /
# punctuation-run, or a bare space-run. No lookahead (RE2 lacks it).
BPE_PRETOKEN_RE = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"


def bpe_token_count(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Pre-tokenizer token counting the way BPE training pipelines do
    it (space-prefixed letter/digit/punct runs), not whitespace split —
    the token budget a tokenizer-training job actually needs."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_pretokens"))


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", min_ratio: float = 0.05) -> DataFrame:
    """Heuristic n-gram/stopword language ID: ratio of stoplist token
    occurrences. (Real model lexicons aren't available; the operator
    shape — explode-free vectorized ratio + threshold — is the point.)"""
    toks = F.split(F.col(text_col), " ")
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")
    ratio = hits.cast("double") / F.size(toks).cast("double")
    return docs.select(
        F.col(id_col),
        hits.alias("stop_hits"),
        ratio.alias("stop_ratio"),
        F.when(ratio >= F.lit(min_ratio), F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"))


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Length / mean-token-length / stopword-ratio quality signals."""
    text = F.col(text_col)
    toks = F.split(text, " ")
    n_tok = F.size(toks).cast("long")
    n_chr = F.length(text).cast("long")
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")
    mean_tok_len = (n_chr - (n_tok - 1)).cast("double") / n_tok.cast("double")
    stop_ratio = hits.cast("double") / n_tok.cast("double")
    score = mean_tok_len * F.lit(0.25) + stop_ratio * F.lit(10.0)
    return docs.select(F.col(id_col),
                       n_chr.alias("n_chars_calc"),
                       n_tok.alias("n_tokens"),
                       mean_tok_len.alias("mean_tok_len"),
                       stop_ratio.alias("stop_ratio"),
                       score.alias("quality"))


def chunk_tokens(docs: DataFrame, seq_len: int, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Split each document's token stream into fixed-length windows —
    the sequence-building step before packing/tokenization: one output
    row per (doc, chunk) with the chunk's token slice rejoined. Pure
    Column plan: sequence() over chunk starts + slice(), no explode of
    individual tokens (the array stays one value per row until the
    final per-chunk explode, so the shuffle-free path scales with
    chunks, not tokens)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.ceil(n.cast("double") / F.lit(float(seq_len))).cast("int")
    starts = F.when(n > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.expr("cast(array() as array<int>)"))
    return (docs.select(F.col(id_col), toks.alias("_toks"),
                        F.explode(starts).alias("chunk_idx"))
            .select(F.col(id_col), "chunk_idx",
                    F.slice(F.col("_toks"),
                            F.col("chunk_idx") * seq_len + 1,
                            seq_len).alias("_chunk"))
            .select(F.col(id_col), F.col("chunk_idx").cast("long").alias("chunk_idx"),
                    F.size("_chunk").cast("long").alias("n_tokens"),
                    F.array_join("_chunk", " ").alias("chunk_text")))


def curate(corpus: DataFrame, clusters: DataFrame, quality_df: DataFrame,
           min_quality: float, id_col: str = "doc_id") -> DataFrame:
    """The end-to-end curation decision — what the whole pipeline
    exists to produce: per document, keep it or drop it and WHY.

    Precedence mirrors production pipelines: duplicate removal first
    (non-canonical members of a dedup cluster drop regardless of
    quality — keeping the canonical copy preserves the content), then
    the quality threshold. decision ∈ {kept, dropped_duplicate,
    dropped_quality}.

    clusters = operators.dedup.dedup_clusters output; quality_df =
    quality_score output. Both join on id_col — broadcast-free
    co-partitioned joins at scale (same key).
    """
    c = clusters.select(F.col(id_col), "cluster_id")
    q = quality_df.select(F.col(id_col), "quality")
    decision = (F.when(F.col("cluster_id") != F.col(id_col),
                       F.lit("dropped_duplicate"))
                .when(F.col("quality") < F.lit(min_quality),
                      F.lit("dropped_quality"))
                .otherwise(F.lit("kept")))
    return (corpus.select(id_col)
            .join(c, on=id_col).join(q, on=id_col)
            .select(F.col(id_col), "cluster_id", "quality",
                    decision.alias("decision")))


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set (the classic 'fingerprint' dedup key)."""
    toks = F.split(F.col(text_col), " ")
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
    return docs.select(F.col(id_col), fp.alias("fingerprint"))


# PII patterns restricted to constructs with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): character classes, bounded
# repetition, ASCII \b word boundaries — no lookaround (RE2 lacks it).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone numbers with typed placeholders
    and report per-doc match counts — the standard pre-training
    redaction pass. Pure Column expressions (regexp_count +
    regexp_replace chains, JVM-side); patterns are dialect-portable so
    the same semantics are SQL-oracle-able in DuckDB.

    Output: (doc_id, scrubbed, n_emails, n_ipv4, n_phones). Replacement
    order is fixed (email → ipv4 → phone) and counts are taken on the
    ORIGINAL text, so overlapping-pattern edge cases (an IPv4 inside an
    email's domain would already be consumed by the email redaction)
    resolve deterministically."""
    t = F.col(text_col)
    counts = {k: F.regexp_count(t, F.lit(p)).cast("long")
              for k, p in PII_PATTERNS.items()}
    scrubbed = t
    for k, p in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, p, f"<{k.upper()}>")
    return docs.select(
        F.col(id_col), scrubbed.alias("scrubbed"),
        counts["email"].alias("n_emails"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phones"))
