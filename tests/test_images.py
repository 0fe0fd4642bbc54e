"""Image codec kernels: round-trip fidelity (PSNR gate), phash behavior."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_io_spark.functions import images as I

RNG = np.random.default_rng(11)
PIX = RNG.integers(0, 256, (24, 32, 3), dtype=np.uint8)


def test_raw_roundtrip_lossless():
    data = I.encode(PIX, "raw")
    back = I.decode(data, 32, 24, "raw")
    assert (back == PIX).all()
    assert I.psnr(PIX, back) == float("inf")


def test_q5_roundtrip_psnr_gate():
    data = I.encode(PIX, "q5")
    back = I.decode(data, 32, 24, "q5")
    p = I.psnr(PIX, back)
    assert p >= 40.0, f"lossy PSNR {p:.2f} < 40 dB"
    assert np.abs(back.astype(int) - PIX.astype(int)).max() <= 7


def test_unknown_fmt_raises():
    with pytest.raises(NotImplementedError):
        I.encode(PIX, "jpeg")
    with pytest.raises(NotImplementedError):
        I.decode(b"", 1, 1, "webp")


def test_phash_properties():
    h1 = I.phash64(PIX)
    assert h1 == I.phash64(PIX.copy())  # deterministic
    # small perturbation → small hamming distance
    noisy = np.clip(PIX.astype(int) + RNG.integers(-3, 4, PIX.shape), 0, 255).astype(np.uint8)
    assert I.hamming64(h1, I.phash64(noisy)) <= 10
    # unrelated image → large distance
    other = RNG.integers(0, 256, PIX.shape, dtype=np.uint8)
    assert I.hamming64(h1, I.phash64(other)) >= 10
    # q5 decode stays perceptually identical
    dq = I.decode(I.encode(PIX, "q5"), 32, 24, "q5")
    assert I.hamming64(h1, I.phash64(dq)) <= 6


def test_per_row_invariants_distributed(spark):
    """Driver per-row invariant: PSNR >= 40 dB vs regenerated reference
    pixels + caption equality, across both codecs, distributed."""
    from osm_io_spark.operators import multimodal as MM
    from osm_io_spark.sources import synth as SY
    from osm_io_spark import queries as Q
    Q.ensure_shipped(spark)
    imgs = SY.images_df(spark, 120, seed=42, partitions=4)
    inv = MM.invariant_check(imgs, seed=42).toPandas()
    assert len(inv) == 120
    assert inv["psnr_ok"].all()
    assert inv["caption_ok"].all()
    assert set(inv["fmt"]) == {"raw", "q5"}
    # lossless rows are bit-exact (sentinel 999), lossy rows in [40, 999)
    assert (inv.loc[inv.fmt == "raw", "psnr_db"] == 999.0).all()
    assert (inv.loc[inv.fmt == "q5", "psnr_db"] >= 40.0).all()

    # a corrupted byte must be caught
    from pyspark.sql import functions as F
    bad = imgs.withColumn(
        "caption", F.when(F.col("image_id") == "img-000000000003",
                          F.lit("tampered")).otherwise(F.col("caption")))
    inv_bad = MM.invariant_check(bad, seed=42).toPandas()
    assert (~inv_bad["caption_ok"]).sum() == 1


def test_phash_hamming_near_dup_matches_brute_force(spark):
    """The pigeonhole band join must find exactly the pairs a brute-force
    O(n²) popcount scan finds (completeness is the pigeonhole guarantee:
    hamming ≤ k ⇒ some band of k+1 agrees exactly)."""
    from osm_io_spark import queries as Q
    from osm_io_spark.operators import dedup as DD
    from osm_io_spark.operators import multimodal as MM
    from osm_io_spark.sources import synth as SY

    Q.ensure_shipped(spark)
    imgs = SY.images_df(spark, 60, seed=7, partitions=4)
    stats = MM.decode_stats(imgs).select("image_id", "phash_calc")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in DD.hamming_near_dup_pairs(
            stats, max_k=8, nbits=63, fp_col="phash_calc",
            id_col="image_id").collect())

    local = {r["image_id"]: r["phash_calc"] for r in stats.collect()}
    ids = sorted(local)
    want = sorted(
        (a, b, bin(local[a] ^ local[b]).count("1"))
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(local[a] ^ local[b]).count("1") <= 8)
    assert got == want


def test_image_curation_decisions(spark):
    """image_curation composes brute-force-verified pieces (decode
    stats, hamming pairs, dedup_clusters); this test verifies the
    COMPOSITION: every resized twin lands in its source's cluster and
    drops as a duplicate, and every decision matches the rule
    (duplicate precedence, then the exposure-quality threshold)
    recomputed independently from the decode stats + pair graph."""
    from osm_io_spark import queries as Q

    out = {r["image_id"]: r for r in
           Q.q_image_curation(spark, "/root/testdata/sf0.001").collect()}
    assert len(out) == 480  # 240 sources + 240 twins
    assert set(r["decision"] for r in out.values()) <= {
        "kept", "dropped_duplicate", "dropped_quality"}

    # twins: "<id>-r" sorts after "<id>", shares its cluster via the
    # guaranteed source↔twin pair, so it can never be canonical
    for iid, r in out.items():
        if iid.endswith("-r"):
            assert r["decision"] == "dropped_duplicate", (iid, r)
    # the gate is the corpus's own exact quantile of the quality
    # column — recompute it from the output itself
    gate = float(np.percentile(
        np.array([r["quality"] for r in out.values()]),
        Q.IMG_CURATE_QUALITY_QUANTILE * 100, method="linear"))
    for iid, r in out.items():
        if r["cluster_id"] != iid:
            assert r["decision"] == "dropped_duplicate", (iid, r)
        else:
            want = ("kept" if r["quality"] >= gate
                    else "dropped_quality")
            assert r["decision"] == want, (iid, r)
    # the quality gate is live: at least one canonical survives and
    # decisions are not all identical
    kept = [i for i, r in out.items() if r["decision"] == "kept"]
    assert kept and len(kept) < 240


def test_image_embed_and_near_dup(spark):
    """image_embed: unit-norm 3·grid² features, deterministic; the IVF
    image-embedding near-dup query must (a) find every source↔twin pair
    (resolution-invariant block means ⇒ cos ≈ 1) and (b) emit ONLY
    pairs whose true cosine clears the gate, verified against a local
    brute-force cosine over the same embeddings."""
    import pandas as pd

    from osm_io_spark import queries as Q
    from osm_io_spark.operators import multimodal as MM
    from osm_io_spark.sources import synth as SY

    Q.ensure_shipped(spark)
    imgs = SY.images_df(spark, 60, seed=7, partitions=4)
    emb = MM.image_embed(imgs, grid=4).toPandas()
    assert len(emb) == 60
    V = np.stack(emb["embedding"].to_numpy())
    assert V.shape == (60, 48)
    assert np.abs(np.linalg.norm(V, axis=1) - 1.0).max() < 1e-9
    # deterministic across runs
    emb2 = MM.image_embed(imgs, grid=4).toPandas().set_index("image_id")
    for iid, v in zip(emb["image_id"], V):
        assert np.allclose(emb2.loc[iid, "embedding"], v)

    out = Q.q_mm_embed_near_dup(spark, "/root/testdata/sf0.001").toPandas()
    got = set(map(tuple, out[["id_a", "id_b"]].values))
    # every source pairs with its own resized twin
    resized = (MM.resize(SY.images_df(spark, 240, seed=42, partitions=8), 16)
               .select(F.concat(F.col("image_id"), F.lit("-r"))
                       .alias("image_id"), "bytes", "w", "h", "fmt"))
    both = (SY.images_df(spark, 240, seed=42, partitions=8)
            .select("image_id", "bytes", "w", "h", "fmt")
            .unionByName(resized))
    full = MM.image_embed(both, grid=4).toPandas()
    fV = np.stack(full["embedding"].to_numpy())
    fids = full["image_id"].to_numpy()
    idx = {i: k for k, i in enumerate(fids)}
    for iid in fids:
        if iid.endswith("-r"):
            src = iid[:-2]
            pair = tuple(sorted((src, iid)))
            assert pair in got or (pair[1], pair[0]) in got, pair
    # no emitted pair below the gate (quantization slop allowance)
    cos = fV @ fV.T
    for a, b in got:
        assert cos[idx[a], idx[b]] >= 0.979, (a, b, cos[idx[a], idx[b]])


def test_mm_literal_oracles_match_corpus():
    """SQL_MM_STATS / SQL_MM_INV are literal expected-value oracles
    (a SQL engine cannot decode the binary corpus, but the corpus is
    deterministic so the correct output is a constant). This test
    regenerates every literal from the corpus generator — numpy path,
    no Spark — so a corpus reseed or kernel change fails HERE with a
    value diff instead of as an opaque hash mismatch at the driver's
    gate."""
    import duckdb
    import pandas as pd

    from osm_io_spark import queries as Q
    from osm_io_spark.sources.synth import images_pdf, reference_pixels_caption

    pdf = images_pdf(np.arange(240), seed=42)
    decoded = np.stack([I.decode(bytes(b), 16, 16, f)
                        for b, f in zip(pdf["bytes"], pdf["fmt"])])
    means = decoded.reshape(len(pdf), -1).mean(axis=1)
    phs = I.phash64_batch(decoded)
    refs, cap_ok = [], []
    for j in range(len(pdf)):
        i = int(pdf["image_id"].iloc[j].split("-")[-1])
        px, cap = reference_pixels_caption(i, 42, 16, 16, pdf["fmt"].iloc[j])
        refs.append(px)
        cap_ok.append(pdf["caption"].iloc[j] == cap)
    p = I.psnr_batch(np.stack(refs), decoded)
    p = np.where(np.isinf(p), 999.0, p)

    rows = pd.DataFrame({
        "fmt": pdf["fmt"], "mean_pixel": means,
        "phash_ok": phs == pdf["phash"].to_numpy(np.int64),
        "psnr_db": p, "psnr_ok": p >= 40.0,
        "caption_ok": np.array(cap_ok)})
    got_stats = (rows.groupby("fmt").apply(
        lambda g: pd.Series({
            "n": len(g),
            "n_phash_ok": int(g["phash_ok"].sum()),
            "mean_pixel_milli_sum": int(np.floor(g["mean_pixel"] * 1000)
                                        .astype(np.int64).sum())}),
        include_groups=False).reset_index())
    got_inv = (rows.groupby("fmt").apply(
        lambda g: pd.Series({
            "n": len(g),
            "n_psnr_ok": int(g["psnr_ok"].sum()),
            "n_caption_ok": int(g["caption_ok"].sum()),
            "min_psnr_floor": int(np.floor(g["psnr_db"].min()))}),
        include_groups=False).reset_index())

    con = duckdb.connect()
    want_stats = con.sql(Q.SQL_MM_STATS).df()
    want_inv = con.sql(Q.SQL_MM_INV).df()
    for got, want in ((got_stats, want_stats), (got_inv, want_inv)):
        got = got.sort_values("fmt").reset_index(drop=True)
        want = want.sort_values("fmt").reset_index(drop=True)
        assert list(got.columns) == list(want.columns)
        for c in got.columns:
            assert list(got[c]) == list(want[c]), (c, list(got[c]),
                                                   list(want[c]))


def test_batched_kernels_bit_identical():
    """phash64_batch / block_mean_resize_batch / psnr_batch must equal
    the per-image kernels elementwise (the stored phash column and the
    invariant checks depend on bit-exactness across both paths)."""
    import numpy as np
    from osm_io_spark.functions import images as I

    rng = np.random.Generator(np.random.Philox(key=7))
    stack = rng.integers(0, 256, (17, 16, 16, 3), dtype=np.uint8)
    batch = I.phash64_batch(stack)
    single = np.array([I.phash64(im) for im in stack])
    assert (batch == single).all()

    gray = stack.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    rb = I.block_mean_resize_batch(gray, 32)
    for i in range(len(stack)):
        assert (rb[i] == I._block_mean_resize(gray[i], 32)).all()

    other = rng.integers(0, 256, (17, 16, 16, 3), dtype=np.uint8)
    other[0] = stack[0]  # exercise the inf branch
    pb = I.psnr_batch(stack, other)
    assert np.isinf(pb[0])
    for i in range(1, len(stack)):
        assert pb[i] == I.psnr(stack[i], other[i])


def test_image_thresholds_survive_corpus_reseed(spark):
    """VERDICT r3 #6: the image-modality gates must not be tuned to
    seed 42. Rerun the IDENTICAL registry pipelines on a reseeded
    corpus (seed=7): the quantile-derived quality gate still splits
    canonicals into kept/dropped_quality, every twin still drops as a
    duplicate, and the construction-derived cos≥0.98 embedding gate
    still finds every source↔twin pair."""
    from osm_io_spark import queries as Q

    cur = {r["image_id"]: r for r in
           Q.image_curation_pipeline(spark, 120, seed=7).collect()}
    assert len(cur) == 240   # 120 sources + 120 twins
    for iid, r in cur.items():
        if iid.endswith("-r"):
            assert r["decision"] == "dropped_duplicate", (iid, r)
    kept = sum(r["decision"] == "kept" for r in cur.values())
    dq = sum(r["decision"] == "dropped_quality" for r in cur.values())
    assert kept > 0 and dq > 0, (kept, dq)

    pairs = Q.mm_embed_near_dup_pipeline(spark, 120, seed=7).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    for i in range(120):
        a, b = sorted([f"img-{i:012d}", f"img-{i:012d}-r"])
        assert (a, b) in got, f"twin pair {a}<->{b} missed at seed 7"


def test_caption_audit_matches_brute_force(spark):
    """caption_audit (band-join image candidates ∪ md5-equality caption
    candidates, classify) == the all-pairs python reference on the
    caption-variant corpus; every audit class is populated by
    construction of that corpus."""
    from osm_io_spark.operators import multimodal as MM
    from osm_io_spark.sources import synth as SY

    corpus = SY.images_with_caption_variants(spark, 120, seed=42)
    got = {(r["id_a"], r["id_b"]):
           (r["hamming"], r["caption_match"], r["audit_class"])
           for r in MM.caption_audit(corpus, max_k=4, nbits=63).collect()}

    stats = {r["image_id"]: int(r["phash_calc"])
             for r in MM.decode_stats(corpus).collect()}
    caps = {r["image_id"]: r["caption"]
            for r in corpus.select("image_id", "caption").collect()}
    ids = sorted(stats)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(stats[a] ^ stats[b]).count("1")
            cap = caps[a] == caps[b]
            if ham <= 4 and cap:
                want[(a, b)] = (ham, True, "consistent_dup")
            elif ham <= 4:
                want[(a, b)] = (ham, False, "caption_conflict")
            elif cap:
                want[(a, b)] = (ham, True, "image_conflict")
    assert got == want
    classes = {v[2] for v in want.values()}
    assert classes == {"consistent_dup", "caption_conflict",
                       "image_conflict"}


def test_caption_audit_group_guard(spark):
    """The caption-group quadratic guard raises (listing the hot
    caption) instead of running an all-pairs join over a template
    caption shared past max_caption_group."""
    from osm_io_spark.operators import multimodal as MM
    from osm_io_spark.sources import synth as SY

    corpus = SY.images_with_caption_variants(
        spark, 60, seed=42, reuse_groups=1)  # ALL odd twins share 1 caption
    with pytest.raises(ValueError, match="max_caption_group"):
        MM.caption_audit(corpus, max_k=4, nbits=63, max_caption_group=8)
