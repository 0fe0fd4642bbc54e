"""Multimodal column operators: image bytes as opaque binary + typed
metadata (w, h, fmt), processed with Arrow-batched mapInPandas kernels.

Real codecs for the in-repo formats (raw, q5 — functions.images);
jpeg/png/webp/audio/video decode is STUBBED with NotImplementedError
because no media libraries exist in this container — the Spark-side
plumbing (schema, batch shape, partitioning) is identical and is what
these operators test.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import images as I

DECODE_STATS = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("fmt", T.StringType(), False),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("mean_pixel", T.DoubleType(), False),
    T.StructField("phash_calc", T.LongType(), False),
    T.StructField("phash_ok", T.BooleanType(), False),
])


def _decode_stack(g: pd.DataFrame, w: int, h: int, fmt: str) -> "np.ndarray":
    """Decode one same-dims group into an (n, h, w, 3) uint8 stack —
    zlib is per-image by format, but everything downstream (gray,
    resize, DCT, stats) runs as one batched numpy call per group."""
    return np.stack([I.decode(bytes(b), w, h, fmt) for b in g["bytes"]])


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every image and emit pixel statistics + a phash
    verification flag (recomputed phash == stored phash). Same-dims
    images are stacked and processed with batched kernels
    (functions.images.phash64_batch) — one numpy call per (w, h, fmt)
    group per Arrow batch, not one per image."""

    def _stats(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            parts = []
            for (w, h, fmt), g in pdf.groupby(["w", "h", "fmt"], sort=False):
                w, h, fmt = int(w), int(h), str(fmt)
                stack = _decode_stack(g, w, h, fmt)
                means = stack.reshape(len(g), -1).mean(axis=1)
                phs = I.phash64_batch(stack)
                parts.append(pd.DataFrame({
                    "image_id": g["image_id"].to_numpy(),
                    "fmt": fmt, "w": w, "h": h,
                    "mean_pixel": means, "phash_calc": phs,
                    "phash_ok": phs == g["phash"].to_numpy(np.int64)}))
            yield pd.concat(parts, ignore_index=True)

    cols = ["image_id", "bytes", "w", "h", "fmt", "phash"]
    return images.select(*cols).mapInPandas(_stats, schema=DECODE_STATS)


def resize(images: DataFrame, out_size: int) -> DataFrame:
    """Decode → deterministic block-mean resize (grayscale path of the
    phash pipeline applied per channel) → re-encode raw. Returns the
    input schema with bytes/w/h/fmt replaced."""
    schema = T.StructType([
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ])

    def _resize(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            parts = []
            for (w, h, fmt), g in pdf.groupby(["w", "h", "fmt"], sort=False):
                w, h, fmt = int(w), int(h), str(fmt)
                stack = _decode_stack(g, w, h, fmt)
                # batched per-channel block-mean over the whole group
                small = np.stack([
                    I.block_mean_resize_batch(
                        stack[:, :, :, c].astype(np.float64), out_size)
                    for c in range(3)], axis=3)
                small8 = np.clip(np.round(small), 0, 255).astype(np.uint8)
                parts.append(pd.DataFrame({
                    "image_id": g["image_id"].to_numpy(),
                    "bytes": [I.encode(s, "raw") for s in small8],
                    "w": out_size, "h": out_size, "fmt": "raw"}))
            yield pd.concat(parts, ignore_index=True)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        _resize, schema=schema)


def image_embed(images: DataFrame, grid: int = 4) -> DataFrame:
    """(image_id, embedding) — deterministic visual feature extraction:
    per-channel ``grid``×``grid`` block means of the decoded pixels,
    flattened to 3·grid² dims, mean-CENTERED per vector, and
    L2-normalized. Centering matters: raw block means are all-positive
    vectors whose pairwise cosines crowd into [0.98, 1] (measured
    median 0.980 on the synthetic corpus), so no threshold separates
    duplicates from strangers; after centering the cross-image median
    is ~0.002 with twins still at ~1.0.

    This is the honest stand-in for a neural image encoder (no model
    weights ship in this container): the Spark-side contract — id +
    array<double> schema, Arrow batching, per-(w, h, fmt) stacked numpy
    kernels, downstream compatibility with the embedding dedup / ANN
    stack (operators.dedup.embedding_near_dup_pairs_ivf,
    operators.ann) — is real and tested; a real encoder drops into the
    same mapInPandas shape. Block means at a fixed grid are
    resolution-invariant by construction, so an image and its resized
    twin embed nearly identically — the property the image-embedding
    near-dup query exploits."""
    schema = T.StructType([
        T.StructField("image_id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), False),
    ])

    def _embed(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            parts = []
            for (w, h, fmt), g in pdf.groupby(["w", "h", "fmt"], sort=False):
                w, h, fmt = int(w), int(h), str(fmt)
                stack = _decode_stack(g, w, h, fmt)
                feats = np.stack([
                    I.block_mean_resize_batch(
                        stack[:, :, :, c].astype(np.float64), grid)
                    for c in range(3)], axis=3)
                flat = feats.reshape(len(g), -1)
                flat = flat - flat.mean(axis=1, keepdims=True)
                nrm = np.linalg.norm(flat, axis=1, keepdims=True)
                nrm[nrm == 0.0] = 1.0
                flat = flat / nrm
                parts.append(pd.DataFrame({
                    "image_id": g["image_id"].to_numpy(),
                    "embedding": list(flat)}))
            yield pd.concat(parts, ignore_index=True)

    return (images.select("image_id", "bytes", "w", "h", "fmt")
            .mapInPandas(_embed, schema=schema))


def frame_sample(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — container has no video codec; the operator
    exists to pin the schema/signature. Raises on execution."""

    def _sample(batches):
        for pdf in batches:
            if len(pdf):
                raise NotImplementedError(
                    "video decode unavailable in this environment "
                    "(no ffmpeg/cv2); plumbing-only stub")
            yield pdf

    return videos.mapInPandas(_sample, schema=videos.schema)


def audio_features(audio: DataFrame) -> DataFrame:
    """Audio feature extraction stub (no soundfile/librosa here)."""

    def _feat(batches):
        for pdf in batches:
            if len(pdf):
                raise NotImplementedError(
                    "audio decode unavailable in this environment; "
                    "plumbing-only stub")
            yield pdf

    return audio.mapInPandas(_feat, schema=audio.schema)


INVARIANTS = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("fmt", T.StringType(), False),
    T.StructField("psnr_db", T.DoubleType(), False),   # inf → 999.0
    T.StructField("psnr_ok", T.BooleanType(), False),
    T.StructField("caption_ok", T.BooleanType(), False),
])


def invariant_check(images: DataFrame, seed: int = 42,
                    min_psnr_db: float = 40.0) -> DataFrame:
    """The driver's per-row invariant vs reference data
    (BASELINE.json input_hint): decoded-pixel allclose — PSNR ≥ 40 dB
    for lossy formats, exact for lossless — plus caption equality.

    The 'reference pixels/caption' are regenerated from the deterministic
    generator (sources.synth derives both purely from (seed, id)), so the
    check is a true independent recomputation, not a tautology over the
    stored bytes."""

    def _check(batches: Iterable[pd.DataFrame]):
        from ..sources.synth import reference_pixels_caption
        for pdf in batches:
            if len(pdf) == 0:
                continue
            parts = []
            for (w, h, fmt), g in pdf.groupby(["w", "h", "fmt"], sort=False):
                w, h, fmt = int(w), int(h), str(fmt)
                stack = _decode_stack(g, w, h, fmt)
                refs, cap_ok = [], []
                for r in g.itertuples():   # per-image: reference regen
                    i = int(str(r.image_id).split("-")[-1])
                    ref_px, ref_caption = reference_pixels_caption(
                        i, seed, w, h, fmt)
                    refs.append(ref_px)
                    cap_ok.append(str(r.caption) == ref_caption)
                p = I.psnr_batch(np.stack(refs), stack)
                p_val = np.where(np.isinf(p), 999.0, p)
                parts.append(pd.DataFrame({
                    "image_id": g["image_id"].to_numpy(), "fmt": fmt,
                    "psnr_db": p_val, "psnr_ok": p_val >= min_psnr_db,
                    "caption_ok": np.array(cap_ok)}))
            yield pd.concat(parts, ignore_index=True)

    cols = ["image_id", "bytes", "w", "h", "fmt", "caption"]
    return images.select(*cols).mapInPandas(_check, schema=INVARIANTS)


def caption_audit(images: DataFrame, max_k: int = 4, nbits: int = 63,
                  max_caption_group: int = 4096,
                  caption_col: str = "caption") -> DataFrame:
    """Cross-modal consistency audit over an image+caption corpus: find
    every pair that is near-duplicate in EITHER modality and classify
    the agreement — the curation signal an image-text training pipeline
    needs before collapsing duplicates (re-captioned crops, stock
    captions pasted onto unrelated photos, true duplicates).

      consistent_dup    pixels near-dup (hamming ≤ max_k on recomputed
                        phash) AND captions identical — safe to collapse
      caption_conflict  pixels near-dup, captions differ — collapsing
                        loses a caption; surface for review
      image_conflict    captions identical, pixels far — a template /
                        stock caption on distinct content; keeping both
                        would double-weight the caption text

    Output: (id_a, id_b, hamming, caption_match, audit_class).

    Scale design: image-near candidates come from the pigeonhole band
    join (hamming_near_dup_pairs — salted, never cross-join); caption
    candidates from an equi-join on md5(caption), quadratic only within
    a caption-dup GROUP, guarded by ``max_caption_group`` (template
    captions are Zipf-headed at web scale — the guard raises with the
    hot captions listed rather than silently running an all-pairs blow
    up; route those through dedup_clusters star representation
    instead). The classify join reads one pinned (id, phash, caption)
    frame on both sides — decode runs ONCE (fan-out rule).
    """
    from . import dedup as DD
    caps = images.select(F.col("image_id"), F.col(caption_col))
    feat = (decode_stats(images)
            .select("image_id", "phash_calc")
            .join(caps, on="image_id")
            .withColumn("_ck", F.md5(F.col(caption_col)))
            .localCheckpoint(eager=False))

    if max_caption_group is not None:
        hot = (feat.groupBy("_ck").count()
               .filter(F.col("count") > max_caption_group)
               .limit(5).collect())
        if hot:
            raise ValueError(
                f"caption_audit: caption-dup groups exceed "
                f"max_caption_group={max_caption_group} "
                f"(e.g. {[(r['_ck'], r['count']) for r in hot]}); "
                "an all-pairs join inside those groups is quadratic — "
                "dedup the hot captions via their md5 group (star "
                "representation) first, or raise max_caption_group")

    img_pairs = DD.hamming_near_dup_pairs(
        feat, max_k=max_k, nbits=nbits,
        fp_col="phash_calc", id_col="image_id").select("id_a", "id_b")
    cx = feat.select(F.col("image_id").alias("id_a"), "_ck")
    cy = feat.select(F.col("image_id").alias("id_b"), "_ck")
    cap_pairs = (cx.join(cy, on="_ck")
                 .filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b"))
    cands = img_pairs.unionByName(cap_pairs).distinct()

    fa = feat.select(F.col("image_id").alias("id_a"),
                     F.col("phash_calc").alias("_pa"),
                     F.col(caption_col).alias("_ca"))
    fb = feat.select(F.col("image_id").alias("id_b"),
                     F.col("phash_calc").alias("_pb"),
                     F.col(caption_col).alias("_cb"))
    ham = F.bit_count(F.col("_pa").bitwiseXOR(F.col("_pb"))).cast("long")
    cap_eq = F.col("_ca") == F.col("_cb")
    cls = (F.when((ham <= max_k) & cap_eq, F.lit("consistent_dup"))
           .when(ham <= max_k, F.lit("caption_conflict"))
           .otherwise(F.lit("image_conflict")))
    return (cands.join(fa, on="id_a").join(fb, on="id_b")
            .select("id_a", "id_b", ham.alias("hamming"),
                    cap_eq.alias("caption_match"),
                    cls.alias("audit_class")))
