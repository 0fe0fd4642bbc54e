"""Single source of truth for bench timing methodology, shared by
``bench.py`` (the driver's per-round harness) and
``osm_io_spark.jobs.remeasure`` (targeted re-timing of individual
entries). Round-5 review finding: remeasure carried a hand-copied
``CONSTRUCT_IN_TIMER`` that was already stale at introduction (it
missed ``s2_knn_join`` / ``s2_multires_rollup``) and ignored
``BENCH_OVERRIDES`` entirely — so a "re-measurement" could time a
different computation than the bench row it claimed to re-check.
Both harnesses now import from here; anything added to the bench
methodology lands in both tools by construction.
"""

from __future__ import annotations

# Queries whose driver function itself runs jobs (dedup_clusters'
# label-propagation rounds; the IVF queries' index build, which
# executes toPandas() passes before any count) must construct INSIDE
# the timer or the timing only covers the final cached count;
# everything else keeps the round-1 methodology (construction
# excluded — comparable across rounds, and plan building is a
# once-per-query driver cost).
CONSTRUCT_IN_TIMER = {
    "dedup_clusters", "corpus_curation",
    "dedup_embedding_ivf", "ann_ivf_topk",
    # image_curation runs clustering rounds, mm_embed_near_dup builds
    # its IVF index, and knn_graph sizes its block grid with an eager
    # count — same rule
    "image_curation", "mm_embed_near_dup", "knn_graph",
    "knn_graph_ivf",
    # pack_sequences collects per-partition offsets eagerly;
    # mm_caption_audit runs its caption-group guard aggregation
    "pack_sequences", "mm_caption_audit",
    # the S2 joins collect the distinct index levels eagerly, which
    # materializes the checkpointed 30-level encode — the dominant
    # cost must land inside the timer (same rule); the polygon join
    # also computes its covers driver-side; the S2 kNN runs its whole
    # expansion loop eagerly
    "s2_containment_join", "s2_cap_cover_join",
    "s2_polygon_cover_join", "s2_knn_join",
    # s2_distance_join collects its site list and plans the cap covers
    # driver-side at construction, then collects the distinct cover
    # levels (materializing the pinned encode) — same rule
    "s2_distance_join",
    # the rollup cascades pin each level's partial with a lazy
    # localCheckpoint — a reused object would count from the
    # checkpointed RDDs and time only the final union
    "s2_multires_rollup", "tile_pyramid",
    # tile_retile pins its dirty-tile set with a lazy localCheckpoint
    # and runs an eager broadcast-gate count; heatmap_pyramid pins each
    # cascade level — same rule
    "tile_retile", "heatmap_pyramid",
    # ctx_cascade_discard runs an eager broadcast-gate count on the
    # deleted set; ctx_relation_closure runs its whole BFS frontier
    # loop (persist + isEmpty per level) at construction — same rule
    "ctx_cascade_discard", "ctx_relation_closure",
    # spatial_dbscan runs its eager candidate-volume guard, the CC
    # propagation rounds, and pins the pair frame with a lazy
    # localCheckpoint at construction — same rule (overlap_dissolve:
    # the overlap-join fan-out guard count + the same CC rounds;
    # hotspot_gistar: lazy-checkpointed cell counts — a reused object
    # would time only the post-checkpoint tail)
    "spatial_dbscan", "overlap_dissolve", "hotspot_gistar",
}


# Timing overrides where the registry function bundles a correctness
# artifact the bench should not charge to the operator: q_knn_graph_ivf
# also computes the EXACT graph for its recall column, so timing the
# registry fn makes the IVF scale path look slower than the exact
# `knn_graph` row it exists to beat. Bench the scale path alone — same
# parameters as the registry query, matching sf1_evidence's
# knn_graph_ivf_20k row.
def _bench_knn_graph_ivf(spark, sf_dir):
    from osm_io_spark.operators import ann as ANN
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ANN.knn_graph_ivf(emb, k=5, n_centroids=16, n_probe=8)


# The registry's vector_tiles entry runs over the small PBF fixture
# (so its brute-force parity suite stays cheap); the bench times the
# same pipeline at SF scale instead — every part-table rect+triangle
# polygon clipped/simplified/quantized into z=12 slippy tiles — so the
# row reflects kernel + fan-out throughput, not fixture decode. The
# mvt_tiles row encodes the same feature frame into per-tile MVT blobs
# (what it adds over the vector_tiles row is the encode stage).
def _bench_tile_features(spark, sf_dir):
    from pyspark.sql import functions as F

    from osm_io_spark import queries as Q
    from osm_io_spark.operators import tiles as TL

    rects = Q.rect_polygons(spark, sf_dir)
    ring = F.array(
        F.struct(F.col("left").alias("lon"), F.col("bottom").alias("lat")),
        F.struct(F.col("right").alias("lon"), F.col("bottom").alias("lat")),
        F.struct(F.col("right").alias("lon"), F.col("top").alias("lat")),
        F.struct(F.col("left").alias("lon"), F.col("top").alias("lat")))
    rr = rects.select("polygon_id", F.array(ring).alias("rings"),
                      "left", "bottom", "right", "top")
    tr = Q.tri_polygons_ringed(spark, sf_dir).select(
        "polygon_id", "rings", "left", "bottom", "right", "top")
    return TL.build_vector_tiles(rr.unionByName(tr), zoom=12)


def _bench_vector_tiles(spark, sf_dir):
    from osm_io_spark.operators import tiles as TL

    return TL.tile_layer_stats(_bench_tile_features(spark, sf_dir))


def _bench_mvt_tiles(spark, sf_dir):
    from pyspark.sql import functions as F

    from osm_io_spark.operators import tiles as TL

    return TL.encode_mvt_tiles(_bench_tile_features(spark, sf_dir)).select(
        "z", "x", "y", "n_features", F.length("mvt").alias("mvt_bytes"))


BENCH_OVERRIDES = {
    "knn_graph_ivf": _bench_knn_graph_ivf,
    "vector_tiles": _bench_vector_tiles,
    "mvt_tiles": _bench_mvt_tiles,
}
