"""Deterministic synthetic fixtures (pure functions of a seed — no
external data; FIXTURES.md).

- ``images_df``: the driver-mandated image+caption probe table
  (image_id, bytes, w, h, fmt, caption, phash, lat, lon). Geotags follow
  a Zipf distribution over cluster centers so hot cells exercise the
  salting / AQE skew path. Rows are generated DISTRIBUTED
  (spark.range → mapInPandas) so fixture generation itself scales.
- ``polygons_local`` / ``polygons_df``: build-side polygons (rects,
  triangles, hexagons, plus oversized "continents" that cover many
  cells).
- ``osm_elements_local``: nodes/ways/relations rows forming closed ways
  and multipolygon relations, mirroring the reference fixtures' shape
  (niue-230109: see SURVEY.md §5), plus a golden analysis dict in the
  same shape the reference asserts (tests/common/mod.rs).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import schemas
from ..functions import images as img

N_CLUSTERS = 50
_CLUSTER_WEIGHTS = 1.0 / np.arange(1, N_CLUSTERS + 1)
_CLUSTER_CDF = np.cumsum(_CLUSTER_WEIGHTS) / _CLUSTER_WEIGHTS.sum()


def _cluster_centers(seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(seed))
    lat = rng.uniform(-60, 60, N_CLUSTERS)
    lon = rng.uniform(-170, 170, N_CLUSTERS)
    return np.stack([lat, lon], axis=1)


def _u01(ids: np.ndarray, salt: str) -> np.ndarray:
    """Deterministic uniform [0,1) per id via md5 (stable everywhere)."""
    out = np.empty(len(ids), np.float64)
    for i, v in enumerate(ids):
        h = hashlib.md5(f"{salt}:{int(v)}".encode()).digest()
        out[i] = int.from_bytes(h[:8], "big") / 2.0**64
    return out


def images_pdf(ids: np.ndarray, seed: int, w: int = 16, h: int = 16,
               with_bytes: bool = True) -> pd.DataFrame:
    """Pandas batch of deterministic image rows for the given ids."""
    centers = _cluster_centers(seed)
    u_cl = _u01(ids, f"cl{seed}")
    k = np.searchsorted(_CLUSTER_CDF, u_cl)
    off_lat = (_u01(ids, f"la{seed}") - 0.5) * 2.0
    off_lon = (_u01(ids, f"lo{seed}") - 0.5) * 2.0
    lat = np.clip(centers[k, 0] + off_lat, -89.99, 89.99)
    lon = centers[k, 1] + off_lon

    fmts = ["q5" if int(i) % 3 == 0 else "raw" for i in ids]
    captions = [f"synthetic scene {int(i)} cluster {int(k[j])} fmt {fmts[j]}"
                for j, i in enumerate(ids)]
    if with_bytes:
        # pixel gen + zlib stay per image (the Philox stream is keyed
        # per id — part of the determinism contract); the phash runs
        # BATCHED over the decoded stack. decode(encode(px, fmt)) is
        # computed closed-form (q5: (px>>3)<<3|4) instead of a zlib
        # round trip.
        px_all = np.empty((len(ids), h, w, 3), np.uint8)
        datas = []
        for j, i in enumerate(ids):
            rng = np.random.Generator(
                np.random.Philox(key=seed * 1_000_003 + int(i)))
            px_all[j] = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            datas.append(img.encode(px_all[j], fmts[j]))
        decoded = px_all.copy()
        q5_mask = np.array([f == "q5" for f in fmts])
        if q5_mask.any():
            decoded[q5_mask] = ((px_all[q5_mask] >> 3) << 3) | 4
        phs = img.phash64_batch(decoded)
    else:
        datas = [None] * len(ids)
        phs = np.zeros(len(ids), np.int64)
    return pd.DataFrame({
        "image_id": [f"img-{int(i):012d}" for i in ids],
        "bytes": datas, "w": w, "h": h, "fmt": fmts,
        "caption": captions, "phash": phs,
        "lat": lat.astype(np.float64), "lon": lon.astype(np.float64)})


def images_df(spark: SparkSession, n: int, seed: int = 42,
              with_bytes: bool = True, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic image table of n rows."""
    parts = partitions or max(8, n // 50_000)

    def gen(batches):
        for pdf in batches:
            yield images_pdf(pdf["id"].to_numpy(), seed, with_bytes=with_bytes)

    return (spark.range(0, n, 1, parts)
            .mapInPandas(gen, schema=schemas.IMAGES))


def images_with_twins(spark: SparkSession, n: int, seed: int = 42,
                      partitions: int = 8, size: int = 16,
                      with_phash: bool = False) -> DataFrame:
    """Image corpus plus its resized twins — the shared near-dup
    corpus: every image reappears as ``<id>-r`` with the same content
    block-mean-resized to ``size``×``size``. ONE definition feeds the
    mm_phash_near_dup / image_curation / mm_embed_near_dup registry
    queries and the sf1 evidence job, so they all measure the same
    pipeline (previously triplicated inline — review finding).
    ``with_phash`` keeps the stored phash column (twins get 0: their
    stored hash is unknown by construction; decode_stats recomputes)."""
    from pyspark.sql import functions as F

    from ..operators import multimodal as MM
    imgs = images_df(spark, n, seed=seed, partitions=partitions)
    cols = ["image_id", "bytes", "w", "h", "fmt"] + (
        ["phash"] if with_phash else [])
    resized = (MM.resize(imgs, size)
               .select(F.concat(F.col("image_id"), F.lit("-r"))
                       .alias("image_id"), "bytes", "w", "h", "fmt"))
    if with_phash:
        resized = resized.withColumn("phash", F.lit(0))
    return imgs.select(*cols).unionByName(resized)


def images_with_caption_variants(spark: SparkSession, n: int,
                                 seed: int = 42, partitions: int = 8,
                                 size: int = 16,
                                 reuse_groups: int = 40) -> DataFrame:
    """The cross-modal audit corpus: base images + resized twins where
    half the twins keep the source caption (consistent duplicates) and
    half get a TEMPLATE caption reused across small groups — twins that
    are pixel-near their source but caption-different (caption
    conflicts), and caption-identical to content-distinct rows (image
    conflicts). Deterministic in (n, seed); every class of
    multimodal.caption_audit is populated by construction."""
    from pyspark.sql import functions as F

    from ..operators import multimodal as MM
    imgs = images_df(spark, n, seed=seed, partitions=partitions)
    idx = F.substring("image_id", 5, 12).cast("long")
    caps = imgs.select(
        "image_id",
        F.when(idx % 2 == 0, F.col("caption"))
        .otherwise(F.concat(F.lit("stock photo caption "),
                            (idx % reuse_groups).cast("string")))
        .alias("_twin_caption"))
    resized = (MM.resize(imgs, size)
               .join(caps, on="image_id")
               .select(F.concat(F.col("image_id"), F.lit("-r"))
                       .alias("image_id"),
                       "bytes", "w", "h", "fmt",
                       F.col("_twin_caption").alias("caption"),
                       F.lit(0).cast("long").alias("phash")))
    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    return imgs.select(*cols).unionByName(resized)


def polygons_local(n: int, seed: int = 42) -> list[dict]:
    """n deterministic polygons: 60% rects, 20% triangles, 15% hexagons,
    5% oversized 'continents' (hot build-side rows)."""
    centers = _cluster_centers(seed + 7)
    out = []
    for i in range(n):
        u = _u01(np.array([i]), f"poly{seed}")[0]
        c = centers[i % N_CLUSTERS]
        cy, cx = float(c[0]), float(c[1])
        if u < 0.60:
            hw = 0.05 + 0.4 * _u01(np.array([i]), f"pw{seed}")[0]
            hh = 0.05 + 0.4 * _u01(np.array([i]), f"ph{seed}")[0]
            ring = [(cx - hw, cy - hh), (cx + hw, cy - hh),
                    (cx + hw, cy + hh), (cx - hw, cy + hh)]
        elif u < 0.80:
            r = 0.1 + 0.5 * _u01(np.array([i]), f"pt{seed}")[0]
            ring = [(cx, cy + r), (cx - 0.9 * r, cy - 0.7 * r), (cx + 0.8 * r, cy - 0.6 * r)]
        elif u < 0.95:
            r = 0.1 + 0.4 * _u01(np.array([i]), f"ph6{seed}")[0]
            ring = [(cx + r * math.cos(a), cy + r * math.sin(a))
                    for a in [k * math.pi / 3 for k in range(6)]]
        else:
            hw, hh = 8.0, 5.0
            ring = [(cx - hw, cy - hh), (cx + hw, cy - hh),
                    (cx + hw, cy + hh), (cx - hw, cy + hh)]
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        out.append({
            "polygon_id": int(i + 1),
            "source": "way",
            "rings": [[{"lon": float(x), "lat": float(y)} for x, y in ring]],
            "left": float(min(xs)), "bottom": float(min(ys)),
            "right": float(max(xs)), "top": float(max(ys)),
            "tags": [{"k": "synthetic", "v": "true"}],
        })
    return out


def polygons_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(polygons_local(n, seed), schema=schemas.POLYGONS)


def osm_elements_local(seed: int = 42, n_nodes: int = 2000, n_ways: int = 150,
                       n_relations: int = 12, history: bool = False):
    """(nodes, ways, relations) row dicts + golden analysis dict.

    Shape mirrors the reference niue fixtures: sparse ascending ids,
    closed ways referencing real nodes, multipolygon relations with
    outer/inner way members, 'natural=tree' nodes to drive the canonical
    filter (/root/reference/src/lib.rs:69-90). With history=True, some
    elements get multiple versions and invisible final versions —
    exercising the latest-version / visibility logic
    (/root/reference/src/osm/apidb_dump/write/current_object.rs:18-31).
    """
    rng = np.random.Generator(np.random.Philox(seed + 101))
    base_ts = 1_600_000_000_000

    nodes = []
    node_ids = []
    nid = 184_252_000
    for i in range(n_nodes):
        nid += int(rng.integers(1, 40))
        node_ids.append(nid)
        lat = float(rng.uniform(-19.35, -18.75))
        lon = float(rng.uniform(-170.16, -169.56))
        tags = []
        if i % 17 == 0:
            tags = [{"k": "natural", "v": "tree"}]
        elif i % 23 == 0:
            tags = [{"k": "amenity", "v": "cafe"}, {"k": "name", "v": f"node {nid}"}]
        nodes.append({
            "id": nid, "version": 1, "lat": lat, "lon": lon,
            # uid is a function of changeset: the apidb schema stores
            # authorship only on changesets (element uid is derived via
            # the changeset->user lookup, element_iterator.rs:120-122)
            "timestamp": base_ts + i * 1000, "changeset": 1000 + i % 37,
            "uid": 1 + (i % 37) % 11, "user": f"user{1 + (i % 37) % 11}",
            "visible": True, "tags": tags,
        })

    ways = []
    way_ids = []
    wid = 17_781_000
    for i in range(n_ways):
        wid += int(rng.integers(1, 25))
        way_ids.append(wid)
        k = int(rng.integers(4, 9))
        start = int(rng.integers(0, n_nodes - k))
        refs = [node_ids[start + j] for j in range(k)]
        refs.append(refs[0])  # closed ring
        ways.append({
            "id": wid, "version": 1, "refs": refs,
            "timestamp": base_ts + i * 2000, "changeset": 2000 + i % 29,
            "uid": 1 + (i % 29) % 11, "user": f"user{1 + (i % 29) % 11}",
            "visible": True,
            "tags": [{"k": "building", "v": "yes"}] if i % 2 == 0 else
                    [{"k": "landuse", "v": "forest"}],
        })

    relations = []
    rid = 1_556_900
    for i in range(n_relations):
        rid += int(rng.integers(1, 9))
        outer = way_ids[(3 * i) % n_ways]
        inner = way_ids[(3 * i + 1) % n_ways]
        members = [
            {"type": "Way", "id": outer, "role": "outer"},
            {"type": "Way", "id": inner, "role": "inner"},
            {"type": "Node", "id": node_ids[i], "role": "admin_centre"},
        ]
        relations.append({
            "id": rid, "version": 1, "members": members,
            "timestamp": base_ts + i * 3000, "changeset": 3000 + i,
            "uid": 1 + i % 11, "user": f"user{1 + i % 11}",  # changeset unique per relation
            "visible": True,
            "tags": [{"k": "type", "v": "multipolygon"}],
        })

    if history:
        extra_nodes = []
        for i, nd in enumerate(nodes):
            if i % 5 == 0:  # a second version; every 3rd of those invisible
                v2 = dict(nd)
                v2["version"] = 2
                v2["timestamp"] = nd["timestamp"] + 86_400_000
                v2["visible"] = i % 15 != 0
                v2["lat"] = nd["lat"] + 1e-4
                extra_nodes.append(v2)
        nodes.extend(extra_nodes)
        nodes.sort(key=lambda r: (r["id"], r["version"]))

    lats = [nd["lat"] for nd in nodes]
    lons = [nd["lon"] for nd in nodes]
    analysis = {
        "data": {
            "count": {"nodes": len(nodes), "ways": len(ways),
                      "relations": len(relations)},
            "bbox": [min(lons), min(lats), max(lons), max(lats)],
            "minid": {"nodes": min(n["id"] for n in nodes),
                      "ways": min(w["id"] for w in ways),
                      "relations": min(r["id"] for r in relations)},
            "maxid": {"nodes": max(n["id"] for n in nodes),
                      "ways": max(w["id"] for w in ways),
                      "relations": max(r["id"] for r in relations)},
            "multiple_versions": history,
            "objects_ordered": True,
        }
    }
    return nodes, ways, relations, analysis


def reference_pixels_caption(i: int, seed: int, w: int, h: int,
                             fmt: str) -> tuple[np.ndarray, str]:
    """The single-row reference oracle behind images_pdf: the exact
    pre-encode pixel array and caption for id ``i`` (pure function of
    (seed, id) — used by multimodal.invariant_check as independent
    reference data)."""
    centers = _cluster_centers(seed)
    k = int(np.searchsorted(_CLUSTER_CDF, _u01(np.array([i]), f"cl{seed}")[0]))
    caption = f"synthetic scene {i} cluster {k} fmt {fmt}"
    rng = np.random.Generator(np.random.Philox(key=seed * 1_000_003 + i))
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return px, caption
