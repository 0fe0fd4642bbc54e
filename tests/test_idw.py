"""IDW interpolation (operators/knn.idw_interpolate): numpy all-pairs
brute-force referee for the registry entry, a hand-computed tiny case,
and the eps-floor contract for a sample coincident with a site."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osm_io_spark import queries as Q
from osm_io_spark.functions.geometry import EARTH_RADIUS_M
from osm_io_spark.operators import knn as KNN

SF_DIR = "/root/testdata/sf0.001"


def _idw_ref(slat, slon, ilat, ilon, iid, iv, k, power=2.0, eps=1.0):
    """Neighbor SELECTION uses the engine's own squared-chord floats
    (S2._latlon_xyz_np — the test_s2_knn referee pattern, so float
    near-ties order identically); the chord→arc conversion and the
    weight/aggregation FORMULA are computed independently in numpy."""
    from osm_io_spark.functions import s2 as S2
    bx, by, bz = S2._latlon_xyz_np(np.asarray(ilat, float),
                                   np.asarray(ilon, float))
    px, py, pz = S2._latlon_xyz_np(np.asarray([slat], float),
                                   np.asarray([slon], float))
    chord_sq = (bx - px[0]) ** 2 + (by - py[0]) ** 2 + (bz - pz[0]) ** 2
    order = np.lexsort((iid, chord_sq))[:k]
    d = 2 * EARTH_RADIUS_M * np.arcsin(
        np.minimum(np.sqrt(chord_sq[order]), 2.0) / 2.0)
    w = 1.0 / np.maximum(d, eps) ** power
    return (float((w * iv[order]).sum() / w.sum()),
            float(d.min()), float(d.max()))


def test_idw_registry_entry_matches_numpy_brute_force(spark):
    got = (Q.QUERIES["idw_interpolation"](spark, SF_DIR)
           .toPandas().set_index("site_id").sort_index())
    img = (Q.images_probe(spark, SF_DIR).toPandas()
           .drop_duplicates("img_id"))
    ilat = img["lat"].to_numpy()
    ilon = img["lon"].to_numpy()
    iid = img["img_id"].to_numpy()
    iv = (iid % 1000).astype(np.float64)
    sites = (Q._t(spark, SF_DIR, "nation")
             .select(F.col("n_nationkey").cast("long").alias("site_id"))
             .distinct()
             .withColumn("slat", F.expr(Q._SLAT))
             .withColumn("slon", F.expr(Q._SLON))).toPandas()
    assert len(got) == len(sites)
    assert (got["n_neighbors"] == 8).all()
    for _, s in sites.iterrows():
        want_v, want_dmin, want_dmax = _idw_ref(
            s["slat"], s["slon"], ilat, ilon, iid, iv, k=8)
        row = got.loc[s["site_id"]]
        assert np.isclose(row["idw_value"], want_v, rtol=1e-9), s["site_id"]
        assert np.isclose(row["d_min_m"], want_dmin, rtol=1e-9)
        assert np.isclose(row["d_max_m"], want_dmax, rtol=1e-9)


def test_idw_hand_case_and_eps_floor(spark):
    """One site at the origin, three samples at known arcs east/west —
    hand-computed weights; then a sample ON the site: the eps_m floor
    (1 m) caps its weight at 1/eps², which dominates k=2's other
    neighbor ~1e10:1, pulling idw to that sample's value."""
    sites = spark.createDataFrame(
        pd.DataFrame({"site_id": [1], "slat": [0.0], "slon": [0.0]}))
    # 0.01° and 0.02° arcs along the equator: d = R·radians(deg)
    samples = spark.createDataFrame(pd.DataFrame({
        "img_id": [10, 11, 12],
        "lat": [0.0, 0.0, 0.0],
        "lon": [0.01, -0.02, 0.04],
        "v": [100.0, 400.0, 800.0]}))
    out = (KNN.idw_interpolate(sites, samples, k=2, value_col="v")
           .toPandas())
    d1 = EARTH_RADIUS_M * np.radians(0.01)
    d2 = EARTH_RADIUS_M * np.radians(0.02)
    w1, w2 = 1 / d1**2, 1 / d2**2
    want = (w1 * 100.0 + w2 * 400.0) / (w1 + w2)
    assert len(out) == 1 and out["n_neighbors"][0] == 2
    assert np.isclose(out["idw_value"][0], want, rtol=1e-9)

    on_site = spark.createDataFrame(pd.DataFrame({
        "img_id": [20, 21],
        "lat": [0.0, 0.0], "lon": [0.0, 0.01],
        "v": [555.0, 100.0]}))
    out2 = (KNN.idw_interpolate(sites, on_site, k=2, value_col="v")
            .toPandas())
    assert np.isclose(out2["idw_value"][0], 555.0, atol=1e-3)
    assert out2["d_min_m"][0] < 1e-6


def test_idw_duplicate_sample_ids_not_double_counted(spark):
    """Base tables carry duplicate ids (CLAUDE.md): a duplicated
    neighbor row must not double its weight or occupy two ranks."""
    sites = spark.createDataFrame(
        pd.DataFrame({"site_id": [1], "slat": [0.0], "slon": [0.0]}))
    samples = spark.createDataFrame(pd.DataFrame({
        "img_id": [10, 10, 11],
        "lat": [0.0, 0.0, 0.0],
        "lon": [0.01, 0.01, -0.02],
        "v": [100.0, 100.0, 400.0]}))
    out = (KNN.idw_interpolate(sites, samples, k=2, value_col="v")
           .toPandas())
    d1 = EARTH_RADIUS_M * np.radians(0.01)
    d2 = EARTH_RADIUS_M * np.radians(0.02)
    w1, w2 = 1 / d1**2, 1 / d2**2
    want = (w1 * 100.0 + w2 * 400.0) / (w1 + w2)
    assert out["n_neighbors"][0] == 2
    assert np.isclose(out["idw_value"][0], want, rtol=1e-9)
