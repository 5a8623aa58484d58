"""ImageCollection discovery + groupby-merge and Band.buffer morphology
(reference image_collection.py:126-135, 271-390, 1288-1300, 3508-3535)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sgspark.image_collection import (collection_groupby_merge,
                                      discover_images, filter_dates)
from sgspark.zonal import _binary_square_morph, band_buffer

PATHS = [
    "/data/S2A_20230607/S2A_20230607_T32VNM_B02.tif",
    "/data/S2A_20230607/S2A_20230607_T32VNM_B03.tif",
    "/data/S2B_20230905/S2B_20230905_T32VNM_B02.tif",
    "/data/S2B_20230905/S2B_20230905_T32VNM_B03.tif",
    "/data/S2B_20230905/manifest.json",          # dropped (not raster)
    "/data/IMG_20240101/no_band_here.tiff",      # date from dir, band null
]


def test_discover_images(spark):
    cat = discover_images(
        spark.createDataFrame(pd.DataFrame({"path": PATHS}))).toPandas()
    assert len(cat) == 5  # manifest.json dropped
    r = cat.set_index("filename")
    assert r.loc["S2A_20230607_T32VNM_B02.tif", "date"] == "20230607"
    assert r.loc["S2A_20230607_T32VNM_B02.tif", "band"] == "B02"
    assert r.loc["S2A_20230607_T32VNM_B02.tif", "tile"] == "T32VNM"
    # date falls back to the image directory name
    assert r.loc["no_band_here.tiff", "date"] == "20240101"
    assert pd.isna(r.loc["no_band_here.tiff", "band"])


def test_filter_dates(spark):
    cat = discover_images(
        spark.createDataFrame(pd.DataFrame({"path": PATHS})))
    kept = filter_dates(cat, ("2023-07-01", None)).toPandas()
    assert set(kept.date) == {"20230905", "20240101"}
    kept2 = filter_dates(cat, (("2023-06-01", "2023-06-30"),
                               ("2024-01-01", None))).toPandas()
    assert set(kept2.date) == {"20230607", "20240101"}


def test_groupby_merge_by_band(spark):
    """Two dates x two bands over one tile: groupby band merges across
    dates per pixel (reference merge_by_band semantics)."""
    cat = discover_images(
        spark.createDataFrame(pd.DataFrame({"path": PATHS[:4]})))
    vals = {
        "S2A_20230607_T32VNM_B02.tif": [1.0, 2.0, 3.0, 4.0],
        "S2B_20230905_T32VNM_B02.tif": [3.0, 6.0, 5.0, 8.0],
        "S2A_20230607_T32VNM_B03.tif": [10.0, 10.0, 10.0, 10.0],
        "S2B_20230905_T32VNM_B03.tif": [20.0, 30.0, 40.0, 50.0],
    }
    tiles = spark.createDataFrame(pd.DataFrame({
        "path": [p for p in PATHS[:4]],
        "tile_id": ["t0"] * 4,
        "x0": [0.0] * 4, "y0": [0.0] * 4, "res": [10.0] * 4,
        "nx": [2] * 4, "ny": [2] * 4,
        "values": [vals[p.split("/")[-1]] for p in PATHS[:4]]}))
    out = collection_groupby_merge(cat, tiles, by=["band"], how="mean") \
        .toPandas().set_index("band")
    assert np.allclose(out.loc["B02", "values"], [2.0, 4.0, 4.0, 6.0])
    assert np.allclose(out.loc["B03", "values"], [15.0, 20.0, 25.0, 30.0])
    # groupby (band, date) keeps each image separate
    out2 = collection_groupby_merge(cat, tiles, by=["band", "date"],
                                    how="mean").toPandas()
    assert len(out2) == 4


# ------------------------------------------------------------ morphology
def _brute_morph(a, d, dilate):
    """Independent O(n^2 d^2) oracle with border_value=0 semantics."""
    m, n = a.shape
    out = np.zeros_like(a, dtype=bool)
    for i in range(m):
        for j in range(n):
            vals = []
            for di in range(-d, d + 1):
                for dj in range(-d, d + 1):
                    ii, jj = i + di, j + dj
                    vals.append(bool(a[ii, jj])
                                if 0 <= ii < m and 0 <= jj < n else False)
            out[i, j] = any(vals) if dilate else all(vals)
    return out


def test_square_morph_matches_bruteforce():
    rng = np.random.RandomState(7)
    a = rng.rand(13, 9) < 0.4
    for d in (1, 2, 3):
        for dilate in (True, False):
            got = _binary_square_morph(a, d, dilate)
            want = _brute_morph(a, d, dilate)
            assert (got == want).all(), (d, dilate)


def test_band_buffer_spark(spark):
    v = np.zeros((6, 6))
    v[2, 2] = 1.0
    tiles = spark.createDataFrame(pd.DataFrame({
        "tile_id": ["t"], "x0": [0.0], "y0": [0.0], "res": [10.0],
        "nx": [6], "ny": [6], "values": [v.ravel().tolist()]}))
    out = band_buffer(tiles, 1).toPandas()
    r = np.asarray(out["values"].iloc[0]).reshape(6, 6)
    assert r.sum() == 9  # 3x3 square around the seed
    back = band_buffer(spark.createDataFrame(out), -1).toPandas()
    r2 = np.asarray(back["values"].iloc[0]).reshape(6, 6)
    assert (r2 == v).all()  # dilate then erode returns the seed
    # non-binary raises like the reference
    bad = spark.createDataFrame(pd.DataFrame({
        "tile_id": ["t"], "x0": [0.0], "y0": [0.0], "res": [10.0],
        "nx": [2], "ny": [2], "values": [[0.0, 0.5, 1.0, 0.0]]}))
    with pytest.raises(Exception, match="0s and 1s"):
        band_buffer(bad, 1).collect()
