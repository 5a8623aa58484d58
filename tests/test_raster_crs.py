"""Round-2 raster surface (Band.apply/clip/sample, pixelwise/NDVI) and CRS
machinery (exact Transverse Mercator, frame tags, mismatch errors)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiles(spark):
    from sgspark.zonal import synth_raster_tiles
    return synth_raster_tiles(spark, 0, 0, 2000, 2000,
                              tile_size=1000.0, res=100.0).cache()


def test_band_apply(spark, tiles):
    from sgspark.zonal import band_apply
    out = band_apply(tiles, "square", scale=2.0, offset=1.0)
    a = tiles.orderBy("tile_id").first()
    b = out.orderBy("tile_id").first()
    want = np.asarray(a["values"]) ** 2 * 2 + 1
    assert np.allclose(b["values"], want)
    with pytest.raises(ValueError):
        band_apply(tiles, "no_such_fn")


def test_band_clip_window(spark, tiles):
    from sgspark.zonal import band_clip
    out = band_clip(tiles, (250, 250, 750, 750)).collect()
    # window inside one tile -> one cropped tile; pixels 2..7 overlap
    # [250, 750] at res 100 -> 6x6 crop anchored at 200
    assert len(out) == 1
    assert (out[0]["nx"], out[0]["ny"]) == (6, 6)
    assert out[0]["x0"] == 200.0 and out[0]["y0"] == 200.0
    # pruning: tiles fully outside never survive the JVM filter
    assert band_clip(tiles, (5000, 5000, 6000, 6000)).count() == 0


def test_band_sample_deterministic(spark, tiles):
    from sgspark.zonal import band_sample
    a = band_sample(tiles, 7).orderBy("tile_id", "x", "y").collect()
    b = band_sample(tiles.repartition(5), 7) \
        .orderBy("tile_id", "x", "y").collect()
    assert [(r.x, r.y, r.value) for r in a] == \
        [(r.x, r.y, r.value) for r in b]
    assert len(a) == 7 * 4


def test_ndvi_pixelwise(spark, tiles):
    from sgspark.zonal import band_apply, ndvi
    nir = band_apply(tiles, "abs", scale=1.0, offset=3.0)  # >0 everywhere
    red = band_apply(tiles, "abs", scale=1.0, offset=1.0)
    out = ndvi(nir, red)
    row = out.orderBy("tile_id").first()
    base = np.abs(np.asarray(tiles.orderBy("tile_id").first()["values"]))
    want = ((base + 3) - (base + 1)) / ((base + 3) + (base + 1))
    assert np.allclose(row["values"], want)


# --------------------------------------------------------------------- CRS
def test_tm_known_values():
    from sgspark.geom.crs import wgs84_to_utm, utm_to_wgs84
    # canonical check: 60N on the zone-33 central meridian (15E)
    x, y = wgs84_to_utm(np.array([15.0]), np.array([60.0]))
    assert x[0] == pytest.approx(500000.0, abs=1e-6)
    assert y[0] == pytest.approx(6651411.190, abs=0.01)
    # roundtrip over a lattice
    lon = np.linspace(9, 21, 25)
    lat = np.linspace(55, 71, 25)
    X, Y = wgs84_to_utm(lon, lat)
    lon2, lat2 = utm_to_wgs84(X, Y)
    assert np.abs(lon2 - lon).max() < 1e-10
    assert np.abs(lat2 - lat).max() < 1e-10


def test_frame_crs_tags_and_mismatch(spark):
    from sgspark.crs import set_crs, get_crs, to_4326, from_4326
    from sgspark.io import wkt_to_wkb_df
    from sgspark.joins import sjoin_pairs
    df = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame({
        "pid": [1], "geometry_wkt": ["POINT (262409 6649017)"]})))
    utm = set_crs(df, 25833)
    assert get_crs(utm) == "EPSG:25833"
    geo = to_4326(utm)
    assert get_crs(geo) == "EPSG:4326"
    row = geo.first()
    assert row.minx == pytest.approx(10.75, abs=0.01)
    assert row.miny == pytest.approx(59.91, abs=0.01)
    back = from_4326(geo)
    assert get_crs(back) == "EPSG:25833"
    assert back.first().minx == pytest.approx(262409, abs=0.001)
    # binary op raises on mismatch
    with pytest.raises(ValueError, match="CRS mismatch"):
        sjoin_pairs(utm, geo, "intersects", left_id="pid", right_id="pid")


def test_band_gradient_halo(spark):
    """Quadratic field v = x^2: central differences are EXACT (2x), so
    with the cross-tile halo the border pixels match the analytic
    gradient, while tile-local one-sided differences err by res."""
    from sgspark.zonal import band_gradient
    res, n = 1.0, 4
    rows = []
    for tx in range(2):
        x0 = tx * n * res
        xs = x0 + (np.arange(n) + 0.5) * res
        v = np.tile(xs[None, :] ** 2, (n, 1))
        rows.append((f"t{tx}", float(x0), 0.0, res, n, n,
                     v.ravel().tolist()))
    tiles = spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile_id", "x0", "y0", "res",
                                    "nx", "ny", "values"]))
    out = {r.tile_id: np.asarray(r["values"]).reshape(n, n)
           for r in band_gradient(tiles, halo=True).collect()}
    # right border of tile t0 (x = 3.5): gradient must be exactly 2x = 7
    assert out["t0"][0, -1] == pytest.approx(7.0, abs=1e-9)
    # left border of t1 (x = 4.5): 2x = 9
    assert out["t1"][0, 0] == pytest.approx(9.0, abs=1e-9)
    # without halo the same pixels use one-sided diffs -> off by ~res
    out0 = {r.tile_id: np.asarray(r["values"]).reshape(n, n)
            for r in band_gradient(tiles, halo=False).collect()}
    assert abs(out0["t0"][0, -1] - 7.0) > 0.5
