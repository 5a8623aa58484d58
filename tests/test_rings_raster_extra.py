"""PolygonsAsRings round-trip + apply, raster gradient/merge."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sgspark.geom import from_wkb
from sgspark.io import wkt_to_wkb_df
from sgspark.rings import PolygonsAsRings
from sgspark.zonal import band_gradient, merge_tiles, synth_raster_tiles

SQ_HOLE = ("POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0), "
           "(40 40, 40 60, 60 60, 60 40, 40 40))")


def test_rings_roundtrip_identity(spark):
    df = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame(
        {"gid": [0, 1], "geometry_wkt": [
            SQ_HOLE, "POLYGON ((200 200, 210 200, 210 210, 200 210, 200 200))"]})))
    out = PolygonsAsRings(df, id_col="gid").to_polygons() \
        .orderBy("gid").toPandas()
    ga = from_wkb(list(out.geometry))
    assert ga.area().round(6).tolist() == [10000 - 400, 100.0]


def test_rings_apply_scale(spark):
    df = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame(
        {"gid": [7], "geometry_wkt": [SQ_HOLE]})))

    def shift(coords):
        return coords + np.array([1000.0, 2000.0])

    out = PolygonsAsRings(df, id_col="gid").apply_numpy_func(shift) \
        .to_polygons().toPandas()
    ga = from_wkb(list(out.geometry))
    assert ga.area()[0] == pytest.approx(9600.0)
    b = ga.bounds()[0]
    assert list(b) == [1000.0, 2000.0, 1100.0, 2100.0]


def test_band_gradient_matches_numpy(spark):
    tiles = synth_raster_tiles(spark, 0.0, 0.0, 1000.0, 1000.0,
                               tile_size=1000.0, res=50.0)
    g = band_gradient(tiles).toPandas()
    v = np.asarray(tiles.toPandas()["values"].iloc[0]).reshape(20, 20)
    gy, gx = np.gradient(v, 50.0)
    want = np.hypot(gx, gy).ravel()
    assert np.allclose(np.asarray(g["values"].iloc[0]), want)


def test_merge_tiles(spark):
    t1 = synth_raster_tiles(spark, 0.0, 0.0, 1000.0, 1000.0,
                            tile_size=1000.0, res=100.0) \
        .withColumn("band", F.lit("b1")).withColumn("img", F.lit("a"))
    t2 = t1.withColumn("img", F.lit("b")) \
           .withColumn("values", F.expr("transform(values, v -> v + 2.0)"))
    both = t1.unionByName(t2)
    merged = merge_tiles(both, by=["band"], how="mean").toPandas()
    assert len(merged) == 1
    base = np.asarray(t1.toPandas()["values"].iloc[0])
    assert np.allclose(np.asarray(merged["values"].iloc[0]), base + 1.0)
