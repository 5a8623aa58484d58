"""clean_overlay 6 hows — differential tests against a local numpy oracle
plus analytic areas and the column-name contract
(mirrors /root/reference/tests/test_overlay.py:30-87).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sgspark.geom import from_wkb
from sgspark.io import wkt_to_wkb_df
from sgspark.overlay import clean_overlay, get_intersections, update_geometries


def sq(x0, y0, s):
    return (f"POLYGON (({x0} {y0}, {x0 + s} {y0}, {x0 + s} {y0 + s}, "
            f"{x0} {y0 + s}, {x0} {y0}))")


@pytest.fixture(scope="module")
def layers(spark):
    # df1: two squares; df2: two squares overlapping them + one disjoint
    df1 = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame({
        "aid": [0, 1], "name": ["a0", "a1"], "tag": ["x", "y"],
        "geometry_wkt": [sq(0, 0, 10), sq(20, 0, 10)]})))
    df2 = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame({
        "bid": [0, 1, 2], "name": ["b0", "b1", "b2"], "w": [1.0, 2.0, 3.0],
        "geometry_wkt": [sq(5.5, 5.5, 10), sq(25.5, -3.5, 10), sq(100, 100, 5)]})))
    return df1, df2


def _areas(pdf):
    return np.sort(from_wkb(list(pdf.geometry)).area())


def test_intersection(layers):
    df1, df2 = layers
    out = clean_overlay(df1, df2, "intersection", id1="aid", id2="bid").toPandas()
    # a0∩b0 = 4.5², a1∩b1 = 4.5*6.5
    assert len(out) == 2
    assert np.allclose(_areas(out), np.sort([4.5 ** 2, 4.5 * 6.5]))
    # column contract: collided 'name' suffixed both sides
    assert "name_1" in out.columns and "name_2" in out.columns
    assert "tag" in out.columns and "w" in out.columns


def test_difference(layers):
    df1, df2 = layers
    out = clean_overlay(df1, df2, "difference", id1="aid", id2="bid").toPandas()
    assert sorted(out.columns) == sorted(["aid", "name", "tag", "geometry"])
    assert np.allclose(_areas(out),
                       np.sort([100 - 4.5 ** 2, 100 - 4.5 * 6.5]))


def test_symmetric_difference(layers):
    df1, df2 = layers
    out = clean_overlay(df1, df2, "symmetric_difference",
                        id1="aid", id2="bid").toPandas()
    want = np.sort([100 - 4.5 ** 2, 100 - 4.5 * 6.5,
                    100 - 4.5 ** 2, 100 - 4.5 * 6.5, 25.0])
    assert np.allclose(_areas(out), want)


def test_union_identity_update_totals(layers):
    df1, df2 = layers
    uni = clean_overlay(df1, df2, "union", id1="aid", id2="bid").toPandas()
    # total area of union rows == area(A ∪ B) counted per overlay semantics:
    # intersections once + both differences
    total = _areas(uni).sum()
    want = (4.5 ** 2 + 4.5 * 6.5) + (100 - 4.5 ** 2) + (100 - 4.5 * 6.5) * 2 \
        + (100 - 4.5 ** 2) + 25.0
    assert total == pytest.approx(want)
    ident = clean_overlay(df1, df2, "identity", id1="aid", id2="bid").toPandas()
    assert _areas(ident).sum() == pytest.approx(200.0)  # covers df1 exactly
    upd = clean_overlay(df1, df2, "update", id1="aid", id2="bid").toPandas()
    assert _areas(upd).sum() == pytest.approx(
        (100 - 4.5 ** 2) + (100 - 4.5 * 6.5) + 100 + 100 + 25.0)


def test_overlay_vs_local_oracle_random(spark, zones50):
    """Differential: distributed intersection over the zone layer vs the
    same boolean kernel run locally on collected pairs (validates the
    distributed plan: candidates, anchor dedup, kernels)."""
    zones = wkt_to_wkb_df(zones50)
    a = zones.where("zone_id % 2 = 0").withColumnRenamed("zone_id", "aid") \
        .select("aid", "geometry", "minx", "miny", "maxx", "maxy")
    b = zones.where("zone_id % 2 = 1").withColumnRenamed("zone_id", "bid") \
        .select("bid", "geometry", "minx", "miny", "maxx", "maxy")
    got = clean_overlay(a, b, "intersection", id1="aid", id2="bid").toPandas()
    # local oracle with interval arithmetic on squares
    from sgspark import synth
    za = zones50.toPandas()
    ka = za.zone_id.to_numpy()
    cx, cy, r = synth.zone_params(ka)
    rows = []
    for i in np.where(ka % 2 == 0)[0]:
        for j in np.where(ka % 2 == 1)[0]:
            ox = min(cx[i] + r[i], cx[j] + r[j]) - max(cx[i] - r[i], cx[j] - r[j])
            oy = min(cy[i] + r[i], cy[j] + r[j]) - max(cy[i] - r[i], cy[j] - r[j])
            if ox > 0 and oy > 0:
                rows.append((int(ka[i]), int(ka[j]), ox * oy))
    want = pd.DataFrame(rows, columns=["aid", "bid", "area"])
    got["area"] = from_wkb(list(got.geometry)).area()
    m = got.merge(want, on=["aid", "bid"], how="outer", suffixes=("_g", "_w"))
    assert not m.area_g.isna().any() and not m.area_w.isna().any()
    assert np.allclose(m.area_g, m.area_w, rtol=1e-9)


def test_get_intersections_and_update_geometries(spark):
    wkts = [sq(0, 0, 10), sq(5.5, 0, 10), sq(11, 0, 10)]
    df = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame(
        {"gid": [0, 1, 2], "geometry_wkt": wkts})))
    inter = get_intersections(df, id_col="gid").toPandas()
    # overlaps: (0,1) 4.5*10, (1,2) 4.5*10; (0,2) disjoint
    assert len(inter) == 2
    assert np.allclose(_areas(inter), [45.0, 45.0])
    upd = update_geometries(df.withColumn("rank", F.col("gid")),
                            id_col="gid", rank_col="rank").toPandas()
    areas = upd.sort_values("gid")
    got = from_wkb(list(areas.geometry)).area()
    # gid0 keeps 100; gid1 loses 45 to gid0; gid2 loses overlap with
    # REMAINING part of 1 (x in [11,15.5]) -> 45
    assert np.allclose(got, [100.0, 55.0, 55.0])
