"""holes/gaps/eliminate/clip/to_lines + snapping, against analytic oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sgspark.geom import from_wkb
from sgspark.io import wkt_to_wkb_df
from sgspark.point_ops import snap_all, snap_within_distance
from sgspark.polygon_ops import (area_col, clean_clip, close_all_holes,
                                 close_small_holes, eliminate_by_largest,
                                 get_gaps, get_holes, to_lines)

SQ_HOLE = ("POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0), "
           "(40 40, 40 60, 60 60, 60 40, 40 40), "
           "(10 10, 10 12, 12 12, 12 10, 10 10))")


@pytest.fixture(scope="module")
def holey(spark):
    return wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame(
        {"gid": [0], "geometry_wkt": [SQ_HOLE]})))


def test_holes_roundtrip(holey):
    holes = get_holes(holey).toPandas()
    assert len(holes) == 2
    assert sorted(from_wkb(list(holes.geometry)).area().round(6)) == [4.0, 400.0]
    closed_small = close_small_holes(holey, 10.0).toPandas()
    a = from_wkb(list(closed_small.geometry)).area()[0]
    assert a == pytest.approx(100 * 100 - 400)  # only the 2x2 hole filled
    closed_all = close_all_holes(holey).toPandas()
    assert from_wkb(list(closed_all.geometry)).area()[0] == pytest.approx(10000)


def test_get_gaps(spark):
    # ring of 4 overlapping rectangles around an empty 20x20 center
    wkts = ["POLYGON ((0 0, 60 0, 60 20, 0 20, 0 0))",
            "POLYGON ((0 40, 60 40, 60 60, 0 60, 0 40))",
            "POLYGON ((0 15, 20 15, 20 45, 0 45, 0 15))",
            "POLYGON ((40 15, 60 15, 60 45, 40 45, 40 15))"]
    df = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame(
        {"gid": range(4), "geometry_wkt": wkts})))
    gaps = get_gaps(df, id_col="gid").toPandas()
    assert len(gaps) == 1
    assert from_wkb(list(gaps.geometry)).area()[0] == pytest.approx(400.0)


def test_clean_clip(spark, zones50):
    zones = wkt_to_wkb_df(zones50)
    mask = zones.where("zone_id = 0").selectExpr("zone_id AS mid", "geometry",
                                                 "minx", "miny", "maxx", "maxy")
    clipped = clean_clip(zones.where("zone_id > 0"), mask,
                         id_col="zone_id", mask_id="mid")
    pdf = clipped.toPandas()
    assert set(pdf.columns) == set(zones.where("zone_id > 0").drop(
        "minx", "miny", "maxx", "maxy").columns)
    # all clipped areas <= mask area
    from sgspark import synth
    _, _, r0 = synth.zone_params(np.array([0]))
    if len(pdf):
        assert from_wkb(list(pdf.geometry)).area().max() <= (2 * r0[0]) ** 2 + 1e-6


def test_to_lines_and_area_col(holey):
    lines = to_lines(holey).toPandas()
    assert len(lines) == 3  # exterior + 2 holes
    ga = from_wkb(list(lines.geometry))
    assert sorted(ga.length().round(6)) == [8.0, 80.0, 400.0]
    wa = area_col(holey).toPandas()
    assert wa.area.iloc[0] == pytest.approx(10000 - 404)


def test_eliminate_by_largest(spark):
    keep = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame({
        "gid": [10, 11], "name": ["big", "small"],
        "geometry_wkt": ["POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0))",
                         "POLYGON ((100 0, 130 0, 130 30, 100 30, 100 0))"]})))
    sliver = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame({
        "gid": [99], "name": ["sliver"],
        "geometry_wkt": ["POLYGON ((99.5 0, 100.5 0, 100.5 30, 99.5 30, 99.5 0))"]})))
    out = eliminate_by_largest(keep, sliver, id_col="gid").toPandas()
    assert sorted(out.gid.tolist()) == [10, 11]
    big = out[out.gid == 10]
    a = from_wkb(list(big.geometry)).area()[0]
    # big square (10000) + sliver (30) - overlap (0.5*30=15)
    assert a == pytest.approx(10000 + 30 - 15)
    small = out[out.gid == 11]
    assert from_wkb(list(small.geometry)).area()[0] == pytest.approx(900.0)


def test_snap_within_distance_and_all(spark):
    def pts_df(ids, xs, ys):
        pdf = pd.DataFrame({"pid": ids, "x": xs, "y": ys})
        from sgspark.geom import points as mk, to_wkb
        pdf["geometry"] = to_wkb(mk(np.stack([pdf.x, pdf.y], axis=1).astype(float)))
        pdf["minx"] = pdf.x
        pdf["miny"] = pdf.y
        pdf["maxx"] = pdf.x
        pdf["maxy"] = pdf.y
        return spark.createDataFrame(pdf.drop(columns=["x", "y"]))

    pts = pts_df([0, 1], [0.0, 500.0], [0.0, 500.0])
    targets = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame({
        "tid": [0], "geometry_wkt": ["LINESTRING (10 0, 10 100)"]})))
    snapped = snap_within_distance(pts, targets, 50.0, left_id="pid",
                                   right_id="tid", gridsize=100.0) \
        .orderBy("pid").toPandas()
    ga = from_wkb(list(snapped.geometry))
    # point 0 snaps to (10, 0); point 1 unsnapped
    assert ga.coords[0].tolist() == [10.0, 0.0]
    assert snapped.snap_distance.iloc[0] == pytest.approx(10.0)
    assert np.isnan(snapped.snap_distance.iloc[1])
    assert ga.coords[1].tolist() == [500.0, 500.0]

    all_snapped = snap_all(pts, targets, left_id="pid", right_id="tid",
                           gridsize=100.0).orderBy("pid").toPandas()
    ga2 = from_wkb(list(all_snapped.geometry))
    assert ga2.coords[1].tolist() == [10.0, 100.0]
    assert all_snapped.snap_distance.iloc[1] == pytest.approx(
        np.hypot(490, 400))


def test_eliminate_by_longest(spark):
    # keeper A shares a 30-unit border with the sliver; keeper B only 10
    keep = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame({
        "gid": [1, 2], "name": ["A", "B"],
        "geometry_wkt": ["POLYGON ((0 0, 100 0, 100 30, 0 30, 0 0))",
                         "POLYGON ((100 20, 140 20, 140 30, 100 30, 100 20))"]})))
    sliver = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame({
        "gid": [9], "name": ["s"],
        "geometry_wkt": ["POLYGON ((100 0, 110 0, 110 30, 100 30, 100 0))"]})))
    from sgspark.polygon_ops import eliminate_by_longest
    out = eliminate_by_longest(keep, sliver, id_col="gid").toPandas()
    assert sorted(out.gid) == [1, 2]
    a1 = from_wkb(list(out[out.gid == 1].geometry)).area()[0]
    # sliver (10x30) joins A (shares x=100 border of length 30 > B's 10)
    assert a1 == pytest.approx(100 * 30 + 10 * 30)
    a2 = from_wkb(list(out[out.gid == 2].geometry)).area()[0]
    assert a2 == pytest.approx(400.0)
