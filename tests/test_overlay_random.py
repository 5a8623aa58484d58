"""Randomized differential overlay tests — the reference's own strategy
(/root/reference/tests/test_overlay.py:125-162 `test_overlay_random`):
random layers, distributed overlay vs a local recompute with the same
kernels, plus conservation laws (identity covers df1; union area adds up).
Determinism: seeded numpy randomness, fixed across runs."""

import numpy as np
import pandas as pd
import pytest

from sgspark.geom import from_wkb, from_wkt, point_buffer, to_wkt
from sgspark.geom.clip import polygon_boolean, ring_area
from sgspark.io import wkt_to_wkb_df
from sgspark.overlay import clean_overlay, _parts_of


def _random_layer(rng, n, kind="mixed"):
    """Random rects + discretized circles in a 1000x1000 window."""
    wkts = []
    for i in range(n):
        cx, cy = rng.uniform(100, 900, 2)
        if kind == "rect" or (kind == "mixed" and i % 2 == 0):
            w, h = rng.uniform(20, 160, 2)
            x0, y0, x1, y1 = cx - w, cy - h, cx + w, cy + h
            wkts.append(f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
                        f"{x0} {y1}, {x0} {y0}))")
        else:
            r = rng.uniform(20, 120)
            ga = point_buffer(np.array([[cx, cy]]), r, quad_segs=6)
            wkts.append(to_wkt(ga)[0])
    return wkts


@pytest.mark.parametrize("seed", [1, 7])
def test_overlay_intersection_random_vs_local(spark, seed):
    rng = np.random.RandomState(seed)
    wa = _random_layer(rng, 25)
    wb = _random_layer(rng, 25)
    a = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame(
        {"aid": range(25), "geometry_wkt": wa})))
    b = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame(
        {"bid": range(25), "geometry_wkt": wb})))
    got = clean_overlay(a, b, "intersection", id1="aid", id2="bid",
                        gridsize=200.0).toPandas()
    got["area"] = from_wkb(list(got.geometry)).area()

    # local recompute with the same boolean kernel, all pairs
    ga = from_wkt(wa)
    gb = from_wkt(wb)
    rows = []
    for i in range(25):
        for j in range(25):
            res = polygon_boolean(_parts_of(ga, i), _parts_of(gb, j),
                                  "intersection")
            area = sum(ring_area(r) for p in res for r in p)
            if area > 1e-9:
                rows.append((i, j, area))
    want = pd.DataFrame(rows, columns=["aid", "bid", "area"])
    m = got.merge(want, on=["aid", "bid"], how="outer",
                  suffixes=("_got", "_want"))
    assert not m.area_got.isna().any(), "distributed plan missed pairs"
    assert not m.area_want.isna().any(), "distributed plan invented pairs"
    assert np.allclose(m.area_got, m.area_want, rtol=1e-9)


def test_overlay_identity_covers_df1_random(spark):
    """Conservation law: with a NON-OVERLAPPING df2 layer, identity pieces
    exactly tile df1 (with overlapping df2 the pieces double-count, as in
    geopandas overlay)."""
    rng = np.random.RandomState(3)
    wa = _random_layer(rng, 15, kind="rect")
    # disjoint grid-aligned df2 rects with random jitter inside their cell
    wb = []
    for i in range(15):
        gx, gy = (i % 4) * 250, (i // 4) * 250
        x0 = gx + rng.uniform(5, 60)
        y0 = gy + rng.uniform(5, 60)
        x1 = x0 + rng.uniform(40, 170)
        y1 = y0 + rng.uniform(40, 170)
        wb.append(f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
                  f"{x0} {y1}, {x0} {y0}))")
    a = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame(
        {"aid": range(15), "geometry_wkt": wa})))
    b = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame(
        {"bid": range(15), "geometry_wkt": wb})))
    ident = clean_overlay(a, b, "identity", id1="aid", id2="bid",
                          gridsize=300.0).toPandas()
    got = from_wkb(list(ident.geometry)).area().sum()
    want = from_wkt(wa).area().sum()
    assert got == pytest.approx(want, rel=1e-6)
