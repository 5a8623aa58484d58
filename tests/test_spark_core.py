"""End-to-end Spark tests: synthesis, span extraction, tile assignment,
point-in-polygon sjoin, sfilter family, gridloop invariance, span invariant.

Oracles are local numpy recomputations (the reference's differential-test
style, /root/reference/tests/test_overlay.py:59-87 etc.) plus independent
floor-arithmetic tile recompute (FIXTURES.md §F3).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sgspark import synth
from sgspark.io import extract_geometries, wkt_to_wkb_df
from sgspark.joins import (get_neighbor_indices, sfilter, sfilter_inverse,
                           sfilter_split, sjoin, sjoin_pairs,
                           sjoin_within_distance)
from sgspark.tiling import add_grid_id, gridloop, make_grid_from_bbox
from sgspark.geom.wkb import from_wkt


# ---------------------------------------------------------------- oracles
def oracle_doc_points(n):
    i = np.arange(n, dtype=np.int64)
    px, py = synth.first_point_xy(i)
    return pd.DataFrame({"doc_index": i, "px": px, "py": py})


def oracle_pip(n_docs, n_zones):
    """Expected (doc_index, zone_id) pairs for the first-point layer vs
    square zones, via direct interval arithmetic."""
    pts = oracle_doc_points(n_docs)
    k = np.arange(n_zones, dtype=np.int64)
    cx, cy, r = synth.zone_params(k)
    out = []
    for j in range(n_zones):
        m = (np.abs(pts.px - cx[j]) <= r[j]) & (np.abs(pts.py - cy[j]) <= r[j])
        for d in pts.doc_index[m]:
            out.append((int(d), int(j)))
    return sorted(out)


# ---------------------------------------------------------------- tests
def test_synth_documents_deterministic_and_interleaved(docs500):
    rows = docs500.orderBy("doc_index").limit(5).collect()
    assert rows[0].doc_id == "doc00000000"
    for row in rows:
        kinds = [s.kind for s in row.spans]
        assert kinds[0] == "text"
        assert all(k in ("text", "media") for k in kinds)
        offsets = [s.offset for s in row.spans]
        assert offsets == sorted(offsets)
        # first media span is the oracle point
        media = [s for s in row.spans if s.kind == "media"]
        assert media, "every doc has at least one media span"
        px, py = synth.first_point_xy(np.array([row.doc_index]))
        assert media[0].media_ref == f"geo:POINT ({int(px[0])} {int(py[0])})"
    # determinism across partitionings
    a = docs500.orderBy("doc_index").select("doc_id", "spans").collect()
    from sgspark.synth import synth_documents
    b = synth_documents(docs500.sparkSession, 500, partitions=13) \
        .orderBy("doc_index").select("doc_id", "spans").collect()
    assert a == b


def test_extract_geometries_matches_oracle(docs500):
    geo = extract_geometries(docs500).cache()
    pdf = geo.toPandas()
    assert set(pdf.geom_kind.unique()) <= {"point", "line", "polygon"}
    firsts = pdf.sort_values(["doc_index", "span_pos"]).groupby("doc_index").first()
    px, py = synth.first_point_xy(firsts.index.to_numpy())
    assert np.array_equal(firsts.minx.to_numpy(), px.astype(float))
    assert np.array_equal(firsts.miny.to_numpy(), py.astype(float))
    # non-geo media pass through: img refs never appear as geometry rows
    n_geo_spans = docs500.select(F.explode("spans").alias("s")) \
        .where("s.kind = 'media' and s.media_ref like 'geo:%'").count()
    assert geo.count() == n_geo_spans


def test_tile_assignment_exact(spark):
    n = 300
    i = np.arange(n, dtype=np.int64)
    px, py = synth.first_point_xy(i)
    df = spark.createDataFrame(pd.DataFrame({"doc_index": i, "x": px.astype(float),
                                             "y": py.astype(float)}))
    got = add_grid_id(df, 1000).orderBy("doc_index").toPandas()
    # independent floor-arithmetic recompute (FIXTURES.md §F3)
    want = [str(int(np.floor((x + 2_000_000) / 1000) * 1000)) +
            str(int(np.floor(y / 1000) * 1000)) for x, y in zip(px, py)]
    assert got["SSB_1000m"].tolist() == want


def test_pip_sjoin_matches_oracle(docs500, zones50):
    geo = extract_geometries(docs500)
    pts = geo.where("geom_kind = 'point' and span_pos = 1")  # first media span
    zones = wkt_to_wkb_df(zones50)
    pairs = sjoin_pairs(pts, zones, "within", left_id="doc_index",
                        right_id="zone_id", gridsize=1500.0)
    got = sorted((r.doc_index, r.zone_id) for r in pairs.collect())
    want = oracle_pip(500, 50)
    assert got == want
    # intersects gives the same set for points vs squares here
    pairs2 = sjoin_pairs(pts, zones, "intersects", left_id="doc_index",
                         right_id="zone_id", gridsize=700.0)
    assert sorted((r.doc_index, r.zone_id) for r in pairs2.collect()) == want


def test_sjoin_polygons_and_lines(docs500, zones50):
    """General geometries (polygons/lines from later spans) vs zones —
    oracle is the same kernel run locally on collected data, validating the
    distributed plan (cover/anchor/dedup), not the kernel itself."""
    geo = extract_geometries(docs500).where("span_pos > 1")
    zones = wkt_to_wkb_df(zones50)
    pairs = sjoin_pairs(geo.withColumn(
        "gid", F.col("doc_index") * 100 + F.col("span_pos")),
        zones, "intersects", left_id="gid", right_id="zone_id", gridsize=900.0)
    got = sorted((r.gid, r.zone_id) for r in pairs.collect())

    gpdf = geo.toPandas()
    zpdf = zones50.toPandas()
    from sgspark.geom import from_wkb, refine_pairs
    la = from_wkb(list(gpdf.geometry))
    ra = from_wkt(list(zpdf.geometry_wkt))
    li, ri = np.meshgrid(np.arange(len(la)), np.arange(len(ra)), indexing="ij")
    ok = refine_pairs(la, ra, li.ravel(), ri.ravel(), "intersects")
    gids = (gpdf.doc_index.to_numpy() * 100 + gpdf.span_pos.to_numpy())
    want = sorted((int(gids[a]), int(zpdf.zone_id.iloc[b]))
                  for a, b in zip(li.ravel()[ok], ri.ravel()[ok]))
    assert got == want


def test_sfilter_family(docs500, zones50):
    geo = extract_geometries(docs500).where("geom_kind = 'point' and span_pos = 1")
    zones = wkt_to_wkb_df(zones50)
    inside = sfilter(geo, zones, "within", left_id="doc_index", right_id="zone_id")
    outside = sfilter_inverse(geo, zones, "within", left_id="doc_index",
                              right_id="zone_id")
    n_in, n_out = inside.count(), outside.count()
    assert n_in + n_out == geo.count()
    want_in = len({d for d, _ in oracle_pip(500, 50)})
    assert n_in == want_in
    a, b = sfilter_split(geo, zones, "within", left_id="doc_index",
                         right_id="zone_id")
    assert a.count() == n_in and b.count() == n_out
    # semi-join: no duplicated rows even when a point hits several zones
    assert inside.select("doc_index").distinct().count() == n_in


def test_dwithin_and_distance_col(spark, zones50):
    pts = pd.DataFrame({"pid": [0, 1], "x": [260000.0, 270000.0],
                        "y": [6650000.0, 6655000.0]})
    zones = wkt_to_wkb_df(zones50).toPandas()
    pdf = spark.createDataFrame(pts)
    from sgspark.io import wkt_to_wkb_df as _w
    left = spark.createDataFrame(pts).selectExpr(
        "pid", "x", "y").withColumn("wkt", F.expr(
            "concat('POINT (', cast(cast(x as bigint) as string), ' ', "
            "cast(cast(y as bigint) as string), ')')"))
    left = _w(left, wkt_col="wkt")
    res = sjoin_within_distance(left, spark.createDataFrame(
        wkt_to_wkb_df(zones50).toPandas()), 3000.0,
        left_id="pid", right_id="zone_id").toPandas()
    # oracle: exact point-to-square distance
    k = zones.zone_id.to_numpy()
    cx, cy, r = synth.zone_params(k)
    for pid, x, y in zip(pts.pid, pts.x, pts.y):
        dx = np.maximum(np.abs(x - cx) - r, 0)
        dy = np.maximum(np.abs(y - cy) - r, 0)
        d = np.hypot(dx, dy)
        want = set(k[d <= 3000.0].tolist())
        got_rows = res[res.pid == pid]
        assert set(got_rows.zone_id.tolist()) == want
        for _, row in got_rows.iterrows():
            j = int(np.where(k == row.zone_id)[0][0])
            assert row.distance == pytest.approx(d[j], abs=1e-9)


def test_get_neighbor_indices_max_distance(spark):
    """Golden micro-fixture from the reference
    (tests/test_neighbors.py:203-265): points (0,0),(0.5,0.5),(2,2)."""
    pts = pd.DataFrame({"pid": [0, 1, 2], "x": [0.0, 0.5, 2.0],
                        "y": [0.0, 0.5, 2.0]})

    def as_geo(p):
        out = p.copy()
        from sgspark.geom import points as mk, to_wkb
        ga = mk(np.stack([p.x, p.y], axis=1))
        out["geometry"] = to_wkb(ga)
        out["minx"] = p.x
        out["miny"] = p.y
        out["maxx"] = p.x
        out["maxy"] = p.y
        return spark.createDataFrame(out)

    g = as_geo(pts)
    same = get_neighbor_indices(g, g, left_id="pid", right_id="pid",
                                gridsize=2.0)
    got0 = sorted((r[0], r[1]) for r in same.collect())
    assert got0 == [(0, 0), (1, 1), (2, 2)]
    within1 = get_neighbor_indices(g, g, max_distance=1, left_id="pid",
                                   right_id="pid", gridsize=2.0)
    got1 = sorted((r[0], r[1]) for r in within1.collect())
    assert got1 == [(0, 0), (0, 1), (1, 0), (1, 1), (2, 2)]
    within3 = get_neighbor_indices(g, g, max_distance=3, left_id="pid",
                                   right_id="pid", gridsize=2.0)
    assert len(within3.collect()) == 9


def test_gridloop_invariance(spark):
    """concat(per-cell results) == global result, with and without halo
    (reference contract tests/test_parallel.py:167-265)."""
    n = 400
    i = np.arange(n, dtype=np.int64)
    px, py = synth.first_point_xy(i)
    pdf = pd.DataFrame({"pid": i, "x": px.astype(float), "y": py.astype(float),
                        "v": (i % 7).astype(float)})
    df = spark.createDataFrame(pdf)

    def per_cell(cell: pd.DataFrame) -> pd.DataFrame:
        own = cell[~cell["__halo"]]
        return pd.DataFrame({"pid": own.pid, "x": own.x, "y": own.y,
                             "v2": own.v * 2})

    out_schema = "pid long, x double, y double, v2 double"
    for gridsize, gbuf in [(1000.0, 0.0), (2000.0, 0.0), (1000.0, 200.0)]:
        got = gridloop(df, per_cell, out_schema, gridsize, gridbuffer=gbuf) \
            .orderBy("pid").toPandas()
        assert got.pid.tolist() == pdf.pid.tolist()
        assert np.allclose(got.v2.to_numpy(), pdf.v.to_numpy() * 2)


def test_gridloop_halo_visibility(spark):
    """A cell function that counts neighbors within 150m sees across cell
    borders thanks to the halo — equals the global dwithin self-join count."""
    n = 350
    i = np.arange(n, dtype=np.int64)
    px, py = synth.first_point_xy(i)
    # compress points to force cross-border neighbors
    pdf = pd.DataFrame({"pid": i, "x": (px / 7).astype(float),
                        "y": (py / 7).astype(float)})
    df = spark.createDataFrame(pdf)
    radius = 150.0

    def per_cell(cell: pd.DataFrame) -> pd.DataFrame:
        own = cell[~cell["__halo"]]
        allp = cell
        d2 = (own.x.to_numpy()[:, None] - allp.x.to_numpy()[None, :]) ** 2 + \
             (own.y.to_numpy()[:, None] - allp.y.to_numpy()[None, :]) ** 2
        cnt = (d2 <= radius * radius).sum(axis=1) - 1
        return pd.DataFrame({"pid": own.pid, "x": own.x, "y": own.y,
                             "n_nbr": cnt})

    got = gridloop(df, per_cell, "pid long, x double, y double, n_nbr long",
                   gridsize=500.0, gridbuffer=radius).orderBy("pid").toPandas()
    # global oracle
    d2 = (pdf.x.to_numpy()[:, None] - pdf.x.to_numpy()[None, :]) ** 2 + \
         (pdf.y.to_numpy()[:, None] - pdf.y.to_numpy()[None, :]) ** 2
    want = (d2 <= radius * radius).sum(axis=1) - 1
    assert got.n_nbr.tolist() == want.tolist()


def test_span_invariant_through_pipeline(docs500, zones50):
    """BASELINE.json input_hint: span-sequence byte-equality through shuffles.
    Join geometry results back to intact doc rows and compare spans."""
    geo = extract_geometries(docs500)
    zones = wkt_to_wkb_df(zones50)
    pairs = sjoin_pairs(geo.where("span_pos = 1"), zones, "within",
                        left_id="doc_index", right_id="zone_id")
    enriched = docs500.join(pairs, "doc_index", "left")
    got = enriched.select("doc_index", "spans").distinct() \
                  .orderBy("doc_index").collect()
    want = docs500.select("doc_index", "spans").orderBy("doc_index").collect()
    assert [r.spans for r in got] == [r.spans for r in want]


def test_make_grid(spark):
    g = make_grid_from_bbox(spark, 254_000, 6_644_000, 256_000, 6_646_000,
                            1000.0, ssb=True)
    pdf = g.toPandas()
    assert len(pdf) == 3 * 3
    assert "22540006644000" in set(pdf.SSB_ID)
