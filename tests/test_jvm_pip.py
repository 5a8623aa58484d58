"""JVM-compiled general point-in-polygon joins (round 4, VERDICT r3 #1b).

The ray-cast PIP SQL expression (_pip_sql) must agree pair-for-pair with
the Arrow kernel (pip_pairs_vectorized) on concave, holed and multipart
polygons — including points exactly on edges, vertices and hole rims —
across all three execution paths:

  kernel       broadcast_right=False, no point hint  -> mapInPandas refine
  jvm-bcast    broadcast right, point hint           -> _points_vs_polygons_jvm
  jvm-dist     no broadcast, point hint              -> _points_vs_polygons_distributed
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

from sgspark.geom.wkb import from_wkt, to_wkb
from sgspark.joins import sjoin_pairs

POLYS = [
    # concave L
    "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))",
    # square with hole
    "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0), "
    "(13 3, 17 3, 17 7, 13 7, 13 3))",
    # multipolygon, two islands
    "MULTIPOLYGON (((30 0, 34 0, 34 4, 30 4, 30 0)), "
    "((36 6, 40 6, 40 10, 36 10, 36 6)))",
    # triangle (diagonal edges)
    "POLYGON ((50 0, 60 0, 55 10, 50 0))",
    # 40-gon: > PIP_UNROLL_EDGES, exercises the interpreted fallback branch
    "POLYGON ((" + ", ".join(
        f"{70 + 5 * np.cos(2 * np.pi * i / 40)!r} "
        f"{5 + 5 * np.sin(2 * np.pi * i / 40)!r}"
        for i in list(range(40)) + [0]) + "))",
]


def zones_df(spark):
    ga = from_wkt(POLYS)
    b = ga.bounds()
    rows = [(i, bytearray(w), float(b[i, 0]), float(b[i, 1]),
             float(b[i, 2]), float(b[i, 3]))
            for i, w in enumerate(to_wkb(ga))]
    schema = T.StructType([
        T.StructField("zid", T.LongType()),
        T.StructField("geometry", T.BinaryType()),
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType())])
    return spark.createDataFrame(rows, schema)


def points_df(spark):
    pts = [
        (1.0, 1.0), (3.0, 3.0),            # inside L / in L's notch (out)
        (2.0, 2.0), (0.0, 0.0), (4.0, 1.0),  # reflex vertex / vertex / edge
        (15.0, 5.0), (11.0, 1.0),          # inside hole (out) / in annulus
        (13.0, 3.0), (13.0, 5.0),          # hole vertex / hole edge (in)
        (32.0, 2.0), (38.0, 8.0), (35.0, 5.0),  # island A / B / between
        (55.0, 5.0), (52.5, 5.0), (55.0, 10.0),  # tri in / on diag / apex
        (100.0, 100.0),                    # far outside
    ]
    # plus a deterministic scatter
    rng = np.random.RandomState(7)
    pts += [(70.0, 5.0), (75.0, 5.0)]  # 40-gon center / on-vertex
    pts += [(float(x), float(y)) for x, y in
            np.c_[rng.uniform(-2, 78, 300), rng.uniform(-2, 12, 300)]]
    pdf = pd.DataFrame(pts, columns=["x", "y"])
    pdf["pid"] = np.arange(len(pdf))
    ga_wkb = to_wkb(from_wkt([f"POINT ({r.x!r} {r.y!r})"
                              for r in pdf.itertuples()]))
    pdf["geometry"] = [bytearray(b) for b in ga_wkb]
    pdf["minx"] = pdf.x
    pdf["miny"] = pdf.y
    pdf["maxx"] = pdf.x
    pdf["maxy"] = pdf.y
    return spark.createDataFrame(
        pdf[["pid", "geometry", "minx", "miny", "maxx", "maxy"]])


def pair_set(df):
    return {(r[0], r[1]) for r in df.collect()}


@pytest.mark.parametrize("predicate", ["within", "intersects"])
def test_three_paths_agree(spark, predicate):
    zones = zones_df(spark)
    pts = points_df(spark)
    kernel = pair_set(sjoin_pairs(
        pts, zones, predicate, left_id="pid", right_id="zid",
        gridsize=7.0, broadcast_right=False))
    jvm_d = pair_set(sjoin_pairs(
        pts, zones, predicate, left_id="pid", right_id="zid",
        gridsize=7.0, broadcast_right=False, assume_left_points=True))
    jvm_b = pair_set(sjoin_pairs(
        pts, zones, predicate, left_id="pid", right_id="zid",
        gridsize=7.0, assume_left_points=True))
    assert kernel == jvm_d == jvm_b
    # sanity on the hand-placed boundary cases (boundary counts as inside)
    for pid, zid in [(0, 0), (2, 0), (3, 0), (4, 0), (6, 1), (7, 1),
                     (8, 1), (9, 2), (10, 2), (12, 3), (13, 3), (14, 3)]:
        assert (pid, zid) in kernel
    for pid in (1, 5, 11, 15):
        assert not any(p == pid for p, _ in kernel)


def test_distributed_jvm_plan_is_python_free_on_pairs(spark):
    """The pair path of the distributed JVM join must contain exactly one
    Arrow stage (the O(|right|) edge pack), none after the join."""
    zones = zones_df(spark)
    pts = points_df(spark)
    out = sjoin_pairs(pts, zones, "within", left_id="pid", right_id="zid",
                      gridsize=7.0, broadcast_right=False,
                      assume_left_points=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one MapInPandas total (rights pack); the join + PIP filter are JVM
    assert plan.count("MapInPandas") == 1


def test_declines_on_mixed_or_huge_rights(spark):
    """Line rights or country-sized rights fall back to the kernel path
    and still produce correct results."""
    ga = from_wkt(["LINESTRING (0 0, 5 5)", POLYS[0]])
    b = ga.bounds()
    rows = [(i, bytearray(w), float(b[i, 0]), float(b[i, 1]),
             float(b[i, 2]), float(b[i, 3]))
            for i, w in enumerate(to_wkb(ga))]
    zones = spark.createDataFrame(rows, zones_df(spark).schema)
    pts = points_df(spark)
    out = sjoin_pairs(pts, zones, "intersects", left_id="pid",
                      right_id="zid", gridsize=7.0, broadcast_right=False,
                      assume_left_points=True)
    got = pair_set(out)
    assert (0, 1) in got          # (1,1) inside the L polygon (zid=1 here)
    assert (2, 0) in got and (2, 1) in got  # (2,2) on the line AND in L


def test_dwithin_three_paths_agree(spark):
    """dwithin against general polygons: kernel / jvm-broadcast / jvm-dist
    must agree on pairs AND bit-exact distances (same IEEE op order)."""
    zones = zones_df(spark)
    pts = points_df(spark)

    def rows(df):
        return {(r[0], r[1], r[2]) for r in df.collect()}

    kernel = rows(sjoin_pairs(pts, zones, "dwithin", left_id="pid",
                              right_id="zid", distance=1.25, gridsize=7.0,
                              broadcast_right=False))
    jvm_d = rows(sjoin_pairs(pts, zones, "dwithin", left_id="pid",
                             right_id="zid", distance=1.25, gridsize=7.0,
                             broadcast_right=False,
                             assume_left_points=True))
    jvm_b = rows(sjoin_pairs(pts, zones, "dwithin", left_id="pid",
                             right_id="zid", distance=1.25, gridsize=7.0,
                             assume_left_points=True))
    assert kernel == jvm_d == jvm_b
    assert len(kernel) > 0
    d = {(a, b): dist for a, b, dist in kernel}
    assert d[(0, 0)] == 0.0          # inside -> 0
    assert d[(4, 0)] == 0.0          # on the L's edge -> boundary = 0
    assert (11, 2) not in d          # (35,5): corner dist sqrt(2) > 1.25
    wider = rows(sjoin_pairs(pts, zones, "dwithin", left_id="pid",
                             right_id="zid", distance=1.5, gridsize=7.0,
                             assume_left_points=True))
    dw = {(a, b): dist for a, b, dist in wider}
    assert dw[(11, 2)] == float(np.sqrt(np.float64(1.0) + np.float64(1.0)))


def test_concave_zone_variant_paths_agree(spark, monkeypatch):
    """SGSPARK_CONCAVE_ZONES=1 bench variant: L-shaped zones through the
    kernel and the distributed JVM path give identical pair sets."""
    monkeypatch.setenv("SGSPARK_CONCAVE_ZONES", "1")
    from sgspark.synth import synth_documents, zones_from_customer
    from sgspark.io import extract_geometries, wkt_to_wkb_df
    sf_dir = "/root/testdata/sf0.001"
    zones = wkt_to_wkb_df(zones_from_customer(spark, sf_dir)).cache()
    zones.count()
    docs = synth_documents(spark, 500)
    geo = extract_geometries(docs).cache()
    geo.count()
    pts = geo.where("geom_kind = 'point' AND span_pos = 1")
    jvm = pair_set(sjoin_pairs(
        pts, zones, "within", left_id="doc_index", right_id="zone_id",
        broadcast_right=False, assume_left_points=True))
    monkeypatch.setenv("SGSPARK_DISABLE_JVM_PIP", "1")
    kern = pair_set(sjoin_pairs(
        pts, zones, "within", left_id="doc_index", right_id="zone_id",
        broadcast_right=False, assume_left_points=True))
    assert jvm == kern and len(jvm) > 0
    zones.unpersist()
    geo.unpersist()
