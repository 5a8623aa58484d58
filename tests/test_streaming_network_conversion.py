"""Streaming micro-batch semantics, network shortest paths, conversions."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sgspark.conversion import (bounds_to_polygon, clean_geoms, df_from_wkt,
                                df_from_xy, get_total_bounds, random_points,
                                random_points_in_polygons)
from sgspark.network import (get_connected_components, make_node_ids,
                             od_cost_matrix, service_area_nodes)
from sgspark.geom import from_wkb


# ---------------------------------------------------------------- network
@pytest.fixture(scope="module")
def grid_edges(spark):
    """3x3 grid graph as LINESTRING rows with unit lengths."""
    wkts, ids = [], []
    k = 0
    for i in range(3):
        for j in range(3):
            if i < 2:
                wkts.append(f"LINESTRING ({i} {j}, {i + 1} {j})")
                ids.append(k)
                k += 1
            if j < 2:
                wkts.append(f"LINESTRING ({i} {j}, {i} {j + 1})")
                ids.append(k)
                k += 1
    df = df_from_wkt(spark, wkts, ids)
    return make_node_ids(df).cache()


def test_make_node_ids_and_cc(spark, grid_edges):
    nodes = get_connected_components(grid_edges).toPandas()
    assert len(nodes) == 9
    assert nodes.cluster.nunique() == 1  # grid fully connected
    # add an isolated edge -> second component
    iso = make_node_ids(df_from_wkt(spark, ["LINESTRING (100 100, 101 100)"],
                                    [99]))
    both = grid_edges.unionByName(iso)
    cc = get_connected_components(both).toPandas()
    assert cc.cluster.nunique() == 2


def test_od_cost_matrix_manhattan(spark, grid_edges):
    origins = spark.createDataFrame(pd.DataFrame(
        {"oid": [0], "node": ["0.0_0.0"]}))
    dests = spark.createDataFrame(pd.DataFrame(
        {"did": ["corner", "mid"], "node": ["2.0_2.0", "1.0_1.0"]}))
    od = od_cost_matrix(grid_edges, origins, dests).toPandas()
    got = {r.did: r.cost for r in od.itertuples()}
    assert got["corner"] == pytest.approx(4.0)  # manhattan distance
    assert got["mid"] == pytest.approx(2.0)


def test_od_unreachable_null(spark, grid_edges):
    iso = make_node_ids(df_from_wkt(spark, ["LINESTRING (100 100, 101 100)"],
                                    [99]))
    edges = grid_edges.unionByName(iso)
    origins = spark.createDataFrame(pd.DataFrame(
        {"oid": [0], "node": ["0.0_0.0"]}))
    dests = spark.createDataFrame(pd.DataFrame(
        {"did": ["far"], "node": ["100.0_100.0"]}))
    od = od_cost_matrix(edges, origins, dests).toPandas()
    assert np.isnan(od.cost.iloc[0])


def test_service_area(spark, grid_edges):
    origins = spark.createDataFrame(pd.DataFrame(
        {"oid": [0], "node": ["0.0_0.0"]}))
    sa = service_area_nodes(grid_edges, origins, 2.0).toPandas()
    # nodes within manhattan distance 2 of corner: (0,0),(1,0),(0,1),
    # (2,0),(1,1),(0,2)
    assert len(sa) == 6


# ------------------------------------------------------------- conversion
def test_random_points_deterministic_and_in_bounds(spark):
    a = random_points(spark, 500, (0, 0, 100, 50), seed=7).toPandas()
    b = random_points(spark, 500, (0, 0, 100, 50), seed=7).toPandas()
    assert a.sort_values("row_id").x.tolist() == b.sort_values("row_id").x.tolist()
    assert a.x.between(0, 100).all() and a.y.between(0, 50).all()
    # spread sanity
    assert a.x.std() > 20


def test_random_points_in_polygons(spark):
    df = df_from_wkt(spark, ["POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
                             "POLYGON ((100 100, 120 100, 120 120, 100 120, 100 100))"])
    pts = random_points_in_polygons(df, 20, id_col="row_id").toPandas()
    assert len(pts) == 40
    p0 = pts[pts.row_id == 0]
    assert p0.x.between(0, 10).all() and p0.y.between(0, 10).all()


def test_clean_geoms_and_bounds(spark):
    df = df_from_wkt(spark, ["POINT (1 2)", None, "POINT EMPTY"])
    out = clean_geoms(df).toPandas()
    assert len(out) == 1
    df2 = df_from_xy(spark, [1.0, 5.0], [2.0, 6.0])
    assert get_total_bounds(df2) == (1.0, 2.0, 5.0, 6.0)
    bp = bounds_to_polygon(df2).toPandas()
    assert from_wkb(list(bp.geometry)).area().tolist() == [0.0, 0.0]


# -------------------------------------------------------------- streaming
def test_stream_tile_counts_and_pip(spark, tmp_path):
    from sgspark.streaming import stream_pip_join, stream_tile_counts
    from sgspark import synth

    # write two micro-batch files
    i = np.arange(200, dtype=np.int64)
    px, py = synth.first_point_xy(i)
    pdf = pd.DataFrame({"pid": i, "x": px.astype(float), "y": py.astype(float),
                        "ts": pd.Timestamp("2024-01-01")
                        + pd.to_timedelta(i % 90, unit="m")})
    src = tmp_path / "stream_src"
    src.mkdir()
    spark.createDataFrame(pdf[:100]).write.mode("overwrite") \
        .parquet(str(src / "batch1"))
    stream = spark.readStream.schema(
        "pid long, x double, y double, ts timestamp") \
        .option("maxFilesPerTrigger", "10").parquet(str(src / "batch1"))

    agg = stream_tile_counts(stream, gridsize=1000, window="1 hour",
                             watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("tiles")
         .outputMode("complete").start())
    q.processAllAvailable()
    got = spark.sql("SELECT sum(n) AS total FROM tiles").first()
    q.stop()
    assert got.total == 100

    # stream-static PIP join vs zone layer
    zones = spark.createDataFrame(
        pd.DataFrame({"zone_id": np.arange(30, dtype=np.int64)}))
    k = np.arange(30, dtype=np.int64)
    cx, cy, r = synth.zone_params(k)
    zones = spark.createDataFrame(pd.DataFrame(
        {"zone_id": k, "cx": cx, "cy": cy, "r": r}))
    stream2 = spark.readStream.schema(
        "pid long, x double, y double, ts timestamp") \
        .parquet(str(src / "batch1"))
    joined = stream_pip_join(stream2, zones)
    q2 = (joined.writeStream.format("memory").queryName("pip")
          .outputMode("append").start())
    q2.processAllAvailable()
    got2 = spark.sql("SELECT pid, zone_id FROM pip").toPandas()
    q2.stop()
    # oracle
    want = []
    for pid, x, y in zip(pdf.pid[:100], pdf.x[:100], pdf.y[:100]):
        m = (np.abs(x - cx) <= r) & (np.abs(y - cy) <= r)
        want += [(int(pid), int(z)) for z in k[m]]
    assert sorted(map(tuple, got2.itertuples(index=False))) == sorted(want)
