"""Round-7 optimization invariants.

Every change this round must be result-invariant; these tests pin the
trickiest equivalences:

  * bounded-graph driver shortest-path/OD fast path == distributed path,
    including duplicate oids, duplicate (did, node) destination rows,
    unreachable nodes and multi-node origins;
  * the codegen shingle shape == the former transform() lambda shape;
  * the cell-join width pin engages for python-built inputs and stands
    down for provably-tiny python-free ones (plan-level check).
"""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F




def _edges(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "target", "length"]))


def test_local_bf_equals_distributed(spark):
    # chain 1-2-3-4 + shortcut 1-4, isolated island 9-10, dangling dest 99
    rows = [("1", "2", 1.0), ("2", "3", 2.0), ("3", "4", 1.0),
            ("1", "4", 5.0), ("9", "10", 1.0)]
    e = _edges(spark, rows)
    orig = spark.createDataFrame(
        pd.DataFrame({"oid": ["a", "a", "b"],       # duplicate oid = multi
                      "node": ["1", "9", "2"]}))    # source origin "a"
    dests = spark.createDataFrame(
        pd.DataFrame({"did": [1, 2, 2, 3, 99],      # duplicate did rows
                      "node": ["4", "10", "10", "3", "nope"]}))
    from sgspark.network import od_cost_matrix
    a = sorted(map(tuple, od_cost_matrix(e, orig, dests).collect()))
    os.environ["SGSPARK_LOCAL_GRAPH_EDGES"] = "0"
    try:
        b = sorted(map(tuple, od_cost_matrix(e, orig, dests).collect()))
    finally:
        del os.environ["SGSPARK_LOCAL_GRAPH_EDGES"]
    assert a == b
    # sanity: multi-node origin "a" reaches both components
    costs = {(r[0], r[1]): r[2] for r in a}
    assert costs[("a", 1)] == 4.0 and costs[("a", 2)] == 1.0
    assert costs[("b", 3)] == 2.0 and costs[("b", 99)] is None


def test_local_bf_pred_matches_distributed_routes(spark):
    # parallel tie paths exercise the phase-3 min-pred rule
    rows = [("1", "2", 1.0), ("1", "3", 1.0), ("2", "4", 1.0),
            ("3", "4", 1.0), ("4", "5", 1.0)]
    e = _edges(spark, rows)
    orig = spark.createDataFrame(pd.DataFrame({"oid": ["o"], "node": ["1"]}))
    dest = spark.createDataFrame(pd.DataFrame({"did": ["d"], "node": ["5"]}))
    from sgspark.network import get_route
    a = sorted(map(tuple, get_route(e, orig, dest).collect()))
    os.environ["SGSPARK_LOCAL_GRAPH_EDGES"] = "0"
    try:
        b = sorted(map(tuple, get_route(e, orig, dest).collect()))
    finally:
        del os.environ["SGSPARK_LOCAL_GRAPH_EDGES"]
    assert a == b and len(a) == 3  # 1->2->4->5 (pred tie broken to "2")


def test_shingle_shape_equals_transform_lambda(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "text": ["abcdefghijklmnop", "abcdefghijklmnop",
                 "zyxwvutsrqponmlkjihg", "short"]}))
    from sgspark.textops import shingles
    w = 12
    new = shingles(docs, width=w, distinct=False)
    old = (docs.where(F.length("text") >= w)
           .select("doc_id", F.explode(F.expr(
               f"transform(sequence(1, length(text) - {w - 1}), "
               f"i -> substring(text, i, {w}))")).alias("sh")))
    assert sorted(map(tuple, new.collect())) == \
        sorted(map(tuple, old.collect()))


def test_cell_join_pin_decision(spark):
    from sgspark.io import wkt_to_wkb_df
    from sgspark.joins import cell_candidate_pairs

    def plan_of(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    # python-built side (wkt kernel): must pin regardless of tiny size
    wk = wkt_to_wkb_df(spark.createDataFrame(pd.DataFrame({
        "zid": [1, 2],
        "geometry_wkt": ["POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
                         "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"]})))
    side = wk.selectExpr("zid AS __lid", "geometry AS __lg",
                         "minx", "miny", "maxx", "maxy")
    other = wk.selectExpr("zid AS __rid", "geometry AS __rg",
                          "minx", "miny", "maxx", "maxy")
    pinned = cell_candidate_pairs(side, other, 2000.0)
    assert "RepartitionByExpression" in plan_of(pinned)

    # tiny python-free side (materialized local relation): must NOT pin
    lc = wk.localCheckpoint()
    lc.count()
    side2 = lc.selectExpr("zid AS __lid", "geometry AS __lg",
                          "minx", "miny", "maxx", "maxy")
    other2 = lc.selectExpr("zid AS __rid", "geometry AS __rg",
                           "minx", "miny", "maxx", "maxy")
    unpinned = cell_candidate_pairs(side2, other2, 2000.0)
    assert "RepartitionByExpression" not in plan_of(unpinned)


def test_knn_checkpoint_invariance(spark):
    # results identical across gridsizes (forces multi-round ring
    # expansion through the checkpointed top-k)
    rng = np.random.RandomState(7)
    lp = pd.DataFrame({"lid": np.arange(50),
                       "x": rng.uniform(0, 100, 50),
                       "y": rng.uniform(0, 100, 50)})
    rp = pd.DataFrame({"rid": np.arange(20),
                       "x": rng.uniform(0, 100, 20),
                       "y": rng.uniform(0, 100, 20)})
    from sgspark.knn import get_k_nearest_neighbors
    l = spark.createDataFrame(lp)
    r = spark.createDataFrame(rp)
    a = sorted(map(tuple, get_k_nearest_neighbors(
        l, r, 3, left_id="lid", right_id="rid", gridsize=5.0).collect()))
    b = sorted(map(tuple, get_k_nearest_neighbors(
        l, r, 3, left_id="lid", right_id="rid", gridsize=80.0).collect()))
    assert a == b
