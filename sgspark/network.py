"""Network analysis (secondary scope — SURVEY.md §2.10).

Reference: `/root/reference/src/sgis/networkanalysis/` — igraph-based
shortest paths over road networks with string node ids minted by
coordinate-WKT dedup (`nodes.py:19-86`).

Spark mapping: iterative relaxation joins (distributed Bellman-Ford),
driver-coordinated fixpoint with localCheckpoint per round — the same
pattern as connected components.  Suitable for the multi-source
od_cost_matrix / service_area shapes; k-routes / route geometries are
future work (documented, reference networkanalysis.py:663-941).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .geom.wkb import from_wkb


def make_node_ids(lines: DataFrame, geometry: str = "geometry") -> DataFrame:
    """Edges with string node ids minted from endpoint coordinates
    (make_node_ids, nodes.py:19-86): source/target = "x_y" of the line's
    first/last vertex; length as the default weight."""
    cols = [f"`{f.name}` {f.dataType.simpleString()}"
            for f in lines.schema.fields]
    schema = ", ".join(cols) + \
        ", source string, target string, length double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ga = from_wkb(pdf[geometry].tolist())
            src, dst = [], []
            starts = ga.coords_start_per_geom()
            counts = ga.coords_count_per_geom()
            for g in range(len(ga)):
                a = ga.coords[starts[g]]
                b = ga.coords[starts[g] + counts[g] - 1]
                src.append(f"{a[0]!r}_{a[1]!r}")
                dst.append(f"{b[0]!r}_{b[1]!r}")
            out = pdf.copy()
            out["source"] = src
            out["target"] = dst
            out["length"] = ga.length()
            yield out

    return lines.mapInPandas(kernel, schema=schema)


def get_connected_components(edges: DataFrame) -> DataFrame:
    """Component label per node (finding_isolated_networks.py:10-104)."""
    from .clusters import connected_components
    verts = edges.select(F.col("source").alias("id")).union(
        edges.select(F.col("target").alias("id"))).distinct()
    e = edges.select(F.col("source").alias("src"), F.col("target").alias("dst"))
    return connected_components(e, verts)


def od_cost_matrix(edges: DataFrame, origins: DataFrame,
                   destinations: DataFrame, *, weight: str = "length",
                   directed: bool = False, max_iter: int = 50) -> DataFrame:
    """All-pairs origin->destination shortest-path costs
    (od_cost_matrix, networkanalysis.py:153-427) via distributed
    multi-source Bellman-Ford.

    origins/destinations: (oid/did, node) — node = the network node id the
    point snapped to (compose with point_ops.snap_all for search_tolerance
    semantics).  Unreachable pairs get NULL cost, like the reference.
    """
    e = edges.select(F.col("source").alias("u"), F.col("target").alias("v"),
                     F.col(weight).alias("w"))
    if not directed:
        e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
    e = e.localCheckpoint()

    dist = origins.select(F.col("oid"), F.col("node").alias("u"),
                          F.lit(0.0).alias("cost"))
    dist = dist.localCheckpoint()
    for _ in range(max_iter):
        relaxed = (dist.join(e, "u")
                   .select("oid", F.col("v").alias("u"),
                           (F.col("cost") + F.col("w")).alias("cost")))
        new = (dist.unionByName(relaxed)
               .groupBy("oid", "u").agg(F.min("cost").alias("cost")))
        new = new.localCheckpoint()
        improved = (new.alias("n").join(
            dist.alias("o"), ["oid", "u"], "left")
            .where(F.col("o.cost").isNull() |
                   (F.col("n.cost") < F.col("o.cost"))).count())
        dist = new
        if improved == 0:
            break
    out = destinations.select("did", F.col("node").alias("u")) \
        .join(dist, "u", "left")
    return (origins.select("oid").crossJoin(destinations.select("did"))
            .join(out.select("oid", "did", "cost"), ["oid", "did"], "left"))


def service_area_nodes(edges: DataFrame, origins: DataFrame, breaks: float,
                       *, weight: str = "length", directed: bool = False,
                       max_iter: int = 50) -> DataFrame:
    """Nodes reachable within `breaks` cost from each origin
    (service_area semantics over nodes, networkanalysis.py:942-1198;
    edge-geometry splitting of precice_service_area is future work)."""
    dests_all = edges.select(F.col("source").alias("node")).union(
        edges.select(F.col("target").alias("node"))).distinct() \
        .withColumn("did", F.col("node"))
    od = od_cost_matrix(edges, origins, dests_all, weight=weight,
                        directed=directed, max_iter=max_iter)
    return od.where(F.col("cost") <= breaks).select(
        "oid", F.col("did").alias("node"), "cost")
