"""Capture `.explain("formatted")` for every bench query touched in round
7, into plans/r07/<query>_{before,after}.txt.

Run from a repo tree (the round-start worktree for `before`, the current
tree for `after`):

    python tools/plans_r07.py <out_dir> <suffix>
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def cap(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main(out_dir: str, suffix: str):
    from pyspark.sql import functions as F
    from sgspark.session import get_spark
    from sgspark.synth import (documents_with_spans, synth_documents,
                               zones_from_customer)
    from sgspark.io import extract_geometries, wkt_to_wkb_df
    from sgspark.joins import sjoin_pairs
    from sgspark.knn import get_k_nearest_neighbors
    from sgspark.textops import near_dup_pairs

    spark = get_spark("plans-r07", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    def emit(name, df):
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(cap(df))
        print("wrote", name, suffix)

    zones = wkt_to_wkb_df(zones_from_customer(spark, SF)).localCheckpoint()
    geo = extract_geometries(documents_with_spans(spark, SF))
    pts = geo.where("geom_kind = 'point' AND span_pos = 1")

    # spatial_pipeline_ngon: distributed pack path
    zn = wkt_to_wkb_df(
        zones_from_customer(spark, SF, shape="ngon64")
        .where("zone_id % 20 = 0")).localCheckpoint()
    p = extract_geometries(synth_documents(spark, 200_000)) \
        .where("geom_kind = 'point' AND span_pos = 1")
    emit("spatial_pipeline_ngon",
         sjoin_pairs(p, zn, "within", left_id="doc_index",
                     right_id="zone_id", broadcast_right=False,
                     assume_left_points=True))

    # overlay_concave intersection (fused cell join + kernel)
    from __spark_entry__ import q_overlay_concave, q_coverage_clean
    emit("overlay_concave", q_overlay_concave(spark, SF))

    # near_dup pairs
    emit("near_dup",
         near_dup_pairs(spark.read.parquet(f"{SF}/documents.parquet"),
                        threshold=0.2))

    # knn
    centers = zones.selectExpr("zone_id", "cx AS x", "cy AS y")
    pk = pts.selectExpr("doc_index AS doc_id", "minx AS x", "miny AS y")
    emit("knn", get_k_nearest_neighbors(pk, centers, 3, left_id="doc_id",
                                        right_id="zone_id"))

    # route_costs od matrix
    from __spark_entry__ import _supplier_graph
    from sgspark.network import od_cost_matrix
    edges = _supplier_graph(spark, SF).where(
        "cast(source as long) <= 200 AND cast(target as long) <= 200")
    orig = spark.createDataFrame([("o1", "1")], ["oid", "node"])
    dests = spark.read.parquet(f"{SF}/supplier.parquet") \
        .where("s_suppkey <= 200") \
        .selectExpr("cast(s_suppkey as long) AS did",
                    "cast(s_suppkey as string) AS node")
    emit("route_costs", od_cost_matrix(edges, orig, dests, max_iter=40))

    # coverage_clean (final plan of the cleaned layer)
    emit("coverage_clean", q_coverage_clean(spark, SF))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
