"""Stage-by-stage wall-time profile of coverage_clean (VERDICT r4 #5).

Mirrors cleaning.coverage_clean but times each localCheckpoint barrier,
so the 14s-at-sf0.1 budget is attributable.  Usage:
    python tools/profile_coverage_clean.py [sf_dir] [cores]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from pyspark.sql import functions as F
    from sgspark.session import get_spark
    from sgspark.io import with_bounds
    from sgspark.cleaning import _thin_flag, _with_area
    from sgspark.overlay import update_geometries
    from sgspark.polygon_ops import (close_thin_holes, eliminate_by_longest,
                                     get_gaps, remove_spikes)

    spark = get_spark("profile-cc", cores=cores,
                      shuffle_partitions=max(2 * cores, 16))
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    # the gate's input fixture (before coverage_clean itself)
    src = E._coverage_fixture(spark, sf_dir)
    df = src.localCheckpoint()
    print(f"input rows: {df.count()}")
    id_col, gridsize, tolerance = "pid", 300.0, 3.0

    t = {}

    def mark(name, t0):
        t[name] = round(time.time() - t0, 2)
        print(f"{name:28s} {t[name]:6.2f}s")

    attrs = [c for c in df.columns
             if c not in (id_col, "geometry", "minx", "miny", "maxx", "maxy")]
    t0 = time.time()
    cur = with_bounds(close_thin_holes(
        df.drop("minx", "miny", "maxx", "maxy"), tolerance)).localCheckpoint()
    mark("close_thin_holes", t0)

    t0 = time.time()
    # round 6: gap geometry + bounds + thinness come out of ONE fused pass
    gaps = get_gaps(cur, id_col=id_col, gridsize=gridsize,
                    bounds=True, thin_tolerance=tolerance)
    gaps = gaps.withColumn(
        id_col, -(F.abs(F.xxhash64("geometry")) + F.lit(1)))
    thin_gaps = (gaps.where("__thin")
                 .select(id_col, "geometry", "minx", "miny", "maxx", "maxy")
                 .localCheckpoint())
    n_gaps = thin_gaps.count()
    mark(f"get_gaps+thin ({n_gaps})", t0)

    t0 = time.time()
    filled = eliminate_by_longest(cur, thin_gaps, id_col=id_col,
                                  gridsize=gridsize)
    filled = filled.where(F.col(id_col) >= 0)
    # round 6: ranked is the single materialization barrier (fused
    # bounds+area kernel), so this mark covers eliminate + rank build
    from sgspark.cleaning import _bounds_and_area
    ranked = _bounds_and_area(filled.select(id_col, *attrs, "geometry")) \
        .withColumn("__rank", F.struct((-F.col("__area")).alias("na"),
                                       F.col(id_col).alias("tid"))) \
        .drop("__area").localCheckpoint()
    ranked.count()
    mark("eliminate+rank", t0)

    t0 = time.time()
    deduped = update_geometries(ranked, id_col=id_col, rank_col="__rank",
                                gridsize=gridsize).drop("__rank") \
        .localCheckpoint()
    deduped.count()
    mark("update_geometries", t0)

    t0 = time.time()
    out = remove_spikes(deduped.select(id_col, *attrs, "geometry"),
                        tolerance)
    n = with_bounds(out).count()
    mark("remove_spikes+bounds", t0)
    print(f"total: {sum(t.values()):.2f}s, rows: {n}")


if __name__ == "__main__":
    main()
