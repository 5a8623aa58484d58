"""Spatial joins — the engine's core custom strategy.

Replaces the reference's STRtree join kernel
(`/root/reference/src/sgis/geopandas_tools/runners.py:170-265`) and the
operators built on it: `get_neighbor_indices` (neighbors.py:27-151),
`sjoin_within_distance` (neighbors.py:272-295), `sfilter` family
(sfilter.py:17-243), geopandas `sjoin` semantics.

Plan shape (SURVEY.md §2.4, §3.1):

    left  ─ bbox→cell-cover explode (pure SQL sequence(), JVM-side) ─┐
                                                                     ├─ equi-join on cell_key
    right ─ bbox→cell-cover explode ────────────────────────────────┘
         → Arrow-batched refine kernel (numpy predicates)
         → anchor-cell dedup (a pair is emitted only from the cell that
           contains the lower-left corner of its bbox intersection, so no
           global dropDuplicates shuffle is ever needed)
         → assemble attributes by id joins

Scale levers: the cell join is a plain equi-join Catalyst can broadcast /
AQE-skew-split; points take a zero-Python single-cell path; the refine
kernel groups candidates by the right geometry so each polygon is parsed
and tested against its candidate points vectorized.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .cells import FALSE_EASTING, Y_BITS, cover_cell_keys
from .geom.wkb import from_wkb
from .geom.predicates import geom_pair_distance, refine_pairs

DEFAULT_GRIDSIZE = 2000.0


def _cover_cells(df: DataFrame, gridsize: float, expand: float = 0.0,
                 prefix: str = "") -> DataFrame:
    """Explode rows into covering cell keys — pure Spark SQL (sequence +
    explode), no Python.  Adds `cell_key` and the (expanded) cover bbox
    `{prefix}cminx..{prefix}cmaxy` — used by the anchor-dedup AND pushed
    into the join condition so bbox-disjoint candidates are dropped
    JVM-side before any Arrow transfer."""
    g = float(gridsize)
    e = float(expand)
    df = (df
          .withColumn(f"{prefix}cminx", F.col("minx") - e)
          .withColumn(f"{prefix}cminy", F.col("miny") - e)
          .withColumn(f"{prefix}cmaxx", F.col("maxx") + e)
          .withColumn(f"{prefix}cmaxy", F.col("maxy") + e)
          .withColumn("__cx0", F.expr(f"cast(floor((minx - {e} + {FALSE_EASTING}) / {g}) as bigint)"))
          .withColumn("__cx1", F.expr(f"cast(floor((maxx + {e} + {FALSE_EASTING}) / {g}) as bigint)"))
          .withColumn("__cy0", F.expr(f"cast(floor((miny - {e}) / {g}) as bigint)"))
          .withColumn("__cy1", F.expr(f"cast(floor((maxy + {e}) / {g}) as bigint)")))
    df = (df
          .withColumn("__cx", F.explode(F.expr("sequence(__cx0, __cx1)")))
          .withColumn("__cy", F.explode(F.expr("sequence(__cy0, __cy1)")))
          .withColumn("cell_key",
                      F.expr(f"__cx * {1 << Y_BITS} + __cy"))
          .drop("__cx0", "__cx1", "__cy0", "__cy1", "__cx", "__cy"))
    return df


BROADCAST_RIGHT_MAX_BYTES = 64 << 20  # byte cap for driver-side right layer


def _collect_bounded(df: DataFrame, max_bytes: int, geom_pos: int = 1
                     ) -> list | None:
    """Collect rows IF the payload stays under a BYTE cap, else None.

    Decision is byte-based, not row-based (VERDICT round 1: 300k large
    polygons can be GBs of driver heap):
      1. when Catalyst plan statistics are available and already exceed the
         cap, bail with NO job at all;
      2. otherwise stream partitions with toLocalIterator, accumulating the
         actual WKB byte size, and abort as soon as the cap is crossed —
         driver memory stays bounded by cap + one partition."""
    try:
        est = int(df._jdf.queryExecution().optimizedPlan()
                  .stats().sizeInBytes())
        if 0 < est < (1 << 62) and est > 4 * max_bytes:
            return None
    except Exception:
        pass
    rows: list = []
    total = 0
    for row in df.toLocalIterator(prefetchPartitions=True):
        rows.append(row)
        g = row[geom_pos]
        total += (len(g) if g is not None else 0) + 48
        if total > max_bytes:
            return None
    return rows


def sjoin_pairs(left: DataFrame, right: DataFrame, predicate: str = "intersects",
                *, left_id: str = "left_id", right_id: str = "right_id",
                distance: float | None = None, gridsize: float = DEFAULT_GRIDSIZE,
                keep_distance: bool = False,
                broadcast_right: bool | None = None,
                assume_left_points: bool | None = None) -> DataFrame:
    """Candidate generation + refine.  Inputs must carry
    (id, geometry WKB, minx, miny, maxx, maxy); ids must be unique.

    Returns DataFrame[left_id, right_id(, distance double)].
    Predicate semantics match the reference's STRtree predicates
    (`runners.py:180-181`); `within` is rewritten as inverse contains
    (`sfilter.py:311-328`) inside the kernel.

    broadcast_right (auto when None, on iff |right| <= BROADCAST_RIGHT_MAX):
    parse the right geometries ONCE on the driver and broadcast the parsed
    GeomArray; candidate rows then carry only ids — cutting Arrow traffic
    through the refine kernel by ~4x.  The big-right path ships WKB through
    the join instead (fully distributed, no driver materialization).
    """
    from .crs import require_same_crs
    require_same_crs(left, right)  # analysis-time; untagged frames pass

    need_dist = keep_distance or predicate == "dwithin"
    expand = float(distance or 0.0) if predicate == "dwithin" else 0.0

    if broadcast_right is not False:
        sel = right.select(right_id, "geometry", "minx", "miny",
                           "maxx", "maxy")
        if broadcast_right:  # explicit: no cap, caller takes responsibility
            rows = sel.collect()
        else:  # auto: byte-bounded probe, no eager count job
            rows = _collect_bounded(sel, BROADCAST_RIGHT_MAX_BYTES)
        if rows is not None:
            return _sjoin_pairs_broadcast(left, right, predicate, rows,
                                          left_id=left_id, right_id=right_id,
                                          distance=distance,
                                          gridsize=gridsize,
                                          keep_distance=keep_distance,
                                          assume_left_points=assume_left_points)

    l = left.select(F.col(left_id).alias("__lid"), F.col("geometry").alias("__lg"),
                    "minx", "miny", "maxx", "maxy")
    l = _cover_cells(l, gridsize, expand=expand, prefix="l_") \
        .select("__lid", "__lg", "cell_key",
                F.col("l_cminx").alias("__lminx"), F.col("l_cminy").alias("__lminy"),
                F.col("l_cmaxx").alias("__lmaxx"), F.col("l_cmaxy").alias("__lmaxy"))
    r = right.select(F.col(right_id).alias("__rid"), F.col("geometry").alias("__rg"),
                     "minx", "miny", "maxx", "maxy")
    r = _cover_cells(r, gridsize, prefix="r_") \
        .select("__rid", "__rg", "cell_key",
                F.col("r_cminx").alias("__rminx"), F.col("r_cminy").alias("__rminy"),
                F.col("r_cmaxx").alias("__rmaxx"), F.col("r_cmaxy").alias("__rmaxy"))

    # equi-join on cell + bbox-overlap as a JVM join filter: bbox-disjoint
    # cell cohabitants never reach the Python kernel
    cand = l.join(r, (l["cell_key"] == r["cell_key"]) &
                  (F.col("__lminx") <= F.col("__rmaxx")) &
                  (F.col("__lmaxx") >= F.col("__rminx")) &
                  (F.col("__lminy") <= F.col("__rmaxy")) &
                  (F.col("__lmaxy") >= F.col("__rminy")), "inner") \
        .drop(r["cell_key"]) \
        .drop("__lmaxx", "__lmaxy", "__rmaxx", "__rmaxy")

    lid_t = dict(zip(left.schema.names, [f.dataType.simpleString() for f in left.schema.fields]))[left_id]
    rid_t = dict(zip(right.schema.names, [f.dataType.simpleString() for f in right.schema.fields]))[right_id]
    out_right = right_id if right_id != left_id else right_id + "_2"
    out_schema = f"{left_id} {lid_t}, {out_right} {rid_t}"
    if need_dist:
        out_schema += ", distance double"

    g = float(gridsize)
    pred = predicate
    dist_cap = distance

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # anchor-cell dedup: pair counted only in the cell holding the
            # lower-left corner of the (cover-)bbox intersection
            ax = np.maximum(pdf["__lminx"].to_numpy(), pdf["__rminx"].to_numpy())
            ay = np.maximum(pdf["__lminy"].to_numpy(), pdf["__rminy"].to_numpy())
            acx = np.floor((ax + FALSE_EASTING) / g).astype(np.int64)
            acy = np.floor(ay / g).astype(np.int64)
            anchor = acx * np.int64(1 << Y_BITS) + acy
            keep = anchor == pdf["cell_key"].to_numpy()
            pdf = pdf.loc[keep]
            if len(pdf) == 0:
                continue
            # unique-geometry decode per side
            lcodes, lu = pd.factorize(pdf["__lg"], use_na_sentinel=False)
            rcodes, ru = pd.factorize(pdf["__rg"], use_na_sentinel=False)
            la = from_wkb(list(lu))
            ra = from_wkb(list(ru))
            li = np.asarray(lcodes, dtype=np.int64)
            ri = np.asarray(rcodes, dtype=np.int64)
            if pred == "dwithin":
                d = geom_pair_distance(la, ra, li, ri)
                ok = d <= float(dist_cap)
                out = pd.DataFrame({left_id: pdf["__lid"].to_numpy()[ok],
                                    out_right: pdf["__rid"].to_numpy()[ok]})
                if need_dist:
                    out["distance"] = d[ok]
            else:
                ok = refine_pairs(la, ra, li, ri, pred)
                out = pd.DataFrame({left_id: pdf["__lid"].to_numpy()[ok],
                                    out_right: pdf["__rid"].to_numpy()[ok]})
                if need_dist:
                    out["distance"] = geom_pair_distance(la, ra, li[ok], ri[ok])
            yield out

    return cand.mapInPandas(kernel, schema=out_schema)


def _sjoin_pairs_broadcast(left: DataFrame, right: DataFrame, predicate: str,
                           rows: list, *, left_id: str, right_id: str,
                           distance: float | None, gridsize: float,
                           keep_distance: bool,
                           assume_left_points: bool | None = None
                           ) -> DataFrame:
    """Small-right refine: right geometries (pre-collected under a byte cap
    by the caller) parsed once, broadcast as a GeomArray; candidates carry
    ids only."""
    import pandas as _pd
    need_dist = keep_distance or predicate == "dwithin"
    expand = float(distance or 0.0) if predicate == "dwithin" else 0.0
    spark = left.sparkSession

    rids = np.array([r[0] for r in rows])
    ra = from_wkb([r[1] for r in rows])
    rb = np.array([[r[2], r[3], r[4], r[5]] for r in rows], dtype=np.float64) \
        if rows else np.zeros((0, 4))
    rid_to_idx = _pd.Series(np.arange(len(rids)), index=rids)

    # PREDICATE COMPILATION: point-left x rectangle-right evaluates fully
    # JVM-side (between-filters after the cell join — zero Python, full
    # whole-stage codegen).  Detected, not hinted: zero-extent left bboxes
    # == points; rect_flags on the parsed right geometries.
    from .geom.predicates import rect_flags
    r_rect, _rbounds = rect_flags(ra)
    if (len(ra) == 0 or bool(r_rect.all())) and \
            predicate in ("within", "intersects", "covered_by", "dwithin") \
            and assume_left_points is not False:
        if assume_left_points:
            left_is_points = True  # caller vouches (e.g. geom_kind filter)
        else:
            # detection scan only when the caller gave no hint — on big
            # left sides pass assume_left_points explicitly to skip it
            ext = left.agg(
                F.max(F.col("maxx") - F.col("minx")).alias("ex"),
                F.max(F.col("maxy") - F.col("miny")).alias("ey")).first()
            left_is_points = (ext["ex"] is not None
                              and float(ext["ex"] or 0) == 0.0
                              and float(ext["ey"] or 0) == 0.0)
        if left_is_points:
            return _points_vs_rects_jvm(
                spark, left, rids, rb, predicate, left_id=left_id,
                right_id=right_id, rid_t_source=right, distance=distance,
                gridsize=gridsize, keep_distance=keep_distance)

    bc = spark.sparkContext.broadcast((rid_to_idx, ra))

    # right cover cells computed driver-side (small), shipped as a plain DF
    gi, keys = cover_cell_keys(rb[:, 0], rb[:, 1], rb[:, 2], rb[:, 3], gridsize)
    rcells = spark.createDataFrame(_pd.DataFrame({
        "__rid": rids[gi] if len(gi) else rids[:0],
        "cell_key": keys,
        "__rminx": rb[gi, 0] if len(gi) else np.zeros(0),
        "__rminy": rb[gi, 1] if len(gi) else np.zeros(0),
        "__rmaxx": rb[gi, 2] if len(gi) else np.zeros(0),
        "__rmaxy": rb[gi, 3] if len(gi) else np.zeros(0)}))

    l = left.select(F.col(left_id).alias("__lid"), F.col("geometry").alias("__lg"),
                    "minx", "miny", "maxx", "maxy")
    l = _cover_cells(l, gridsize, expand=expand, prefix="l_") \
        .select("__lid", "__lg", "cell_key",
                F.col("l_cminx").alias("__lminx"), F.col("l_cminy").alias("__lminy"),
                F.col("l_cmaxx").alias("__lmaxx"), F.col("l_cmaxy").alias("__lmaxy"))
    rc = F.broadcast(rcells)
    cand = l.join(rc, (l["cell_key"] == rcells["cell_key"]) &
                  (F.col("__lminx") <= F.col("__rmaxx")) &
                  (F.col("__lmaxx") >= F.col("__rminx")) &
                  (F.col("__lminy") <= F.col("__rmaxy")) &
                  (F.col("__lmaxy") >= F.col("__rminy")), "inner") \
        .drop(rcells["cell_key"]) \
        .drop("__lmaxx", "__lmaxy", "__rmaxx", "__rmaxy")

    lid_t = dict(zip(left.schema.names,
                     [f.dataType.simpleString() for f in left.schema.fields]))[left_id]
    rid_t = dict(zip(right.schema.names,
                     [f.dataType.simpleString() for f in right.schema.fields]))[right_id]
    out_right = right_id if right_id != left_id else right_id + "_2"
    out_schema = f"{left_id} {lid_t}, {out_right} {rid_t}"
    if need_dist:
        out_schema += ", distance double"

    g = float(gridsize)
    pred = predicate
    dist_cap = distance

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rid_map, ra_b = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ax = np.maximum(pdf["__lminx"].to_numpy(), pdf["__rminx"].to_numpy())
            ay = np.maximum(pdf["__lminy"].to_numpy(), pdf["__rminy"].to_numpy())
            anchor = (np.floor((ax + FALSE_EASTING) / g).astype(np.int64)
                      * np.int64(1 << Y_BITS)
                      + np.floor(ay / g).astype(np.int64))
            pdf = pdf.loc[anchor == pdf["cell_key"].to_numpy()]
            if len(pdf) == 0:
                continue
            lcodes, lu = pd.factorize(pdf["__lg"], use_na_sentinel=False)
            la = from_wkb(list(lu))
            li = np.asarray(lcodes, dtype=np.int64)
            ri = rid_map.loc[pdf["__rid"]].to_numpy()
            if pred == "dwithin":
                d = geom_pair_distance(la, ra_b, li, ri)
                ok = d <= float(dist_cap)
                out = pd.DataFrame({left_id: pdf["__lid"].to_numpy()[ok],
                                    out_right: pdf["__rid"].to_numpy()[ok]})
                if need_dist:
                    out["distance"] = d[ok]
            else:
                ok = refine_pairs(la, ra_b, li, ri, pred)
                out = pd.DataFrame({left_id: pdf["__lid"].to_numpy()[ok],
                                    out_right: pdf["__rid"].to_numpy()[ok]})
                if need_dist:
                    out["distance"] = geom_pair_distance(la, ra_b, li[ok], ri[ok])
            yield out

    return cand.mapInPandas(kernel, schema=out_schema)


def _points_vs_rects_jvm(spark, left, rids, rb, predicate, *, left_id,
                         right_id, rid_t_source, distance, gridsize,
                         keep_distance) -> DataFrame:
    """All-JVM refine for point-left x rectangle-right: cell join +
    between-filters (dwithin: clamped-axis distance expression).  Points
    live in exactly one cell, so no anchor dedup is needed."""
    import pandas as _pd
    need_dist = keep_distance or predicate == "dwithin"
    expand = float(distance or 0.0) if predicate == "dwithin" else 0.0
    g = float(gridsize)
    gi, keys = cover_cell_keys(rb[:, 0] - expand, rb[:, 1] - expand,
                               rb[:, 2] + expand, rb[:, 3] + expand, g)
    out_right = right_id if right_id != left_id else right_id + "_2"
    rcells = spark.createDataFrame(_pd.DataFrame({
        out_right: rids[gi] if len(gi) else rids[:0],
        "cell_key": keys,
        "__rminx": rb[gi, 0] if len(gi) else np.zeros(0),
        "__rminy": rb[gi, 1] if len(gi) else np.zeros(0),
        "__rmaxx": rb[gi, 2] if len(gi) else np.zeros(0),
        "__rmaxy": rb[gi, 3] if len(gi) else np.zeros(0)}))
    l = left.select(F.col(left_id), F.col("minx").alias("__x"),
                    F.col("miny").alias("__y"))
    l = l.withColumn("cell_key", F.expr(
        f"cast(floor((__x + {FALSE_EASTING}) / {g}) as bigint) * {1 << Y_BITS}"
        f" + cast(floor(__y / {g}) as bigint)"))
    cand = l.join(F.broadcast(rcells), "cell_key")
    # each (point, rect) pair appears once per rect-cover cell the point's
    # cell matches — the point has ONE cell, so exactly once
    if predicate == "dwithin":
        dist_expr = ("sqrt(pow(greatest(__rminx - __x, __x - __rmaxx, 0D), 2)"
                     " + pow(greatest(__rminy - __y, __y - __rmaxy, 0D), 2))")
        cand = cand.withColumn("__dist", F.expr(dist_expr)) \
                   .where(F.col("__dist") <= float(distance))
        cols = [left_id, out_right] + (["__dist"] if need_dist else [])
        out = cand.select(*cols)
        if need_dist:
            out = out.withColumnRenamed("__dist", "distance")
        return out
    out = cand.where((F.col("__x") >= F.col("__rminx")) &
                     (F.col("__x") <= F.col("__rmaxx")) &
                     (F.col("__y") >= F.col("__rminy")) &
                     (F.col("__y") <= F.col("__rmaxy")))
    return out.select(left_id, out_right)


# ---------------------------------------------------------------------- #
# public operators (reference API surface)
# ---------------------------------------------------------------------- #
def get_neighbor_indices(left: DataFrame, right: DataFrame, *,
                         left_id: str = "left_id", right_id: str = "right_id",
                         max_distance: float = 0, predicate: str = "intersects",
                         gridsize: float = DEFAULT_GRIDSIZE) -> DataFrame:
    """`get_neighbor_indices` (neighbors.py:27-151): pair table of left ids to
    matching right ids; `max_distance>0` means within that distance (the
    reference buffers the left side; we evaluate exact dwithin, which is the
    same set without discretization error)."""
    if max_distance and max_distance > 0:
        return sjoin_pairs(left, right, "dwithin", left_id=left_id,
                           right_id=right_id, distance=max_distance,
                           gridsize=gridsize)
    return sjoin_pairs(left, right, predicate, left_id=left_id,
                       right_id=right_id, gridsize=gridsize)


def sjoin(left: DataFrame, right: DataFrame, predicate: str = "intersects", *,
          how: str = "inner", left_id: str = "left_id", right_id: str = "right_id",
          lsuffix: str = "_left", rsuffix: str = "_right",
          distance: float | None = None,
          gridsize: float = DEFAULT_GRIDSIZE) -> DataFrame:
    """geopandas-`sjoin` semantics (used throughout the reference, e.g.
    polygon_operations.py:669-673): inner/left join of attribute rows on the
    spatial predicate.  Collided column names get suffixes (geometry/bbox
    of the right side are dropped, like geopandas keeps left geometry)."""
    pairs = sjoin_pairs(left, right, predicate, left_id=left_id,
                        right_id=right_id, distance=distance, gridsize=gridsize)
    pair_right = pairs.columns[1]  # right_id, suffixed on collision
    rdrop = right.drop("geometry", "minx", "miny", "maxx", "maxy") \
                 .withColumnRenamed(right_id, pair_right)
    lcols = set(left.columns)
    for c in rdrop.columns:
        if c in lcols and c != pair_right:
            rdrop = rdrop.withColumnRenamed(c, c + rsuffix)
    joined = pairs.join(rdrop, pair_right, "inner")
    out = left.join(joined, left_id, how="inner" if how == "inner" else "left")
    return out


def sjoin_within_distance(left: DataFrame, right: DataFrame, distance: float, *,
                          left_id: str = "left_id", right_id: str = "right_id",
                          distance_col: str = "distance",
                          gridsize: float = DEFAULT_GRIDSIZE) -> DataFrame:
    """`sjoin_within_distance` (neighbors.py:272-295): dwithin pairs with the
    exact distance column appended."""
    pairs = sjoin_pairs(left, right, "dwithin", left_id=left_id,
                        right_id=right_id, distance=distance,
                        gridsize=gridsize, keep_distance=True)
    return pairs.withColumnRenamed("distance", distance_col)


def sfilter(gdf: DataFrame, other: DataFrame, predicate: str = "intersects", *,
            left_id: str = "left_id", right_id: str = "right_id",
            distance: float | None = None,
            gridsize: float = DEFAULT_GRIDSIZE) -> DataFrame:
    """Spatial SEMI join (`sfilter.py:17-93`): rows of gdf matching any row
    of other; no columns from other; each row at most once."""
    pairs = sjoin_pairs(gdf, other, predicate, left_id=left_id,
                        right_id=right_id, distance=distance, gridsize=gridsize)
    return gdf.join(pairs.select(left_id).distinct(), left_id, "left_semi")


def sfilter_inverse(gdf: DataFrame, other: DataFrame,
                    predicate: str = "intersects", *,
                    left_id: str = "left_id", right_id: str = "right_id",
                    distance: float | None = None,
                    gridsize: float = DEFAULT_GRIDSIZE) -> DataFrame:
    """Spatial ANTI join (`sfilter.py:177-243`)."""
    pairs = sjoin_pairs(gdf, other, predicate, left_id=left_id,
                        right_id=right_id, distance=distance, gridsize=gridsize)
    return gdf.join(pairs.select(left_id).distinct(), left_id, "left_anti")


def sfilter_split(gdf: DataFrame, other: DataFrame,
                  predicate: str = "intersects", *,
                  left_id: str = "left_id", right_id: str = "right_id",
                  distance: float | None = None,
                  gridsize: float = DEFAULT_GRIDSIZE
                  ) -> tuple[DataFrame, DataFrame]:
    """(matching, non-matching) from ONE refine pass (`sfilter.py:96-174`)."""
    pairs = sjoin_pairs(gdf, other, predicate, left_id=left_id,
                        right_id=right_id, distance=distance, gridsize=gridsize)
    hits = pairs.select(left_id).distinct()
    return (gdf.join(hits, left_id, "left_semi"),
            gdf.join(hits, left_id, "left_anti"))


def get_neighbor_dfs(left: DataFrame, right: DataFrame, *,
                     left_id: str = "left_id", right_id: str = "right_id",
                     predicate: str = "intersects",
                     gridsize: float = DEFAULT_GRIDSIZE) -> DataFrame:
    """Right-side attribute rows grouped per left key
    (get_neighbor_dfs, neighbors.py:154-160): one row per left id with a
    `neighbors` array of right-row structs."""
    pairs = sjoin_pairs(left, right, predicate, left_id=left_id,
                        right_id=right_id, gridsize=gridsize)
    rid = pairs.columns[1]
    rattrs = right.drop("geometry", "minx", "miny", "maxx", "maxy") \
                  .withColumnRenamed(right_id, rid)
    joined = pairs.join(rattrs, rid)
    cols = [c for c in rattrs.columns]
    return joined.groupBy(left_id).agg(
        F.collect_list(F.struct(*cols)).alias("neighbors"))


def get_all_distances(left: DataFrame, right: DataFrame, *,
                      left_id: str = "left_id", right_id: str = "right_id"
                      ) -> DataFrame:
    """`get_all_distances` (neighbors.py:163-269): full distance table.
    Broadcast cross join — only sane with a small right side, exactly like
    the reference's all-pairs kernel."""
    l = left.select(F.col(left_id), F.col("geometry").alias("__lg"),
                    "minx", "miny", "maxx", "maxy")
    r = F.broadcast(right.select(F.col(right_id), F.col("geometry").alias("__rg")))
    cand = l.crossJoin(r)
    lid_t = [f.dataType.simpleString() for f in left.schema.fields
             if f.name == left_id][0]
    rid_t = [f.dataType.simpleString() for f in right.schema.fields
             if f.name == right_id][0]

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            lcodes, lu = pd.factorize(pdf["__lg"], use_na_sentinel=False)
            rcodes, ru = pd.factorize(pdf["__rg"], use_na_sentinel=False)
            la = from_wkb(list(lu))
            ra = from_wkb(list(ru))
            d = geom_pair_distance(la, ra, np.asarray(lcodes, dtype=np.int64),
                                   np.asarray(rcodes, dtype=np.int64))
            yield pd.DataFrame({left_id: pdf[left_id].to_numpy(),
                                right_id: pdf[right_id].to_numpy(),
                                "distance": d})

    return cand.mapInPandas(
        kernel, schema=f"{left_id} {lid_t}, {right_id} {rid_t}, distance double")
