"""Polygon operations: holes, gaps, elimination, clipping, boundaries.

Reference: `/root/reference/src/sgis/geopandas_tools/polygon_operations.py`
(close_all_holes/close_small_holes 1058-1322, get_gaps 1325-1363,
get_holes 1366-1399, eliminate_by_largest/_smallest 497-760) and
`general.py` (clean_clip 932-984, to_lines 543-676).

All per-row geometry work is Arrow-batched numpy kernels; cross-row work
composes the engine's join/dissolve/overlay primitives.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .geom.array import (LINESTRING, POLYGON, from_rings)
from .geom.clip import ring_area
from .geom.wkb import from_wkb, to_wkb
from .joins import sjoin_pairs
from .overlay import clean_overlay, _difference_rows


def _map_geoms(df: DataFrame, fn, extra_schema: str = "",
               geometry: str = "geometry") -> DataFrame:
    """Apply fn(GeomArray, pdf) -> (list[wkb or None], dict extra_cols);
    None drops the row."""
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    if extra_schema:
        schema += ", " + extra_schema

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ga = from_wkb(pdf[geometry].tolist())
            blobs, extra = fn(ga, pdf)
            keep = [i for i, b in enumerate(blobs) if b is not None]
            out = pdf.iloc[keep].copy()
            out[geometry] = [blobs[i] for i in keep]
            for k, v in (extra or {}).items():
                out[k] = [v[i] for i in keep]
            yield out

    return df.mapInPandas(kernel, schema=schema)


def get_holes(df: DataFrame, geometry: str = "geometry") -> DataFrame:
    """Interior rings as polygon rows (polygon_operations.py:1366-1399)."""
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ga = from_wkb(pdf[geometry].tolist())
            rows, blobs = [], []
            for g in range(len(ga)):
                p0, p1 = ga.geom_offsets[g], ga.geom_offsets[g + 1]
                for p in range(p0, p1):
                    r0, r1 = ga.part_offsets[p], ga.part_offsets[p + 1]
                    for r in range(r0 + 1, r1):
                        hole = ga.coords[ga.ring_offsets[r]:ga.ring_offsets[r + 1]]
                        sub = from_rings([[[hole[::-1]]]], [POLYGON])
                        rows.append(g)
                        blobs.append(to_wkb(sub)[0])
            if not rows:
                continue
            out = pdf.iloc[rows].copy()
            out[geometry] = blobs
            yield out

    return df.mapInPandas(kernel, schema=schema)


def close_small_holes(df: DataFrame, max_area: float,
                      geometry: str = "geometry") -> DataFrame:
    """Fill interior rings with |area| <= max_area
    (close_small_holes, polygon_operations.py:1134-1322)."""
    def fn(ga, pdf):
        blobs = []
        for g in range(len(ga)):
            parts = []
            p0, p1 = ga.geom_offsets[g], ga.geom_offsets[g + 1]
            for p in range(p0, p1):
                r0, r1 = ga.part_offsets[p], ga.part_offsets[p + 1]
                rings = [ga.coords[ga.ring_offsets[r0]:ga.ring_offsets[r0 + 1]]]
                for r in range(r0 + 1, r1):
                    hole = ga.coords[ga.ring_offsets[r]:ga.ring_offsets[r + 1]]
                    if abs(ring_area(hole)) > max_area:
                        rings.append(hole)
                parts.append(rings)
            kind = POLYGON if len(parts) == 1 else 6
            sub = from_rings([[parts[0]]] if kind == POLYGON else [parts], [kind])
            blobs.append(to_wkb(sub)[0])
        return blobs, {}

    return _map_geoms(df, fn, geometry=geometry)


def close_all_holes(df: DataFrame, geometry: str = "geometry") -> DataFrame:
    """Drop ALL interior rings (close_all_holes,
    polygon_operations.py:1058-1131)."""
    return close_small_holes(df, float("inf"), geometry)


def get_gaps(df: DataFrame, *, id_col: str,
             gridsize: float = 2000.0) -> DataFrame:
    """Enclosed empty regions between polygons (get_gaps,
    polygon_operations.py:1325-1363): bbox − union(polygons), minus the
    outer region touching the bbox boundary.  The layer is dissolved FIRST
    so enclosed gaps surface as holes of the union, which the difference
    kernel re-emits as standalone parts.  Limitation: exactly edge-tiled
    (zero-overlap) coverages rely on the perturbation ladder; snap-rounding
    noding is future work."""
    spark = df.sparkSession
    b = df.agg(F.min("minx"), F.min("miny"), F.max("maxx"), F.max("maxy")).first()
    pad = 1.0
    x0, y0, x1, y1 = b[0] - pad, b[1] - pad, b[2] + pad, b[3] + pad
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
    bbox_wkb = to_wkb(from_rings([[[ring]]], [POLYGON]))[0]
    bbox_df = spark.createDataFrame(
        pd.DataFrame({"__bid": [0], "geometry": [bbox_wkb],
                      "minx": [x0], "miny": [y0], "maxx": [x1], "maxy": [y1]}))
    from .dissolve import diss, explode_parts
    from .io import with_bounds
    dissolved = with_bounds(
        diss(df.select(id_col, "geometry"), None).withColumn(
            id_col, F.lit(0).cast("long")))
    diff = _difference_rows(bbox_df, dissolved, "__bid", id_col, gridsize)
    parts = explode_parts(diff)

    # drop the outer part (touches the padded bbox corner)
    def fn(ga, pdf):
        blobs = []
        bounds = ga.bounds()
        for g in range(len(ga)):
            touches_edge = (bounds[g, 0] <= x0 or bounds[g, 1] <= y0 or
                            bounds[g, 2] >= x1 or bounds[g, 3] >= y1)
            blobs.append(None if touches_edge else to_wkb(ga.take([g]))[0])
        return blobs, {}

    return _map_geoms(parts.drop("__bid"), fn)


def clean_clip(df: DataFrame, mask: DataFrame, *, id_col: str,
               mask_id: str, gridsize: float = 2000.0) -> DataFrame:
    """Clip df to mask polygons keeping df's schema (clean_clip,
    general.py:932-984): intersection overlay, left attributes only."""
    inter = clean_overlay(
        df, mask.select(mask_id, "geometry", "minx", "miny", "maxx", "maxy"),
        "intersection", id1=id_col, id2=mask_id, gridsize=gridsize)
    drop = [c for c in inter.columns if c.endswith("_2") or c == mask_id]
    out = inter.drop(*drop)
    return out.toDF(*[c[:-2] if c.endswith("_1") else c for c in out.columns])


def to_lines(df: DataFrame, geometry: str = "geometry") -> DataFrame:
    """Polygon boundaries as LineString rows (to_lines, general.py:543-676;
    ring splitting at intersections not applied — each ring one line)."""
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ga = from_wkb(pdf[geometry].tolist())
            rows, blobs = [], []
            for g in range(len(ga)):
                for ring in ga.rings_of_geom(g):
                    sub = from_rings([[ring]], [LINESTRING])
                    rows.append(g)
                    blobs.append(to_wkb(sub)[0])
            if not rows:
                continue
            out = pdf.iloc[rows].copy()
            out[geometry] = blobs
            yield out

    return df.mapInPandas(kernel, schema=schema)


def eliminate_by_largest(df: DataFrame, to_eliminate: DataFrame, *,
                         id_col: str, gridsize: float = 2000.0,
                         largest: bool = True) -> DataFrame:
    """Merge sliver polygons into the intersecting neighbor with the
    largest (or smallest) area (eliminate_by_largest/_smallest,
    polygon_operations.py:497-760).

    df = keeper polygons, to_eliminate = slivers (disjoint id spaces).
    Returns keepers with slivers unioned in (attributes from the keeper)
    plus slivers that touched no keeper, unchanged (isolated, like the
    reference's leftover handling)."""
    keep_area = _with_area(df, id_col)
    pairs = sjoin_pairs(to_eliminate, df, "intersects", left_id=id_col,
                        right_id=id_col, gridsize=gridsize)
    sliver_id, keeper_id = pairs.columns[0], pairs.columns[1]
    pr = pairs.join(keep_area.select(F.col(id_col).alias(keeper_id), "__area"),
                    keeper_id)
    order = F.col("__area").desc() if largest else F.col("__area").asc()
    w = Window.partitionBy(sliver_id).orderBy(order, F.col(keeper_id))
    chosen = (pr.withColumn("__rk", F.row_number().over(w))
              .where(F.col("__rk") == 1).select(sliver_id, keeper_id))

    sliver_geoms = to_eliminate.select(F.col(id_col).alias(sliver_id),
                                       F.col("geometry").alias("__sg"))
    host_extra = chosen.join(sliver_geoms, sliver_id) \
        .select(F.col(keeper_id).alias(id_col), F.col("__sg").alias("geometry"))
    union_in = df.select(id_col, "geometry").unionByName(host_extra)

    from .dissolve import diss
    merged = diss(union_in, [id_col])
    attrs = df.drop("geometry", "minx", "miny", "maxx", "maxy")
    out = attrs.join(merged, id_col, "inner")
    isolated = to_eliminate.join(chosen.select(F.col(sliver_id).alias(id_col)),
                                 id_col, "left_anti") \
        .drop("minx", "miny", "maxx", "maxy")
    return out.unionByName(isolated, allowMissingColumns=True)


def eliminate_by_smallest(df: DataFrame, to_eliminate: DataFrame, **kw):
    return eliminate_by_largest(df, to_eliminate, largest=False, **kw)


def _shared_border_length(la, ra, li, ri) -> np.ndarray:
    """Length of collinear segment overlap between boundary chains of pair
    (la[li[k]], ra[ri[k]]) — the reference's to_lines + overlay-intersection
    length (`polygon_operations.py:342-366`), computed directly."""
    out = np.zeros(len(li), dtype=np.float64)
    for k in range(len(li)):
        total = 0.0
        for a in la.rings_of_geom(int(li[k])):
            ax1, ay1 = a[:-1, 0], a[:-1, 1]
            ax2, ay2 = a[1:, 0], a[1:, 1]
            adx, ady = ax2 - ax1, ay2 - ay1
            for b in ra.rings_of_geom(int(ri[k])):
                bx1, by1 = b[:-1, 0], b[:-1, 1]
                bx2, by2 = b[1:, 0], b[1:, 1]
                bdx, bdy = bx2 - bx1, by2 - by1
                # parallel test (cross of directions == 0), vectorized pairs
                cross = adx[:, None] * bdy[None, :] - ady[:, None] * bdx[None, :]
                # collinear: (b1 - a1) x adir == 0
                c2 = (adx[:, None] * (by1[None, :] - ay1[:, None]) -
                      ady[:, None] * (bx1[None, :] - ax1[:, None]))
                cand = (cross == 0) & (c2 == 0)
                ia, ib = np.nonzero(cand)
                for i, j in zip(ia.tolist(), ib.tolist()):
                    ll = adx[i] * adx[i] + ady[i] * ady[i]
                    if ll == 0:
                        continue
                    t1 = ((bx1[j] - ax1[i]) * adx[i] + (by1[j] - ay1[i]) * ady[i]) / ll
                    t2 = ((bx2[j] - ax1[i]) * adx[i] + (by2[j] - ay1[i]) * ady[i]) / ll
                    lo, hi = max(min(t1, t2), 0.0), min(max(t1, t2), 1.0)
                    if hi > lo:
                        total += (hi - lo) * np.sqrt(ll)
        out[k] = total
    return out


def eliminate_by_longest(df: DataFrame, to_eliminate: DataFrame, *,
                         id_col: str, gridsize: float = 2000.0) -> DataFrame:
    """Merge slivers into the neighbor sharing the LONGEST border
    (eliminate_by_longest, polygon_operations.py:226-494): candidate
    neighbors from the cell join, shared-border length from the collinear
    segment-overlap kernel, argmax per sliver via window, then the same
    union/attribute plumbing as eliminate_by_largest."""
    pairs = sjoin_pairs(to_eliminate, df, "intersects", left_id=id_col,
                        right_id=id_col, gridsize=gridsize)
    sliver_id, keeper_id = pairs.columns[0], pairs.columns[1]
    sg = to_eliminate.select(F.col(id_col).alias(sliver_id),
                             F.col("geometry").alias("__sg"))
    kg = df.select(F.col(id_col).alias(keeper_id),
                   F.col("geometry").alias("__kg"))
    withg = pairs.join(sg, sliver_id).join(kg, keeper_id)

    sid_t = [f.dataType.simpleString() for f in to_eliminate.schema.fields
             if f.name == id_col][0]
    kid_t = [f.dataType.simpleString() for f in df.schema.fields
             if f.name == id_col][0]
    schema = f"{sliver_id} {sid_t}, {keeper_id} {kid_t}, border double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            scodes, su = pd.factorize(pdf["__sg"], use_na_sentinel=False)
            kcodes, ku = pd.factorize(pdf["__kg"], use_na_sentinel=False)
            la = from_wkb(list(su))
            ra = from_wkb(list(ku))
            border = _shared_border_length(la, ra,
                                           np.asarray(scodes, dtype=np.int64),
                                           np.asarray(kcodes, dtype=np.int64))
            yield pd.DataFrame({sliver_id: pdf[sliver_id].to_numpy(),
                                keeper_id: pdf[keeper_id].to_numpy(),
                                "border": border})

    borders = withg.mapInPandas(kernel, schema=schema)
    w = Window.partitionBy(sliver_id).orderBy(F.col("border").desc(),
                                              F.col(keeper_id))
    chosen = (borders.where(F.col("border") > 0)
              .withColumn("__rk", F.row_number().over(w))
              .where(F.col("__rk") == 1).select(sliver_id, keeper_id))
    host_extra = chosen.join(
        to_eliminate.select(F.col(id_col).alias(sliver_id),
                            F.col("geometry").alias("__sg")), sliver_id) \
        .select(F.col(keeper_id).alias(id_col), F.col("__sg").alias("geometry"))
    union_in = df.select(id_col, "geometry").unionByName(host_extra)
    from .dissolve import diss
    merged = diss(union_in, [id_col])
    attrs = df.drop("geometry", "minx", "miny", "maxx", "maxy")
    out = attrs.join(merged, id_col, "inner")
    isolated = to_eliminate.join(chosen.select(F.col(sliver_id).alias(id_col)),
                                 id_col, "left_anti") \
        .drop("minx", "miny", "maxx", "maxy")
    return out.unionByName(isolated, allowMissingColumns=True)


def _with_area(df: DataFrame, id_col: str) -> DataFrame:
    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ga = from_wkb(pdf["geometry"].tolist())
            out = pdf[[id_col]].copy()
            out["__area"] = ga.area()
            yield out

    id_t = [f.dataType.simpleString() for f in df.schema.fields
            if f.name == id_col][0]
    return df.select(id_col, "geometry").mapInPandas(
        kernel, schema=f"{id_col} {id_t}, __area double")


def area_col(df: DataFrame, geometry: str = "geometry",
             out_col: str = "area") -> DataFrame:
    """Attach shoelace area (the `sort_large_first` enabler,
    general.py:287-393 — sorting is then a plain orderBy)."""
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields) + f", {out_col} double"

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ga = from_wkb(pdf[geometry].tolist())
            out = pdf.copy()
            out[out_col] = ga.area()
            yield out

    return df.mapInPandas(kernel, schema=schema)
