"""clean_overlay — set-theoretic overlay of two polygon layers, 6 hows.

Reference: `/root/reference/src/sgis/geopandas_tools/overlay.py:42-206`
(pipeline semantics in SURVEY.md §2.5/§3.1) plus the overlay-based
operators `get_intersections` (duplicates.py:189-404) and
`update_geometries` (duplicates.py:28-186).

Spark plan:
  pairs   = cell-join candidates + intersects refine      (sgspark.joins)
  inter   = per-pair boolean kernel (mapInPandas)         -> suffixed schema
  diff    = groupBy(left) erase-by-all-partners kernel    (applyInPandas,
            one-hit groups skip aggregation — reference O7)
            + anti-join pass-through of untouched lefts
  others  = compositions:  identity = inter ∪ diff(df1)
                           union    = inter ∪ diff(df1) ∪ diff(df2)
                           symmetric_difference = diff(df1) ∪ diff(df2)
                           update   = diff(df1) ∪ df2
Column contract (asserted by reference tests/test_overlay.py:30-57):
`difference` keeps df1's schema unsuffixed; every other how suffixes
collided attribute names with lsuffix/rsuffix ("_1"/"_2").

Scope: polygon×polygon (the reference's dominant path; other families are
filtered out up front exactly like keep_geom_type/geom_type resolution,
`general.py:1150-1166`).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .geom.clip import polygon_boolean, ring_area
from .geom.array import MULTIPOLYGON, POLYGON, GeomArray, from_rings
from .geom.wkb import from_wkb, to_wkb
from .joins import sjoin_pairs

HOWS = ("intersection", "union", "identity", "symmetric_difference",
        "difference", "update")
_BBOX = ["minx", "miny", "maxx", "maxy"]


def _attr_cols(df: DataFrame, id_col: str) -> list[str]:
    return [c for c in df.columns
            if c not in _BBOX + ["geometry"] and c != id_col]


def _parts_of(ga: GeomArray, g: int) -> list[list[np.ndarray]]:
    parts = []
    p0, p1 = ga.geom_offsets[g], ga.geom_offsets[g + 1]
    for p in range(p0, p1):
        r0, r1 = ga.part_offsets[p], ga.part_offsets[p + 1]
        parts.append([ga.coords[ga.ring_offsets[r]:ga.ring_offsets[r + 1]]
                      for r in range(r0, r1)])
    return parts


def _parts_to_wkb(parts: list[list[np.ndarray]]) -> bytes | None:
    parts = [p for p in parts if p and abs(ring_area(p[0])) > 0]
    if not parts:
        return None
    if len(parts) == 1:
        return to_wkb(from_rings([[parts[0]]], [POLYGON]))[0]
    return to_wkb(from_rings([parts], [MULTIPOLYGON]))[0]


def _pairs_with_geoms(df1, df2, id1, id2, gridsize):
    pairs = sjoin_pairs(df1, df2, "intersects", left_id=id1, right_id=id2,
                        gridsize=gridsize)
    rid = pairs.columns[1]
    g1 = df1.select(F.col(id1), F.col("geometry").alias("__g1"))
    g2 = df2.select(F.col(id2).alias(rid), F.col("geometry").alias("__g2"))
    return pairs.join(g1, id1).join(g2, rid), rid


def _intersection_rows(df1, df2, id1, id2, gridsize) -> DataFrame:
    """(id1, id2, geometry) of pairwise intersections (non-empty only)."""
    withg, rid = _pairs_with_geoms(df1, df2, id1, id2, gridsize)
    id1_t = [f.dataType.simpleString() for f in df1.schema.fields
             if f.name == id1][0]
    id2_t = [f.dataType.simpleString() for f in df2.schema.fields
             if f.name == id2][0]
    schema = f"{id1} {id1_t}, {rid} {id2_t}, geometry binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom.wkb import rect_polygon_wkb
        for pdf in batches:
            if len(pdf) == 0:
                continue
            la = from_wkb(pdf["__g1"].tolist())
            ra = from_wkb(pdf["__g2"].tolist())
            # FAST PATH: axis-aligned-rectangle pairs -> vectorized interval
            # intersection (exact), no polygon-boolean python work
            lrect = _is_rect(la)
            rrect = _is_rect(ra)
            both = lrect[0] & rrect[0]
            frames = []
            if both.any():
                i = np.nonzero(both)[0]
                bx0 = np.maximum(lrect[1][i, 0], rrect[1][i, 0])
                by0 = np.maximum(lrect[1][i, 1], rrect[1][i, 1])
                bx1 = np.minimum(lrect[1][i, 2], rrect[1][i, 2])
                by1 = np.minimum(lrect[1][i, 3], rrect[1][i, 3])
                ok = (bx1 > bx0) & (by1 > by0)
                j = i[ok]
                if len(j):
                    frames.append(pd.DataFrame({
                        id1: pdf[id1].to_numpy()[j],
                        rid: pdf[rid].to_numpy()[j],
                        "geometry": rect_polygon_wkb(bx0[ok], by0[ok],
                                                     bx1[ok], by1[ok])}))
            out_rows = []
            for k in np.nonzero(~both)[0].tolist():
                res = polygon_boolean(_parts_of(la, k), _parts_of(ra, k),
                                      "intersection")
                wkb = _parts_to_wkb(res)
                if wkb is not None:
                    out_rows.append((pdf[id1].iloc[k], pdf[rid].iloc[k], wkb))
            if out_rows:
                frames.append(pd.DataFrame(out_rows,
                                           columns=[id1, rid, "geometry"]))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return withg.mapInPandas(kernel, schema=schema)


def _is_rect(ga: GeomArray) -> tuple[np.ndarray, np.ndarray]:
    from .geom.predicates import rect_flags
    return rect_flags(ga)


def _difference_rows(df1, df2, id1, id2, gridsize) -> DataFrame:
    """(id1, geometry) = each df1 geometry minus the union of its partners,
    plus untouched df1 rows.  One-hit groups take the single-partner fast
    path inside the kernel (reference `_shapely_diffclip_left`,
    overlay.py:605-698 + O7)."""
    withg, rid = _pairs_with_geoms(df1, df2, id1, id2, gridsize)
    id1_t = [f.dataType.simpleString() for f in df1.schema.fields
             if f.name == id1][0]
    schema = f"{id1} {id1_t}, geometry binary"

    def erase_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        la = from_wkb(pdf["__g1"].iloc[:1].tolist())
        cur = _parts_of(la, 0)
        ra = from_wkb(pdf["__g2"].tolist())
        for k in range(len(pdf)):
            if not cur:
                break
            cur = polygon_boolean(cur, _parts_of(ra, k), "difference")
        wkb = _parts_to_wkb(cur) if cur else None
        if wkb is None:
            return pd.DataFrame({id1: [], "geometry": []})
        return pd.DataFrame({id1: [key[0]], "geometry": [wkb]})

    erased = withg.groupBy(id1).applyInPandas(erase_group, schema=schema)
    untouched = df1.join(withg.select(id1).distinct(), id1, "left_anti") \
                   .select(id1, "geometry")
    return erased.unionByName(untouched)


def _suffix_attrs(df: DataFrame, id_col: str, collided: set[str],
                  suffix: str) -> DataFrame:
    for c in _attr_cols(df, id_col):
        if c in collided:
            df = df.withColumnRenamed(c, c + suffix)
    return df


def clean_overlay(df1: DataFrame, df2: DataFrame, how: str = "intersection", *,
                  id1: str, id2: str, lsuffix: str = "_1", rsuffix: str = "_2",
                  gridsize: float = 2000.0) -> DataFrame:
    """Overlay df1 x df2 (polygon layers with unique ids + bbox columns).

    Returns attribute columns of the participating sides (collided names
    suffixed; `difference` => df1 schema only, unsuffixed) + geometry WKB.
    Empty results are dropped (clean_geoms semantics, general.py:161-250).
    """
    if how not in HOWS:
        raise ValueError(f"how must be one of {HOWS}")  # overlay.py:96-103

    a1 = _attr_cols(df1, id1)
    a2 = _attr_cols(df2, id2)
    collided = set(a1) & set(a2)

    if how == "difference":
        geo = _difference_rows(df1, df2, id1, id2, gridsize)
        return df1.drop("geometry", *_BBOX).join(geo, id1, "inner")

    d1s = _suffix_attrs(df1.drop("geometry", *_BBOX), id1, collided, lsuffix)
    d2s = _suffix_attrs(df2.drop("geometry", *_BBOX), id2, collided, rsuffix)

    def with_attrs_inter(rows):
        rid = rows.columns[1]
        out = rows.join(d1s, id1, "inner")
        d2j = d2s.withColumnRenamed(id2, rid) if rid != id2 else d2s
        return out.join(d2j, rid, "inner")

    def with_attrs_left(rows):
        return rows.join(d1s, id1, "inner")

    def with_attrs_right(rows):
        return rows.join(d2s, id2, "inner")

    if how == "intersection":
        return with_attrs_inter(_intersection_rows(df1, df2, id1, id2, gridsize))
    if how == "identity":
        inter = with_attrs_inter(_intersection_rows(df1, df2, id1, id2, gridsize))
        diff = with_attrs_left(_difference_rows(df1, df2, id1, id2, gridsize))
        return inter.unionByName(diff, allowMissingColumns=True)
    if how == "symmetric_difference":
        dl = with_attrs_left(_difference_rows(df1, df2, id1, id2, gridsize))
        dr = with_attrs_right(_difference_rows(df2, df1, id2, id1, gridsize))
        return dl.unionByName(dr, allowMissingColumns=True)
    if how == "union":
        inter = with_attrs_inter(_intersection_rows(df1, df2, id1, id2, gridsize))
        dl = with_attrs_left(_difference_rows(df1, df2, id1, id2, gridsize))
        dr = with_attrs_right(_difference_rows(df2, df1, id2, id1, gridsize))
        return inter.unionByName(dl, allowMissingColumns=True) \
                    .unionByName(dr, allowMissingColumns=True)
    # update (overlay.py:371-391): df1 erased by df2, then all of df2
    diff = df1.drop("geometry", *_BBOX).join(
        _difference_rows(df1, df2, id1, id2, gridsize), id1, "inner")
    return diff.unionByName(df2.drop(*_BBOX), allowMissingColumns=True)


def get_intersections(df: DataFrame, *, id_col: str,
                      gridsize: float = 2000.0) -> DataFrame:
    """Self-intersection surfaces (duplicates.py:189-404): pairwise
    intersections of distinct rows (each unordered pair once)."""
    rows = _intersection_rows(df, df, id_col, id_col, gridsize)
    rid = rows.columns[1]
    return rows.where(F.col(id_col) < F.col(rid))


def update_geometries(df: DataFrame, *, id_col: str, rank_col: str,
                      gridsize: float = 2000.0) -> DataFrame:
    """Priority coverage (duplicates.py:28-186): each geometry erased by the
    union of all higher-priority (lower rank) intersecting geometries.
    Rank must be an explicit column — Spark has no row order (SURVEY §7.4.2);
    sort_large_first = rank by area desc before calling."""
    pairs = sjoin_pairs(df, df, "intersects", left_id=id_col, right_id=id_col,
                        gridsize=gridsize)
    rid = pairs.columns[1]
    ranks = df.select(F.col(id_col), F.col(rank_col))
    pr = pairs.join(ranks.withColumnRenamed(rank_col, "__lrank"), id_col) \
              .join(ranks.withColumnRenamed(id_col, rid)
                    .withColumnRenamed(rank_col, "__rrank"), rid) \
              .where(F.col("__lrank") > F.col("__rrank"))
    g1 = df.select(F.col(id_col), F.col("geometry").alias("__g1"))
    g2 = df.select(F.col(id_col).alias(rid), F.col("geometry").alias("__g2"))
    withg = pr.join(g1, id_col).join(g2, rid)
    id_t = [f.dataType.simpleString() for f in df.schema.fields
            if f.name == id_col][0]
    schema = f"{id_col} {id_t}, geometry binary"

    def erase_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        la = from_wkb(pdf["__g1"].iloc[:1].tolist())
        cur = _parts_of(la, 0)
        ra = from_wkb(pdf["__g2"].tolist())
        order = np.argsort(pdf["__rrank"].to_numpy(), kind="stable")
        for k in order:
            if not cur:
                break
            cur = polygon_boolean(cur, _parts_of(ra, int(k)), "difference")
        wkb = _parts_to_wkb(cur) if cur else None
        if wkb is None:
            return pd.DataFrame({id_col: [], "geometry": []})
        return pd.DataFrame({id_col: [key[0]], "geometry": [wkb]})

    erased = withg.groupBy(id_col).applyInPandas(erase_group, schema=schema)
    untouched = df.join(withg.select(id_col).distinct(), id_col, "left_anti") \
                  .select(id_col, "geometry")
    geo = erased.unionByName(untouched)
    return df.drop("geometry", *_BBOX).join(geo, id_col, "inner")
