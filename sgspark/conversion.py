"""Constructors / conversions — the reference's to_gdf surface.

Reference: `to_gdf` and friends (`geopandas_tools/conversion.py:255-528`),
`random_points` / `random_points_in_polygons` (`general.py:422-541`),
`clean_geoms` (`general.py:161-250`), `bounds_to_polygon` /
`bounds_to_points` (`bounds.py:610-679`).

Randomness is counter-based (splitmix64 of (seed, row)) — order-free and
partitioning-independent, the only defensible definition of "random" on a
distributed engine.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .geom.array import POLYGON, from_rings, points as make_points
from .geom.wkb import from_wkb, to_wkb
from .synth import _splitmix64


def df_from_wkt(spark: SparkSession, wkts: list[str],
                ids: list | None = None) -> DataFrame:
    """to_gdf analogue for WKT lists (conversion.py:255-528)."""
    from .io import wkt_to_wkb_df
    pdf = pd.DataFrame({"row_id": ids if ids is not None
                        else list(range(len(wkts))),
                        "geometry_wkt": wkts})
    return wkt_to_wkb_df(spark.createDataFrame(pdf))


def df_from_xy(spark: SparkSession, xs, ys, ids=None) -> DataFrame:
    pdf = pd.DataFrame({"row_id": ids if ids is not None
                        else list(range(len(xs))),
                        "x": np.asarray(xs, float), "y": np.asarray(ys, float)})
    ga = make_points(np.stack([pdf.x, pdf.y], axis=1))
    pdf["geometry"] = to_wkb(ga)
    pdf["minx"] = pdf.x
    pdf["miny"] = pdf.y
    pdf["maxx"] = pdf.x
    pdf["maxy"] = pdf.y
    return spark.createDataFrame(pdf)


def to_gdf(spark: SparkSession, data, ids=None) -> DataFrame:
    """Universal constructor (reference to_gdf, conversion.py:255-528):
    accepts a list of WKT strings, WKB bytes, (x, y) tuples, a dict
    {id: wkt}, or a GeoJSON-ish dict list ({'type','coordinates'}).
    Returns (row_id, geometry, minx..maxy)."""
    if isinstance(data, dict):
        ids = list(data.keys())
        data = list(data.values())
    data = list(data)
    if not data:
        raise ValueError("to_gdf: empty input")
    first = data[0]
    if isinstance(first, str):
        return df_from_wkt(spark, data, ids)
    if isinstance(first, (bytes, bytearray)):
        from .io import with_bounds
        pdf = pd.DataFrame({"row_id": ids if ids is not None
                            else list(range(len(data))),
                            "geometry": data})
        return with_bounds(spark.createDataFrame(pdf))
    if isinstance(first, dict) and "type" in first:
        wkts = [_geojson_to_wkt(d) for d in data]
        return df_from_wkt(spark, wkts, ids)
    if hasattr(first, "__len__") and len(first) == 2:
        xs = [float(p[0]) for p in data]
        ys = [float(p[1]) for p in data]
        return df_from_xy(spark, xs, ys, ids)
    raise TypeError(f"to_gdf: unsupported element type {type(first)}")


def _geojson_to_wkt(d: dict) -> str:
    t = d["type"].upper()
    c = d["coordinates"]
    if t == "POINT":
        return f"POINT ({c[0]} {c[1]})"
    if t == "LINESTRING":
        pts = ", ".join(f"{p[0]} {p[1]}" for p in c)
        return f"LINESTRING ({pts})"
    if t == "POLYGON":
        rings = ", ".join(
            "(" + ", ".join(f"{p[0]} {p[1]}" for p in ring) + ")"
            for ring in c)
        return f"POLYGON ({rings})"
    raise ValueError(f"unsupported GeoJSON type {t}")


def bounds_to_points(df: DataFrame) -> DataFrame:
    """Replace geometry by the 4-corner MULTIPOINT of its bbox
    (bounds_to_points, bounds.py:653-679)."""
    from .geom.array import MULTIPOINT
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            parts_all = []
            for x0, y0, x1, y1 in zip(pdf.minx, pdf.miny, pdf.maxx,
                                      pdf.maxy):
                parts_all.append([np.array([[x0, y0]]), np.array([[x1, y0]]),
                                  np.array([[x1, y1]]), np.array([[x0, y1]])])
            ga = from_rings(parts_all, [MULTIPOINT] * len(pdf))
            out = pdf.copy()
            out["geometry"] = to_wkb(ga)
            yield out

    return df.mapInPandas(kernel, schema=schema)


def get_line_segments(df: DataFrame, geometry: str = "geometry"
                      ) -> DataFrame:
    """Explode every LineString into its 2-point segments (reference
    get_line_segments helper); adds `segment_idx`."""
    from .geom.array import LINESTRING
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields) + ", segment_idx int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ga = from_wkb(pdf[geometry].tolist())
            src, blobs, sidx = [], [], []
            for g in range(len(ga)):
                for chain in ga.rings_of_geom(g):
                    for i in range(len(chain) - 1):
                        src.append(g)
                        blobs.append(to_wkb(from_rings(
                            [[chain[i:i + 2]]], [LINESTRING]))[0])
                        sidx.append(i)
            if not src:
                continue
            out = pdf.iloc[src].copy()
            out[geometry] = blobs
            out["segment_idx"] = sidx
            yield out

    return df.mapInPandas(kernel, schema=schema)


def make_lines_between_points(a: DataFrame, b: DataFrame, *,
                              a_id: str, b_id: str) -> DataFrame:
    """LineStrings connecting paired points of two layers joined on id
    (reference make_lines_between_points helper): a and b each carry
    point geometry columns; pairs matched on a_id == b_id."""
    from .geom.array import LINESTRING
    l = a.select(F.col(a_id).alias("__id"), F.col("minx").alias("__ax"),
                 F.col("miny").alias("__ay"))
    r = b.select(F.col(b_id).alias("__id"), F.col("minx").alias("__bx"),
                 F.col("miny").alias("__by"))
    j = l.join(r, "__id")
    id_t = [f.dataType.simpleString() for f in a.schema.fields
            if f.name == a_id][0]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs = []
            for i in range(len(pdf)):
                chain = np.array([[pdf["__ax"].iloc[i], pdf["__ay"].iloc[i]],
                                  [pdf["__bx"].iloc[i], pdf["__by"].iloc[i]]])
                blobs.append(to_wkb(from_rings([[chain]], [LINESTRING]))[0])
            yield pd.DataFrame({a_id: pdf["__id"], "geometry": blobs})

    return j.mapInPandas(kernel, schema=f"{a_id} {id_t}, geometry binary")


def _u01(i: np.ndarray, field: int, seed: int) -> np.ndarray:
    base = i.astype(np.uint64) * np.uint64(2654435761) + \
        np.uint64((field * 0x9E3779B97F4A7C15 + seed) % (1 << 64))
    return (_splitmix64(base) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def random_points(spark: SparkSession, n: int, bounds: tuple,
                  seed: int = 42) -> DataFrame:
    """n uniform points in bounds (random_points, general.py:422-473),
    distributed + deterministic (counter-based)."""
    minx, miny, maxx, maxy = bounds

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            i = pdf["id"].to_numpy()
            x = minx + _u01(i, 1, seed) * (maxx - minx)
            y = miny + _u01(i, 2, seed) * (maxy - miny)
            ga = make_points(np.stack([x, y], axis=1))
            yield pd.DataFrame({"row_id": i, "x": x, "y": y,
                                "geometry": to_wkb(ga),
                                "minx": x, "miny": y, "maxx": x, "maxy": y})

    return spark.range(n).mapInPandas(
        gen, schema="row_id long, x double, y double, geometry binary, "
                    "minx double, miny double, maxx double, maxy double")


def random_points_in_polygons(df: DataFrame, n_per_poly: int, *,
                              seed: int = 42, id_col: str = "row_id",
                              max_tries: int = 64) -> DataFrame:
    """Rejection-sample n points inside each polygon
    (random_points_in_polygons, general.py:499-541) — per-row kernel,
    deterministic per (id, k, try)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .geom.predicates import points_in_polygon_geom
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ga = from_wkb(pdf["geometry"].tolist())
            b = ga.bounds()
            out_rows = []
            for g in range(len(ga)):
                need = n_per_poly
                got_x, got_y = [], []
                for t in range(max_tries):
                    if need <= 0:
                        break
                    m = need * 4
                    i = (np.arange(m, dtype=np.uint64) +
                         np.uint64(t * 1_000_003))
                    key = np.uint64(int(pdf[id_col].iloc[g]) % (1 << 32))
                    x = b[g, 0] + _u01(i + key, 3, seed) * (b[g, 2] - b[g, 0])
                    y = b[g, 1] + _u01(i + key, 4, seed) * (b[g, 3] - b[g, 1])
                    ok = points_in_polygon_geom(x, y, ga, g)
                    take = min(int(ok.sum()), need)
                    got_x.extend(x[ok][:take].tolist())
                    got_y.extend(y[ok][:take].tolist())
                    need -= take
                for k, (x, y) in enumerate(zip(got_x, got_y)):
                    out_rows.append((pdf[id_col].iloc[g], k, x, y))
            if out_rows:
                yield pd.DataFrame(out_rows,
                                   columns=[id_col, "pt_idx", "x", "y"])

    id_t = [f.dataType.simpleString() for f in df.schema.fields
            if f.name == id_col][0]
    return df.select(id_col, "geometry").mapInPandas(
        kernel, schema=f"{id_col} {id_t}, pt_idx int, x double, y double")


def clean_geoms(df: DataFrame, geometry: str = "geometry") -> DataFrame:
    """Drop null/empty geometries, close unclosed rings (clean_geoms,
    general.py:161-250; full GEOS make_valid is out of scope — the boolean
    kernels apply their own perturbation ladder instead)."""
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep, blobs = [], []
            ga = from_wkb(pdf[geometry].tolist())
            counts = ga.coords_count_per_geom()
            for g in range(len(ga)):
                if pdf[geometry].iloc[g] is None or counts[g] == 0:
                    continue
                keep.append(g)
                blobs.append(pdf[geometry].iloc[g])
            out = pdf.iloc[keep].copy()
            out[geometry] = blobs
            yield out

    return df.where(F.col(geometry).isNotNull()).mapInPandas(kernel, schema=schema)


def bounds_to_polygon(df: DataFrame) -> DataFrame:
    """Replace geometry by its bbox polygon (bounds.py:610-650)."""
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rings = []
            for x0, y0, x1, y1 in zip(pdf.minx, pdf.miny, pdf.maxx, pdf.maxy):
                rings.append([[np.array([[x0, y0], [x1, y0], [x1, y1],
                                         [x0, y1], [x0, y0]])]])
            ga = from_rings(rings, [POLYGON] * len(pdf))
            out = pdf.copy()
            out["geometry"] = to_wkb(ga)
            yield out

    return df.mapInPandas(kernel, schema=schema)


def get_total_bounds(df: DataFrame) -> tuple:
    """get_total_bounds (bounds.py:682-705)."""
    r = df.agg(F.min("minx"), F.min("miny"), F.max("maxx"), F.max("maxy")).first()
    return tuple(r)


def with_centroid(df: DataFrame, geometry: str = "geometry",
                  x_col: str = "cx", y_col: str = "cy") -> DataFrame:
    """Attach centroid coordinate columns (vectorized kernel)."""
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields) + \
        f", {x_col} double, {y_col} double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ga = from_wkb(pdf[geometry].tolist())
            c = ga.centroid()
            out = pdf.copy()
            out[x_col] = c[:, 0]
            out[y_col] = c[:, 1]
            yield out

    return df.mapInPandas(kernel, schema=schema)


def get_grouped_centroids(df: DataFrame, by: list[str], *,
                          label_col: str = "grouped_centroid",
                          geometry: str = "geometry") -> DataFrame:
    """Per-group centroid-of-centroids as a '{x}_{y}' string label, joined
    back onto every row (get_grouped_centroids, general.py:252-285)."""
    cent = with_centroid(df.select(*by, geometry), geometry)
    lab = (cent.groupBy(*by)
           .agg(F.avg("cx").alias("__gx"), F.avg("cy").alias("__gy"))
           .select(*by, F.concat_ws(
               "_", F.col("__gx").cast("bigint").cast("string"),
               F.col("__gy").cast("bigint").cast("string")).alias(label_col)))
    return df.join(lab, by, "left")


def sort_nans_last(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Rows with the most non-null attribute values first (sort_nans_last,
    helpers.py) — adds the null-count as a sortable column and orders by
    it; Spark's order is a total order with the extra tiebreak columns the
    caller supplies downstream."""
    cols = cols or [c for c in df.columns
                    if c not in ("geometry", "minx", "miny", "maxx", "maxy")]
    n_nulls = None
    for c in cols:
        e = F.col(c).isNull().cast("int")
        n_nulls = e if n_nulls is None else (n_nulls + e)
    return df.withColumn("__n_nulls", n_nulls).orderBy(F.col("__n_nulls")) \
             .drop("__n_nulls")


def points_in_bounds(spark, bounds: tuple, spacing: float) -> DataFrame:
    """Regular point grid inside a bbox (points_in_bounds,
    general.py:1124-1148) — pure SQL sequence x sequence, no Python."""
    x0, y0, x1, y1 = [float(v) for v in bounds]
    s = float(spacing)
    nx = int(np.floor((x1 - x0) / s))
    ny = int(np.floor((y1 - y0) / s))
    return (spark.range(nx + 1).selectExpr("id AS ix")
            .crossJoin(spark.range(ny + 1).selectExpr("id AS iy"))
            .selectExpr(f"{x0} + ix * {s} AS x", f"{y0} + iy * {s} AS y"))


def points_in_polygons(polys: DataFrame, spacing: float, *,
                       id_col: str, gridsize: float = 2000.0) -> DataFrame:
    """Point grid clipped to polygons (points_in_polygons,
    general.py:1124-1148): grid over total bounds, then the PIP join."""
    from .joins import sjoin_pairs
    from .io import with_bounds
    spark = polys.sparkSession
    b = get_total_bounds(polys)
    # pt_id from the INTEGER grid indices (ix * (ny+1) + iy) — collision-free
    # for any spacing; deriving it from truncated coordinates collides for
    # spacing < 1 and breaks sjoin_pairs' unique-id contract (round-2 advice).
    x0, y0, x1, y1 = [float(v) for v in b]
    s = float(spacing)
    ny = int(np.floor((y1 - y0) / s))
    pts = points_in_bounds(spark, b, spacing) \
        .withColumn("__ix", F.expr(f"cast(round((x - {x0}) / {s}) as bigint)")) \
        .withColumn("__iy", F.expr(f"cast(round((y - {y0}) / {s}) as bigint)")) \
        .withColumn("pt_id", F.expr(f"__ix * {ny + 1} + __iy")) \
        .drop("__ix", "__iy")
    pts_g = pts.selectExpr("pt_id", "x AS minx", "y AS miny",
                           "x AS maxx", "y AS maxy")
    # point rows need WKB geometry for the refine kernel
    from .geom.array import points as make_points
    from .geom.wkb import to_wkb as _to_wkb
    from typing import Iterator as _It

    def pk(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xy = np.stack([pdf["minx"].to_numpy(),
                           pdf["miny"].to_numpy()], axis=1)
            out = pdf.copy()
            out["geometry"] = _to_wkb(make_points(xy))
            yield out

    pts_g = pts_g.mapInPandas(
        pk, schema="pt_id bigint, minx double, miny double, maxx double, "
                   "maxy double, geometry binary")
    pairs = sjoin_pairs(pts_g, polys, "within", left_id="pt_id",
                        right_id=id_col, gridsize=gridsize)
    return pts.join(pairs, "pt_id").select("x", "y", id_col)


def sort_long_first(df: DataFrame, geometry: str = "geometry",
                    ascending: bool = False) -> DataFrame:
    """orderBy line length (sort_long_first / sort_short_first,
    general.py:287-393): adds `length_col` then sorts."""
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields) + ", length_col double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ga = from_wkb(pdf[geometry].tolist())
            out = pdf.copy()
            out["length_col"] = ga.length()
            yield out

    out = df.mapInPandas(kernel, schema=schema)
    order = F.col("length_col").asc() if ascending \
        else F.col("length_col").desc()
    return out.orderBy(order)


def sort_short_first(df: DataFrame, geometry: str = "geometry") -> DataFrame:
    return sort_long_first(df, geometry, ascending=True)


def sort_large_first(df: DataFrame, geometry: str = "geometry",
                     ascending: bool = False) -> DataFrame:
    """orderBy polygon area, descending (reference `sort_large_first`,
    general.py:287-344): adds `area_col` then sorts — the priority-setting
    preamble to update_geometries/coverage cleaning."""
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields) + ", area_col double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ga = from_wkb(pdf[geometry].tolist())
            out = pdf.copy()
            out["area_col"] = ga.area()
            yield out

    out = df.mapInPandas(kernel, schema=schema)
    order = F.col("area_col").asc() if ascending else F.col("area_col").desc()
    return out.orderBy(order)


def sort_small_first(df: DataFrame, geometry: str = "geometry") -> DataFrame:
    """reference `sort_small_first` (general.py:375-393)."""
    return sort_large_first(df, geometry, ascending=True)
