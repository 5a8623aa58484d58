"""Raster <-> vector: tiled raster table + zonal statistics.

Reference: `Band.zonal` (`/root/reference/src/sgis/raster/image_collection.py:
1356-1403` + `raster/zonal.py:13-83`) — per polygon, mask raster pixels and
aggregate; `Band.to_geopandas` (one row per pixel, image_collection.py:
1405-1438).

Spark model (SURVEY.md §1.5/§2.9): a raster is a TABLE of tiles
(tile_id, x0, y0, res, nx, ny, values float[]), values row-major from the
tile origin, pixel centers at (x0 + (col+0.5)*res, y0 + (row+0.5)*res).
Zonal = tile⋈polygon cell join + per-pair masked PARTIAL aggregates
(count/sum/min/max — composable), then groupBy(polygon) finalize — the
two-phase aggregation that makes polygons spanning many tiles scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .cells import FALSE_EASTING, Y_BITS
from .geom.predicates import points_in_polygon_geom
from .geom.wkb import from_wkb


def synth_raster_tiles(spark: SparkSession, minx: float, miny: float,
                       maxx: float, maxy: float, tile_size: float = 1000.0,
                       res: float = 10.0) -> DataFrame:
    """Deterministic synthetic raster (FIXTURES.md §F5):
    value(x, y) = sin(x/500) + cos(y/700) at pixel centers — reproducible
    anywhere without storing data."""
    nx_tiles = int(np.ceil((maxx - minx) / tile_size))
    ny_tiles = int(np.ceil((maxy - miny) / tile_size))
    n = int(tile_size / res)
    idx = spark.range(nx_tiles * ny_tiles)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tid in pdf["id"].tolist():
                tx = tid % nx_tiles
                ty = tid // nx_tiles
                x0 = minx + tx * tile_size
                y0 = miny + ty * tile_size
                cx = x0 + (np.arange(n) + 0.5) * res
                cy = y0 + (np.arange(n) + 0.5) * res
                vals = (np.sin(cx[None, :] / 500.0) +
                        np.cos(cy[:, None] / 700.0)).astype(np.float64)
                rows.append((f"{int(x0)}_{int(y0)}", float(x0), float(y0),
                             float(res), n, n, vals.ravel().tolist()))
            yield pd.DataFrame(rows, columns=["tile_id", "x0", "y0", "res",
                                              "nx", "ny", "values"])

    return idx.mapInPandas(
        gen, schema="tile_id string, x0 double, y0 double, res double, "
                    "nx int, ny int, values array<double>")


def zonal_stats(polygons: DataFrame, tiles: DataFrame, *,
                id_col: str = "zone_id",
                stats: tuple = ("count", "sum", "min", "max", "mean"),
                gridsize: float = 1000.0) -> DataFrame:
    """Zonal statistics of the tiled raster inside each polygon.

    Plan: polygons explode to covering cells (pure SQL) ⋈ tiles on cell_key
    → Arrow kernel computes per-(polygon, tile) partial aggregates with a
    vectorized point-in-polygon mask → groupBy(polygon) combines partials.
    """
    p = polygons.select(F.col(id_col), "geometry", "minx", "miny",
                        "maxx", "maxy")
    g = float(gridsize)
    p = (p.withColumn("__cx", F.explode(F.expr(
            f"sequence(cast(floor((minx + {FALSE_EASTING}) / {g}) as bigint), "
            f"cast(floor((maxx + {FALSE_EASTING}) / {g}) as bigint))")))
         .withColumn("__cy", F.explode(F.expr(
            f"sequence(cast(floor(miny / {g}) as bigint), "
            f"cast(floor(maxy / {g}) as bigint))")))
         .withColumn("cell_key", F.expr(f"__cx * {1 << Y_BITS} + __cy"))
         .drop("__cx", "__cy"))
    # tiles explode to ALL cells of their extent (x0..x0+nx*res, y0..y0+ny*res)
    # — keying by the centre cell alone silently loses pixels whenever a tile
    # is not aligned to / sized like the zonal grid.  A (polygon, tile) pair
    # can then meet in several cells, so dedup with the anchor-cell rule
    # (keep only the cell containing the lower-left corner of the bbox
    # intersection) — pure JVM, no extra shuffle.
    t = (tiles
         .withColumn("__tx1", F.expr("x0 + nx * res"))
         .withColumn("__ty1", F.expr("y0 + ny * res"))
         .withColumn("__tcx", F.explode(F.expr(
            f"sequence(cast(floor((x0 + {FALSE_EASTING}) / {g}) as bigint), "
            f"cast(floor((__tx1 + {FALSE_EASTING}) / {g}) as bigint))")))
         .withColumn("__tcy", F.explode(F.expr(
            f"sequence(cast(floor(y0 / {g}) as bigint), "
            f"cast(floor(__ty1 / {g}) as bigint))")))
         .withColumn("cell_key", F.expr(f"__tcx * {1 << Y_BITS} + __tcy"))
         .drop("__tcx", "__tcy"))
    cand = (p.join(t, "cell_key")
            .where(F.expr(
                f"cell_key = cast(floor((greatest(minx, x0) + {FALSE_EASTING})"
                f" / {g}) as bigint) * {1 << Y_BITS}"
                f" + cast(floor(greatest(miny, y0) / {g}) as bigint)"))
            .drop("__tx1", "__ty1"))

    id_t = [f.dataType.simpleString() for f in polygons.schema.fields
            if f.name == id_col][0]
    schema = (f"{id_col} {id_t}, n long, s double, mn double, mx double")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes, uniq = pd.factorize(pdf["geometry"], use_na_sentinel=False)
            ga = from_wkb(list(uniq))
            out = []
            for i in range(len(pdf)):
                n = int(pdf["nx"].iloc[i])
                m = int(pdf["ny"].iloc[i])
                res = float(pdf["res"].iloc[i])
                x0 = float(pdf["x0"].iloc[i])
                y0 = float(pdf["y0"].iloc[i])
                vals = np.asarray(pdf["values"].iloc[i], dtype=np.float64)
                px = x0 + (np.arange(n) + 0.5) * res
                py = y0 + (np.arange(m) + 0.5) * res
                PX = np.broadcast_to(px[None, :], (m, n)).ravel()
                PY = np.broadcast_to(py[:, None], (m, n)).ravel()
                mask = points_in_polygon_geom(PX, PY, ga, int(codes[i]))
                v = vals[mask]
                v = v[~np.isnan(v)]
                if len(v) == 0:
                    continue
                out.append((pdf[id_col].iloc[i], len(v), float(v.sum()),
                            float(v.min()), float(v.max())))
            if out:
                yield pd.DataFrame(out, columns=[id_col, "n", "s", "mn", "mx"])

    partials = cand.mapInPandas(kernel, schema=schema)
    agg = partials.groupBy(id_col).agg(
        F.sum("n").alias("count"), F.sum("s").alias("sum"),
        F.min("mn").alias("min"), F.max("mx").alias("max"))
    if "mean" in stats:
        agg = agg.withColumn("mean", F.col("sum") / F.col("count"))
    keep = [id_col] + [s for s in
                       ("count", "sum", "min", "max", "mean") if s in stats]
    return agg.select(*keep)


def band_gradient(tiles: DataFrame) -> DataFrame:
    """Per-tile slope magnitude (reference `Band.gradient`,
    image_collection.py:1302-1355): central-difference gradient over the
    tile's grid.  Tile-local (1-pixel halo across tiles is future work —
    boundary pixels use one-sided differences)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            grads = []
            for i in range(len(pdf)):
                n = int(pdf["nx"].iloc[i])
                m = int(pdf["ny"].iloc[i])
                res = float(pdf["res"].iloc[i])
                v = np.asarray(pdf["values"].iloc[i],
                               dtype=np.float64).reshape(m, n)
                gy, gx = np.gradient(v, res)
                grads.append(np.hypot(gx, gy).ravel().tolist())
            out["values"] = grads
            yield out

    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in tiles.schema.fields)
    return tiles.mapInPandas(kernel, schema=schema)


def merge_tiles(tiles: DataFrame, by: list[str], how: str = "mean"
                ) -> DataFrame:
    """Merge raster tiles that share (by) keys + the same tile_id —
    reference `ImageCollectionGroupBy.merge/merge_by_band`
    (image_collection.py:271-390): element-wise mean/median/max across
    images of the same tile."""
    group = by + ["tile_id", "x0", "y0", "res", "nx", "ny"]
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in tiles.schema.fields if f.name in group) + \
        ", values array<double>"

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        arrs = np.stack([np.asarray(v, dtype=np.float64)
                         for v in pdf["values"]])
        if how == "mean":
            v = arrs.mean(axis=0)
        elif how == "median":
            v = np.median(arrs, axis=0)
        elif how == "max":
            v = arrs.max(axis=0)
        elif how == "min":
            v = arrs.min(axis=0)
        else:
            raise ValueError(how)
        row = {c: [k] for c, k in zip(group, key)}
        row["values"] = [v.tolist()]
        return pd.DataFrame(row)

    return tiles.groupBy(*group).applyInPandas(merge, schema=schema)


def raster_to_points(tiles: DataFrame) -> DataFrame:
    """`Band.to_geopandas` analogue: one row per pixel (x, y, value)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in range(len(pdf)):
                n = int(pdf["nx"].iloc[i])
                m = int(pdf["ny"].iloc[i])
                res = float(pdf["res"].iloc[i])
                x0 = float(pdf["x0"].iloc[i])
                y0 = float(pdf["y0"].iloc[i])
                vals = np.asarray(pdf["values"].iloc[i], dtype=np.float64)
                px = x0 + (np.arange(n) + 0.5) * res
                py = y0 + (np.arange(m) + 0.5) * res
                yield pd.DataFrame({
                    "tile_id": pdf["tile_id"].iloc[i],
                    "x": np.broadcast_to(px[None, :], (m, n)).ravel(),
                    "y": np.broadcast_to(py[:, None], (m, n)).ravel(),
                    "value": vals})

    return tiles.mapInPandas(
        kernel, schema="tile_id string, x double, y double, value double")
