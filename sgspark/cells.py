"""Deterministic grid-cell encoding — the engine's spatial partition key.

Re-expresses the reference's SSB national grid arithmetic
(`/root/reference/src/sgis/geopandas_tools/bounds.py:563-571,599-605`):

    ssb_rute_id = str(int(floor((x + 2_000_000) / g) * g))
                + str(int(floor(y / g) * g))

as (a) that exact string id for `add_grid_id` parity, and (b) a compact
int64 cell key `cell_key = cx * 2**25 + cy` (cx = floor((x+2e6)/g),
cy = floor(y/g)) used as the shuffle/join key.  2**25 rows of y-cells is
enough for gridsize >= 1 over any national CRS extent; the encoding is pure
arithmetic, order-free, and identical on driver/executors — the properties
the north rule wants from an H3/S2-style index.  The module is pluggable:
everything downstream only needs `point_cell_key`, `cover_cell_keys` and
`neighbors`.

All functions are numpy-vectorized (used inside Arrow-batched UDFs) and have
Spark-SQL twin expressions in sgspark/tiling.py so tile assignment can run
entirely JVM-side with no Python at all.
"""

from __future__ import annotations

import numpy as np

FALSE_EASTING = 2_000_000
Y_BITS = 25  # cy < 2**25 for y < 33M*gridsize


def cell_xy(x: np.ndarray, y: np.ndarray, gridsize: float) -> tuple[np.ndarray, np.ndarray]:
    cx = np.floor((np.asarray(x, dtype=np.float64) + FALSE_EASTING) / gridsize).astype(np.int64)
    cy = np.floor(np.asarray(y, dtype=np.float64) / gridsize).astype(np.int64)
    return cx, cy


def key_from_cxcy(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    # Arithmetic (NOT bitwise-or) so numpy keys equal the Spark-SQL twin
    # expressions `cx * 2^25 + cy` exactly — including for negative cy
    # (southern-hemisphere / local CRS data).  cx*M+cy is a bijection
    # Z^2 -> Z under floor semantics, and neighbor offsets compose as plain
    # key arithmetic: key(cx+dx, cy+dy) = key + dx*M + dy.
    return cx.astype(np.int64) * np.int64(1 << Y_BITS) + cy.astype(np.int64)


def point_cell_key(x: np.ndarray, y: np.ndarray, gridsize: float) -> np.ndarray:
    cx, cy = cell_xy(x, y, gridsize)
    return key_from_cxcy(cx, cy)


def ssb_rute_id(x: np.ndarray, y: np.ndarray, gridsize: int) -> np.ndarray:
    """Exact string id of the reference (`bounds.py:563-571`)."""
    cx, cy = cell_xy(x, y, gridsize)
    gx = (cx * int(gridsize)).astype(np.int64)
    gy = (cy * int(gridsize)).astype(np.int64)
    return np.char.add(gx.astype("U20"), gy.astype("U20"))


def cover_cell_keys(minx, miny, maxx, maxy, gridsize: float,
                    max_cells_per_geom: int = 4096):
    """Cell keys covering each bbox (vectorized ragged expansion).

    Returns (geom_idx int64[k], cell_key int64[k]).  Coverage is by bbox —
    candidate generation only; exactness comes from the refine kernel.
    A bbox wider than `max_cells_per_geom` cells raises: at scale such rows
    must be cut (or routed to a broadcast path) rather than exploded.
    """
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    cx0, cy0 = cell_xy(minx, miny, gridsize)
    cx1, cy1 = cell_xy(maxx, maxy, gridsize)
    nx = (cx1 - cx0 + 1).clip(min=0)
    ny = (cy1 - cy0 + 1).clip(min=0)
    ncells = nx * ny
    if len(ncells) and int(ncells.max()) > max_cells_per_geom:
        raise ValueError(
            f"geometry bbox covers {int(ncells.max())} cells "
            f"(> {max_cells_per_geom}); increase gridsize or pre-cut geometries")
    total = int(ncells.sum())
    geom_idx = np.repeat(np.arange(len(ncells), dtype=np.int64), ncells)
    # within-geom flat cell ordinal 0..ncells-1, vectorized
    firsts = np.zeros(total, dtype=np.int64)
    if total:
        starts = np.zeros(len(ncells) + 1, dtype=np.int64)
        np.cumsum(ncells, out=starts[1:])
        ordinal = np.arange(total, dtype=np.int64) - starts[:-1][geom_idx]
        gx = cx0[geom_idx] + ordinal % np.maximum(nx[geom_idx], 1)
        gy = cy0[geom_idx] + ordinal // np.maximum(nx[geom_idx], 1)
        firsts = key_from_cxcy(gx, gy)
    return geom_idx, firsts


def anchor_cell_key(minx_l, miny_l, minx_r, miny_r, gridsize: float) -> np.ndarray:
    """The deduplication anchor: the cell containing the lower-left corner of
    the bbox-intersection of a candidate pair.  A pair is emitted from exactly
    one cell (the anchor), eliminating the global dropDuplicates shuffle the
    naive plan needs (reference dedups with np.unique after rtree query;
    we avoid generating duplicates at all)."""
    ax = np.maximum(minx_l, minx_r)
    ay = np.maximum(miny_l, miny_r)
    return point_cell_key(ax, ay, gridsize)


def neighbor_keys(key: np.ndarray, ring: int = 1) -> np.ndarray:
    """All cell keys within Chebyshev distance `ring` of each key.
    Returns int64[n, (2r+1)^2]."""
    key = np.asarray(key, dtype=np.int64)
    d = np.arange(-ring, ring + 1, dtype=np.int64)
    dx, dy = np.meshgrid(d, d, indexing="ij")
    off = dx.ravel() * np.int64(1 << Y_BITS) + dy.ravel()
    return key[:, None] + off[None, :]
