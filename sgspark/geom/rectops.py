"""Rectilinear set operations via coordinate compression — the exact fast
path for erase-by-many-rectangles.

The dominant overlay-difference workload is a polygon erased by a set of
AXIS-ALIGNED RECTANGLE partners (zone squares, grid cells).  Folding GH
differences (or unioning k rects with O(k^2) ring booleans — reference
`utils.py:10-14` union_all) is quadratic Python work per left row.  Instead:

  1. compress coordinates: xs/ys = sorted unique partner+window coords,
  2. mark covered slabs on the (len(xs)-1) x (len(ys)-1) grid (vectorized),
  3. trace the boundary loops of the uncovered region (exterior CCW rings +
     CW holes) with a deterministic left-most-turn edge follower.

Exact (no epsilon ladder), linear-ish in k, and the all-covered case — the
most common at scale — exits after step 2 with no tracing at all.

Reference parity: result geometry is topologically merged exactly like a
GEOS difference of rect inputs (`overlay.py:394-410`).
"""

from __future__ import annotations

import numpy as np


def _compress(window: tuple[float, float, float, float],
              rects: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """xs, ys breakpoints inside the window + covered[i, j] grid."""
    wx0, wy0, wx1, wy1 = window
    rx0 = np.clip(rects[:, 0], wx0, wx1)
    ry0 = np.clip(rects[:, 1], wy0, wy1)
    rx1 = np.clip(rects[:, 2], wx0, wx1)
    ry1 = np.clip(rects[:, 3], wy0, wy1)
    keep = (rx1 > rx0) & (ry1 > ry0)
    rx0, ry0, rx1, ry1 = rx0[keep], ry0[keep], rx1[keep], ry1[keep]
    xs = np.unique(np.concatenate([[wx0, wx1], rx0, rx1]))
    ys = np.unique(np.concatenate([[wy0, wy1], ry0, ry1]))
    covered = np.zeros((len(xs) - 1, len(ys) - 1), dtype=bool)
    i0 = np.searchsorted(xs, rx0)
    i1 = np.searchsorted(xs, rx1)
    j0 = np.searchsorted(ys, ry0)
    j1 = np.searchsorted(ys, ry1)
    for a, b, c, d in zip(i0, i1, j0, j1):  # k rects; slab fill vectorized
        covered[a:b, c:d] = True
    return xs, ys, covered


def _trace_region(xs: np.ndarray, ys: np.ndarray,
                  region: np.ndarray) -> list[np.ndarray]:
    """Boundary loops of a cell region (True = inside): CCW exteriors,
    CW holes, interior always on the LEFT of the walk.  Corner-touching
    cells are separated (left-most turn rule)."""
    nx, ny = region.shape
    pad = np.zeros((nx + 2, ny + 2), dtype=bool)
    pad[1:-1, 1:-1] = region
    # directed boundary edges keyed by start grid-node (i, j) in node coords
    # directions: E=(1,0), W=(-1,0), N=(0,1), S=(0,-1) over grid nodes
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(i, j, di, dj):
        edges.setdefault((i, j), []).append((di, dj))

    ii, jj = np.nonzero(region)
    for i, j in zip(ii.tolist(), jj.tolist()):
        if not pad[i + 1, j]:      # south neighbor empty -> bottom edge, +x
            add(i, j, 1, 0)
        if not pad[i + 1, j + 2]:  # north -> top edge, -x
            add(i + 1, j + 1, -1, 0)
        if not pad[i, j + 1]:      # west -> left edge, -y
            add(i, j + 1, 0, -1)
        if not pad[i + 2, j + 1]:  # east -> right edge, +y
            add(i + 1, j, 0, 1)

    loops: list[np.ndarray] = []
    # deterministic start order
    for start in sorted(edges.keys()):
        while edges.get(start):
            d = edges[start].pop()
            loop_nodes = [start]
            cur = (start[0] + d[0], start[1] + d[1])
            prev_d = d
            while cur != start:
                loop_nodes.append(cur)
                cands = edges.get(cur)
                if not cands:
                    break  # malformed; abandon (cannot happen for valid grids)
                # left-most turn relative to incoming direction keeps the
                # interior connected and separates corner-touching cells
                best, best_score = None, -10
                for k, (di, dj) in enumerate(cands):
                    cross = prev_d[0] * dj - prev_d[1] * di
                    dot = prev_d[0] * di + prev_d[1] * dj
                    score = 2 * cross + dot  # left turn > straight > right
                    if score > best_score:
                        best, best_score = k, score
                d2 = cands.pop(best)
                prev_d = d2
                cur = (cur[0] + d2[0], cur[1] + d2[1])
            if len(loop_nodes) >= 4 and cur == start:
                arr = np.array(loop_nodes + [start], dtype=np.int64)
                ring = np.stack([xs[arr[:, 0]], ys[arr[:, 1]]], axis=1)
                # drop collinear midpoints (vectorized)
                a = ring[:-1]
                b = np.vstack([ring[1:-1], ring[0:1]])
                prv = np.vstack([ring[-2:-1], ring[:-2]])
                crossz = ((a[:, 0] - prv[:, 0]) * (b[:, 1] - a[:, 1])
                          - (a[:, 1] - prv[:, 1]) * (b[:, 0] - a[:, 0]))
                keep = crossz != 0
                core = a[keep]
                if len(core) >= 3:
                    loops.append(np.vstack([core, core[:1]]))
    return loops


def rect_minus_rects(window: tuple[float, float, float, float],
                     rects: np.ndarray) -> list[list[np.ndarray]] | None:
    """window rectangle minus union of rects.  Returns polygon parts
    ([[ext, hole...], ...], CCW ext / CW holes) or None when nothing
    remains.  Exact rectilinear arithmetic — no epsilon ladder."""
    xs, ys, covered = _compress(window, np.asarray(rects, dtype=np.float64))
    residual = ~covered
    if not residual.any():
        return None
    if covered.size and not covered.any():
        wx0, wy0, wx1, wy1 = window
        return [[np.array([[wx0, wy0], [wx1, wy0], [wx1, wy1],
                           [wx0, wy1], [wx0, wy0]], dtype=np.float64)]]
    loops = _trace_region(xs, ys, residual)
    return _loops_to_parts(loops)


def rects_union_parts(window: tuple[float, float, float, float],
                      rects: np.ndarray) -> list[list[np.ndarray]]:
    """Union of rects CLIPPED to window, as merged rectilinear polygons."""
    xs, ys, covered = _compress(window, np.asarray(rects, dtype=np.float64))
    if not covered.any():
        return []
    loops = _trace_region(xs, ys, covered)
    return _loops_to_parts(loops)


def _loops_to_parts(loops: list[np.ndarray]) -> list[list[np.ndarray]]:
    from .clip import ring_area, rings_to_polygons
    # _trace_region orients interiors left: exteriors CCW, holes CW already
    return rings_to_polygons(loops)
