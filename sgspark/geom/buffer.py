"""Buffer kernels (pure numpy).

The reference buffers with GEOS (`buffer_dissolve_explode.py:523-558`,
resolution=30 quad segments; `neighbors.py:130-138` buffers the left side for
max_distance joins).  Without GEOS we provide:

  * point buffer  — exact regular 4*quad_segs-gon inscribed approximation of
    the circle, same discretization contract as GEOS (vertices ON the circle).
  * convex ring fast paths — edge offset + circular arcs (positive) and
    exact half-plane erosion (negative), no trimming pass needed;
  * the general trimmed-offset kernel (geom/offset.py) for concave / holed
    polygons and lines — raw offset curve, exact self-crossing insertion,
    distance-based trimming, loop tracing (the GEOS buffer construction
    re-expressed in numpy).
"""

from __future__ import annotations

import numpy as np

from .array import (GeomArray, MULTIPOLYGON, POLYGON, from_rings,
                    points as make_points)


def point_buffer(xy: np.ndarray, radius, quad_segs: int = 30) -> GeomArray:
    """Buffer n points into n regular polygons. radius scalar or float64[n]."""
    xy = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
    n = len(xy)
    m = 4 * quad_segs
    radius = np.broadcast_to(np.asarray(radius, dtype=np.float64), (n,))
    ang = np.linspace(0.0, 2.0 * np.pi, m, endpoint=False)
    ux, uy = np.cos(ang), np.sin(ang)
    px = xy[:, 0:1] + radius[:, None] * ux[None, :]
    py = xy[:, 1:2] + radius[:, None] * uy[None, :]
    # close rings
    coords = np.empty((n, m + 1, 2), dtype=np.float64)
    coords[:, :m, 0] = px
    coords[:, :m, 1] = py
    coords[:, m] = coords[:, 0]
    flat = coords.reshape(-1, 2)
    ring_offsets = np.arange(0, (n + 1) * (m + 1), m + 1, dtype=np.int64)
    one = np.arange(n + 1, dtype=np.int64)
    return GeomArray(np.full(n, POLYGON, dtype=np.int8), flat,
                     ring_offsets, one.copy(), one.copy())


def _is_convex_ccw(ring: np.ndarray) -> bool:
    r = ring[:-1]
    a = np.roll(r, -1, axis=0) - r
    b = np.roll(a, -1, axis=0)
    cross = a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]
    return bool((cross >= 0).all())


def convex_ring_buffer(ring: np.ndarray, dist: float, quad_segs: int = 8) -> np.ndarray:
    """Positive buffer of one convex CCW ring: offset edges outward, join
    with arcs at vertices. Returns a closed ring."""
    r = ring[:-1]
    nxt = np.roll(r, -1, axis=0)
    e = nxt - r
    ln = np.hypot(e[:, 0], e[:, 1])
    keep = ln > 0
    r, nxt, e, ln = r[keep], nxt[keep], e[keep], ln[keep]
    # outward normal for CCW ring = (dy, -dx)/len
    nrm = np.stack([e[:, 1] / ln, -e[:, 0] / ln], axis=1)
    p_start = r + dist * nrm
    p_end = nxt + dist * nrm
    out = []
    n = len(r)
    for i in range(n):
        out.append(p_start[i])
        out.append(p_end[i])
        # arc at vertex nxt[i] from normal i to normal i+1
        n0 = nrm[i]
        n1 = nrm[(i + 1) % n]
        a0 = np.arctan2(n0[1], n0[0])
        a1 = np.arctan2(n1[1], n1[0])
        sweep = a1 - a0
        while sweep > 0:
            sweep -= 2 * np.pi  # CCW ring turns clockwise in normal angle? keep shortest negative
        while sweep < -np.pi:
            sweep += 2 * np.pi
        # exterior angle of convex CCW ring: normals rotate CCW; recompute properly
        sweep = a1 - a0
        while sweep < 0:
            sweep += 2 * np.pi
        if sweep > np.pi:  # reflex would mean concave; clamp
            sweep -= 2 * np.pi
        steps = max(int(np.ceil(abs(sweep) / (np.pi / 2 / quad_segs))), 1)
        angs = a0 + sweep * np.arange(1, steps) / steps
        for a in angs:
            out.append(nxt[i] + dist * np.array([np.cos(a), np.sin(a)]))
    out.append(out[0])
    return np.asarray(out)


def convex_ring_erode(ring: np.ndarray, dist: float) -> np.ndarray | None:
    """NEGATIVE buffer (erosion) of one convex CCW ring — exact: the erosion
    of a convex polygon is the intersection of its edges' inward-offset
    half-planes.  Implemented as successive half-plane clips.  Returns a
    closed ring or None if the erosion is empty (polygon thinner than
    2*dist)."""
    r = ring[:-1]
    nxt = np.roll(r, -1, axis=0)
    e = nxt - r
    ln = np.hypot(e[:, 0], e[:, 1])
    keep = ln > 0
    r, nxt, e, ln = r[keep], nxt[keep], e[keep], ln[keep]
    # inward normal for CCW ring = (-dy, dx)/len
    nrm = np.stack([-e[:, 1] / ln, e[:, 0] / ln], axis=1)
    poly = ring[:-1].copy()
    for i in range(len(r)):
        a = r[i] + dist * nrm[i]
        d = e[i]
        # keep points on the left of the offset edge (inside half-plane)
        out = []
        n = len(poly)
        if n == 0:
            return None
        side = d[0] * (poly[:, 1] - a[1]) - d[1] * (poly[:, 0] - a[0])
        for j in range(n):
            k = (j + 1) % n
            cur_in, nxt_in = side[j] >= 0, side[k] >= 0
            if cur_in:
                out.append(poly[j])
            if cur_in != nxt_in:
                denom = side[j] - side[k]
                t = side[j] / denom if denom != 0 else 0.0
                out.append(poly[j] + t * (poly[k] - poly[j]))
        poly = np.asarray(out) if out else np.zeros((0, 2))
    if len(poly) < 3:
        return None
    x, y = poly[:, 0], poly[:, 1]
    if abs(float((x * np.roll(y, -1) - np.roll(x, -1) * y).sum())) == 0.0:
        return None
    return np.vstack([poly, poly[:1]])


def _parts_of(ga: GeomArray, g: int) -> list[list[np.ndarray]]:
    parts = []
    p0, p1 = ga.geom_offsets[g], ga.geom_offsets[g + 1]
    for p in range(p0, p1):
        r0, r1 = ga.part_offsets[p], ga.part_offsets[p + 1]
        parts.append([ga.coords[ga.ring_offsets[r]:ga.ring_offsets[r + 1]]
                      for r in range(r0, r1)])
    return parts


def buffer(ga: GeomArray, dist, quad_segs: int = 30) -> GeomArray:
    """Buffer a GeomArray — ALL geometry families (reference `buff`,
    buffer_dissolve_explode.py:523-558, resolution=quad_segs).

      points                exact 4*quad_segs-gon (vertices ON the circle)
      convex hole-free      offset+arc (positive) / exact half-plane
      polygons              erosion (negative) — no trimming pass needed
      concave / holed       trimmed-offset kernel (geom/offset.py): raw
      polygons, any sign    offset curve + exact self-crossing split +
                            distance trim; holes erode/dilate per ring
      lines (positive)      trimmed-offset with round caps and joins

    Geometries whose (negative) buffer is empty are dropped to empty
    polygons, like GEOS."""
    from .offset import buffer_polygon, dilate_line
    from .clip import union_many
    from . import array as _arr

    dist = np.broadcast_to(np.asarray(dist, dtype=np.float64), (len(ga),))
    kinds = ga.kinds
    counts = ga.coords_count_per_geom()
    if bool((counts == 1).all()) and bool((dist >= 0).all()):
        starts = ga.coords_start_per_geom()
        return point_buffer(ga.coords[starts], dist, quad_segs)
    ring_lists, out_kinds = [], []
    for g in range(len(ga)):
        d = float(dist[g])
        kind = int(kinds[g])
        if counts[g] == 1 or kind in (_arr.POINT, _arr.MULTIPOINT):
            if d <= 0:
                ring_lists.append([])
                out_kinds.append(POLYGON)
                continue
            pts_xy = np.concatenate(ga.rings_of_geom(g))
            pb = point_buffer(pts_xy, d, quad_segs)
            parts = [[pb.coords[pb.ring_offsets[k]:pb.ring_offsets[k + 1]]]
                     for k in range(len(pts_xy))]
            if len(parts) > 1:
                parts = union_many(parts)
            ring_lists.append(parts)
            out_kinds.append(POLYGON if len(parts) == 1 else MULTIPOLYGON)
            continue
        if kind in (_arr.LINESTRING, _arr.MULTILINESTRING):
            if d <= 0:
                ring_lists.append([])
                out_kinds.append(POLYGON)
                continue
            # dilate_line returns CCW shells AND CW loops for holes the
            # buffer sealed off (near-closed polylines).  Nest CW loops as
            # interior rings of their containing shell (like the polygon
            # path) BEFORE unioning, else a sealed hole is dropped.
            from .clip import rings_to_polygons
            loops = []
            for line in ga.rings_of_geom(g):
                loops.extend(dilate_line(line, d, quad_segs))
            parts = rings_to_polygons(loops)
            if len(parts) > 1:
                parts = union_many(parts)
            ring_lists.append(parts)
            out_kinds.append(POLYGON if len(parts) == 1 else MULTIPOLYGON)
            continue
        # polygon families
        rings = ga.rings_of_geom(g)
        n_parts = int(ga.geom_offsets[g + 1] - ga.geom_offsets[g])
        if n_parts == 1 and len(rings) == 1:
            ext = rings[0]
            x, y = ext[:-1, 0], ext[:-1, 1]
            area2 = float((x * np.roll(y, -1) - np.roll(x, -1) * y).sum())
            if area2 < 0:
                ext = ext[::-1]
            if _is_convex_ccw(ext):
                # exact convex fast paths — no trimming pass
                if d < 0:
                    er = convex_ring_erode(ext, -d)
                    ring_lists.append([[er]] if er is not None else [])
                else:
                    ring_lists.append(
                        [[convex_ring_buffer(ext, d, quad_segs)]])
                out_kinds.append(POLYGON)
                continue
        parts = buffer_polygon(_parts_of(ga, g), d, quad_segs)
        ring_lists.append(parts)
        out_kinds.append(POLYGON if len(parts) <= 1 else MULTIPOLYGON)
    return from_rings(ring_lists, out_kinds)
