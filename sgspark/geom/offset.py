"""Exact trimmed-offset buffering of arbitrary simple polygons (with holes)
and polylines — the no-GEOS kernel behind `buff` / `buffdiss(exp)`.

The reference buffers with GEOS (`buffer_dissolve_explode.py:523-558`,
resolution=30 quad segments).  GEOS builds the raw offset curve and keeps
the pieces at distance >= r from the input (Voronoi-free offset trimming);
this module re-implements that idea with numpy:

  1. RAW OFFSET CURVE  W: each edge offset by r along its outward normal;
     circular arcs (vertices ON the circle, step <= (pi/2)/quad_segs — the
     same discretization contract as GEOS) inserted at vertices where the
     offset "opens up" (convex vertices for dilation, reflex for erosion);
     where it doesn't, consecutive offset segments cross and the crossing
     loop is excised by trimming.
  2. SELF-INTERSECTIONS of W computed exactly (vectorized pairwise solve,
     bbox-prefiltered in blocks) and inserted into both segments, so
     surviving pieces reconnect EXACTLY through crossing points.
  3. TRIM: a sub-segment survives iff its midpoint is at distance >= r from
     the input ring (arc chords use the chord-sag threshold r*cos(step/2))
     and on the correct side (outside for dilation, inside for erosion).
  4. TRACE: surviving sub-segments chain through crossings into closed
     loops; CCW loops are exteriors, CW loops are holes the buffer closed
     off (e.g. a C-shape sealing shut).

Degenerate configurations (tangential crossings, validity flipping at a
non-crossing junction) raise and the caller retries on a radius-perturbation
ladder — the same escalation idea as the reference's GridSizeBufferRunner
(`runners.py:236-262`).
"""

from __future__ import annotations

import numpy as np

from .clip import ensure_ccw, ensure_closed, ring_area, rings_to_polygons


class OffsetDegenerate(Exception):
    pass


# ---------------------------------------------------------------------- #
# distance / side predicates (vectorized K points x E segments)
# ---------------------------------------------------------------------- #
def _pts_to_segments_dist(q: np.ndarray, a: np.ndarray, b: np.ndarray
                          ) -> np.ndarray:
    """min distance from each of K points to E segments (K,) — blocked to
    bound memory at K*E floats per block."""
    out = np.full(len(q), np.inf)
    e = b - a                                   # (E,2)
    ee = (e * e).sum(axis=1)                    # (E,)
    ee_safe = np.where(ee == 0, 1.0, ee)
    B = max(1, int(4_000_000 // max(len(a), 1)))
    for s in range(0, len(q), B):
        qq = q[s:s + B]                         # (k,2)
        w = qq[:, None, :] - a[None, :, :]      # (k,E,2)
        t = (w * e[None, :, :]).sum(axis=2) / ee_safe[None, :]
        t = np.clip(t, 0.0, 1.0)
        proj = a[None, :, :] + t[:, :, None] * e[None, :, :]
        d = np.hypot(qq[:, None, 0] - proj[:, :, 0],
                     qq[:, None, 1] - proj[:, :, 1])
        out[s:s + B] = d.min(axis=1)
    return out


def _pts_in_ring(q: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """even-odd PIP of K points vs one closed ring, vectorized."""
    x, y = q[:, 0], q[:, 1]
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    out = np.zeros(len(q), dtype=bool)
    B = max(1, int(4_000_000 // max(len(x1), 1)))
    for s in range(0, len(q), B):
        xs, ys = x[s:s + B, None], y[s:s + B, None]
        cond = (y1[None, :] > ys) != (y2[None, :] > ys)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1)[None, :] * (ys - y1[None, :]) \
                / (y2 - y1)[None, :] + x1[None, :]
        out[s:s + B] = ((cond & (xs < xint)).sum(axis=1) % 2) == 1
    return out


# ---------------------------------------------------------------------- #
# raw offset curve
# ---------------------------------------------------------------------- #
def _raw_offset(ring: np.ndarray, r: float, quad_segs: int, sign: float,
                min_n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Closed offset polyline of a CCW closed ring: sign=+1 outward
    (dilation), sign=-1 inward (erosion).  Returns (pts (M,2) OPEN storage,
    thresh (M,) keep-threshold multiplier per EDGE k = pts[k]->pts[k+1])."""
    p = ring[:-1]
    nxt = np.roll(p, -1, axis=0)
    e = nxt - p
    ln = np.hypot(e[:, 0], e[:, 1])
    keep = ln > 0
    p, nxt, e, ln = p[keep], nxt[keep], e[keep], ln[keep]
    n = len(p)
    if n < min_n:  # lines pass min_n=2: the doubled-back 2-gon is valid
        raise OffsetDegenerate("ring degenerated")
    # outward normal of a CCW ring
    nrm = np.stack([e[:, 1] / ln, -e[:, 0] / ln], axis=1)
    u = sign * nrm
    pts: list[np.ndarray] = []
    thr: list[float] = []
    step_max = (np.pi / 2) / quad_segs
    for i in range(n):
        j = (i + 1) % n
        pts.append(p[i] + r * u[i])
        thr.append(1.0)
        pts.append(nxt[i] + r * u[i])
        # signed sweep from nrm[i] to nrm[j] in (-pi, pi]
        cr = nrm[i, 0] * nrm[j, 1] - nrm[i, 1] * nrm[j, 0]
        dt = nrm[i, 0] * nrm[j, 0] + nrm[i, 1] * nrm[j, 1]
        if dt < 0 and abs(cr) < 1e-12:
            # antiparallel normals (U-turn / end cap): the arc always opens
            # on the offset side — don't let IEEE signed zero pick -pi
            s = sign * np.pi
        else:
            s = float(np.arctan2(cr, dt))
        if sign * s > 1e-12:
            # arc at vertex nxt[i], rotating u[i] -> u[j] by s
            steps = max(int(np.ceil(abs(s) / step_max)), 1)
            a0 = float(np.arctan2(u[i, 1], u[i, 0]))
            chord_thr = float(np.cos((s / steps) / 2.0))
            thr.append(chord_thr)  # edge from segment end into first arc pt
            for k in range(1, steps):
                a = a0 + s * k / steps
                pts.append(nxt[i] + r * np.array([np.cos(a), np.sin(a)]))
                thr.append(chord_thr)
        else:
            # closing edge to next offset start crosses; trimming excises it
            thr.append(1.0)
    return np.asarray(pts), np.asarray(thr)


def _raw_offset_line(line: np.ndarray, r: float, quad_segs: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Offset curve of an open polyline = outward offset of the degenerate
    doubled-back ring (each edge once per direction, round end caps)."""
    p = np.asarray(line, dtype=np.float64)
    keep = np.ones(len(p), dtype=bool)
    keep[1:] = (np.abs(p[1:] - p[:-1]) > 0).any(axis=1)
    p = p[keep]
    if len(p) < 2:
        raise OffsetDegenerate("line too short")
    doubled = np.vstack([p, p[-2:0:-1], p[:1]])
    return _raw_offset(doubled, r, quad_segs, +1.0, min_n=2)


# ---------------------------------------------------------------------- #
# crossings + trim + trace
# ---------------------------------------------------------------------- #
_TOL = 1e-9


def _segment_crossings(pts: np.ndarray) -> list[tuple[int, int, float, float,
                                                      np.ndarray]]:
    """All proper pairwise crossings of the closed polyline's segments.
    Returns (i, j, t_i, t_j, point).  Raises OffsetDegenerate on tangential
    / endpoint-grazing crossings.  bbox-prefiltered in blocks."""
    M = len(pts)
    a = pts
    b = np.roll(pts, -1, axis=0)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    out = []
    B = 512
    for s0 in range(0, M, B):
        i_idx = np.arange(s0, min(s0 + B, M))
        for s1 in range(s0, M, B):
            j_idx = np.arange(s1, min(s1 + B, M))
            # upper triangle, non-adjacent in cyclic order
            ii, jj = np.meshgrid(i_idx, j_idx, indexing="ij")
            mask = jj > ii + 1
            mask &= ~((ii == 0) & (jj == M - 1))
            # bbox overlap
            mask &= (lo[ii, 0] <= hi[jj, 0]) & (lo[jj, 0] <= hi[ii, 0]) \
                & (lo[ii, 1] <= hi[jj, 1]) & (lo[jj, 1] <= hi[ii, 1])
            if not mask.any():
                continue
            I, J = ii[mask], jj[mask]
            d = b[I] - a[I]
            g = b[J] - a[J]
            w = a[J] - a[I]
            denom = d[:, 0] * g[:, 1] - d[:, 1] * g[:, 0]
            nz = denom != 0
            I, J, d, g, w, denom = I[nz], J[nz], d[nz], g[nz], w[nz], denom[nz]
            t = (w[:, 0] * g[:, 1] - w[:, 1] * g[:, 0]) / denom
            uu = (w[:, 0] * d[:, 1] - w[:, 1] * d[:, 0]) / denom
            inside = (t > _TOL) & (t < 1 - _TOL) & (uu > _TOL) & (uu < 1 - _TOL)
            grazing = ((np.abs(t) <= _TOL) | (np.abs(1 - t) <= _TOL)) \
                & (uu > -_TOL) & (uu < 1 + _TOL)
            grazing |= ((np.abs(uu) <= _TOL) | (np.abs(1 - uu) <= _TOL)) \
                & (t > -_TOL) & (t < 1 + _TOL)
            if grazing.any():
                raise OffsetDegenerate("endpoint-grazing crossing")
            for k in np.nonzero(inside)[0]:
                x = a[I[k]] + t[k] * d[k]
                out.append((int(I[k]), int(J[k]), float(t[k]),
                            float(uu[k]), x))
    return out


def _trim_and_trace(pts: np.ndarray, thr: np.ndarray, r: float,
                    keep_fn) -> list[np.ndarray]:
    """Split W at its self-crossings, keep sub-segments passing
    keep_fn(midpoints, thresholds), trace surviving pieces into closed
    loops.  keep_fn gets the per-sub threshold multiplier (chord sag)."""
    M = len(pts)
    crossings = _segment_crossings(pts)
    per_seg: dict[int, list[tuple[float, int]]] = {}
    xpts: list[np.ndarray] = []
    for (i, j, t, u, x) in crossings:
        xid = len(xpts)
        xpts.append(x)
        per_seg.setdefault(i, []).append((t, xid))
        per_seg.setdefault(j, []).append((u, xid))
    # build cyclic sub-segment list
    starts: list[tuple] = []   # ('v', k) or ('x', xid)
    ends: list[tuple] = []
    P: list[np.ndarray] = []
    Q: list[np.ndarray] = []
    TH: list[float] = []
    for k in range(M):
        a = pts[k]
        b = pts[(k + 1) % M]
        cuts = sorted(per_seg.get(k, []))
        prev_pt, prev_id = a, ("v", k)
        for (t, xid) in cuts:
            x = xpts[xid]
            P.append(prev_pt)
            Q.append(x)
            starts.append(prev_id)
            ends.append(("x", xid))
            TH.append(thr[k])
            prev_pt, prev_id = x, ("x", xid)
        P.append(prev_pt)
        Q.append(b)
        starts.append(prev_id)
        ends.append(("v", (k + 1) % M))
        TH.append(thr[k])
    Pa = np.asarray(P)
    Qa = np.asarray(Q)
    mids = (Pa + Qa) / 2.0
    keep = keep_fn(mids, np.asarray(TH))
    S = len(P)
    # successor in W order
    start_at_x: dict[int, list[int]] = {}
    for m in range(S):
        if starts[m][0] == "x":
            start_at_x.setdefault(starts[m][1], []).append(m)
    loops: list[np.ndarray] = []
    used = np.zeros(S, dtype=bool)
    for m0 in range(S):
        if used[m0] or not keep[m0]:
            continue
        ring_pts = []
        m = m0
        while True:
            if used[m]:
                raise OffsetDegenerate("trace revisited a sub-segment")
            used[m] = True
            ring_pts.append(Pa[m])
            kind, key = ends[m]
            if kind == "v":
                m2 = (m + 1) % S
                if not keep[m2]:
                    raise OffsetDegenerate(
                        "validity flipped at a non-crossing junction")
            else:
                cands = [c for c in start_at_x.get(key, []) if keep[c]]
                if len(cands) != 1:
                    raise OffsetDegenerate(
                        f"{len(cands)} surviving continuations at crossing")
                m2 = cands[0]
            m = m2
            if m == m0:
                break
        arr = np.asarray(ring_pts + [ring_pts[0]])
        if len(arr) >= 4 and abs(ring_area(arr)) > 0:
            loops.append(arr)
    return loops


# ---------------------------------------------------------------------- #
# public kernels
# ---------------------------------------------------------------------- #
def _ring_segments(ring: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return ring[:-1], ring[1:]


# Radius-perturbation ladder: exact radius first, then bidirectional
# nudges escalating from 3e-9 to 3e-5 RELATIVE (boundary error <= 3e-5*r,
# orders below any tolerance the engine is used at).  Bidirectional
# because knife-edge inputs (offset edge length exactly 0, e.g. eroding a
# chamfered corner by the chamfer size) are degenerate on one side of the
# exact radius but clean on both neighbors.
_LADDER = (0.0, 3e-9, -3e-9, 1e-6, -1e-6, 3e-5, -3e-5)


def _cleanup_rungs(ring: np.ndarray, r: float):
    """Fallback inputs for the perturbation ladders: the ring itself, then
    Douglas-Peucker cleanups at sub-radius tolerances (|r|/100, |r|/10).
    Micro-notches left by boolean unions of near-tangent rings (depth <<
    r) defeat the exact offset trace; removing them moves the boundary by
    at most the tolerance — far below the requested offset — and only
    engages after every exact attempt failed."""
    yield ring
    from .measure import dp_simplify
    # rotate the start vertex to the point farthest from the centroid (a
    # true extreme corner D-P keeps anyway) — D-P pins chain endpoints, so
    # a ring that happens to START at a micro-notch could never lose it
    op = ring[:-1]
    c = op.mean(axis=0)
    k = int(np.argmax(((op - c) ** 2).sum(axis=1)))
    rot = np.roll(op, -k, axis=0)
    closed = np.vstack([rot, rot[:1]])
    for tol in (abs(r) * 1e-2, abs(r) * 1e-1):
        s = dp_simplify(closed, tol)
        if len(s) >= 4:
            yield ensure_ccw(ensure_closed(s))


def dilate_ring(ring: np.ndarray, r: float, quad_segs: int = 30
                ) -> list[np.ndarray]:
    """Positive buffer of one simple closed ring (any convexity).  Returns
    loops: CCW exteriors + CW holes the buffer sealed off."""
    ring = ensure_ccw(ensure_closed(np.asarray(ring, dtype=np.float64)))
    for rng in _cleanup_rungs(ring, r):
        a, b = _ring_segments(rng)
        for bump in _LADDER:
            r_eff = r * (1.0 + bump)
            try:
                pts, thr = _raw_offset(rng, r_eff, quad_segs, +1.0)

                def keep_fn(mids, th):
                    d = _pts_to_segments_dist(mids, a, b)
                    inside = _pts_in_ring(mids, rng)
                    return (d >= r_eff * th * (1 - 1e-9)) & ~inside

                loops = _trim_and_trace(pts, thr, r_eff, keep_fn)
                tot = sum(ring_area(l) for l in loops)
                if tot < abs(ring_area(rng)) - 1e-9:
                    raise OffsetDegenerate("dilation lost area")
                return loops
            except OffsetDegenerate:
                continue
    raise RuntimeError("buffer failed after radius-perturbation ladder")


def erode_ring(ring: np.ndarray, r: float, quad_segs: int = 30
               ) -> list[np.ndarray]:
    """Negative buffer (erosion) of one simple closed ring.  Returns loops:
    CCW pieces (possibly several — erosion splits); empty list if the ring
    is thinner than 2r everywhere."""
    ring = ensure_ccw(ensure_closed(np.asarray(ring, dtype=np.float64)))
    for rng in _cleanup_rungs(ring, r):
        a, b = _ring_segments(rng)
        for bump in _LADDER:
            r_eff = r * (1.0 + bump)
            try:
                pts, thr = _raw_offset(rng, r_eff, quad_segs, -1.0)

                def keep_fn(mids, th):
                    d = _pts_to_segments_dist(mids, a, b)
                    inside = _pts_in_ring(mids, rng)
                    return (d >= r_eff * th * (1 - 1e-9)) & inside

                loops = _trim_and_trace(pts, thr, r_eff, keep_fn)
                tot = sum(ring_area(l) for l in loops)
                if tot > abs(ring_area(rng)) + 1e-9:
                    raise OffsetDegenerate("erosion gained area")
                return loops
            except OffsetDegenerate:
                continue
            # all sub-segments trimmed: polygon thinner than 2r
    raise RuntimeError("erosion failed after radius-perturbation ladder")


def dilate_line(line: np.ndarray, r: float, quad_segs: int = 30
                ) -> list[np.ndarray]:
    """Positive buffer of a polyline (round caps & joins).  A CLOSED
    polyline (first vertex == last, e.g. a roundabout) buffers to an
    annulus, like GEOS: outward dilation of the ring (its loops, incl. CW
    sealed holes) plus the eroded ring's loops reversed to CW holes.  The
    doubled-back-ring offset construction would retrace coincident geometry
    and always degenerate on exactly-closed input."""
    line = np.asarray(line, dtype=np.float64)
    keep = np.ones(len(line), dtype=bool)
    keep[1:] = (np.abs(line[1:] - line[:-1]) > 0).any(axis=1)
    line = line[keep]
    if len(line) >= 4 and bool((line[0] == line[-1]).all()):
        loops = list(dilate_ring(line, r, quad_segs))
        loops.extend(s[::-1] for s in erode_ring(line, r, quad_segs))
        return loops
    a, b = line[:-1], line[1:]
    for bump in _LADDER:
        r_eff = r * (1.0 + bump)
        try:
            pts, thr = _raw_offset_line(line, r_eff, quad_segs)

            def keep_fn(mids, th):
                d = _pts_to_segments_dist(mids, a, b)
                return d >= r_eff * th * (1 - 1e-9)

            return _trim_and_trace(pts, thr, r_eff, keep_fn)
        except OffsetDegenerate:
            continue
    raise RuntimeError("line buffer failed after radius-perturbation ladder")


def buffer_polygon(parts: list[list[np.ndarray]], dist: float,
                   quad_segs: int = 30) -> list[list[np.ndarray]]:
    """Buffer a (multi)polygon with holes.  dist > 0: the exterior dilates
    and each hole ERODES independently (for x outside P the nearest point of
    P is on the exterior shell, for x inside a hole it is on that hole's
    rim, so the Minkowski sum splits per ring).  dist < 0: the exterior
    erodes and each hole DILATES; grown holes are subtracted with the
    polygon-boolean kernel since they may merge or breach the shell.
    Multi-part inputs buffer per part; overlapping buffered parts are
    unioned."""
    from .clip import polygon_boolean, union_many
    if dist == 0:
        return [list(p) for p in parts]
    out_parts: list[list[np.ndarray]] = []
    for part in parts:
        ext = ensure_ccw(ensure_closed(part[0]))
        holes = [ensure_ccw(ensure_closed(h)) for h in part[1:]]
        if dist > 0:
            loops = list(dilate_ring(ext, dist, quad_segs))
            for h in holes:
                shrunk = erode_ring(h, dist, quad_segs)
                loops.extend(s[::-1] for s in shrunk)  # holes are CW
            out_parts.extend(rings_to_polygons(loops))
        else:
            shell = rings_to_polygons(erode_ring(ext, -dist, quad_segs))
            if not shell:
                continue
            grown: list[list[np.ndarray]] = []
            for h in holes:
                grown.extend(rings_to_polygons(
                    dilate_ring(h, -dist, quad_segs)))
            if grown:
                shell = polygon_boolean(shell, grown, "difference")
            out_parts.extend(shell)
    if len(parts) > 1 and len(out_parts) > 1:
        out_parts = union_many(out_parts)
    return out_parts
