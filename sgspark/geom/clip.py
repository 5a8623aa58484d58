"""Polygon boolean operations (intersection / union / difference) in pure
python/numpy — the kernel behind clean_overlay, clip and dissolve-union.

The reference delegates these to GEOS (`overlay.py:394-410` rowwise
`shapely.intersection/difference`; `utils.py:10-14` union_all).  Without GEOS
we implement:

  * Sutherland–Hodgman for subject x CONVEX clipper (the gridloop/clip path —
    grid cells are rectangles, the dominant case at scale), and
  * Greiner–Hormann for general simple-polygon pairs, with the reference's
    retry-ladder idea (`runners.py:308-383` GridSizeOverlayRunner) re-expressed
    as an epsilon-perturbation ladder for degenerate vertex-on-edge inputs.

Scope: simple polygons (holes supported via composition in `poly_boolean`).
Exactness for the oracle-checked paths comes from axis-aligned inputs where
Sutherland–Hodgman arithmetic is exact; general pairs are covered by pytest
goldens with analytic-area oracles (circle lens areas).
"""

from __future__ import annotations

import numpy as np


def ring_area(ring: np.ndarray) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    return float((x * y1 - x1 * y).sum()) / 2.0


def ensure_ccw(ring: np.ndarray) -> np.ndarray:
    return ring if ring_area(ring) >= 0 else ring[::-1]


def ensure_closed(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        return np.vstack([ring, ring[:1]])
    return ring


# ---------------------------------------------------------------------- #
# Sutherland–Hodgman (convex clipper)
# ---------------------------------------------------------------------- #
def clip_ring_convex(subject: np.ndarray, clipper: np.ndarray) -> np.ndarray | None:
    """Clip subject ring by convex CCW clipper ring. Both closed.
    Returns closed ring or None if empty."""
    poly = subject[:-1]
    cl = ensure_ccw(ensure_closed(clipper))
    for i in range(len(cl) - 1):
        if len(poly) == 0:
            return None
        a, b = cl[i], cl[i + 1]
        ex, ey = b[0] - a[0], b[1] - a[1]
        px = poly[:, 0] - a[0]
        py = poly[:, 1] - a[1]
        side = ex * py - ey * px  # >=0 -> inside (left of edge)
        nxt = np.roll(side, -1)
        pts_next = np.roll(poly, -1, axis=0)
        out = []
        for j in range(len(poly)):
            cur_in = side[j] >= 0
            nxt_in = nxt[j] >= 0
            if cur_in:
                out.append(poly[j])
            if cur_in != nxt_in:
                denom = side[j] - nxt[j]
                t = side[j] / denom if denom != 0 else 0.0
                out.append(poly[j] + t * (pts_next[j] - poly[j]))
        poly = np.asarray(out) if out else np.zeros((0, 2))
    if len(poly) < 3:
        return None
    ring = np.vstack([poly, poly[:1]])
    if abs(ring_area(ring)) == 0.0:
        return None
    return ring


def _halfplane_split(ring: np.ndarray, a: np.ndarray, b: np.ndarray
                     ) -> list[np.ndarray] | None:
    """Clip a CLOSED simple ring by the half-plane LEFT of a->b, correctly
    splitting into multiple rings when the cut disconnects the subject.

    Crossing points along the cut line, sorted by position, alternate
    interior/exterior of the subject (Jordan), so consecutive sorted pairs
    (2k, 2k+1) are exactly the cut-line segments on the clipped boundary;
    each pair bridges an exit chain to an entry chain and the chains are
    traced into closed rings.  Same crossing arithmetic as clip_ring_convex.

    Returns a list of closed rings, or None when the pairing is degenerate
    (tied crossing positions / non-alternating types — e.g. a subject vertex
    exactly on the cut line at a crossing); callers fall back to the
    Greiner–Hormann ladder then."""
    d = (float(b[0] - a[0]), float(b[1] - a[1]))
    pts = ring[:-1]
    side = d[0] * (pts[:, 1] - a[1]) - d[1] * (pts[:, 0] - a[0])
    inside = side >= 0
    if inside.all():
        return [ring]
    if not inside.any():
        return []
    n = len(pts)
    start = int(np.argmin(inside))  # an OUTSIDE vertex: chains never wrap
    chains: list[list[np.ndarray]] = []
    crossings: list[tuple[float, int, bool]] = []  # (s, chain_id, is_entry)
    cur: list[np.ndarray] | None = None
    for k in range(n):
        j = (start + k) % n
        jn = (start + k + 1) % n
        if inside[j] and cur is not None:
            cur.append(pts[j])
        if inside[j] != inside[jn]:
            denom = side[j] - side[jn]
            t = side[j] / denom if denom != 0 else 0.0
            cp = pts[j] + t * (pts[jn] - pts[j])
            s = d[0] * (cp[0] - a[0]) + d[1] * (cp[1] - a[1])
            if inside[jn]:  # entry: open a new chain
                cur = [cp]
                chains.append(cur)
                crossings.append((float(s), len(chains) - 1, True))
            else:           # exit: close the current chain
                if cur is None:
                    return None
                cur.append(cp)
                crossings.append((float(s), len(chains) - 1, False))
                cur = None
    if cur is not None or len(crossings) % 2 != 0:
        return None
    crossings.sort(key=lambda c: c[0])
    nxt_chain: dict[int, int] = {}
    for k in range(0, len(crossings), 2):
        s0, c0, e0 = crossings[k]
        s1, c1, e1 = crossings[k + 1]
        if s0 == s1 or e0 == e1:
            return None  # tie or non-alternating: degenerate
        if e0:  # c0 entry, c1 exit: bridge exit(c1) -> entry(c0)
            nxt_chain[c1] = c0
        else:
            nxt_chain[c0] = c1
    out: list[np.ndarray] = []
    seen: set[int] = set()
    for c0 in range(len(chains)):
        if c0 in seen:
            continue
        ring_pts: list[np.ndarray] = []
        c = c0
        while True:
            if c in seen:
                return None  # chain revisited before closing: inconsistent
            seen.add(c)
            ring_pts.extend(chains[c])
            c = nxt_chain.get(c)
            if c is None:
                return None
            if c == c0:
                break
        arr = np.asarray(ring_pts + [ring_pts[0]], dtype=np.float64)
        if len(arr) >= 4 and abs(ring_area(arr)) > 0:
            out.append(arr)
    return out


def clip_ring_convex_multi(subject: np.ndarray, clipper: np.ndarray
                           ) -> list[np.ndarray]:
    """Clip a simple closed ring by a convex CCW clipper, SPLITTING into
    multiple simple rings when the clip disconnects a concave subject
    (plain Sutherland–Hodgman instead emits one weakly-simple ring with
    zero-width bridges — invalid geometry, round-2 advice).  Raises
    DegenerateIntersection on tied/non-alternating crossings; callers fall
    back to ring_boolean's robustness ladder."""
    cl = ensure_ccw(ensure_closed(clipper))
    rings = [ensure_ccw(ensure_closed(subject))]
    for i in range(len(cl) - 1):
        nxt: list[np.ndarray] = []
        for r in rings:
            pieces = _halfplane_split(r, cl[i], cl[i + 1])
            if pieces is None:
                raise DegenerateIntersection("half-plane split pairing")
            nxt.extend(pieces)
        rings = nxt
        if not rings:
            return []
    # clean residual coincident-vertex pinches (crossing exactly at a vertex)
    out: list[np.ndarray] = []
    for r in rings:
        if ring_has_repeats(r):
            out.extend(ensure_ccw(p) for p in split_pinched_ring(r))
        else:
            out.append(ensure_ccw(r))
    return out


def ring_has_repeats(ring: np.ndarray) -> bool:
    """True if the CLOSED ring revisits a vertex (beyond the closing
    duplicate) — the signature of Sutherland–Hodgman's zero-width bridges
    when a convex clip splits a concave subject into disconnected pieces."""
    pts = ring[:-1]
    return len(np.unique(pts, axis=0)) < len(pts)


def split_pinched_ring(ring: np.ndarray) -> list[np.ndarray]:
    """Split a weakly-simple CLOSED ring into simple closed rings at repeated
    vertices.  SH clipping of a concave subject that the clipper cuts into k
    disconnected pieces emits ONE ring that walks all pieces connected by
    zero-width bridges along the clip boundary; the bridge endpoints are
    bitwise-equal repeats (the clip kernel writes exact-on-bound
    coordinates), so splitting at repeats recovers the k simple pieces.
    Zero-area loops (the bridges / spurs) are dropped.  Exact same areas as
    the input ring; geometry becomes valid (round-2 advice)."""
    pts = [(float(p[0]), float(p[1])) for p in ring[:-1]]
    out: list[np.ndarray] = []
    stack: list[tuple] = []
    pos: dict[tuple, int] = {}
    for p in pts:
        if stack and p == stack[-1]:
            continue  # consecutive duplicate
        if p in pos:
            i = pos[p]
            loop = stack[i:]
            arr = np.asarray(loop + [loop[0]], dtype=np.float64)
            if len(arr) >= 4 and abs(ring_area(arr)) > 0:
                out.append(arr)
            for q in loop[1:]:
                pos.pop(q, None)
            stack = stack[:i + 1]
        else:
            pos[p] = len(stack)
            stack.append(p)
    if len(stack) >= 3:
        arr = np.asarray(stack + [stack[0]], dtype=np.float64)
        if abs(ring_area(arr)) > 0:
            out.append(arr)
    return out


def is_convex(ring: np.ndarray) -> bool:
    r = ensure_ccw(ensure_closed(ring))[:-1]
    a = np.roll(r, -1, axis=0) - r
    b = np.roll(a, -1, axis=0)
    cross = a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]
    return bool((cross >= 0).all())


# ---------------------------------------------------------------------- #
# Greiner–Hormann (general simple rings)
# ---------------------------------------------------------------------- #
class _V:
    __slots__ = ("xy", "nxt", "prv", "inter", "entry", "alpha",
                 "neighbor", "visited")

    def __init__(self, xy, inter=False, alpha=0.0):
        self.xy = (float(xy[0]), float(xy[1]))
        self.nxt = self.prv = None
        self.inter = inter
        self.entry = False
        self.alpha = alpha
        self.neighbor = None
        self.visited = False


def _build(ring: np.ndarray) -> _V:
    verts = [_V(p) for p in ring[:-1]]
    n = len(verts)
    for i, v in enumerate(verts):
        v.nxt = verts[(i + 1) % n]
        v.prv = verts[(i - 1) % n]
    return verts[0]


def _iter(head: _V):
    v = head
    while True:
        yield v
        v = v.nxt
        if v is head:
            break


def _insert_sorted(a: _V, b: _V, v: _V):
    """Insert intersection v between original vertices a..b ordered by alpha."""
    c = a
    while c.nxt is not b and c.nxt.inter and c.nxt.alpha <= v.alpha:
        c = c.nxt
    v.nxt = c.nxt
    v.prv = c
    c.nxt.prv = v
    c.nxt = v


def _pt_in_ring(pt, ring: np.ndarray) -> bool:
    x, y = pt
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    cond = (y1 > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (y - y1) / (y2 - y1) + x1
    return bool((cond & (x < xint)).sum() % 2 == 1)


class DegenerateIntersection(Exception):
    pass


_EPS = 1e-11


def _crossings_all_pairs(ra: np.ndarray, rb: np.ndarray
                         ) -> tuple[np.ndarray, ...]:
    """ALL edge x edge proper crossings of two closed rings in one numpy
    pass (blocked to bound memory) — replaces the O(nA*nB) per-pair Python
    loop that dominated the Greiner–Hormann kernel.  Returns (ai, bi, t, u).
    Raises DegenerateIntersection on collinear overlaps / endpoint touches,
    exactly like the scalar code it replaces."""
    p1 = ra[:-1]
    p2 = ra[1:]
    q1 = rb[:-1]
    q2 = rb[1:]
    d = p2 - p1
    e = q2 - q1
    outs: list[tuple[np.ndarray, ...]] = []
    BA = max(1, int(2_000_000 // max(len(q1), 1)))
    for s in range(0, len(p1), BA):
        dd = d[s:s + BA]
        pp = p1[s:s + BA]
        denom = dd[:, None, 0] * e[None, :, 1] - dd[:, None, 1] * e[None, :, 0]
        w0 = q1[None, :, 0] - pp[:, None, 0]
        w1 = q1[None, :, 1] - pp[:, None, 1]
        cross_w = w0 * dd[:, None, 1] - w1 * dd[:, None, 0]
        par = denom == 0
        if par.any():
            col = par & (cross_w == 0)
            for ai, bi in zip(*np.nonzero(col)):
                if _overlap_1d(pp[ai], p2[s + ai], q1[bi], q2[bi]):
                    raise DegenerateIntersection("collinear overlap")
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (w0 * e[None, :, 1] - w1 * e[None, :, 0]) / denom
            u = cross_w / denom
        t = np.where(par, np.inf, t)
        u = np.where(par, np.inf, u)
        near = ((np.abs(t) < _EPS) | (np.abs(1 - t) < _EPS)
                | (np.abs(u) < _EPS) | (np.abs(1 - u) < _EPS))
        if (near & (t > -_EPS) & (t < 1 + _EPS)
                & (u > -_EPS) & (u < 1 + _EPS)).any():
            raise DegenerateIntersection("endpoint touch")
        hit = (t > 0) & (t < 1) & (u > 0) & (u < 1) & ~near
        if hit.any():
            ai, bi = np.nonzero(hit)
            outs.append((ai + s, bi, t[hit], u[hit]))
    if not outs:
        return (np.zeros(0, dtype=np.int64),) * 2 + (np.zeros(0),) * 2
    return tuple(np.concatenate([o[k] for o in outs]) for k in range(4))


def _gh_once(ra: np.ndarray, rb: np.ndarray, op: str) -> list[np.ndarray]:
    ra = ensure_ccw(ensure_closed(ra))
    rb = ensure_ccw(ensure_closed(rb))
    A = _build(ra)
    B = _build(rb)
    a_orig = [v for v in _iter(A)]
    b_orig = [v for v in _iter(B)]
    ai, bi, ts, us = _crossings_all_pairs(ra, rb)
    for k in range(len(ai)):
        va = a_orig[ai[k]]
        vb = b_orig[bi[k]]
        pt = ra[ai[k]] + ts[k] * (ra[ai[k] + 1] - ra[ai[k]])
        ia = _V(pt, inter=True, alpha=float(ts[k]))
        ib = _V(pt, inter=True, alpha=float(us[k]))
        ia.neighbor = ib
        ib.neighbor = ia
        _insert_sorted(va, _next_orig(va), ia)
        _insert_sorted(vb, _next_orig(vb), ib)
    if len(ai) == 0:
        return _no_cross_result(ra, rb, op)
    # entry/exit flags
    a_in_b = _pt_in_ring(A.xy, rb)
    entry = not a_in_b
    for v in _iter(A):
        if v.inter:
            v.entry = entry
            entry = not entry
    b_in_a = _pt_in_ring(B.xy, ra)
    entry = not b_in_a
    for v in _iter(B):
        if v.inter:
            v.entry = entry
            entry = not entry
    # traversal
    results = []
    while True:
        cur = None
        for v in _iter(A):
            if v.inter and not v.visited:
                cur = v
                break
        if cur is None:
            break
        ring = []
        start = cur
        on_subject = True
        forward = None
        while True:
            cur.visited = True
            if cur.neighbor is not None:
                cur.neighbor.visited = True
            if op == "intersection":
                forward = cur.entry
            elif op == "union":
                forward = not cur.entry
            else:  # difference A - B
                forward = (not cur.entry) if on_subject else cur.entry
            ring.append(cur.xy)
            v = cur
            while True:
                v = v.nxt if forward else v.prv
                if v.inter:
                    break
                ring.append(v.xy)
            cur = v.neighbor
            on_subject = not on_subject
            if cur is start or (cur.neighbor is start):
                break
            if cur.visited and cur is not start:
                break
        arr = np.asarray(ring + [ring[0]])
        if len(arr) >= 4 and abs(ring_area(arr)) > 0:
            results.append(arr)
    return results


def _next_orig(v: _V) -> _V:
    n = v.nxt
    while n.inter:
        n = n.nxt
    return n


def _overlap_1d(p1, p2, q1, q2) -> bool:
    lo1, hi1 = min(p1[0], p2[0]), max(p1[0], p2[0])
    lo2, hi2 = min(q1[0], q2[0]), max(q1[0], q2[0])
    if hi1 - lo1 < 1e-300 and hi1 - lo1 == 0:  # vertical: compare y
        lo1, hi1 = min(p1[1], p2[1]), max(p1[1], p2[1])
        lo2, hi2 = min(q1[1], q2[1]), max(q1[1], q2[1])
    return max(lo1, lo2) < min(hi1, hi2)


def _no_cross_result(ra, rb, op) -> list[np.ndarray]:
    a_in_b = _pt_in_ring(ra[0], rb)
    b_in_a = _pt_in_ring(rb[0], ra)
    if op == "intersection":
        if a_in_b:
            return [ra]
        if b_in_a:
            return [rb]
        return []
    if op == "union":
        if a_in_b:
            return [rb]
        if b_in_a:
            return [ra]
        return [ra, rb]
    # difference A - B
    if a_in_b:
        return []
    if b_in_a:
        # hole: exterior ra + reversed rb as hole ring (marked by CW orientation)
        return [ra, rb[::-1]]
    return [ra]


def _snap_ring(ring: np.ndarray, grid: float) -> np.ndarray | None:
    """Snap-round a ring to `grid`, dropping resulting duplicate and
    collinear vertices.  None if it degenerates below a triangle."""
    r = np.round(ring[:-1] / grid) * grid
    keep = np.ones(len(r), dtype=bool)
    keep[1:] = (np.abs(r[1:] - r[:-1]) > 0).any(axis=1)
    r = r[keep]
    if len(r) >= 2 and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    if len(r) >= 3:
        prv = np.roll(r, 1, axis=0)
        nxt = np.roll(r, -1, axis=0)
        cross = ((r[:, 0] - prv[:, 0]) * (nxt[:, 1] - r[:, 1])
                 - (r[:, 1] - prv[:, 1]) * (nxt[:, 0] - r[:, 0]))
        r = r[cross != 0]
    if len(r) < 3:
        return None
    return np.vstack([r, r[:1]])


def ring_boolean(ra: np.ndarray, rb: np.ndarray, op: str,
                 max_retries: int = 4) -> list[np.ndarray]:
    """Boolean of two simple rings.  Returns list of rings: CCW = exterior,
    CW = hole.

    Robustness ladder on degenerate inputs (collinear overlaps, endpoint
    touches, repeated vertices) — the no-GEOS twin of the reference's
    GridSizeOverlayRunner escalation (`runners.py:308-383`):
      1. tiny perturbation of B (eps 1e-9 .. 1e-6), then
      2. SNAP-ROUNDING both rings to escalating grids (1e-9 .. 1e-3 of the
         coordinate magnitude), which removes duplicate/collinear vertices
         exactly like shapely's grid_size; fully-degenerate snapped inputs
         short-circuit to the no-cross containment result."""
    # nested / disjoint non-crossing fast paths: EXACT (no perturbation
    # ladder noise — nested rect coverages were picking up ~1e-5 sliver
    # area from the eps ladder) and cheaper than a GH pass
    ra_c = ensure_ccw(ensure_closed(np.asarray(ra)))
    rb_c = ensure_ccw(ensure_closed(np.asarray(rb)))
    if _ring_contains_ring(ra_c, rb_c):      # b strictly inside a
        if op == "union":
            return [ra_c]
        if op == "intersection":
            return [rb_c]
        return [ra_c, rb_c[::-1]]            # difference: b becomes a hole
    if _ring_contains_ring(rb_c, ra_c):      # a strictly inside b
        if op == "union":
            return [rb_c]
        if op == "intersection":
            return [ra_c]
        return []                            # difference: a fully erased
    rb_try = rb
    for attempt in range(max_retries + 1):
        try:
            return _normalize_nesting(_gh_once(ra, rb_try, op))
        except DegenerateIntersection:
            eps = 1e-9 * (10 ** attempt)
            rb_try = ensure_closed(rb[:-1] + np.array([eps, eps * 0.7]))
    scale = max(np.abs(ra).max(), np.abs(rb).max(), 1.0)
    for k in range(4):
        grid = scale * (1e-9 * 100 ** k)
        sa = _snap_ring(ra, grid)
        sb = _snap_ring(rb, grid)
        if sa is None or sb is None:
            # one side collapsed: fall back to containment result
            return _no_cross_result(ensure_ccw(ensure_closed(ra)),
                                    ensure_ccw(ensure_closed(rb)), op)
        try:
            return _normalize_nesting(_gh_once(sa, sb, op))
        except DegenerateIntersection:
            # offset the snapped B by half a grid cell (off-lattice) so
            # snapped-collinear edges separate, then retry once per level
            sb2 = ensure_closed(sb[:-1] + np.array([grid / 2, grid / 3]))
            try:
                return _normalize_nesting(_gh_once(sa, sb2, op))
            except DegenerateIntersection:
                continue
    raise RuntimeError("polygon boolean failed after snap-rounding ladder")


def _normalize_nesting(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Orient traced rings by containment depth: even depth -> exterior (CCW),
    odd depth -> hole (CW).  GH traversal emits arbitrary orientation."""
    if len(rings) <= 1:
        if rings and ring_area(rings[0]) < 0:
            return [rings[0][::-1]]
        return rings
    out = []
    for i, r in enumerate(rings):
        depth = sum(1 for j, q in enumerate(rings)
                    if j != i and _pt_in_ring(r[0], q))
        want_ccw = depth % 2 == 0
        is_ccw = ring_area(r) >= 0
        out.append(r if is_ccw == want_ccw else r[::-1])
    return out


def _ring_contains_ring(outer: np.ndarray, inner: np.ndarray) -> bool:
    """True iff ring `inner` lies entirely inside ring `outer` (vertices
    inside, boundaries disjoint).  Orientation-independent; bbox-prefiltered."""
    if (inner[:, 0].min() < outer[:, 0].min() or
            inner[:, 0].max() > outer[:, 0].max() or
            inner[:, 1].min() < outer[:, 1].min() or
            inner[:, 1].max() > outer[:, 1].max()):
        return False
    from .predicates import points_in_ring, segments_intersect_any
    oc = ensure_closed(outer)
    ic = ensure_closed(inner)
    if not bool(points_in_ring(ic[:-1, 0], ic[:-1, 1], oc).all()):
        return False
    return not segments_intersect_any(ic, oc)


def rings_to_polygons(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Group a flat ring list (CCW exteriors, CW holes) into polygons:
    each hole is attached to the smallest exterior containing it."""
    exts = [(i, r) for i, r in enumerate(rings) if ring_area(r) >= 0]
    holes = [r for r in rings if ring_area(r) < 0]
    polys = [[r] for _, r in exts]
    for h in holes:
        best, best_area = None, np.inf
        for j, (_, e) in enumerate(exts):
            if _pt_in_ring(h[0], e):
                a = ring_area(e)
                if a < best_area:
                    best, best_area = j, a
        if best is not None:
            polys[best].append(h)
    return polys


def polygon_boolean(parts_a: list[list[np.ndarray]],
                    parts_b: list[list[np.ndarray]], op: str
                    ) -> list[list[np.ndarray]]:
    """Boolean over (multi)polygons with holes, by composition:
      A ∩ B = ⋃_{i,j} (extAi ∩ extBj)  minus all holes
      A − B = fold difference of each part of A by every part of B
      A ∪ B = pairwise-union fold (parts that stay disjoint remain parts)
    Holes are handled by subtracting them post-hoc (correct when holes do not
    nest further, which covers overlay/dissolve outputs of simple inputs).
    """
    if op == "intersection":
        out_rings: list[np.ndarray] = []
        for pa in parts_a:
            for pb in parts_b:
                # convex-clipper fast path (Sutherland–Hodgman): exact for
                # the dominant rectangle/convex cases, no degeneracy ladder
                if is_convex(pa[0]) and is_convex(pb[0]):
                    # convex x convex: single connected output guaranteed
                    r = clip_ring_convex(ensure_closed(pa[0]),
                                         ensure_closed(pb[0]))
                    rs = [ensure_ccw(r)] if r is not None else []
                elif is_convex(pb[0]) or is_convex(pa[0]):
                    # concave subject x convex clipper: half-plane clipping
                    # with proper multi-piece splitting; GH ladder on
                    # degenerate crossings
                    subj, clp = ((pa[0], pb[0]) if is_convex(pb[0])
                                 else (pb[0], pa[0]))
                    try:
                        rs = clip_ring_convex_multi(subj, clp)
                    except DegenerateIntersection:
                        rs = ring_boolean(pa[0], pb[0], "intersection")
                else:
                    rs = ring_boolean(pa[0], pb[0], "intersection")
                out_rings.extend(rs)
        polys = rings_to_polygons(out_rings)
        holes = [h for pa in parts_a for h in pa[1:]] + \
                [h for pb in parts_b for h in pb[1:]]
        return _subtract_holes(polys, holes)
    if op == "difference":
        cur = [list(p) for p in parts_a]
        for pb in parts_b:
            prev = cur  # residual BEFORE erasing this part of B
            nxt: list[list[np.ndarray]] = []
            for pa in prev:
                # this part of B entirely inside one of pa's holes: B ∩ pa
                # is empty, so erasing is a no-op.  Without this guard the
                # ext-minus-B + re-add-holes decomposition would subtract
                # B's area twice (it is already excluded by the hole) —
                # the get_gaps coverage case: tiles nested in a frame hole.
                if any(_ring_contains_ring(h, pb[0]) for h in pa[1:]):
                    nxt.append(list(pa))
                    continue
                rs = ring_boolean(pa[0], pb[0], "difference")
                ps = rings_to_polygons(rs)
                for p in ps:
                    p.extend(pa[1:])  # retain original holes
                nxt.extend(ps)
            # A − (extB \ holesB) = (A − extB) ∪ (A ∩ holeB): each hole of B
            # re-adds its region FROM THE CURRENT RESIDUAL (every part of it,
            # holes respected) — not from the original A, which would
            # resurrect regions already erased by earlier parts of B.
            for hb in pb[1:]:
                nxt.extend(polygon_boolean(
                    prev, [[ensure_ccw(hb[::-1])]], "intersection"))
            cur = nxt
        return cur
    if op == "union":
        parts = [list(p) for p in parts_a] + [list(p) for p in parts_b]
        return union_many(parts)
    raise ValueError(op)


def union_many(parts: list[list[np.ndarray]]) -> list[list[np.ndarray]]:
    """Iterative pairwise union of polygon parts (with holes carried).
    O(k^2) worst case; dissolve groups are small after clustering."""
    parts = [list(p) for p in parts]
    changed = True
    while changed:
        changed = False
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                a, b = parts[i], parts[j]
                if not _bbox_overlap(a[0], b[0]):
                    continue
                # one part nested inside the other's HOLE: the regions are
                # disjoint, so they must stay separate parts (the exterior
                # union would swallow the nested part — the coverage case
                # of tiles inside a frame's hole)
                if any(_ring_contains_ring(h, b[0]) for h in a[1:]) or \
                        any(_ring_contains_ring(h, a[0]) for h in b[1:]):
                    continue
                rs = ring_boolean(a[0], b[0], "union")
                exts = [r for r in rs if ring_area(r) >= 0]
                if len(exts) == 1 and len(rs) >= 1:
                    new_holes = [r for r in rs if ring_area(r) < 0]
                    # holes of A ∪ B = (holesA ∩ holesB) ∪ (holesA −
                    # extB) ∪ (holesB − extA) — three DISJOINT terms, so a
                    # union partner filling part of a hole (a gap strip
                    # merged into a frame along its hole rim) shrinks it
                    # without double-subtraction; remnant pieces with their
                    # own holes re-emit those as ISLAND parts (valid OGC
                    # nesting depth 2)
                    uh, islands = _union_part_holes(a, b)
                    merged = [exts[0]] + new_holes + uh
                    parts = [p for k, p in enumerate(parts) if k not in (i, j)]
                    parts.append(merged)
                    parts.extend(islands)
                    changed = True
                    break
            if changed:
                break
    return parts


def _canon_ring(r: np.ndarray) -> np.ndarray:
    """Canonical form of a closed ring: CCW, consecutive duplicates and
    exactly-collinear pass-through vertices removed, rotated so the
    lexicographic minimum vertex is first — for exact ring equality tests
    (traced rings carry noded extra vertices on straight edges)."""
    r = ensure_ccw(ensure_closed(np.asarray(r)))[:-1]
    if len(r) > 1:
        prev = np.roll(r, 1, axis=0)
        r = r[(r != prev).any(axis=1)]
    if len(r) > 3:
        prev = np.roll(r, 1, axis=0)
        nxt = np.roll(r, -1, axis=0)
        v1 = r - prev
        v2 = nxt - r
        cross = v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]
        dot = v1[:, 0] * v2[:, 0] + v1[:, 1] * v2[:, 1]
        keep = ~((cross == 0) & (dot > 0))
        if int(keep.sum()) >= 3:
            r = r[keep]
    k = int(np.lexsort((r[:, 1], r[:, 0]))[0])
    return np.vstack([r[k:], r[:k]])


def _rings_equal(a: np.ndarray, b: np.ndarray) -> bool:
    """Canonicalized ring equality with a relative snap tolerance: rings
    traced by the crossing kernels carry O(eps) interpolation noise on
    coincident geometry, and treating a near-identical ring as identical
    (snap-to-partner) keeps the exact fast paths in charge instead of
    letting the perturbation ladder amplify 1e-15 vertex noise into
    1e-6 sliver area."""
    ca, cb = _canon_ring(a), _canon_ring(b)
    if ca.shape != cb.shape:
        return False
    if bool((ca == cb).all()):
        return True
    scale = max(float(np.abs(ca).max()), float(np.abs(cb).max()), 1.0)
    return bool(np.abs(ca - cb).max() <= 1e-9 * scale)


def _union_part_holes(a: list[np.ndarray], b: list[np.ndarray]
                      ) -> tuple[list[np.ndarray], list[list[np.ndarray]]]:
    """Holes of the part-union A ∪ B when the exterior union is a single
    shell: (holesA ∩ holesB) ∪ (holesA − extB) ∪ (holesB − extA), three
    disjoint terms.  Returns (CW holes, island parts).  Exact-equality
    fast paths avoid the degeneracy ladder on coincident rings (the
    gap-fills-the-hole-rim coverage case is ring-identical)."""
    out: list[np.ndarray] = []
    islands: list[list[np.ndarray]] = []

    def emit(ps):
        for p in ps:
            if abs(ring_area(p[0])) == 0:
                continue
            out.append(ensure_ccw(p[0])[::-1])
            islands.extend([[ensure_ccw(hh[::-1])]] for hh in p[1:])

    for ha, other_ext, other_holes in ((h, b[0], b[1:]) for h in a[1:]):
        hap = [ensure_ccw(ha[::-1])]
        if not _bbox_overlap(ha, other_ext):
            out.append(ha)  # disjoint from B entirely: hole survives whole
            continue
        if _rings_equal(ha, other_ext):
            pass  # ha − extB = ∅
        else:
            emit(polygon_boolean([hap], [[ensure_ccw(other_ext)]],
                                 "difference"))
        for hb in other_holes:
            if not _bbox_overlap(ha, hb):
                continue
            if _rings_equal(ha, hb):
                emit([[hap[0]]])
            else:
                emit(polygon_boolean([hap], [[ensure_ccw(np.asarray(hb)[::-1])]],
                                     "intersection"))
    for hb in b[1:]:
        hbp = [ensure_ccw(np.asarray(hb)[::-1])]
        if not _bbox_overlap(hb, a[0]):
            out.append(hb)
            continue
        if _rings_equal(hb, a[0]):
            continue  # hb − extA = ∅
        emit(polygon_boolean([hbp], [[ensure_ccw(a[0])]], "difference"))
    return out, islands


def _subtract_holes(polys, holes):
    if not holes:
        return polys
    out = []
    for p in polys:
        cur = [p]
        for h in holes:
            nxt = []
            for q in cur:
                rs = ring_boolean(q[0], h[::-1], "difference")
                ps = rings_to_polygons(rs)
                for pp in ps:
                    pp.extend(q[1:])
                nxt.extend(ps)
            cur = nxt
        out.extend(cur)
    return out


def _bbox_overlap(ra, rb) -> bool:
    return not (ra[:, 0].max() < rb[:, 0].min() or rb[:, 0].max() < ra[:, 0].min()
                or ra[:, 1].max() < rb[:, 1].min() or rb[:, 1].max() < ra[:, 1].min())


# ---------------------------------------------------------------------- #
# BATCHED Sutherland–Hodgman: clip n rings by n axis-aligned rectangles in
# one numpy pass per half-plane — the vectorized twin of clip_ring_convex
# for the dominant poly×rect overlay case (zones / grid cells are rects).
# No per-pair Python: the whole batch advances through 4 half-plane passes
# on padded (n, L, 2) arrays.
# ---------------------------------------------------------------------- #
def pad_rings(rings: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Pack a list of OPEN rings (no closing duplicate) into a padded
    (n, L, 2) array + counts."""
    n = len(rings)
    C = np.array([len(r) for r in rings], dtype=np.int64)
    L = int(C.max()) if n else 0
    P = np.zeros((n, max(L, 1), 2), dtype=np.float64)
    for i, r in enumerate(rings):  # assembly only; math below is batched
        P[i, :len(r)] = r
    return P, C


def _clip_pass_axis(P: np.ndarray, C: np.ndarray, axis: int,
                    bound: np.ndarray, keep_ge: bool
                    ) -> tuple[np.ndarray, np.ndarray]:
    """One half-plane pass over the whole batch (keep coord >= / <= bound)."""
    n, L, _ = P.shape
    j = np.arange(L)
    valid = j[None, :] < C[:, None]
    coord = P[:, :, axis]
    inside = (coord >= bound[:, None]) if keep_ge else (coord <= bound[:, None])
    inside &= valid
    nxt_idx = np.where(j[None, :] + 1 >= C[:, None], 0, j[None, :] + 1)
    Pn = np.take_along_axis(P, nxt_idx[:, :, None], axis=1)
    coord_n = np.take_along_axis(coord, nxt_idx, axis=1)
    inside_n = ((coord_n >= bound[:, None]) if keep_ge
                else (coord_n <= bound[:, None]))
    cross = (inside != (inside_n & valid)) & valid
    # an edge from outside to inside (or v.v.) emits a crossing point; a
    # vertex exactly ON the bound counts as inside on both sides -> no dup
    emit = inside.astype(np.int64) + cross.astype(np.int64)
    pos_end = np.cumsum(emit, axis=1)
    pos_start = pos_end - emit
    newC = np.where(C > 0, pos_end[np.arange(n), np.maximum(C - 1, 0)], 0)
    Lout = max(int(newC.max()) if n else 0, 1)
    out = np.zeros((n, Lout, 2), dtype=np.float64)
    rows, cols = np.nonzero(inside)
    out[rows, pos_start[rows, cols]] = P[rows, cols]
    denom = coord_n - coord
    safe = np.where(denom == 0, 1.0, denom)
    t = (bound[:, None] - coord) / safe
    Q = P + t[:, :, None] * (Pn - P)
    Q[:, :, axis] = np.broadcast_to(bound[:, None], (n, L))  # exact on bound
    rows2, cols2 = np.nonzero(cross)
    out[rows2, (pos_start + inside)[rows2, cols2]] = Q[rows2, cols2]
    return out, newC


def clip_rings_by_rects_batch(P: np.ndarray, C: np.ndarray,
                              rects: np.ndarray
                              ) -> tuple[np.ndarray, np.ndarray]:
    """Clip n padded open rings by n rectangles (x0, y0, x1, y1).
    Returns padded open result rings + counts (0/1/2 => empty).  Same
    semantics as clip_ring_convex with a rectangle clipper, including the
    zero-width-bridge artifacts SH produces on split concave subjects
    (areas are exact; downstream consumers use areas / containment)."""
    P, C = _clip_pass_axis(P, C, 0, rects[:, 0], True)   # x >= x0
    P, C = _clip_pass_axis(P, C, 0, rects[:, 2], False)  # x <= x1
    P, C = _clip_pass_axis(P, C, 1, rects[:, 1], True)   # y >= y0
    P, C = _clip_pass_axis(P, C, 1, rects[:, 3], False)  # y <= y1
    return P, C


def _clip_pass_halfplane(P: np.ndarray, C: np.ndarray, A: np.ndarray,
                         D: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One PER-ROW half-plane pass over the whole batch: keep points LEFT of
    the line through A[i] with direction D[i] — the general-direction twin
    of _clip_pass_axis (crossing points by side-ratio interpolation)."""
    n, L, _ = P.shape
    j = np.arange(L)
    valid = j[None, :] < C[:, None]
    side = D[:, None, 0] * (P[:, :, 1] - A[:, None, 1]) \
        - D[:, None, 1] * (P[:, :, 0] - A[:, None, 0])
    inside = (side >= 0) & valid
    nxt_idx = np.where(j[None, :] + 1 >= C[:, None], 0, j[None, :] + 1)
    Pn = np.take_along_axis(P, nxt_idx[:, :, None], axis=1)
    side_n = np.take_along_axis(side, nxt_idx, axis=1)
    inside_n = side_n >= 0
    cross = (inside != (inside_n & valid)) & valid
    emit = inside.astype(np.int64) + cross.astype(np.int64)
    pos_end = np.cumsum(emit, axis=1)
    pos_start = pos_end - emit
    newC = np.where(C > 0, pos_end[np.arange(n), np.maximum(C - 1, 0)], 0)
    Lout = max(int(newC.max()) if n else 0, 1)
    out = np.zeros((n, Lout, 2), dtype=np.float64)
    rows, cols = np.nonzero(inside)
    out[rows, pos_start[rows, cols]] = P[rows, cols]
    denom = side - side_n
    safe = np.where(denom == 0, 1.0, denom)
    t = side / safe
    Q = P + t[:, :, None] * (Pn - P)
    rows2, cols2 = np.nonzero(cross)
    out[rows2, (pos_start + inside)[rows2, cols2]] = Q[rows2, cols2]
    return out, newC


def clip_rings_by_convex_batch(P: np.ndarray, C: np.ndarray,
                               CP: np.ndarray, CC: np.ndarray
                               ) -> tuple[np.ndarray, np.ndarray]:
    """Clip n padded OPEN subject rings by n padded OPEN convex CCW clipper
    rings — loops over clip-edge SLOTS (max clipper vertex count); each
    slot is one batched half-plane pass over every row.  Rows whose clipper
    has fewer edges get a keep-everything sentinel half-plane for the spare
    slots.  CONVEX x CONVEX only (single connected output guaranteed);
    concave subjects need the splitting kernels instead."""
    n = len(C)
    if n == 0:
        return P, C
    Lc = CP.shape[1]
    big = float(np.abs(P).max() if P.size else 1.0) * 4 + 4.0
    for k in range(Lc):
        act = k < CC
        if not act.any():
            break
        k2 = np.where(k + 1 >= CC, 0, k + 1)
        A = CP[:, k].copy()
        B = np.take_along_axis(CP, k2[:, None, None].repeat(2, axis=2),
                               axis=1)[:, 0]
        D = B - A
        # sentinel: x <= big keeps every point of inactive rows
        A[~act] = (big, 0.0)
        D[~act] = (0.0, 1.0)
        P, C = _clip_pass_halfplane(P, C, A, D)
    return P, C


def padded_rings_have_repeats(P: np.ndarray, C: np.ndarray) -> np.ndarray:
    """bool[n]: which padded OPEN rings revisit a vertex — batched (complex
    sort per row; invalid slots filled with unique sentinels so padding
    never collides)."""
    n, L, _ = P.shape
    j = np.arange(L)
    invalid = j[None, :] >= C[:, None]
    key = P[:, :, 0] + 1j * P[:, :, 1]
    key = np.where(invalid, np.inf + 1j * j[None, :], key)
    skey = np.sort(key, axis=1)
    if L < 2:
        return np.zeros(n, dtype=bool)
    return (skey[:, 1:] == skey[:, :-1]).any(axis=1)


def padded_rect_clip_split_flags(P: np.ndarray, C: np.ndarray,
                                 rects: np.ndarray) -> np.ndarray:
    """bool[n]: which SH-clipped padded OPEN rings contain two OVERLAPPING
    collinear edges on a clip-rect boundary.  A simple traced ring cannot
    have overlapping edges, so (this | padded_rings_have_repeats) exactly
    characterizes outputs that enclose disconnected pieces joined by
    zero-width bridges.  Fully batched: per boundary, project on-boundary
    edges to 1-D intervals, sort by lo, flag cummax(hi) > next lo."""
    n, L, _ = P.shape
    if n == 0 or L < 2:
        return np.zeros(n, dtype=bool)
    j = np.arange(L)
    valid = j[None, :] < C[:, None]
    nxt = np.where(j[None, :] + 1 >= C[:, None], 0, j[None, :] + 1)
    Pn = np.take_along_axis(P, nxt[:, :, None], axis=1)
    flags = np.zeros(n, dtype=bool)
    for axis, bidx in ((0, 0), (0, 2), (1, 1), (1, 3)):
        bound = rects[:, bidx]
        on = valid & (P[:, :, axis] == bound[:, None]) \
            & (Pn[:, :, axis] == bound[:, None])
        if not on.any():
            continue
        o = 1 - axis
        lo = np.where(on, np.minimum(P[:, :, o], Pn[:, :, o]), np.inf)
        hi = np.where(on, np.maximum(P[:, :, o], Pn[:, :, o]), np.inf)
        order = np.argsort(lo, axis=1, kind="stable")
        lo_s = np.take_along_axis(lo, order, axis=1)
        hi_s = np.take_along_axis(hi, order, axis=1)
        cum = np.maximum.accumulate(hi_s, axis=1)
        # strict >: merely-touching endpoints are the repeated-vertex case
        ov = (cum[:, :-1] > lo_s[:, 1:]) & np.isfinite(lo_s[:, 1:])
        flags |= ov.any(axis=1)
    return flags


def padded_ring_areas(P: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Signed shoelace areas of padded open rings, batched."""
    n, L, _ = P.shape
    j = np.arange(L)
    valid = j[None, :] < C[:, None]
    nxt_idx = np.where(j[None, :] + 1 >= C[:, None], 0, j[None, :] + 1)
    Pn = np.take_along_axis(P, nxt_idx[:, :, None], axis=1)
    cr = P[:, :, 0] * Pn[:, :, 1] - Pn[:, :, 0] * P[:, :, 1]
    return np.where(valid, cr, 0.0).sum(axis=1) / 2.0
