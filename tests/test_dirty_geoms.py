"""Robustness-ladder tests: dirty geometry through polygon_boolean
(repeated vertices, shared/collinear edges, vertex-on-edge) — the
GridSizeOverlayRunner-style escalation of VERDICT round-1 item 10.
Areas asserted to 1e-4 (the ladder may perturb by <=1e-6 of coordinate
magnitude)."""

import numpy as np
import pytest

from sgspark.geom.clip import polygon_boolean, ring_area


def rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    float)


def area(parts):
    return sum(ring_area(r) for p in parts for r in p)


DIRTY_A = np.array([  # repeated vertices + collinear midpoints
    [0, 0], [5, 0], [5, 0], [10, 0], [10, 5], [10, 10],
    [0, 10], [0, 10], [0, 0]], float)


@pytest.mark.parametrize("op,want", [
    ("intersection", 25.0),   # shares edge x=10? no: B offset overlaps
    ("difference", 75.0),
    ("union", 175.0),
])
def test_repeated_vertices(op, want):
    B = rect(5, 5, 15, 15)
    got = area(polygon_boolean([[DIRTY_A]], [[B]], op))
    assert got == pytest.approx(want, abs=1e-4)


@pytest.mark.parametrize("op,want", [
    ("intersection", 0.0),
    ("difference", 100.0),
    ("union", 200.0),
])
def test_shared_edge(op, want):
    """Collinear shared edge between A and B — the classic degenerate."""
    A = rect(0, 0, 10, 10)
    B = rect(10, 0, 20, 10)
    got = area(polygon_boolean([[A]], [[B]], op))
    assert got == pytest.approx(want, abs=1e-3)


@pytest.mark.parametrize("op,want", [
    ("intersection", 12.5),  # the diamond quadrant below-left of (10,10)
    ("difference", 87.5),
])
def test_vertex_on_edge(op, want):
    """B's corner lies exactly on A's edge."""
    A = rect(0, 0, 10, 10)
    B = np.array([[5, 10], [10, 5], [15, 10], [10, 15], [5, 10]], float)
    # B is a diamond whose two corners sit ON A's top edge / right edge
    got = area(polygon_boolean([[A]], [[B]], op))
    assert got == pytest.approx(want, abs=1e-3)


def test_identical_rings():
    A = rect(0, 0, 10, 10)
    assert area(polygon_boolean([[A]], [[A.copy()]], "intersection")) == \
        pytest.approx(100.0, abs=1e-3)
    assert area(polygon_boolean([[A]], [[A.copy()]], "difference")) == \
        pytest.approx(0.0, abs=1e-3)
    assert area(polygon_boolean([[A]], [[A.copy()]], "union")) == \
        pytest.approx(100.0, abs=1e-3)


def test_overlapping_collinear_partial():
    """B overlaps A with two collinear edges (partial overlap segment)."""
    A = rect(0, 0, 10, 10)
    B = rect(5, 0, 15, 10)  # shares bottom/top edge lines with A
    assert area(polygon_boolean([[A]], [[B]], "intersection")) == \
        pytest.approx(50.0, abs=1e-3)
    assert area(polygon_boolean([[A]], [[B]], "difference")) == \
        pytest.approx(50.0, abs=1e-3)
    assert area(polygon_boolean([[A]], [[B]], "union")) == \
        pytest.approx(150.0, abs=1e-3)


def test_rect_minus_rects_random_differential():
    """rectops.rect_minus_rects vs an independent interval-arithmetic area
    oracle over 50 random rect sets (deterministic seed)."""
    rng = np.random.RandomState(7)
    for trial in range(50):
        W = (0.0, 0.0, 100.0, 100.0)
        k = rng.randint(1, 30)
        x0 = rng.uniform(-20, 90, k)
        y0 = rng.uniform(-20, 90, k)
        rects = np.column_stack([x0, y0,
                                 x0 + rng.uniform(1, 40, k),
                                 y0 + rng.uniform(1, 40, k)])
        from sgspark.geom.rectops import rect_minus_rects
        res = rect_minus_rects(W, rects)
        got = sum(ring_area(r) for p in (res or []) for r in p)
        # oracle: coordinate-compression area sum (area-only, no tracing)
        xs = np.unique(np.concatenate(
            [[W[0], W[2]], np.clip(rects[:, 0], W[0], W[2]),
             np.clip(rects[:, 2], W[0], W[2])]))
        ys = np.unique(np.concatenate(
            [[W[1], W[3]], np.clip(rects[:, 1], W[1], W[3]),
             np.clip(rects[:, 3], W[1], W[3])]))
        cov = np.zeros((len(xs) - 1, len(ys) - 1), bool)
        for r in rects:
            i0, i1 = np.searchsorted(xs, np.clip(r[0], W[0], W[2])), \
                np.searchsorted(xs, np.clip(r[2], W[0], W[2]))
            j0, j1 = np.searchsorted(ys, np.clip(r[1], W[1], W[3])), \
                np.searchsorted(ys, np.clip(r[3], W[1], W[3]))
            cov[i0:i1, j0:j1] = True
        w = np.diff(xs)[:, None] * np.diff(ys)[None, :]
        want = float(w[~cov].sum())
        assert got == pytest.approx(want, abs=1e-9), f"trial {trial}"
