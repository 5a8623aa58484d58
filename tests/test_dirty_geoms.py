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
