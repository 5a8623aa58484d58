"""JVM-compiled polygon x polygon `intersects` (round 5).

The compiled composition (_polys_vs_polys_jvm) — segment-crossing +
head(A)-in-B via the segment path, head(B)-in-A via a broadcast of the
collected right's head points onto a cover-cell pack of the LEFT — must
agree pair-for-pair with the Arrow kernel (predicates._geom_geom_intersects:
any ring crossing, else chains[0][0] containment probes both ways) on
rect / concave / holed / multipart / high-vertex layers, including
containment without crossing in BOTH directions, hole-nested disjoint
pairs, shared edges, vertex touches and self-joins."""

import os

import numpy as np
import pytest

from sgspark.conf import config_override
from sgspark.joins import PATH_STATS, sjoin_pairs
from tests.test_seg_poly_jvm import POLYS, _geom_df, pair_set

LEFTS = POLYS + [
    "POLYGON ((2 1, 4 1, 4 3, 2 3, 2 1))",            # inside rect (A in B)
    "POLYGON ((-5 -5, 75 -5, 75 15, -5 15, -5 -5))",  # contains most (B in A)
    "POLYGON ((24 4, 26 4, 26 6, 24 6, 24 4))",       # inside the hole
    "POLYGON ((5 3, 11 3, 11 5, 5 5, 5 3))",          # straddles rect + L
    "POLYGON ((6 4, 8 4, 8 6, 6 6, 6 4))",            # corner touch w/ rect
    "POLYGON ((0 4, 6 4, 6 8, 0 8, 0 4))",            # shares rect top edge
    "POLYGON ((200 200, 201 200, 201 201, 200 201, 200 200))",  # far away
    # holed left whose hole swallows the first multipolygon island
    "POLYGON ((38 -2, 52 -2, 52 12, 38 12, 38 -2), "
    "(39 -1, 45 -1, 45 5, 39 5, 39 -1))",
]


def _random_polys(n=120, seed=23):
    rng = np.random.RandomState(seed)
    wkts = []
    for i in range(n):
        cx, cy = rng.uniform(-5, 95), rng.uniform(-5, 15)
        r = rng.uniform(0.3, 6.0)
        kind = i % 3
        if kind == 0:  # rotated triangle
            a0 = rng.uniform(0, 2 * np.pi)
            pts = [(cx + r * np.cos(a0 + t), cy + r * np.sin(a0 + t))
                   for t in (0.0, 2.2, 4.4)]
        elif kind == 1:  # axis-aligned rect
            pts = [(cx - r, cy - r), (cx + r, cy - r),
                   (cx + r, cy + r), (cx - r, cy + r)]
        else:  # concave star pentagon
            pts = [(cx + (r if k % 2 == 0 else 0.4 * r) * np.cos(
                        2 * np.pi * k / 10),
                    cy + (r if k % 2 == 0 else 0.4 * r) * np.sin(
                        2 * np.pi * k / 10)) for k in range(10)]
        pts.append(pts[0])
        wkts.append("POLYGON ((" + ", ".join(
            f"{x!r} {y!r}" for x, y in pts) + "))")
    return wkts


def _run(l, r, force, lid="lid", rid="rid"):
    PATH_STATS.clear()
    with config_override(use_jvm_poly2=force):
        out = sjoin_pairs(l, r, "intersects", left_id=lid, right_id=rid)
        s = pair_set(out)
    return s, dict(PATH_STATS)


@pytest.mark.parametrize("gridsize", [2000.0, 5.0])
def test_poly_poly_paths_agree(spark, gridsize):
    l = _geom_df(spark, LEFTS, "lid")
    r = _geom_df(spark, POLYS, "rid")
    PATH_STATS.clear()
    with config_override(use_jvm_poly2=False):
        k = pair_set(sjoin_pairs(l, r, "intersects", left_id="lid",
                                 right_id="rid", gridsize=gridsize))
        assert PATH_STATS.get("kernel_bcast") == 1
    PATH_STATS.clear()
    with config_override(use_jvm_poly2=True):
        j = pair_set(sjoin_pairs(l, r, "intersects", left_id="lid",
                                 right_id="rid", gridsize=gridsize))
        assert PATH_STATS.get("jvm_polys2_bcast") == 1
    assert k == j


def test_poly_poly_random_agree(spark):
    l = _geom_df(spark, _random_polys(), "lid")
    r = _geom_df(spark, POLYS + _random_polys(40, seed=7), "rid")
    k, _ = _run(l, r, False)
    j, pj = _run(l, r, True)
    assert pj.get("jvm_polys2_bcast") == 1
    assert k == j
    assert len(k) > 50  # non-trivial overlap corpus


def test_poly_poly_self_join(spark):
    wkts = POLYS + _random_polys(60, seed=41)
    df = _geom_df(spark, wkts, "pid")
    k, _ = _run(df, df, False, lid="pid", rid="pid")
    j, _ = _run(df, df, True, lid="pid", rid="pid")
    assert k == j
    # every geometry intersects itself: the identity diagonal is present
    assert {(i, i) for i in range(len(wkts))} <= j


def test_poly2_auto_gate_prefers_kernel_on_small_layers(spark):
    """Default routing (use_jvm_poly2=None, no env force): polygon x
    polygon stays on the Arrow kernel — the compiled composition is
    opt-in only (it measured slower at every tested configuration;
    see joins._poly2_wanted)."""
    if os.environ.get("SGSPARK_POLY2") in ("0", "1"):
        pytest.skip("env override active")
    l = _geom_df(spark, LEFTS, "lid")
    r = _geom_df(spark, POLYS, "rid")
    PATH_STATS.clear()
    out = sjoin_pairs(l, r, "intersects", left_id="lid", right_id="rid")
    out.collect()
    assert "jvm_polys2_bcast" not in PATH_STATS


def test_poly2_mixed_left_falls_back(spark):
    """A line row in the left layer must route to the kernel (the
    compiled composition's containment term is polygon-only)."""
    l = _geom_df(spark, LEFTS + ["LINESTRING (1 1, 5 3)"], "lid")
    r = _geom_df(spark, POLYS, "rid")
    k, pk = _run(l, r, False)
    j, pj = _run(l, r, True)
    assert pj.get("jvm_polys2_bcast") is None
    assert pj.get("kernel_bcast") == 1
    assert k == j
