"""k-nearest-neighbors join for point layers.

Reference: `get_k_nearest_neighbors` / `k_nearest_neighbors`
(`/root/reference/src/sgis/geopandas_tools/neighbors.py:298-488`) — BallTree
kNN with left-index preservation, distance+rank output contract
(tests/test_neighbors.py:99-114).

Spark plan (SURVEY.md §2.4 kNN row): ring-block candidate join + window
top-k, ALL JVM-side (no Python in the hot path at all):

  1. left points explode to the (2R+1)^2 cell block around their cell
     (sequence/explode — pure SQL), R chosen from the right layer's density;
  2. equi-join with right points on cell_key;
  3. row_number() over (partition by left order by distance², right_id) <= k;
  4. exactness guard: a left row is RESOLVED iff it found k candidates and
     its kth distance <= R*gridsize (any point outside the block is farther
     than R*gridsize by construction).  Unresolved lefts (sparse regions)
     fall back to a broadcast brute-force pass — the same two-phase
     ring-expansion idea as the reference's BallTree-over-chunks, made
     shuffle-friendly.

Ties: broken by right_id (deterministic), matching the reference's stable
kneighbors ordering contract only up to exact-tie permutations.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from .cells import FALSE_EASTING, Y_BITS


def _with_cell(df: DataFrame, x: str, y: str, gridsize: float) -> DataFrame:
    g = float(gridsize)
    return (df.withColumn("__cx", F.expr(f"cast(floor(({x} + {FALSE_EASTING}) / {g}) as bigint)"))
              .withColumn("__cy", F.expr(f"cast(floor(({y}) / {g}) as bigint)")))


def get_k_nearest_neighbors(left: DataFrame, right: DataFrame, k: int, *,
                            left_id: str = "left_id", right_id: str = "right_id",
                            lx: str = "x", ly: str = "y",
                            rx: str = "x", ry: str = "y",
                            gridsize: float | None = None,
                            ring: int | None = None) -> DataFrame:
    """Returns DataFrame[left_id, right_id ("neighbor_index"), distance, k_rank]
    with exactly min(k, |right|) rows per left row, ranked by distance.

    Output column names mirror the reference (`neighbors.py:436-443`):
    neighbor_index = right id, distance, k = 1-based rank.
    """
    n_right = right.count()
    if n_right == 0:
        raise ValueError("right side is empty")
    k_eff = min(k, n_right)

    if gridsize is None:
        # size cells so one cell holds ~2k points on average
        b = right.agg(F.min(rx), F.min(ry), F.max(rx), F.max(ry)).first()
        area = max((b[2] - b[0]) * (b[3] - b[1]), 1.0)
        density = n_right / area
        gridsize = max(np.sqrt(2.0 * max(k, 1) / density), 1.0)
    if ring is None:
        ring = 1
    g = float(gridsize)

    l = _with_cell(left.select(F.col(left_id).alias("__lid"),
                               F.col(lx).alias("__lx"), F.col(ly).alias("__ly")),
                   "__lx", "__ly", g)
    r = _with_cell(right.select(F.col(right_id).alias("__rid"),
                                F.col(rx).alias("__rx"), F.col(ry).alias("__ry")),
                   "__rx", "__ry", g)
    r = r.withColumn("cell_key", F.expr(f"__cx * {1 << Y_BITS} + __cy")) \
         .drop("__cx", "__cy")

    R = int(ring)
    lexp = (l.withColumn("__nx", F.explode(F.expr(f"sequence(__cx - {R}, __cx + {R})")))
             .withColumn("__ny", F.explode(F.expr(f"sequence(__cy - {R}, __cy + {R})")))
             .withColumn("cell_key", F.expr(f"__nx * {1 << Y_BITS} + __ny"))
             .drop("__cx", "__cy", "__nx", "__ny"))

    cand = lexp.join(r, "cell_key", "inner")
    cand = cand.withColumn(
        "__d2", (F.col("__lx") - F.col("__rx")) ** 2 + (F.col("__ly") - F.col("__ry")) ** 2)
    w = Window.partitionBy("__lid").orderBy(F.col("__d2").asc(), F.col("__rid").asc())
    topk = (cand.withColumn("k", F.row_number().over(w))
                .where(F.col("k") <= k_eff))

    safe = (float(R) * g) ** 2
    per_left = topk.groupBy("__lid").agg(
        F.count("*").alias("__n"), F.max("__d2").alias("__dk"))
    resolved_ids = per_left.where((F.col("__n") == k_eff) & (F.col("__dk") <= safe)) \
                           .select("__lid")
    resolved = topk.join(resolved_ids, "__lid", "left_semi")

    # fallback: brute force for the (rare) unresolved lefts
    unresolved = l.select("__lid", "__lx", "__ly") \
                  .join(resolved_ids, "__lid", "left_anti")
    rb = F.broadcast(r.select("__rid", "__rx", "__ry"))
    brute = (unresolved.crossJoin(rb)
             .withColumn("__d2", (F.col("__lx") - F.col("__rx")) ** 2 +
                         (F.col("__ly") - F.col("__ry")) ** 2)
             .withColumn("k", F.row_number().over(w))
             .where(F.col("k") <= k_eff))

    out = resolved.select("__lid", "__rid", "__d2", "k").unionByName(
        brute.select("__lid", "__rid", "__d2", "k"))
    return out.select(F.col("__lid").alias(left_id),
                      F.col("__rid").alias("neighbor_index"),
                      F.sqrt("__d2").alias("distance"),
                      "k")


def k_nearest_neighbors(from_xy: np.ndarray, to_xy: np.ndarray, k: int
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Array-level kernel (reference `neighbors.py:455-488`): brute-force
    numpy kNN, used inside batch kernels and as the test oracle."""
    d2 = ((from_xy[:, None, :] - to_xy[None, :, :]) ** 2).sum(axis=2)
    k_eff = min(k, to_xy.shape[0])
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k_eff]
    dists = np.sqrt(np.take_along_axis(d2, idx, axis=1))
    return dists, idx
