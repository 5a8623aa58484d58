"""Connected-component clustering of overlapping geometries.

Reference: `get_cluster_mapper` / `get_polygon_clusters`
(`/root/reference/src/sgis/geopandas_tools/polygon_operations.py:59-223`) —
networkx connected components over rtree-intersection pairs.

Spark mapping (SURVEY.md §2.7, §7 M6): edges from a self spatial join;
components via iterative min-label propagation (driver-coordinated fixpoint
loop, the standard Spark CC pattern).  Converges in O(log n) rounds for
realistic overlap graphs; each round is one shuffle; lineage cut with
localCheckpoint so plans don't grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .joins import sjoin_pairs


def connected_components(edges: DataFrame, vertices: DataFrame, *,
                         src: str = "src", dst: str = "dst",
                         id_col: str = "id", max_iter: int = 50) -> DataFrame:
    """Min-label propagation. edges: (src, dst) ids; vertices: (id).
    Returns (id, cluster) where cluster = min id in the component."""
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
           .distinct())
    sym = sym.localCheckpoint()
    labels = vertices.select(F.col(id_col).alias("a"),
                             F.col(id_col).alias("label"))
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (sym.join(labels, "a")
                   .groupBy("b").agg(F.min("label").alias("nbr_label"))
                   .withColumnRenamed("b", "a"))
        new_labels = (labels.join(nbr_min, "a", "left")
                      .select("a", F.least(F.col("label"),
                                           F.coalesce("nbr_label", "label")
                                           ).alias("label")))
        new_labels = new_labels.localCheckpoint()
        changed = (new_labels.alias("n").join(labels.alias("o"), "a")
                   .where(F.col("n.label") != F.col("o.label")).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("a").alias(id_col), F.col("label").alias("cluster"))


def get_cluster_mapper(df: DataFrame, *, id_col: str,
                       gridsize: float = 2000.0,
                       predicate: str = "intersects") -> DataFrame:
    """(id, cluster) for rows of df whose geometries touch/overlap
    (`get_cluster_mapper`, polygon_operations.py:206-223).  Cluster labels
    are the minimum member id (deterministic, order-free — the reference
    uses positional ints, equal up to relabeling)."""
    pairs = sjoin_pairs(df, df, predicate, left_id=id_col, right_id=id_col,
                        gridsize=gridsize)
    pairs = pairs.toDF("src", "dst").where(F.col("src") != F.col("dst"))
    return connected_components(pairs, df.select(id_col), id_col=id_col)


def get_polygon_clusters(df: DataFrame, *, id_col: str,
                         gridsize: float = 2000.0,
                         cluster_col: str = "cluster") -> DataFrame:
    """Attach a `cluster` column (`get_polygon_clusters`,
    polygon_operations.py:59-203)."""
    mapper = get_cluster_mapper(df, id_col=id_col, gridsize=gridsize)
    if cluster_col != "cluster":
        mapper = mapper.withColumnRenamed("cluster", cluster_col)
    return df.join(mapper, id_col, "inner")
