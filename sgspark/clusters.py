"""Connected-component clustering of overlapping geometries.

Reference: `get_cluster_mapper` / `get_polygon_clusters`
(`/root/reference/src/sgis/geopandas_tools/polygon_operations.py:59-223`) —
networkx connected components over rtree-intersection pairs.

Spark mapping (SURVEY.md §2.7, §7 M6): edges from a self spatial join;
components via min-label propagation WITH POINTER JUMPING (each round also
shortcuts label(v) <- label(label(v))), the classic O(log diameter)
accelerated CC — plain propagation needs diameter-many rounds, which a long
polygon chain at 100x scale turns into hundreds of shuffles.  The loop is a
driver-coordinated fixpoint; lineage is cut with localCheckpoint so plans
don't grow unboundedly; exhaustion of max_iter RAISES instead of silently
splitting components.
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
        # pointer jumping: label(v) <- label(label(v)).  Labels only
        # decrease, so this halves the remaining pointer-chain length each
        # round -> O(log diameter) rounds overall instead of O(diameter).
        lab2 = new_labels.select(F.col("a").alias("__p"),
                                 F.col("label").alias("__plabel"))
        new_labels = (new_labels
                      .join(lab2, new_labels["label"] == lab2["__p"], "left")
                      .select("a", F.least(F.col("label"),
                                           F.coalesce("__plabel", "label")
                                           ).alias("label")))
        # convergence check rides the checkpoint-materializing job: carry
        # the previous label through the round, lazy localCheckpoint, and
        # count() both materializes and counts — ONE Spark job per round
        # (VERDICT r2 directive 7)
        prev = labels.select("a", F.col("label").alias("__prev"))
        new_labels = (new_labels.join(prev, "a")
                      .withColumn("__chg", F.col("label") != F.col("__prev"))
                      .drop("__prev")
                      .localCheckpoint(eager=False))
        changed = new_labels.where("__chg").count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            return labels.select(F.col("a").alias(id_col),
                                 F.col("label").alias("cluster"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the component graph is deeper than expected — raise max_iter")


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
