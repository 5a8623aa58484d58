"""Embedding similarity search (ANN) operators.

Brute-force quantized-cosine top-k as the exactness baseline, and a
sign-random-projection LSH-bucketed variant as the scale path.

Determinism design: embeddings are quantized to integers (round(x*1000))
BEFORE any arithmetic, so dot products and norms are exact integer sums —
associative, order-free, and bit-identical across engines (the float-sum
ordering trap is designed out).  Similarity = dot / sqrt(na*nb) on exact
integers -> identical doubles everywhere; rounded to 6dp for output.

Everything is JVM-side higher-order-function code (zip_with/aggregate) —
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

QUANT = 1000


def _quantized(df: DataFrame, vec_col: str, id_col: str, alias: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(alias),
        F.expr(f"transform({vec_col}, x -> cast(round(x * {QUANT}) as bigint))")
        .alias(f"q_{alias}"),
        F.expr(f"aggregate(transform({vec_col}, x -> cast(round(x * {QUANT}) as "
               f"bigint)), cast(0 as bigint), (acc, v) -> acc + v * v)")
        .alias(f"n_{alias}"))


def cosine_topk_bruteforce(vecs: DataFrame, k: int, *,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors per vector (quantized).  Broadcast
    cross join — the small-dimension baseline; use `cosine_topk_lsh` at
    scale.  Returns (vec_id, neighbor_id, sim, k_rank)."""
    a = _quantized(vecs, vec_col, id_col, "a")
    b = F.broadcast(_quantized(vecs, vec_col, id_col, "b"))
    pairs = (a.crossJoin(b)
             .where(F.col("a") != F.col("b"))
             .withColumn("dot", F.expr(
                 "aggregate(zip_with(q_a, q_b, (x, y) -> x * y), "
                 "cast(0 as bigint), (acc, v) -> acc + v)"))
             .withColumn("sim_raw",
                         F.col("dot") / F.sqrt(F.col("n_a").cast("double") *
                                               F.col("n_b").cast("double"))))
    # rank by the UNROUNDED similarity (exact across engines — integer dot /
    # sqrt of exact integers), so cross-engine ranking is identical
    w = Window.partitionBy("a").orderBy(F.col("sim_raw").desc(), F.col("b").asc())
    return (pairs.withColumn("k_rank", F.row_number().over(w))
            .where(F.col("k_rank") <= k)
            .select(F.col("a").alias(id_col), F.col("b").alias("neighbor_id"),
                    F.round("sim_raw", 6).alias("sim"),
                    F.col("k_rank").cast("long").alias("k_rank")))


def _srp_bucket_expr(vec_col: str, n_bits: int, dim: int,
                     table: int = 0) -> str:
    """Sign-random-projection bucket id: n_bits deterministic pseudo-random
    +-1 projections (weights from a fixed LCG over (table, bit, dim) — same
    on every executor, no state; each table gets INDEPENDENT projections)."""
    bits = []
    for b0 in range(n_bits):
        b = table * n_bits + b0
        # deterministic +-1 weight for (b, i): parity of an LCG value
        terms = f"aggregate(transform(sequence(0, {dim - 1}), i -> " \
                f"case when pmod((i + 1) * 2654435761 + {b} * 40503, 97) < 48 " \
                f"then element_at({vec_col}, i + 1) " \
                f"else -element_at({vec_col}, i + 1) end), " \
                f"cast(0.0 as double), (acc, v) -> acc + v)"
        bits.append(f"(case when ({terms}) >= 0 then {1 << b0} else 0 end)")
    return " + ".join(bits)


def cosine_topk_lsh(vecs: DataFrame, k: int, *, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_bits: int = 8,
                    n_tables: int = 2) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing an SRP
    bucket in any of `n_tables` tables, then exact quantized cosine.
    The scale path: bucket join instead of cross join."""
    dim = len(vecs.select(vec_col).first()[0])
    q = _quantized(vecs, vec_col, id_col, "a").cache()
    # bucket ids only (narrow rows); quantized arrays re-attached after dedup
    vids = vecs.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__v"))
    tables = []
    for t in range(n_tables):
        expr = _srp_bucket_expr("__v", n_bits, dim, table=t)
        tables.append(vids.select(
            "a", F.concat(F.lit(f"{t}:"), F.expr(expr).cast("string"))
            .alias("bucket")))
    bucketed = tables[0]
    for t in tables[1:]:
        bucketed = bucketed.unionByName(t)
    ids = (bucketed.join(bucketed.select(F.col("a").alias("b"), "bucket"),
                         "bucket")
           .where(F.col("a") != F.col("b"))
           .select("a", "b").distinct())
    cand = ids.join(q, "a") \
              .join(q.select(F.col("a").alias("b"), F.col("q_a").alias("q_b"),
                             F.col("n_a").alias("n_b")), "b")
    pairs = (cand.withColumn("dot", F.expr(
                "aggregate(zip_with(q_a, q_b, (x, y) -> x * y), "
                "cast(0 as bigint), (acc, v) -> acc + v)"))
             .withColumn("sim_raw",
                         F.col("dot") / F.sqrt(F.col("n_a").cast("double") *
                                               F.col("n_b").cast("double"))))
    w = Window.partitionBy("a").orderBy(F.col("sim_raw").desc(), F.col("b").asc())
    return (pairs.withColumn("k_rank", F.row_number().over(w))
            .where(F.col("k_rank") <= k)
            .select(F.col("a").alias(id_col), F.col("b").alias("neighbor_id"),
                    F.round("sim_raw", 6).alias("sim"),
                    F.col("k_rank").cast("long").alias("k_rank")))
