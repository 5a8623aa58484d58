"""Round-6 verdict directives: conditional SRP salting (#2), schema-side
dim (#9), named API tails (#7)."""

import pytest
from pyspark.sql import functions as F

from conftest import spark  # noqa: F401


class TestConditionalSalting:
    def test_quiet_buckets_skip_salting_machinery(self, spark):
        """VERDICT r5 #2: when no bucket exceeds max_bucket, the plain
        self-join is taken — the physical plan must contain no salt
        replication (explode over sequence), while a hot-bucket input
        keeps it.  Pair sets equal either way (covered by
        TestSrpSaltedBuckets)."""
        from sgspark.vecops import _salted_bucket_pairs
        quiet = spark.createDataFrame(
            [(i, f"b{i % 10}") for i in range(40)], "a long, bucket string")
        plan_q = _salted_bucket_pairs(
            quiet, symmetric=False, max_bucket=100)._jdf \
            .queryExecution().executedPlan().toString()
        assert "sequence" not in plan_q and "Generate" not in plan_q

        hot = spark.createDataFrame(
            [(i, "hot") for i in range(40)], "a long, bucket string")
        plan_h = _salted_bucket_pairs(
            hot, symmetric=False, max_bucket=5)._jdf \
            .queryExecution().executedPlan().toString()
        assert "sequence" in plan_h or "Generate" in plan_h

    def test_quiet_and_hot_paths_agree(self, spark):
        from sgspark.vecops import _salted_bucket_pairs
        rows = [(i, f"b{i % 3}") for i in range(30)]
        df = spark.createDataFrame(rows, "a long, bucket string")
        plain = {tuple(r) for r in _salted_bucket_pairs(
            df, symmetric=True, max_bucket=1000).collect()}
        salted = {tuple(r) for r in _salted_bucket_pairs(
            df, symmetric=True, max_bucket=4).collect()}
        assert plain == salted and len(plain) == 3 * 10 * 9


class TestDimFromSchema:
    def test_lsh_no_first_probe_job(self, spark):
        """VERDICT r5 #9: the SRP bucket expression reads dim per-row as
        size(vec) — building the candidate DataFrame must not run any
        Spark job (the old .first() probe did)."""
        from sgspark.vecops import embedding_near_dups
        vecs = spark.createDataFrame(
            [(i, [float(i), float(i % 3), 1.0, -1.0]) for i in range(20)],
            "vec_id long, embedding array<double>")
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup(None) or [])
        # plan construction only (the salting short-circuit probe is the
        # single allowed job; exact=True has none at all)
        _ = embedding_near_dups(vecs, 0.9, exact=True)
        after = len(tracker.getJobIdsForGroup(None) or [])
        assert after == before

    def test_lsh_buckets_unchanged_by_rewrite(self, spark):
        """The size(vec)-based hash flat index must reproduce the literal
        dim form bit-for-bit: same integers into murmur3."""
        from sgspark.vecops import _srp_bucket_expr
        vecs = spark.createDataFrame(
            [(i, [float((i * 7 + j) % 5 - 2) for j in range(6)])
             for i in range(50)], "vec_id long, v array<double>")
        got = vecs.select(
            "vec_id", F.expr(_srp_bucket_expr("v", 4, table=1))
            .alias("b")).collect()
        # literal-dim twin (the pre-round-6 form), dim=6
        bits = []
        for b0 in range(4):
            b = 1 * 4 + b0
            t = (f"aggregate(transform(sequence(0, 5), i -> "
                 f"case when pmod(hash({b} * 6 + i), 2) = 0 "
                 f"then element_at(v, i + 1) "
                 f"else -element_at(v, i + 1) end), "
                 f"cast(0.0 as double), (acc, v) -> acc + v)")
            bits.append(f"(case when ({t}) >= 0 then {1 << b0} else 0 end)")
        want = vecs.select("vec_id",
                           F.expr(" + ".join(bits)).alias("b")).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))


class TestApiTails:
    def test_get_k_nearest_points_for_deadends(self, spark):
        """Three horizontal lines; the middle line's right deadend has the
        two other lines' segments nearby.  Brute-force oracle: nearest
        point on each candidate segment, ranked by distance."""
        from sgspark.io import wkt_to_wkb_df
        from sgspark.network import get_k_nearest_points_for_deadends
        lines = wkt_to_wkb_df(spark.createDataFrame(
            [(0, "LINESTRING (0 0, 10 0)"),
             (1, "LINESTRING (0 3, 11 3)"),
             (2, "LINESTRING (0 -4, 12 -4)")],
            "lid int, geometry_wkt string"))
        out = get_k_nearest_points_for_deadends(lines, 2, 6.0).toPandas()
        # every endpoint here is a deadend (6 nodes); check the node at
        # (10, 0): nearest points are (10, 3) on line 1 (d=3) and
        # (10, -4) on line 2 (d=4)
        me = out[out.node == "10.0_0.0"].sort_values("k_rank")
        assert len(me) == 2
        assert me.iloc[0].distance == 3.0 and me.iloc[0].x == 10.0 \
            and me.iloc[0].y == 3.0
        assert me.iloc[1].distance == 4.0 and me.iloc[1].y == -4.0
        # max_distance excludes: radius 2 leaves that deadend no candidate
        out2 = get_k_nearest_points_for_deadends(lines, 2, 2.0).toPandas()
        assert len(out2[out2.node == "10.0_0.0"]) == 0
        # same-line segments never match their own deadend
        assert not ((out.node == "0.0_0.0") & (out.y == 0.0)).any()

    def test_random_points_norway(self, spark):
        from sgspark.conversion import random_points_norway, _NORWAY_WKT
        out = random_points_norway(spark, 50, seed=7)
        pdf = out.toPandas()
        assert len(pdf) == 50
        # all points inside one of the three boundary polygons (verified
        # with the repo's own PIP kernel)
        from sgspark.geom.wkb import from_wkt
        from sgspark.geom.predicates import points_in_polygon_geom
        import numpy as np
        ga = from_wkt(list(_NORWAY_WKT))
        x, y = pdf.x.to_numpy(), pdf.y.to_numpy()
        inside = np.zeros(len(pdf), dtype=bool)
        for g in range(3):
            inside |= points_in_polygon_geom(x, y, ga, g)
        assert inside.all()
        # deterministic for a given seed
        again = random_points_norway(spark, 50, seed=7).toPandas()
        assert sorted(map(tuple, pdf.values.tolist())) == \
            sorted(map(tuple, again.values.tolist()))
