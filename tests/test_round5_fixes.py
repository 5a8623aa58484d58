"""Round-5 regression tests: ADVICE r4 fixes + directive work.

Covers:
  - wkb_gtype_col / wkb_gtype full-uint32 decode (ISO 3D/M codes, EWKB
    flags, big-endian) — ADVICE r4 #1
  - null-safe polygon-type probe in the JVM edge-pack path — ADVICE r4 #2
  - min-plus shortcut budget honored on the FIRST doubling — ADVICE r4 #3
"""
import struct

import pytest
from pyspark.sql import functions as F


def _wkb_point(x, y, code=1, byteorder="<"):
    """Hand-rolled WKB point with an arbitrary type code in the header."""
    bom = b"\x01" if byteorder == "<" else b"\x00"
    return bom + struct.pack(byteorder + "I", code) + struct.pack(
        byteorder + "dd", x, y)


class TestWkbGtypeDecode:
    CASES = [
        (1, 1), (3, 3), (6, 6),            # plain ISO 2D
        (1001, 1), (1003, 3), (2003, 3),   # ISO Z / M offsets
        (3006, 6),                          # ISO ZM multipolygon
        (0x80000003, 3),                    # EWKB Z flag
        (0x40000001, 1),                    # EWKB M flag
        (0xC0000006, 6),                    # EWKB ZM
    ]

    def test_python_twin(self):
        from sgspark.geom.wkb import wkb_gtype
        for code, want in self.CASES:
            assert wkb_gtype(_wkb_point(1, 2, code)) == want, hex(code)
            assert wkb_gtype(_wkb_point(1, 2, code, ">")) == want, hex(code)
        assert wkb_gtype(None) == 1
        assert wkb_gtype(b"\x01") == 1

    def test_jvm_column_matches_python(self, spark):
        from sgspark.geometry_types import wkb_gtype_col
        rows = []
        for code, want in self.CASES:
            rows.append((_wkb_point(1, 2, code), want))
            rows.append((_wkb_point(1, 2, code, ">"), want))
        df = spark.createDataFrame(rows, "geometry binary, want int")
        got = df.select(wkb_gtype_col("geometry").alias("got"),
                        "want").collect()
        for r in got:
            assert r["got"] == r["want"]

    def test_null_and_short(self, spark):
        from sgspark.geometry_types import wkb_gtype_col
        df = spark.createDataFrame([(None,), (b"\x01",)],
                                   "geometry binary")
        vals = [r[0] for r in
                df.select(wkb_gtype_col("geometry")).collect()]
        assert vals == [1, 1]


class TestNullSafeTypeProbe:
    def test_null_kind_routes_to_kernel(self, spark):
        """A right row with NULL geom_kind must force the kernel fallback
        (return None from the edge-pack builder), not silently enter the
        compiled PIP path."""
        from test_jvm_pip import zones_df, points_df
        from sgspark.joins import _points_vs_polygons_distributed
        zones = zones_df(spark).withColumn(
            "geom_kind",
            F.when(F.col("zid") == 0, F.lit(None).cast("string"))
            .otherwise(F.lit("polygon")))
        out = _points_vs_polygons_distributed(
            points_df(spark), zones, left_id="pid", right_id="zid",
            predicate="intersects", gridsize=7.0)
        assert out is None
        # all-polygon kinds (no NULL) still take the compiled path
        zones_ok = zones_df(spark).withColumn(
            "geom_kind", F.lit("polygon"))
        out2 = _points_vs_polygons_distributed(
            points_df(spark), zones_ok, left_id="pid", right_id="zid",
            predicate="intersects", gridsize=7.0)
        assert out2 is not None


class TestSrpSaltedBuckets:
    def test_salted_pair_sets_identical_on_hot_bucket(self, spark):
        """VERDICT r4 #2: SRP-LSH bucket self-joins are salted like simhash
        bands.  Fixture: 40 near-identical embeddings -> ONE hot bucket in
        every table.  The salted path (max_bucket=5) must produce the same
        pairs as unsalted, for both near-dups and top-k."""
        import numpy as np
        import pandas as pd
        from sgspark.vecops import (embedding_near_dups, cosine_topk_lsh,
                                    _salted_bucket_pairs)

        rng = np.random.RandomState(3)
        base = rng.uniform(-1, 1, 8)
        rows = [(int(i), (base + rng.uniform(-1e-3, 1e-3, 8)).tolist())
                for i in range(40)]
        vecs = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

        nd_plain = embedding_near_dups(
            vecs, 0.99, exact=False, n_bits=2, n_tables=4,
            max_bucket=1_000_000)
        nd_salt = embedding_near_dups(
            vecs, 0.99, exact=False, n_bits=2, n_tables=4, max_bucket=5)
        p = {tuple(r) for r in nd_plain.collect()}
        s = {tuple(r) for r in nd_salt.collect()}
        assert p == s and len(p) == 40 * 39 // 2  # all near-identical

        tk_plain = cosine_topk_lsh(vecs, 3, n_bits=2, n_tables=4,
                                   max_bucket=1_000_000)
        tk_salt = cosine_topk_lsh(vecs, 3, n_bits=2, n_tables=4,
                                  max_bucket=5)
        assert ({tuple(r) for r in tk_plain.collect()} ==
                {tuple(r) for r in tk_salt.collect()})

        # the salted build side really is bounded: no (bucket, salt) key
        # carries more than ~max_bucket probe rows
        bucketed = spark.createDataFrame(
            [(int(i), "hot") for i in range(40)], "a long, bucket string")
        counts = (bucketed
                  .join(bucketed.groupBy("bucket").count(), "bucket")
                  .withColumn("_s", F.ceil(F.col("count") / F.lit(5)))
                  .select(F.pmod(F.xxhash64(F.col("a")), F.col("_s"))
                          .alias("salt"))
                  .groupBy("salt").count().agg(F.max("count")).first()[0])
        assert counts <= 2 * 5  # hash-balanced probe keys


class TestSingleScanCheckpoint:
    def test_fresh_run_reads_input_once(self, spark, tmp_path):
        """VERDICT r4 #4: run_checkpointed must read the input O(1) times,
        not O(n_buckets).  The source is instrumented with an accumulator
        that counts every row materialization: after a fresh 8-bucket run
        the count must equal n_rows (one scan), not ~(2*8+1)*n_rows."""
        from sgspark.checkpoint import run_checkpointed, read_result, metrics

        n = 400
        acc = spark.sparkContext.accumulator(0)

        def counting_gen(batches):
            import pandas as pd
            for pdf in batches:
                acc.add(len(pdf))
                yield pd.DataFrame({"k": pdf["id"],
                                    "v": pdf["id"] * 2})

        src = spark.range(0, n, 1, 4).mapInPandas(
            counting_gen, schema="k long, v long")

        executed = run_checkpointed(
            spark, src, lambda df: df.withColumn("w", F.col("v") + 1),
            key_col="k", path=str(tmp_path / "ckpt"), job_id="j1",
            n_buckets=8)
        assert executed == 8
        # one materialization (the persist-backed fingerprint pass); allow
        # a little slack for a lost cached block being recomputed, but the
        # old behavior (~17 scans) must be far out of range
        assert acc.value <= 2 * n, acc.value

        out = read_result(spark, str(tmp_path / "ckpt"))
        assert out.count() == n
        m = metrics(spark, str(tmp_path / "ckpt"))
        rows = m.agg(F.sum("rows_in"), F.sum("rows_out")).first()
        assert rows[0] == n and rows[1] == n

        # resume: a second run with identical input executes 0 buckets
        acc2_before = acc.value
        executed2 = run_checkpointed(
            spark, src, lambda df: df.withColumn("w", F.col("v") + 1),
            key_col="k", path=str(tmp_path / "ckpt"), job_id="j1",
            n_buckets=8)
        assert executed2 == 0
        # the resume probe costs at most one more scan (the fingerprint)
        assert acc.value - acc2_before <= n


class TestShortcutBudgetFirstDoubling:
    def test_first_doubling_over_budget_returns_edges(self, spark):
        """With max_rows below the first-doubling row count, the
        pre-doubling relation (the edges themselves) must come back —
        no doubling accepted."""
        from sgspark.network import _min_plus_shortcuts
        edges = spark.createDataFrame(
            [(i, i + 1, 1.0) for i in range(20)], "u long, v long, w double"
        )
        T, hops, doublings = _min_plus_shortcuts(edges, max_rows=5)
        assert doublings == 0
        assert hops == 1
        # relation unchanged: same row count as input
        assert T.count() == 20
