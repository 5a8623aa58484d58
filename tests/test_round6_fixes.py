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


class TestRealImageDecode:
    def test_png_roundtrip_all_filters_and_shapes(self):
        import numpy as np
        from sgspark.media import encode_png, decode_png, decode_ppm
        rng = np.random.RandomState(0)
        for shape in [(7, 5), (11, 13, 3), (6, 4, 4), (1, 1),
                      (3, 200, 3), (40, 1), (2, 2, 2)]:
            px = rng.randint(0, 256, shape).astype(np.uint8)
            for fm in ("cycle", "none"):
                out = decode_png(encode_png(px, filter_mode=fm))
                want = px[:, :, None] if px.ndim == 2 else px
                assert (out == want).all(), (shape, fm)
        px = rng.randint(0, 256, (9, 7, 3)).astype(np.uint8)
        assert (decode_ppm(b"P6\n7 9\n255\n" + px.tobytes()) == px).all()

    def test_third_party_png_conformance(self):
        """Decode PNGs encoded by OTHER encoders (shipped with the OS) —
        guards against a symmetric encoder/decoder bug.  Known dims:
        the git logo is 72x27 RGB, the Sphinx file icon 16x16 RGBA."""
        import os
        from sgspark.media import decode_png
        fixtures = [("/usr/share/gitweb/static/git-logo.png", (27, 72, 3)),
                    ("/usr/share/doc/python3/_static/file.png", (16, 16, 4))]
        checked = 0
        for path, shape in fixtures:
            if not os.path.exists(path):
                continue
            px = decode_png(open(path, "rb").read())
            assert px.shape == shape
            assert px.max() == 255
            checked += 1
        if checked == 0:
            import pytest
            pytest.skip("no OS png fixtures on this box")

    def test_unsupported_falls_back(self):
        import pytest
        from sgspark.media import real_decode
        with pytest.raises(NotImplementedError):
            real_decode(b"\xff\xd8\xffJPEG-ish")
        with pytest.raises(ValueError):
            real_decode(b"\x89PNG\r\n\x1a\nbroken")

    def test_decode_image_stats_distributed(self, spark):
        """Full Spark pipeline: synth -> encode -> real decode -> stats;
        numpy recomputation as the oracle, plus the fake fallback for
        an undecodable payload."""
        import numpy as np
        from pyspark.sql import functions as F
        from sgspark.media import synth_images, decode_image_stats
        ids = spark.range(40).select(F.col("id").alias("doc_id"))
        out = decode_image_stats(synth_images(ids)).toPandas() \
            .set_index("doc_id").sort_index()
        for did in range(40):
            w, h = 4 + did % 13, 4 + did % 11
            c = 3 if did % 3 == 0 else 1
            x, y, ch = np.arange(w), np.arange(h), np.arange(c)
            v = (x[None, :, None] * 7 + y[:, None, None] * 13 +
                 ch[None, None, :] * 17 + did * 31) % 256
            r = out.loc[did]
            assert (r.width, r.height, r.channels) == (w, h, c)
            assert r.px_sum == v.sum() and r.px_min == v.min() \
                and r.px_max == v.max()
            assert r.media_kind == ("ppm" if did % 5 == 0 else "png")
        # fake fallback path keeps the pipeline total
        bad = spark.createDataFrame([(99, bytearray(b"JPEG?"))],
                                    "doc_id long, payload binary")
        fb = decode_image_stats(bad).collect()[0]
        assert fb.media_kind == "fake" and fb.channels == 0


class TestChainedPackConnectors:
    """The chained-vertex pack's skip mask, probed at its adversarial
    corner: a point EXACTLY ON the connector segment between two arcs
    must not read as on-boundary (crossing/on-edge/distance must all
    ignore connector slots) — in the unrolled codegen tiers AND the
    interpreted lambda fallback."""

    def _df(self, spark, vx, vy, skip_words):
        probes = [(10.0, 5.0, False), (5.0, 0.0, True), (3.0, 7.0, False)]
        sk0 = skip_words[0] if skip_words else 0
        rows = [(px, py, False, 0, False, vx, vy, skip_words, sk0, want)
                for px, py, want in probes]
        return spark.createDataFrame(
            rows, "__px double, __py double, __isrect boolean, __base int,"
                  " __vert boolean, __evx array<double>,"
                  " __evy array<double>, __eskip array<bigint>,"
                  " __esk0 bigint, want boolean")

    @staticmethod
    def _words(skip_slots, n_slots):
        from sgspark.joins import _skip_words
        return _skip_words(skip_slots, n_slots)

    def test_unrolled_tier_skips_connectors(self, spark):
        from pyspark.sql import functions as F
        from sgspark.joins import _pip_dispatch_sql, _point_poly_dist_sql
        # two horizontal edges of the unit-10 square, vertical sides NOT
        # packed: (0,0)-(10,0), connector slot 1, (10,10)-(0,10).  Probe
        # (10,5) lies exactly ON the connector segment.
        vx, vy = [0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 10.0, 10.0]
        df = self._df(spark, vx, vy, self._words([1], 3))
        got = df.withColumn("pip", F.expr(_pip_dispatch_sql(
            "__e", "__px", "__py", "__isrect", "__base"))) \
            .withColumn("dist", F.expr(_point_poly_dist_sql(
                "__e", "__px", "__py", "__base"))).collect()
        for r in got:
            assert r["pip"] == r["want"], (r["__px"], r["__py"])
        d = {(r["__px"], r["__py"]): r["dist"] for r in got}
        # distance ignores the connector: (10,5) is 5 from both real
        # edges, NOT 0 (the connector distance)
        assert d[(10.0, 5.0)] == 5.0
        assert d[(5.0, 0.0)] == 0.0

    def test_interpreted_fallback_skips_connectors(self, spark):
        from pyspark.sql import functions as F
        from sgspark.joins import _pip_sql, _point_poly_dist_sql
        # same shape padded with 18 far-away single-edge arcs so slots
        # exceed the 32-term tier -> the interpreted lambda evaluates;
        # connectors land on the odd 0-based slots
        vx, vy, skip = [0.0, 10.0], [0.0, 0.0], []
        for k in range(18):
            skip.append(len(vx) - 1)
            vx += [1000.0 + k, 1001.0 + k]
            vy += [1000.0, 1001.0]
        skip.append(len(vx) - 1)
        vx += [10.0, 0.0]
        vy += [10.0, 10.0]
        slots = len(vx) - 1
        assert slots > 32
        df = self._df(spark, vx, vy, self._words(skip, slots))
        got = df.withColumn("pip", F.expr(
            "(" + _pip_sql("__e", "__px", "__py", "__base") + ")")) \
            .withColumn("dist", F.expr(_point_poly_dist_sql(
                "__e", "__px", "__py", "__base"))).collect()
        for r in got:
            assert r["pip"] == r["want"], (r["__px"], r["__py"])
        d = {(r["__px"], r["__py"]): r["dist"] for r in got}
        assert d[(10.0, 5.0)] == 5.0


class TestPngVariantDecodes:
    """Color types the synth/roundtrip tests don't reach: palette (3,
    with and without tRNS) and gray+alpha (4) — PNG bytes handcrafted
    from the spec, decoded by the engine's zlib+numpy path."""

    @staticmethod
    def _png(ihdr_color, raws, plte=None, trns=None, w=3, h=2):
        import struct
        import zlib

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body +
                    struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

        out = b"\x89PNG\r\n\x1a\n"
        out += chunk(b"IHDR", struct.pack(
            ">IIBBBBB", w, h, 8, ihdr_color, 0, 0, 0))
        if plte is not None:
            out += chunk(b"PLTE", plte)
        if trns is not None:
            out += chunk(b"tRNS", trns)
        out += chunk(b"IDAT", zlib.compress(raws))
        out += chunk(b"IEND", b"")
        return out

    def test_palette_png(self):
        import numpy as np
        from sgspark.media import decode_png
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
        raws = bytes([0, 0, 1, 2]) + bytes([0, 2, 1, 0])  # filter0 rows
        px = decode_png(self._png(3, raws, plte=plte))
        assert px.shape == (2, 3, 3)
        assert (px[0, 0] == [255, 0, 0]).all()
        assert (px[0, 1] == [0, 255, 0]).all()
        assert (px[1, 0] == [0, 0, 255]).all()
        # with tRNS: alpha channel appended, index 0 transparent
        px2 = decode_png(self._png(3, raws, plte=plte,
                                   trns=bytes([0])))
        assert px2.shape == (2, 3, 4)
        assert px2[0, 0, 3] == 0 and px2[0, 1, 3] == 255

    def test_gray_alpha_png(self):
        from sgspark.media import decode_png
        # 3x2 gray+alpha, filter 0: (gray, alpha) pairs
        row0 = bytes([0, 10, 255, 128, 20, 99])
        row1 = bytes([7, 0, 8, 1, 9, 2])
        px = decode_png(self._png(4, bytes([0]) + row0 + bytes([0]) + row1))
        assert px.shape == (2, 3, 2)
        assert px[0, 1, 0] == 255 and px[0, 1, 1] == 128
        assert px[1, 2, 0] == 9 and px[1, 2, 1] == 2
