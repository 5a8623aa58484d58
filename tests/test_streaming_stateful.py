"""Custom stateful streaming ops: session windows + applyInPandasWithState
running extent (SURVEY §2.12 streaming twins)."""

import pandas as pd
import pytest


def test_stream_sessionize(spark, tmp_path):
    from sgspark.streaming import stream_sessionize
    src = tmp_path / "sess_src"
    src.mkdir()
    pdf = pd.DataFrame({
        "doc_id": [1, 1, 1, 2],
        "ts": pd.to_datetime(["2026-01-01 10:00", "2026-01-01 10:10",
                              "2026-01-01 12:00", "2026-01-01 10:05"])})
    spark.createDataFrame(pdf).write.parquet(str(src / "a.parquet"))
    stream = spark.readStream.schema("doc_id long, ts timestamp") \
        .parquet(str(src) + "/*")
    out = stream_sessionize(stream, gap="30 minutes", watermark="1 minute")
    q = (out.writeStream.format("memory").queryName("sessions")
         .outputMode("append").start())
    q.processAllAvailable()
    # advance watermark with a late batch so earlier sessions close
    pdf2 = pd.DataFrame({
        "doc_id": [3], "ts": pd.to_datetime(["2026-01-02 00:00"])})
    spark.createDataFrame(pdf2).write.parquet(str(src / "b.parquet"))
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from sessions").collect()
    got = {(r.doc_id, r.n_events) for r in rows}
    # doc 1: one 2-event session + one 1-event session; doc 2: 1 event
    assert (1, 2) in got and (1, 1) in got and (2, 1) in got


def test_stream_running_extent(spark, tmp_path):
    from sgspark.streaming import stream_running_extent
    src = tmp_path / "ext_src"
    src.mkdir()
    pdf = pd.DataFrame({"zone_id": [1, 1, 2],
                        "x": [0.0, 10.0, 5.0], "y": [0.0, 4.0, 5.0]})
    spark.createDataFrame(pdf).write.parquet(str(src / "a.parquet"))
    stream = spark.readStream.schema("zone_id long, x double, y double") \
        .parquet(str(src) + "/*")
    out = stream_running_extent(stream)
    q = (out.writeStream.format("memory").queryName("extent")
         .outputMode("update").start())
    q.processAllAvailable()
    # second batch extends zone 1's bbox; state must carry over
    pdf2 = pd.DataFrame({"zone_id": [1], "x": [-5.0], "y": [20.0]})
    spark.createDataFrame(pdf2).write.parquet(str(src / "b.parquet"))
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from extent").collect()
    z1 = [r for r in rows if r.zone_id == 1]
    last = z1[-1]
    assert (last.minx, last.miny, last.maxx, last.maxy) == (-5.0, 0.0,
                                                            10.0, 20.0)
