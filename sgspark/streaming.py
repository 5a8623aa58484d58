"""Structured Streaming surface.

The reference has NO streaming (SURVEY.md §2.12) — its incremental story
is checkpoint/resume, which sgspark/checkpoint.py covers.  This module
provides the Spark-native streaming equivalents for the engine's
operators that make sense incrementally, so the same pipeline can run on
a live document feed:

  * stream_documents  — file-source stream of document parquet drops
  * stream_tile_counts — watermarked sliding/tumbling tile aggregation
  * stream_pip_join   — stream-static join: streaming points vs a static
                        (broadcastable) zone layer — the streaming twin of
                        the PIP sjoin (static side cell-indexed once)

Stateful custom ops would use applyInPandasWithState; the batch engine's
kernels are reused as-is inside foreachBatch when full spatial machinery
is needed (micro-batch = the gridloop cell of the time dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .tiling import grid_id_expr


def stream_documents(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """File-source stream: every parquet dropped into `path` becomes a
    micro-batch of documents."""
    return spark.readStream.schema(schema).parquet(path)


def stream_tile_counts(events: DataFrame, *, x: str = "x", y: str = "y",
                       ts: str = "ts", gridsize: int = 1000,
                       window: str = "1 hour",
                       watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window tile counts: late rows beyond the
    watermark are dropped deterministically; state is bounded by
    (#tiles x window horizon)."""
    tiled = events.withColumn("tile_id", F.expr(grid_id_expr(x, y, gridsize)))
    return (tiled
            .withWatermark(ts, watermark)
            .groupBy(F.window(F.col(ts), window).alias("w"), F.col("tile_id"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "tile_id", "n"))


def stream_pip_join(points: DataFrame, zones: DataFrame, *,
                    gridsize: float = 2000.0, right_id: str = "zone_id"
                    ) -> DataFrame:
    """Stream-static PIP join: streaming points (x, y columns) against a
    static zone layer.  The static side is cell-cover exploded ONCE and
    broadcast; per micro-batch the points compute their cell key (pure
    SQL) and equi-join — no state store needed, exactness by the same
    numeric-interval predicate used in the batch oracle (zones carry
    cx/cy/r twin columns)."""
    from .cells import FALSE_EASTING, Y_BITS
    g = float(gridsize)
    z = zones.select(right_id, "cx", "cy", "r",
                     (F.col("cx") - F.col("r")).alias("minx"),
                     (F.col("cy") - F.col("r")).alias("miny"),
                     (F.col("cx") + F.col("r")).alias("maxx"),
                     (F.col("cy") + F.col("r")).alias("maxy"))
    z = (z.withColumn("__cx", F.explode(F.expr(
            f"sequence(cast(floor((minx + {FALSE_EASTING}) / {g}) as bigint), "
            f"cast(floor((maxx + {FALSE_EASTING}) / {g}) as bigint))")))
         .withColumn("__cy", F.explode(F.expr(
            f"sequence(cast(floor(miny / {g}) as bigint), "
            f"cast(floor(maxy / {g}) as bigint))")))
         .withColumn("cell_key", F.expr(f"__cx * {1 << Y_BITS} + __cy"))
         .select(right_id, "cx", "cy", "r", "cell_key"))
    p = points.withColumn(
        "cell_key",
        F.expr(f"cast(floor((x + {FALSE_EASTING}) / {g}) as bigint) "
               f"* {1 << Y_BITS} + cast(floor(y / {g}) as bigint)"))
    joined = p.join(F.broadcast(z), "cell_key")
    return (joined
            .where((F.abs(F.col("x") - F.col("cx")) <= F.col("r")) &
                   (F.abs(F.col("y") - F.col("cy")) <= F.col("r")))
            .drop("cell_key", "cx", "cy", "r"))


def stream_sessionize(events: DataFrame, *, id_col: str = "doc_id",
                      ts: str = "ts", gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """CUSTOM STATEFUL streaming operator: session windows per key with an
    inactivity gap, via the built-in session_window (state-store backed;
    the applyInPandasWithState escape hatch below is for logic
    session_window can't express).  Output: one row per closed session
    (key, session_start, session_end, n_events)."""
    return (events
            .withWatermark(ts, watermark)
            .groupBy(F.col(id_col), F.session_window(F.col(ts), gap))
            .agg(F.count("*").alias("n_events"))
            .select(id_col,
                    F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "n_events"))


def stream_running_extent(points: DataFrame, *, key: str = "zone_id"
                          ) -> DataFrame:
    """applyInPandasWithState custom stateful op: running bbox extent per
    key over a point stream — the streaming twin of get_total_bounds.
    State per key = 4 floats (bounded regardless of stream length); each
    micro-batch emits the key's updated extent."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (f"{key} long, minx double, miny double, "
                  "maxx double, maxy double")
    state_schema = "minx double, miny double, maxx double, maxy double"

    def update(k, pdfs, state):
        mnx = mny = float("inf")
        mxx = mxy = float("-inf")
        if state.exists:
            mnx, mny, mxx, mxy = state.get
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            mnx = min(mnx, float(pdf["x"].min()))
            mny = min(mny, float(pdf["y"].min()))
            mxx = max(mxx, float(pdf["x"].max()))
            mxy = max(mxy, float(pdf["y"].max()))
        state.update((mnx, mny, mxx, mxy))
        yield pd.DataFrame({key: [k[0]], "minx": [mnx], "miny": [mny],
                            "maxx": [mxx], "maxy": [mxy]})

    return points.groupBy(key).applyInPandasWithState(
        update, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout)
