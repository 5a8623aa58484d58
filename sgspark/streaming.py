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
