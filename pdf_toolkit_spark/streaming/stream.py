"""Streaming operators.

``stream_extraction`` is the incremental-ingest form of the batch job:
a parquet file-source stream over a landing directory; each micro-batch
runs the SAME pipeline (salt -> mapInPandas -> strip -> assemble) via
``foreachBatch`` and appends atomically. Exactly-once at the doc level
comes from two layers: the streaming checkpoint (file-source progress)
and the batch resume anti-join (doc-level idempotence even if a batch
replays).

``windowed_event_counts`` is the standard watermark + tumbling-window
aggregation, used for the engine's operational event stream.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..spark.job import run_extraction
from ..spark.schema import DOCUMENTS_RAW_SCHEMA


def stream_extraction(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: Optional[dict[str, Any]] = None,
    available_now: bool = True,
):
    """Continuously extract newly landed documents_raw parquet files.

    Returns the StreamingQuery; with ``available_now`` the query drains
    everything currently available and stops (test/batch-catchup mode).
    """

    stream = (
        spark.readStream.schema(DOCUMENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        run_extraction(
            spark,
            batch_df,
            cfg,
            out_dir=out_dir,
            run_id=f"stream-epoch-{epoch_id}",
            resume=True,  # doc-level idempotence on micro-batch replay
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window event-type counts with late-data handling.

    Works on a streaming OR batch events DataFrame (ts, event_type,
    value): watermark bounds state for late events; output is one row
    per (window, event_type) with count + value sum.
    """

    # watermarks require TIMESTAMP (tz-aware); sources often land NTZ
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window_duration).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n_events", "value_sum",
        )
    )
