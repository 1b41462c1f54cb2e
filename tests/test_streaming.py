"""Streaming-layer tests: incremental extraction equals batch output;
windowed counts match a static groupBy; late files are picked up by the
next trigger without reprocessing committed docs."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from pdf_toolkit_spark.corpus import corpus_config, make_document
from pdf_toolkit_spark.extract import extract_document
from pdf_toolkit_spark.spark.input import corpus_dataframe
from pdf_toolkit_spark.streaming import stream_extraction, windowed_event_counts

CFG = dict(corpus_config(), pages_per_chunk=32)


def _await(query, timeout=120):
    query.awaitTermination(timeout)
    assert not query.isActive


def test_stream_extraction_incremental_equals_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # land the first half, drain the stream
    corpus_dataframe(spark, 6, seed=42, mega_every=0).write.mode("append").parquet(landing)
    _await(stream_extraction(spark, landing, out, ckpt, CFG))

    first = spark.read.parquet(f"{out}/spans")
    assert first.count() == 6

    # land more docs; a second availableNow drain picks up ONLY new files
    corpus_dataframe(spark, 10, seed=42, mega_every=0).filter(
        F.col("doc_id") >= "doc000006"
    ).write.mode("append").parquet(landing)
    _await(stream_extraction(spark, landing, out, ckpt, CFG))

    final = spark.read.parquet(f"{out}/spans")
    assert final.count() == 10
    # each doc appears exactly once and matches the serial oracle
    rows = {r["doc_id"]: [s.asDict() for s in r["spans"]] for r in final.collect()}
    assert len(rows) == 10
    for doc_id in range(10):
        doc = make_document(doc_id, seed=42, mega_every=0)
        assert rows[doc["doc_id"]] == extract_document(doc["pdf_bytes"], CFG)["spans"]


def test_windowed_event_counts_matches_static_aggregation(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = windowed_event_counts(events).orderBy("window_start", "event_type")
    # independent recomputation with a plain groupBy on truncated ts
    expected = (
        events.groupBy(
            F.window("ts", "5 minutes").alias("win"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .count()
    )
    assert got.count() == expected
    row = got.first()
    assert row["n_events"] >= 1
    assert (row["window_end"] - row["window_start"]).total_seconds() == 300


def test_windowed_event_counts_streaming_mode(spark, tmp_path):
    """Same aggregation as a real stream (file source, update mode,
    memory sink): final per-key state equals the batch aggregation."""

    src_dir = str(tmp_path / "events")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.parquet(src_dir)

    stream = (
        spark.readStream.schema(events.schema).option("maxFilesPerTrigger", "4").parquet(src_dir)
    )
    agg = windowed_event_counts(stream)
    name = f"wincounts_{int(time.time())}"
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # update mode may emit a key several times; the LAST emission per
    # key must equal the batch result
    got = spark.sql(
        f"SELECT window_start, event_type, max_by(n_events, n_events) AS n "
        f"FROM {name} GROUP BY window_start, event_type"
    )
    batch = windowed_event_counts(events).select(
        "window_start", "event_type", F.col("n_events").alias("n")
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
