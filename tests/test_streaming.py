"""Streaming == batch equality: the Structured Streaming twin of the
tumbling-window aggregation must produce exactly the batch result when
driven to completion with an availableNow trigger."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_lakehouse_pipeline__spark import corpus


def _normalized(df):
    return sorted(
        tuple(str(c) for c in row)
        for row in df.select(*sorted(df.columns)).collect()
    )


def test_streaming_equals_batch_tumbling(spark, sf_dir):
    qs = corpus.queries()
    batch = qs["tumbling_hourly"](spark, sf_dir)
    stream = qs["streaming_hourly_counts"](spark, sf_dir)
    assert sorted(batch.columns) == sorted(stream.columns)
    assert _normalized(batch) == _normalized(stream)


def test_streaming_dedup_within_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark twin of A11 runs and never yields
    more rows than the input."""
    import os

    from financial_data_lakehouse_pipeline__spark import streaming as st

    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = st.stream_from_parquet_dir(spark, sf_dir, raw_schema, glob="events.parquet")
    stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    deduped = st.dedup_within_watermark(stream, ["user_id", "event_type"], "ts")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.sql("SELECT COUNT(*) AS n FROM t_dedup_stream").collect()[0].n
    total = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    distinct = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert distinct <= n <= total
