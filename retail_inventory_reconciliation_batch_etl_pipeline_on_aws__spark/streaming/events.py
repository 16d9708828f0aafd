"""Structured Streaming upgrade path (SURVEY.md SS2.9).

The reference is pure daily batch (Airflow-triggered Glue jobs,
dags/retail_pipeline_dag.py:43-63); its natural streaming evolution is
POS/telemetry events flowing through an event-time windowed aggregation
with a watermark for late data. This module provides that as a
*streaming twin* of ``operators.sessionize.hourly_rollup`` -- the same
logical aggregation, run incrementally.

At scale this is the standard Kafka -> watermark -> window -> sink
topology; locally we drive it from a bounded parquet directory with
``processAllAvailable`` (same code path, synchronous completion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Post-normalization event schema (ts already micros timestamp).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw nanos (parquet NANOS as long)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_hourly_rollup(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream twin of the batch hourly rollup.

    Watermark bounds state: windows older than max(event_time) - watermark
    are finalized and evicted -- the late-data contract a 100TB stream
    needs to keep the state store from growing without bound.
    Returns the unstarted streaming DataFrame; callers attach a sink
    (memory sink in tests, kafka/parquet in production).
    """
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .format("parquet")
        .load(source_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    return (
        raw.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").start.alias("bucket_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


def run_to_memory_sink(agg: DataFrame, query_name: str = "events_stream") -> None:
    """Drive a bounded stream to completion into an in-memory table
    (test/dev harness; exactly-once parquet/kafka sinks attach the same
    way via ``foreachBatch``)."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
