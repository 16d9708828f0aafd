"""Streaming twin must agree with the batch rollup on the same data."""

from pyspark.sql import functions as F

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.sessionize import (
    hourly_rollup,
)
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import fixtures
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
    run_to_memory_sink,
    streaming_hourly_rollup,
)

from conftest import TESTDATA


def test_streaming_matches_batch(spark, tmp_path):
    # readStream sources are directories (files arrive over time); the
    # testdata table is a single file, so stage it into a dir
    src = tmp_path / "events_stream_src"
    src.mkdir()
    (src / "events.parquet").symlink_to(f"{TESTDATA}/events.parquet")
    agg = streaming_hourly_rollup(spark, str(src))
    assert agg.isStreaming
    run_to_memory_sink(agg, "events_stream_test")
    streamed = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM events_stream_test").collect()
    }
    batch = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in hourly_rollup(fixtures.events(spark, TESTDATA)).collect()
    }
    assert streamed == batch
