"""Streaming twins must agree with their batch forms on the same data."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.sessionize import (
    hourly_rollup,
    sessionize,
)
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.plans import fixtures
from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
    run_to_memory_sink,
    streaming_dedup_events,
    streaming_hourly_rollup,
    streaming_sessionize,
)

from conftest import TESTDATA, raw_nanos_events


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


def test_streaming_dedup_collapses_redeliveries(spark, tmp_path):
    # simulate at-least-once delivery: the same event file lands twice
    ev = raw_nanos_events(spark).limit(500)
    src = tmp_path / "dedup_src"
    src.mkdir()
    for i in range(2):
        stage = tmp_path / f"dstage{i}"
        ev.coalesce(1).write.parquet(str(stage))
        (pf,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.move(pf, src / f"{i:02d}.parquet")
        os.utime(src / f"{i:02d}.parquet", (i + 1, i + 1))

    deduped = streaming_dedup_events(spark, str(src))
    assert deduped.isStreaming
    run_to_memory_sink(deduped, "dedup_stream_test", output_mode="append")
    out = spark.sql("SELECT event_id FROM dedup_stream_test").collect()
    ids = [r.event_id for r in out]
    assert len(ids) == len(set(ids)), "duplicates survived"
    assert sorted(ids) == sorted(r.event_id for r in ev.select("event_id").collect())


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: closed sessions must be a
    large, exactly-matching subset of the batch sessionization (only
    final-per-user sessions may remain open in state at stream end)."""
    # stage events as 4 time-ordered files; maxFilesPerTrigger=1 makes
    # each a micro-batch so the watermark advances and event-time
    # timeouts actually fire
    ev = raw_nanos_events(spark)
    qs = ev.approxQuantile("ts", [0.25, 0.5, 0.75], 0.0)
    src = tmp_path / "sess_src"
    src.mkdir()
    bounds = [None, *qs, None]
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.where(F.col("ts") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.col("ts") <= bounds[i + 1])
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        (pf,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.move(pf, src / f"{i:02d}.parquet")
        os.utime(src / f"{i:02d}.parquet", (i + 1, i + 1))

    agg = streaming_sessionize(
        spark, str(src), gap_minutes=30, watermark="1 minute", max_files_per_trigger=1
    )
    assert agg.isStreaming
    run_to_memory_sink(agg, "sessions_stream_test", output_mode="append")
    streamed = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sessions_stream_test").collect()
    }
    batch = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in sessionize(fixtures.events(spark, TESTDATA), gap_minutes=30).collect()
    }
    n_users = ev.select("user_id").distinct().count()
    assert len(streamed) >= len(batch) - n_users  # only open tails missing
    assert len(streamed) > 0
    for key, (s_end, s_n, s_sum) in streamed.items():
        assert key in batch, f"streamed session {key} not in batch output"
        b_end, b_n, b_sum = batch[key]
        assert (s_end, s_n) == (b_end, b_n)
        assert s_sum == pytest.approx(b_sum, abs=1e-6)


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join must equal the equivalent batch join
    over the same bounded data."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        streaming_signup_purchase_join,
    )

    src = tmp_path / "ssj_src"
    src.mkdir()
    (src / "events.parquet").symlink_to(f"{TESTDATA}/events.parquet")
    joined = streaming_signup_purchase_join(spark, str(src), horizon_minutes=60)
    assert joined.isStreaming
    run_to_memory_sink(joined, "ssj_stream_test", output_mode="append")
    streamed = sorted(
        (r.user_id, r.signup_ts, r.purchase_ts, r.purchase_value)
        for r in spark.sql("SELECT * FROM ssj_stream_test").collect()
    )

    ev = fixtures.events(spark, TESTDATA)
    s = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    batch = sorted(
        (r.user_id, r.signup_ts, r.purchase_ts, r.purchase_value)
        for r in s.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("signup_ts"))
            & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr("INTERVAL 60 MINUTES")),
        )
        .select("user_id", "signup_ts", "purchase_ts", "purchase_value")
        .collect()
    )
    assert len(streamed) > 0, "join produced no attributed purchases"
    assert streamed == batch


def test_stream_static_join_enriches_every_event(spark, tmp_path):
    """Stream-static broadcast join: every event is enriched with its
    dim row; events without a dim row survive (left join) with nulls."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        streaming_enrich_with_dim,
    )

    src = tmp_path / "ssd_src"
    src.mkdir()
    (src / "events.parquet").symlink_to(f"{TESTDATA}/events.parquet")
    ev = fixtures.events(spark, TESTDATA)
    # dim covers only even user_ids: odd ones must pass through un-enriched
    dim = (
        ev.select("user_id")
        .distinct()
        .where(F.col("user_id") % 2 == 0)
        .withColumn("tier", F.when(F.col("user_id") % 4 == 0, "gold").otherwise("std"))
    )
    enriched = streaming_enrich_with_dim(spark, str(src), dim)
    assert enriched.isStreaming
    run_to_memory_sink(enriched, "ssd_stream_test", output_mode="append")
    out = spark.sql("SELECT user_id, tier FROM ssd_stream_test").collect()
    assert len(out) == ev.count()
    for r in out:
        if r.user_id % 2 == 0:
            assert r.tier == ("gold" if r.user_id % 4 == 0 else "std")
        else:
            assert r.tier is None


def test_sessionize_drain_equals_batch_exactly(spark, tmp_path):
    """Drain policy: with a far-future watermark sentinel staged as the
    final file, EVERY session (including each user's open tail) is
    emitted -- streamed output equals the batch twin EXACTLY."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        write_drain_sentinel,
    )

    ev = raw_nanos_events(spark).where(
        F.col("user_id") % 7 == 0
    )
    qs = ev.approxQuantile("ts", [0.5], 0.0)
    src = tmp_path / "drain_src"
    src.mkdir()
    bounds = [None, *qs, None]
    for i in range(2):
        part = ev
        if bounds[i] is not None:
            part = part.where(F.col("ts") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.col("ts") <= bounds[i + 1])
        stage = tmp_path / f"dr_stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        (pf,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.move(pf, src / f"{i:02d}.parquet")
        os.utime(src / f"{i:02d}.parquet", (i + 1, i + 1))
    # heartbeat beyond max_ts + gap + watermark => every timeout fires
    max_ts_ns = ev.agg(F.max("ts")).collect()[0][0]
    write_drain_sentinel(
        spark, str(src), ts_ns=max_ts_ns + 2 * 3600 * 1_000_000_000, user_id=-1
    )

    agg = streaming_sessionize(
        spark,
        str(src),
        gap_minutes=30,
        watermark="1 minute",
        max_files_per_trigger=1,
        drain_user_id=-1,
    )
    run_to_memory_sink(agg, "sessions_drain_test", output_mode="append")
    streamed = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, round(r.sum_value, 2))
        for r in spark.sql("SELECT * FROM sessions_drain_test").collect()
    }
    batch = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, round(r.sum_value, 2))
        for r in sessionize(
            fixtures.events(spark, TESTDATA).where(F.col("user_id") % 7 == 0),
            gap_minutes=30,
        ).collect()
    }
    assert streamed == batch  # no open tail left behind, sentinel invisible


def test_streaming_cdc_merge_upsert(spark, tmp_path):
    """foreachBatch CDC: a change-file stream lands as keyed merges;
    per-batch audit metrics surface; replaying the same changes through
    a FRESH stream (new checkpoint, same files) leaves the mart
    byte-identical -- exactly-once-in-effect on top of merge
    idempotency."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.sources.writers import (
        merge_upsert,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        run_merge_upsert_stream,
    )

    mart = str(tmp_path / "cdc_mart")
    base = spark.createDataFrame(
        [("2024-01-01", "A", 1), ("2024-01-01", "B", 2), ("2024-01-02", "C", 3)],
        "date_key string, sku string, qty int",
    )
    merge_upsert(spark, base, mart, key_cols=["date_key", "sku"])

    src = tmp_path / "changes"
    src.mkdir()
    changes = spark.createDataFrame(
        [("2024-01-01", "B", 20), ("2024-01-01", "D", 4)],
        "date_key string, sku string, qty int",
    )
    changes.coalesce(1).write.mode("append").parquet(str(src))

    def run(ckpt: str) -> list[dict]:
        stream = spark.readStream.schema(
            "date_key string, sku string, qty int"
        ).parquet(str(src))
        return run_merge_upsert_stream(
            stream, mart, str(tmp_path / ckpt), key_cols=["date_key", "sku"]
        )

    audits = run("ckpt1")
    assert len(audits) == 1
    assert audits[0]["rows_replaced"] == 1 and audits[0]["rows_inserted"] == 1

    def snapshot():
        return sorted(
            (str(r.date_key), r.sku, r.qty)
            for r in spark.read.parquet(mart).collect()
        )

    expected = [
        ("2024-01-01", "A", 1),
        ("2024-01-01", "B", 20),
        ("2024-01-01", "D", 4),
        ("2024-01-02", "C", 3),
    ]
    assert snapshot() == expected
    # replay with a fresh checkpoint: same files re-merge to a no-op
    audits2 = run("ckpt2")
    assert len(audits2) == 1 and audits2[0]["rows_inserted"] == 0
    assert snapshot() == expected


def test_streaming_cdc_out_of_order_version_redelivery(spark, tmp_path):
    """CDC version contract under streaming (VERDICT r3 item 7): a
    late, LOWER-version change redelivered in a later micro-batch must
    NOT regress a key that already merged at a higher version, while an
    equal-version exact-row replay stays an idempotent no-op and a
    genuinely newer version still replaces."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        run_merge_upsert_stream,
    )

    mart = str(tmp_path / "cdc_mart_ooo")
    src = tmp_path / "changes"
    src.mkdir()
    schema = "date_key string, sku string, qty int, ver int"

    def land(rows, run_tag):
        # one SHARED checkpoint: each restarted stream resumes from it
        # and delivers only the newly-landed file as its micro-batch
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        stream = spark.readStream.schema(schema).parquet(str(src))
        return run_merge_upsert_stream(
            stream,
            mart,
            str(tmp_path / "ckpt"),
            key_cols=["date_key", "sku"],
            version_col="ver",
        )

    def snapshot():
        return sorted(
            (str(r.date_key), r.sku, r.qty, r.ver)
            for r in spark.read.parquet(mart).collect()
        )

    # batch 1: key A merges at version 5
    land([("2024-01-01", "A", 50, 5), ("2024-01-01", "B", 2, 1)], "b1")
    assert snapshot() == [
        ("2024-01-01", "A", 50, 5),
        ("2024-01-01", "B", 2, 1),
    ]

    # batch 2 (fresh stream over the same dir picks up only new files):
    # a LATE version-3 change for A -- must be dropped, not regress A
    audits = land([("2024-01-01", "A", 30, 3)], "b2")
    assert audits[-1]["rows_replaced"] == 0 and audits[-1]["rows_inserted"] == 0
    assert snapshot() == [
        ("2024-01-01", "A", 50, 5),
        ("2024-01-01", "B", 2, 1),
    ]

    # batch 3: a genuinely newer version still replaces
    audits = land([("2024-01-01", "A", 70, 8)], "b3")
    assert audits[-1]["rows_replaced"] == 1
    assert snapshot() == [
        ("2024-01-01", "A", 70, 8),
        ("2024-01-01", "B", 2, 1),
    ]


def test_native_session_window_stream_equals_batch(spark, tmp_path):
    """The NATIVE streaming session_window twin must emit, after the
    drain sentinel, exactly the batch native sessionizer's rows for the
    same user subset -- including cross-file session merges (a user's
    session split across the two staged micro-batch files must come out
    as ONE merged session, which is the state-store property the
    built-in is for)."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        streaming_sessionize_native,
        write_drain_sentinel,
    )

    ev = raw_nanos_events(spark).where(F.col("user_id") % 7 == 0)
    qs = ev.approxQuantile("ts", [0.5], 0.0)
    src = tmp_path / "native_sess_src"
    src.mkdir()
    bounds = [None, *qs, None]
    for i in range(2):
        part = ev
        if bounds[i] is not None:
            part = part.where(F.col("ts") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.col("ts") <= bounds[i + 1])
        stage = tmp_path / f"ns_stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        (pf,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.move(pf, src / f"{i:02d}.parquet")
        os.utime(src / f"{i:02d}.parquet", (i + 1, i + 1))
    max_ts_ns = ev.agg(F.max("ts")).collect()[0][0]
    write_drain_sentinel(
        spark, str(src), ts_ns=max_ts_ns + 2 * 3600 * 1_000_000_000, user_id=-1
    )

    agg = streaming_sessionize_native(
        spark,
        str(src),
        gap_minutes=30,
        watermark="1 minute",
        max_files_per_trigger=1,
    )
    assert agg.isStreaming
    run_to_memory_sink(agg, "native_sessions_test", output_mode="append")
    # consumer-side heartbeat drop: an in-plan filter on the grouping
    # column would be pushed below the watermark node and break the
    # drain (see streaming_sessionize_native docstring)
    streamed = {
        (r.user_id, r.session_start): (
            r.session_end,
            r.n_events,
            round(r.sum_value, 2),
        )
        for r in spark.sql(
            "SELECT * FROM native_sessions_test WHERE user_id >= 0"
        ).collect()
    }
    import __spark_entry__ as entry

    batch = {
        (r.user_id, r.session_start): (
            r.session_end,
            r.n_events,
            round(r.sum_value, 2),
        )
        for r in entry.queries()["events_sessionize_native"](spark, TESTDATA)
        .where(F.col("user_id") % 7 == 0)
        .collect()
    }
    assert streamed == batch


def test_streaming_anomaly_alerts_equal_batch_exactly(spark, tmp_path):
    """The stateful z-score alerter must emit, across micro-batch
    boundaries, EXACTLY the batch twin's alert set -- the integer-exact
    state (n, sum_cents, sumsq_cents) carries between batches, so an
    alert whose prior-window spans both staged files is the
    cross-batch case that matters."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        streaming_value_anomalies,
    )

    ev = raw_nanos_events(spark)
    qs = ev.approxQuantile("ts", [0.5], 0.0)
    src = tmp_path / "anom_src"
    src.mkdir()
    bounds = [None, *qs, None]
    for i in range(2):
        part = ev
        if bounds[i] is not None:
            part = part.where(F.col("ts") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.col("ts") <= bounds[i + 1])
        stage = tmp_path / f"an_stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        (pf,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.move(pf, src / f"{i:02d}.parquet")
        os.utime(src / f"{i:02d}.parquet", (i + 1, i + 1))

    alerts = streaming_value_anomalies(
        spark, str(src), max_files_per_trigger=1
    )
    assert alerts.isStreaming
    run_to_memory_sink(alerts, "anomaly_stream_test", output_mode="append")
    streamed = {
        (r.event_type, r.event_id): (r.n_prior, r.sum_prior)
        for r in spark.sql("SELECT * FROM anomaly_stream_test").collect()
    }
    import __spark_entry__ as entry

    batch = {
        (r.event_type, r.event_id): (r.n_prior, r.sum_prior)
        for r in entry.queries()["value_anomalies"](spark, TESTDATA).collect()
    }
    assert streamed == batch
    assert batch, "alert set is vacuous on testdata"


def test_quantize_cents_matches_f_round_on_half_cent_ties(spark):
    """The streaming alerter's Python-side cents quantization must equal
    the batch twin's F.round(value*100) even on exact half-cents, where
    Python's built-in round() (half-even) silently diverges."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        quantize_cents,
    )

    vals = [0.125, 0.135, -0.125, -0.135, 0.115, 2.675, -2.675, 0.0,
            1.005, -1.005, 12.345, 99999.995, -99999.995]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    jvm = {
        r.value: r.c
        for r in df.select(
            "value", F.round(F.col("value") * 100).cast("long").alias("c")
        ).collect()
    }
    for v in vals:
        assert quantize_cents(v) == jvm[v], v
    # and the divergence is real: bare round() gets 0.125 wrong
    assert round(0.125 * 100) == 12 and quantize_cents(0.125) == 13


def test_streaming_bitmap_distinct_matches_batch_and_is_idempotent(spark, tmp_path):
    """Bitmap-OR distinct maintenance: after streaming two change
    files, state counts equal a batch COUNT(DISTINCT); replaying the
    SAME files through a fresh stream (new checkpoint) leaves counts
    unchanged -- OR idempotence IS the exactly-once mechanism."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        distinct_counts_from_state,
        run_distinct_bitmap_stream,
    )

    src = tmp_path / "ev"
    src.mkdir()
    import datetime as dt

    schema = "ts timestamp, user_id long"
    t = lambda m, d, h: dt.datetime(2024, m, d, h)
    batch1 = spark.createDataFrame(
        [(t(1, 3, 10), 1), (t(1, 5, 11), 2), (t(1, 7, 12), 1),
         (t(2, 1, 9), 7)],
        schema,
    )
    batch1.coalesce(1).write.mode("append").parquet(str(src))

    state = str(tmp_path / "bm_state")

    def run(ckpt: str):
        stream = spark.readStream.schema(schema).parquet(str(src))
        return run_distinct_bitmap_stream(stream, state, str(tmp_path / ckpt))

    run("c1")
    got1 = {
        str(r.grain): r.exact_distinct
        for r in distinct_counts_from_state(spark, state).collect()
    }
    assert got1 == {"2024-01-01": 2, "2024-02-01": 1}

    # second file: overlaps user 2 in January (no count change there),
    # adds user 9 to February
    spark.createDataFrame(
        [(t(1, 20, 8), 2), (t(2, 11, 10), 9)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    run("c1")
    got2 = {
        str(r.grain): r.exact_distinct
        for r in distinct_counts_from_state(spark, state).collect()
    }
    assert got2 == {"2024-01-01": 2, "2024-02-01": 2}

    # a batch touching ONLY March: January/February partitions must
    # survive the dynamic overwrite untouched
    spark.createDataFrame([(t(3, 2, 9), 1)], schema).coalesce(
        1
    ).write.mode("append").parquet(str(src))
    run("c1")
    got3 = {
        str(r.grain): r.exact_distinct
        for r in distinct_counts_from_state(spark, state).collect()
    }
    assert got3 == {**got2, "2024-03-01": 1}

    # replay everything with a FRESH checkpoint: re-ORing set bits is
    # a no-op, counts identical
    run("c_fresh")
    got4 = {
        str(r.grain): r.exact_distinct
        for r in distinct_counts_from_state(spark, state).collect()
    }
    assert got4 == got3


def test_streaming_sliding_rollup_matches_batch(spark, tmp_path):
    """The streamed 2h/1h sliding rollup (complete mode over the whole
    source) must equal the batch sliding_rollup exactly."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.sessionize import (
        sliding_rollup,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        streaming_sliding_rollup,
    )

    src = tmp_path / "sliding_src"
    src.mkdir()
    (src / "events.parquet").symlink_to(f"{TESTDATA}/events.parquet")
    agg = streaming_sliding_rollup(spark, str(src))
    assert agg.isStreaming
    run_to_memory_sink(agg, "sliding_stream_test")
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sliding_stream_test").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in sliding_rollup(fixtures.events(spark, TESTDATA)).collect()
    }
    assert streamed == batch


def test_streaming_observed_metrics_account_for_every_row(spark, tmp_path):
    """df.observe on a stream: per-micro-batch row counts + value sums
    arrive via observedMetrics, and their totals equal the source --
    the streaming twin of the batch pipeline's Observation audit."""
    from pyspark.sql import functions as F

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        read_event_stream,
        run_observed,
    )

    # two files -> two micro-batches (maxFilesPerTrigger=1)
    ev = raw_nanos_events(spark).limit(600)
    src = tmp_path / "obs_src"
    src.mkdir()
    halves = [ev.where(F.col("event_id") % 2 == 0), ev.where(F.col("event_id") % 2 == 1)]
    for i, part in enumerate(halves):
        stage = tmp_path / f"ostage{i}"
        part.coalesce(1).write.parquet(str(stage))
        (pf,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.move(pf, src / f"{i:02d}.parquet")
        os.utime(src / f"{i:02d}.parquet", (i + 1, i + 1))

    raw = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    observed = raw.observe(
        "ingest_audit",
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("value_sum"),
    )

    seen: list[int] = []

    def sink(batch_df, batch_id):
        seen.append(batch_df.count())

    metrics = run_observed(
        observed, "ingest_audit", sink, str(tmp_path / "obs_ckpt")
    )
    assert len(metrics) == 2                      # one per file/micro-batch
    assert sum(m["rows"] for m in metrics) == 600
    assert sum(m["rows"] for m in metrics) == sum(seen)
    exact = ev.agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s")
    ).collect()[0].s
    # observedMetrics round-trip through progress JSON as floats; the
    # per-batch sums are 2dp decimals, so shortest-roundtrip repr is exact
    from decimal import Decimal

    assert sum(Decimal(str(m["value_sum"])) for m in metrics) == exact

def test_transform_with_state_user_totals_matches_batch(spark, tmp_path):
    """Gated on google.protobuf (transformWithState's state-server
    dependency -- absent in this container; probe documented): when
    available, each user's FINAL streamed totals must equal the batch
    aggregate exactly, cents included."""
    import pytest as _pytest

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        quantize_cents,
        streaming_user_totals,
        tws_available,
    )

    if not tws_available():
        _pytest.skip("google.protobuf not installed -- transformWithState gated")

    ev = raw_nanos_events(spark).limit(500)
    src = tmp_path / "tws_src"
    src.mkdir()
    stage = tmp_path / "tws_stage"
    ev.coalesce(1).write.parquet(str(stage))
    (pf,) = glob.glob(str(stage / "part-*.parquet"))
    shutil.move(pf, src / "00.parquet")

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = streaming_user_totals(spark, str(src))
        q = (
            out.writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # update mode emits a row per (user, batch); the final row per
        # user carries the complete running total
        got = {
            r.user_id: (r.n_events, r.cents)
            for r in spark.sql("SELECT * FROM tws_totals").collect()
        }
        batch_n = {
            r.user_id: r.n
            for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        }
        exact_cents = {
            u: sum(quantize_cents(v) for v in vals)
            for u, vals in (
                (r.user_id, [x.value for x in ev.where(F.col("user_id") == r.user_id).collect()])
                for r in ev.select("user_id").distinct().collect()
            )
        }
        assert set(got) == set(batch_n)
        for u, (n, cents) in got.items():
            assert n == batch_n[u]
            assert cents == exact_cents[u]
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_append_mode_late_window_semantics_pinned(spark, tmp_path):
    """Pin the ACTUAL Spark 4.1 late-data semantics our exactly-once
    sink's reasoning depends on (folklore says 'watermark drops late
    input'; measured behavior differs): rows arriving for a window
    NEVER seen before, already below the watermark, are ABSORBED --
    aggregated and emitted exactly once in the same batch, with
    numRowsDroppedByWatermark staying 0. If an engine upgrade flips
    this to dropping (or to double emission), the partitioned-overwrite
    sink's replay contract must be revisited -- this test is the
    tripwire."""
    import json

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        read_event_stream,
    )

    ev = raw_nanos_events(spark)
    hi = ev.agg(F.max("ts").alias("m")).collect()[0].m
    lo = ev.agg(F.min("ts").alias("m")).collect()[0].m
    day_ns = 24 * 3600 * 10**9
    recent = ev.where(F.col("ts") > hi - day_ns)
    ancient = ev.where(F.col("ts") < lo + 3 * day_ns).limit(50)
    assert recent.count() > 0 and ancient.count() == 50

    src = tmp_path / "late_src"
    src.mkdir()
    for i, part in enumerate([recent, ancient]):  # late file arrives SECOND
        stage = tmp_path / f"lstage{i}"
        part.coalesce(1).write.parquet(str(stage))
        (pf,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.move(pf, src / f"{i:02d}.parquet")
        os.utime(src / f"{i:02d}.parquet", (i + 1, i + 1))

    raw = read_event_stream(spark, str(src), max_files_per_trigger=1)
    agg = (
        raw.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("_w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_semantics")
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = 0
        for prog in q.recentProgress:
            p = json.loads(prog.json) if hasattr(prog, "json") else prog
            for op in p.get("stateOperators") or []:
                dropped += op.get("numRowsDroppedByWatermark", 0)
    finally:
        q.stop()

    out = spark.sql("SELECT _w.start AS s, event_type, n_events FROM late_semantics").collect()
    keys = [(r.s, r.event_type) for r in out]
    assert len(keys) == len(set(keys)), "a window emitted twice"
    assert dropped == 0, "engine began dropping late input: revisit sink contract"
    total = sum(r.n_events for r in out)
    # all 50 ancient rows are in the output; only still-open recent
    # windows may be absent
    assert total >= 50


def test_streaming_attribution_matches_batch_exactly(spark, tmp_path):
    """The stateful last-touch attributor over time-ordered micro-
    batches must reproduce the batch window query's per-purchase labels
    EXACTLY (no open tails: purchases resolve immediately), and its
    aggregate must equal q_purchase_attribution."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.queries import (  # noqa: E501
        q_purchase_attribution,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (  # noqa: E501
        streaming_attribution,
    )

    ev = raw_nanos_events(spark)
    qs = ev.approxQuantile("ts", [0.25, 0.5, 0.75], 0.0)
    src = tmp_path / "attr_src"
    src.mkdir()
    bounds = [None, *qs, None]
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.where(F.col("ts") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.col("ts") <= bounds[i + 1])
        stage = tmp_path / f"attr_stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        (pf,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.move(pf, src / f"{i:02d}.parquet")
        os.utime(src / f"{i:02d}.parquet", (i + 1, i + 1))

    from pyspark.sql import Window

    out = streaming_attribution(spark, str(src), max_files_per_trigger=1)
    assert out.isStreaming
    run_to_memory_sink(out, "attr_stream_test", output_mode="append")
    streamed = {
        r.event_id: (r.touch, r.cents)
        for r in spark.sql("SELECT * FROM attr_stream_test").collect()
    }
    # per-purchase batch recompute with the same window contract
    base = fixtures.events(spark, TESTDATA).select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    batch_rows = (
        base.select(
            "event_id",
            "event_type",
            "sec",
            "cents",
            F.last(
                F.when(F.col("event_type").isin("click", "view"), F.col("event_type")),
                ignorenulls=True,
            ).over(w).alias("touch"),
            F.last(
                F.when(F.col("event_type").isin("click", "view"), F.col("sec")),
                ignorenulls=True,
            ).over(w).alias("touch_sec"),
        )
        .where(F.col("event_type") == "purchase")
        .collect()
    )
    batch = {
        r.event_id: (
            r.touch
            if r.touch is not None and r.sec - r.touch_sec <= 7 * 86400
            else "organic",
            r.cents,
        )
        for r in batch_rows
    }
    assert streamed == batch and len(streamed) > 0
    # and the aggregate equals the query-surface result
    agg = {}
    for touch, cents in streamed.values():
        n, c = agg.get(touch, (0, 0))
        agg[touch] = (n + 1, c + cents)
    want = {
        r.touch: (r.n_purchases, round(r.revenue * 100))
        for r in q_purchase_attribution(spark, TESTDATA).collect()
    }
    assert {k: (n, c) for k, (n, c) in agg.items()} == want


def test_alert_throttle_stream_equals_batch_and_greedy_rule(spark, tmp_path):
    """The stateful throttle over time-ordered micro-batches equals the
    batch twin exactly; a planted burst pins the greedy rule (chained
    off the last KEPT alert -- the thing lag() cannot spell)."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.alerts import (  # noqa: E501
        throttle_alerts,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (  # noqa: E501
        streaming_alert_throttle,
    )

    ev = raw_nanos_events(spark)
    qs = ev.approxQuantile("ts", [0.25, 0.5, 0.75], 0.0)
    src = tmp_path / "thr_src"
    src.mkdir()
    bounds = [None, *qs, None]
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.where(F.col("ts") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.col("ts") <= bounds[i + 1])
        stage = tmp_path / f"thr_stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        (pf,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.move(pf, src / f"{i:02d}.parquet")
        os.utime(src / f"{i:02d}.parquet", (i + 1, i + 1))

    out = streaming_alert_throttle(
        spark, str(src), cooldown_minutes=1440, max_files_per_trigger=1
    )
    assert out.isStreaming
    run_to_memory_sink(out, "throttle_stream_test", output_mode="append")
    streamed = {
        r.event_id
        for r in spark.sql("SELECT * FROM throttle_stream_test").collect()
    }
    batch_alerts = (
        fixtures.events(spark, TESTDATA)
        .where(F.col("event_type") == "error")
        .select("user_id", "event_id", F.unix_timestamp("ts").alias("sec"))
    )
    batch = {
        r.event_id
        for r in throttle_alerts(batch_alerts, cooldown_s=86400).collect()
    }
    assert streamed == batch and streamed
    # fewer survive than fired (the storm is actually suppressed)
    assert len(streamed) < batch_alerts.count()

    # planted burst: alerts at t=0s,1s,2s,600s,1199s,1200s -> greedy
    # keeps 0, 600, 1200 (lag-based logic would keep only 0 and 600)
    import datetime as dtm

    t0 = dtm.datetime(2024, 5, 1)
    rows = [
        (i, t0 + dtm.timedelta(seconds=s), 9, "error", 0.0, None)
        for i, s in enumerate([0, 1, 2, 600, 1199, 1200])
    ]
    planted = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).select("user_id", "event_id", F.unix_timestamp("ts").alias("sec"))
    kept = sorted(
        r.event_id for r in throttle_alerts(planted, cooldown_s=600).collect()
    )
    assert kept == [0, 3, 5]


def test_alert_throttle_state_carries_across_arrow_batches(spark):
    """The r14 mapInPandas spelling carries (current key, last-kept
    sec) across Arrow batch boundaries inside a partition. Force
    2-row batches so every key straddles several batches: the kept
    set must equal the per-key python greedy exactly -- a reset at a
    batch boundary would re-keep suppressed rows mid-burst."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.alerts import (  # noqa: E501
        throttle_alerts,
    )

    # 3 users x 50 alerts, 40s apart -> with cooldown 100s the greedy
    # keeps every 3rd alert per user (t=0,120,240,...); 2-row Arrow
    # batches put ~25 batch boundaries inside each user's run
    rows = [
        (u, u * 1000 + i, 40 * i) for u in (1, 2, 3) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, sec long")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        kept = sorted(
            (r.user_id, r.event_id)
            for r in throttle_alerts(df, cooldown_s=100).collect()
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )
    # python greedy twin
    want = []
    for u in (1, 2, 3):
        last = None
        for i in range(50):
            sec = 40 * i
            if last is None or sec - last >= 100:
                want.append((u, u * 1000 + i))
                last = sec
    assert kept == sorted(want) and len(kept) == 3 * 17


def test_streaming_mg_candidates_recount_equals_batch_heavy_hitters(
    spark, tmp_path
):
    """Streaming Misra-Gries over time-split micro-batches: the drained
    candidate union must be complete (the MG theorem per bucket), so an
    exact recount over it reproduces the batch two-pass heavy_hitters
    output EXACTLY; state drains empty and per-bucket summaries respect
    the k-1 bound."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.operators.sketch import (  # noqa: E501
        heavy_hitters,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (  # noqa: E501
        streaming_mg_candidates,
        write_drain_sentinel,
    )

    K = 20  # small k so the prune rule actually fires on this fixture
    ev = raw_nanos_events(spark)
    qs = ev.approxQuantile("ts", [0.25, 0.5, 0.75], 0.0)
    src = tmp_path / "mg_src"
    src.mkdir()
    bounds = [None, *qs, None]
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.where(F.col("ts") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.col("ts") <= bounds[i + 1])
        stage = tmp_path / f"mg_stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        (pf,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.move(pf, src / f"{i:02d}.parquet")
        os.utime(src / f"{i:02d}.parquet", (i + 1, i + 1))
    max_ns = ev.agg(F.max("ts")).collect()[0][0]
    write_drain_sentinel(
        spark, str(src), int(max_ns) + 10 * 60 * 1_000_000_000, user_id=-1
    )

    out = streaming_mg_candidates(
        spark,
        str(src),
        key_col="user_id",
        k=K,
        n_buckets=4,
        drain_user_id=-1,
        max_files_per_trigger=1,
    )
    assert out.isStreaming
    q = run_to_memory_sink(out, "mg_stream_test", output_mode="append")
    cand_rows = spark.sql("SELECT * FROM mg_stream_test").collect()
    # summaries respect the MG bound per bucket
    per_bucket: dict[int, int] = {}
    for r in cand_rows:
        per_bucket[r.bucket] = per_bucket.get(r.bucket, 0) + 1
        assert r.residual >= 1
    assert per_bucket and all(n <= K - 1 for n in per_bucket.values())
    cands = {r.key for r in cand_rows}

    batch_keyed = fixtures.events(spark, TESTDATA).select(
        F.col("user_id").cast("string").alias("_key")
    )
    n_total = batch_keyed.count()
    want = {
        (r.key, r.n_occurrences)
        for r in heavy_hitters(
            fixtures.events(spark, TESTDATA), "user_id", k=K
        ).collect()
    }
    assert want, "fixture has no heavy hitters at this k; pick smaller k"
    # completeness: every true heavy key is among the streamed candidates
    assert {k_ for k_, _ in want} <= cands
    # exact recount over the streamed candidates == batch two-pass output
    cand_df = spark.createDataFrame([(c,) for c in cands], "_key string")
    got = {
        (r._key, r.n)
        for r in batch_keyed.join(F.broadcast(cand_df), "_key")
        .groupBy("_key")
        .agg(F.count("*").cast("long").alias("n"))
        .where(F.col("n") * K > F.lit(n_total))
        .collect()
    }
    assert got == want


def test_streaming_wau_matches_batch_trailing_week(spark, tmp_path):
    """Three chained stateful operators (day-user dedup -> 7d-window
    user dedup -> count) reproduce the batch explode(sequence(0,6))
    trailing-week WAU EXACTLY on every event day once a drain sentinel
    flushes the final windows; the sentinel user itself never counts."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.queries import (
        q_dau_wau_stickiness,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        streaming_wau,
        write_drain_sentinel,
    )

    src = tmp_path / "wau_src"
    src.mkdir()
    (src / "events.parquet").symlink_to(f"{TESTDATA}/events.parquet")
    max_ts = fixtures.events(spark, TESTDATA).agg(F.max("ts")).collect()[0][0]
    import calendar

    max_ns = int(calendar.timegm(max_ts.timetuple())) * 1_000_000_000
    # chained stateful operators need the watermark to advance in steps
    # no larger than the downstream lateness allowance: one same-batch
    # mega-jump makes stage-1 evictions arrive at stage 2 as too-late
    # rows and silently drops the final week. Daily heartbeats (the
    # production cadence) step it cleanly.
    # need watermark >= last window end (max_day + 1): daily heartbeats
    # to max_ts + 10d cover the 8-day delay with a day to spare
    for k in range(1, 11):
        write_drain_sentinel(
            spark, str(src), ts_ns=max_ns + k * 86400 * 1_000_000_000, user_id=-1
        )

    agg = streaming_wau(spark, str(src), drain_user_id=-1, max_files_per_trigger=1)
    assert agg.isStreaming
    run_to_memory_sink(agg, "wau_stream_test", output_mode="append")
    streamed = {
        r.day: r.wau for r in spark.sql("SELECT * FROM wau_stream_test").collect()
    }
    batch = {r.day: r.wau for r in q_dau_wau_stickiness(spark, TESTDATA).collect()}
    assert set(batch) <= set(streamed), "event days missing from the stream"
    for day, wau in batch.items():
        assert streamed[day] == wau


def test_streaming_type_transitions_match_batch(spark, tmp_path):
    """The stateful transition extractor replayed over two time-ordered
    micro-batches emits EXACTLY the batch window's (prev, next) pairs
    -- cross-batch pairs included (the state carries each user's last
    event over the file boundary)."""
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.queries import (
        q_event_type_transitions,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        streaming_type_transitions,
    )

    ev = raw_nanos_events(spark)
    qs = ev.approxQuantile("ts", [0.5], 0.0)
    src = tmp_path / "trans_src"
    src.mkdir()
    bounds = [None, *qs, None]
    for i in range(2):
        part = ev
        if bounds[i] is not None:
            part = part.where(F.col("ts") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.col("ts") <= bounds[i + 1])
        stage = tmp_path / f"tr_stage{i}"
        part.coalesce(1).write.parquet(str(stage))
        (pf,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.move(pf, src / f"{i:02d}.parquet")
        os.utime(src / f"{i:02d}.parquet", (i + 1, i + 1))

    agg = streaming_type_transitions(spark, str(src), max_files_per_trigger=1)
    assert agg.isStreaming
    run_to_memory_sink(agg, "trans_stream_test", output_mode="append")
    streamed: dict = {}
    for r in spark.sql(
        "SELECT from_type, to_type, COUNT(*) AS n FROM trans_stream_test "
        "GROUP BY 1, 2"
    ).collect():
        streamed[(r.from_type, r.to_type)] = r.n
    batch = {
        (r.from_type, r.to_type): r.n
        for r in q_event_type_transitions(spark, TESTDATA).collect()
    }
    assert streamed == batch


def test_streaming_promo_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval-containment join (promo-window stream x
    purchase stream) + chained Monday-aligned weekly aggregation must
    reproduce the batch q_purchases_in_promo_windows EXACTLY once the
    drain heartbeats flush the final week; revenue compares exactly
    (both sides sum DECIMAL(18,2))."""
    import calendar

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.queries import (
        q_purchases_in_promo_windows,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        streaming_promo_interval_join,
        write_drain_sentinel,
    )

    src = tmp_path / "promo_src"
    src.mkdir()
    (src / "events.parquet").symlink_to(f"{TESTDATA}/events.parquet")
    max_ts = fixtures.events(spark, TESTDATA).agg(F.max("ts")).collect()[0][0]
    max_ns = int(calendar.timegm(max_ts.timetuple())) * 1_000_000_000
    # the promo-side watermark rides on week-TRUNCATED event time, so
    # it lags raw time by up to 6 days; heartbeats must run far enough
    # that week(max_heartbeat) - 9d watermark clears the final promo
    # window's end (week(max_ts) + 7d). 3-day steps stay inside the
    # 9-day lateness allowance (the r9 chained-stateful lesson) at a
    # third of the micro-batch count of daily ones.
    for k in range(1, 10):
        write_drain_sentinel(
            spark, str(src), ts_ns=max_ns + k * 3 * 86400 * 1_000_000_000, user_id=-1
        )

    agg = streaming_promo_interval_join(spark, str(src), max_files_per_trigger=1)
    assert agg.isStreaming
    run_to_memory_sink(agg, "promo_join_stream_test", output_mode="append")
    streamed = {
        r.promo_start: (r.n_purchases, r.promo_revenue)
        for r in spark.sql("SELECT * FROM promo_join_stream_test").collect()
    }
    batch = {
        r.promo_start: (r.n_purchases, r.promo_revenue)
        for r in q_purchases_in_promo_windows(spark, TESTDATA).collect()
    }
    assert batch, "batch twin is empty -- fixture has no Mon/Tue purchases"
    assert streamed == batch


def test_streaming_trending_types_matches_batch(spark, tmp_path):
    """Rank-after-watermark: the foreachBatch top-3 over finalized
    daily windows must equal the batch q_daily_trending_types EXACTLY
    on every event day once heartbeats flush the final window -- all
    of a day's groups emit in ONE micro-batch (they share the window
    end the watermark must pass), so the sink-side rank always sees
    complete days; the sentinel type itself never trends."""
    import calendar

    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.queries import (
        q_daily_trending_types,
    )
    from retail_inventory_reconciliation_batch_etl_pipeline_on_aws__spark.streaming.events import (
        streaming_trending_types,
        write_drain_sentinel,
    )

    src = tmp_path / "trend_src"
    src.mkdir()
    (src / "events.parquet").symlink_to(f"{TESTDATA}/events.parquet")
    max_ts = fixtures.events(spark, TESTDATA).agg(F.max("ts")).collect()[0][0]
    max_ns = int(calendar.timegm(max_ts.timetuple())) * 1_000_000_000
    for kk in range(1, 4):
        write_drain_sentinel(
            spark, str(src), ts_ns=max_ns + kk * 2 * 86400 * 1_000_000_000, user_id=-1
        )

    got: list = []
    q = streaming_trending_types(
        spark, str(src), k=3, max_files_per_trigger=1, collector=got
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = sorted((r.day, r.rank, r.event_type, r.n) for r in got)
    batch = sorted(
        (r.day, r.rank, r.event_type, r.n)
        for r in q_daily_trending_types(spark, TESTDATA).collect()
    )
    assert len(streamed) > 0
    assert streamed == batch
