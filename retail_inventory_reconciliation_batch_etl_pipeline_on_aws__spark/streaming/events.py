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

#: Raw on-disk event schema, parameterized by the ts column's physical
#: layout -- the driver's testdata has shipped both TIMESTAMP(NANOS)
#: (bigint under nanosAsLong) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
#: (timestamp_ntz under Spark 4's inference).
def event_schema(ts_dtype: str = "bigint") -> T.StructType:
    ts_type = {
        "bigint": T.LongType(),
        "timestamp_ntz": T.TimestampNTZType(),
    }.get(ts_dtype, T.TimestampType())
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


#: Back-compat alias: the nanos-long layout (write_drain_sentinel and
#: the staging tests construct rows against it).
EVENT_SCHEMA = event_schema("bigint")


def _probe_ts_dtype(spark: SparkSession, source_dir: str) -> str:
    """Footer-only batch read to learn the ts layout of a file source.

    readStream needs the schema up front; probing the existing files
    (a metadata operation -- no data scan) lets one reader serve both
    layouts. ONLY a missing/empty source dir falls back to the
    nanos-long default -- any other failure (permissions, a listing
    race, a corrupt footer) re-raises, because silently guessing the
    schema there would let ``write_drain_sentinel`` append a
    mixed-layout file and poison the whole file stream.
    """
    from pyspark.errors import AnalysisException

    from ..plans.fixtures import ensure_session_conf

    ensure_session_conf(spark)
    try:
        return dict(spark.read.parquet(source_dir).dtypes).get("ts", "bigint")
    except AnalysisException as e:
        # the two expected "nothing there yet" shapes; everything else
        # (incl. permission/listing errors) must surface
        msg = str(e)
        if (
            "PATH_NOT_FOUND" in msg
            or "UNABLE_TO_INFER_SCHEMA" in msg
            or "Path does not exist" in msg
            or "Unable to infer schema" in msg
        ):
            return "bigint"
        raise


def _normalize_ts(df: DataFrame, ts_dtype: str) -> DataFrame:
    """Whatever the on-disk layout, downstream sees LTZ micros (UTC)."""
    if ts_dtype == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_dtype == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_event_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream with ts normalized to LTZ micros,
    adapting to whichever physical layout the source dir holds."""
    ts_dtype = _probe_ts_dtype(spark, source_dir)
    reader = spark.readStream.schema(event_schema(ts_dtype)).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _normalize_ts(reader.load(source_dir), ts_dtype)


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
    raw = read_event_stream(spark, source_dir)
    return (
        raw.withWatermark("ts", watermark)
        # group on the window struct itself (not a .start projection):
        # append mode's watermark eviction tracks the grouping column
        .groupBy(F.window("ts", "1 hour").alias("_w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("_w").start.alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_sliding_rollup(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "3 hours",
) -> DataFrame:
    """readStream twin of ``operators.sessionize.sliding_rollup``
    (2h windows sliding 1h): identical Expand-then-aggregate plan, plus
    the watermark that lets append mode finalize each overlapping
    window once its close passes the event-time high-water mark.
    Watermark must cover the window DURATION plus lateness -- a 2h
    window needs >= 2h of horizon or nothing ever finalizes."""
    raw = read_event_stream(spark, source_dir)
    return (
        raw.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("_w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("_w").start.alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


#: Closed-session output schema of the stateful sessionizer.
SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)

#: Per-user open-session state carried between micro-batches
#: (timestamps as epoch-micros longs -- state rows must be Arrow-simple).
_STATE_SCHEMA = "start_us bigint, last_us bigint, n_events bigint, sum_value double"


def streaming_sessionize(
    spark: SparkSession,
    source_dir: str,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
    max_files_per_trigger: int | None = None,
    drain_user_id: int | None = None,
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState`` -- the semantics ``operators.sessionize``
    computes in batch, maintained incrementally per user.

    State per user_id is the open session (start, last-event, count,
    sum); an event more than ``gap_minutes`` after the last closes the
    session and opens a new one. Sessions whose gap elapses with no new
    events are closed by an **event-time timeout**: the timeout fires
    when the watermark (not wall-clock) passes ``last_event + gap``, so
    results are deterministic replay-to-replay and late events within
    the watermark are still absorbed. State size is O(live users), not
    O(events) -- the property that keeps this runnable on an unbounded
    100TB stream.

    Output (append mode) is one row per *closed* session. Sessions that
    go idle mid-stream are closed by the same event-time timeout; the
    LAST open session per user only closes once the watermark passes its
    ``last_event + gap``, which a bounded stream's frozen watermark never
    does on its own. The drain policy is the standard punctuation
    pattern: ``write_drain_sentinel`` appends one far-future heartbeat
    event for ``drain_user_id`` (a reserved id that never collides with
    real users); processing it advances the watermark past every open
    session's deadline, the no-data micro-batch fires all timeouts, and
    the sentinel itself is absorbed without creating state or output --
    so closed + drained output equals the batch twin EXACTLY and the
    state store ends empty (tested).
    """
    import pandas as pd  # noqa: F401  (executor-side dependency)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if drain_user_id is not None and user_id == drain_user_id:
            # watermark-advancing heartbeat: no session, no state, no rows
            if state.exists:
                state.remove()
            return
        closed: list[tuple] = []
        if state.hasTimedOut:
            start_us, last_us, n, sv = state.get
            closed.append((user_id, start_us, last_us, n, sv))
            state.remove()
        else:
            ev = pd.concat(list(pdfs))
            ev = ev.sort_values(["ts", "event_id"])
            ts_us = ev["ts"].astype("int64") // 1000
            cur = state.get if state.exists else None
            for t, v in zip(ts_us, ev["value"].astype("float64")):
                t, v = int(t), float(v)
                # decimal(18,2) quantization to match the batch twin's
                # exact money accumulation
                v = round(v, 2)
                if cur is None:
                    cur = (t, t, 1, v)
                elif t - cur[1] > gap_us:
                    closed.append((user_id, *cur))
                    cur = (t, t, 1, v)
                else:
                    cur = (cur[0], t, cur[2] + 1, round(cur[3] + v, 2))
            if cur is not None:
                state.update(cur)
                # event-time timeout at last_event + gap (epoch millis)
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
                    "n_events": [c[3] for c in closed],
                    "sum_value": [c[4] for c in closed],
                }
            )

    raw = read_event_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    return (
        raw.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_sessionize_native(
    spark: SparkSession,
    source_dir: str,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Gap sessionization via Spark's NATIVE streaming session_window --
    the built-in twin of the applyInPandasWithState sessionizer above
    and of the batch ``q_events_sessionize_native``.

    The engine maintains per-(user, session) state and MERGES windows
    when a late-but-within-watermark event bridges two provisional
    sessions; a session is emitted (append mode) once the watermark
    passes its end+gap. Same state bound as the custom operator --
    O(open sessions) -- with zero Python in the loop: prefer this form
    unless the session logic needs custom transitions. ``session_end``
    is taken as max(ts) inside the group (the window's own end is
    last_event + gap), so output is row-identical to the batch twin.

    DELIBERATELY NO in-plan heartbeat filter: ``user_id`` is a grouping
    column, so a ``where(user_id != drain_id)`` above this aggregate is
    pushed by Catalyst through the aggregate AND the EventTimeWatermark
    node into the parquet scan -- the heartbeat rows then never reach
    the watermark collector and the drain silently stops working
    (numInputRows drops to 0 for sentinel files; verified on Spark
    4.1). The custom sessionizer above is immune because its drain
    filtering happens INSIDE the stateful function. Here the heartbeat
    session comes out like any other and the CONSUMER drops it by its
    reserved user_id -- the same contract as any tombstone row.
    """
    raw = read_event_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    return (
        raw.withWatermark("ts", watermark)
        .groupBy(
            "user_id",
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events", "sum_value"
        )
    )


def write_drain_sentinel(
    spark: SparkSession,
    source_dir: str,
    ts_ns: int,
    user_id: int = -1,
) -> None:
    """Append one punctuation/heartbeat event to a file-stream source.

    ``ts_ns`` (epoch nanos) must exceed ``max(event ts) + gap +
    watermark`` so that, once processed, the stream's watermark passes
    every open session's timeout deadline and the engine's no-data
    micro-batch closes them all. Pair with
    ``streaming_sessionize(drain_user_id=...)`` so the sentinel row
    itself never creates state or output. This is the bounded-replay /
    end-of-day drain: at 100TB the same one-row append costs nothing
    and needs no access to the state store internals.

    The sentinel file is written in the SAME ts layout the source dir
    already holds -- a file stream reads every file under one fixed
    schema, so a mixed-layout append would break the whole stream.
    """
    ts_dtype = _probe_ts_dtype(spark, source_dir)
    if ts_dtype == "bigint":
        ts_value = int(ts_ns)
    else:
        import datetime as _dt

        ts_value = _dt.datetime(1970, 1, 1) + _dt.timedelta(
            microseconds=int(ts_ns) // 1000
        )
    row = [(int(-(2**62)), ts_value, int(user_id), "__drain__", 0.0, None)]
    spark.createDataFrame(row, event_schema(ts_dtype)).coalesce(1).write.mode(
        "append"
    ).parquet(source_dir)


def streaming_dedup_events(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "1 hour",
    key_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Streaming exactly-once-per-key dedup: at-least-once sources
    (Kafka redeliveries, retried producers) are collapsed to one row
    per key with ``dropDuplicatesWithinWatermark`` -- the state store
    remembers keys only within the watermark horizon, so state is
    bounded by (arrival rate x watermark), not by stream length. The
    batch twin is exact_dedup; here duplicates must also be NEAR in
    time, which is exactly the redelivery model.
    """
    raw = read_event_stream(spark, source_dir)
    return raw.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def streaming_signup_purchase_join(
    spark: SparkSession,
    source_dir: str,
    horizon_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream time-interval join: each purchase is attributed to
    the same user's signup if it lands within ``horizon_minutes`` of it
    (the streaming form of the signup->purchase funnel).

    Both sides carry a watermark and the join predicate bounds event
    time in BOTH directions (``signup_ts <= purchase_ts <= signup_ts +
    horizon``), which is what lets Spark evict join state: a buffered
    signup can be dropped once the purchase-side watermark passes
    ``signup_ts + horizon``, so state is O(events within the horizon),
    not O(stream). An unbounded predicate would buffer both streams
    forever -- the canonical 100TB stream-join failure mode.
    """
    raw = read_event_stream(spark, source_dir)
    signups = (
        raw.where(F.col("event_type") == "signup")
        .select(F.col("user_id"), F.col("ts").alias("signup_ts"))
        .withWatermark("signup_ts", watermark)
    )
    purchases = (
        raw.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return signups.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("signup_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        ),
    ).select("user_id", "signup_ts", "purchase_ts", "purchase_value")


def streaming_enrich_with_dim(
    spark: SparkSession,
    source_dir: str,
    dim: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """Stream-static join: enrich the event stream with a batch-side
    dimension (the streaming form of the reference's J3 broadcast dim
    join). The static side is re-resolved per micro-batch -- a dim
    updated between batches is picked up without restarting the stream
    -- and is broadcast, so the join adds no shuffle and NO state store
    (unlike stream-stream joins, there is nothing to buffer: the static
    side is always completely known)."""
    raw = read_event_stream(spark, source_dir)
    return raw.join(F.broadcast(dim), key, "left")


def run_to_partitioned_parquet(
    agg: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: str = "bucket_start",
) -> None:
    """Exactly-once-in-effect warehouse sink: watermarked append-mode
    windows -> ``foreachBatch`` -> dynamic-partition-overwrite parquet.

    Append mode emits each window exactly once, after the watermark
    closes it; the foreachBatch write replaces that window's partition
    atomically, so a replayed micro-batch (failure/restart with the same
    checkpoint) rewrites identical partitions instead of duplicating
    rows -- the streaming twin of the batch writer's DELETE-then-COPY
    contract (K3). State recovery itself is the checkpoint's job.
    """
    from ..sources.writers import write_partitioned

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_partitioned(batch_df, path, partition_by, sort_within=None)

    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_observed(
    sdf: DataFrame,
    observation_name: str,
    sink,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> list[dict]:
    """Drive a bounded stream through ``foreachBatch`` while collecting
    the per-micro-batch metrics an upstream ``df.observe(name, ...)``
    attached -- streaming's version of the batch pipeline's single-pass
    Observation audit (batch ``Observation.get`` blocks forever on a
    stream; here each batch's metrics arrive in
    ``lastProgress.observedMetrics`` after the batch commits).

    Returns one dict per non-empty micro-batch: the observed metric row
    plus ``batchId``. The metrics ride the stream's own processing --
    no second pass, no extra state.
    """
    import json

    collected: list[dict] = []

    q = (
        sdf.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
        # recentProgress holds every batch of this bounded run
        for prog in q.recentProgress:
            p = json.loads(prog.json) if hasattr(prog, "json") else prog
            om = p.get("observedMetrics") or {}
            if observation_name in om:
                row = dict(om[observation_name])
                row["batchId"] = p.get("batchId")
                collected.append(row)
    finally:
        q.stop()
    return collected


def run_to_memory_sink(
    agg: DataFrame, query_name: str = "events_stream", output_mode: str = "complete"
) -> None:
    """Drive a bounded stream to completion into an in-memory table
    (test/dev harness; exactly-once parquet/kafka sinks attach the same
    way via ``foreachBatch``)."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_merge_upsert_stream(
    updates_stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    key_cols: str | list[str],
    partition_col: str = "date_key",
    version_col: str | None = None,
) -> list[dict]:
    """Streaming CDC: a change stream lands in the partitioned mart as
    row-level keyed MERGEs -- ``foreachBatch`` over the batch
    ``merge_upsert``, one transactional-in-effect merge per micro-batch.

    The streaming layer adds exactly-once-in-effect semantics on top of
    the merge's own idempotency: a replayed micro-batch (restart from
    the same checkpoint) re-merges identical rows, which same-key
    replace makes a no-op. Returns the per-batch audit dicts (batch_id
    added) so a monitoring hook sees rows_inserted/rows_replaced per
    micro-batch -- the streaming equivalent of the reference DAG's
    post-load row-count check (dags/retail_pipeline_dag.py:60-70).
    """
    from ..sources.writers import merge_upsert

    audits: list[dict] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        audit = merge_upsert(
            batch_df.sparkSession,
            batch_df,
            path,
            key_cols,
            partition_col=partition_col,
            version_col=version_col,
        )
        audits.append({"batch_id": batch_id, **audit})

    q = (
        updates_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return audits


#: Alert schema of the streaming anomaly detector (matches the batch
#: twin q_value_anomalies column-for-column).
ANOMALY_SCHEMA = (
    "event_type string, ts timestamp, event_id bigint, value double, "
    "n_prior bigint, sum_prior bigint"
)

#: Running-moments state per event_type: count, cent-sum, cent-sum-sq.
_ANOMALY_STATE = "n bigint, sum_cents bigint, sumsq_cents bigint"


def quantize_cents(v: float) -> int:
    """``F.round(value * 100).cast("long")``, replicated in Python.

    Spark's ``round`` on a double is ``BigDecimal.valueOf`` (the
    shortest round-trip decimal repr, which Python's ``repr`` also
    produces) + ``RoundingMode.HALF_UP`` (ties away from zero).
    Python's built-in ``round()`` is half-EVEN and diverges on exact
    half-cents (0.125 -> 12 instead of 13), which would break the
    bit-identical batch/stream contract; tested against F.round on the
    half-cent edge cases in tests/test_streaming.py.
    """
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(float(v) * 100)).quantize(
            Decimal("1"), rounding=ROUND_HALF_UP
        )
    )


def streaming_value_anomalies(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = None,
    min_n: int = 10,
    k: int = 3,
) -> DataFrame:
    """Second custom stateful operator: per-key running z-score alerts
    via ``applyInPandasWithState`` -- numeric Welford-style state, a
    different state shape from the sessionizer (no timeouts: alerts
    emit inline as events arrive; state is 3 integers per key,
    O(|event types|) forever).

    EXACT twin of the batch ``q_value_anomalies``: values quantize to
    cents, the alert test is the squared integer form
    ``(c*n - s)^2 > k^2*(n*ss - s^2)`` evaluated in unbounded Python
    ints, so as long as micro-batch files arrive in event-time order
    the streamed alert set is bit-identical to the batch query run over
    the same data (tested). At 100 TB this is the Kafka -> alert
    topology for metric drift; the state store carries 24 bytes per
    key.
    """
    import pandas as pd  # noqa: F401  (executor-side dependency)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    kk = k * k

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (etype,) = key
        n, s, ss = state.get if state.exists else (0, 0, 0)
        n, s, ss = int(n), int(s), int(ss)
        out = []
        ev = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for ts, eid, v in zip(ev["ts"], ev["event_id"], ev["value"]):
            c = quantize_cents(v)
            if n >= min_n:
                dev = c * n - s
                if dev * dev > kk * (n * ss - s * s):
                    out.append((etype, ts, int(eid), float(v), n, s))
            n, s, ss = n + 1, s + c, ss + c * c
        state.update((n, s, ss))
        if out:
            yield pd.DataFrame(
                {
                    "event_type": [o[0] for o in out],
                    "ts": [o[1] for o in out],
                    "event_id": [o[2] for o in out],
                    "value": [o[3] for o in out],
                    "n_prior": [o[4] for o in out],
                    "sum_prior": [o[5] for o in out],
                }
            )

    raw = read_event_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    return raw.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_ANOMALY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_distinct_bitmap_stream(
    events_stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    grain: str = "month",
) -> list[dict]:
    """Streaming maintenance of EXACT distinct counts: the incremental
    twin of the batch ``dau_bitmap_merge``. Each micro-batch builds its
    per-(grain, bucket) id bitmaps and ORs them into a tiny partitioned
    state table -- distinct users per month stays queryable at any
    moment without ever rescanning history, and the count is exact, not
    a sketch estimate.

    Exactly-once-in-effect comes from OR's IDEMPOTENCE, one level
    stronger than the CDC stream's same-key-replace: a replayed
    micro-batch re-ORs ids that are already set, leaving the state
    byte-identical -- no version column, no dedup bookkeeping. Only the
    grains touched by the batch are read and dynamically overwritten
    (same touched-partition discipline as ``merge_upsert``); state size
    is bounded by the id-space density (~4 KB/bucket ceiling), not by
    event volume.

    Returns per-batch audits: ``{"batch_id", "grains", "rows"}``.
    Query the state with ``distinct_counts_from_state``.
    """
    from ..sources.writers import _mart_exists

    audits: list[dict] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_bm = (
            batch_df.select(
                F.date_trunc(grain, "ts").cast("date").alias("grain"),
                F.col(key_col).alias("k"),
            )
            .groupBy("grain", F.bitmap_bucket_number("k").alias("bucket"))
            .agg(F.bitmap_construct_agg(F.bitmap_bit_position("k")).alias("bm"))
        )
        if _mart_exists(spark, state_path):
            touched = [r.grain for r in batch_bm.select("grain").distinct().collect()]
            prior = spark.read.parquet(state_path).where(
                F.col("grain").isin(touched)
            )
            batch_bm = (
                prior.unionByName(batch_bm)
                .groupBy("grain", "bucket")
                .agg(F.bitmap_or_agg("bm").alias("bm"))
            )
        # cut lineage before overwriting the files the plan reads from
        # (same read-then-replace discipline as merge_upsert)
        merged = batch_bm.localCheckpoint(eager=True)
        merged.write.mode("overwrite").partitionBy("grain").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(state_path)
        audits.append(
            {
                "batch_id": batch_id,
                "grains": sorted(str(g) for g in {r.grain for r in merged.select("grain").collect()}),
                "rows": merged.count(),
            }
        )

    q = (
        events_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return audits


def distinct_counts_from_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Exact distinct count per grain from the bitmap state table --
    a KB-scale scan regardless of how many events ever streamed."""
    return (
        spark.read.parquet(state_path)
        .groupBy("grain")
        .agg(F.sum(F.bitmap_count("bm")).cast("long").alias("exact_distinct"))
        .orderBy("grain")
    )


def tws_available() -> bool:
    """Capability probe for ``transformWithStateInPandas`` (Spark 4's
    successor to applyInPandasWithState): its driver-side state server
    speaks protobuf, so the API needs the ``google.protobuf`` package
    at RUNTIME (verified empirically: without it the streaming Python
    runner exits -2 with ImportError before the first batch). Gate,
    don't crash -- the Avro-jar discipline (sources/readers.py).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


#: user-totals state: exact cents in BIGINT (quantize_cents discipline)
_TOTALS_SCHEMA = "user_id bigint, n_events bigint, cents bigint"


def streaming_user_totals(spark: SparkSession, source_dir: str) -> DataFrame:
    """Third custom stateful operator, on the MODERN state API
    (``transformWithStateInPandas`` + ValueState + RocksDB provider):
    per-user running (event count, exact cents) totals, emitted on
    every update -- the feature-store freshness pattern (running user
    aggregates consumed by a serving layer).

    vs ``applyInPandasWithState`` (the sessionizer/alerter API): state
    here is a typed, named ValueState the engine owns -- composable
    with ListState/MapState, TTL, and timers -- rather than one opaque
    tuple per key. Requires ``tws_available()``; callers must set the
    RocksDB state store provider (transformWithState's only supported
    backend):

        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")

    The batch twin is ``events.groupBy(user_id).agg(count, sum(cents))``
    -- the gated test pins streamed-final == batch exactly.
    """
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the google.protobuf package; "
            "gate calls behind tws_available()"
        )
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField, StructType

    state_schema = StructType(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )

    class _UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._s = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            n, cents = self._s.get() if self._s.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(sum(quantize_cents(v) for v in pdf["value"]))
            self._s.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "cents": [cents]}
            )

        def close(self) -> None:
            pass

    raw = read_event_stream(spark, source_dir)
    return raw.groupBy("user_id").transformWithStateInPandas(
        _UserTotals(),
        outputStructType=_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


ATTRIBUTION_SCHEMA = (
    "user_id bigint, event_id bigint, touch string, cents bigint"
)
_ATTR_STATE_SCHEMA = "touch string, touch_sec bigint"


def streaming_attribution(
    spark: SparkSession,
    source_dir: str,
    lookback_days: int = 7,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stateful streaming last-touch attribution: the incremental twin
    of ``queries.q_purchase_attribution``. State per user is ONE tuple
    (last touch label, its epoch second) -- O(live users), not
    O(events); every purchase resolves IMMEDIATELY against that state,
    so there are no timeouts, no pending output, and no drain
    punctuation (unlike sessionize, nothing waits for a watermark).

    Emits one row per purchase (user_id, event_id, touch, cents) in
    append mode; `touch` is 'click'/'view'/'organic' under the same
    contract as the batch query: strictly-preceding touch, ties broken
    by event_id within a micro-batch's sort, inclusive
    ``lookback_days`` boundary on integer epoch seconds, integer-cents
    money (``quantize_cents`` -- HALF_UP, matching ``F.round``).
    Exact parity with the batch window requires per-user event-time
    order ACROSS micro-batches (time-ordered source files), the same
    in-order delivery discipline the sessionize twin documents; within
    a batch any order is fine (sorted here).
    """
    import pandas as pd  # noqa: F401  (executor-side dependency)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    lookback_s = lookback_days * 86400

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        touch, touch_sec = state.get if state.exists else (None, None)
        ev = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out: list[tuple] = []
        secs = ev["ts"].astype("int64") // 1_000_000_000
        for sec, eid, etype, val in zip(
            secs, ev["event_id"], ev["event_type"], ev["value"]
        ):
            sec, eid = int(sec), int(eid)
            if etype in ("click", "view"):
                touch, touch_sec = etype, sec
            elif etype == "purchase":
                label = (
                    touch
                    if touch is not None and sec - touch_sec <= lookback_s
                    else "organic"
                )
                # NULL value stays NULL cents (the batch twin's
                # F.round(NULL) semantics), not a float(None) crash
                cents = (
                    quantize_cents(float(val)) if pd.notna(val) else None
                )
                out.append((user_id, eid, label, cents))
        if touch is not None:
            state.update((touch, touch_sec))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "touch", "cents"]
            )

    raw = read_event_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    return raw.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ATTRIBUTION_SCHEMA,
        stateStructType=_ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


THROTTLE_SCHEMA = "user_id bigint, event_id bigint, sec bigint"
_THROTTLE_STATE_SCHEMA = "last_sec bigint"


def streaming_alert_throttle(
    spark: SparkSession,
    source_dir: str,
    alert_type: str = "error",
    cooldown_minutes: int = 10,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stateful alert-storm suppression: at most one emitted alert per
    key per ``cooldown_minutes``, chained off the last EMITTED alert
    (the greedy rule a window cannot spell -- see
    ``alerts.throttle_alerts``, the exact batch twin). State per key is
    ONE epoch second; alerts resolve immediately (no timeouts, no
    drain punctuation). Exact batch parity requires per-key event-time
    order across micro-batches (time-ordered source files), the same
    delivery discipline as the sessionize and attribution twins.
    """
    import pandas as pd  # noqa: F401  (executor-side dependency)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cooldown_s = cooldown_minutes * 60

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        (last,) = state.get if state.exists else (None,)
        ev = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out: list[tuple] = []
        secs = ev["ts"].astype("int64") // 1_000_000_000
        for sec, eid in zip(secs, ev["event_id"]):
            sec, eid = int(sec), int(eid)
            if last is None or sec - last >= cooldown_s:
                out.append((user_id, eid, sec))
                last = sec
        if last is not None:
            state.update((last,))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "event_id", "sec"])

    raw = read_event_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    return (
        raw.where(F.col("event_type") == alert_type)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=THROTTLE_SCHEMA,
            stateStructType=_THROTTLE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


MG_CANDIDATE_SCHEMA = "bucket int, key string, residual bigint"
_MG_STATE_SCHEMA = "keys array<string>, counts array<bigint>"


def streaming_mg_candidates(
    spark: SparkSession,
    source_dir: str,
    key_col: str = "user_id",
    k: int = 200,
    n_buckets: int = 8,
    watermark: str = "1 minute",
    drain_user_id: int | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming Misra-Gries candidate generation: the incremental twin
    of ``operators/sketch.mg_candidate_keys`` (pass 1 of the exact
    two-pass ``heavy_hitters``). Keys hash to ``n_buckets`` state
    groups; each group's state is ONE bounded MG summary (<= k-1
    counters, arrays in the state store), merged batch-by-batch with
    the same mergeable rule as the batch sketch. Because every
    occurrence of a key lands in the same bucket, a key with global
    count > N/k >= N_bucket/k survives its bucket's summary -- the
    candidate union stays COMPLETE, so an exact recount over the
    emitted candidates reproduces the batch ``heavy_hitters`` output
    EXACTLY (tested).

    Summaries flush through the sessionize drain discipline: each
    update arms an event-time timeout just past the bucket's last
    event; the ``write_drain_sentinel`` heartbeat advances the
    watermark past every deadline and the no-data micro-batch emits
    all summaries (the sentinel itself is filtered INSIDE the stateful
    function -- a where() above it would push past the watermark node
    and kill the drain, the documented sessionize_native trap). State
    is O(n_buckets * k) counters TOTAL, independent of the key
    universe -- the property that keeps this runnable on an unbounded
    stream."""
    import pandas as pd  # noqa: F401  (executor-side dependency)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (bucket,) = key
        if state.hasTimedOut:
            keys, counts = state.get
            state.remove()
            if len(keys):
                yield pd.DataFrame(
                    {
                        "bucket": [int(bucket)] * len(keys),
                        "key": list(keys),
                        "residual": [int(c) for c in counts],
                    }
                )
            return
        counters: dict = {}
        if state.exists:
            keys, counts = state.get
            counters = dict(zip(keys, (int(c) for c in counts)))
        last_ms = None
        for pdf in pdfs:
            if drain_user_id is not None:
                pdf = pdf[pdf["user_id"] != drain_user_id]
            if not len(pdf):
                continue
            ms = int(pdf["ts"].astype("int64").max() // 1_000_000)
            last_ms = ms if last_ms is None else max(last_ms, ms)
            vc = pdf["_key"].value_counts()
            for kk, c in vc.items():
                counters[kk] = counters.get(kk, 0) + int(c)
            if len(counters) > k - 1:
                cut = sorted(counters.values(), reverse=True)[k - 1]
                counters = {
                    kk: c - cut for kk, c in counters.items() if c > cut
                }
        state.update((list(counters), [counters[kk] for kk in counters]))
        # re-arm EVERY invocation: GroupState clears the timeout each
        # time the function runs for a key, so a batch whose rows were
        # all filtered (the sentinel's own bucket) would otherwise
        # never flush. The deadline must also exceed the current
        # watermark, hence the floor.
        wm = state.getCurrentWatermarkMs()
        deadline = wm + 1000 if last_ms is None else max(last_ms, wm) + 1000
        state.setTimeoutTimestamp(deadline)

    raw = read_event_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    keyed = raw.select(
        "ts",
        "user_id",
        F.col(key_col).cast("string").alias("_key"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )
    return (
        keyed.withWatermark("ts", watermark)
        .groupBy("bucket")
        .applyInPandasWithState(
            update,
            outputStructType=MG_CANDIDATE_SCHEMA,
            stateStructType=_MG_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_wau(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "8 days",
    drain_user_id: int | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Trailing-7-day WEEKLY ACTIVE USERS as a stream: the streaming
    twin of the WAU side of ``queries.q_dau_wau_stickiness``, built
    from THREE CHAINED stateful operators in append mode (supported
    since multiple-stateful-operator chaining landed; each stage
    re-windows on ``window_time`` of the previous):

      1. distinct (day, user): groupBy(window(ts, 1d), user)  -- the
         stream-side dedup that makes COUNT(*) a distinct-user count,
      2. distinct (7d sliding window, user): a user active 3 times in
         a week still counts once,
      3. count per window -> WAU.

    The emitted ``day`` is the window END day (start + 6): a window
    [s, s+7) is the trailing week OF day s+6 -- exactly the batch
    query's explode(sequence(0,6)) fan-out, evaluated lazily by the
    window Expand instead of eagerly by the explode. Watermark must
    cover the 7-day window plus lateness or stage 2 never finalizes.
    State is bounded: stage 1 holds <= one row per (day, user) inside
    the horizon, stages 2-3 one row per (window, user) / window.

    A ``drain_user_id`` row (the ``write_drain_sentinel`` protocol)
    is filtered out BEFORE stage 1 so the flush heartbeat never
    becomes a fake active user. The sentinel must land in a LATER
    trigger than the data (``max_files_per_trigger=1`` in the bounded
    replay): the watermark only advances BETWEEN micro-batches, so a
    same-batch sentinel flushes nothing."""
    raw = read_event_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    ).withWatermark("ts", watermark)
    # The drain filter must sit AFTER the watermark collector: sentinel
    # rows advance the watermark, they just never become state. A plain
    # user_id predicate gets PUSHED THROUGH EventTimeWatermark by
    # Catalyst (it does not reference the event-time column) and kills
    # the sentinels at the scan -- referencing ``ts`` in the predicate
    # pins it above the collector (PushPredicateThroughNonJoin only
    # pushes watermark-safe predicates).
    if drain_user_id is not None:
        raw = raw.where(
            (F.col("user_id") != F.lit(drain_user_id)) | F.col("ts").isNull()
        )
    day_user = raw.groupBy(
        F.window("ts", "1 day").alias("w1"), "user_id"
    ).agg(F.count("*").alias("n"))
    week_user = day_user.groupBy(
        F.window(F.window_time("w1"), "7 days", "1 day").alias("w7"),
        "user_id",
    ).agg(F.count("*").alias("days_active"))
    return (
        week_user.groupBy(F.col("w7"))
        .agg(F.count("*").cast("long").alias("wau"))
        .select(
            F.date_add(F.to_date(F.col("w7").start), 6).alias("day"),
            "wau",
        )
    )


def streaming_promo_interval_join(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "9 days",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream-stream INTERVAL-CONTAINMENT join + chained windowed agg:
    the streaming twin of ``queries.q_purchases_in_promo_windows``
    (and the streaming form of the ``orders_in_promos`` range-join
    shape). Three chained stateful operators in append mode:

      1. promo-window stream: every event projects its week's promo
         window start (Monday, ``date_trunc('week', ts)``), deduped to
         one row per week by a stateful ``dropDuplicates`` whose
         subset IS the event-time column -- state evicts by watermark;
      2. point-in-interval join: purchases land in their week's
         [promo_start, promo_start + 2 days) window. The equi-key
         (the purchase's own week truncation == promo_start) gives the
         state store a hash-partitionable key -- the same
         bucketize-then-exact-containment discipline as the batch
         ``operators.interval.interval_join``, with bucket == week --
         and the explicit time-range predicate is what lets the engine
         EVICT: a buffered promo row drops once the purchase-side
         watermark passes ``promo_start + 2 days``, a buffered
         purchase once the promo-side watermark passes its ``ts``, so
         join state is O(events inside the horizon), not O(stream);
      3. Monday-aligned tumbling-week aggregation over the joined
         rows (``window(ts, '7 days', startTime='4 days')`` -- the
         epoch is a Thursday, +4 days lands windows on Mondays), which
         finalizes in append mode once the watermark passes each
         window's end.

    Both watermarks are ``9 days``: a week's duplicate promo
    projections arrive up to 7 days after the first (the whole week
    fan-in), so the dedup key must survive at least that long or a
    re-emitted promo row would double-count every purchase joined
    after the eviction. Revenue sums in DECIMAL(18,2) -- exact,
    order-independent, replay-deterministic -- and casts to double
    only at the edge, the batch query's own discipline.

    Drain: the ``write_drain_sentinel`` heartbeats advance the
    watermark (``event_type`` filters here reference ``ts`` so
    Catalyst cannot push them below the EventTimeWatermark collector
    -- the r9 lesson); sentinels are ``__drain__``-typed so they
    never become a purchase, and their phantom future promo windows
    join nothing and are dropped by the inner join.
    """
    raw = read_event_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    promos = (
        raw.select(F.date_trunc("week", "ts").alias("promo_start"))
        .withWatermark("promo_start", watermark)
        .dropDuplicates(["promo_start"])
    )
    purchases = (
        raw.withWatermark("ts", watermark)
        .where((F.col("event_type") == "purchase") | F.col("ts").isNull())
        .select(
            "ts",
            F.col("value").cast("decimal(18,2)").alias("_v"),
            F.date_trunc("week", "ts").alias("_wk"),
        )
    )
    joined = purchases.join(
        promos,
        (F.col("_wk") == F.col("promo_start"))
        & (F.col("ts") >= F.col("promo_start"))
        & (F.col("ts") < F.col("promo_start") + F.expr("INTERVAL 2 DAYS")),
    )
    return (
        joined.groupBy(
            F.window("ts", "7 days", "7 days", "4 days").alias("w")
        )
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum("_v").cast("double").alias("promo_revenue"),
        )
        .select(
            F.to_date(F.col("w").start).alias("promo_start"),
            "n_purchases",
            "promo_revenue",
        )
    )


def streaming_trending_types(
    spark: SparkSession,
    source_dir: str,
    k: int = 3,
    watermark: str = "2 days",
    max_files_per_trigger: int | None = None,
    collector: list | None = None,
) -> "object":
    """Per-day TOP-K trending event types: the RANK-AFTER-WATERMARK
    pattern. Structured Streaming cannot rank inside a windowed
    aggregation (a rank is only meaningful once the window's groups
    are FINAL), so the plan splits at exactly the point the engine
    finalizes state:

      1. in-stream: watermarked tumbling-day (window, event_type)
         counts in APPEND mode -- every group of a given day emits
         exactly once, in the micro-batch whose watermark passes the
         day's end, so each day arrives at the sink COMPLETE;
      2. in-sink (``foreachBatch``): a per-day rank window over that
         finalized batch keeps the top-``k`` (count desc, type asc --
         deterministic), appended to the collector/sink.

    The foreachBatch side is plain batch Spark -- the same rank the
    batch twin runs -- so parity is structural, not coincidental. At
    100 TB the sink batch holds one day's GROUPS (|event types|), not
    its events. Returns the StreamingQuery (caller awaits/stops);
    results accumulate in ``collector`` as Rows (day, event_type,
    n, rank)."""
    out: list = collector if collector is not None else []

    raw = read_event_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    ).withWatermark("ts", watermark)
    # sentinel heartbeats advance the watermark but must never become
    # a trending type; the predicate references ts so Catalyst cannot
    # push it below the EventTimeWatermark collector (the r9 lesson)
    raw = raw.where(
        (F.col("event_type") != "__drain__") | F.col("ts").isNull()
    )
    counts = raw.groupBy(
        F.window("ts", "1 day").alias("w"), "event_type"
    ).agg(F.count("*").cast("long").alias("n"))

    def sink(batch_df, batch_id):
        from pyspark.sql import Window as W

        if batch_df.isEmpty():
            return
        ranked = (
            batch_df.select(
                F.to_date(F.col("w").start).alias("day"), "event_type", "n"
            )
            .withColumn(
                "rank",
                F.row_number().over(
                    W.partitionBy("day").orderBy(
                        F.col("n").desc(), F.col("event_type")
                    )
                ),
            )
            .where(F.col("rank") <= k)
        )
        out.extend(ranked.collect())

    q = counts.writeStream.outputMode("append").foreachBatch(sink).start()
    return q


TRANSITION_SCHEMA = "user_id bigint, from_type string, to_type string"
_TRANSITION_STATE_SCHEMA = "last_us bigint, last_eid bigint, last_type string"


def streaming_type_transitions(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stateful streaming EVENT-TYPE TRANSITIONS: the incremental twin
    of ``queries.q_event_type_transitions``. State per user is the
    single last event (epoch-micros, event_id, type) -- O(live users)
    -- and every arriving event emits its (prev, next) pair
    IMMEDIATELY, so like ``streaming_attribution`` there are no
    timeouts and no drain punctuation. Within a micro-batch events
    sort by (ts, event_id), the batch window's exact order; across
    micro-batches exact parity requires time-ordered source files
    (the same in-order delivery discipline the attribution twin
    documents). The downstream count/share rollup is a plain
    aggregation the consumer attaches."""
    import pandas as pd  # noqa: F401  (executor-side dependency)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        last_us, last_eid, last_type = (
            state.get if state.exists else (None, None, None)
        )
        ev = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out: list[tuple] = []
        uss = ev["ts"].astype("int64") // 1_000
        for us, eid, etype in zip(uss, ev["event_id"], ev["event_type"]):
            us, eid = int(us), int(eid)
            if last_type is not None:
                out.append((user_id, last_type, etype))
            last_us, last_eid, last_type = us, eid, etype
        if last_type is not None:
            state.update((last_us, last_eid, last_type))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "from_type", "to_type"]
            )

    raw = read_event_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    return raw.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=_TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
