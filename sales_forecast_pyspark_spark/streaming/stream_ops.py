"""Structured Streaming over the events table: readStream source,
watermarked tumbling-window aggregation, session windows, and an
availableNow runner for batch-equivalence testing.

The reference is batch-only (SURVEY.md §2.10); this module is the
streaming extension the driver's events table invites. Design rules:
event-time semantics via watermarks (late data beyond the watermark is
dropped, state is bounded), the SAME window expressions as the batch
queries so batch-stream equivalence is testable, and checkpointable
sinks in production (the memory sink here is for tests/demos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sales_forecast_pyspark_spark.operators.windows import (
    DEFAULT_CONVERSION_TYPE,
    DEFAULT_TOUCH_TYPES,
)

# Streaming scans require a declared schema (no inference mid-stream).
# The canonical post-normalization events schema; the physical parquet
# may store ts as long nanos or timestamp[us] — stream_events reads the
# footer once and normalizes exactly like the batch scan layer.
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _stream_source(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over ``<sf_dir>/<table>.parquet``, handling
    both layouts the repo ships: the driver testdata's single FILE
    (one micro-batch) and a DIRECTORY of part-files (the rehearsal
    generator's layout — ``maxFilesPerTrigger`` then forces a
    multi-batch drain, making cross-batch state carry real). The
    declared schema comes from the existing footer (a driver-side
    metadata read, not a data scan) — in production this is the
    table's registered schema."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(files_per_trigger))
    if os.path.isfile(path):
        return reader.option(
            "pathGlobFilter", f"{table}.parquet"
        ).parquet(sf_dir)
    return reader.parquet(path)


def stream_events(
    spark: SparkSession, sf_dir: str, files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet (each file = one
    micro-batch under availableNow; in production this is a directory
    that accumulates files, or a Kafka source with the same schema).
    ``normalize_event_ts`` canonicalizes ts to TIMESTAMP exactly like
    the batch scan layer, for every ts encoding the generator has
    shipped."""
    from sales_forecast_pyspark_spark.sources.readers import normalize_event_ts

    return normalize_event_ts(
        _stream_source(spark, sf_dir, "events", files_per_trigger)
    )


def windowed_event_totals(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window totals per event type — the streaming
    twin of the ``events_window`` batch query (same window expression;
    equivalence is asserted in tests). The watermark bounds aggregation
    state: windows older than (max event time - watermark) are finalized
    and their state dropped."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "event_type",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sessionization with the built-in ``session_window`` —
    the stateful-operator path without custom state code (dynamic gaps
    are a gap EXPRESSION, see ``sessionize_stream_dynamic``; only custom
    MERGE semantics need applyInPandasWithState)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "last_event"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "last_event", "n_events")
    )


def sessionize_stream_dynamic(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming DYNAMIC-GAP sessionization — the same per-event
    CalendarInterval gap expression as the batch
    ``sessionization_dynamic`` query (engaged-browsing events extend
    the session 30 min, transactional ones 10), run through the
    stateful ``session_window`` operator with a watermark bounding the
    open-session state. Batch-stream equivalence is asserted in tests;
    no custom state code — the gap EXPRESSION is the extension point,
    applyInPandasWithState is only needed for custom merge logic."""
    gap = F.when(
        F.col("event_type").isin("view", "click"),
        F.expr("make_interval(0,0,0,0,0,30,0)"),
    ).otherwise(F.expr("make_interval(0,0,0,0,0,10,0)"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "last_event"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "last_event", "n_events")
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    ``operators/rowops.py::dedup_exact``. ``dropDuplicatesWithinWatermark``
    keeps one row per key and, unlike plain ``dropDuplicates`` on a
    stream, expires each key's dedup state once the watermark passes it:
    state is bounded by keys-per-watermark-window, not stream lifetime —
    the property that makes exact dedup viable on an unbounded stream.
    Duplicates arriving later than the watermark are NOT caught (that
    tail needs a periodic batch ``dedup_exact`` sweep — the classic
    lambda split)."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_join_near_errors(
    events: DataFrame, horizon: str = "5 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream inner join: pair every error event with the same
    user's activity inside ``horizon`` after it — the streaming twin of
    the batch ``events_near_errors`` range join (pair-level equivalence
    is asserted in tests).

    Both sides carry a watermark and the join condition bounds the event
    times relative to each other, which is what lets Spark expire
    buffered rows: an error older than (max event time − watermark −
    horizon) can never match future activity, so its state is dropped.
    Without the time-range condition the state store would grow
    unboundedly — the stream-stream analogue of the cartesian trap the
    batch operator's binning avoids. Append output mode only (matches
    are final once the watermark passes)."""
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("err_user"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", watermark)
    )
    follows = events.select("event_id", "user_id", "ts", "value").withWatermark(
        "ts", watermark
    )
    cond = (
        (F.col("err_user") == F.col("user_id"))
        & (F.col("ts") >= F.col("err_ts"))
        & (F.col("ts") <= F.col("err_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return errors.join(follows, cond, "inner").select(
        "error_id", "event_id", "user_id", "value"
    )


def stream_join_unanswered_errors(
    events: DataFrame, horizon: str = "5 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream LEFT OUTER join — the state machine the inner join
    never exercises: an error with NO follow-up activity inside
    ``horizon`` must still be emitted (null match side), but only once
    the watermark PROVES no match can arrive. Spark buffers the left
    row until max-event-time − watermark passes the end of its match
    window, then emits the null-padded row and drops the state — so
    "unanswered" results are exactly as late as the watermark, never
    wrong. The join condition's time bounds are what make both the
    outer-emission decision and state expiry possible; errors younger
    than (stream end − watermark − horizon) at drain time stay buffered
    and are NOT emitted (asserted in tests — the batch comparison
    restricts to the closable set). Append mode only."""
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("err_user"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", watermark)
    )
    follows = events.select("event_id", "user_id", "ts", "value").withWatermark(
        "ts", watermark
    )
    cond = (
        (F.col("err_user") == F.col("user_id"))
        & (F.col("ts") >= F.col("err_ts"))
        & (F.col("ts") <= F.col("err_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return errors.join(follows, cond, "left_outer").select(
        "error_id", F.col("err_user").alias("user"), "event_id", "value"
    )


def enrich_stream_with_dim(
    events: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    segment_col: str,
) -> DataFrame:
    """Stream-static enrichment: join the event stream against a BATCH
    dimension table, then aggregate per segment — the canonical "attach
    the customer profile to the clickstream" shape.

    The static side is re-read per micro-batch by definition (Spark
    plans the batch relation fresh each trigger, so a dim table updated
    between triggers is picked up); ``F.broadcast`` pins the hash-join
    strategy so no micro-batch ever shuffles the stream side. Stream-
    static joins need NO watermark — the dim side never buffers state.
    The aggregate's state is one row per segment (bounded by segment
    cardinality, not stream length), so complete-mode output is safe.

    Equivalence contract (asserted in tests): after an availableNow
    drain this equals the batch ``salted_segment_value`` query — the
    same join expressed salted-batch, stream-static, and as the plain
    SQL oracle must agree row-for-row."""
    d = dim.select(
        F.col(dim_key).alias(stream_key), F.col(segment_col).alias("segment")
    )
    return (
        events.join(F.broadcast(d), stream_key, "inner")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )


try:  # optional dependency: transformWithState's driver-side runner
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS_PROTOBUF = True
except ImportError:  # pragma: no cover - exercised in protobuf-less containers
    HAS_TWS_PROTOBUF = False


def running_user_totals_v2(events: DataFrame) -> DataFrame:
    """``running_user_totals`` on Spark 4's ``transformWithStateInPandas``
    — the successor API to ``applyInPandasWithState`` (SPARK-49564 /
    the arbitrary-state v2 design, public Spark source): a
    ``StatefulProcessor`` class with NAMED, independently-typed state
    variables (ValueState here; ListState/MapState for collections)
    instead of one packed GroupState tuple, explicit timer registration
    instead of timeoutConf, and per-variable TTL via ``TTLConfig``.
    Same output contract as ``running_user_totals``: one (user_id,
    n_events, total_value) row per key per micro-batch it appears in,
    update mode.

    Migration map from the v1 operators in this module (kept as the
    production path until the environment supports v2):

    - GroupState tuple        -> handle.getValueState(name, schema)
    - GroupStateTimeout.*     -> timeMode= ('None' | 'ProcessingTime' |
                                 'EventTime') + handle.registerTimer
    - state.hasTimedOut batch -> handleExpiredTimer callback
    - TTL-by-hand (expiring_user_stats' event-time timeout dance)
      -> TTLConfig per state variable

    ENVIRONMENT GATE (same pattern as the PIL-gated image decode,
    multimodal.py): transformWithState's driver-side streaming runner
    speaks protobuf to the JVM, so it requires the ``protobuf`` package
    (and the RocksDB state-store provider, which ships inside Spark).
    This container has no protobuf (and no pip), so construction raises
    with the one-line remedy; the plumbing — processor class, state
    schema, output contract — is real and the equivalence test in
    tests/test_streaming.py activates unchanged the moment the
    environment gains the package (verified against the v1 operator's
    batch-equivalence fixture design). Throughput contract at scale is
    the v1 operators' rows-per-group-instance model; v2 additionally
    amortizes state codec setup per variable rather than per tuple."""
    if not HAS_TWS_PROTOBUF:
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package for "
            "its streaming runner (pip install protobuf); this container "
            "lacks it — use running_user_totals (applyInPandasWithState) "
            "until then"
        )
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals",
                T.StructType(
                    [
                        T.StructField("n", T.LongType()),
                        T.StructField("total", T.DoubleType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        _Totals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="update",
        timeMode="None",
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    cumulative event count + value total, maintained in GroupState
    across micro-batches and emitted on every update.

    This is the escape hatch for stateful semantics the built-in
    window/session operators can't express (custom merge logic, decaying
    counters, cross-batch dedup). State is one tiny tuple per user key —
    bounded by key cardinality, not stream length; with no timeout the
    state lives for the query's lifetime, so keys must be bounded (use a
    TTL timeout for unbounded key spaces).

    THROUGHPUT CONTRACT (measured r08/r09 rehearsal ladder, SCALING.md
    "streaming" section): per-row replay cost is flat; the bound is the
    per-GROUP-PER-BATCH fixed overhead of ``applyInPandasWithState``
    (state get/update, chunk handling, per-group dispatch), so
    throughput tracks **rows per group instance** = batch_rows /
    distinct_keys_in_batch — NOT corpus size. Size micro-batches so
    instances stay in the thousands of rows: at the 100x decade,
    8 files/trigger gave 8.3 rows/instance at 63.5k rows/s; 32
    files/trigger gave 33 rows/instance at 185.6k rows/s (2.9x) with
    identical results. ``scripts/stream_rehearsal.py`` defaults to the
    measured 32; a production firehose reaches the same regime through
    its natural batch interval."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def expiring_user_stats(
    events: DataFrame, ttl: str = "1 hour", watermark: str = "0 seconds"
) -> DataFrame:
    """TTL-expiring per-user stats via ``applyInPandasWithState`` with an
    EVENT-TIME timeout — the state-lifecycle pattern
    ``running_user_totals`` (NoTimeout) cannot provide for an UNBOUNDED
    key space: every key's state would otherwise live for the query's
    lifetime, and on a 100 TB stream the state store, not the data,
    becomes the bottleneck.

    Per user: count events and sum value across micro-batches; arm an
    event-time timeout at (max event time seen for this key + ttl). When
    the watermark passes that mark with no new events, Spark invokes the
    handler once more with ``state.hasTimedOut`` set: the key emits a
    FINAL row (``final=true``) and its state is removed — emit-on-expiry
    with custom finalization logic, which no built-in window/session
    operator expresses. Keys seen again later start fresh (a new
    "visit"). Non-final rows stream out on every update, so downstream
    gets both live running values and a terminal record per visit.

    Timeouts only fire when the watermark ADVANCES, i.e. at micro-batch
    boundaries — a single availableNow batch never expires anything
    (the test drives two batches via maxFilesPerTrigger)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, total, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "final": [True],
                }
            )
            return
        n, total, last_ms = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            batch_max_ms = int(pdf["ts"].max().value // 1_000_000)
            last_ms = max(last_ms, batch_max_ms)
        state.update((n, total, last_ms))
        # arm expiry at (latest event for this key + ttl); must exceed
        # the current watermark or Spark rejects it
        timeout_at = max(
            last_ms + _TTL_MS[0], state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_at)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "final": [False],
            }
        )

    # Resolve the TTL interval to milliseconds once, driver-side, with
    # Spark's own interval parser (so '1 hour', '90 seconds' etc. all
    # work); smuggled into the closure via a 1-element list.
    sess = events.sparkSession
    _TTL_MS = [
        int(
            sess.range(1)
            .select(
                (
                    F.unix_timestamp(
                        F.lit("1970-01-01 00:00:00").cast("timestamp")
                        + F.expr(f"INTERVAL {ttl}")
                    )
                    * 1000
                ).alias("ms")
            )
            .first()["ms"]
        )
    ]

    return events.withWatermark("ts", watermark).groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType="user_id long, n_events long, total_value double, final boolean",
        stateStructType="n long, total double, last_ms long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def observe_quality(
    df: DataFrame,
    cols: list[str],
    name: str = "quality",
) -> DataFrame:
    """Attach per-micro-batch data-quality metrics to a stream with
    ``observe()`` — row count plus a null count per watched column,
    evaluated INSIDE the running query (no second scan, no extra
    action) and surfaced through ``StreamingQueryProgress
    .observedMetrics[name]`` for alerting ("null-rate spiked in this
    batch") without touching the data path.

    This is the streaming face of the batch ``quality_report``
    expectations: the batch operator audits a table at rest, this one
    audits every batch in flight. Works identically on batch frames
    (metrics arrive via QueryExecutionListener there)."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [
        F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}") for c in cols
    ]
    return df.observe(name, *metrics)


def run_available_now(
    df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame to completion over the currently
    available input (trigger=availableNow) into an in-memory table and
    return it as a batch DataFrame. Test/demo harness — production sinks
    are kafka/parquet/delta with checkpointLocation."""
    query = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return df.sparkSession.table(query_name)


def stream_lineitem(
    spark: SparkSession, sf_dir: str, files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the lineitem parquet. New files landing
    in the directory become micro-batches; with ``availableNow`` the
    current contents drain as one bounded run, the standard
    backfill-then-tail pattern."""
    return _stream_source(spark, sf_dir, "lineitem", files_per_trigger)


def daily_panel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the flagship daily panel (plans/panel.py):
    stream-STATIC joins against the supplier/nation dimension tables
    (dims are batch DataFrames — Spark re-plans them per micro-batch, so
    slowly-changing dims pick up updates between batches), then the
    SAME ``daily_rollup`` aggregate the batch query uses — one code path
    for both semantics, which is what makes the equivalence testable.

    No watermark: the panel is keyed by ship-date, not arrival time, and
    the rollup must absorb arbitrarily late rows — complete/update mode
    with unbounded-but-small state (one row per (country, stock, day)
    triple, the PANEL grain, not the event grain)."""
    from sales_forecast_pyspark_spark.operators.aggregates import daily_rollup
    from sales_forecast_pyspark_spark.plans.panel import (
        PANEL_GRAIN,
        PANEL_QTY_COL,
        enrich_for_panel,
        panel_price_expr,
        panel_revenue_expr,
    )
    from sales_forecast_pyspark_spark.sources.readers import read_table

    li = stream_lineitem(spark, sf_dir)
    sup = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    return daily_rollup(
        enrich_for_panel(li, sup, nat),
        keys=PANEL_GRAIN,
        qty_col=PANEL_QTY_COL,
        revenue_expr=panel_revenue_expr(),
        price_expr=panel_price_expr(),
    )


def maintain_partials_stream(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    qty_col: str,
    revenue_expr,
    price_expr,
):
    """Streaming maintenance of the flagship panel's mergeable partial
    state via ``foreachBatch`` — the production form of the incremental
    rollup: each micro-batch folds its ``daily_rollup_partials`` into
    the persisted state, so the published panel is always
    merge-then-finalize bit-equal to a full batch rebuild over
    everything ingested (decimal partials are exact and associative).

    Exactly-once across restarts WITHOUT a transactional sink: the
    state write is keyed by ``batch_id`` (``state_dir/v=<id>``), and
    each fold reads the newest version STRICTLY OLDER than its own
    batch_id. A replayed batch (failure between sink write and
    checkpoint commit) overwrites its own version directory from the
    same base — idempotent; it can never double-fold because its own
    partial output is not in its read set. Version retention: old
    ``v=`` dirs are superseded, keep N for time travel / prune by age
    (a real deployment swaps this two-line layout for Delta/Iceberg
    MERGE and gets retention + metadata pruning from the table format).

    Returns the started StreamingQuery (caller awaits/stops). Use
    ``read_latest_partials`` + ``finalize_daily_rollup`` to publish.
    """
    import os

    from sales_forecast_pyspark_spark.operators.aggregates import (
        daily_rollup_partials,
        merge_daily_rollup_partials,
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = daily_rollup_partials(
            batch_df, keys, qty_col, revenue_expr, price_expr
        )
        bases = []
        if os.path.isdir(state_dir):
            bases = [
                int(d[2:])
                for d in os.listdir(state_dir)
                if d.startswith("v=") and int(d[2:]) < batch_id
            ]
        if bases:
            base = spark.read.parquet(os.path.join(state_dir, f"v={max(bases)}"))
            merged = merge_daily_rollup_partials(base, delta, keys)
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v={batch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_latest_partials(spark: SparkSession, state_dir: str) -> DataFrame:
    """The newest version of the partial state written by
    ``maintain_partials_stream``."""
    import os

    versions = [
        int(d[2:]) for d in os.listdir(state_dir) if d.startswith("v=")
    ]
    return spark.read.parquet(os.path.join(state_dir, f"v={max(versions)}"))


def attribution_stream(
    events: DataFrame,
    touch_types: tuple[str, ...] = DEFAULT_TOUCH_TYPES,
    conversion_type: str = DEFAULT_CONVERSION_TYPE,
) -> DataFrame:
    """Streaming last-touch attribution via ``applyInPandasWithState``:
    per user the state is ONE tuple (last touch type, its event-time
    micros) — O(1) per key regardless of history length — and every
    conversion emits an attributed row (channel, value, latency) the
    moment it arrives. The batch twin
    (operators/windows.py::touch_attribution) needs the full timeline
    under a window sort; the stream needs only the current touch, which
    is why attribution is the canonical "tiny-state stateful operator"
    on a 100 TB event firehose.

    Assumes in-order delivery per user ACROSS micro-batches (attribution
    state cannot retro-correct a touch that arrives after its
    conversion; see ``reconcile_late_attribution`` for the remedy).
    WITHIN a micro-batch no ordering is assumed: Arrow hands a group's
    rows as multiple chunks (split at
    ``spark.sql.execution.arrow.maxRecordsPerBatch``, default 10k) with
    no cross-chunk ordering guarantee, so the whole group batch is
    materialized and sorted by (ts, event_id) ONCE before replay —
    sorting chunks independently would let a hot user spanning chunks
    replay a later touch before an earlier conversion. Memory is
    bounded by one user's rows in one micro-batch, which the state
    design already assumes. Equivalence with the batch operator —
    including a hot user split across Arrow chunks — is pinned in
    tests/test_streaming.py.

    THROUGHPUT CONTRACT (measured r08/r09 rehearsal ladder, SCALING.md
    "streaming" section): per-row cost is flat — throughput is set by
    **rows per group instance** (batch_rows / distinct_users_in_batch)
    times the per-instance fixed cost of ``applyInPandasWithState``.
    Measured at the 100x decade: 8 files/trigger = 8.3 rows/instance =
    63.5k rows/s; 32 files/trigger = 33 rows/instance = 185.6k rows/s
    (2.9x, near-linear in rows/instance — the fixed-cost model).
    ``scripts/stream_rehearsal.py`` defaults to the measured 32; size
    production micro-batches so instances stay in the thousands of
    rows, and cluster parallelism divides instances per core while
    per-row cost stays flat."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    touch_set = set(touch_types)

    def _update(key, pdfs, state: GroupState):
        # Per-group-per-batch fixed cost is this operator's measured
        # throughput bound (SCALING.md streaming table: rows per group
        # INSTANCE, not total rows, sets the ceiling), so the replay
        # path avoids the expensive tiny-frame pandas primitives:
        # pd.concat only when a group actually spans Arrow chunks,
        # vectorized column→list extraction + one plain tuple sort
        # instead of sort_values, and no itertuples (namedtuple
        # construction dominates single-digit-row frames). Ordering
        # semantics are IDENTICAL: (ts, event_id) ascending, event_id
        # unique so later tuple elements never decide.
        last_t, last_us = state.get if state.exists else (None, None)
        out: list[tuple] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(
                chunks, ignore_index=True
            )
            recs = sorted(
                zip(
                    pdf["ts"].to_numpy("datetime64[ns]").view("int64").tolist(),
                    pdf["event_id"].tolist(),
                    pdf["event_type"].tolist(),
                    pdf["value"].tolist(),
                )
            )
            for t_ns, event_id, event_type, value in recs:
                us = t_ns // 1000
                if event_type in touch_set:
                    last_t, last_us = event_type, us
                elif event_type == conversion_type:
                    out.append(
                        (
                            key[0],
                            event_id,
                            last_t if last_t is not None else "none",
                            value,
                            (us - last_us) if last_us is not None else None,
                        )
                    )
        if last_t is not None:
            state.update((last_t, last_us))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "event_id", "channel", "value", "latency_us"],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=(
            "user_id long, event_id long, channel string, "
            "value double, latency_us long"
        ),
        stateStructType="t string, us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def reconcile_late_attribution(
    stream_out: DataFrame,
    events: DataFrame,
    late_events: DataFrame,
    touch_types: tuple[str, ...] = DEFAULT_TOUCH_TYPES,
    conversion_type: str = DEFAULT_CONVERSION_TYPE,
    max_affected_users: int = 2_000_000,
) -> DataFrame:
    """Batch reprocessing path for ``attribution_stream``'s documented
    out-of-order limitation: the stream's O(1) per-user state cannot
    retro-correct a conversion once a LATER micro-batch delivers a touch
    whose event time precedes it. When the ingest layer knows which
    arrivals were late (file provenance, Kafka ingestion-vs-event time —
    here an explicit ``late_events`` frame), the fix is surgical: drop
    the stream's emissions for the affected users only and recompute
    those users from the full event log with the batch window operator
    (``operators.windows.last_touch_rows`` — same single-WindowExec
    shape), leaving every unaffected user's streaming rows untouched.

    At 100 TB the economics are the point: late arrivals are a tiny
    user subset, so the recompute is a semi-join-pruned window over that
    subset (both the events scan and the window shuffle see only
    affected users), not a full-log replay; the affected-user frame is
    broadcast into both the semi and anti joins. That broadcast is an
    ASSUMPTION the operator now enforces (ADVICE r07): the distinct
    affected-user count is checked against ``max_affected_users`` —
    the default 2M distinct longs is ~16 MB broadcast-side,
    comfortably inside executor memory. Cost accounting (code-review
    r08; bounded per ADVICE r08): the guard needs only "more than cap
    distinct users?", so it counts ``limit(cap + 1)`` over the distinct
    frame — the count a driver ever materializes is at most cap + 1
    regardless of how pathological the late batch is (a cache would
    avoid the second distinct pass but pins an un-unpersistable frame
    per invocation on this per-batch remedy path, a session-lifetime
    leak); the two joins share ONE broadcast build because
    ReuseExchange dedups their identical broadcast subtrees inside
    the single returned plan. A degenerate everything-was-late batch
    fails LOUDLY with the remedy spelled out (full batch recompute via
    ``last_touch_rows`` over the whole log — at that point pruning buys
    nothing and a silent large-side broadcast would OOM executors)
    instead of planning a pathological broadcast. Demonstrated
    end-to-end (divergence, then reconciliation) in
    tests/test_streaming.py."""
    from sales_forecast_pyspark_spark.operators.windows import last_touch_rows

    affected = late_events.select("user_id").distinct()
    n_affected = affected.limit(max_affected_users + 1).count()
    if n_affected > max_affected_users:
        raise ValueError(
            f"reconcile_late_attribution: > {max_affected_users} distinct "
            "late users — the surgical broadcast-pruned recompute no longer "
            "pays. Recompute the full log with operators.windows."
            "last_touch_rows directly (or raise max_affected_users if the "
            "cluster's broadcast budget genuinely allows it)."
        )
    affected = F.broadcast(affected)
    kept = stream_out.join(affected, "user_id", "left_anti")
    recomputed = last_touch_rows(
        events.join(affected, "user_id", "left_semi"),
        touch_types=touch_types,
        conversion_type=conversion_type,
    )
    return kept.unionByName(
        recomputed.select(
            F.col("user_id").cast("long"),
            F.col("event_id").cast("long"),
            "channel",
            F.col("value").cast("double"),
            F.col("latency_us").cast("long"),
        )
    )
