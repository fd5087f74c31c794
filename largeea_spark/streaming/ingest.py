"""Incremental page ingest via Structured Streaming (SURVEY.md §2.11).

The reference is batch-only; the north rule requires batch-with-
checkpoints. This module adds the natural incremental path on top of
the same stage tables: new page files landing in a directory are
processed exactly-once with ``Trigger.AvailableNow`` (drain-and-stop,
cron-friendly) into the ``triples_surface`` stage, reusing the SAME
extraction/emission logic as the batch plan — one code path, two
drivers.

Checkpoint dir = stream progress (file offsets); StageStore lineage
still applies to downstream batch phases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.extract import emit_triples, extract_text

PAGE_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(spark: SparkSession, pages_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """readStream over a landing directory of page parquet files."""
    reader = spark.readStream.schema(PAGE_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(pages_dir)


def ingest_available_now(
    spark: SparkSession, pages_dir: str, out_dir: str, checkpoint_dir: str,
) -> int:
    """Drain all currently-available page files into the surface-triple
    sink exactly once; returns rows written this run. Re-running after
    new files land processes only the new files (offset checkpoint)."""
    pages = stream_pages(spark, pages_dir)
    extracted = extract_text(pages)
    triples = emit_triples(extracted.drop("text").withColumnRenamed("extracted_text", "text"))
    q = (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.read.parquet(out_dir).count()
    return n


def stream_dedup_documents(
    spark: SparkSession, docs_dir: str, out_dir: str, checkpoint_dir: str,
    id_col: str = "doc_id", text_col: str = "text",
    watermark_col: str | None = None, watermark: str = "1 hour",
) -> int:
    """Streaming exact dedup for a landing corpus: documents whose text
    md5 was already seen are dropped ACROSS micro-batches
    (``dropDuplicates`` keeps per-key state in the state store; with a
    watermark column the state is bounded — the 100 TB knob).

    Same semantics as the batch `operators.dedup.exact_duplicates`
    keep-first rule, but incremental and exactly-once
    (Trigger.AvailableNow + offset checkpoint). Returns total rows in
    the deduplicated sink after this drain."""
    from pyspark.sql import functions as F

    schema = (
        f"{id_col} long, {text_col} string, lang string, source string,"
        " n_chars long"
    )
    if watermark_col is not None:
        schema += f", {watermark_col} timestamp"
    docs = (
        spark.readStream.schema(schema)
        .format("parquet").load(docs_dir)
        .withColumn("text_md5", F.md5(F.col(text_col)))
    )
    if watermark_col is not None:
        # dropDuplicatesWithinWatermark dedups on md5 ALONE with state
        # bounded by the watermark (same-text rows with different event
        # times within the watermark window are still dropped) — plain
        # dropDuplicates([md5, ts]) would keep every distinct timestamp.
        docs = docs.withWatermark(watermark_col, watermark)
        deduped = docs.dropDuplicatesWithinWatermark(["text_md5"])
    else:
        deduped = docs.dropDuplicates(["text_md5"])
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).count()


def stream_windowed_event_counts(
    spark: SparkSession, events_dir: str, out_dir: str, checkpoint_dir: str,
    window: str = "1 hour", watermark: str = "2 hours",
) -> int:
    """Watermarked tumbling-window event counts (late data handled by
    the watermark; append mode emits a window only once it's final) —
    the standard Structured Streaming aggregation shape over the
    `events` table schema. Returns finalized window rows written."""
    from pyspark.sql import functions as F

    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        .format("parquet").load(events_dir)
        .withWatermark("ts", watermark)
    )
    agg = ev.groupBy(
        F.window("ts", window).alias("w"), F.col("event_type")
    ).agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    out = agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type", "n", "total_value",
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).count()


def stream_sessionize_events(
    spark: SparkSession, events_dir: str, out_dir: str, checkpoint_dir: str,
    gap_minutes: float = 30.0, watermark: str = "2 hours",
) -> int:
    """Streaming gap-based sessionization via the built-in
    ``session_window`` aggregation (stateful merging session windows;
    state bounded by the watermark) — the incremental counterpart of the
    batch ``operators.events.sessionize``. Emits one row per finalized
    (user, session): session bounds + event count + value sum. Returns
    finalized session rows written after this drain."""
    from pyspark.sql import functions as F

    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        .format("parquet").load(events_dir)
        .withWatermark("ts", watermark)
    )
    gap = f"{int(gap_minutes * 60)} seconds"
    agg = ev.groupBy(
        F.session_window("ts", gap).alias("w"), F.col("user_id")
    ).agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    out = agg.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events", "total_value",
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).count()


def stream_running_user_stats(
    spark: SparkSession, events_dir: str, out_dir: str, checkpoint_dir: str,
    state_ttl_ms: int | None = None,
) -> int:
    """CUSTOM stateful streaming operator via ``applyInPandasWithState``
    (SURVEY.md §2.11 "custom stateful operators"): per-user running
    (event count, value sum, DISTINCT event-type set) maintained in an
    explicit ``GroupState`` across micro-batches AND across drains
    (state lives in the checkpoint). The distinct-type tracking plus
    emit-updated-totals-per-drain semantics are exactly what the
    built-in ``session_window`` / ``dropDuplicates`` state machines
    cannot express — this is the escape hatch the engine uses when a
    stateful operator has no declarative form.

    Scale shape: state is one tiny row per user key, partitioned by the
    groupBy hash — no global state, no driver involvement; Arrow moves
    each key's batch slice in and out of the Python function.

    Each drain appends one row per user ACTIVE in that drain, carrying
    the cumulative totals so far. Returns total output rows after this
    drain.

    ``state_ttl_ms``: when set, per-key state is evicted after the key
    has been idle that long (``ProcessingTimeTimeout``) — at 100 TB the
    key space is unbounded and state must not grow forever; an evicted
    key that reappears starts its running totals fresh. ``None`` keeps
    state indefinitely (small bounded key spaces).

    Drain termination with a TTL: with ``ProcessingTimeTimeout`` the
    stateful exec's ``shouldRunAnotherBatch`` is unconditionally true
    (processing time always advances, so some timer may always expire),
    so the microbatch loop never latches ``noNewData`` — an
    ``availableNow`` query never self-terminates AND
    ``processAllAvailable()`` never returns (both verified hung on
    Spark 4.1). The TTL path therefore monitors query progress itself:
    batches run back-to-back, and a COMPLETED batch with
    ``numInputRows == 0`` proves every available source offset was
    already consumed by the batches before it — at that point the
    query is stopped. A timer that has not fired inside the drain
    window stays in the checkpoint and fires on the NEXT drain, where
    an expired idle key hits the ``hasTimedOut`` branch and is
    evicted. Within a batch, a key with new data is served its data
    (``hasTimedOut=False``) and the update re-arms its timer — but a
    drain restart first REPLAYS the previous drain's pending
    zero-input batch from the offset log, whose timeout processing
    runs before any new data is planned: a key idle past the TTL at
    that moment is evicted even if the new drain carries data for it
    (it then starts fresh). TTL should therefore comfortably exceed
    the expected inter-drain gap."""
    import json

    import pandas as pd
    from typing import Iterator, Tuple

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        .format("parquet").load(events_dir)
    )

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state_ttl_ms is not None and state.hasTimedOut:
            # key idle past TTL: drop its state, emit nothing — the
            # state store stays bounded by the active-key working set
            state.remove()
            return
        if state.exists:
            n, total, types_json = state.get
            # json-encoded set: an event_type containing '|' must not
            # split into phantom types on the next drain
            types = set(json.loads(types_json)) if types_json else set()
        else:
            n, total, types = 0, 0.0, set()
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            types |= {t for t in pdf["event_type"].dropna().tolist()}
        state.update((int(n), float(total), json.dumps(sorted(types))))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame({
            "user_id": [int(key[0])], "n_events": [int(n)],
            "total_value": [float(total)], "n_types": [len(types)],
        })

    out = ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "user_id long, n_events long, total_value double, n_types int"
        ),
        stateStructType="n long, total double, types string",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout if state_ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if state_ttl_ms is None:
        q.awaitTermination()
    else:
        # processing-time timers keep the microbatch loop alive forever
        # (see docstring) — self-monitor: a completed zero-input batch
        # proves all available offsets were consumed; then stop.
        import time as _time

        # A restart REPLAYS the previous drain's pending batch from the
        # offset log BEFORE consulting the source, so a single
        # zero-input batch does not prove the source is caught up — but
        # at most ONE replayed batch exists per restart, so two
        # DISTINCT completed zero-input batch ids guarantee at least
        # one was freshly planned against a caught-up source (and every
        # batch between two observed progresses has already committed).
        # (FileStreamSource reports no latestOffset in progress events,
        # so offset comparison is not available.)
        zero_ids: set[int] = set()
        deadline = _time.monotonic() + 300.0
        while len(zero_ids) < 2:
            if not q.isActive:
                break  # surfaced an error — awaitTermination raises it
            p = q.lastProgress
            if p is not None and p.get("numInputRows", 0) == 0:
                zero_ids.add(int(p.get("batchId", -1)))
            if _time.monotonic() > deadline:
                q.stop()
                raise TimeoutError(
                    "TTL drain: <2 zero-input batches within 300s")
            _time.sleep(0.05)
        q.stop()
        q.awaitTermination()
    return spark.read.parquet(out_dir).count()
