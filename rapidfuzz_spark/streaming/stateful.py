"""Custom stateful streaming operator: first-touch per key, built on
``applyInPandasWithState`` — the Spark surface for stateful logic the
built-in operators can't express (the windowed/sessionized aggregates
cover time-bucketed state; this covers arbitrary per-key state that must
survive across micro-batches in the state store).

First-touch attribution: for every (user_id, event_type) key, emit the
first event the stream ever delivers and nothing afterwards. The state
is a single per-key boolean in the checkpointed state store, so a key
seen in micro-batch 3 emits nothing even though batches 1-2 ran in a
different JVM incarnation — exactly the cross-batch property foreachBatch
cannot give without a user-managed side table. Within one micro-batch,
ties break deterministically by (ts, event_id); across batches, arrival
order IS stream order, which the driver query makes deterministic by
feeding time-ordered file chunks.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id bigint, event_type string, first_ts_us bigint,"
    " first_event_id bigint, first_value double"
)


def _first_touch_fn(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # key already emitted in an earlier micro-batch: consume nothing,
        # emit nothing (the iterator must still be exhausted lazily by
        # Spark; returning immediately is fine)
        return
    best = None
    for pdf in pdfs:
        head = pdf.sort_values(["ts", "event_id"]).head(1)
        if best is None or (
            (head.iloc[0]["ts"], head.iloc[0]["event_id"])
            < (best.iloc[0]["ts"], best.iloc[0]["event_id"])
        ):
            best = head
    if best is None:  # timeout-only invocation: no data for this key
        return
    state.update((True,))
    r = best.iloc[0]
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "event_type": [key[1]],
            # pandas Timestamp .value is epoch nanos; emit micros (bigint)
            # so the comparison is engine- and timezone-stable
            "first_ts_us": [int(pd.Timestamp(r["ts"]).value // 1000)],
            "first_event_id": [int(r["event_id"])],
            "first_value": [float(r["value"])],
        }
    )


def first_touch_stream(events: DataFrame) -> DataFrame:
    """Streaming first-touch: apply on a STREAMING events DataFrame with
    columns (event_id, ts, user_id, event_type, value); returns the
    append-mode stream of first events per (user_id, event_type). Wire
    it to a sink with ``.writeStream.option("checkpointLocation", ...)``
    — the per-key booleans live in the state store, so a restarted query
    keeps suppressing keys emitted before the restart."""
    return (
        events.select("event_id", "ts", "user_id", "event_type", "value")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _first_touch_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_DEDUP_OUT_SCHEMA = "content_hash string, doc_id bigint"


def _dedup_first_fn(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return
    best = None
    for pdf in pdfs:
        lo = int(pdf["doc_id"].min())
        if best is None or lo < best:
            best = lo
    if best is None:  # timeout-only invocation
        return
    state.update((True,))
    yield pd.DataFrame({"content_hash": [key[0]], "doc_id": [best]})


def streaming_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming exact dedup: apply on a STREAMING documents DataFrame
    with (doc_id, text); emits each distinct content hash ONCE, with the
    first-arriving document (min doc_id within the micro-batch of first
    arrival) — later copies are suppressed by a per-hash boolean in the
    checkpointed state store, across micro-batches and query restarts.

    This is the unbounded-corpus form of ``textops.dedup
    .exact_duplicates``: the built-in ``dropDuplicatesWithinWatermark``
    keeps an ARBITRARY row per key and needs an event-time watermark to
    bound state; here the keep choice is deterministic (oracle-testable)
    and state is one boolean per distinct document ever seen — the
    correct lifetime for content dedup, where a copy arriving a month
    later must still be suppressed. State size is the real scale knob:
    32-byte md5 keys x distinct docs, sharded by the state-store
    partitioning on the hash key, and the md5 keyspace is uniform so no
    state shard runs hot.

    NULL text never forms one giant duplicate group: a text-less doc
    keys by its own doc_id (same convention as exact_duplicates)."""
    from pyspark.sql import functions as F

    keyed = docs.select(
        F.coalesce(
            F.md5(text_col),
            F.concat(F.lit("null:"), F.col("doc_id").cast("string")),
        ).alias("content_hash"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _dedup_first_fn,
        outputStructType=_DEDUP_OUT_SCHEMA,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
