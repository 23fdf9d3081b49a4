"""Streaming operators: native session_window sessionization (batch +
watermarked streaming) and the applyInPandasWithState first-touch
operator. The batch shapes are additionally value-checked against DuckDB
by tools/driver_sim (queries event_sessions_native, stream_first_touch).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime

import pytest

from pyspark.sql import functions as F

from rapidfuzz_spark.streaming import first_touch_stream, native_sessions

TS = "ts timestamp, event_id long, user_id long, value double"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 0, s), i, u, v) for s, i, u, v in rows], TS
    )


def test_native_sessions_gap_boundary(spark):
    """session_window merge rule (locks the oracle's cut): an event
    arriving EXACTLY gap seconds after the previous one MERGES (windows
    [ts, ts+gap] touch); only a strictly larger gap starts a session —
    the same `> gap` cut as the lag formulation."""
    ev = _ev(
        spark,
        [(0, 0, 1, 1.0), (10, 1, 1, 2.0), (21, 2, 1, 4.0)],  # gap_s=10:
        # 0 and 10 merge (diff == gap); 21 is 11 after 10 -> new session
    )
    out = sorted(
        native_sessions(ev, gap_s=10).collect(), key=lambda r: r.start_us
    )
    assert len(out) == 2
    assert out[0].n_events == 2 and out[0].session_value_micro == 3_000_000
    assert out[0].start_us == out[1].start_us - 21_000_000
    # window end = last event + gap
    assert out[0].end_us - out[0].start_us == 20_000_000
    assert out[1].n_events == 1


def test_native_sessions_per_user_isolation(spark):
    ev = _ev(spark, [(0, 0, 1, 1.0), (1, 1, 2, 1.0), (2, 2, 1, 1.0)])
    out = native_sessions(ev, gap_s=10).collect()
    assert {(r.user_id, r.n_events) for r in out} == {(1, 2), (2, 1)}


def test_native_sessions_streaming_watermark_flush(spark):
    """Streaming shape: sessions whose window end falls behind the
    watermark are finalized and emitted in append mode; open sessions
    near the stream head stay in state (not emitted). Two time-ordered
    file chunks force a real cross-batch watermark advance."""
    tmp = tempfile.mkdtemp(prefix="rf_sess_stream_")
    try:
        early = _ev(spark, [(0, 0, 1, 1.0), (2, 1, 1, 2.0)])
        # second batch 10 min later: advances the watermark far past the
        # early session's window end (gap 10 s, watermark delay 5 s)
        late = spark.createDataFrame(
            [(datetime(2024, 1, 1, 0, 10, 0), 2, 1, 4.0)], TS
        )
        sdir = os.path.join(tmp, "in")
        os.makedirs(sdir)
        for i, df in enumerate([early, late]):
            part = os.path.join(tmp, f"c{i}")
            df.coalesce(1).write.parquet(part)
            f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
            dst = os.path.join(sdir, f"{i:02d}.parquet")
            shutil.move(os.path.join(part, f), dst)
            os.utime(dst, (1000 + i, 1000 + i))
        stream = (
            spark.readStream.schema(early.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(sdir)
        )
        q = (
            native_sessions(stream, gap_s=10, watermark="5 seconds")
            .writeStream.format("parquet")
            .option("path", os.path.join(tmp, "out"))
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.read.parquet(os.path.join(tmp, "out")).collect()
        # the early 2-event session flushed once the watermark passed its
        # end; the 00:10:00 session is still open at stream end -> absent
        assert [(r.n_events, r.session_value_micro) for r in got] == [
            (2, 3_000_000)
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_first_touch_suppresses_across_batches(spark):
    """The state-store seen flag must survive micro-batch boundaries:
    a key first seen in batch 0 emits nothing from batch 1, and a key
    new in batch 1 emits its batch-1 minimum."""
    tmp = tempfile.mkdtemp(prefix="rf_ftouch_t_")
    try:
        schema = (
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double"
        )
        b0 = spark.createDataFrame(
            [
                (1, datetime(2024, 1, 1, 0, 0, 1), 7, "click", 1.0),
                (0, datetime(2024, 1, 1, 0, 0, 1), 7, "click", 9.0),  # tie ts: min id wins
            ],
            schema,
        )
        b1 = spark.createDataFrame(
            [
                (2, datetime(2024, 1, 1, 0, 0, 5), 7, "click", 5.0),  # suppressed
                (3, datetime(2024, 1, 1, 0, 0, 6), 7, "view", 2.0),  # new key
            ],
            schema,
        )
        sdir = os.path.join(tmp, "in")
        os.makedirs(sdir)
        for i, df in enumerate([b0, b1]):
            part = os.path.join(tmp, f"c{i}")
            df.coalesce(1).write.parquet(part)
            f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
            dst = os.path.join(sdir, f"{i:02d}.parquet")
            shutil.move(os.path.join(part, f), dst)
            os.utime(dst, (1000 + i, 1000 + i))
        stream = (
            spark.readStream.schema(b0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(sdir)
        )
        q = (
            first_touch_stream(stream)
            .writeStream.format("parquet")
            .option("path", os.path.join(tmp, "out"))
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.event_type, r.first_event_id, r.first_value)
            for r in spark.read.parquet(os.path.join(tmp, "out")).collect()
        }
        assert got == {("click", 0, 9.0), ("view", 3, 2.0)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_first_touch_batch_restart_keeps_state(spark):
    """Restarting the query from the same checkpoint must not re-emit
    keys already emitted: run the same source dir twice (second run adds
    one new file) and check only the new key appears in the delta."""
    tmp = tempfile.mkdtemp(prefix="rf_ftouch_r_")
    try:
        schema = (
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double"
        )

        def _run():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(tmp, "in"))
            )
            q = (
                first_touch_stream(stream)
                .writeStream.format("parquet")
                .option("path", os.path.join(tmp, "out"))
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return spark.read.parquet(os.path.join(tmp, "out")).collect()

        os.makedirs(os.path.join(tmp, "in"))

        def _add(i, rows):
            df = spark.createDataFrame(rows, schema)
            part = os.path.join(tmp, f"c{i}")
            df.coalesce(1).write.parquet(part)
            f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
            dst = os.path.join(tmp, "in", f"{i:02d}.parquet")
            shutil.move(os.path.join(part, f), dst)
            os.utime(dst, (1000 + i, 1000 + i))

        _add(0, [(0, datetime(2024, 1, 1), 7, "click", 1.0)])
        first = _run()
        assert {r.event_type for r in first} == {"click"}
        _add(1, [(1, datetime(2024, 1, 2), 7, "click", 2.0),
                 (2, datetime(2024, 1, 2), 7, "buy", 3.0)])
        second = _run()
        # click was NOT re-emitted by the restarted query
        assert sorted((r.event_type, r.first_event_id) for r in second) == [
            ("buy", 2), ("click", 0),
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_dedup_suppresses_and_restarts(spark):
    """Streaming exact dedup: the same content arriving in a later
    micro-batch emits nothing; within the first batch ties break to the
    min doc_id; a restarted query (same checkpoint, new file) keeps
    suppressing content emitted before the restart; null text never
    groups together."""
    from rapidfuzz_spark.streaming import streaming_dedup

    tmp = tempfile.mkdtemp(prefix="rf_sdedup_t_")
    try:
        schema = "doc_id long, text string"
        b0 = spark.createDataFrame(
            [(5, "alpha"), (2, "alpha"), (3, "beta"), (8, None), (9, None)],
            schema,
        )
        b1 = spark.createDataFrame(
            [(1, "alpha"), (4, "gamma")], schema  # dup (suppressed) + new
        )
        sdir = os.path.join(tmp, "in")
        os.makedirs(sdir)

        def feed(i, df):
            part = os.path.join(tmp, f"c{i}")
            df.coalesce(1).write.parquet(part)
            f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
            dst = os.path.join(sdir, f"{i:02d}.parquet")
            shutil.move(os.path.join(part, f), dst)
            os.utime(dst, (1000 + i, 1000 + i))

        def run():
            stream = (
                spark.readStream.schema(b0.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(sdir)
            )
            q = (
                streaming_dedup(stream)
                .writeStream.format("parquet")
                .option("path", os.path.join(tmp, "out"))
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {
                r.doc_id
                for r in spark.read.parquet(os.path.join(tmp, "out")).collect()
            }

        feed(0, b0)
        feed(1, b1)
        # alpha -> 2 (batch-0 min, not the later doc 1); nulls are their
        # own groups (8 AND 9 both emit, no giant null cluster)
        assert run() == {2, 3, 8, 9, 4}
        # restart with one more file: only genuinely-new content emits
        feed(2, spark.createDataFrame([(0, "alpha"), (6, "delta")], schema))
        assert run() == {2, 3, 8, 9, 4, 6}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_neardup_replay_after_uncommitted_batch(spark):
    """Kill/resume torture for the foreachBatch near-dup query: after a
    run completes, delete the checkpoint's LAST commit marker —
    simulating a crash in the at-least-once window where the batch's
    pairs/bands partitions were already written but the commit wasn't
    recorded — then resume with one more file. The replayed batch must
    dynamically overwrite its own partitions (not duplicate pairs, not
    join against its own earlier attempt), and the cumulative output
    must still equal the batch LSH pair set, each pair under exactly
    one batch_id."""
    from rapidfuzz_spark.streaming import stream_neardup
    from rapidfuzz_spark.textops import dedup

    base = "the quick brown fox jumps over the lazy dog near the river"
    schema = "doc_id long, text string"
    b0 = spark.createDataFrame(
        [(0, base + " bank"), (1, base + " bend"), (2, "unrelated aaa bbb")],
        schema,
    )
    b1 = spark.createDataFrame([(3, base + " bank"), (4, "zzz yyy xxx")], schema)
    b2 = spark.createDataFrame([(5, base + " bend")], schema)
    tmp = tempfile.mkdtemp(prefix="rf_sndup_r_")
    try:
        sdir = os.path.join(tmp, "in")
        os.makedirs(sdir)

        def feed(i, df):
            part = os.path.join(tmp, f"c{i}")
            df.coalesce(1).write.parquet(part)
            f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
            dst = os.path.join(sdir, f"{i:02d}.parquet")
            shutil.move(os.path.join(part, f), dst)
            os.utime(dst, (1000 + i, 1000 + i))

        def run():
            stream = (
                spark.readStream.schema(b0.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(sdir)
            )
            q = stream_neardup(
                stream, os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
            )
            q.awaitTermination()
            return spark.read.parquet(os.path.join(tmp, "out", "pairs"))

        feed(0, b0)
        feed(1, b1)
        run()
        # crash window: batch 1's output partitions exist, commit doesn't
        commits = os.path.join(tmp, "ckpt", "commits")
        last = sorted(os.listdir(commits))[-1]
        assert last == "1"
        os.remove(os.path.join(commits, last))
        crc = os.path.join(commits, f".{last}.crc")  # Hadoop checksum shadow
        if os.path.exists(crc):
            os.remove(crc)
        feed(2, b2)
        got = run()  # replays batch 1, then processes batch 2
        by_batch = {(r.id_1, r.id_2): r.batch_id for r in got.collect()}
        full = {
            (r.id_1, r.id_2)
            for r in dedup.minhash_lsh_candidates(
                b0.unionByName(b1).unionByName(b2), bucket_cap=None
            ).collect()
        }
        assert set(by_batch) == full
        # exactly-once across the replay: no pair row duplicated, the
        # replayed batch's pairs sit under their original batch_id
        assert len(by_batch) == got.count()
        assert by_batch[(0, 3)] == 1 and by_batch[(0, 5)] == 2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_neardup_cumulative_equals_batch(spark):
    """Each pair is emitted exactly once, at the batch where its later
    member arrives; cumulative output == the batch LSH pair set; a
    restart from the same checkpoint with a new file only adds the new
    file's pairs."""
    from rapidfuzz_spark.streaming import stream_neardup
    from rapidfuzz_spark.textops import dedup

    base = "the quick brown fox jumps over the lazy dog near the river"
    schema = "doc_id long, text string"
    b0 = spark.createDataFrame(
        [(0, base + " bank"), (1, base + " bend"), (2, "unrelated aaa bbb")],
        schema,
    )
    b1 = spark.createDataFrame([(3, base + " bank"), (4, "zzz yyy xxx")], schema)
    b2 = spark.createDataFrame([(5, base + " bend")], schema)
    tmp = tempfile.mkdtemp(prefix="rf_sndup_t_")
    try:
        sdir = os.path.join(tmp, "in")
        os.makedirs(sdir)

        def feed(i, df):
            part = os.path.join(tmp, f"c{i}")
            df.coalesce(1).write.parquet(part)
            f = next(x for x in os.listdir(part) if x.endswith(".parquet"))
            dst = os.path.join(sdir, f"{i:02d}.parquet")
            shutil.move(os.path.join(part, f), dst)
            os.utime(dst, (1000 + i, 1000 + i))

        def run():
            stream = (
                spark.readStream.schema(b0.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(sdir)
            )
            q = stream_neardup(
                stream, os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
            )
            q.awaitTermination()
            return spark.read.parquet(os.path.join(tmp, "out", "pairs"))

        feed(0, b0)
        feed(1, b1)
        got = run()
        pairs = {(r.id_1, r.id_2) for r in got.collect()}
        full = {
            (r.id_1, r.id_2)
            for r in dedup.minhash_lsh_candidates(
                b0.unionByName(b1), bucket_cap=None
            ).collect()
        }
        assert pairs == full
        # cross-batch pair (0,3) exists and was emitted at batch 1
        by_batch = {
            (r.id_1, r.id_2): r.batch_id for r in got.collect()
        }
        assert by_batch[(0, 3)] == 1 and by_batch[(0, 1)] == 0
        # exactly-once: no pair appears under two batch_ids
        assert len(by_batch) == got.count()
        # restart with one more file: only the new doc's pairs appear
        feed(2, b2)
        got2 = {(r.id_1, r.id_2) for r in run().collect()}
        full3 = {
            (r.id_1, r.id_2)
            for r in dedup.minhash_lsh_candidates(
                b0.unionByName(b1).unionByName(b2), bucket_cap=None
            ).collect()
        }
        assert got2 == full3 and (0, 5) in got2 - pairs
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_decontaminate_equals_batch(spark):
    """Map-side streaming decontamination must equal the batch
    decontaminate operator on the same corpus (the batch-split
    invariance its oracle aliasing rests on), both through an actual
    2-micro-batch stream and applied directly as a batch projection."""
    from rapidfuzz_spark.streaming import (
        collect_eval_grams,
        stream_decontaminate,
    )
    from rapidfuzz_spark.textops.training import decontaminate

    ev_text = " ".join(f"w{i}" for i in range(13))
    rows = [
        (1, ev_text + " tail tokens here"),
        (2, "completely different words " * 5),
        (3, "short doc"),
        (4, ev_text),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    ev = docs.where(F.col("doc_id") == 4)
    grams = collect_eval_grams(ev, n=13)
    assert len(grams) == 1

    batch_ref = sorted(map(tuple, decontaminate(docs, ev, n=13).collect()))
    as_batch = sorted(
        map(tuple, stream_decontaminate(docs, grams, n=13).collect())
    )
    assert as_batch == batch_ref

    tmp = tempfile.mkdtemp(prefix="rf_sdecon_t_")
    try:
        stream_dir = os.path.join(tmp, "in")
        os.makedirs(stream_dir)
        for i, half in enumerate(
            [docs.where(F.col("doc_id") <= 2), docs.where(F.col("doc_id") > 2)]
        ):
            part_dir = os.path.join(tmp, f"c{i}")
            half.coalesce(1).write.parquet(part_dir)
            part = next(
                f for f in os.listdir(part_dir) if f.endswith(".parquet")
            )
            os.rename(
                os.path.join(part_dir, part),
                os.path.join(stream_dir, f"{i:02d}.parquet"),
            )
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            stream_decontaminate(stream, grams, n=13)
            .writeStream.format("parquet")
            .option("path", os.path.join(tmp, "out"))
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        streamed = sorted(
            map(tuple, spark.read.parquet(os.path.join(tmp, "out")).collect())
        )
        assert streamed == batch_ref
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
