"""Gap-based sessionization on Spark's native session_window operator.

The lag+running-sum formulation (the `event_sessions` driver query) is
the portable-SQL shape; ``F.session_window`` is the idiomatic Spark
primitive and the only one of the two that also runs under Structured
Streaming: the state store merges overlapping windows incrementally and
the watermark bounds state — sessions whose window end falls behind the
watermark are finalized, emitted (append mode), and evicted, so state
never grows with stream length, only with *open* sessions.

Boundary semantics (probed empirically, locked by test): an event's
window is [ts, ts+gap] and windows merge when the next event starts at
or before the previous window's end — a new session begins only when the
inter-event gap is STRICTLY greater than ``gap_s``, the same cut as the
lag formulation. Sessionization is pipeline surface, not rapidfuzz-rs
itself (the reference has no streaming engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def native_sessions(
    events: DataFrame,
    gap_s: int = 1800,
    watermark: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, start_us, end_us, n_events, session_value_micro) per
    gap-merged session. Works on a batch OR streaming DataFrame; pass
    ``watermark`` (e.g. "30 minutes") on streams so append mode can
    finalize sessions and evict their state. Window bounds are emitted
    as unix micros (bigint) — engine- and timezone-stable, like every
    other timestamp this repo compares across engines. The value sum is
    per-row-rounded micro-units summed as bigint, the same exact-integer
    trick as `event_sessions` (float fold order differs per engine)."""
    ev = events.withColumn("__ts", F.col(ts_col).cast("timestamp"))
    if watermark is not None:
        ev = ev.withWatermark("__ts", watermark)
    return (
        ev.groupBy(
            F.col(user_col), F.session_window("__ts", f"{gap_s} seconds")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.round(F.col(value_col) * F.lit(1000000.0)).cast("long")
            ).alias("session_value_micro"),
        )
        .select(
            F.col(user_col),
            F.unix_micros(F.col("session_window.start")).alias("start_us"),
            F.unix_micros(F.col("session_window.end")).alias("end_us"),
            "n_events",
            "session_value_micro",
        )
    )
