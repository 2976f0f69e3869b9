"""Sessionization: gap-based session assignment over event streams.

Standard training-data/log-pipeline operator (not in the reference —
its only window is a partition count, SURVEY.md §2.5): events of a user
belong to one session while the gap to the previous event is AT MOST
``gap`` (a gap exactly equal to ``gap_minutes`` stays in-session —
pinned by test); a STRICTLY larger gap starts a new session.

Pure window algebra — lag -> gap flag -> running sum = session index —
so the plan is one shuffle by user and the whole thing stays in
whole-stage codegen. SQL-expressible, hence DuckDB-oracle-checked
(q31 in __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _micros(c: Column) -> Column:
    """Epoch microseconds; tolerates TIMESTAMP_NTZ (session tz is UTC,
    so the cast is a pure reinterpretation)."""
    return F.unix_micros(c.cast("timestamp"))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Add ``session_idx`` (0-based per user, in time order).

    ``order_cols`` break ordering ties deterministically (e.g. an event
    id) — REQUIRED for reproducible output when timestamps can repeat.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(user_col).orderBy(*order)
    # microsecond integers (unix_micros / DuckDB epoch_us): exact gap
    # comparisons, no seconds-truncation ambiguity across engines
    gap_us = int(gap_minutes * 60 * 1_000_000)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((_micros(F.col(ts_col)) - _micros(prev_ts)) > gap_us),
        1,
    ).otherwise(0)
    return df.withColumn(
        "session_idx",
        (F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1).cast("int"),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-session rollup: ``n_events``, ``span_us`` (span in
    MICROseconds — µs-exact across engines), ``session_start`` (first
    event time)."""
    s = sessionize(df, user_col, ts_col, gap_minutes, order_cols)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (_micros(F.max(ts_col)) - _micros(F.min(ts_col)))
        .cast("bigint")
        .alias("span_us"),
        F.min(ts_col).alias("session_start"),
    )
