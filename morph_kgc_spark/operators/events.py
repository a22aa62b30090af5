"""Event-stream batch operators: sessionization + windowed rollups.

The batch twins of the streaming operators in
morph_kgc_spark/streaming/ — same semantics, expressed with window
functions so the DuckDB oracle can replay them. At scale both are a
single shuffle on user_id (sessionize) / (hour, type) (rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(df: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id", gap_s: int = 1800) -> DataFrame:
    """Gap-based sessionization: a new session starts after > gap_s idle.

    Returns (user_id, session_no, n_events, start_epoch, end_epoch).
    One shuffle on user_id; the running sum stays within the partition.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_s),
        1,
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = df.select(
        F.col(user_col), F.col(ts_col), F.col(id_col),
        F.sum(new_session).over(wrun).alias("session_no"),
    )
    return (
        sessions.groupBy(user_col, "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_timestamp(F.min(ts_col)).alias("start_epoch"),
            F.unix_timestamp(F.max(ts_col)).alias("end_epoch"),
        )
        .select(
            F.col(user_col),
            F.col("session_no").cast("long").alias("session_no"),
            "n_events", "start_epoch", "end_epoch",
        )
    )


def hourly_rollup(df: DataFrame, ts_col: str = "ts",
                  type_col: str = "event_type",
                  value_col: str = "value") -> DataFrame:
    """Tumbling 1h window aggregate — the batch twin of the streaming
    windowed agg. (hour_epoch, event_type, n_events, sum_value)."""
    return (
        df.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col(ts_col))).alias("hour_epoch"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col(value_col).cast("double")), 4).alias("sum_value"),
        )
    )
