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


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              payload: tuple[str, ...] = ("event_id", "value")) -> DataFrame:
    """Point-in-time (AS-OF) join: each left row matched to the LATEST
    right row of the same ``on`` key with ``right_ts <= left_ts`` —
    the operator behind feature lookups, slowly-changing dimensions,
    and "state at event time" joins, which Spark has no builtin for
    (DuckDB's native ASOF JOIN is the oracle twin).

    Returns every left row plus ``asof_<payload>`` columns and
    ``asof_ts`` (all NULL when no right row precedes it).

    Scale shape: NOT the naive inequality join (a range join explodes
    to |left|×|right-per-key| and Catalyst plans it as BNLJ). Both
    sides are union-tagged and sorted once per key — ONE shuffle on
    ``on``, ZERO joins — and the match is a running ``last(payload,
    ignorenulls=True)`` window: right rows sort BEFORE co-timestamped
    left rows so the <= bound is inclusive. (key, ts) ties among right
    rows are broken IN the window order (payload struct ascending, so
    the greatest payload is the one the running-last sees) — no
    pre-dedup aggregate, which would shuffle the whole right stream a
    second time. DuckDB's native ASOF is underspecified under such
    ties, so the oracle twin pins the same greatest-payload winner.
    """
    r_tag = right.select(
        F.col(on).alias("__k"), F.col(right_ts).alias("__t"),
        F.lit(1).alias("__r"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{left.schema[c].dataType.simpleString()}"
                for c in left.columns) + ">").alias("__left"),
        F.struct(F.col(right_ts).alias("__ats"),
                 *[F.col(p) for p in payload]).alias("__pay"),
    )
    l_tag = left.select(
        F.col(on).alias("__k"), F.col(left_ts).alias("__t"),
        F.lit(0).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(r_tag.schema["__pay"].dataType).alias("__pay"),
    )
    w = (Window.partitionBy("__k")
         .orderBy(F.col("__t").asc(), F.col("__r").desc(),
                  F.col("__pay").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (
        r_tag.unionByName(l_tag)
        .select("__r", "__left",
                F.last("__pay", ignorenulls=True).over(w).alias("__hit"))
        .where(F.col("__r") == 0)
    )
    return matched.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        F.col("__hit.__ats").alias("asof_ts"),
        *[F.col(f"__hit.{p}").alias(f"asof_{p}") for p in payload],
    )


def funnel(df: DataFrame, stages: tuple[str, ...] = ("view", "click",
                                                     "purchase"),
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Ordered funnel: how many users reach each stage IN SEQUENCE —
    stage k counts a user only if their earliest stage-k event is
    at-or-after their earliest qualifying stage-(k−1) event. The
    canonical product-analytics progression query.

    Output: (stage string, stage_no int, n_users long).

    Scale shape: one filtered min-aggregate per stage, each keyed on
    the user (map-side combinable; output ≤ one row per user), chained
    by equi-joins on the SAME key — Spark co-partitions the chain on
    user_id, so after the first exchange the joins are zero-shuffle,
    and the final counts are tiny map-side-combined aggregates. No
    windows, no event-stream self-join (an events×events join would be
    quadratic in per-user activity at 100 TB; the per-stage min state
    is one timestamp per user).
    """
    reached = None
    counts = []
    for i, stage in enumerate(stages):
        ev = df.where(F.col(type_col) == stage)
        if reached is None:
            cur = ev.groupBy(user_col).agg(F.min(ts_col).alias("__t"))
        else:
            cur = (ev.join(reached, user_col)
                   .where(F.col(ts_col) >= F.col("__t"))
                   .groupBy(user_col)
                   .agg(F.min(ts_col).alias("__t2"))
                   .withColumnRenamed("__t2", "__t"))
        reached = cur
        counts.append(cur.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(stage).alias("stage"),
            F.lit(i + 1).alias("stage_no"),
            F.col("n_users"),
        ))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out
