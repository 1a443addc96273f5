"""Temporal joins & windows: as-of join, interval (range) join, session
windows.

Spark has no built-in as-of join (the operator the prompt class of
time-series pipelines always needs: "latest right-side value at or
before each left timestamp, per key"). The scalable construction here is
the union-window trick — ONE shuffle on (key), no per-row Python:

    tag left/right rows → unionByName → window per key ordered by
    (ts, right-first) → last_value(right payload, ignore nulls) →
    keep left rows.

This beats the naive inequality join (which Spark executes as a
broadcast-nested-loop or a sort-merge with residual filter over the full
cross-per-key space): the window pass is O(n log n) per key and never
materializes candidate pairs.

Interval joins DO map to Spark's join executor (equi key + range
residual), kept here as the reference pattern. Session windows use the
built-in ``F.session_window`` (gap-based), which works in batch and
streaming alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join_count", "sessionize"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row: the ``value_cols`` of the LATEST right row with
    right.ts <= left.ts and equal keys (null if none). Output = all left
    columns + value_cols.

    Ties at identical timestamps resolve right-row-first (the as-of
    convention: a quote at exactly the trade time matches), then by
    ``tie_col`` if given."""
    # right payloads ride in ONE struct: the struct itself is the
    # "a right row exists" marker (non-null even when every value field
    # is null), so last(ignorenulls) matches the latest right ROW — a
    # latest row whose value is NULL yields NULL, never a stale earlier
    # value (the DuckDB ASOF JOIN semantic).
    vals = F.struct(*[F.col(c).alias(c) for c in value_cols])
    l_tag = left.select(
        *key_cols,
        ts_col,
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.select(vals.alias("_vals")).schema["_vals"].dataType
        ).alias("_vals"),
        F.struct(*left.columns).alias("_row"),
    )
    r_tag = right.select(
        *key_cols,
        ts_col,
        F.lit(0).alias("_side"),
        vals.alias("_vals"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
    )
    u = l_tag.unionByName(r_tag)
    order = [F.col(ts_col).asc(), F.col("_side").asc()]
    if tie_col is not None:
        order.append(F.col(f"_vals.{tie_col}").asc_nulls_first())
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "_side",
        "_row",
        F.last("_vals", ignorenulls=True).over(w).alias("_vals"),
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"_vals.{c}").alias(f"asof_{c}") for c in value_cols],
    )


def interval_join_count(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    window: str = "1 hour",
    count_alias: str = "n_in_window",
) -> DataFrame:
    """Per left row: how many right rows share the keys and fall in
    (left.ts, left.ts + window]. Executes as an equi-join on the keys
    with a range residual — Catalyst keeps it a hash/sort-merge join,
    never a cross product.

    Contract: left rows must be distinct (include a unique id column) —
    the count regroups by all left columns, so duplicate left rows would
    collapse into one output row with a summed count."""
    lt = F.col(f"l.{ts_col}")
    rt = F.col(f"r.{ts_col}")
    joined = left.alias("l").join(
        right.alias("r"),
        [F.col(f"l.{k}") == F.col(f"r.{k}") for k in key_cols]
        + [rt > lt, rt <= lt + F.expr(f"INTERVAL {window}")],
        "left",
    )
    return joined.groupBy(
        *[F.col(f"l.{c}").alias(c) for c in left.columns]
    ).agg(F.count(F.col(f"r.{ts_col}")).alias(count_alias))


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions per key (built-in session_window — works on a
    stream with a watermark too). Session end = last event + gap."""
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
