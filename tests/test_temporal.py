"""Temporal operators: as-of join semantics (before/equal/none), interval
join counts, session-window boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ocr_pipeline_spark.operators.temporal import (
    asof_join,
    interval_join_count,
    sessionize,
)


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 10, m, s)


def test_asof_join_semantics(spark):
    trades = spark.createDataFrame(
        [(1, "A", _ts(10)), (2, "A", _ts(20)), (3, "B", _ts(5)), (4, "C", _ts(30))],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(9), 100.0),   # before trade 1
            ("A", _ts(20), 105.0),  # exactly at trade 2 → matches (as-of)
            ("A", _ts(21), 110.0),  # after → never matched
            ("B", _ts(6), 50.0),    # after trade 3 → no match for B
        ],
        "sym string, ts timestamp, px double",
    )
    got = {
        r["trade_id"]: r["asof_px"]
        for r in asof_join(trades, quotes, ["sym"], "ts", ["px"]).collect()
    }
    assert got == {1: 100.0, 2: 105.0, 3: None, 4: None}


def test_asof_join_partition_independent(spark):
    left = spark.createDataFrame(
        [(i, i % 3, _ts(i)) for i in range(30)], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(i % 3, _ts(i, 30), float(i)) for i in range(0, 30, 2)],
        "k long, ts timestamp, v double",
    )
    a = sorted(asof_join(left, right, ["k"], "ts", ["v"]).collect())
    b = sorted(
        asof_join(left.repartition(7), right.repartition(3), ["k"], "ts", ["v"]).collect()
    )
    assert a == b


def test_interval_join_count(spark):
    errors = spark.createDataFrame(
        [(1, 7, _ts(0))], "event_id long, user_id long, ts timestamp"
    )
    clicks = spark.createDataFrame(
        [(7, _ts(0)), (7, _ts(30)), (7, dt.datetime(2024, 1, 1, 11, 0)), (7, dt.datetime(2024, 1, 1, 11, 1)), (8, _ts(10))],
        "user_id long, ts timestamp",
    )
    (r,) = interval_join_count(errors, clicks, ["user_id"], "ts", "1 hour").collect()
    # t=0 excluded (strictly after), 10:30 and 11:00 in, 11:01 out, user 8 out
    assert r["n_in_window"] == 2


def test_sessionize_gap(spark):
    ev = spark.createDataFrame(
        [
            (7, _ts(0)), (7, _ts(10)), (7, _ts(20)),   # session 1
            (7, dt.datetime(2024, 1, 1, 11, 0)),        # gap 40m → session 2
            (9, _ts(5)),
        ],
        "user_id long, ts timestamp",
    )
    rows = sorted(
        sessionize(ev, gap="30 minutes").collect(),
        key=lambda r: (r["user_id"], r["session_start"]),
    )
    assert [(r["user_id"], r["n_events"]) for r in rows] == [(7, 3), (7, 1), (9, 1)]
    s1 = rows[0]
    assert s1["session_start"] == _ts(0)
    assert s1["session_end"] == _ts(50)  # last event 10:20 + 30m gap


def test_asof_join_latest_null_value_wins(spark):
    quotes = spark.createDataFrame(
        [("A", _ts(9), 100.0), ("A", _ts(15), None)],
        "sym string, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [(1, "A", _ts(20))], "trade_id long, sym string, ts timestamp"
    )
    (r,) = asof_join(trades, quotes, ["sym"], "ts", ["px"]).collect()
    # latest right ROW (15:00, px=NULL) wins — not the stale 100.0
    assert r["asof_px"] is None
