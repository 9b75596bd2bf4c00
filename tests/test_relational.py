"""asof_join semantics on a hand-built table: inclusive bound, tiebreak,
no-match NULLs, and equivalence with the naive range-join + arg-max."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from imdedup_plus_spark.relational import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_hand_cases(spark):
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100, "a"),
            (1, _ts("2024-01-01 12:00:00"), 101, "b"),
            # tie on ts: higher event_id must win
            (1, _ts("2024-01-01 12:00:00"), 102, "c"),
            (2, _ts("2024-01-05 00:00:00"), 200, "d"),
        ],
        "key bigint, ts timestamp, event_id bigint, event_type string",
    )
    left = spark.createDataFrame(
        [
            (10, 1, _ts("2024-01-01 11:00:00")),   # -> 100
            (11, 1, _ts("2024-01-01 12:00:00")),   # inclusive + tiebreak -> 102
            (12, 1, _ts("2024-01-02 00:00:00")),   # -> 102
            (13, 2, _ts("2024-01-01 00:00:00")),   # before any event -> NULL
            (14, 3, _ts("2024-01-01 00:00:00")),   # key with no events -> NULL
        ],
        "order_id bigint, key bigint, odate timestamp",
    )
    out = asof_join(
        left, right, on="key", left_ts="odate", right_ts="ts",
        value_cols=["event_id", "event_type"], tiebreak="event_id",
    )
    got = {r["order_id"]: (r["asof_event_id"], r["asof_event_type"]) for r in out.collect()}
    assert got == {
        10: (100, "a"),
        11: (102, "c"),
        12: (102, "c"),
        13: (None, None),
        14: (None, None),
    }


def test_asof_join_matches_naive_rangejoin(spark):
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(F.col("user_id").alias("k"), "ts", "event_id")
    )
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", F.col("o_custkey").alias("k"), "o_orderdate"
    )
    fast = asof_join(
        orders, ev, on="k", left_ts="o_orderdate", right_ts="ts",
        value_cols=["event_id"], tiebreak="event_id",
    ).select("o_orderkey", "asof_event_id")
    naive = (
        orders.join(ev, ["k"], "left")
        .where(F.col("ts").isNull() | (F.col("ts") <= F.col("o_orderdate")))
        .groupBy("o_orderkey")
        .agg(F.max_by("event_id", F.struct("ts", "event_id")).alias("asof_event_id"))
    )
    # the naive left-join drops rows where every event is after the order;
    # re-add them as NULLs
    naive = orders.select("o_orderkey").join(naive, "o_orderkey", "left")
    f = {r["o_orderkey"]: r["asof_event_id"] for r in fast.collect()}
    n = {r["o_orderkey"]: r["asof_event_id"] for r in naive.collect()}
    assert f == n


def test_asof_join_null_value_columns_stay_one_row(spark):
    """The matched right row's fields must come from ONE row: when the
    latest event has a NULL in one value column, that NULL is the answer —
    not the older row's non-NULL value. Rows with NULL ts never match."""
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100, "old"),
            # latest row: event_type IS NULL -> result must be (101, NULL)
            (1, _ts("2024-01-01 12:00:00"), 101, None),
            # NULL ts: must never match anything (not even as a fallback)
            (2, None, 999, "ghost"),
        ],
        "key bigint, ts timestamp, event_id bigint, event_type string",
    )
    left = spark.createDataFrame(
        [(10, 1, _ts("2024-01-02 00:00:00")), (11, 2, _ts("2024-01-02 00:00:00"))],
        "order_id bigint, key bigint, odate timestamp",
    )
    out = asof_join(
        left, right, on="key", left_ts="odate", right_ts="ts",
        value_cols=["event_id", "event_type"], tiebreak="event_id",
    )
    got = {r["order_id"]: (r["asof_event_id"], r["asof_event_type"]) for r in out.collect()}
    assert got == {10: (101, None), 11: (None, None)}
