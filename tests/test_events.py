"""Unit tests for event-stream operators (sessionize, as-of join) on
hand-built frames — complements the DuckDB oracle checks."""

from datetime import datetime

from pyspark.sql import functions as F

from largeea_spark.operators.events import asof_join, sessionize


def ts(minute, second=0):
    return datetime(2024, 1, 1, 0, minute, second)


def test_sessionize_gap(spark):
    rows = [
        (1, ts(0)), (1, ts(10)), (1, ts(50)),   # 30-min gap → new session
        (2, ts(5)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.user_id, r.ts.minute): r.session_id
           for r in sessionize(df, gap_minutes=30.0).collect()}
    assert got[(1, 0)] == 1 and got[(1, 10)] == 1
    assert got[(1, 50)] == 2
    assert got[(2, 5)] == 1


def test_sessionize_boundary_exact_gap_same_session(spark):
    # gap strictly greater than threshold starts a session; == stays
    rows = [(1, ts(0)), (1, ts(30))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = [r.session_id for r in sessionize(df, gap_minutes=30.0)
           .orderBy("ts").collect()]
    assert got == [1, 1]


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(100, 1, ts(5)), (101, 1, ts(20)), (102, 2, ts(7))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(3), 10.0), (1, ts(15), 20.0), (3, ts(1), 99.0)],
        "user_id long, ts timestamp, v double",
    )
    out = {r.event_id: r.v_asof
           for r in asof_join(left, right, "user_id", "ts", ["v"]).collect()}
    assert out[100] == 10.0       # latest right ≤ 0:05 is 0:03
    assert out[101] == 20.0       # 0:15 ≤ 0:20
    assert out[102] is None       # user 2 has no right rows


def test_asof_join_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, 1, ts(10))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(1, ts(10), 7.0)],
                                  "user_id long, ts timestamp, v double")
    out = asof_join(left, right, "user_id", "ts", ["v"]).first()
    assert out.v_asof == 7.0      # ties: right-at-same-ts counts (<=)
