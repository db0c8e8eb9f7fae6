"""asof_join edge semantics: NULL fields of the matched right row must
surface as NULL — not be papered over with stale values from older right
rows (ADVICE r1: per-column last(ignoreNulls) leaked stale values; the
fix carries the whole row as one struct)."""

from __future__ import annotations

import datetime as dt

from gomrjob_spark.operators.asof import asof_join

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


def test_asof_null_in_matched_row_is_preserved(spark):
    left = spark.createDataFrame([("k", _ts(100))], "k string, lts timestamp")
    right = spark.createDataFrame(
        [("k", _ts(10), 1.0, "old"), ("k", _ts(50), None, "new")],
        "k string, rts timestamp, price double, tag string",
    )
    out = asof_join(left, right, "k", "lts", "rts", ["price", "tag"]).collect()
    assert len(out) == 1
    # the ts=50 row is the as-of match; its NULL price must NOT fall back
    # to the ts=10 row's 1.0
    assert out[0].asof_price is None
    assert out[0].asof_tag == "new"


def test_asof_unmatched_left_keeps_nulls(spark):
    left = spark.createDataFrame([("k", _ts(5))], "k string, lts timestamp")
    right = spark.createDataFrame(
        [("k", _ts(50), 2.0)], "k string, rts timestamp, price double"
    )
    out = asof_join(left, right, "k", "lts", "rts", ["price"]).collect()
    assert len(out) == 1
    assert out[0].asof_price is None


def test_asof_inclusive_and_tiebreak(spark):
    left = spark.createDataFrame([("k", _ts(50))], "k string, lts timestamp")
    right = spark.createDataFrame(
        [("k", _ts(50), 1.0, 1), ("k", _ts(50), 2.0, 2)],
        "k string, rts timestamp, price double, seq int",
    )
    out = asof_join(
        left, right, "k", "lts", "rts", ["price"], tiebreak="seq"
    ).collect()
    # equal-ts rows match (inclusive); highest tiebreak wins
    assert out[0].asof_price == 2.0


def test_asof_forward_picks_next_and_is_inclusive(spark):
    left = spark.createDataFrame(
        [("k", _ts(100)), ("k", _ts(40))], "k string, lts timestamp"
    )
    right = spark.createDataFrame(
        [("k", _ts(40), "same"), ("k", _ts(150), "next"), ("k", _ts(300), "far")],
        "k string, rts timestamp, tag string",
    )
    out = {
        r.lts: r.asof_tag
        for r in asof_join(
            left, right, "k", "lts", "rts", ["tag"], direction="forward"
        ).collect()
    }
    assert out[_ts(40)] == "same"  # inclusive: equal ts matches
    assert out[_ts(100)] == "next"  # nearest FUTURE row, not the farthest


def test_asof_tolerance_disqualifies_far_matches(spark):
    left = spark.createDataFrame(
        [("k", _ts(0)), ("k", _ts(7200))], "k string, lts timestamp"
    )
    right = spark.createDataFrame(
        [("k", _ts(3600), "v")], "k string, rts timestamp, tag string"
    )
    # forward with 30-min tolerance: ts=0 sees the view 1h ahead -> nulled
    out = {
        r.lts: r.asof_tag
        for r in asof_join(
            left,
            right,
            "k",
            "lts",
            "rts",
            ["tag"],
            direction="forward",
            tolerance_minutes=30,
        ).collect()
    }
    assert out[_ts(0)] is None
    # backward with 30-min tolerance from ts=7200: match 1h back -> nulled
    out_b = asof_join(
        left.filter("lts = timestamp'2024-01-01 02:00:00'"),
        right,
        "k",
        "lts",
        "rts",
        ["tag"],
        tolerance_minutes=30,
    ).collect()
    assert out_b[0].asof_tag is None
    # generous tolerance keeps it
    out_c = asof_join(
        left, right, "k", "lts", "rts", ["tag"], direction="forward", tolerance_minutes=120
    ).collect()
    assert {r.asof_tag for r in out_c} == {"v", None}


def test_asof_rejects_bad_direction(spark):
    import pytest

    left = spark.createDataFrame([("k", _ts(0))], "k string, lts timestamp")
    with pytest.raises(ValueError):
        asof_join(left, left, "k", "lts", "lts", [], direction="sideways")


def test_asof_fractional_minute_tolerance(spark):
    """ADVICE r3: a float tolerance (0.5 min) must be honored exactly,
    not truncated to INTERVAL 0 MINUTE. Gap 20s matches, gap 40s is
    disqualified."""
    from gomrjob_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00"), (2, "2024-01-01 00:02:00")],
        "k int, lts string",
    ).selectExpr("k", "CAST(lts AS TIMESTAMP) AS lts")
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:40", 10.0), (2, "2024-01-01 00:01:20", 20.0)],
        "k int, rts string, v double",
    ).selectExpr("k", "CAST(rts AS TIMESTAMP) AS rts", "v")
    got = {
        r.k: r.asof_v
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            value_cols=["v"], tolerance_minutes=0.5,
        ).collect()
    }
    assert got == {1: 10.0, 2: None}


def test_asof_nearest_picks_closest_and_backward_on_ties(spark):
    """Nearest semantics: closest right row in either direction wins;
    exactly equal gaps resolve to the backward (past) row; a key with
    no right rows keeps nulls; per-side tolerance disqualifies a near
    past match without shadowing an in-tolerance future one."""
    from pyspark.sql import functions as F

    from gomrjob_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [
            (1, "k1", "2024-01-01 10:00:00"),  # past@9:50 future@10:03 -> future
            (2, "k1", "2024-01-01 09:51:00"),  # past@9:50 future@10:03 -> past
            (3, "k2", "2024-01-01 10:00:00"),  # equal 5-min gaps -> backward
            (4, "k3", "2024-01-01 10:00:00"),  # no right rows -> nulls
        ],
        "event_id long, user_id string, ts_s string",
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [
            (100, "k1", "2024-01-01 09:50:00"),
            (101, "k1", "2024-01-01 10:03:00"),
            (200, "k2", "2024-01-01 09:55:00"),
            (201, "k2", "2024-01-01 10:05:00"),
        ],
        "event_id long, user_id string, ts_s string",
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"))

    got = {
        r.event_id: r.asof_event_id
        for r in asof_join_nearest(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            value_cols=["event_id"], tiebreak="event_id",
        ).collect()
    }
    assert got == {1: 101, 2: 100, 3: 200, 4: None}

    # tolerance 5 min: row 2's past match (1 min) survives; row 1's
    # nearest IS the future row (3 min) and stays; k2's both-at-5-min
    # matches survive exactly at the boundary (inclusive)
    got_tol = {
        r.event_id: r.asof_event_id
        for r in asof_join_nearest(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            value_cols=["event_id"], tiebreak="event_id", tolerance_minutes=5,
        ).collect()
    }
    assert got_tol == {1: 101, 2: 100, 3: 200, 4: None}

    # tolerance 2 min: row 1 keeps nothing in the past window but a
    # 3-min future is ALSO out; row 2 keeps its 1-min past match; k2
    # loses both
    got_tight = {
        r.event_id: r.asof_event_id
        for r in asof_join_nearest(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            value_cols=["event_id"], tiebreak="event_id", tolerance_minutes=2,
        ).collect()
    }
    assert got_tight == {1: None, 2: 100, 3: None, 4: None}


def test_asof_all_directions_match_pandas_merge_asof(spark):
    """Differential test against the reference implementation of the
    semantics we claim: pandas.merge_asof backward/forward/nearest over
    randomized keyed event times (with and without tolerance) must
    match the engine's union-stream plans row for row. Duplicate right
    timestamps are excluded from the generator because pandas breaks
    those ties by input position while the engine breaks them by the
    declared tiebreak column — both valid total orders, different
    contracts."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from gomrjob_spark.operators.asof import asof_join, asof_join_nearest

    rng = np.random.RandomState(7)
    keys = [f"k{i}" for i in range(6)]

    def frame(n, id0):
        rows = []
        seen = set()
        for i in range(n):
            k = keys[rng.randint(len(keys))]
            t = int(rng.randint(0, 10_000))
            if (k, t) in seen:  # unique (key, ts): see docstring
                continue
            seen.add((k, t))
            rows.append((id0 + i, k, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=t)))
        return pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])

    lp, rp = frame(120, 0), frame(150, 1000)
    left = spark.createDataFrame(lp)
    right = spark.createDataFrame(rp)

    for direction, tol in [
        ("backward", None), ("forward", None), ("nearest", None),
        ("backward", 5), ("forward", 5), ("nearest", 5),
    ]:
        kwargs = dict(
            on="user_id", left_ts="ts", right_ts="ts",
            value_cols=["event_id"], tiebreak="event_id",
            tolerance_minutes=tol / 60 if tol is not None else None,
        )
        if direction == "nearest":
            got_df = asof_join_nearest(left, right, **kwargs)
        else:
            got_df = asof_join(left, right, direction=direction, **kwargs)
        got = {r.event_id: r.asof_event_id for r in got_df.collect()}

        want_pd = pd.merge_asof(
            lp.sort_values("ts"),
            rp.sort_values("ts").rename(columns={"event_id": "r_id"}),
            on="ts", by="user_id", direction=direction,
            tolerance=pd.Timedelta(seconds=tol) if tol is not None else None,
        )
        want = {
            int(r.event_id): (None if pd.isna(r.r_id) else int(r.r_id))
            for r in want_pd.itertuples()
        }
        assert got == want, f"diverged from pandas at direction={direction} tol={tol}"
