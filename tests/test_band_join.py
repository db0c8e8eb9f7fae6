"""band_join differential tests: the bucketed formulation must equal the
naive cross-join + filter on every band configuration, including exact
band edges, bucket-boundary-aligned timestamps, and negative lower
bounds (windows that extend backwards)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gomrjob_spark.operators.rangejoin import band_join

EPOCH = dt.datetime(2024, 1, 1)

# timestamps (seconds) chosen to sit exactly on and around multiples of
# the band widths used below
LEFT_S = [0, 1, 29, 30, 31, 59, 60, 61, 90, 120, 1800, 3600]
RIGHT_S = [0, 15, 30, 45, 60, 75, 90, 1799, 1800, 1801, 3599, 3600, 3601]


def _df(spark, secs, id_col, ts_col):
    rows = [(i, EPOCH + dt.timedelta(seconds=s)) for i, s in enumerate(secs)]
    return spark.createDataFrame(rows, f"{id_col} int, {ts_col} timestamp")


@pytest.mark.parametrize(
    "lo,hi",
    [
        (0, 30),
        (0, 1800),
        (1, 59),
        (-30, 30),  # backward-and-forward window
        (-1800, 0),  # purely backward
        (30, 30),  # degenerate band (width clamps to 1)
    ],
)
def test_band_join_equals_naive(spark, lo, hi):
    left = _df(spark, LEFT_S, "lid", "lts")
    right = _df(spark, RIGHT_S, "rid", "rts")
    got = {
        (r.lid, r.rid)
        for r in band_join(left, right, "lts", "rts", lo, hi).select("lid", "rid").collect()
    }
    expected = {
        (li, ri)
        for li, ls in enumerate(LEFT_S)
        for ri, rs in enumerate(RIGHT_S)
        if lo <= rs - ls <= hi
    }
    assert got == expected


def test_band_join_extra_keys(spark):
    left = spark.createDataFrame(
        [(1, "a", EPOCH), (2, "b", EPOCH)], "lid int, k string, lts timestamp"
    )
    right = spark.createDataFrame(
        [(10, "a", EPOCH + dt.timedelta(seconds=5)), (20, "b", EPOCH + dt.timedelta(seconds=500))],
        "rid int, k string, rts timestamp",
    )
    got = {
        (r.lid, r.rid)
        for r in band_join(left, right, "lts", "rts", 0, 60, extra_keys=["k"])
        .select("lid", "rid")
        .collect()
    }
    # (1,20) time-matches nothing; (2,10) key-mismatches; only (1,10) survives
    assert got == {(1, 10)}


def test_band_join_rejects_inverted_band(spark):
    left = _df(spark, [0], "lid", "lts")
    with pytest.raises(ValueError):
        band_join(left, left, "lts", "lts", 10, 0)


def test_band_join_rejects_outer(spark):
    """Outer band joins would silently drop null-extended rows via the
    residual filter (ADVICE r1) — rejected, not wrong."""
    left = _df(spark, [0], "lid", "lts")
    with pytest.raises(ValueError, match="inner"):
        band_join(left, left, "lts", "lts", 0, 10, how="left")


def test_interval_lookup_boundary_semantics(spark):
    from pyspark.sql import Row

    from gomrjob_spark.operators.rangejoin import interval_lookup

    dim = spark.createDataFrame(
        [(0.0, 10.0, "a"), (10.0, 20.0, "b"), (30.0, 40.0, "c")],
        "lo double, hi double, tier string",
    )
    facts = spark.createDataFrame(
        [Row(value=v) for v in [-1.0, 0.0, 9.99, 10.0, 25.0, 30.0, 40.0]]
    )
    got = {
        r["value"]: r["tier"]
        for r in interval_lookup(facts, dim, "value").collect()
    }
    assert got == {
        -1.0: None,   # below the first interval
        0.0: "a",     # lo inclusive
        9.99: "a",
        10.0: "b",    # hi exclusive / next lo inclusive
        25.0: None,   # gap
        30.0: "c",
        40.0: None,   # past the last hi
    }


def test_interval_lookup_resolves_via_hash_join(spark):
    from gomrjob_spark.operators.rangejoin import interval_lookup

    dim = spark.createDataFrame(
        [(0.0, 10.0, "a"), (10.0, 20.0, "b")],
        "lo double, hi double, tier string",
    )
    facts = spark.range(100).select((F.col("id") * 0.3).alias("value"))
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        interval_lookup(facts, dim, "value").explain("formatted")
    plan = buf.getvalue()
    # the dim resolve must be a hash equi-join; the only nested-loop is
    # the 1-row boundary-array broadcast
    assert "BroadcastHashJoin" in plan
