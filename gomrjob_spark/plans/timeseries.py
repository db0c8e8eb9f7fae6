"""Time-series queries: as-of join and sessionization (batch paths)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gomrjob_spark.catalog import load_table
from gomrjob_spark.operators.asof import asof_join, asof_join_nearest, sessionize
from gomrjob_spark.operators.rangejoin import band_join
from gomrjob_spark.plans.registry import query

_SQL_ISLANDS = """
    marked AS (
      SELECT user_id, ts,
        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
"""


@query(
    "join_asof",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id, p.ts,
           v.ts       AS asof_ts,
           v.event_id AS asof_event_id
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.event_id
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase event picks up the most recent
    prior 'view' event of the same user (inclusive, LEFT semantics).

    Engine path: union-stream + running last(ignoreNulls) window — one
    shuffle on user_id, no self-join (operators/asof.py; a gomrjob user
    wrote this exact algorithm as a Reducer over a sorted union stream)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    return asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["ts", "event_id"],
        tiebreak="event_id",
    ).orderBy("event_id")


@query(
    "join_band_time",
    oracle="""
    SELECT a.event_id AS view_id, b.event_id AS purchase_id,
           a.ts AS view_ts, b.ts AS purchase_ts
    FROM events a JOIN events b
      ON a.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts - a.ts BETWEEN INTERVAL 0 SECOND AND INTERVAL 30 MINUTE
    ORDER BY view_id, purchase_id
    """,
)
def join_band_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure band join (NO equi key): every (view, purchase) pair across
    all users at most 30 minutes apart.

    Engine path: bucketed band join (operators/rangejoin.py) — the naive
    expression of this predicate is a BroadcastNestedLoopJoin (cross
    product, broadcast-bound); the bucket formulation is one hash shuffle
    on the 30-minute bucket id plus a 2x explode of the right side."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    return (
        band_join(views, purchases, "view_ts", "purchase_ts", 0, 30 * 60)
        .select("view_id", "purchase_id", "view_ts", "purchase_ts")
        .orderBy("view_id", "purchase_id")
    )


@query(
    "sessionize_windows",
    oracle=f"""
    WITH {_SQL_ISLANDS}
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def sessionize_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via lag + cumulative-sum islands (the
    window-function path; one shuffle on user_id)."""
    events = load_table(spark, sf_dir, "events")
    return sessionize(events, key="user_id", ts="ts", gap_minutes=30).orderBy(
        "user_id", "session_id"
    )


@query(
    "timeseries_rollup",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    ORDER BY day NULLS FIRST, hour NULLS FIRST
    """,
)
def timeseries_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hour and day
    granularities plus the grand total in ONE pass (rollup = single
    Expand + aggregate shuffle; the materialized-rollup pattern at scale
    writes this partitioned by day)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("total_cents"),
        )
        .orderBy(F.asc_nulls_first("day"), F.asc_nulls_first("hour"))
    )


@query(
    "session_window_batch",
    oracle=f"""
    WITH {_SQL_ISLANDS}
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` aggregation in batch mode — must agree
    with the islands formulation (same gap semantics: a 30-minute-exact
    gap starts a new session, [start, last+gap) windows)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN v.ts - p.ts <= INTERVAL 360 MINUTE THEN v.ts END
             AS asof_ts,
           CASE WHEN v.ts - p.ts <= INTERVAL 360 MINUTE THEN v.event_id END
             AS asof_event_id
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
    ORDER BY p.event_id
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: each purchase picks up the NEXT
    'view' event of the same user (inclusive), nulled when it lies more
    than 6 hours ahead — pandas merge_asof(direction='forward',
    tolerance=...) semantics. Same union-stream single-window plan as the
    backward form, scanned descending; the tolerance disqualifies rather
    than re-selects, matching DuckDB's ASOF `<=` + post-CASE."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    return asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["ts", "event_id"],
        tiebreak="event_id",
        direction="forward",
        tolerance_minutes=360,
    ).orderBy("event_id")


@query(
    "join_asof_nearest",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
    cand AS (
      SELECT p.event_id, v.ts AS vts, v.event_id AS vid,
             CASE WHEN v.ts <= p.ts THEN p.ts - v.ts ELSE v.ts - p.ts END AS gap,
             CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END AS dirn
      FROM p JOIN v USING (user_id)
    ),
    best AS (
      SELECT event_id, vts, vid,
             row_number() OVER (
               PARTITION BY event_id ORDER BY gap, dirn, vid DESC
             ) AS rnk
      FROM cand
    )
    SELECT p.event_id, p.user_id, p.ts,
           b.vts AS asof_ts, b.vid AS asof_event_id
    FROM p LEFT JOIN best b ON b.event_id = p.event_id AND b.rnk = 1
    ORDER BY p.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join: each purchase picks up the view of
    the same user CLOSEST in time, past or future, backward winning
    equal gaps (pandas merge_asof direction='nearest'). Engine path:
    one union stream windowed twice over a single hash exchange
    (ascending + descending running last), row-local gap pick
    (operators/asof.py asof_join_nearest) — the oracle runs the naive
    all-pairs-in-key rank, which is exactly the shuffle the plan
    avoids."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    return asof_join_nearest(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["ts", "event_id"],
        tiebreak="event_id",
    ).orderBy("event_id")


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS first_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND v.first_view IS NOT NULL
        AND e.ts >= v.first_view AND e.ts <= v.first_view + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts >= c.first_click AND e.ts <= c.first_click + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v WHERE first_view IS NOT NULL) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase,
           CAST((SELECT count(*) FROM c) AS DOUBLE)
             / (SELECT count(*) FROM v WHERE first_view IS NOT NULL) AS view_to_click,
           CAST((SELECT count(*) FROM p) AS DOUBLE)
             / nullif((SELECT count(*) FROM c), 0) AS click_to_purchase
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-stage conversion funnel: first view -> first click within
    24 h -> first purchase within 24 h of the click, with per-stage user
    counts and conversion rates. The staple event-analytics composite a
    gomrjob user chained three MapReduce jobs for.

    Scale: every stage is a keyed aggregation or a user_id equi-join
    against a strictly shrinking user set — no window over the full
    event stream, no self-join on time. The final three 1-row stage
    counts combine via broadcast (constant-sized, allowlisted like the
    q11/q22 global-scalar broadcasts)."""
    events = load_table(spark, sf_dir, "events")
    day = F.expr("INTERVAL 24 HOURS")
    v = (
        events.groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"))
        .filter(F.col("first_view").isNotNull())
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") >= F.col("first_view")) & (F.col("ts") <= F.col("first_view") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") >= F.col("first_click")) & (F.col("ts") <= F.col("first_click") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase"))
    return (
        nv.join(F.broadcast(nc))
        .join(F.broadcast(np_))
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            (F.col("n_click").cast("double") / F.col("n_view")).alias("view_to_click"),
            (
                F.col("n_purchase").cast("double")
                / F.nullif(F.col("n_click"), F.lit(0))
            ).alias("click_to_purchase"),
        )
    )


@query(
    "concurrency_profile",
    oracle=f"""
    WITH {_SQL_ISLANDS},
    sess AS (
      SELECT user_id, session_id, min(ts) AS s,
             max(ts) + INTERVAL 30 MINUTE AS e
      FROM numbered GROUP BY user_id, session_id
    ),
    deltas AS (
      SELECT s AS ts, 1 AS delta FROM sess
      UNION ALL
      SELECT e AS ts, -1 AS delta FROM sess
    ),
    run AS (
      SELECT ts, delta,
             sum(delta) OVER (ORDER BY ts, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM deltas
    )
    SELECT date_trunc('day', ts) AS day,
           CAST(max(conc) AS INT) AS peak_concurrent,
           CAST(count(CASE WHEN delta = 1 THEN 1 END) AS BIGINT) AS n_started
    FROM run GROUP BY 1 ORDER BY day
    """,
)
def concurrency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via the sweep line: sessions
    become +1/-1 boundary events, a DISTRIBUTED prefix sum (range
    partition -> per-partition cumsum -> broadcast per-partition
    offsets; operators/sweepline.py) replaces both the naive interval
    range-join AND the single-task global window Spark would otherwise
    plan for ``ORDER BY ts``. Ends sort before starts at equal instants
    (delta ascending), giving half-open [start, end) semantics. The
    oracle runs the exact single-threaded window the operator
    re-derives distributively — per-row running values form a
    deterministic multiset under equal-delta ties, so the per-day max
    is hash-exact."""
    events = load_table(spark, sf_dir, "events")
    from gomrjob_spark.operators.sweepline import interval_concurrency

    sessions = sessionize(events, key="user_id", ts="ts", gap_minutes=30)
    conc = interval_concurrency(sessions)
    return (
        conc.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.max("concurrent").cast("int").alias("peak_concurrent"),
            F.count(F.when(F.col("delta") == 1, F.lit(1))).alias("n_started"),
        )
        .orderBy("day")
    )


@query(
    "scd2_build",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR event_type IS DISTINCT FROM prev
    )
    SELECT user_id, event_type AS state, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           CAST(row_number() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
    FROM changes
    ORDER BY user_id, version
    """,
)
def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 history build from a change log
    (operators.asof.scd2_build): per-user event_type runs become
    versioned validity intervals with valid_from/valid_to (NULL = still
    current). ONE hash exchange on user_id carries every window (change
    flag, lead, version rank) — the batch HISTORY companion to
    streaming_upsert_apply's live CURRENT-row view."""
    from gomrjob_spark.operators.asof import scd2_build as _scd2

    events = load_table(spark, sf_dir, "events")
    return _scd2(
        events, key="user_id", attr="event_type", ts="ts", tiebreak="event_id"
    ).orderBy("user_id", "version")


@query(
    "join_interval_lookup",
    oracle="""
    WITH tiers(lo, hi, tier) AS (
      VALUES (0.0, 25.0, 'nano'), (25.0, 100.0, 'small'),
             (100.0, 250.0, 'mid'), (300.0, 450.0, 'large')
    ),
    tagged AS (
      SELECT e.value, t.tier
      FROM events e LEFT JOIN tiers t
        ON e.value >= t.lo AND e.value < t.hi
    )
    SELECT tier,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM tagged GROUP BY tier ORDER BY tier NULLS FIRST
    """,
)
def join_interval_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval dimension lookup (operators.rangejoin
    .interval_lookup): events bucket into half-open value tiers — with
    a deliberate coverage GAP [250, 300) exercising the no-match NULL
    path — then aggregate per tier. The plan ranks each value
    row-locally against a 1-row broadcast of the sorted lo boundaries
    and resolves tier attributes with a broadcast HASH equi-join; the
    oracle runs the naive non-equi predicate join the shape avoids
    (which Spark would plan as a BroadcastNestedLoopJoin evaluating
    |facts| x |dim| predicates through the join machinery)."""
    from gomrjob_spark.operators.rangejoin import interval_lookup

    events = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [
            (0.0, 25.0, "nano"),
            (25.0, 100.0, "small"),
            (100.0, 250.0, "mid"),
            (300.0, 450.0, "large"),
        ],
        "lo double, hi double, tier string",
    )
    tagged = interval_lookup(events.select("value"), dim, "value")
    return (
        tagged.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                "total_cents"
            ),
        )
        .orderBy(F.asc_nulls_first("tier"))
    )


@query(
    "feature_decile_stats",
    oracle="""
    WITH ranked AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
             row_number() OVER (ORDER BY value, event_id) AS rn,
             count(*) OVER () AS n
      FROM events
    )
    SELECT CAST(((rn - 1) * 10) // n AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(cents) AS lo_cents,
           max(cents) AS hi_cents
    FROM ranked GROUP BY 1 ORDER BY decile
    """,
)
def feature_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global decile (ntile-style) feature binning via DISTRIBUTED
    ranking (operators.sweepline.global_row_number): the CDF/quantile
    transform ML feature pipelines run over full columns, computed
    WITHOUT the single-task ``ORDER BY`` window the oracle uses — range
    partition, per-partition row_number, bounded per-partition counts
    prefix-summed and broadcast back. decile = ((rn-1)*10) DIV n, all
    integers, so bucket boundaries are exact (no percentile float
    interpolation) and the per-decile (count, min, max) row set is
    hash-identical. The (value, event_id) order key is total, making
    row_number deterministic."""
    from gomrjob_spark.operators.sweepline import global_row_number

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id", "value",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    ranked = global_row_number(base, ["value", "event_id"])
    n_total = ranked.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.join(F.broadcast(n_total))
        .withColumn("decile", F.expr("((rn - 1) * 10) DIV _n").cast("int"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .orderBy("decile")
    )


@query(
    "timeseries_twap",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CAST(date_diff('second', ts,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               AS BIGINT) AS dur_s
      FROM events
    )
    SELECT user_id,
           CAST(count(dur_s) AS BIGINT) AS n_segments,
           CAST(sum(dur_s) AS BIGINT) AS total_s,
           CAST(sum(cents * dur_s) AS BIGINT) AS weighted_cents_s,
           CAST(sum(cents * dur_s) AS DOUBLE) / sum(dur_s) AS twap_cents
    FROM seg WHERE dur_s IS NOT NULL
    GROUP BY user_id HAVING sum(dur_s) > 0
    ORDER BY user_id
    """,
)
def timeseries_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP — the billing /
    irregular-sampling aggregate where plain AVG is wrong): each
    observation holds until the user's next event, so its weight is
    the segment duration. One lead() window rides ONE hash exchange on
    user_id; weights and the numerator are exact bigints (cents x
    whole seconds), the final ratio one IEEE division — hash-exact.
    Last-known-value (step-function) semantics; a user's final event
    carries no duration and is excluded on both engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = events.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        (
            (F.lead("ts").over(w).cast("timestamp").cast("long"))
            - F.col("ts").cast("timestamp").cast("long")
        ).alias("dur_s"),
    ).filter(F.col("dur_s").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dur_s").alias("total_s"),
            F.sum(F.col("cents") * F.col("dur_s")).alias("weighted_cents_s"),
            (
                F.sum(F.col("cents") * F.col("dur_s")).cast("double")
                / F.sum("dur_s")
            ).alias("twap_cents"),
        )
        .filter(F.col("total_s") > 0)
        .orderBy("user_id")
    )


@query(
    "timeseries_gapfill_locf",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE user_id < 30
    ),
    span AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS t0,
             date_trunc('hour', max(ts)) AS t1
      FROM e GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, g.t AS grid_ts
      FROM span, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS g(t)
    ),
    u AS (
      SELECT user_id, ts AS t, 0 AS g, event_id, cents FROM e
      UNION ALL
      SELECT user_id, grid_ts, 1, 4611686018427387904, NULL FROM grid
    ),
    f AS (
      SELECT user_id, t, g,
             last_value(cents IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, g, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents
      FROM u
    )
    SELECT user_id, t AS grid_ts, cents
    FROM f WHERE g = 1 AND cents IS NOT NULL
    ORDER BY user_id, grid_ts
    """,
)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style resampling: gap-fill each user's irregular
    events onto a regular 1-hour grid with last-observation-carried-
    forward (the time_bucket_gapfill + locf pattern). The naive
    formulation is an as-of join of every grid instant against the
    event stream; this plan instead UNIONS grid points into the event
    stream and takes ONE running last(ignoreNulls) window per user —
    one hash exchange total, no join. Grid rows sort after same-instant
    events ((t, is_grid, event_id) total order, grid sentinel id), so
    an event exactly on the hour is included in that hour's value on
    both engines. Grid points before a user's first event carry no
    value and drop."""
    events = load_table(spark, sf_dir, "events")
    e = events.filter(F.col("user_id") < 30).select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    span = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("t"),
        F.lit(1).alias("g"),
        F.lit(4611686018427387904).alias("event_id"),
        F.lit(None).cast("bigint").alias("cents"),
    )
    u = e.select(
        "user_id", F.col("ts").alias("t"), F.lit(0).alias("g"), "event_id", "cents"
    ).unionByName(grid)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "g", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_locf", F.last("cents", ignorenulls=True).over(w))
    return (
        filled.filter((F.col("g") == 1) & F.col("_locf").isNotNull())
        .select("user_id", F.col("t").alias("grid_ts"), F.col("_locf").alias("cents"))
        .orderBy("user_id", "grid_ts")
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('week', f.cohort_week,
                            date_trunc('week', e.ts)) AS BIGINT) AS week_offset
      FROM events e JOIN firsts f USING (user_id)
    ),
    sizes AS (
      SELECT cohort_week, count(*) AS cohort_size FROM firsts GROUP BY 1
    )
    SELECT a.cohort_week, a.week_offset,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST((1000000 * count(*)) // s.cohort_size AS BIGINT)
             AS retention_ppm
    FROM active a JOIN sizes s USING (cohort_week)
    GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    ORDER BY cohort_week, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle — the product-analytics staple: users
    cohorted by the week of their FIRST event; for each (cohort week,
    week offset), how many cohort members were active, and the exact
    ppm retention rate. Plan: one per-user min aggregation (the cohort
    map, user-keyed — joins back onto the event stream as a user-keyed
    equi-join, broadcastable when the user dimension allows), one
    distinct per (user, offset), one counting aggregation; retention is
    an integer ppm DIV. Week arithmetic uses date_trunc + whole-week
    difference, identical on both engines."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            ).cast("bigint").alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.expr("(1000000 * n_active) DIV cohort_size")
            .cast("bigint")
            .alias("retention_ppm"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS src, next_type AS dst, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    r AS (SELECT src, CAST(sum(n) AS BIGINT) AS row_total FROM t GROUP BY src)
    SELECT t.src, t.dst, CAST(t.n AS BIGINT) AS n,
           CAST((1000000 * t.n) // r.row_total AS BIGINT) AS p_ppm
    FROM t JOIN r USING (src)
    ORDER BY src, dst
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-flow (Markov transition) matrix: per-user
    consecutive event-type pairs counted and row-normalized to exact
    ppm probabilities — the user-flow analysis behind funnel and
    drop-off dashboards. One lead() window on the user_id exchange
    (the same single-exchange discipline as scd2/sessionize), one
    transition count agg, a row-total join sized by the type
    vocabulary; every probability an integer ppm DIV."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("src"), F.col("next_type").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    r = t.groupBy("src").agg(F.sum("n").cast("bigint").alias("row_total"))
    return (
        t.join(F.broadcast(r), "src")
        .select(
            "src", "dst", F.col("n").cast("bigint").alias("n"),
            F.expr("(1000000 * n) DIV row_total").cast("bigint").alias("p_ppm"),
        )
        .orderBy("src", "dst")
    )


@query(
    "timeseries_cusum_drift",
    oracle="""
    WITH d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS daily_cents
      FROM events GROUP BY 1, 2
    ),
    e AS (
      SELECT event_type,
             CAST(sum(daily_cents) AS BIGINT) AS total,
             count(*) AS n_days
      FROM d GROUP BY 1
    ),
    c AS (
      SELECT d.event_type, d.day, d.daily_cents,
             CAST(sum(d.daily_cents - (e.total // e.n_days)) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cusum
      FROM d JOIN e USING (event_type)
    )
    SELECT event_type, day, daily_cents, cusum
    FROM c ORDER BY event_type, day
    """,
)
def timeseries_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift series per event type: the cumulative sum of each
    day's deviation from the type's expected daily total (integer DIV
    mean) — the classic change-point/drift detector (a sustained shift
    shows as a monotone cusum ramp; noise cancels). All arithmetic is
    exact bigint cents, so the full series is hash-identical. One
    daily partial-agg shuffle, a type-sized expected-value join, and a
    per-type window over ~days rows (bounded partitions — the window
    never sees the raw event stream)."""
    events = load_table(spark, sf_dir, "events")
    d = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("daily_cents")
    )
    e = d.groupBy("event_type").agg(
        F.sum("daily_cents").cast("bigint").alias("total"),
        F.count(F.lit(1)).alias("n_days"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(F.broadcast(e), "event_type")
        .withColumn(
            "cusum",
            F.sum(
                F.col("daily_cents") - F.expr("total DIV n_days")
            ).over(w).cast("bigint"),
        )
        .select("event_type", "day", "daily_cents", "cusum")
        .orderBy("event_type", "day")
    )


@query(
    "timeseries_autocorr",
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT c AS x, lead(c) OVER (ORDER BY day) AS y FROM d
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM p WHERE y IS NOT NULL
    )
    SELECT n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS lag1_autocorr
    FROM m
    """,
)
def timeseries_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily revenue series — is today
    predictive of tomorrow? Pearson r over (day, next-day) pairs with
    every MOMENT an exact integer (bigint cents; DECIMAL(38,0) /
    HUGEINT products — the (n*sxx) class overflows bigint at scale)
    and the final r assembled from those exact moments in one fixed
    double expression: IEEE division and sqrt are correctly-rounded,
    so even the square roots are bit-identical cross-engine — the same
    discipline that makes the engine's float aggregates hashable
    (exact integer accumulation, row-local IEEE finish)."""
    events = load_table(spark, sf_dir, "events")
    d = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("c")
    )
    w = Window.orderBy("day")
    p = d.select(F.col("c").alias("x"), F.lead("c").over(w).alias("y")).filter(
        F.col("y").isNotNull()
    )
    dec = "decimal(38,0)"
    m = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).cast(dec).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast(dec).alias("sxy"),
    )
    nd = F.col("n").cast(dec)
    return m.select(
        "n",
        (
            (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (
                F.sqrt((nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
                * F.sqrt((nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
            )
        ).alias("lag1_autocorr"),
    )


@query(
    "burst_detection",
    oracle="""
    WITH e AS (
      SELECT user_id,
             CAST(epoch(CAST(ts AS TIMESTAMP)) AS BIGINT) AS sec
      FROM events
    ),
    w AS (
      SELECT user_id,
             count(*) OVER (
               PARTITION BY user_id ORDER BY sec
               RANGE BETWEEN 60 PRECEDING AND CURRENT ROW) AS burst
      FROM e
    )
    SELECT user_id, CAST(max(burst) AS BIGINT) AS max_burst_60s
    FROM w GROUP BY user_id
    HAVING max(burst) >= 2
    ORDER BY user_id
    """,
)
def burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst / rate-limit detection: each user's maximum event count in
    any trailing 60-second window — the abuse/anomaly shape behind rate
    limiting, scraping detection, and bot triage. A RANGE window frame
    over epoch seconds counts the trailing window in one pass per user
    (one user_id exchange) — no self-join of the event stream against
    itself, which is the naive O(n^2-per-user) formulation. Exact
    integer counts; users with a burst >= 2 report."""
    events = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-60, Window.currentRow)
    )
    bursts = events.select("user_id", sec.alias("sec")).withColumn(
        "burst", F.count(F.lit(1)).over(w)
    )
    return (
        bursts.groupBy("user_id")
        .agg(F.max("burst").cast("bigint").alias("max_burst_60s"))
        .filter(F.col("max_burst_60s") >= 2)
        .orderBy("user_id")
    )


@query(
    "rolling_active_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    contrib AS (
      SELECT day + to_days(CAST(o.off AS INTEGER)) AS window_day, user_id
      FROM du, unnest(generate_series(0, 6)) AS o(off)
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT c.window_day AS day,
           CAST(count(DISTINCT c.user_id) AS BIGINT) AS wau
    FROM contrib c JOIN days d ON d.day = c.window_day
    GROUP BY 1 ORDER BY day
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per observed day — the
    engagement KPI whose naive form is a per-day DISTINCT over a
    sliding self-join. The scalable shape inverts it: each (day, user)
    pair CONTRIBUTES to the 7 window-days it falls in (a bounded x7
    explode of the deduplicated day-user frame, not of the raw event
    stream), then one exact count-distinct per window day. Restricted
    to days that actually occur (join vs the observed-day set), so
    both engines window over the same day domain."""
    events = load_table(spark, sf_dir, "events")
    du = events.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    contrib = du.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("window_day"),
        "user_id",
    )
    days = du.select("day").distinct()
    return (
        contrib.join(days, contrib["window_day"] == days["day"])
        .groupBy("window_day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("wau"))
        .select(F.col("window_day").alias("day"), "wau")
        .orderBy("day")
    )


@query(
    "timeseries_ewma",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events
    ),
    ser AS (
      SELECT user_id, list(cents ORDER BY ts, event_id) AS cs
      FROM e GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(cs) AS BIGINT) AS n_events,
           CAST(cs[len(cs)] AS BIGINT) AS last_cents,
           CAST(list_reduce(cs, (acc, v) -> (7 * acc + v) // 8) AS BIGINT)
             AS ewma_cents
    FROM ser ORDER BY user_id
    """,
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series exponential smoothing (EWMA, alpha = 1/8) — the
    classic monitoring baseline (load smoothing, anomaly reference
    level) that plain window aggregates cannot express because each
    step depends on the previous RESULT, not the previous rows. Exact
    fixed-point recurrence s_t = (7*s_{t-1} + c_t) >> 3 over positive
    integer cents: a shift is floor-division by 8 on both engines, so
    the whole recursive smoother sits under the full hash gate (the
    oracle replays the identical fold with list_reduce).

    Plan: ONE hash exchange on user_id (partial-agg collect_list),
    then the fold is a row-local F.aggregate over the sorted series —
    the same bounded-per-series shape as sessionize/gapfill (a user's
    history fits a row; for pathological series an applyInPandas twin
    is the escape hatch). Struct array_sort orders by (ts, event_id)
    exactly like the TWAP window."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        F.col("ts"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("_c"),
    )
    ser = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "_c"))).alias("_s")
    )
    staged = ser.select(
        "user_id",
        F.transform("_s", lambda s: s["_c"]).alias("_cs"),  # staged: no CSE in lambdas
    )
    fold = F.aggregate(
        F.expr("slice(_cs, 2, greatest(size(_cs) - 1, 0))"),
        F.element_at("_cs", 1),
        lambda acc, v: F.shiftright(F.lit(7) * acc + v, 3),
    )
    return (
        staged.select(
            "user_id",
            F.size("_cs").cast("bigint").alias("n_events"),
            F.element_at("_cs", -1).cast("bigint").alias("last_cents"),
            fold.cast("bigint").alias("ewma_cents"),
        )
        .orderBy("user_id")
    )
