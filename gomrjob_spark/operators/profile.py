"""One-pass table profiling: per-column null / exact-distinct / range
stats — the ANALYZE TABLE shape a data platform runs before anything
else touches a new 100 TB drop.

Everything computes in ONE aggregation over ONE scan: Spark plans the
multi-column exact COUNT(DISTINCT) set through a single Expand (each
input row fans to one tagged row per profiled column) feeding a
two-stage partial/final HashAggregate — one shuffle total, map-side
combined, no per-column scans and no driver-side loops. The Expand
multiplies scan rows by the profiled-column count, which is the
documented price of EXACT distinct counts; profiles that can accept
error bars swap in approx_count_distinct and drop the Expand (see
``agg_approx_distinct``).

Column-type contract: profiled columns must be string- or
integer-typed (min/max report the value as a string; integer-to-string
rendering is identical across engines, float rendering is NOT — the
engine refuses doubles rather than hash-drift on shortest-repr
differences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

_OK_PREFIXES = ("string", "varchar", "int", "bigint", "smallint", "tinyint", "long")


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile rows ``(column, n_rows, n_nulls, n_distinct,
    min_value, max_value)`` — one row per profiled column, one scan,
    one shuffle. ``n_distinct`` is exact and excludes NULL; min/max are
    string renderings (see module contract)."""
    dtypes = dict(df.dtypes)
    for c in cols:
        t = dtypes.get(c)
        if t is None:
            raise ValueError(f"no such column: {c!r}")
        if not t.startswith(_OK_PREFIXES):
            raise ValueError(
                f"column {c!r} has type {t}: profile only string/integer "
                "columns (float string-rendering is engine-specific)"
            )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"_nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(s).alias(f"_mn_{c}"),
            F.max(s).alias(f"_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
        "n_rows",
    ).select(
        "column",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_value",
        "max_value",
    )
