#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is materialized through the noop sink (full compute, no write
cost, no driver collect) — the number measured is the distributed plan's
wall clock, which is the thing that must scale to the 100 TB deployment.
A JVM/catalog warm-up query runs first so the measured times are not
dominated by one-time session setup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gomrjob_spark import plans  # noqa: E402
from gomrjob_spark.session import get_session  # noqa: E402

#: One representative per operator family (SURVEY.md §2 / §7 P6). Streaming
#: queries drive a full Structured Streaming topology; the rest are batch.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q18_large_volume_customer",
    "agg_cube",
    "window_topk_per_group",
    "join_range",
    "join_band_time",
    "join_asof",
    "sessionize_windows",
    "set_ops",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_bruteforce",
    "text_token_stats",
    "mr_field_count",
    "streaming_tumbling_agg",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_session(app_name="gomrjob_spark_bench")

    # warm-up: JVM codegen, parquet footer reads, Python worker pool spin-up
    _materialize(plans.QUERIES["q6_forecast_revenue"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        _materialize(plans.QUERIES[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
