#!/usr/bin/env python
"""Scale-sweep runner (SCALING.md methodology, now reusable).

Runs the named registered queries at each given sf directory and prints
one JSON line per (query, dir) plus a per-query fitted exponent
(log-log slope of wall clock vs scale factor k). Methodology matches
the bench harness: noop-sink materialization (full compute, no write or
collect cost), best-of-N warm per point (default 2), operator-scoped
persists released between queries, one long-lived session (a real
cluster's executors are long-lived).

Usage:
  python scripts/run_scale_sweep.py QUERY[,QUERY...] DIR[,DIR...] [RUNS]
e.g.
  python scripts/run_scale_sweep.py dedup_embedding_cosine,streaming_near_dup_probe \
      /root/testdata/sf0.1,/tmp/sfscale/sf0.2,/tmp/sfscale/sf0.4,/tmp/sfscale/sf0.8
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gomrjob_spark import plans  # noqa: E402
from gomrjob_spark.cache import release_scoped  # noqa: E402
from gomrjob_spark.session import get_session  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    dirs = sys.argv[2].split(",")
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    unknown = [q for q in names if q not in plans.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_session(app_name="gomrjob_spark_sweep")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus * 10).repartition(cpus).mapInPandas(
        lambda b: b, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # scale factor k per dir, parsed from the sfX.Y basename relative to
    # the first dir (so /root/testdata/sf0.1 + /tmp/sfscale/sf0.4 -> 1, 4)
    def sf_of(d: str) -> float:
        return float(os.path.basename(d.rstrip("/")).replace("sf", ""))

    base = sf_of(dirs[0])
    ks = [sf_of(d) / base for d in dirs]

    results: dict[str, list[float]] = {}
    for name in names:
        times = []
        for d in dirs:
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                plans.QUERIES[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            release_scoped()
            times.append(round(best, 3))
            print(f"# {name} @ {d}: {times[-1]:.3f}s", file=sys.stderr)
        results[name] = times
        # least-squares slope in log-log space = scaling exponent
        lx = [math.log(k) for k in ks]
        ly = [math.log(t) for t in times]
        mx, my_ = sum(lx) / len(lx), sum(ly) / len(ly)
        denom = sum((x - mx) ** 2 for x in lx)
        slope = sum((x - mx) * (y - my_) for x, y in zip(lx, ly)) / denom
        print(
            json.dumps(
                {"query": name, "ks": ks, "sec": times, "exponent": round(slope, 2)}
            )
        )


if __name__ == "__main__":
    main()
