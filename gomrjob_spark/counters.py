"""Counters & status — engine analog of the reference's reporter.

Reference behavior (/root/reference/reporter.go:12-21): tasks emit
``reporter:counter:group,name,amount`` / ``reporter:status:msg`` lines on
stderr and Hadoop aggregates them. Spark's native equivalent is an
accumulator (task-side adds, driver-side read), which shares Hadoop
counters' caveat: task retries can double-count. For exactly-once metrics
on the DataFrame path use ``DataFrame.observe`` instead (SURVEY.md §7
"Counter semantics").
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession

logger = logging.getLogger("gomrjob_spark")


class Counters:
    """A named family of Spark accumulators, keyed ``group.name``.

    Create driver-side, capture individual counters (via :meth:`counter`)
    inside UDF closures, read totals driver-side after an action.
    """

    def __init__(self, spark: SparkSession):
        self._sc = spark.sparkContext
        self._accs: dict[str, object] = {}

    def counter(self, group: str, name: str):
        key = f"{group}.{name}"
        if key not in self._accs:
            self._accs[key] = self._sc.accumulator(0)
        return self._accs[key]

    def incr(self, group: str, name: str, amount: int = 1) -> None:
        self.counter(group, name).add(amount)

    def value(self, group: str, name: str) -> int:
        return self.counter(group, name).value

    def report(self) -> dict[str, int]:
        return {k: acc.value for k, acc in sorted(self._accs.items())}

    def cpu_report(self) -> dict[str, int]:
        """Task CPU accounting (reference reporter.go:23-34 ``auditCpuTime``
        analog): executor CPU/runtime totals summed over this app's
        stages, read from Spark's status store — the engine-side metrics
        Hadoop's counter dump carried. Returns
        ``{executor_cpu_ns, executor_run_ms, n_stages}``."""
        store = self._sc._jsc.sc().statusStore()
        gw = self._sc._gateway
        stages = store.stageList(
            None,  # no status filter: all stages
            False,
            False,
            gw.new_array(gw.jvm.double, 0),
            gw.jvm.java.util.Collections.emptyList(),
        )
        cpu_ns = run_ms = 0
        for i in range(stages.size()):
            s = stages.apply(i)
            cpu_ns += s.executorCpuTime()
            run_ms += s.executorRunTime()
        return {
            "executor_cpu_ns": int(cpu_ns),
            "executor_run_ms": int(run_ms),
            "n_stages": stages.size(),
        }


def status(spark: SparkSession, msg: str) -> None:
    """Job-status analog of reporter.go:18-21 — surfaces in the Spark UI
    job description and the driver log."""
    spark.sparkContext.setJobDescription(msg)
    logger.info("status: %s", msg)
