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

from pyspark.accumulators import AccumulatorParam
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

    def _stage_list(self):
        store = self._sc._jsc.sc().statusStore()
        gw = self._sc._gateway
        stages = store.stageList(
            None,
            False,
            False,
            gw.new_array(gw.jvm.double, 0),
            gw.jvm.java.util.Collections.emptyList(),
        )
        return store, [stages.apply(i) for i in range(stages.size())]

    def stage_report(self) -> list[dict]:
        """Per-stage progress + IO metrics, read from Spark's status
        store — the engine-native replacement for the reference's remote
        log channel (/root/reference/remote_logging.go:13-76), which
        existed so the submitting driver could watch task progress
        without ssh-ing to workers. On Spark the driver already holds
        that state; this surfaces it as plain dicts (one per stage,
        oldest first)."""
        _, stages = self._stage_list()
        out = []
        for s in stages:
            out.append(
                {
                    "stage_id": int(s.stageId()),
                    "attempt": int(s.attemptId()),
                    "name": s.name(),
                    "status": s.status().toString(),
                    "num_tasks": int(s.numTasks()),
                    "complete_tasks": int(s.numCompleteTasks()),
                    "failed_tasks": int(s.numFailedTasks()),
                    "input_records": int(s.inputRecords()),
                    "output_records": int(s.outputRecords()),
                    "shuffle_read_bytes": int(s.shuffleReadBytes()),
                    "shuffle_write_bytes": int(s.shuffleWriteBytes()),
                    "memory_spill_bytes": int(s.memoryBytesSpilled()),
                    "disk_spill_bytes": int(s.diskBytesSpilled()),
                    "executor_run_ms": int(s.executorRunTime()),
                }
            )
        out.sort(key=lambda d: (d["stage_id"], d["attempt"]))
        return out

    def task_report(self, stage_id: int | None = None, max_tasks: int = 1000) -> list[dict]:
        """Per-task rows for one stage (default: the most recent) — task
        id, partition, host, status, duration — the granularity the
        reference's remote logger streamed line-by-line over UDP
        (remote_logging.go:36-56). Task retries appear as extra rows with
        the same partition id, which is how double-fire is observable."""
        store, stages = self._stage_list()
        if not stages:
            return []
        if stage_id is None:
            target = max(stages, key=lambda s: (s.stageId(), s.attemptId()))
        else:
            matching = [s for s in stages if s.stageId() == stage_id]
            if not matching:
                return []
            target = max(matching, key=lambda s: s.attemptId())
        tasks = store.taskList(target.stageId(), target.attemptId(), max_tasks)
        out = []
        for i in range(tasks.size()):
            t = tasks.apply(i)
            dur = t.duration()
            out.append(
                {
                    "stage_id": int(target.stageId()),
                    "task_id": int(t.taskId()),
                    "partition_id": int(t.partitionId()),
                    "attempt": int(t.attempt()),
                    "host": t.host(),
                    "status": t.status(),
                    "duration_ms": int(dur.get()) if dur.isDefined() else None,
                }
            )
        out.sort(key=lambda d: d["task_id"])
        return out

    def on_progress(self, fn, interval_s: float = 0.25) -> "ProgressWatch":
        """Start a live progress watch (see ProgressWatch): ``fn`` is
        called with per-stage progress dicts WHILE jobs run, until the
        returned watch is stopped / its context exits."""
        return ProgressWatch(self._sc, fn, interval_s)

    def worker_log(self) -> "WorkerLog":
        """A log channel from Python worker code back to the driver —
        the last piece of the reference's remote log surface (see
        WorkerLog)."""
        return WorkerLog(self._sc)

    def task_log_tail(self, n: int = 20, max_stages: int = 100) -> list[str]:
        """Formatted tail of recent task completions across stages —
        one human-readable line per task, newest last. The reference
        tailed these lines from a UDP socket; here they come from the
        driver's own status store, so the capability survives with no
        side channel. Lines look like
        ``stage 3.0 task 42 p7 SUCCESS 207ms on host``.

        Cost discipline (r15): every status-store field read is one
        py4j round trip, and the store retains up to
        ``spark.ui.retainedStages`` (default 1000) stages for the WHOLE
        application. The previous shape re-fetched the full stage list
        once per stage (O(stages^2) round trips — measured 8+ minutes
        in a session that had run a long test suite) to tail a handful
        of lines. Now: one stage-list fetch, and only the newest
        ``max_stages`` stages (by stage id, the submission order) are
        walked — a TAIL needs recent stages, not the app's lifetime;
        pass a larger window if you genuinely want deep history."""
        store, stages = self._stage_list()
        stages = sorted(
            stages, key=lambda s: (s.stageId(), s.attemptId()), reverse=True
        )[: max(0, max_stages)]
        lines: list[tuple[int, str]] = []
        for s in stages:
            # newest-first with an early stop: once several windows'
            # worth of candidate lines are collected, older stages
            # cannot realistically carry later task ids (ids are
            # assigned at launch; concurrent-job interleaving is
            # covered by the 4x buffer)
            if len(lines) >= max(4 * n, 64):
                break
            sid, att = s.stageId(), s.attemptId()
            tasks = store.taskList(sid, att, 1000)
            for i in range(tasks.size()):
                t = tasks.apply(i)
                d = t.duration()
                dur = f"{int(d.get())}ms" if d.isDefined() else "-"
                lines.append(
                    (
                        int(t.taskId()),
                        f"stage {int(sid)}.{int(att)} task {int(t.taskId())} "
                        f"p{int(t.partitionId())} {t.status()} {dur} on {t.host()}",
                    )
                )
        lines.sort()
        return [line for _, line in lines[-n:]]


class _LinesAccumulatorParam(AccumulatorParam):
    """AccumulatorParam for list-of-strings merging (module-level: the
    param rides the accumulator's pickle to every worker)."""

    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


class WorkerLog:
    """Task log lines shipped from Python workers to the driver over an
    accumulator — the in-band replacement for the reference's UDP log
    channel (/root/reference/remote_logging.go:26-56), which forwarded
    the tasks' own output lines to the submitting process while the job
    ran.

    Mechanics and their honest caveats:

    - ``log(msg)`` is called inside worker code (a mapInPandas batch
      fn, a Pipeline mapper, a pandas UDF); the line is stamped with
      host:pid and buffered in a list accumulator.
    - Delivery granularity is TASK COMPLETION: Spark ships accumulator
      updates with each task's status, so on a multi-task stage, lines
      from finished tasks are readable driver-side (``lines()``/
      ``tail()``, thread-safe) while later tasks still run — live at
      the same granularity Hadoop surfaced counter/status updates.
      Lines from a task that never finishes are lost with it.
    - Like every accumulator (and Hadoop counters), retried tasks
      re-add their lines: at-least-once, fine for logs.
    - Each line costs driver memory; this is a log TAIL channel for
      progress/diagnostics (the reference's use), not an event bus.
      Cluster-wide stdout/stderr capture belongs to the platform's log
      aggregation (YARN `yarn logs`, k8s pod logs), which is where the
      full firehose lives in cluster mode.
    """

    def __init__(self, sc):
        self._acc = sc.accumulator([], _LinesAccumulatorParam())

    def log(self, msg: str) -> None:
        """Worker-side: append one line, stamped host:pid."""
        import os
        import socket

        self._acc.add([f"[{socket.gethostname()}:{os.getpid()}] {msg}"])

    def lines(self) -> list[str]:
        """Driver-side: every line shipped by completed tasks so far."""
        return list(self._acc.value)

    def tail(self, n: int = 20) -> list[str]:
        return self.lines()[-n:]


def status(spark: SparkSession, msg: str) -> None:
    """Job-status analog of reporter.go:18-21 — surfaces in the Spark UI
    job description and the driver log."""
    spark.sparkContext.setJobDescription(msg)
    logger.info("status: %s", msg)


class ProgressWatch:
    """Live per-stage progress callbacks DURING execution — the Spark-
    native replacement for the reference's remote log channel
    (/root/reference/remote_logging.go:26-56), which streamed task lines
    over UDP so the submitting driver could watch a running job without
    ssh-ing to workers. ``stage_report()``/``task_log_tail()`` read the
    same state after the fact; this delivers it WHILE the job runs —
    the difference that matters on a multi-hour 100 TB job.

    A daemon thread polls ``SparkContext.statusTracker()`` (driver-local
    state, zero cluster traffic) every ``interval_s`` and invokes the
    callback with one dict per active stage::

        {"stage_id", "name", "num_tasks", "active_tasks",
         "complete_tasks", "failed_tasks"}

    Polling the status tracker (rather than a py4j-callback
    SparkListener) is deliberate: the Python callback server adds a
    second socket channel that must outlive arbitrary user callbacks,
    while the tracker poll is pure driver-side reads with no JVM->Python
    reentrancy. Use as a context manager around the action::

        with Counters(spark).on_progress(print):
            df.write.format("noop").mode("overwrite").save()
    """

    def __init__(self, sc, fn, interval_s: float = 0.25):
        import threading

        self._sc = sc
        self._fn = fn
        self._interval = interval_s
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name="gomrjob-progress-watch", daemon=True
        )
        self._thread.start()

    def _run(self) -> None:
        tracker = self._sc.statusTracker()
        while not self._stop.is_set():
            events = []
            try:
                for sid in tracker.getActiveStageIds():
                    info = tracker.getStageInfo(sid)
                    if info is None:
                        continue
                    events.append(
                        {
                            "stage_id": int(info.stageId),
                            "name": info.name,
                            "num_tasks": int(info.numTasks),
                            "active_tasks": int(info.numActiveTasks),
                            "complete_tasks": int(info.numCompletedTasks),
                            "failed_tasks": int(info.numFailedTasks),
                        }
                    )
            except Exception:  # SparkContext stopping mid-poll
                return
            for ev in events:
                # user callback OUTSIDE the tracker try: its exceptions
                # must not be mistaken for a dying SparkContext and
                # silently kill the watch (ADVICE r4) — log and keep
                # polling instead
                try:
                    self._fn(ev)
                except Exception:
                    import logging

                    logging.getLogger("gomrjob_spark.progress").exception(
                        "on_progress callback raised; continuing to poll"
                    )
            self._stop.wait(self._interval)

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)

    def __enter__(self) -> "ProgressWatch":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()


class StreamProgressListener:
    """StreamingQueryListener adapter: forwards each micro-batch's
    progress (rows/sec, batch duration, state rows) to a plain callback
    — the streaming half of the live-progress surface. Register/remove
    via ``attach``/``detach``; events arrive on Spark's listener bus
    thread while the query runs."""

    def __init__(self, fn):
        from pyspark.sql.streaming import StreamingQueryListener

        outer_fn = fn

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                outer_fn(
                    {
                        "query_id": str(p.id),
                        "batch_id": int(p.batchId),
                        "num_input_rows": int(p.numInputRows),
                        "batch_duration_ms": int(p.batchDuration),
                    }
                )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self._listener = _L()

    def attach(self, spark: SparkSession) -> "StreamProgressListener":
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self._listener)
