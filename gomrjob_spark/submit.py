"""Cluster submission builders (SURVEY.md §2E).

Reference parity: gomrjob builds a ``hadoop jar streaming.jar -D k=v
-files ... -mapper "exe --stage=mapper" ...`` argv and execs it
(hdfs/job.go:45-107), or POSTs a Dataproc HadoopJob and polls
(dataproc/job.go:17-142). The Spark analog is a ``spark-submit`` argv
(YARN/k8s/standalone) or a Dataproc *PySpark* job body. These builders are
pure functions over a config dataclass — the submission itself is
``subprocess.run(argv)`` or a ``gcloud``/REST call by the caller, so the
construction logic is unit-testable offline exactly like the reference's
(hdfs/job_test.go, dataproc job body construction).

The self-shipping concern (runner.go:201-237 uploads /proc/self/exe) is
inherently simpler in PySpark: the job file plus ``--py-files`` archives
ship the code; closures serialize themselves.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SubmitConfig:
    """What a job needs to run on a cluster — the Runner-flags analog
    (runner.go:48-65)."""

    app_file: str
    app_args: list[str] = field(default_factory=list)
    name: str = "gomrjob_spark_job"
    master: str = "yarn"  # yarn | k8s://... | spark://... | local[N]
    deploy_mode: str = "cluster"
    py_files: list[str] = field(default_factory=list)  # --py-files (sc.addFile analog)
    files: list[str] = field(default_factory=list)  # side files (runner.go:57 Files)
    conf: dict[str, str] = field(default_factory=dict)  # -D k=v analog (hdfs/job.go:60-66)
    executor_cores: int | None = None
    executor_memory: str | None = None
    num_executors: int | None = None  # ReducerTasks-era knob; prefer dynamic allocation
    dynamic_allocation: bool = True


def build_spark_submit(cfg: SubmitConfig) -> list[str]:
    """``spark-submit`` argv for YARN/k8s/standalone (hdfs/job.go:72-107
    analog, minus the streaming-jar discovery that Spark obsoletes)."""
    argv = [
        "spark-submit",
        "--name", cfg.name,
        "--master", cfg.master,
    ]
    if cfg.master != "local" and not cfg.master.startswith("local["):
        argv += ["--deploy-mode", cfg.deploy_mode]
    if cfg.py_files:
        argv += ["--py-files", ",".join(cfg.py_files)]
    if cfg.files:
        argv += ["--files", ",".join(cfg.files)]
    if cfg.executor_cores:
        argv += ["--executor-cores", str(cfg.executor_cores)]
    if cfg.executor_memory:
        argv += ["--executor-memory", cfg.executor_memory]
    if cfg.num_executors:
        argv += ["--num-executors", str(cfg.num_executors)]
    conf = dict(cfg.conf)
    if cfg.dynamic_allocation and "spark.dynamicAllocation.enabled" not in conf:
        conf["spark.dynamicAllocation.enabled"] = "true"
    for k in sorted(conf):
        argv += ["--conf", f"{k}={conf[k]}"]
    argv.append(cfg.app_file)
    argv += cfg.app_args
    return argv


def build_dataproc_job(
    cfg: SubmitConfig,
    project: str,
    region: str,
    cluster: str,
    bucket: str | None = None,
) -> dict:
    """Dataproc ``jobs:submit`` request body with a PySparkJob — the
    reference submitted a HadoopJob running the streaming jar
    (dataproc/job.go:35-60); the Spark-native equivalent runs the job
    file directly. POST to
    ``https://dataproc.googleapis.com/v1/projects/{project}/regions/{region}/jobs:submit``
    and poll jobs.get until DONE/ERROR/CANCELLED (dataproc/job.go:62-116);
    retry 503s (dataproc/job.go:126-142)."""
    job: dict = {
        "reference": {"projectId": project},
        "placement": {"clusterName": cluster},
        "pysparkJob": {
            "mainPythonFileUri": cfg.app_file,
            "args": list(cfg.app_args),
            "pythonFileUris": list(cfg.py_files),
            "fileUris": list(cfg.files),
            "properties": dict(cfg.conf),
        },
    }
    if bucket:
        job["pysparkJob"]["properties"].setdefault(
            "spark.hadoop.fs.gs.system.bucket", bucket
        )
    return {"job": job}


#: terminal states of the Dataproc poll loop (dataproc/job.go:26-33)
DATAPROC_TERMINAL_STATES = ("DONE", "ERROR", "CANCELLED", "ATTEMPT_FAILURE")

#: terminal states that mean failure (dataproc/job.go:17-24)
DATAPROC_ERROR_STATES = ("ERROR", "CANCELLED", "ATTEMPT_FAILURE")


def is_terminal_state(state: str) -> bool:
    """dataproc/job.go:26-33."""
    return state in DATAPROC_TERMINAL_STATES


def is_error_state(state: str) -> bool:
    """dataproc/job.go:17-24."""
    return state in DATAPROC_ERROR_STATES


class DataprocUnavailableError(Exception):
    """A 503 from the jobs API — transient, retried (dataproc/job.go:118-124)."""


class DataprocJobError(RuntimeError):
    """Job reached a terminal error state (dataproc/job.go:108-113)."""

    def __init__(self, job_id: str, state: str):
        super().__init__(f"job:{job_id} finished with status:{state}")
        self.job_id = job_id
        self.state = state


def get_with_retry(fetch, sleep=None, attempts: int = 5, retry_delay: float = 10.0):
    """Call ``fetch()`` retrying 503s up to ``attempts`` times with
    ``retry_delay`` between tries (dataproc/job.go:126-142: 5 tries, 10 s
    sleep, non-503 errors propagate immediately).

    ``fetch`` raises :class:`DataprocUnavailableError` for a 503;
    ``sleep`` is injectable for offline tests."""
    import time as _time

    sleep = sleep if sleep is not None else _time.sleep
    last: DataprocUnavailableError | None = None
    for i in range(attempts):
        try:
            return fetch()
        except DataprocUnavailableError as e:  # noqa: PERF203 — mirror of the Go loop
            last = e
            if i < attempts - 1:
                sleep(retry_delay)
    assert last is not None
    raise last


def poll_job(
    fetch_state,
    job_id: str,
    sleep=None,
    log=None,
    poll_interval: float = 2.0,
    log_every_ticks: int = 15,
    max_polls: int | None = None,
) -> str:
    """Poll ``fetch_state() -> state`` until a terminal state, mirroring
    the reference's loop (dataproc/job.go:94-116): 2 s tick; log on state
    change or every 15 ticks (~30 s); 503s inside a poll retried by
    :func:`get_with_retry`; terminal error states raise
    :class:`DataprocJobError`, DONE returns.

    Pure state machine — ``fetch_state``/``sleep``/``log`` are injected so
    the transitions are unit-testable offline, the way the reference's own
    job tests drive it. ``max_polls`` guards test harnesses (None = poll
    forever, the reference's behavior)."""
    import time as _time

    sleep = sleep if sleep is not None else _time.sleep
    log = log if log is not None else (lambda msg: None)
    state: str | None = None
    i = 0
    while max_polls is None or i < max_polls:
        sleep(poll_interval)
        i += 1
        new_state = get_with_retry(fetch_state, sleep=sleep)
        if state != new_state or i % log_every_ticks == 0:
            state = new_state
            log(f"job:{job_id} status:{state}")
        if is_terminal_state(new_state):
            if is_error_state(new_state):
                raise DataprocJobError(job_id, new_state)
            return new_state
    raise TimeoutError(f"job:{job_id} not terminal after {max_polls} polls")
