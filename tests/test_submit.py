"""Submission-builder tests (hdfs/job_test.go analog: offline argv/body
construction checks)."""

from __future__ import annotations

import pytest

from gomrjob_spark.submit import SubmitConfig, build_dataproc_job, build_spark_submit


def test_spark_submit_argv_full():
    cfg = SubmitConfig(
        app_file="gs://bucket/job.py",
        app_args=["--input", "gs://bucket/in/*", "--output", "gs://bucket/out"],
        name="wordcount",
        master="yarn",
        py_files=["gs://bucket/pkg.zip"],
        files=["gs://bucket/side.json"],
        conf={"spark.sql.shuffle.partitions": "2000"},
        executor_cores=4,
        executor_memory="8g",
    )
    argv = build_spark_submit(cfg)
    assert argv[0] == "spark-submit"
    assert argv[argv.index("--master") + 1] == "yarn"
    assert argv[argv.index("--deploy-mode") + 1] == "cluster"
    assert argv[argv.index("--py-files") + 1] == "gs://bucket/pkg.zip"
    assert "--conf" in argv
    assert "spark.sql.shuffle.partitions=2000" in argv
    # dynamic allocation defaulted on
    assert "spark.dynamicAllocation.enabled=true" in argv
    # app file before its args, at the end
    assert argv[-5:] == [
        "gs://bucket/job.py", "--input", "gs://bucket/in/*", "--output", "gs://bucket/out",
    ]


def test_spark_submit_local_has_no_deploy_mode():
    argv = build_spark_submit(SubmitConfig(app_file="job.py", master="local[4]"))
    assert "--deploy-mode" not in argv


def test_dataproc_body():
    cfg = SubmitConfig(
        app_file="gs://bucket/job.py",
        app_args=["--step", "0"],
        py_files=["gs://bucket/pkg.zip"],
        conf={"spark.executor.memory": "8g"},
    )
    body = build_dataproc_job(cfg, project="p", region="us-central1", cluster="c")
    job = body["job"]
    assert job["reference"]["projectId"] == "p"
    assert job["placement"]["clusterName"] == "c"
    py = job["pysparkJob"]
    assert py["mainPythonFileUri"] == "gs://bucket/job.py"
    assert py["args"] == ["--step", "0"]
    assert py["pythonFileUris"] == ["gs://bucket/pkg.zip"]
    assert py["properties"]["spark.executor.memory"] == "8g"


# ---------------------------------------------------------------------------
# Dataproc poll state machine (dataproc/job.go:62-142) — offline, with an
# injected fetcher/sleeper, the analog of the reference's own job tests.
# ---------------------------------------------------------------------------

from gomrjob_spark.submit import (  # noqa: E402
    DataprocJobError,
    DataprocUnavailableError,
    get_with_retry,
    is_error_state,
    is_terminal_state,
    poll_job,
)


def _scripted_fetch(states):
    it = iter(states)

    def fetch():
        s = next(it)
        if isinstance(s, Exception):
            raise s
        return s

    return fetch


def test_poll_pending_running_done():
    fetch = _scripted_fetch(["PENDING", "SETUP_DONE", "RUNNING", "RUNNING", "DONE"])
    sleeps, logs = [], []
    out = poll_job(fetch, "j1", sleep=sleeps.append, log=logs.append, max_polls=10)
    assert out == "DONE"
    # 2 s tick before every poll (dataproc/job.go:95-97)
    assert sleeps == [2.0] * 5
    # logged on every state change, not on the repeated RUNNING
    assert logs == [
        "job:j1 status:PENDING",
        "job:j1 status:SETUP_DONE",
        "job:j1 status:RUNNING",
        "job:j1 status:DONE",
    ]


def test_poll_error_state_raises():
    fetch = _scripted_fetch(["PENDING", "RUNNING", "ERROR"])
    with pytest.raises(DataprocJobError, match="job:j2 finished with status:ERROR"):
        poll_job(fetch, "j2", sleep=lambda s: None, max_polls=10)


def test_poll_cancelled_and_attempt_failure_are_errors():
    for bad in ("CANCELLED", "ATTEMPT_FAILURE"):
        with pytest.raises(DataprocJobError):
            poll_job(_scripted_fetch([bad]), "j", sleep=lambda s: None, max_polls=5)


def test_poll_heartbeat_log_every_15_ticks():
    fetch = _scripted_fetch(["RUNNING"] * 31 + ["DONE"])
    logs = []
    poll_job(fetch, "j3", sleep=lambda s: None, log=logs.append, max_polls=40)
    # first RUNNING + ticks 15 and 30 heartbeats + DONE
    assert logs == ["job:j3 status:RUNNING"] * 3 + ["job:j3 status:DONE"]


def test_get_with_retry_503_then_success():
    fetch = _scripted_fetch(
        [DataprocUnavailableError("503"), DataprocUnavailableError("503"), "RUNNING"]
    )
    sleeps = []
    assert get_with_retry(fetch, sleep=sleeps.append) == "RUNNING"
    # 10 s between retries (dataproc/job.go:133-137)
    assert sleeps == [10.0, 10.0]


def test_get_with_retry_gives_up_after_5():
    fetch = _scripted_fetch([DataprocUnavailableError("503")] * 5)
    with pytest.raises(DataprocUnavailableError):
        get_with_retry(fetch, sleep=lambda s: None)


def test_get_with_retry_non_503_propagates_immediately():
    calls = []

    def fetch():
        calls.append(1)
        raise RuntimeError("hard failure")

    with pytest.raises(RuntimeError, match="hard failure"):
        get_with_retry(fetch, sleep=lambda s: None)
    assert len(calls) == 1  # no retry for non-503 (dataproc/job.go:138-140)


def test_poll_retries_503_within_a_tick():
    fetch = _scripted_fetch(
        ["RUNNING", DataprocUnavailableError("503"), "DONE"]
    )
    out = poll_job(fetch, "j4", sleep=lambda s: None, max_polls=10)
    assert out == "DONE"


def test_state_predicates():
    assert all(is_terminal_state(s) for s in ("DONE", "ERROR", "CANCELLED", "ATTEMPT_FAILURE"))
    assert not is_terminal_state("RUNNING")
    assert all(is_error_state(s) for s in ("ERROR", "CANCELLED", "ATTEMPT_FAILURE"))
    assert not is_error_state("DONE")
