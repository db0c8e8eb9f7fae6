"""Submission-builder tests (hdfs/job_test.go analog: offline argv/body
construction checks)."""

from __future__ import annotations

import json

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


class _StubTransport:
    """Scripted (method, url) -> (status, body) transport; records calls."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []

    def __call__(self, method, url, body, headers):
        import json as _json

        try:
            parsed = _json.loads(body) if body else None
        except (ValueError, UnicodeDecodeError):
            parsed = body  # raw media upload bytes
        self.calls.append((method, url, parsed, headers))
        status, resp = self.script.pop(0)
        return status, json.dumps(resp).encode() if isinstance(resp, dict) else resp


def test_dataproc_client_submit_and_wait_real_client_stubbed_transport():
    """r3 'What's missing' #2, closed: the REAL client executes the
    submit + poll state machine end-to-end; only the socket is stubbed.
    Includes a mid-poll 503 (retried, reference dataproc/job.go:126-142)
    and bearer-token injection."""
    from gomrjob_spark.gcp import DataprocClient
    from gomrjob_spark.submit import SubmitConfig

    t = _StubTransport(
        [
            (200, {"reference": {"jobId": "j-123"}}),
            (200, {"status": {"state": "PENDING"}}),
            (503, {"error": "unavailable"}),
            (200, {"status": {"state": "RUNNING"}}),
            (200, {"status": {"state": "DONE"}}),
        ]
    )
    c = DataprocClient("proj", "us-central1", transport=t, token_provider=lambda: "tok")
    job_id = c.submit(SubmitConfig(app_file="gs://b/job.py"), cluster="cl")
    assert job_id == "j-123"
    method, url, body, headers = t.calls[0]
    assert (method, url) == (
        "POST",
        "https://dataproc.googleapis.com/v1/projects/proj/regions/us-central1/jobs:submit",
    )
    assert body["job"]["pysparkJob"]["mainPythonFileUri"] == "gs://b/job.py"
    assert headers["Authorization"] == "Bearer tok"

    assert c.wait(job_id, sleep=lambda s: None) == "DONE"
    assert all(m == "GET" and url.endswith("/jobs/j-123") for m, url, _, _ in t.calls[1:])


def test_dataproc_client_error_state_raises():
    from gomrjob_spark.gcp import DataprocClient
    from gomrjob_spark.submit import DataprocJobError

    t = _StubTransport([(200, {"status": {"state": "ERROR"}})])
    c = DataprocClient("p", "r", transport=t, token_provider=lambda: "tok")
    with pytest.raises(DataprocJobError):
        c.wait("j-9", sleep=lambda s: None)


def test_gcs_list_objects_follows_next_page_token():
    """storage.go:71-99 pagination parity: a 2-page listing is walked via
    nextPageToken; the second request carries the token."""
    from gomrjob_spark.gcp import GcsClient

    t = _StubTransport(
        [
            (200, {"items": [{"name": "p/a"}, {"name": "p/b"}], "nextPageToken": "T2"}),
            (200, {"items": [{"name": "p/c"}]}),
        ]
    )
    c = GcsClient(transport=t, token_provider=lambda: "tok")
    names = [o["name"] for o in c.list_objects("bkt", "p/")]
    assert names == ["p/a", "p/b", "p/c"]
    assert "pageToken" not in t.calls[0][1]
    assert "pageToken=T2" in t.calls[1][1]


def test_gcs_delete_prefix_paginated_and_guarded():
    """The listing is fully materialized BEFORE the first delete
    (ADVICE r4: deleting mid-pagination can shift a deletion-sensitive
    page token and skip objects), then every listed object is deleted."""
    from gomrjob_spark.gcp import GcsClient

    t = _StubTransport(
        [
            (200, {"items": [{"name": "tmp/x"}], "nextPageToken": "T"}),
            (200, {"items": [{"name": "tmp/y"}]}),
            (204, b""),
            (204, b""),
        ]
    )
    c = GcsClient(transport=t, token_provider=lambda: "tok")
    assert c.delete_prefix("bkt", "tmp/") == 2
    methods = [m for m, _, _, _ in t.calls]
    assert methods == ["GET", "GET", "DELETE", "DELETE"]
    deletes = [u for m, u, _, _ in t.calls if m == "DELETE"]
    assert [u.rsplit("/o/", 1)[1] for u in deletes] == ["tmp%2Fx", "tmp%2Fy"]
    with pytest.raises(ValueError):
        c.delete_prefix("bkt", "")


def test_gcp_non_2xx_raises_with_body():
    from gomrjob_spark.gcp import GcsClient

    t = _StubTransport([(403, {"error": "forbidden"})])
    c = GcsClient(transport=t, token_provider=lambda: "tok")
    with pytest.raises(RuntimeError, match="403"):
        list(c.list_objects("bkt", "p/"))


def test_gcs_put_object_media_upload():
    """storage.go Insert parity: media upload hits the upload endpoint
    with the raw bytes and the caller's content type."""
    from gomrjob_spark.gcp import GcsClient

    t = _StubTransport([(200, {"name": "dir/obj.bin", "size": "4"})])
    c = GcsClient(transport=t, token_provider=lambda: "tok")
    resp = c.put_object("bkt", "dir/obj.bin", b"\x01\x02\x03\x04")
    assert resp["name"] == "dir/obj.bin"
    method, url, body, headers = t.calls[0]
    assert method == "POST"
    assert url.startswith("https://storage.googleapis.com/upload/storage/v1/b/bkt/o?")
    assert "uploadType=media" in url and "name=dir%2Fobj.bin" in url
    assert headers["Content-Type"] == "application/octet-stream"
