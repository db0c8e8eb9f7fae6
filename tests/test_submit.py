"""Submission-builder tests (hdfs/job_test.go analog: offline argv/body
construction checks)."""

from __future__ import annotations

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
