"""Source/sink/filesystem layer tests (SURVEY.md §2D).

Path resolution mirrors the reference's table test (hdfs/job_test.go:8-27);
the roundtrip + fs-verb tests replace its `hadoop fs -ls` transcript
parsing test (hdfs/hadoop_test.go:9-27) with live FileSystem calls.
"""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from gomrjob_spark.sources import (
    FsOps,
    read_lines,
    read_text_dir,
    resolve_path,
    write_part_files,
    write_tsv_part_files,
)


@pytest.mark.parametrize(
    "path,default_proto,expected",
    [
        ("hdfs://namenode/a/b", "file://", "hdfs://namenode/a/b"),
        ("s3a://bucket/a", "file://", "s3a://bucket/a"),
        ("s3://bucket/a", "file://", "s3a://bucket/a"),
        ("gs://bucket/a", "file://", "gs://bucket/a"),
        ("file:///tmp/x", "file://", "file:///tmp/x"),
        ("/tmp/x", "file://", "file:///tmp/x"),
        ("/user/me/data", "gs://bucket", "gs://bucket/user/me/data"),
        ("/user/me/data", "hdfs://", "hdfs://user/me/data"),
    ],
)
def test_resolve_path(path, default_proto, expected):
    assert resolve_path(path, default_proto) == expected


def test_read_lines_text_and_gzip(spark, tmp_path):
    plain = tmp_path / "a.txt"
    plain.write_text("one\ntwo\n\nthree\n")
    gz = tmp_path / "b.txt.gz"
    with gzip.open(gz, "wt") as f:
        f.write("four\nfive\n")
    df = read_lines(spark, str(tmp_path / "*.txt*"))
    got = sorted(r.value for r in df.collect())
    # empty line dropped (RawInputProtocol skip-empties parity)
    assert got == ["five", "four", "one", "three", "two"]


def test_part_file_roundtrip_gzip(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.range(100).select(F.concat(F.lit("line-"), F.col("id")).alias("value"))
    write_part_files(df, out, compress=True, num_files=2)
    files = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(files) == 2
    assert all(f.endswith(".gz") for f in files)
    back = read_text_dir(spark, out)
    assert back.count() == 100


def test_tsv_sink_sorted(spark, tmp_path):
    out = str(tmp_path / "kv")
    df = spark.createDataFrame(
        [("b", 2), ("a", 1), ("c", 3)], "key string, value int"
    )
    write_tsv_part_files(df, out, num_files=1, sorted_output=True)
    back = read_text_dir(spark, out)
    assert [r.value for r in back.collect()] == ["a\t1", "b\t2", "c\t3"]


def test_fs_verbs(spark, tmp_path):
    fs = FsOps(spark)
    d = str(tmp_path / "dir")
    assert fs.mkdir(d)
    assert fs.exists(d)

    local = tmp_path / "side.txt"
    local.write_text("side-data")
    fs.put(str(local), d + "/side.txt")
    assert fs.exists(d + "/side.txt")
    assert fs.cat(d + "/side.txt") == "side-data"

    entries = fs.ls(d)
    assert len(entries) == 1
    assert entries[0].path.endswith("side.txt")
    assert entries[0].size == len("side-data")
    assert not entries[0].is_dir

    assert fs.copy(d + "/side.txt", d + "/side2.txt")
    assert fs.move(d + "/side2.txt", d + "/side3.txt")
    assert not fs.exists(d + "/side2.txt")
    assert fs.remove(d + "/side3.txt")
    assert fs.rmr(d)
    assert not fs.exists(d)
    assert fs.rmr(d) is False  # absent path: False, no raise
