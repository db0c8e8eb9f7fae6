"""Streaming operator tests beyond the oracle-gated queries: the
watermark-bounded dedup variant and the foreachBatch parquet sink."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gomrjob_spark.streaming import (
    read_events_stream,
    run_to_memory,
    run_to_parquet,
    streaming_dedup_within_watermark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_dedup_within_watermark_suppresses_in_window_dups(spark):
    """The doubled stream arrives in ONE micro-batch (availableNow over
    one file), so every duplicate is within the watermark and must be
    suppressed — counts equal the un-doubled batch table."""
    doubled = read_events_stream(spark, SF_DIR).unionByName(
        read_events_stream(spark, SF_DIR)
    )
    deduped = streaming_dedup_within_watermark(doubled, watermark="10 years")
    counts = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q, name = run_to_memory(counts, mode="complete")
    try:
        got = {r.event_type: r.n for r in spark.table(name).collect()}
    finally:
        q.stop()

    from gomrjob_spark.catalog import load_table

    want = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_run_to_parquet_sink(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, SF_DIR).select("event_id", "event_type")
    q = run_to_parquet(stream, out, ckpt)
    try:
        back = spark.read.parquet(out)
        from gomrjob_spark.catalog import load_table

        assert back.count() == load_table(spark, SF_DIR, "events").count()
        # batch_id is the sink's idempotency partition column
        assert set(back.columns) == {"event_id", "event_type", "batch_id"}
    finally:
        q.stop()


def test_run_to_parquet_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: simulate a post-failure replay by
    wiping the checkpoint and re-running against the same output path —
    batches re-fire with the same batch ids and must overwrite their own
    partitions, not append duplicates (ADVICE r1)."""
    import shutil

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = read_events_stream(spark, SF_DIR).select("event_id", "event_type")
        q = run_to_parquet(stream, out, ckpt)
        q.stop()

    run_once()
    first = spark.read.parquet(out).count()
    shutil.rmtree(ckpt)  # lose the checkpoint -> full replay
    run_once()
    assert spark.read.parquet(out).count() == first
