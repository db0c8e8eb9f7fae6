"""Replay idempotence of the foreachBatch parquet sink
(streaming.ops.run_to_parquet + rewind_last_commit).

The driver gate pins table==batch-truth after a forced replay; these
tests pin the mechanics: the rewind genuinely causes a batch replay,
the idempotent sink makes the replay a no-op, and — the negative
control — a naive APPEND sink under the identical failure duplicates
rows, proving the harness detects a broken sink."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from gomrjob_spark.streaming import rewind_last_commit, run_to_parquet


def _setup_input(spark, base: str):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.select("doc_id", "text").repartition(4, "doc_id").write.parquet(
        f"{base}/in"
    )
    return spark.read.parquet(f"{base}/in").schema


def _stream(spark, base: str, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
        .select("doc_id", F.length("text").alias("n_chars"))
    )


def _run(spark, base, schema, out, ckpt):
    q = run_to_parquet(_stream(spark, base, schema), out, ckpt)
    q.stop()
    q.awaitTermination()


def test_rewind_causes_a_real_replay_and_table_is_unchanged(spark):
    base = tempfile.mkdtemp(prefix="replay_test_")
    schema = _setup_input(spark, base)
    out, ckpt = f"{base}/out", f"{base}/ckpt"
    _run(spark, base, schema, out, ckpt)
    before = sorted(
        (r["doc_id"], r["n_chars"], r["batch_id"])
        for r in spark.read.parquet(out).collect()
    )
    n_batches = len(
        [f for f in os.listdir(f"{ckpt}/commits") if f.isdigit()]
    )
    assert n_batches >= 4  # maxFilesPerTrigger=1 over 4 input files

    replayed = rewind_last_commit(ckpt)
    assert not os.path.exists(f"{ckpt}/commits/{replayed}")
    _run(spark, base, schema, out, ckpt)
    # the replayed batch re-committed...
    assert os.path.exists(f"{ckpt}/commits/{replayed}")
    # ...and the table is EXACTLY what it was: same rows, same batch
    # placement, no duplicates
    after = sorted(
        (r["doc_id"], r["n_chars"], r["batch_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert after == before
    dupes = (
        spark.read.parquet(out)
        .groupBy("doc_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0


def test_negative_control_append_sink_duplicates_under_replay(spark):
    """The same failure against a NON-idempotent sink (plain append, no
    per-batch-id overwrite) duplicates the replayed batch's rows — the
    broken-sink signature the idempotent design exists to prevent, and
    the proof that this harness would catch it."""
    base = tempfile.mkdtemp(prefix="replay_test_append_")
    schema = _setup_input(spark, base)
    out, ckpt = f"{base}/out", f"{base}/ckpt"

    def run_append():
        def write_batch(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            _stream(spark, base, schema)
            .writeStream.outputMode("append")
            .foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    run_append()
    n_before = spark.read.parquet(out).count()
    rewind_last_commit(ckpt)
    run_append()
    dup_docs = (
        spark.read.parquet(out)
        .groupBy("doc_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert spark.read.parquet(out).count() > n_before
    assert dup_docs > 0


def test_rewind_refuses_empty_checkpoint(tmp_path):
    os.makedirs(tmp_path / "commits")
    import pytest

    with pytest.raises(ValueError, match="no commits"):
        rewind_last_commit(str(tmp_path))
