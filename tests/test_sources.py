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


def test_partitioned_write_prunes_scan(spark, sf_dir, tmp_path):
    """Partition pruning is THE scale lever for layout: a filter on the
    partition column must reach the scan as a PartitionFilter (directory
    pruning — non-matching files never open), not a post-scan Filter."""
    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.sources import read_table, write_partitioned

    out = str(tmp_path / "events_by_type")
    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    write_partitioned(events, out, partition_by=["event_type"])

    back = read_table(spark, out)
    one_type = back.filter(F.col("event_type") == "click")
    plan = one_type._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate must appear inside PartitionFilters, and the
    # data filter list must not carry it (pruning, not row filtering)
    pf = plan[plan.index("PartitionFilters") :].splitlines()[0]
    assert "event_type" in pf
    # pruned read returns exactly the partition's rows
    expected = events.filter(F.col("event_type") == "click").count()
    assert one_type.count() == expected > 0


def test_partitioned_roundtrip_schema(spark, tmp_path):
    from gomrjob_spark.sources import read_table, write_partitioned

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)], "id long, cat string, v double"
    )
    out = str(tmp_path / "part_tbl")
    write_partitioned(df, out, partition_by=["cat"])
    back = read_table(spark, out)
    assert set(back.columns) == {"id", "cat", "v"}
    assert back.count() == 3
    assert sorted(r.cat for r in back.select("cat").distinct().collect()) == ["a", "b"]


def test_csv_roundtrip(spark, tmp_path):
    from gomrjob_spark.sources import read_csv, write_csv

    df = spark.createDataFrame(
        [(1, "x,with,commas", 1.5), (2, None, -2.0)], "id long, s string, v double"
    )
    out = str(tmp_path / "csv_tbl")
    write_csv(df, out)
    back = read_csv(spark, out, schema="id long, s string, v double")
    rows = {r.id: (r.s, r.v) for r in back.collect()}
    assert rows == {1: ("x,with,commas", 1.5), 2: (None, -2.0)}


def test_orc_roundtrip(spark, tmp_path):
    from gomrjob_spark.sources import read_table

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = str(tmp_path / "orc_tbl")
    df.write.mode("overwrite").orc(out)
    back = read_table(spark, out, fmt="orc")
    assert back.count() == 2
    assert set(back.columns) == {"id", "s"}


def test_range_clustered_write_has_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """Range clustering must yield files with non-overlapping min/max on
    the cluster column (checked from the parquet footers) — that's the
    property that lets a time predicate prune to one file at scale."""
    import pyarrow.parquet as pq

    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.sources.tables import write_range_clustered

    out = str(tmp_path / "events_by_ts")
    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    write_range_clustered(events, out, cluster_by=["event_id"], num_files=8)

    ranges = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "event_id"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4  # range partitioner actually fanned out
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, f"overlapping file ranges: ({lo_a},{hi_a}) vs ({lo_b},{hi_b})"
    # and the data survived intact
    back = spark.read.parquet(out)
    assert back.count() == events.count()


def test_delete_prefix_contract(spark, tmp_path):
    """storage.go:113-133 DeletePrefix contract against file:// —
    flat-prefix (not directory) semantics: `/a/b` removes file b,
    sibling bc, and subtree b/...; unrelated siblings survive; empty and
    root prefixes are refused; no match is a 0-count no-op."""
    import pytest

    fs = FsOps(spark)
    base = tmp_path / "objs"
    (base / "b").mkdir(parents=True)
    (base / "b" / "nested.txt").write_text("n")
    (base / "bc.txt").write_text("sibling starting with b")
    (base / "keep.txt").write_text("unrelated")

    n = fs.delete_prefix(str(base / "b"))
    assert n == 2  # the dir `b` (recursively) and the file `bc.txt`
    assert not (base / "b").exists() and not (base / "bc.txt").exists()
    assert (base / "keep.txt").exists()

    # trailing slash scopes to children: parent dir itself survives
    (base / "d").mkdir()
    (base / "d" / "x.txt").write_text("x")
    (base / "d" / "y.txt").write_text("y")
    assert fs.delete_prefix(str(base / "d") + "/") == 2
    assert (base / "d").exists() and not (base / "d" / "x.txt").exists()

    # no match -> 0, no error (reference returns nil on empty list)
    assert fs.delete_prefix(str(base / "zzz")) == 0

    # guard: empty / root prefixes refused
    for bad in ("", "/", "file:///"):
        with pytest.raises(ValueError, match="refusing"):
            fs.delete_prefix(bad)


def test_compact_small_files_preserves_rows_and_merges(spark, tmp_path):
    """The incremental-sink housekeeping op: a 64-file fragmented dataset
    compacts to the byte-target file count with identical content; with
    cluster_by, the rewrite is range-clustered."""
    from pyspark.sql import functions as F

    from gomrjob_spark.sources.tables import compact_small_files, dataset_stats

    path = str(tmp_path / "frag")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    )
    df.repartition(64).write.parquet(path)
    before = dataset_stats(spark, path)
    assert before["n_files"] == 64
    want = sorted(r.id for r in spark.read.parquet(path).collect())

    stats = compact_small_files(spark, path, target_file_bytes=before["total_bytes"] // 4 + 1)
    assert stats["after"]["n_files"] <= 4
    assert stats["after"]["n_rows"] == stats["before"]["n_rows"] == 10_000
    got = sorted(r.id for r in spark.read.parquet(path).collect())
    assert got == want

    # clustered rewrite: files cover disjoint id ranges
    compact_small_files(
        spark, path, target_file_bytes=before["total_bytes"] // 8 + 1, cluster_by=["id"]
    )
    import pyarrow.parquet as pq
    import os as _os

    ranges = []
    for f in sorted(_os.listdir(path)):
        if f.startswith(("_", ".")) or not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(_os.path.join(path, f))
        lo = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    ranges.sort()
    assert all(a[1] <= b[0] for a, b in zip(ranges, ranges[1:])), ranges


def test_compact_small_files_crash_mid_swap_never_loses_data(spark, tmp_path, monkeypatch):
    """r4 verdict #3: the swap used to be rmr(live) then move(tmp) — a
    crash between them lost the dataset. Now it is move-aside →
    move-in → delete-old; interrupt the sequence at EVERY rename/delete
    boundary and assert a full copy of the data always exists at the
    canonical path or at the documented ._compact_old recovery path."""
    from pyspark.sql import functions as F

    from gomrjob_spark.sources import fs as fsmod
    from gomrjob_spark.sources.tables import compact_small_files

    def rows_at(p):
        try:
            return sorted(r.id for r in spark.read.parquet(p).collect())
        except Exception:
            return None

    want = None
    for fail_at in (1, 2, 3):  # 1: move-aside, 2: move-in, 3: delete-old
        path = str(tmp_path / f"ds_{fail_at}")
        df = spark.range(1_000).select(F.col("id"), (F.col("id") % 7).alias("k"))
        df.repartition(16).write.parquet(path)
        want = sorted(r.id for r in spark.read.parquet(path).collect())

        calls = {"n": 0}
        real_move, real_rmr = fsmod.FsOps.move, fsmod.FsOps.rmr

        def crashing_move(self, src, dst, _real=real_move):
            calls["n"] += 1
            if calls["n"] == fail_at:
                raise RuntimeError("simulated crash")
            return _real(self, src, dst)

        def crashing_rmr(self, p, _real=real_rmr):
            calls["n"] += 1
            if calls["n"] == fail_at:
                raise RuntimeError("simulated crash")
            return _real(self, p)

        monkeypatch.setattr(fsmod.FsOps, "move", crashing_move)
        monkeypatch.setattr(fsmod.FsOps, "rmr", crashing_rmr)
        try:
            with pytest.raises(RuntimeError, match="simulated crash"):
                compact_small_files(spark, path, target_file_bytes=1 << 30)
        finally:
            monkeypatch.setattr(fsmod.FsOps, "move", real_move)
            monkeypatch.setattr(fsmod.FsOps, "rmr", real_rmr)

        live = rows_at(path)
        old = rows_at(path + "._compact_old")
        assert live == want or old == want, (
            f"fail_at={fail_at}: no recoverable copy (live={live is not None}, "
            f"old={old is not None})"
        )

    # a leftover ._compact_old blocks the next run with a clear error
    path = str(tmp_path / "ds_guard")
    spark.range(100).write.parquet(path)
    spark.range(1).write.parquet(path + "._compact_old")
    with pytest.raises(RuntimeError, match="crashed mid-swap"):
        compact_small_files(spark, path, target_file_bytes=1 << 30)


def test_merge_upsert_semantics(spark, tmp_path):
    """MERGE semantics on a plain-files dataset: matched keys replaced,
    unmatched inserted, delete-flagged keys removed, everything else
    untouched — and updates must be able to carry the same schema."""
    from pyspark.sql import functions as F

    from gomrjob_spark.sources.tables import merge_upsert

    path = str(tmp_path / "ds")
    spark.range(10).select(
        F.col("id"), (F.col("id") * 10).alias("v")
    ).write.parquet(path)

    updates = spark.createDataFrame(
        [(3, 999, False), (11, 111, False), (5, 0, True)],
        "id long, v long, is_delete boolean",
    )
    out = merge_upsert(spark, path, updates, ["id"], delete_col="is_delete")
    assert out == {"partitions_rewritten": 1, "rows_upserted": 2, "rows_deleted": 1}

    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    want = {i: i * 10 for i in range(10)}
    want[3] = 999       # replaced
    want[11] = 111      # inserted
    del want[5]         # deleted
    assert got == want


def test_merge_upsert_partition_scoped_rewrites_only_touched(spark, tmp_path):
    """With partition_col, only directories holding updated keys are
    rewritten: the untouched partition's files must be byte-identical
    (same names, same mtimes) after the merge, and a brand-new
    partition value becomes a plain insert."""
    import os

    from pyspark.sql import functions as F

    from gomrjob_spark.sources.tables import merge_upsert, write_partitioned

    path = str(tmp_path / "pds")
    df = spark.range(20).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("src"), (F.col("id") * 10).alias("v")
    )
    write_partitioned(df, path, ["src"])

    def listing(sub):
        d = f"{path}/src={sub}"
        return {f: os.path.getmtime(f"{d}/{f}") for f in os.listdir(d) if not f.startswith((".", "_"))}

    before_untouched = listing("1")
    updates = spark.createDataFrame(
        [(2, "0", 999), (100, "7", 700)], "id long, src string, v long"
    )
    out = merge_upsert(spark, path, updates, ["id"], partition_col="src")
    assert out["partitions_rewritten"] == 2 and out["rows_upserted"] == 2

    assert listing("1") == before_untouched, "untouched partition was rewritten"
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got[2] == 999 and got[100] == 700 and got[3] == 30
    assert len(got) == 21


def test_merge_upsert_crash_mid_swap_never_loses_data(spark, tmp_path, monkeypatch):
    """Same crash-safety posture as compact_small_files: interrupt the
    aside-rename sequence at every boundary; a full copy of the data
    must survive at the canonical path or at ._merge_old."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from gomrjob_spark.sources import fs as fsmod
    from gomrjob_spark.sources.tables import merge_upsert

    def rows_at(p):
        try:
            return sorted(r.id for r in spark.read.parquet(p).collect())
        except Exception:
            return None

    for fail_at in (1, 2, 3):
        path = str(tmp_path / f"mds_{fail_at}")
        spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v")).write.parquet(path)
        want = sorted(r.id for r in spark.read.parquet(path).collect())
        updates = spark.createDataFrame([(1, 42)], "id long, v long")

        calls = {"n": 0}
        real_move, real_rmr = fsmod.FsOps.move, fsmod.FsOps.rmr

        def crashing_move(self, src, dst, _real=real_move):
            calls["n"] += 1
            if calls["n"] == fail_at:
                raise RuntimeError("simulated crash")
            return _real(self, src, dst)

        def crashing_rmr(self, p, _real=real_rmr):
            calls["n"] += 1
            if calls["n"] == fail_at:
                raise RuntimeError("simulated crash")
            return _real(self, p)

        monkeypatch.setattr(fsmod.FsOps, "move", crashing_move)
        monkeypatch.setattr(fsmod.FsOps, "rmr", crashing_rmr)
        try:
            with _pytest.raises(RuntimeError, match="simulated crash"):
                merge_upsert(spark, path, updates, ["id"])
        finally:
            monkeypatch.setattr(fsmod.FsOps, "move", real_move)
            monkeypatch.setattr(fsmod.FsOps, "rmr", real_rmr)

        live, old = rows_at(path), rows_at(path + "._merge_old")
        # the pre-merge key set must survive somewhere (the merge only
        # replaced values for key 1, so the id set is unchanged)
        assert live == want or old == want, f"fail_at={fail_at}: data lost"


def test_merge_upsert_locates_moved_and_deleted_keys(spark, tmp_path):
    """ADVICE r5 (medium): an update's partition value is NOT where the
    key necessarily lives. With the default locate_existing=True, a key
    that moves partitions leaves no stale duplicate behind, and a
    delete whose claimed partition is wrong still removes the stored
    row — the stored locations come from the column-pruned semi-probe
    scan, not from the updates' own partition values."""
    from pyspark.sql import functions as F

    from gomrjob_spark.sources.tables import merge_upsert, write_partitioned

    path = str(tmp_path / "mv")
    df = spark.range(10).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("src"),
        (F.col("id") * 10).alias("v"),
    )
    write_partitioned(df, path, ["src"])

    # key 4 is stored in src=0; the update moves it to src=1.
    # key 6 is stored in src=0; the delete claims src=1 (wrong).
    updates = spark.createDataFrame(
        [(4, "1", 444, False), (6, "1", 0, True)],
        "id long, src string, v long, is_delete boolean",
    )
    out = merge_upsert(
        spark, path, updates, ["id"], partition_col="src", delete_col="is_delete"
    )
    assert out["rows_upserted"] == 1 and out["rows_deleted"] == 1
    # rewritten: src=1 (claimed) and src=0 (stored location of keys 4, 6)
    assert out["partitions_rewritten"] == 2

    rows = spark.read.parquet(path).collect()
    got = {(r.id, str(r.src)): r.v for r in rows}
    assert (4, "1") in got and got[(4, "1")] == 444
    assert (4, "0") not in got, "stale row survived the cross-partition move"
    assert all(r.id != 6 for r in rows), "mislocated delete missed the stored row"
    assert len(rows) == 9  # 10 keys - 1 deleted; the move keeps its single row


def test_merge_upsert_partition_stable_mode_is_deterministic(spark, tmp_path):
    """locate_existing=False documents partition-stability as a hard
    precondition; when the caller violates it anyway, the outcome must
    not depend on what else is in the batch: the anti-join's touched
    keys are scoped per partition, so the stale row always survives —
    it is never removed as a side effect of an unrelated update that
    happens to touch its directory."""
    from pyspark.sql import functions as F

    from gomrjob_spark.sources.tables import merge_upsert, write_partitioned

    path = str(tmp_path / "stable")
    df = spark.range(10).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("src"),
        (F.col("id") * 10).alias("v"),
    )
    write_partitioned(df, path, ["src"])

    # key 4 "moves" to src=1 (precondition violation) WHILE an
    # unrelated update (key 0) rewrites src=0, where key 4's old row is
    updates = spark.createDataFrame(
        [(4, "1", 444), (0, "0", 111)], "id long, src string, v long"
    )
    merge_upsert(
        spark, path, updates, ["id"], partition_col="src", locate_existing=False
    )
    got = {(r.id, str(r.src)): r.v for r in spark.read.parquet(path).collect()}
    assert got[(0, "0")] == 111
    assert got[(4, "1")] == 444
    # deterministic violation mode: the stale row SURVIVES even though
    # its partition was rewritten in the same batch
    assert got[(4, "0")] == 40


def test_merge_upsert_rerun_is_idempotent(spark, tmp_path, monkeypatch):
    """The partial-application window, pinned: the per-partition loop
    is not one transaction — interrupt it between partitions, then
    RE-RUN THE SAME MERGE; the rerun completes the unapplied partitions
    and re-running yet again changes nothing (anti-join + union of the
    same updates converges)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from gomrjob_spark.sources import fs as fsmod
    from gomrjob_spark.sources.tables import merge_upsert, write_partitioned

    path = str(tmp_path / "ridem")
    df = spark.range(20).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("src"),
        (F.col("id") * 10).alias("v"),
    )
    write_partitioned(df, path, ["src"])
    updates = spark.createDataFrame(
        [(2, "0", 222), (3, "1", 333)], "id long, src string, v long"
    )

    # crash BEFORE partition src=1 is touched (its exists-probe): the
    # loop has fully merged src=0, src=1 is still pre-merge
    real_exists = fsmod.FsOps.exists

    def crashing_exists(self, p, _real=real_exists):
        if p.rstrip("/").endswith("src=1"):
            raise RuntimeError("simulated crash")
        return _real(self, p)

    monkeypatch.setattr(fsmod.FsOps, "exists", crashing_exists)
    try:
        with _pytest.raises(RuntimeError, match="simulated crash"):
            merge_upsert(spark, path, updates, ["id"], partition_col="src")
    finally:
        monkeypatch.setattr(fsmod.FsOps, "exists", real_exists)

    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got[2] == 222 and got[3] == 30, "expected exactly src=0 merged"

    # recovery = rerun the same merge
    merge_upsert(spark, path, updates, ["id"], partition_col="src")
    after_first = sorted(
        (r.id, str(r.src), r.v) for r in spark.read.parquet(path).collect()
    )
    assert (2, "0", 222) in after_first and (3, "1", 333) in after_first
    assert len(after_first) == 20

    # and a third run is a no-op on content
    merge_upsert(spark, path, updates, ["id"], partition_col="src")
    after_second = sorted(
        (r.id, str(r.src), r.v) for r in spark.read.parquet(path).collect()
    )
    assert after_second == after_first


def test_merge_upsert_keep_latest_is_lww_and_replay_idempotent(spark, tmp_path):
    """keep_latest_by: a late-arriving OLDER version never overwrites a
    newer stored row, a newer update does replace, inserts still land,
    and replaying the same merge changes nothing (the CDC contract)."""
    from pyspark.sql import functions as F

    from gomrjob_spark.sources.tables import merge_upsert

    path = str(tmp_path / "lww")
    spark.createDataFrame(
        [(1, 10, "v10"), (2, 20, "v20")], "id long, ver long, payload string"
    ).write.parquet(path)

    updates = spark.createDataFrame(
        [
            (1, 5, "stale"),    # older than stored ver 10 -> must NOT apply
            (2, 25, "fresh"),   # newer -> replaces
            (3, 1, "insert"),   # new key -> inserts
        ],
        "id long, ver long, payload string",
    )
    merge_upsert(spark, path, updates, ["id"], keep_latest_by=["ver"])
    got = {r.id: (r.ver, r.payload) for r in spark.read.parquet(path).collect()}
    assert got == {1: (10, "v10"), 2: (25, "fresh"), 3: (1, "insert")}

    # replay the SAME merge: content identical (idempotent)
    merge_upsert(spark, path, updates, ["id"], keep_latest_by=["ver"])
    again = {r.id: (r.ver, r.payload) for r in spark.read.parquet(path).collect()}
    assert again == got

    # guard rails
    import pytest as _pytest

    with _pytest.raises(ValueError, match="delete_col"):
        merge_upsert(
            spark, path, updates.withColumn("d", F.lit(False)), ["id"],
            delete_col="d", keep_latest_by=["ver"],
        )


def test_zorder_write_prunes_on_both_columns(spark, sf_dir, tmp_path):
    """Z-order clustering must give footer-stats pruning power on BOTH
    cluster columns: with 16 files each file should cover roughly a
    4x4-grid cell (~1/4 of each column's range), where single-column
    range clustering covers 1/16 of the leading column but ~100% of the
    other. Checked from the parquet footers, like the range-clustered
    disjointness pin."""
    import pyarrow.parquet as pq

    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.sources.tables import (
        write_range_clustered,
        write_zorder_clustered,
    )

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def file_spans(out, col):
        spans, glo, ghi = [], None, None
        for f in sorted(os.listdir(out)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(out, f)).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                c = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
                mins.append(c.statistics.min)
                maxs.append(c.statistics.max)
            spans.append((min(mins), max(maxs)))
            glo = min(glo, min(mins)) if glo is not None else min(mins)
            ghi = max(ghi, max(maxs)) if ghi is not None else max(maxs)
        width = ghi - glo or 1
        return [(hi - lo) / width for lo, hi in spans]

    zout = str(tmp_path / "z")
    write_zorder_clustered(events, zout, ["event_id", "user_id"], num_files=16)
    z_ev = file_spans(zout, "event_id")
    z_us = file_spans(zout, "user_id")
    assert len(z_ev) >= 8  # the range partitioner actually fanned out
    # each file covers a bounded window of BOTH dimensions
    assert sum(z_ev) / len(z_ev) < 0.45, f"event_id spans too wide: {z_ev}"
    assert sum(z_us) / len(z_us) < 0.45, f"user_id spans too wide: {z_us}"

    # contrast: single-column range clustering leaves the OTHER column
    # un-pruned (full-range files)
    rout = str(tmp_path / "r")
    write_range_clustered(events, rout, ["event_id"], num_files=16)
    r_us = file_spans(rout, "user_id")
    assert sum(r_us) / len(r_us) > 0.8, "fixture lost its independence assumption"

    # and the data survives intact
    assert spark.read.parquet(zout).count() == events.count()


def test_partitioned_layout_gets_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Runtime pruning, pinned: a fact table laid out by
    write_partitioned, joined to a dimension filtered on a NON-join
    column, must plan a dynamicpruningexpression inside the scan's
    PartitionFilters — Catalyst derives the partition list from the dim
    side at runtime, so at 100 TB the fact scan opens only partitions
    that can match (static pruning can't see this: the filter is on the
    dim, not the partition column)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.sources import write_partitioned

    out = str(tmp_path / "events_by_type")
    events = load_table(spark, sf_dir, "events").select("event_id", "value", "event_type")
    write_partitioned(events, out, partition_by=["event_type"])

    dim = spark.createDataFrame(
        [("click", 1), ("view", 1), ("purchase", 2), ("signup", 2), ("logout", 3)],
        "event_type string, tier int",
    )
    fact = spark.read.parquet(out)
    j = fact.join(dim.filter(F.col("tier") == 2), "event_type").groupBy(
        "event_type"
    ).count()
    buf = io.StringIO()
    with redirect_stdout(buf):
        j.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruningexpression" in plan.lower(), "DPP did not engage"
    # and the result is right
    got = {r.event_type: r["count"] for r in j.collect()}
    want = {
        r.event_type: r["count"]
        for r in events.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type")
        .count()
        .collect()
    }
    assert got == want and got


def test_compact_with_zorder_restores_multicolumn_clustering(spark, sf_dir, tmp_path):
    """OPTIMIZE ZORDER shape: compacting a fragmented dataset with
    zorder=True merges small files AND re-clusters on the Morton curve
    in the same rewrite (crash-safe swap unchanged)."""
    from pyspark.sql import functions as F

    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.sources.tables import compact_small_files

    out = str(tmp_path / "frag")
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    events.repartition(64).write.parquet(out)  # 64 tiny files

    res = compact_small_files(
        spark, out, target_file_bytes=64 * 1024,
        cluster_by=["event_id", "user_id"], zorder=True,
    )
    assert res["after"]["n_files"] < res["before"]["n_files"]
    assert res["after"]["n_rows"] == res["before"]["n_rows"]
    # the rewrite is genuinely z-clustered: both columns' per-file spans
    # are bounded fractions of the global range (reuse the zorder pin's
    # analysis at a loose threshold — few files => coarser grid)
    import pyarrow.parquet as pq

    def spans(col):
        vals, lo, hi = [], None, None
        for f in sorted(os.listdir(out)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(out, f)).metadata
            mn = min(
                md.row_group(rg).column(i).statistics.min
                for rg in range(md.num_row_groups)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            )
            mx = max(
                md.row_group(rg).column(i).statistics.max
                for rg in range(md.num_row_groups)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            )
            vals.append((mn, mx))
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        w = (hi - lo) or 1
        return [(b - a) / w for a, b in vals]

    s_ev, s_us = spans("event_id"), spans("user_id")
    if len(s_ev) >= 4:  # enough files for a 2x2 grid
        assert sum(s_ev) / len(s_ev) < 0.75
        assert sum(s_us) / len(s_us) < 0.75
