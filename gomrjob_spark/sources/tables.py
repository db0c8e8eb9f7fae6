"""Columnar table sources/sinks beyond the line-protocol layer.

The reference's storage surface is line files only (text/gz part files,
`/root/reference/runner.go:137-163`); the engine's §2F scans/sources
contract adds the columnar formats Spark ships (parquet/csv/orc) plus the
layout feature that matters most at 100 TB: **partitioned directories**.
A date- or category-partitioned dataset turns a predicate on the
partition column into directory pruning — the scan never opens the
non-matching files, which at scale is the difference between reading
100 TB and reading one partition. Pruning is pinned by
tests/test_sources.py::test_partitioned_write_prunes_scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from gomrjob_spark.sources.paths import resolve_path


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write a dataset partitioned by the given columns (hive-style
    ``col=value`` directories). Partition columns should be low-to-medium
    cardinality (a date, a category) — one directory per value; a
    high-cardinality partition column creates a small-files problem
    instead of pruning."""
    w = df.write.mode(mode).partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.format(fmt).save(resolve_path(path))


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Read a columnar table (parquet/orc/csv). Partitioned layouts are
    discovered automatically; filters on partition columns prune at plan
    time. For csv, pass an explicit ``schema`` — inference reads the data
    twice and types drift (everything-is-string without it)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    return r.format(fmt).load(resolve_path(path))


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    compression: str | None = None,
) -> None:
    """CSV sink (header on by default; gzip via ``compression='gzip'``)."""
    w = df.write.mode(mode).option("header", str(header).lower())
    if compression:
        w = w.option("compression", compression)
    w.csv(resolve_path(path))


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True, **options: str
) -> DataFrame:
    """CSV source with a required schema (see read_table note)."""
    return read_table(
        spark, path, fmt="csv", schema=schema, header=str(header).lower(), **options
    )


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write with range clustering on the given columns:
    ``repartitionByRange`` (one file per range) + ``sortWithinPartitions``
    so each output file covers a DISJOINT value range. Parquet then
    records tight min/max stats per file/row-group, and a point or range
    predicate on the cluster column prunes to the few files whose range
    overlaps — the difference between a
    needle-in-haystack query scanning one file vs the whole dataset.
    Disjointness is pinned by tests/test_sources.py via the parquet
    footers.

    Use a timestamp or monotone id as the leading cluster column; skewed
    columns still work (range partitioner samples the distribution).
    Only the LEADING column gets tight per-file ranges; for pruning
    along several independent columns use
    :func:`write_zorder_clustered`."""
    parted = (
        df.repartitionByRange(num_files, *cluster_by)
        if num_files
        else df.repartitionByRange(*cluster_by)
    )
    parted.sortWithinPartitions(*cluster_by).write.mode(mode).format(fmt).save(
        resolve_path(path)
    )


def zorder_key(scaled: list, bits: int) -> "F.Column":
    """Morton (Z-order) curve key: interleave the bits of the
    rank-scaled cluster columns — bit j of column c lands at position
    ``j * n_cols + c``, so consecutive key values alternate fastest
    along every dimension at once. Pure shift/and/or column expressions,
    codegen'd (bits × n_cols terms)."""
    n = len(scaled)
    key = F.lit(0).cast("bigint")
    for j in range(bits):
        for ci, s in enumerate(scaled):
            bit = F.shiftright(s, j).bitwiseAND(F.lit(1).cast("bigint"))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + ci))
    return key


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    bits: int = 16,
) -> None:
    """Write with MULTI-dimensional clustering on a Z-order (Morton)
    curve — the real version of :func:`write_range_clustered`'s "poor
    man's Z-order": range clustering gives disjoint file ranges on ONE
    leading column; interleaving the bits of several rank-scaled
    columns gives locality along EVERY cluster column at once, so
    parquet footer min/max stats prune scans on any of them
    independently (the technique behind Delta/Iceberg ``OPTIMIZE
    ZORDER``; Morton 1966). With 2 columns and F output files, each
    file covers ~1/sqrt(F) of each column's range instead of 1/F of
    one and 100% of the other.

    Each cluster column linearly scales to a ``bits``-wide integer
    against its global min/max — ONE bounded stats aggregate (2 scalars
    per column) is the only extra pass; the write is then ordinary
    range clustering on the interleaved key (one range-exchange
    shuffle, same as write_range_clustered). Numeric and timestamp
    columns (timestamps scale via epoch micros). Linear scaling is
    skew-sensitive where a rank-based scale wouldn't be — for heavily
    skewed columns, pre-transform (log, bucketed rank) before
    clustering. Bit budget: bits × n_cols must stay <= 63.

    Per-column pruning power is pinned by
    tests/test_sources.py::test_zorder_write_prunes_on_both_columns."""
    from gomrjob_spark.functions import epoch_us

    if bits * len(cluster_by) > 63:
        raise ValueError(f"bits*cols = {bits * len(cluster_by)} exceeds the 63-bit key")
    dtypes = dict(df.dtypes)
    work = df
    zc = []
    for i, c in enumerate(cluster_by):
        col = F.col(c)
        if dtypes[c].startswith("timestamp"):
            col = epoch_us(col)
        work = work.withColumn(f"_z{i}", col.cast("double"))
        zc.append(f"_z{i}")
    # bounded driver read: 2 scalars per cluster column
    stats = work.agg(
        *[F.min(c).alias(f"_lo{i}") for i, c in enumerate(zc)],
        *[F.max(c).alias(f"_hi{i}") for i, c in enumerate(zc)],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(zc):
        lo, hi = float(stats[f"_lo{i}"]), float(stats[f"_hi{i}"])
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(top).cast("bigint"),
                F.floor((F.col(c) - F.lit(lo)) * F.lit(top / span)).cast("bigint"),
            )
        )
    keyed = work.withColumn("_zkey", zorder_key(scaled, bits))
    parted = (
        keyed.repartitionByRange(num_files, "_zkey")
        if num_files
        else keyed.repartitionByRange("_zkey")
    )
    # the projection after the sort is order-preserving (no exchange)
    parted.sortWithinPartitions("_zkey").drop("_zkey", *zc).write.mode(mode).format(
        fmt
    ).save(resolve_path(path))


def dataset_stats(spark: SparkSession, path: str, fmt: str = "parquet") -> dict:
    """File-layout audit for a dataset directory: file count, total/avg/
    min/max file bytes, and row count — the numbers that decide whether
    :func:`compact_small_files` is worth running. File metadata comes
    from the Hadoop FileSystem listing (no data read except the count)."""
    from gomrjob_spark.sources.fs import FsOps

    files = [
        f
        for f in FsOps(spark).ls(resolve_path(path))
        if not f.is_dir and not f.path.rsplit("/", 1)[-1].startswith(("_", "."))
    ]
    sizes = [f.size for f in files]
    return {
        "n_files": len(files),
        "total_bytes": sum(sizes),
        "avg_bytes": (sum(sizes) // len(sizes)) if sizes else 0,
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
        "n_rows": spark.read.format(fmt).load(resolve_path(path)).count(),
    }


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    fmt: str = "parquet",
    cluster_by: list[str] | None = None,
    zorder: bool = False,
) -> dict:
    """Compact a small-file-fragmented dataset in place: read, coalesce
    to ``ceil(total_bytes / target_file_bytes)`` output files, and
    atomically swap via a sibling temp dir + rename. The housekeeping
    op every incremental 100 TB pipeline needs — streaming sinks and
    per-batch appends produce thousands of KB-sized files whose open/
    footer overhead eventually dominates scans (file count IS the task
    count floor).

    With ``cluster_by``, the rewrite range-clusters on those columns
    (see write_range_clustered) so compaction also restores stats
    pruning; ``zorder=True`` makes it Morton-curve clustering instead
    (write_zorder_clustered — the OPTIMIZE ZORDER shape: compaction
    and multi-column re-clustering in one pass). Returns
    {before, after} dataset_stats.

    Swap order (r4 verdict #2 fix — the old rmr-then-move sequence had
    a window where a crash left NO copy at the canonical path): the
    live dir is renamed aside to ``<path>._compact_old``, the compacted
    tmp dir renamed into place, and only then is the old dir deleted.
    Each rename is atomic per Hadoop FileSystem semantics but the
    SEQUENCE is not a transaction: a crash between the two renames
    leaves the dataset recoverable at ``._compact_old`` (worst case
    both copies exist, never neither). Not safe against concurrent
    writers — at production scale run it under the table format's
    (Delta/Iceberg) own compaction or a path lock."""
    from gomrjob_spark.sources.fs import FsOps

    rp = resolve_path(path)
    before = dataset_stats(spark, rp, fmt)
    n_out = max(1, -(-before["total_bytes"] // target_file_bytes))
    base = rp.rstrip("/")
    tmp = base + "._compact_tmp"
    old = base + "._compact_old"
    df = spark.read.format(fmt).load(rp)
    if cluster_by and zorder:
        write_zorder_clustered(df, tmp, cluster_by, num_files=n_out, fmt=fmt)
    elif cluster_by:
        write_range_clustered(df, tmp, cluster_by, num_files=n_out, fmt=fmt)
    else:
        # coalesce, not repartition: merging files needs no shuffle
        df.coalesce(n_out).write.mode("overwrite").format(fmt).save(tmp)
    fs = FsOps(spark)
    if fs.exists(old):
        raise RuntimeError(
            f"{old} already exists — a previous compaction crashed mid-swap; "
            "recover or remove it before compacting again"
        )
    fs.move(rp, old)
    fs.move(tmp, rp)
    fs.rmr(old)
    return {"before": before, "after": dataset_stats(spark, rp, fmt)}


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    fmt: str = "parquet",
    partition_col: str | None = None,
    delete_col: str | None = None,
    locate_existing: bool = True,
    keep_latest_by: list[str] | None = None,
) -> dict:
    """Keyed MERGE for a plain-files dataset — the copy-on-write
    equivalent of ``MERGE INTO`` without a table format: rows whose key
    matches an update are replaced, unmatched update rows are inserted,
    and (with ``delete_col``) updates flagged true delete their key
    instead. ``updates`` must be key-unique.

    ``keep_latest_by`` (r6) switches matched keys from replace to
    LAST-WRITER-WINS: each key keeps whichever of {stored row, update
    row} has the greater ``keep_latest_by`` tuple (ties prefer the
    update). That makes the merge COMMUTATIVE over delivery order — a
    late-arriving older version never overwrites a newer stored row —
    and IDEMPOTENT under replay, which is exactly the contract a
    streaming CDC apply needs (see streaming.ops.upsert_sink).
    Incompatible with ``delete_col`` (a delete would need its own
    version ordering); with ``partition_col`` it requires
    ``locate_existing=False`` and partition-stable keys (LWW resolution
    is per-directory, so a key moving partitions would race its own
    old row).

    Merge plan: ``target LEFT ANTI JOIN touched-keys`` then union the
    upsert rows — the target flows through one anti-join probe
    (broadcast when the touched-key set is small, Catalyst/AQE decides)
    and is otherwise rewritten as-is; the rewrite IS the cost, exactly
    as in any copy-on-write format.

    Scale: with ``partition_col`` (a dataset laid out by
    ``write_partitioned``), only the partition directories that hold
    touched KEYS are read, merged, and swapped; untouched partitions'
    data files are never rewritten. Where those directories are comes
    from ``locate_existing`` (r6, fixing the r5 silent assumption that
    an update's partition value is where its key already lives):

    - ``locate_existing=True`` (default, correct for arbitrary
      updates): one column-pruned scan of (key_cols, partition_col)
      over the stored dataset, semi-joined against the broadcast
      touched-key set, finds each touched key's CURRENT partition. The
      rewrite set is the union of update-claimed and stored locations,
      so an update that MOVES a key across partitions (or a delete
      whose stored row lives elsewhere) also rewrites the old
      directory — no stale duplicate, no missed delete. The scan reads
      only the key + partition columns (parquet column pruning), but
      it does touch every partition's footers; skip it only when the
      precondition below holds.
    - ``locate_existing=False`` (partition-stable keys — the key
      determines its partition value, a HARD precondition): only the
      update-claimed partition values rewrite, and the anti-join's
      touched keys are scoped per partition, so even a violated
      precondition behaves deterministically (the stale row survives
      in its old partition regardless of what else is in the batch —
      it is never removed as a side effect of an unrelated update).

    Each partition (or the whole dataset) swaps with the same
    crash-safe aside-rename sequence as :func:`compact_small_files` — a
    crash leaves that partition recoverable at ``._merge_old``, never
    missing. The per-partition loop is NOT one transaction: a crash
    mid-loop leaves earlier partitions merged and later ones not.
    Recovery is to RE-RUN THE SAME MERGE — the merge is idempotent
    (anti-join + union of the same updates converges to identical
    content; pinned by test_merge_upsert_rerun_is_idempotent), so a
    partially-applied merge completes on rerun. Not safe against
    concurrent writers; under a transactional format use its native
    MERGE.

    Returns ``{"partitions_rewritten": n, "rows_upserted": u,
    "rows_deleted": d}``."""
    from gomrjob_spark.sources.fs import FsOps

    if keep_latest_by and delete_col:
        raise ValueError("keep_latest_by is incompatible with delete_col")
    if keep_latest_by and partition_col and locate_existing:
        raise ValueError(
            "keep_latest_by with partition_col requires locate_existing=False "
            "and partition-stable keys (LWW resolution is per-directory)"
        )
    fs = FsOps(spark)
    rp = resolve_path(path).rstrip("/")
    if delete_col:
        deletes = updates.filter(F.col(delete_col))
        upserts = updates.filter(~F.col(delete_col)).drop(delete_col)
        touched = updates.select(*key_cols).distinct()
        n_deleted = deletes.count()
    else:
        upserts = updates
        touched = updates.select(*key_cols).distinct()
        n_deleted = 0
    n_upserted = upserts.count()

    def swap_in(current: DataFrame, ups: DataFrame, target: str, keys: DataFrame) -> None:
        if keep_latest_by:
            from pyspark.sql import Window

            pool = current.withColumn("_src", F.lit(0)).unionByName(
                ups.withColumn("_src", F.lit(1))
            )
            w = Window.partitionBy(*key_cols).orderBy(
                *[F.col(c).desc() for c in keep_latest_by], F.col("_src").desc()
            )
            merged = (
                pool.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_src")
            )
        else:
            merged = current.join(keys, key_cols, "left_anti").unionByName(ups)
        tmp, old = target + "._merge_tmp", target + "._merge_old"
        if fs.exists(old):
            raise RuntimeError(
                f"{old} already exists — a previous merge crashed mid-swap; "
                "recover or remove it before merging again"
            )
        merged.write.mode("overwrite").format(fmt).save(tmp)
        fs.move(target, old)
        fs.move(tmp, target)
        fs.rmr(old)

    if partition_col is None:
        swap_in(spark.read.format(fmt).load(rp), upserts, rp, touched)
        return {
            "partitions_rewritten": 1,
            "rows_upserted": n_upserted,
            "rows_deleted": n_deleted,
        }

    # partition-scoped: only directories holding touched keys rewrite.
    # Values normalize to their directory-string form (str(v)) because
    # Hive partition discovery re-infers types — an update's "1" and a
    # discovered 1 name the SAME src=1 directory and must dedup.
    values = {str(r[0]) for r in updates.select(partition_col).distinct().collect()}
    if locate_existing:
        # where do the touched keys CURRENTLY live? column-pruned scan,
        # broadcast semi-probe, bounded driver read of partition values
        stored = spark.read.format(fmt).load(rp).select(*key_cols, partition_col)
        values |= {
            str(r[0])
            for r in stored.join(F.broadcast(touched), key_cols, "left_semi")
            .select(partition_col)
            .distinct()
            .collect()
        }
    for v in sorted(values):
        pdir = f"{rp}/{partition_col}={v}"
        ups_v = upserts.filter(F.col(partition_col) == v).drop(partition_col)
        keys_v = (
            touched
            if locate_existing
            else updates.filter(F.col(partition_col) == v).select(*key_cols).distinct()
        )
        if fs.exists(pdir):
            cur = spark.read.format(fmt).load(pdir)
            swap_in(cur, ups_v, pdir, keys_v)
        else:  # brand-new partition: plain insert
            ups_v.write.mode("overwrite").format(fmt).save(pdir)
    return {
        "partitions_rewritten": len(values),
        "rows_upserted": n_upserted,
        "rows_deleted": n_deleted,
    }
