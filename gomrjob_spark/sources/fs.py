"""Filesystem verbs over the JVM Hadoop FileSystem API.

Reference parity: the `hadoop fs` shell wrappers — Mkdir/Test/Put/RMR/
Remove/Copy/Move/Cat/Ls (hdfs/hadoop.go:65-207) — re-expressed against
``org.apache.hadoop.fs.FileSystem`` through the Py4J gateway. Same verbs,
no subprocess, and they work uniformly on every scheme the Spark session
is configured for (file://, hdfs://, s3a://, gs://).

``Ls`` parity detail: the reference parses `hadoop fs -ls` text output
into {perm, replicas, user, group, size, mtime, path}
(hdfs/hadoop.go:121-207); here the same fields come structured from
``FileStatus`` objects — no text parsing to break.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from gomrjob_spark.sources.paths import resolve_path


@dataclass
class FileStatus:
    path: str
    size: int
    is_dir: bool
    mtime_ms: int
    permission: str
    owner: str
    group: str
    replication: int


class FsOps:
    """Hadoop FileSystem operations bound to a SparkSession's config."""

    def __init__(self, spark: SparkSession, default_proto: str = "file://"):
        self._spark = spark
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._default_proto = default_proto

    def _jpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(resolve_path(path, self._default_proto))

    def _fs(self, path: str):
        return self._jpath(path).getFileSystem(self._conf)

    def mkdir(self, path: str) -> bool:
        """`hadoop fs -mkdir -p` (hdfs/hadoop.go:73-76)."""
        return self._fs(path).mkdirs(self._jpath(path))

    def exists(self, path: str) -> bool:
        """`hadoop fs -test -e` (hdfs/hadoop.go:78-81)."""
        return self._fs(path).exists(self._jpath(path))

    def put(self, local_path: str, dest_path: str) -> None:
        """`hadoop fs -put` (hdfs/hadoop.go:83-86)."""
        self._fs(dest_path).copyFromLocalFile(
            self._jvm.org.apache.hadoop.fs.Path(local_path), self._jpath(dest_path)
        )

    def rmr(self, path: str) -> bool:
        """`hadoop fs -rm -r` (hdfs/hadoop.go:88-91); False if absent."""
        fs = self._fs(path)
        p = self._jpath(path)
        return fs.exists(p) and fs.delete(p, True)

    def remove(self, path: str) -> bool:
        """Non-recursive delete (hdfs/hadoop.go:93-96)."""
        fs = self._fs(path)
        p = self._jpath(path)
        return fs.exists(p) and fs.delete(p, False)

    def copy(self, src: str, dst: str) -> bool:
        """`hadoop fs -cp` (hdfs/hadoop.go:107-110)."""
        FileUtil = self._jvm.org.apache.hadoop.fs.FileUtil
        return FileUtil.copy(
            self._fs(src), self._jpath(src), self._fs(dst), self._jpath(dst), False, self._conf
        )

    def move(self, src: str, dst: str) -> bool:
        """`hadoop fs -mv` (hdfs/hadoop.go:111-113); rename within one FS."""
        return self._fs(src).rename(self._jpath(src), self._jpath(dst))

    def cat(self, path: str, encoding: str = "utf-8") -> str:
        """Drain one file's bytes (hdfs/hadoop.go:115-119). For part-file
        *directories* use ``read_text_dir`` — cat is for small side files."""
        fs = self._fs(path)
        stream = fs.open(self._jpath(path))
        try:
            IOUtils = self._jvm.org.apache.commons.io.IOUtils
            return bytes(IOUtils.toByteArray(stream)).decode(encoding)
        finally:
            stream.close()

    def delete_prefix(self, prefix: str) -> int:
        """Object-store ``DeletePrefix`` analog
        (/root/reference/internal/storage/storage.go:113-133): delete
        everything whose path starts with ``prefix`` — flat-namespace
        semantics, not directory semantics, so ``/a/b`` removes file
        ``/a/b``, sibling ``/a/bc``, and the whole subtree ``/a/b/...``;
        a trailing ``/`` scopes to children only (object names "under"
        the prefix). Returns the number of top-level matches deleted;
        0 when nothing matches (the reference returns nil there too).

        Guard: an empty or filesystem-root prefix raises ValueError —
        the reference API would happily drain the whole bucket."""
        resolved = resolve_path(prefix, self._default_proto)
        rest = resolved.split("://", 1)[-1]
        if not rest.strip("/"):
            raise ValueError(f"refusing to delete empty/root prefix: {prefix!r}")
        fs = self._fs(prefix)
        pattern = self._jvm.org.apache.hadoop.fs.Path(resolved + "*")
        statuses = fs.globStatus(pattern)
        n = 0
        if statuses is not None:
            for st in statuses:
                fs.delete(st.getPath(), True)
                n += 1
        return n

    def ls(self, path: str) -> list[FileStatus]:
        """Structured `hadoop fs -ls` (hdfs/hadoop.go:121-207)."""
        fs = self._fs(path)
        out = []
        for st in fs.listStatus(self._jpath(path)):
            out.append(
                FileStatus(
                    path=st.getPath().toString(),
                    size=st.getLen(),
                    is_dir=st.isDirectory(),
                    mtime_ms=st.getModificationTime(),
                    permission=st.getPermission().toString(),
                    owner=st.getOwner(),
                    group=st.getGroup(),
                    replication=st.getReplication(),
                )
            )
        return out
