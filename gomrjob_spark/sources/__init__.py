"""Sources, sinks and filesystem operations (SURVEY.md §2D).

The reference's I/O surface: glob inputs over multi-scheme paths
(hdfs/job.go:27-56), text/gzip line sources (runner.go:51), JSON-lines
records (mrproto/protocol.go:17-42), `part-*` output dirs with optional
gzip (runner.go:137-163), and `hadoop fs` shell verbs
(hdfs/hadoop.go:65-207). Spark natively covers the read/write paths; the
filesystem verbs go through the JVM Hadoop FileSystem API so they work
identically on file://, hdfs://, s3a:// and gs:// without shelling out.
"""

from gomrjob_spark.sources.paths import resolve_path, resolve_paths
from gomrjob_spark.sources.lines import (
    read_lines,
    read_text_dir,
    write_part_files,
    write_tsv_part_files,
)
from gomrjob_spark.sources.fs import FileStatus, FsOps
from gomrjob_spark.sources.tables import (
    read_csv,
    read_table,
    write_csv,
    write_partitioned,
    write_range_clustered,
    write_zorder_clustered,
)

__all__ = [
    "resolve_path",
    "resolve_paths",
    "read_lines",
    "read_text_dir",
    "write_part_files",
    "write_tsv_part_files",
    "FileStatus",
    "FsOps",
    "read_csv",
    "read_table",
    "write_csv",
    "write_partitioned",
    "write_range_clustered",
    "write_zorder_clustered",
]
