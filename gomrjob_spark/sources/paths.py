"""Multi-scheme input path resolution.

Reference parity: gomrjob prefixes un-schemed paths with a configurable
default protocol and passes known schemes through untouched
(hdfs/job.go:27-43, tested at hdfs/job_test.go:8-27). One deliberate
difference: ``s3://`` is rewritten to ``s3a://`` — on Spark/Hadoop 3 the
s3a connector is the maintained S3 client, and the legacy ``s3://``
block-store scheme is a trap.
"""

from __future__ import annotations

_KNOWN_SCHEMES = ("hdfs://", "s3a://", "gs://", "file://")


def resolve_path(path: str, default_proto: str = "file://") -> str:
    """Return ``path`` with an explicit scheme, applying ``default_proto``
    to bare paths. Globs pass through (Spark handles them natively)."""
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://") :]
    for scheme in _KNOWN_SCHEMES:
        if path.startswith(scheme):
            return path
    if "://" in path:
        # unknown scheme: pass through, let Hadoop resolve or fail loudly
        return path
    if default_proto.startswith("file://"):
        # file URIs keep the absolute path: file:// + /tmp/x = file:///tmp/x
        return "file://" + path
    if default_proto.endswith("://"):
        return default_proto + path.lstrip("/")
    if "://" in default_proto:
        # bucket-style default (gs://bucket): join as prefix/path
        return default_proto.rstrip("/") + "/" + path.lstrip("/")
    return default_proto + "://" + path.lstrip("/")


def resolve_paths(paths: list[str], default_proto: str = "file://") -> list[str]:
    return [resolve_path(p, default_proto) for p in paths]
