"""Multimodal column conventions: opaque binary payloads + typed metadata.

North-star operator family (BASELINE.json). The convention:

- payload: ``binary`` column (image/audio/video bytes) — Spark treats it
  as an opaque BYTE_ARRAY in parquet; predicate pushdown still applies to
  the *metadata* columns, so scans prune on (modality, width, duration)
  without touching payload bytes.
- metadata: a struct column (modality, n_bytes, content hash, magic) kept
  NEXT TO the payload, populated at ingest.

Decode / feature-extract run as Arrow-batched ``mapInPandas`` — the only
viable shape at 100 TB (payload bytes never route through the driver; each
task decodes its own partition). The actual codec libraries (PIL/ffmpeg)
are not in this container, so ``decode_image`` is a clearly-marked STUB:
the Spark-side plumbing (schemas, batch iteration, partitioning) is real
and tested with ``fake_decode_meta``, and a real decoder drops in by
replacing one function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct appended by attach_payload
METADATA_SCHEMA = "struct<modality:string,n_bytes:int,sha:string,magic:string>"

#: schema produced by extract_features
FEATURE_SCHEMA = (
    "doc_id bigint, modality string, n_bytes int, width int, height int, channels int"
)

_PNG_MAGIC = bytes.fromhex("89504e47")


def attach_payload(df: DataFrame, text_col: str = "text", modality: str = "image") -> DataFrame:
    """Ingest convention: wrap a payload (here: utf-8 bytes of ``text`` as
    a deterministic stand-in) with its typed metadata struct."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("sha"),
        F.hex(F.substring(payload, 1, 4)).alias("magic"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def decode_image(payload: bytes) -> dict:
    """STUB: real image decode requires PIL/libvips (not in this
    container). Replace this function to productionize; everything else
    (batching, schema, partition flow) is already wired."""
    raise NotImplementedError(
        "image codec libraries unavailable in this environment; "
        "use fake_decode_meta for the plumbing path"
    )


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic decode stand-in: derives plausible image dimensions
    from the payload bytes so the distributed plumbing is testable."""
    n = len(payload)
    return {
        "width": (n % 64) + 1,
        "height": ((n // 64) % 64) + 1,
        "channels": 3 if n % 2 else 1,
    }


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    decoder=fake_decode_meta,
) -> DataFrame:
    """Per-payload feature extraction via mapInPandas (Arrow batches).

    The decoder sees raw bytes per row inside the task; output schema is
    fixed (FEATURE_SCHEMA) so downstream plans are stable regardless of
    decoder. At scale: repartition upstream so batches fit executor memory
    (payloads are the dominant bytes; spark.sql.execution.arrow.
    maxRecordsPerBatch bounds rows per batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "modality": pdf["modality"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "channels": [m["channels"] for m in metas],
                }
            )

    cols = df.select(
        F.col(id_col), F.col("payload"), F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_indices(n_frames_col, every: int = 10):
    """Frame-sampling helper for video payloads: indices 0, every, 2*every
    ... as an array column (decode only sampled frames downstream)."""
    return F.sequence(F.lit(0), F.greatest(n_frames_col - 1, F.lit(0)), F.lit(every))
