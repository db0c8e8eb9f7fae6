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
task decodes its own partition). Container headers (PNG/JPEG/GIF
dimensions + channels) decode for REAL via ``decode_image_header`` —
pure Python over magic bytes, no codec library needed. Only full pixel
decode (``decode_image``) remains a clearly-marked STUB because
PIL/ffmpeg are not in this container; a real decoder drops in by
replacing that one function.
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
    """STUB: full pixel decode requires PIL/libvips (not in this
    container). Container *headers* decode for real via
    :func:`decode_image_header` (pure Python, no codec libs); replace
    this function to get pixel data — everything else (batching, schema,
    partition flow) is already wired."""
    raise NotImplementedError(
        "image codec libraries unavailable in this environment; "
        "decode_image_header parses real container headers without them"
    )


_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_GIF_MAGICS = (b"GIF87a", b"GIF89a")
#: PNG color type -> sample channels (spec 11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: JPEG SOF markers carrying frame dimensions (C4/C8/CC are DHT/JPG/DAC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def decode_image_header(payload: bytes) -> dict | None:
    """Real container-header decode, pure Python (no codec libraries):
    width/height/channels from the PNG IHDR chunk, the GIF logical
    screen descriptor, or the first JPEG SOF segment. Returns None for
    unrecognized payloads (caller falls back or filters).

    This is the production fast path for 100 TB metadata extraction —
    dimensions come from the first bytes of the payload, so the task
    never materializes pixels."""
    if payload[:8] == _PNG_SIGNATURE and len(payload) >= 26 and payload[12:16] == b"IHDR":
        color_type = payload[25]
        if color_type not in _PNG_CHANNELS:
            return None
        return {
            "format": "png",
            "width": int.from_bytes(payload[16:20], "big"),
            "height": int.from_bytes(payload[20:24], "big"),
            "channels": _PNG_CHANNELS[color_type],
        }
    if payload[:6] in _GIF_MAGICS and len(payload) >= 10:
        return {
            "format": "gif",
            "width": int.from_bytes(payload[6:8], "little"),
            "height": int.from_bytes(payload[8:10], "little"),
            "channels": 3,  # palette entries are RGB triples
        }
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone markers
                i += 2
                continue
            if i + 4 > n:
                return None
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if marker in _JPEG_SOF:
                if i + 10 > n:
                    return None
                return {
                    "format": "jpeg",
                    "height": int.from_bytes(payload[i + 5 : i + 7], "big"),
                    "width": int.from_bytes(payload[i + 7 : i + 9], "big"),
                    "channels": payload[i + 9],
                }
            i += 2 + seg_len
    return None


def decode_meta(payload: bytes) -> dict:
    """Default extract_features decoder: REAL header decode for
    recognized containers (PNG/JPEG/GIF), deterministic fake for
    synthetic payloads — so the same pipeline serves production bytes
    and codec-free test fixtures."""
    parsed = decode_image_header(payload)
    if parsed is not None:
        return parsed
    return fake_decode_meta(payload)


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
    decoder=decode_meta,
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


#: schema produced by resize_images (resized carries the actual bytes)
RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, "
    "out_w int, out_h int, resized binary"
)


def resize_dims(width: int, height: int, target_long_side: int) -> tuple[int, int]:
    """Aspect-preserving target dimensions, integer arithmetic only
    (floor-scaled to the long side, floored at 1) — exactly mirrorable
    by any SQL engine, which is what lets the resize pipeline sit under
    the oracle gate."""
    mx = max(width, height)
    return (
        max(1, (width * target_long_side) // mx),
        max(1, (height * target_long_side) // mx),
    )


def resize_images(
    df: DataFrame,
    target_long_side: int = 32,
    id_col: str = "doc_id",
    decoder=decode_meta,
) -> DataFrame:
    """Per-payload resize via mapInPandas — the thumbnail/normalize stage
    of an image pipeline. Decode gives (width, height, channels); the
    output buffer is built by nearest-neighbor sampling over the payload
    bytes (REAL for a raw w*h*c buffer; for synthetic/fake-decoded
    payloads the source index wraps modulo payload length, keeping the
    operator deterministic without a codec library — swap ``decoder``
    for a pixel decoder and this is production resize).

    Scale: pure per-row work inside Arrow batches, no shuffle; payload
    bytes stay on the task that scanned them."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "channels", "out_w", "out_h", "resized")}
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                p = bytes(p)
                m = decoder(p)
                w, h, ch = m["width"], m["height"], m["channels"]
                ow, oh = resize_dims(w, h, target_long_side)
                n = len(p)
                buf = bytearray(ow * oh * ch)  # empty payload -> zero buffer
                if n:
                    pos = 0
                    for y in range(oh):
                        sy = y * h // oh
                        for x in range(ow):
                            sx = x * w // ow
                            src = (sy * w + sx) * ch
                            for c in range(ch):
                                buf[pos] = p[(src + c) % n]
                                pos += 1
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["out_w"].append(ow)
                rows["out_h"].append(oh)
                rows["resized"].append(bytes(buf))
            yield pd.DataFrame(rows)

    cols = df.select(F.col(id_col), F.col("payload"))
    return cols.mapInPandas(run, schema=RESIZE_SCHEMA)


#: schema produced by extract_audio_features
AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, channels int, sample_rate int, bits_per_sample int, duration_ms int"
)


def decode_audio_header(payload: bytes) -> dict | None:
    """Real WAV (RIFF/WAVE) header decode, pure Python: walks the chunk
    list for ``fmt `` (channels, sample rate, bits) and ``data`` (byte
    count), deriving duration_ms by integer arithmetic. The audio
    counterpart of decode_image_header — metadata comes from the first
    bytes, no audio library and no sample decoding."""
    n = len(payload)
    if n < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, fmt, data_size = 12, None, None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        csize = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= n:
            fmt = {
                "channels": int.from_bytes(payload[i + 10 : i + 12], "little"),
                "sample_rate": int.from_bytes(payload[i + 12 : i + 16], "little"),
                "byte_rate": int.from_bytes(payload[i + 16 : i + 20], "little"),
                "bits_per_sample": int.from_bytes(payload[i + 22 : i + 24], "little"),
            }
        elif cid == b"data":
            data_size = csize
        i += 8 + csize + (csize % 2)  # RIFF chunks are word-aligned
    if fmt is None:
        return None
    duration_ms = (
        data_size * 1000 // fmt["byte_rate"]
        if data_size is not None and fmt["byte_rate"]
        else None
    )
    return {
        "format": "wav",
        "channels": fmt["channels"],
        "sample_rate": fmt["sample_rate"],
        "bits_per_sample": fmt["bits_per_sample"],
        "duration_ms": duration_ms,
    }


def extract_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    decoder=decode_audio_header,
) -> DataFrame:
    """Audio metadata extraction via mapInPandas (same batch shape as
    extract_features); unrecognized payloads yield NULL features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decoder(bytes(p)) or {} for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "channels": [m.get("channels") for m in metas],
                    "sample_rate": [m.get("sample_rate") for m in metas],
                    "bits_per_sample": [m.get("bits_per_sample") for m in metas],
                    "duration_ms": [m.get("duration_ms") for m in metas],
                }
            )

    return df.select(F.col(id_col), F.col("payload")).mapInPandas(
        run, schema=AUDIO_FEATURE_SCHEMA
    )
