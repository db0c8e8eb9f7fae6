"""MIME sniffing — magic-byte content-type detection over binary columns.

A crawl's payload bytes arrive untyped (HTTP Content-Type headers lie or
are missing — the reason browsers and every curation pipeline sniff), so
the FIRST operation on a binary column at 100 TB is a row-local magic
walk: classify the format, then read the format's own declared fields
(dimensions, sample rate) from the header WITHOUT decoding the payload —
the size/kind gates that route documents to the right decode family
(operators/multimodal.py) run on these fields alone.

Everything here is a pure JVM column program over the binary payload —
``substring`` on binary + ``hex``/``conv`` integer field extraction in
BOTH endiannesses (PNG/JPEG lengths are big-endian; GIF logical-screen
width/height and BMP/RIFF fields little-endian, BMP height additionally
SIGNED two's-complement: negative means top-down row order) — zero
UDFs, zero shuffles, the scan-local posture of the URL/langid gates.

The sniffer is deliberately stricter than first-4-bytes matching:

- ``RIFF`` alone is NOT audio/wav — the RIFF container is a family
  (WAV/AVI/WebP), so bytes 9-12 must be ``WAVE``. The synthesized
  fixture plants a ``RIFFraff ...`` text payload as a decoy: a naive
  4-byte sniffer classifies it audio/wav and cannot hash-match.
- BMP's 2-byte ``BM`` magic is checked only after every longer magic
  misses (the standard sniff order: longest, most-specific first).

Synthesis (:func:`synth_payload`) builds REAL header layouts — JFIF/Exif
APP0/APP1 JPEG prefixes, the PNG signature + IHDR, GIF87a/89a logical
screen descriptors, BITMAPINFOHEADER BMPs (top-down via negative height
on every 5th doc), canonical 44-byte WAV headers — with all computed
fields derived from ``doc_id`` formulas that the DuckDB oracle
recomputes independently (plans/llm.py), so the gate proves the byte
ENCODE->PARSE loop lands exactly on the formula values: a wrong offset,
a flipped endianness, or a missed sign extension breaks the hash.

Reference parity note: jehiah/gomrjob has no binary layer (it is a job
framework); this family is part of the multimodal surface the build
brief adds on top (SURVEY.md §2F extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: sniff targets, most-specific magic first (documented order)
MIME_JPEG = "image/jpeg"
MIME_PNG = "image/png"
MIME_GIF = "image/gif"
MIME_WAV = "audio/wav"
MIME_BMP = "image/bmp"
MIME_UNKNOWN = "application/octet-stream"


def _be_hex(x: Column, nbytes: int) -> Column:
    """Computed integer -> fixed-width big-endian hex string."""
    return F.lpad(F.hex(x.cast("bigint")), 2 * nbytes, "0")


def _le_hex(x: Column, nbytes: int) -> Column:
    """Computed integer -> fixed-width little-endian hex string (byte
    pairs of the BE form, reversed)."""
    be = _be_hex(x, nbytes)
    return F.concat(
        *[F.substring(be, 2 * i + 1, 2) for i in reversed(range(nbytes))]
    )


def _read_be(payload: Column, off: int, nbytes: int) -> Column:
    """Big-endian unsigned field at 1-based byte offset."""
    return F.conv(F.hex(F.substring(payload, off, nbytes)), 16, 10).cast(
        "bigint"
    )


def _read_le(payload: Column, off: int, nbytes: int) -> Column:
    """Little-endian unsigned field at 1-based byte offset."""
    h = F.hex(F.substring(payload, off, nbytes))
    be = F.concat(
        *[F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))]
    )
    return F.conv(be, 16, 10).cast("bigint")


def _read_le_i32(payload: Column, off: int) -> Column:
    """Little-endian SIGNED int32 (BMP height: negative = top-down)."""
    v = _read_le(payload, off, 4)
    return F.when(v >= F.lit(1 << 31), v - F.lit(1 << 32)).otherwise(v)


def _ascii_hex(s: str) -> str:
    return s.encode("ascii").hex().upper()


def synth_payload(doc_id: Column) -> Column:
    """Per-document binary payload as a PURE formula of ``doc_id`` —
    format rotates with ``doc_id % 6``; every computed header field is
    a formula the oracle recomputes (plans/llm.py mime oracle). The
    whole payload is assembled as one hex string and unhexed once."""
    d = doc_id.cast("bigint")
    width = 16 + d % 17
    height = 8 + d % 13
    channels = 1 + d % 2
    rate = 8000 + (d % 7) * 1000

    jpeg = F.concat(
        F.lit("FFD8FF"),
        F.when(d % 2 == 0, F.lit("E0")).otherwise(F.lit("E1")),
        F.lit("0010"),  # segment length 16, big-endian
        F.when(
            d % 2 == 0, F.lit(_ascii_hex("JFIF") + "00")
        ).otherwise(F.lit(_ascii_hex("Exif") + "0000")),
    )
    png = F.concat(
        F.lit("89504E470D0A1A0A"),  # signature
        F.lit("0000000D"),  # IHDR length 13, big-endian
        F.lit(_ascii_hex("IHDR")),
        _be_hex(width, 4),
        _be_hex(height, 4),
        F.lit("0802"),  # depth 8, color type 2 (truecolor)
    )
    gif = F.concat(
        F.lit(_ascii_hex("GIF8")),
        F.when(d % 2 == 0, F.lit(_ascii_hex("7a"))).otherwise(
            F.lit(_ascii_hex("9a"))
        ),
        _le_hex(width, 2),
        _le_hex(height, 2),
    )
    bmp_height = F.when(d % 5 == 0, -height).otherwise(height)
    bmp = F.concat(
        F.lit(_ascii_hex("BM")),
        _le_hex(F.lit(54), 4),  # file size (header-only payload)
        F.lit("00000000"),  # reserved
        _le_hex(F.lit(54), 4),  # pixel-array offset
        _le_hex(F.lit(40), 4),  # BITMAPINFOHEADER size
        _le_hex(width, 4),
        _le_hex(
            F.when(bmp_height < 0, bmp_height + F.lit(1 << 32)).otherwise(
                bmp_height
            ),
            4,
        ),
    )
    wav = F.concat(
        F.lit(_ascii_hex("RIFF")),
        _le_hex(F.lit(36), 4),  # riff size = 44 - 8
        F.lit(_ascii_hex("WAVE")),
        F.lit(_ascii_hex("fmt ")),
        _le_hex(F.lit(16), 4),  # fmt chunk size
        _le_hex(F.lit(1), 2),  # PCM
        _le_hex(channels, 2),
        _le_hex(rate, 4),
        _le_hex(rate * channels * 2, 4),  # byte rate
        _le_hex(channels * 2, 2),  # block align
        _le_hex(F.lit(16), 2),  # bits/sample
        F.lit(_ascii_hex("data")),
        _le_hex(F.lit(0), 4),
    )
    # the decoy: a RIFF-prefixed TEXT payload that is NOT a WAVE
    text_hex = F.hex(
        F.encode(F.concat(F.lit("RIFFraff doc "), d.cast("string")), "UTF-8")
    )
    hexstr = (
        F.when(d % 6 == 0, jpeg)
        .when(d % 6 == 1, png)
        .when(d % 6 == 2, gif)
        .when(d % 6 == 3, bmp)
        .when(d % 6 == 4, wav)
        .otherwise(text_hex)
    )
    return F.unhex(hexstr)


def sniff(payload: Column) -> Column:
    """Struct (mime, variant, width, height, top_down, channels,
    sample_rate, n_bytes, magic4) from the payload bytes alone —
    most-specific magic first, container inner type verified (RIFF
    requires WAVE), declared fields read with the format's own
    endianness and signedness. NULL fields are typed (bigint/boolean/
    string) so the schema is stable across formats."""
    magic2 = F.hex(F.substring(payload, 1, 2))
    magic3 = F.hex(F.substring(payload, 1, 3))
    magic4 = F.hex(F.substring(payload, 1, 4))
    magic6 = F.hex(F.substring(payload, 1, 6))
    magic8 = F.hex(F.substring(payload, 1, 8))
    riff_kind = F.hex(F.substring(payload, 9, 4))

    is_jpeg = magic3 == "FFD8FF"
    is_png = magic8 == "89504E470D0A1A0A"
    is_gif87 = magic6 == _ascii_hex("GIF87a")
    is_gif89 = magic6 == _ascii_hex("GIF89a")
    is_wav = (magic4 == _ascii_hex("RIFF")) & (riff_kind == _ascii_hex("WAVE"))
    is_bmp = magic2 == _ascii_hex("BM")

    mime = (
        F.when(is_jpeg, F.lit(MIME_JPEG))
        .when(is_png, F.lit(MIME_PNG))
        .when(is_gif87 | is_gif89, F.lit(MIME_GIF))
        .when(is_wav, F.lit(MIME_WAV))
        .when(is_bmp, F.lit(MIME_BMP))
        .otherwise(F.lit(MIME_UNKNOWN))
    )
    app_marker = F.hex(F.substring(payload, 4, 1))
    variant = (
        F.when(is_jpeg & (app_marker == "E0"), F.lit("jfif"))
        .when(is_jpeg & (app_marker == "E1"), F.lit("exif"))
        .when(is_gif87, F.lit("87a"))
        .when(is_gif89, F.lit("89a"))
        .otherwise(F.lit(None).cast("string"))
    )
    null_i = F.lit(None).cast("bigint")
    bmp_h = _read_le_i32(payload, 23)
    width = (
        F.when(is_png, _read_be(payload, 17, 4))
        .when(is_gif87 | is_gif89, _read_le(payload, 7, 2))
        .when(is_bmp, _read_le(payload, 19, 4))
        .otherwise(null_i)
    )
    height = (
        F.when(is_png, _read_be(payload, 21, 4))
        .when(is_gif87 | is_gif89, _read_le(payload, 9, 2))
        .when(is_bmp, F.abs(bmp_h))
        .otherwise(null_i)
    )
    top_down = F.when(is_bmp, bmp_h < 0).otherwise(
        F.lit(None).cast("boolean")
    )
    channels = F.when(is_wav, _read_le(payload, 23, 2)).otherwise(null_i)
    sample_rate = F.when(is_wav, _read_le(payload, 25, 4)).otherwise(null_i)
    return F.struct(
        mime.alias("mime"),
        variant.alias("variant"),
        width.alias("width"),
        height.alias("height"),
        top_down.alias("top_down"),
        channels.alias("channels"),
        sample_rate.alias("sample_rate"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        magic4.alias("magic4"),
    )


def sniff_table(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Flattened per-document sniff verdicts — one scan-local
    projection, zero shuffles."""
    staged = df.withColumn("_s", sniff(F.col(payload_col)))
    return staged.select(
        id_col,
        F.col("_s.mime").alias("mime"),
        F.col("_s.variant").alias("variant"),
        F.col("_s.width").alias("width"),
        F.col("_s.height").alias("height"),
        F.col("_s.top_down").alias("top_down"),
        F.col("_s.channels").alias("channels"),
        F.col("_s.sample_rate").alias("sample_rate"),
        F.col("_s.n_bytes").alias("n_bytes"),
        F.col("_s.magic4").alias("magic4"),
    )


#: one continuation byte (0x80-0xBF) as a hex pair
_CONT = "[89AB][0-9A-F]"

#: COMPLETE UTF-8 well-formedness (RFC 3629 table) as one regex over
#: the payload's hex encoding — rejects overlongs (C0/C1, E0 80-9F,
#: F0 80-8F), UTF-16 surrogates (ED A0-BF), and > U+10FFFF (F5-FF),
#: not just bad continuation counts. hex() is uppercase on both
#: engines, so the pattern is engine-portable.
UTF8_HEX_PAT = (
    "^(?:"
    "[0-7][0-9A-F]"  # ASCII
    f"|(?:C[2-9A-F]|D[0-9A-F]){_CONT}"  # 2-byte, C2-DF
    f"|E0[AB][0-9A-F]{_CONT}"  # 3-byte, E0 A0-BF (no overlong)
    f"|(?:E[1-9A-C]|EE|EF){_CONT}{_CONT}"  # 3-byte, E1-EC/EE/EF
    f"|ED[89][0-9A-F]{_CONT}"  # 3-byte, ED 80-9F (no surrogates)
    f"|F0(?:9[0-9A-F]|[AB][0-9A-F]){_CONT}{_CONT}"  # 4-byte, F0 90-BF
    f"|F[1-3]{_CONT}{_CONT}{_CONT}"  # 4-byte, F1-F3
    f"|F48[0-9A-F]{_CONT}{_CONT}"  # 4-byte, F4 80-8F (<= U+10FFFF)
    ")*$"
)

#: pure 7-bit payload
ASCII_HEX_PAT = "^(?:[0-7][0-9A-F])*$"


def utf8_valid(payload: Column) -> Column:
    """True iff the payload is well-formed UTF-8 (full RFC 3629 rules,
    empty included) — one codegen'd rlike over the hex form, no UDF.
    Differentially pinned against Python's own decoder on random byte
    strings in tests/test_mime.py."""
    return F.hex(payload).rlike(UTF8_HEX_PAT)


def ascii_only(payload: Column) -> Column:
    """True iff every byte is 7-bit."""
    return F.hex(payload).rlike(ASCII_HEX_PAT)


def charset_label(payload: Column) -> Column:
    """'ascii' < 'utf-8' < 'binary' — the decode-routing label a text
    pipeline gates on before any tokenizer touches the bytes (CCNet
    drops 'binary'; 'ascii' skips transcoding entirely)."""
    return (
        F.when(ascii_only(payload), F.lit("ascii"))
        .when(utf8_valid(payload), F.lit("utf-8"))
        .otherwise(F.lit("binary"))
    )
