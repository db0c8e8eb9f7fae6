"""MIME magic-byte sniffing (operators/mime.py).

The driver hash gate proves the full encode->parse loop against the
formula oracle; these tests pin the sniff CONTRACT on handcrafted
payloads (container-inner-type verification, endianness, BMP sign
extension), and the plan shape (scan-local, no shuffle, no UDF)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from gomrjob_spark.operators import mime as M


def _sniff_bytes(spark, payload: bytes):
    df = spark.createDataFrame([(payload,)], "payload binary")
    return df.select(M.sniff(F.col("payload")).alias("s")).select(
        "s.*"
    ).first()


class TestContainerStrictness:
    def test_riff_without_wave_is_not_wav(self, spark):
        r = _sniff_bytes(spark, b"RIFFraff doc 42")
        assert r["mime"] == M.MIME_UNKNOWN
        assert r["channels"] is None and r["sample_rate"] is None

    def test_riff_with_wave_is_wav(self, spark):
        wav = (
            b"RIFF" + (36).to_bytes(4, "little") + b"WAVEfmt "
            + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
            + (2).to_bytes(2, "little") + (11000).to_bytes(4, "little")
            + (44000).to_bytes(4, "little") + (4).to_bytes(2, "little")
            + (16).to_bytes(2, "little") + b"data" + bytes(4)
        )
        r = _sniff_bytes(spark, wav)
        assert r["mime"] == M.MIME_WAV
        assert r["channels"] == 2 and r["sample_rate"] == 11000

    def test_short_unknown_payload(self, spark):
        r = _sniff_bytes(spark, b"xy")
        assert r["mime"] == M.MIME_UNKNOWN and r["width"] is None


class TestEndianness:
    def test_png_dims_are_big_endian(self, spark):
        ihdr = (
            bytes.fromhex("89504E470D0A1A0A")
            + (13).to_bytes(4, "big") + b"IHDR"
            + (300).to_bytes(4, "big") + (70000).to_bytes(4, "big")
            + bytes([8, 2])
        )
        r = _sniff_bytes(spark, ihdr)
        assert r["mime"] == M.MIME_PNG
        assert r["width"] == 300 and r["height"] == 70000

    def test_gif_dims_are_little_endian(self, spark):
        gif = b"GIF89a" + (640).to_bytes(2, "little") + (480).to_bytes(2, "little")
        r = _sniff_bytes(spark, gif)
        assert r["mime"] == M.MIME_GIF and r["variant"] == "89a"
        assert r["width"] == 640 and r["height"] == 480

    def test_jpeg_variant_from_app_marker(self, spark):
        assert _sniff_bytes(spark, bytes.fromhex("FFD8FFE00010") + b"JFIF\0")["variant"] == "jfif"
        assert _sniff_bytes(spark, bytes.fromhex("FFD8FFE10010") + b"Exif\0\0")["variant"] == "exif"


class TestBmpSignExtension:
    def _bmp(self, height: int) -> bytes:
        return (
            b"BM" + (54).to_bytes(4, "little") + bytes(4)
            + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
            + (17).to_bytes(4, "little")
            + (height & 0xFFFFFFFF).to_bytes(4, "little")
        )

    def test_positive_height_bottom_up(self, spark):
        r = _sniff_bytes(spark, self._bmp(9))
        assert r["mime"] == M.MIME_BMP
        assert r["height"] == 9 and r["top_down"] is False

    def test_negative_height_top_down(self, spark):
        r = _sniff_bytes(spark, self._bmp(-9))
        assert r["height"] == 9 and r["top_down"] is True


class TestSynthesisRoundTrip:
    def test_every_format_class_sniffs_back_to_its_formula(self, spark):
        df = spark.range(0, 60).select(
            F.col("id").alias("doc_id"),
            M.synth_payload(F.col("id")).alias("payload"),
        )
        rows = M.sniff_table(df).orderBy("doc_id").collect()
        expect = [
            M.MIME_JPEG, M.MIME_PNG, M.MIME_GIF,
            M.MIME_BMP, M.MIME_WAV, M.MIME_UNKNOWN,
        ]
        for r in rows:
            assert r["mime"] == expect[r["doc_id"] % 6]
            if r["mime"] in (M.MIME_PNG, M.MIME_GIF, M.MIME_BMP):
                assert r["width"] == 16 + r["doc_id"] % 17
                assert r["height"] == 8 + r["doc_id"] % 13


class TestPlanShape:
    def test_sniff_is_scan_local(self, spark):
        df = spark.range(0, 100).select(
            F.col("id").alias("doc_id"),
            M.synth_payload(F.col("id")).alias("payload"),
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            M.sniff_table(df).explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
