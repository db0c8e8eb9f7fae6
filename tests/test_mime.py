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


class TestUtf8Validator:
    """The hex-regex UTF-8 validator (UTF8_HEX_PAT) — spec edge pins
    plus a random-bytes DIFFERENTIAL against CPython's own decoder."""

    def _labels(self, spark, payloads):
        df = spark.createDataFrame([(p,) for p in payloads], "p binary")
        return [
            r["v"]
            for r in df.select(M.utf8_valid(F.col("p")).alias("v")).collect()
        ]

    def test_spec_boundaries(self, spark):
        cases = {
            "߿".encode(): True,     # DF BF: last 2-byte
            "ࠀ".encode(): True,     # E0 A0 80: first 3-byte
            "퟿".encode(): True,     # ED 9F BF: last before surrogates
            "".encode(): True,     # EE 80 80: first after surrogates
            "\U00010000".encode(): True,  # F0 90 80 80: first 4-byte
            "\U0010ffff".encode(): True,  # F4 8F BF BF: max code point
            b"\xc0\xaf": False,           # overlong 2-byte
            b"\xe0\x9f\xbf": False,       # overlong 3-byte
            b"\xf0\x8f\xbf\xbf": False,   # overlong 4-byte
            b"\xed\xa0\x80": False,       # surrogate low bound
            b"\xed\xbf\xbf": False,       # surrogate high bound
            b"\xf4\x90\x80\x80": False,   # U+110000
            b"\xfe": False,
            b"\xff": False,
            b"": True,
        }
        got = self._labels(spark, list(cases))
        assert got == list(cases.values())

    def test_differential_vs_cpython_decoder(self, spark):
        """Deterministic pseudo-random byte strings (valid-leaning and
        uniform mixes) must agree with bytes.decode('utf-8') exactly."""
        import random

        rng = random.Random(20260816)
        payloads = []
        for _ in range(300):
            n = rng.randrange(0, 24)
            payloads.append(bytes(rng.randrange(256) for _ in range(n)))
        for _ in range(200):
            # valid-leaning: random code points re-encoded, sometimes
            # truncated mid-sequence to hit the boundary arms
            s = "".join(
                chr(rng.choice([
                    rng.randrange(0x20, 0x7F),
                    rng.randrange(0x80, 0x800),
                    rng.randrange(0x800, 0xD800),
                    rng.randrange(0x10000, 0x110000),
                ]))
                for _ in range(rng.randrange(1, 8))
            )
            b = s.encode("utf-8")
            if rng.random() < 0.3:
                b = b[: max(0, len(b) - rng.randrange(1, 4))]
            payloads.append(b)

        def py_valid(b: bytes) -> bool:
            try:
                b.decode("utf-8")
                return True
            except UnicodeDecodeError:
                return False

        got = self._labels(spark, payloads)
        want = [py_valid(b) for b in payloads]
        bad = [
            (p.hex(), g, w)
            for p, g, w in zip(payloads, got, want)
            if g != w
        ]
        assert not bad, f"{len(bad)} disagreements, first: {bad[:3]}"

    def test_charset_label_ordering(self, spark):
        df = spark.createDataFrame(
            [(b"plain",), ("café".encode(),), (b"\xff",)], "p binary"
        )
        got = [
            r["l"]
            for r in df.select(
                M.charset_label(F.col("p")).alias("l")
            ).collect()
        ]
        assert got == ["ascii", "utf-8", "binary"]
