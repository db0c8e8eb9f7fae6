"""WARC record parsing (sources/warc.py). The driver gate pins the
formula fields; these pin the closed loop on arbitrary payloads, the
length-delimited property (boundary-lookalike bytes INSIDE payloads),
and every malformation raise class. Pure-Python — no Spark session."""

from __future__ import annotations

import pytest

from gomrjob_spark.sources.warc import encode_warc, parse_warc


def _recs():
    return [
        {"uri": "https://a.example.com/1", "date": "2026-01-01T00:00:00Z",
         "payload": b"hello world"},
        {"uri": "https://b.example.com/2", "date": "2026-02-02T00:00:00Z",
         "payload": b"", "type": "response"},  # empty payload is legal
        {"uri": "https://c.example.com/3", "date": "2026-03-03T00:00:00Z",
         "payload": bytes(range(256))},  # arbitrary binary
    ]


def test_roundtrip_arbitrary_payloads():
    got = parse_warc(encode_warc(_recs()))
    assert [r["uri"] for r in got] == [r["uri"] for r in _recs()]
    assert [r["payload"] for r in got] == [r["payload"] for r in _recs()]
    assert got[1]["type"] == "response" and got[0]["type"] == "conversion"
    assert [r["content_length"] for r in got] == [11, 0, 256]


def test_payload_containing_record_boundary_lookalike():
    """The decisive property: '\\r\\n\\r\\nWARC/1.0\\r\\n' inside a
    payload is DATA. A blank-line or magic splitter would cut here;
    the length walk must not."""
    decoy = b"text\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nmore"
    recs = [
        {"uri": "u1", "date": "d1", "payload": decoy},
        {"uri": "u2", "date": "d2", "payload": b"after"},
    ]
    got = parse_warc(encode_warc(recs))
    assert len(got) == 2
    assert got[0]["payload"] == decoy
    assert got[1]["uri"] == "u2" and got[1]["payload"] == b"after"


def test_raise_on_bad_magic():
    with pytest.raises(ValueError, match="version magic"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")


def test_raise_on_unterminated_headers():
    with pytest.raises(ValueError, match="unterminated"):
        parse_warc(b"WARC/1.0\r\nContent-Length: 3")


def test_raise_on_missing_or_bad_content_length():
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\nxx\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nContent-Length: many\r\n\r\nxx\r\n\r\n")


def test_raise_on_truncated_payload():
    good = encode_warc([{"uri": "u", "date": "d", "payload": b"0123456789"}])
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(good[:-8])  # cut into the payload


def test_raise_on_missing_terminator():
    good = encode_warc([{"uri": "u", "date": "d", "payload": b"0123456789"}])
    with pytest.raises(ValueError, match="terminator"):
        parse_warc(good[:-4] + b"XXXX")


def test_garbage_between_records_is_rejected():
    two = encode_warc(
        [{"uri": "u1", "date": "d", "payload": b"a"},
         {"uri": "u2", "date": "d", "payload": b"b"}]
    )
    # splice junk between the records
    first_len = len(encode_warc([{"uri": "u1", "date": "d", "payload": b"a"}]))
    spliced = two[:first_len] + b"junk" + two[first_len:]
    with pytest.raises(ValueError, match="version magic"):
        parse_warc(spliced)


class TestHttpResponseParse:
    """HTTP response payloads (the WARC 'response' profile — the
    warc_http_headers query's parser contract)."""

    def _roundtrip(self, body: bytes, status=200, reason="OK", headers=None):
        from gomrjob_spark.sources.warc import (
            encode_http_response,
            parse_http_response,
        )

        payload = encode_http_response(
            status, reason, headers or [("Content-Type", "text/html")], body
        )
        return parse_http_response(payload)

    def test_roundtrip(self):
        r = self._roundtrip(b"hello body", status=404, reason="Not Found")
        assert r["status_code"] == 404 and r["reason"] == "Not Found"
        assert r["body"] == b"hello body"
        assert r["headers"]["content-type"] == "text/html"

    def test_header_scan_stops_at_first_blank_line(self):
        # decoy header line INSIDE the body must stay body bytes
        body = b"x\r\nContent-Type: fake/decoy\r\ny"
        r = self._roundtrip(body)
        assert r["headers"]["content-type"] == "text/html"
        assert r["body"] == body

    def test_first_header_value_wins(self):
        r = self._roundtrip(
            b"b",
            headers=[("Content-Type", "text/html"), ("Content-Type", "bad/dup")],
        )
        assert r["headers"]["content-type"] == "text/html"

    def test_content_length_mismatch_raises(self):
        from gomrjob_spark.sources.warc import parse_http_response

        payload = b"HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort"
        with pytest.raises(ValueError, match="disagrees"):
            parse_http_response(payload)

    def test_malformed_status_line_raises(self):
        from gomrjob_spark.sources.warc import parse_http_response

        for bad in (b"HTP/1.1 200 OK\r\n\r\n", b"HTTP/1.1 2x0 OK\r\n\r\n",
                    b"HTTP/1.1 200\r\n\r\n"):
            with pytest.raises(ValueError, match="status line"):
                parse_http_response(bad)

    def test_unterminated_header_block_raises(self):
        from gomrjob_spark.sources.warc import parse_http_response

        with pytest.raises(ValueError, match="unterminated"):
            parse_http_response(b"HTTP/1.1 200 OK\r\nContent-Type: a/b")


class TestFileSource:
    """File-level WARC source (r12): binaryFile -> record walk over
    writer-twin-synthesized .warc/.warc.gz files."""

    def _fixture(self, tmp_path, n=24):
        from gomrjob_spark.sources.warc import write_warc_fixture

        return write_warc_fixture(str(tmp_path / "sfX"), range(n))

    def test_fixture_layout_and_idempotence(self, tmp_path):
        import os

        from gomrjob_spark.sources.warc import write_warc_fixture

        d1 = self._fixture(tmp_path)
        # count only the fixture's own files: the glob-pruning test
        # drops a notes.txt into this SHARED (per-key, cross-session)
        # directory, which must not fail the layout count
        names = sorted(
            n for n in os.listdir(d1) if n.startswith("crawl-")
        )
        # 8 files, odd indices gzipped, >=3 records each (24 ids / 8)
        assert len(names) == 8
        assert sum(n.endswith(".warc.gz") for n in names) == 4
        # second call reuses the completed directory byte-for-byte
        stamp = os.stat(os.path.join(d1, names[0])).st_mtime_ns
        d2 = write_warc_fixture(str(tmp_path / "sfX"), range(24))
        assert d2 == d1
        assert os.stat(os.path.join(d1, names[0])).st_mtime_ns == stamp

    def test_read_back_both_compressions(self, spark, tmp_path):
        from gomrjob_spark.sources.warc import (
            fixture_record,
            read_warc_files,
        )

        d = self._fixture(tmp_path)
        rows = read_warc_files(spark, d).collect()
        assert len(rows) == 24
        by_uri = {r["target_uri"]: r for r in rows}
        for doc in range(24):
            want = fixture_record(doc)
            got = by_uri[want["uri"]]
            assert bytes(got["payload"]) == want["payload"]
            assert got["content_length"] == len(want["payload"])
            expect_gz = doc % 2 == 1
            assert got["file_name"].endswith(".gz") == expect_gz

    def test_decoy_payload_survives_file_walk(self, spark, tmp_path):
        # doc 3 (d%7==3) embeds '\r\n\r\nWARC/1.0\r\n'; a splitter
        # implementation would shift every later record in file 3
        from gomrjob_spark.sources.warc import read_warc_files

        d = self._fixture(tmp_path)
        rows = read_warc_files(spark, d).collect()
        decoys = [
            r for r in rows if b"\r\n\r\nWARC/1.0\r\n" in bytes(r["payload"])
        ]
        assert decoys  # fixture non-vacuity
        # file 3 holds docs 3,11,19 — all three parsed, in doc order
        f3 = sorted(
            (r["rec_idx"], r["target_uri"])
            for r in rows
            if r["file_name"].startswith("crawl-00003")
        )
        assert [u for _, u in f3] == [
            "https://c3.example.org/r3",
            "https://c11.example.org/r11",
            "https://c19.example.org/r6",
        ]

    def test_glob_prunes_at_listing(self, spark, tmp_path):
        from gomrjob_spark.sources.warc import read_warc_files

        d = self._fixture(tmp_path)
        # a non-WARC file in the dir must never be OPENED (a read
        # would raise: it's not parseable)
        with open(f"{d}/notes.txt", "w") as fh:
            fh.write("WARC/nope")
        rows = read_warc_files(spark, d).collect()
        assert len(rows) == 24
        gz_only = read_warc_files(spark, d, glob="*.warc.gz").collect()
        assert len(gz_only) == 12
        assert all(r["file_name"].endswith(".gz") for r in gz_only)

    def test_streaming_reader_matches_batch(self, spark, tmp_path):
        from gomrjob_spark.sources.warc import (
            read_warc_files,
            read_warc_files_stream,
        )
        from gomrjob_spark.streaming.ops import run_to_memory

        d = self._fixture(tmp_path)
        q, name = run_to_memory(
            read_warc_files_stream(spark, d).drop("payload"), mode="append"
        )
        try:
            got = {
                (r["file_name"], r["rec_idx"], r["target_uri"])
                for r in spark.table(name).collect()
            }
        finally:
            q.stop()
        want = {
            (r["file_name"], r["rec_idx"], r["target_uri"])
            for r in read_warc_files(spark, d).collect()
        }
        assert got == want

    def test_corrupt_gzip_member_raises(self, spark, tmp_path):
        from gomrjob_spark.sources.warc import read_warc_files

        d = self._fixture(tmp_path)
        bad = tmp_path / "bad"
        bad.mkdir()
        (bad / "x.warc.gz").write_bytes(b"\x1f\x8b\x08\x00garbage")
        import py4j.protocol
        from pyspark.errors import PythonException

        with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
            read_warc_files(spark, str(bad)).collect()

    def test_offsets_are_exact_byte_positions(self, spark, tmp_path):
        # the CDX contract: seeking to `offset` must land exactly on
        # the record's version line, and offset+record_bytes on the
        # next record's (prefix-sum gate for the whole walk)
        import os

        from gomrjob_spark.sources.warc import read_warc_files

        d = self._fixture(tmp_path)
        rows = read_warc_files(spark, d, glob="*.warc").collect()
        by_file: dict[str, list] = {}
        for r in rows:
            by_file.setdefault(r["file_name"], []).append(r)
        assert by_file
        for name, recs in by_file.items():
            with open(os.path.join(d, name), "rb") as fh:
                blob = fh.read()
            recs.sort(key=lambda r: r["rec_idx"])
            pos = 0
            for r in recs:
                assert r["offset"] == pos
                assert blob[pos:pos + 5] == b"WARC/"
                pos += r["record_bytes"]
            assert pos == len(blob)  # accounting covers every byte


class TestGzipMembers:
    """CC-faithful member compression (r13): split_gzip_members walks
    the DEFLATE structure, the writer's +23 size contract holds, and
    the malformation classes raise."""

    def test_split_members_roundtrip_with_offsets(self):
        from gomrjob_spark.sources.warc import (
            encode_warc,
            gzip_member,
            member_fixture_record,
            split_gzip_members,
        )

        recs = [member_fixture_record(d) for d in (2, 3, 7, 10, 17)]
        raws = [encode_warc([r]) for r in recs]
        blobs = [gzip_member(raw) for raw in raws]
        stream = b"".join(blobs)
        members = split_gzip_members(stream)
        assert len(members) == 5
        pos = 0
        for (off, csize, raw), blob, want in zip(members, blobs, raws):
            assert off == pos
            assert csize == len(blob) == len(want) + 23  # the contract
            assert raw == want
            pos += csize
        assert pos == len(stream)  # accounting covers every byte

    def test_fake_gzip_magic_in_stored_payload_is_not_a_boundary(self):
        from gomrjob_spark.sources.warc import (
            encode_warc,
            gzip_member,
            member_fixture_record,
            split_gzip_members,
        )

        # doc_id % 5 == 2 payloads END with raw 1f 8b 08
        rec = member_fixture_record(7)
        assert rec["payload"].endswith(b"\x1f\x8b\x08")
        stream = gzip_member(encode_warc([rec])) + gzip_member(
            encode_warc([member_fixture_record(8)])
        )
        # a magic-scanner sees 3+ apparent member starts; the walk sees 2
        assert stream.count(b"\x1f\x8b\x08") >= 3
        assert len(split_gzip_members(stream)) == 2

    def test_truncated_member_raises(self):
        from gomrjob_spark.sources.warc import (
            encode_warc,
            gzip_member,
            member_fixture_record,
            split_gzip_members,
        )

        blob = gzip_member(encode_warc([member_fixture_record(1)]))
        with pytest.raises(ValueError, match="truncated gzip member"):
            split_gzip_members(blob[:-3])

    def test_corrupt_member_raises_with_offset(self):
        from gomrjob_spark.sources.warc import (
            encode_warc,
            gzip_member,
            member_fixture_record,
            split_gzip_members,
        )

        good = gzip_member(encode_warc([member_fixture_record(1)]))
        bad = bytearray(good + good)
        bad[len(good)] = 0xFF  # corrupt the SECOND member's magic
        with pytest.raises(ValueError, match=f"at offset {len(good)}"):
            split_gzip_members(bytes(bad))

    def test_multi_record_member_raises(self, spark, tmp_path):
        from gomrjob_spark.sources.warc import (
            encode_warc,
            gzip_member,
            member_fixture_record,
            read_warc_member_files,
        )

        two = encode_warc(
            [member_fixture_record(1), member_fixture_record(9)]
        )
        p = tmp_path / "bad-cc.warc.gz"
        p.write_bytes(gzip_member(two))
        import py4j.protocol
        from pyspark.errors import PythonException

        with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
            read_warc_member_files(spark, str(tmp_path)).collect()

    def test_member_fixture_idempotent_and_content_addressed(self, tmp_path):
        from gomrjob_spark.sources.warc import write_warc_member_fixture

        a = write_warc_member_fixture(str(tmp_path / "sfX"), [1, 2, 3])
        b = write_warc_member_fixture(str(tmp_path / "sfX"), [1, 2, 3])
        c = write_warc_member_fixture(str(tmp_path / "sfX"), [1, 2, 4])
        assert a == b
        # same basename, same count, DIFFERENT ids -> different dir
        # (the r12 advisor's stale-cache finding)
        assert c != a

    def test_member_streaming_reader_matches_batch(self, spark, tmp_path):
        from gomrjob_spark.plans.streaming import _drain
        from gomrjob_spark.sources.warc import (
            encode_warc,
            gzip_member,
            member_fixture_record,
            read_warc_member_files,
            read_warc_member_files_stream,
        )

        for f, ids in ((0, [1, 9]), (1, [2, 12])):
            blob = b"".join(
                gzip_member(encode_warc([member_fixture_record(d)]))
                for d in ids
            )
            (tmp_path / f"crawl-cc-0000{f}.warc.gz").write_bytes(blob)
        batch = sorted(
            map(tuple, read_warc_member_files(spark, str(tmp_path)).collect())
        )
        live = sorted(
            map(
                tuple,
                _drain(
                    spark,
                    read_warc_member_files_stream(spark, str(tmp_path)),
                    "append",
                ).collect(),
            )
        )
        assert batch == live and len(batch) == 4


def test_revisit_headers_roundtrip():
    from gomrjob_spark.sources.warc import encode_warc, parse_warc

    recs = [
        {
            "uri": "https://a.example/x",
            "date": "2026-02-01T00:00:00Z",
            "type": "response",
            "record_id": "urn:rec:1",
            "payload": b"hello",
        },
        {
            "uri": "https://a.example/x",
            "date": "2026-02-02T00:00:00Z",
            "type": "revisit",
            "record_id": "urn:rec:4",
            "refers_to": "urn:rec:1",
            "profile": "identical-payload-digest",
            "payload": b"",
        },
    ]
    recs[1]["refers_to_uri"] = "https://a.example/x"
    recs[1]["refers_to_date"] = "2026-02-01T00:00:00Z"
    got = parse_warc(encode_warc(recs))
    assert got[0]["record_id"] == "urn:rec:1"
    assert got[0]["refers_to"] == ""  # absent header reads empty
    assert got[0]["refers_to_date"] == ""
    assert got[1]["type"] == "revisit"
    assert got[1]["refers_to"] == "urn:rec:1"
    assert got[1]["refers_to_uri"] == "https://a.example/x"
    assert got[1]["refers_to_date"] == "2026-02-01T00:00:00Z"
    assert got[1]["profile"] == "identical-payload-digest"
    assert got[1]["payload"] == b""


def test_revisit_fixture_nonvacuous_and_resolvable(spark, sf_dir):
    """The gated query's decision surface must actually occur: real
    revisits in BOTH ISO 28500 profiles, cross-file referents, and an
    unresolvable void decoy in EACH resolution path."""
    from gomrjob_spark.plans.web import warc_revisit_resolve

    rows = warc_revisit_resolve(spark, sf_dir).collect()
    revs = [r for r in rows if r["warc_type"] == "revisit"]
    ipd = [r for r in revs if r["profile"] == "identical-payload-digest"]
    snm = [r for r in revs if r["profile"] == "server-not-modified"]
    assert ipd and snm and len(ipd) + len(snm) == len(revs)
    # both paths have resolved rows AND their own void decoy
    for fam in (ipd, snm):
        assert any(r["resolved"] for r in fam)
        assert any(not r["resolved"] for r in fam)
    for r in revs:
        if not r["resolved"]:
            assert r["refers_doc"] is None and r["body"] is None
    by_doc = {r["doc_id"]: r for r in rows}
    for r in ipd:
        if not r["resolved"]:
            continue
        ref = by_doc[r["refers_doc"]]
        # referred record is an earlier response of the SAME url,
        # usually in a different file (doc % 8)
        assert ref["warc_type"] == "response"
        assert ref["target_uri"] == r["target_uri"]
        assert ref["doc_id"] < r["doc_id"]
        assert r["body"] == ref["body"]  # payload substituted whole
    assert any(
        r["resolved"] and r["refers_doc"] % 8 != r["doc_id"] % 8 for r in ipd
    )
    for r in snm:
        # no refers_to header at all: identity travels via companions
        assert r["refers_doc"] is None
        if r["resolved"]:
            # the body is SOME same-url response's payload whose date
            # matches the companion (the lexicographic-min tie winner)
            assert r["body"] is not None and r["refers_date"].startswith(
                "2026-02-"
            )
            donors = [
                x
                for x in rows
                if x["warc_type"] == "response"
                and x["target_uri"] == r["target_uri"]
                and x["body"] == r["body"]
            ]
            assert donors
        else:
            assert r["refers_date"] == "2026-03-01T00:00:00Z"
