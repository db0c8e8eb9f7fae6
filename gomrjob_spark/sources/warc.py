"""WARC (Web ARChive, ISO 28500) record parsing — the crawl's native
input format.

Every web-scale curation pipeline starts from WARC: Common Crawl ships
WARC/WET files, and CCNet/Dolma/RefinedWeb's position-zero step is
splitting them into (target URI, date, payload) records before any URL
or text operator runs. The format is LENGTH-DELIMITED: a version line
(``WARC/1.0``), CRLF-separated headers including ``Content-Length``,
one blank line, exactly Content-Length payload bytes, then two CRLFs.
The payload may legally contain anything — including text that LOOKS
like a record boundary — so a correct parser must walk lengths, never
split on blank lines or on the ``WARC/1.0`` magic (the classic
naive-splitter corruption; the registered query's fixture plants a
decoy ``\\r\\n\\r\\nWARC/1.0\\r\\n`` INSIDE a payload so a splitter
implementation cannot pass the hash gate).

:func:`encode_warc` is the writer twin (the codec-family closed loop);
:func:`parse_warc` the strict reader — malformed streams (bad magic,
missing/invalid Content-Length, truncated payload, missing record
terminator) raise with a precise class, per the EXIF/codec convention.
"""

from __future__ import annotations

_CRLF = b"\r\n"


def encode_warc(records: list[dict]) -> bytes:
    """Serialize records ({uri, date, payload: bytes, type?}) into a
    spec-shaped WARC stream (the WET 'conversion' profile)."""
    out = bytearray()
    for r in records:
        payload = r["payload"]
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + r.get("type", "conversion").encode("ascii"),
            b"WARC-Target-URI: " + r["uri"].encode("ascii"),
            b"WARC-Date: " + r["date"].encode("ascii"),
            b"Content-Length: " + str(len(payload)).encode("ascii"),
        ]
        out += _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """Length-delimited WARC record walk. Returns one dict per record:
    {type, uri, date, content_length, payload}. Raises ValueError (with
    the malformation class) on: a record not starting ``WARC/``, a
    header block without CRLFCRLF terminator, a missing or non-integer
    Content-Length, a payload running past the stream, or a missing
    double-CRLF record terminator."""
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        if not data[pos:pos + 5] == b"WARC/":
            raise ValueError(
                f"record at offset {pos} lacks WARC/ version magic"
            )
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header block")
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(_CRLF)
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            # keys decode with errors='replace' like values: a non-ASCII
            # byte in a header NAME must surface as a parse outcome (a
            # key that matches nothing), never a UnicodeDecodeError that
            # kills the mapInPandas task on real crawl bytes
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("ascii", "replace")
            )
        cl = headers.get("content-length")
        if cl is None or not cl.isdigit():
            raise ValueError(f"missing/invalid Content-Length {cl!r}")
        length = int(cl)
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            raise ValueError("payload truncated past stream end")
        if data[body_end:body_end + 4] != _CRLF + _CRLF:
            raise ValueError("missing CRLFCRLF record terminator")
        records.append(
            {
                "type": headers.get("warc-type", ""),
                "uri": headers.get("warc-target-uri", ""),
                "date": headers.get("warc-date", ""),
                "content_length": length,
                "payload": data[body_start:body_end],
            }
        )
        pos = body_end + 4
    return records


def encode_http_response(
    status: int, reason: str, headers: list[tuple[str, str]], body: bytes
) -> bytes:
    """Writer twin for the WARC 'response' profile payload: a full
    HTTP/1.1 response message (status line, CRLF headers, blank line,
    body). Content-Length is appended automatically so encode->parse
    is closed-loop."""
    lines = [f"HTTP/1.1 {status} {reason}".encode("ascii")]
    caller_cl = False
    for k, v in headers:
        lines.append(f"{k}: {v}".encode("ascii"))
        caller_cl = caller_cl or k.lower() == "content-length"
    # append Content-Length only when the caller didn't set one — a
    # duplicate header is malformed (RFC 9110) and the strict reader's
    # first-wins fold would then cross-check the WRONG value
    if not caller_cl:
        lines.append(b"Content-Length: " + str(len(body)).encode("ascii"))
    return _CRLF.join(lines) + _CRLF + _CRLF + body


def parse_http_response(payload: bytes) -> dict:
    """Strict HTTP/1.1 response parse of a WARC response payload:
    {status_code, reason, headers (first-wins, lower-cased keys),
    body}. Headers end at the FIRST CRLFCRLF — bytes after it are body
    even if they look like headers (the registered query's fixture
    plants a ``Content-Type: fake/decoy`` line INSIDE the body, so a
    whole-payload header scan cannot pass the hash gate). Raises
    ValueError with a precise class on: a status line not matching
    ``HTTP/<v> <3-digit> <reason>``, a header block without CRLFCRLF
    terminator, a non-integer Content-Length, or a Content-Length that
    disagrees with the actual body size (truncation corruption)."""
    hdr_end = payload.find(_CRLF + _CRLF)
    if hdr_end < 0:
        raise ValueError("unterminated HTTP header block")
    lines = payload[:hdr_end].split(_CRLF)
    status_line = lines[0].decode("ascii", "replace")
    parts = status_line.split(" ", 2)
    if (
        len(parts) < 3
        or not parts[0].startswith("HTTP/")
        or not (len(parts[1]) == 3 and parts[1].isdigit())
    ):
        raise ValueError(f"malformed HTTP status line {status_line!r}")
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        # errors='replace' on the NAME too — a non-ASCII header-name
        # byte is a malformed header, not a task-killing decode crash
        key = k.strip().decode("ascii", "replace").lower()
        if key not in headers:  # first value wins, per RFC 9110 folding
            headers[key] = v.strip().decode("ascii", "replace")
    body = payload[hdr_end + 4:]
    cl = headers.get("content-length")
    if cl is not None:
        if not cl.isdigit():
            raise ValueError(f"invalid Content-Length {cl!r}")
        if int(cl) != len(body):
            raise ValueError(
                f"Content-Length {cl} disagrees with body size {len(body)}"
            )
    return {
        "status_code": int(parts[1]),
        "reason": parts[2],
        "headers": headers,
        "body": body,
    }
