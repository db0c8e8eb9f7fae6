"""URL/domain-level curation queries (operators/urls.py) + DuckDB oracles.

The documents fixture has no URL column, so every query synthesizes one
per document with :func:`gomrjob_spark.operators.urls.synth_url` — a pure
formula in ``doc_id`` that the oracle recomputes byte-for-byte
(``_URL_RAW_SQL``), the multimodal synthesis device. The oracle then
re-implements the WHOLE normalization contract independently in SQL
(``_URL_NORM_SQL``: regexp part-extraction + list_filter param stripping),
so the hash gate compares two independent normalizer implementations,
not one formula against itself.

Formula shape (see operators/urls.py synth_url): semantic components
derive from ``g = doc_id DIV 3``, noise (case, www., default ports,
tracking params, fragments, trailing slashes) from ``doc_id`` — each
consecutive id-triple is one resource behind three raw variants, so
URL-level dedup has real work to do and the expected group size is known
by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gomrjob_spark.catalog import load_table
from gomrjob_spark.operators import urls
from gomrjob_spark.plans.html import _html_gate_oracle
from gomrjob_spark.plans.registry import query

#: the oracle's copy of the synth_url formula (byte-identical output)
_URL_RAW_SQL = """
    u0 AS (
      SELECT doc_id, doc_id // 3 AS g FROM documents
    ),
    u1 AS (
      SELECT doc_id, g,
        CASE WHEN g % 2 = 0 THEN 'http' ELSE 'https' END AS scheme_sem,
        'cdn' || CAST(g % 5 AS VARCHAR) || '.site' || CAST(g % 11 AS VARCHAR)
          || CASE g % 3 WHEN 0 THEN '.com' WHEN 1 THEN '.org'
             ELSE '.co.uk' END AS host_sem
      FROM u0
    ),
    u2 AS (
      SELECT doc_id, g,
        CASE WHEN doc_id % 4 = 2 THEN upper(scheme_sem)
             ELSE scheme_sem END AS scheme_raw,
        CASE WHEN doc_id % 4 = 3
             THEN upper(CASE WHEN doc_id % 5 = 0 THEN 'www.' || host_sem
                             ELSE host_sem END)
             ELSE CASE WHEN doc_id % 5 = 0 THEN 'www.' || host_sem
                       ELSE host_sem END END AS host_raw,
        CASE WHEN g % 7 = 0 THEN ':8080'
             WHEN doc_id % 5 = 1 THEN CASE WHEN g % 2 = 0 THEN ':80'
                                           ELSE ':443' END
             ELSE '' END AS port_raw,
        CASE WHEN g % 13 = 0 THEN CASE WHEN doc_id % 3 = 1 THEN '/'
                                       ELSE '' END
             ELSE '/a' || CAST(g % 4 AS VARCHAR) || '/p'
                  || CAST(g AS VARCHAR)
                  || CASE WHEN doc_id % 3 = 1 THEN '/' ELSE '' END
             END AS path_raw,
        CASE WHEN g % 17 = 0 THEN ''
             ELSE '&id=' || CAST(g AS VARCHAR) END AS id_amp,
        CASE WHEN g % 17 = 0 THEN ''
             ELSE 'id=' || CAST(g AS VARCHAR) || '&' END AS id_q
      FROM u1
    ),
    urls AS MATERIALIZED (
      SELECT doc_id, g,
        scheme_raw || '://' || host_raw || port_raw || path_raw
        || CASE doc_id % 3
             WHEN 0 THEN '?utm_source=u' || CAST(doc_id % 7 AS VARCHAR)
                         || id_amp || '&utm_campaign=x'
             WHEN 1 THEN '?' || id_q || 'gclid=g' || CAST(doc_id AS VARCHAR)
             ELSE '?fbclid=f' || CAST(doc_id AS VARCHAR) || id_amp END
        || CASE WHEN doc_id % 2 = 0 THEN '#s' || CAST(doc_id % 4 AS VARCHAR)
                ELSE '' END AS url
      FROM u2
    )"""

#: independent SQL re-implementation of the normalization contract
_URL_NORM_SQL = """
    parts AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
        regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1) AS auth,
        regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS raw_path,
        regexp_extract(url, '\\?([^#]*)', 1) AS raw_q
      FROM urls
    ),
    np AS MATERIALIZED (
      SELECT doc_id, url, scheme,
        regexp_replace(lower(regexp_replace(auth, ':[0-9]+$', '')),
                       '^www\\.', '') AS host,
        regexp_extract(auth, ':([0-9]+)$', 1) AS port,
        CASE WHEN raw_path = '' THEN '/'
             WHEN length(raw_path) > 1 AND raw_path LIKE '%/'
             THEN substr(raw_path, 1, CAST(length(raw_path) AS INT) - 1)
             ELSE raw_path END AS path_n,
        coalesce(array_to_string(
          list_filter(string_split(raw_q, '&'),
            p -> NOT (starts_with(p, 'utm_') OR starts_with(p, 'gclid=')
                      OR starts_with(p, 'fbclid=') OR p = '')), '&'),
          '') AS q_kept
      FROM parts
    ),
    normed AS MATERIALIZED (
      SELECT doc_id, url, host,
        scheme || '://' || host
        || CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                     OR (scheme = 'https' AND port = '443')
                THEN '' ELSE ':' || port END
        || path_n
        || CASE WHEN q_kept = '' THEN '' ELSE '?' || q_kept END AS norm_url,
        CASE WHEN host LIKE '%.co.uk'
             THEN regexp_extract(host, '([^.]+\\.co\\.uk)$', 1)
             ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1)
             END AS registered_domain
      FROM np
    )"""

_URL_CTES = _URL_RAW_SQL + "," + _URL_NORM_SQL

#: registered-domain blocklist for the gate queries — all four exist in
#: the synthesized host space (g ranges over 0..n/3; membership proven
#: in tests/test_urls.py so the gate is never vacuously all-admitted)
BLOCKLIST = ["site3.org", "site7.com", "site5.co.uk", "site0.com"]


def _docs_with_urls(
    spark: SparkSession, sf_dir: str, with_text: bool = False
) -> DataFrame:
    """Documents + synthesized URL; ``with_text=True`` keeps the text
    column (the link-layer queries build pages from the SAME scan — no
    self-join) and fans the single-row-group fixture file across the
    local cores (text.spread — a no-op on a real cluster; the HTML
    regex work is CPU-bound and serializes into one task otherwise)."""
    cols = ["doc_id", "text", "lang"] if with_text else ["doc_id"]
    docs = load_table(spark, sf_dir, "documents").select(*cols)
    if with_text:
        from gomrjob_spark.operators.text import spread

        docs = spread(docs)
    return docs.withColumn("url", urls.synth_url("doc_id"))


@query(
    "url_canonicalize",
    oracle=f"""
    WITH {_URL_CTES}
    SELECT doc_id, url, norm_url, host, registered_domain
    FROM normed ORDER BY doc_id
    """,
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (urls.url_normalize + registered_domain) —
    the first operator of every crawl pipeline: tracking params,
    fragments, case noise, default ports, www. prefixes, and trailing
    slashes all collapse per the 6-rule contract in operators/urls.py.
    Pure row-local codegen over the scan (parse_url + regex + one array
    HOF): ZERO shuffles, the langid-gate property — this runs FIRST on
    the raw 100 TB crawl. The oracle re-normalizes the same raw URLs
    with an independent regexp implementation, so the hash gate is a
    two-implementation differential test of the contract itself."""
    return (
        urls.with_url_columns(_docs_with_urls(spark, sf_dir))
        .select("doc_id", "url", "norm_url", "host", "registered_domain")
        .orderBy("doc_id")
    )


@query(
    "dedup_url_exact",
    oracle=f"""
    WITH {_URL_CTES}
    SELECT norm_url,
           CAST(min(doc_id) AS BIGINT) AS keeper,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT) AS n_raw_variants
    FROM normed GROUP BY norm_url ORDER BY keeper
    """,
)
def dedup_url_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup (urls.url_exact_dedup): group documents by
    CANONICAL url, survivor = min doc_id. By construction each id-triple
    shares one resource behind three raw variants (tracking params /
    fragments / case / slash noise), so the groups are real and the raw
    variant counts prove normalization did the collapsing — the CCNet
    first-pass dedup that removes ~an order of magnitude of recrawl
    volume before any text op runs. One partial-agg shuffle carrying
    canonical URLs + ids only; document text never enters the
    exchange."""
    return (
        urls.url_exact_dedup(_docs_with_urls(spark, sf_dir))
        .orderBy("keeper")
    )


@query(
    "url_domain_gate",
    oracle=f"""
    WITH {_URL_CTES}
    SELECT doc_id, norm_url, registered_domain,
           registered_domain IN ('site3.org', 'site7.com', 'site5.co.uk',
                                 'site0.com') AS blocked,
           NOT registered_domain IN ('site3.org', 'site7.com',
                                     'site5.co.uk', 'site0.com') AS admitted
    FROM normed ORDER BY doc_id
    """,
)
def url_domain_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist admission (urls.domain_gate): per-document
    verdict from the registered domain against a literal blocklist —
    the Dolma/RefinedWeb deny-list gate. Row-local membership test on
    the scan projection; zero shuffles. Blocklist membership is
    non-vacuous by construction (tests/test_urls.py pins that every
    blocklisted domain occurs and that both verdict classes are
    populated)."""
    return (
        urls.domain_gate(_docs_with_urls(spark, sf_dir), BLOCKLIST)
        .orderBy("doc_id")
    )


@query(
    "url_domain_stats",
    oracle=f"""
    WITH {_URL_CTES}
    SELECT registered_domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT norm_url) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
    FROM normed GROUP BY registered_domain ORDER BY registered_domain
    """,
)
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain crawl profile (docs, distinct canonical
    URLs, distinct hosts) — the composition report a crawl operator
    reads before choosing domain caps (RefinedWeb caps per-domain doc
    share; this is the input to that policy). One partial-agg shuffle
    keyed on the domain; counts of distinct canonical URLs/hosts are
    exact (the domain key space is small; at 100 TB swap the exact
    distincts for HLL sketches — agg_approx_distinct is the registered
    variant of that trade)."""
    staged = urls.with_url_columns(_docs_with_urls(spark, sf_dir))
    return (
        staged.groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("norm_url").cast("bigint").alias("n_urls"),
            F.countDistinct("host").cast("bigint").alias("n_hosts"),
        )
        .orderBy("registered_domain")
    )


@query(
    "sample_domain_cap",
    oracle=f"""
    WITH {_URL_CTES},
    pri AS (
      SELECT doc_id, registered_domain,
             md5('cap' || CAST(doc_id AS VARCHAR)) AS pri
      FROM normed
    ),
    ranked AS (
      SELECT doc_id, registered_domain, pri,
             row_number() OVER (PARTITION BY registered_domain
                                ORDER BY pri ASC, doc_id ASC) AS rank
      FROM pri
    )
    SELECT doc_id, registered_domain, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 8 ORDER BY doc_id
    """,
)
def sample_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (RefinedWeb's anti-domination step: a
    handful of hosts contribute half of any crawl, and capping them is
    the step right after URL dedup) — at most 8 documents per
    registered domain, selected by a DETERMINISTIC md5 priority so the
    kept set is rerun-stable and engine-exact. Composes the URL family
    with sampling.cap_per_group, which is skew-safe by construction:
    a local top-k per (domain, scan-partition) pre-prune bounds every
    task BEFORE the per-domain global rank, so the hottest domain at
    100 TB never serializes into one sort task. Non-vacuous at sf0.01:
    every domain holds ~15 docs, so the cap genuinely drops ~half."""
    from gomrjob_spark.operators.sampling import cap_per_group

    staged = urls.with_url_columns(_docs_with_urls(spark, sf_dir)).select(
        "doc_id",
        "registered_domain",
        F.md5(F.concat(F.lit("cap"), F.col("doc_id").cast("string"))).alias(
            "pri"
        ),
    )
    capped = cap_per_group(
        staged, "registered_domain", k=8, order_col="pri",
        id_col="doc_id", descending=False,
    )
    return (
        capped.select("doc_id", "registered_domain", F.col("rank").cast("int").alias("rank"))
        .orderBy("doc_id")
    )


@query(
    "warc_parse_records",
    oracle="""
    WITH recs AS (
      SELECT doc_id, j,
        'https://w' || CAST(doc_id AS VARCHAR) || '.example.com/p'
          || CAST(j AS VARCHAR) AS target_uri,
        '2026-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
          || 'T00:00:00Z' AS warc_date,
        'doc ' || CAST(doc_id AS VARCHAR) || ' rec ' || CAST(j AS VARCHAR)
          || ' ' || repeat('x', CAST(10 + (doc_id + j) % 7 AS INT))
          || CASE WHEN doc_id % 5 = 0 AND j = 0
                  THEN chr(13) || chr(10) || chr(13) || chr(10)
                       || 'WARC/1.0' || chr(13) || chr(10)
                  ELSE '' END AS payload
      FROM documents, unnest(generate_series(0, CAST(doc_id % 3 AS BIGINT))) s(j)
    )
    SELECT doc_id, CAST(j AS INT) AS rec_idx, target_uri, warc_date,
           CAST(length(payload) AS BIGINT) AS content_length,
           md5(payload) AS payload_md5
    FROM recs ORDER BY doc_id, rec_idx
    """,
)
def warc_parse_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WARC (ISO 28500) record parsing under the hash gate — the
    crawl's native input format and the step BEFORE even the URL gate:
    every document synthesizes a multi-record WET-profile WARC stream
    (1-3 records, formula URIs/dates/payloads) with the writer twin
    (sources.warc.encode_warc), and the reader walks it
    LENGTH-DELIMITED (sources.warc.parse_warc). Every 5th document's
    first payload embeds a decoy '\\r\\n\\r\\nWARC/1.0\\r\\n' — legal
    payload bytes that a naive blank-line/magic splitter would treat
    as a record boundary, truncating the payload and shifting every
    later record: such an implementation cannot pass this gate (the
    oracle recomputes URIs, dates, exact lengths, and payload md5 from
    the formulas). Malformation classes (bad magic, unterminated
    headers, missing/invalid Content-Length, truncated payload,
    missing terminator) raise precisely — tests/test_warc.py.
    Scan-local Arrow-batched synth+parse; zero shuffles before the
    oracle-determinism orderBy."""
    import pandas as pd  # noqa: PLC0415

    from gomrjob_spark.sources.warc import encode_warc, parse_warc

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "rec_idx", "target_uri", "warc_date",
                "content_length", "payload_md5",
            )}
            import hashlib

            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                recs = []
                for j in range(1 + d % 3):
                    payload = (
                        f"doc {d} rec {j} " + "x" * (10 + (d + j) % 7)
                        + ("\r\n\r\nWARC/1.0\r\n" if d % 5 == 0 and j == 0
                           else "")
                    ).encode("ascii")
                    recs.append(
                        {
                            "uri": f"https://w{d}.example.com/p{j}",
                            "date": f"2026-01-{1 + d % 28:02d}T00:00:00Z",
                            "payload": payload,
                        }
                    )
                stream = encode_warc(recs)
                for j, rec in enumerate(parse_warc(stream)):
                    rows["doc_id"].append(d)
                    rows["rec_idx"].append(j)
                    rows["target_uri"].append(rec["uri"])
                    rows["warc_date"].append(rec["date"])
                    rows["content_length"].append(rec["content_length"])
                    rows["payload_md5"].append(
                        hashlib.md5(rec["payload"]).hexdigest()
                    )
            yield pd.DataFrame(rows)

    from gomrjob_spark.operators.text import spread

    out = spread(docs).mapInPandas(
        run,
        schema=(
            "doc_id bigint, rec_idx int, target_uri string, "
            "warc_date string, content_length bigint, payload_md5 string"
        ),
    )
    return out.orderBy("doc_id", "rec_idx")


@query(
    "warc_http_headers",
    oracle="""
    WITH bodies AS (
      SELECT doc_id,
        'doc ' || CAST(doc_id AS VARCHAR) || ' body '
        || repeat('y', CAST(doc_id % 11 AS INT))
        || CASE WHEN doc_id % 4 = 0
                THEN chr(13) || chr(10) || 'Content-Type: fake/decoy'
                     || chr(13) || chr(10)
                ELSE '' END AS body
      FROM documents
    )
    SELECT doc_id,
      CAST(CASE WHEN doc_id % 10 = 0 THEN 404 ELSE 200 END AS INT)
        AS status_code,
      CASE WHEN doc_id % 10 = 0 THEN 'Not Found' ELSE 'OK' END AS reason,
      CASE doc_id % 3 WHEN 1 THEN 'text/plain' ELSE 'text/html' END
        AS mime_type,
      CASE doc_id % 3 WHEN 0 THEN 'utf-8' WHEN 2 THEN 'iso-8859-1' END
        AS charset,
      CAST(3 AS BIGINT) AS n_headers,
      CAST(len(body) AS BIGINT) AS body_len,
      md5(body) AS body_md5
    FROM bodies ORDER BY doc_id
    """,
)
def warc_http_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP response parsing inside WARC payloads — the WAT-derivation
    step Common Crawl's 'response' profile actually requires (the WARC
    payload is a FULL HTTP/1.1 message; the document body starts only
    after the HTTP header block): each document synthesizes a WARC
    response record whose payload is a formula HTTP response
    (status/content-type/charset/body all doc_id formulas), the WARC
    walk is length-delimited (sources.warc.parse_warc), and the HTTP
    parse is strict (sources.warc.parse_http_response): headers end at
    the FIRST CRLFCRLF — every 4th document's body embeds a decoy
    'Content-Type: fake/decoy' line, so a whole-payload header scan
    reports the wrong content type and cannot hash-match; the parser
    also cross-checks Content-Length against the actual body size
    (truncation detection). The oracle recomputes status, media type,
    charset parameter, header count, and body length+md5 from the
    formulas alone. Scan-local Arrow-batched synth+parse; zero
    shuffles before the oracle-determinism orderBy."""
    import hashlib  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    from gomrjob_spark.sources.warc import (
        encode_http_response,
        encode_warc,
        parse_http_response,
        parse_warc,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "status_code", "reason", "mime_type", "charset",
                "n_headers", "body_len", "body_md5",
            )}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                body = (
                    f"doc {d} body " + "y" * (d % 11)
                    + ("\r\nContent-Type: fake/decoy\r\n" if d % 4 == 0
                       else "")
                ).encode("ascii")
                status, reason = (404, "Not Found") if d % 10 == 0 else (200, "OK")
                ctype = {
                    0: "text/html; charset=utf-8",
                    1: "text/plain",
                    2: "text/html; charset=iso-8859-1",
                }[d % 3]
                payload = encode_http_response(
                    status, reason,
                    [("Content-Type", ctype), ("X-Doc", str(d))], body,
                )
                stream = encode_warc([{
                    "uri": f"https://w{d}.example.com/",
                    "date": f"2026-01-{1 + d % 28:02d}T00:00:00Z",
                    "payload": payload,
                    "type": "response",
                }])
                (rec,) = parse_warc(stream)
                resp = parse_http_response(rec["payload"])
                raw_ct = resp["headers"]["content-type"]
                mime = raw_ct.split(";", 1)[0].strip()
                charset = None
                for part in raw_ct.split(";")[1:]:
                    k, _, v = part.strip().partition("=")
                    if k.lower() == "charset":
                        charset = v
                rows["doc_id"].append(d)
                rows["status_code"].append(resp["status_code"])
                rows["reason"].append(resp["reason"])
                rows["mime_type"].append(mime)
                rows["charset"].append(charset)
                rows["n_headers"].append(len(resp["headers"]))
                rows["body_len"].append(len(resp["body"]))
                rows["body_md5"].append(
                    hashlib.md5(resp["body"]).hexdigest()
                )
            yield pd.DataFrame(rows)

    from gomrjob_spark.operators.text import spread

    out = spread(docs).mapInPandas(
        run,
        schema=(
            "doc_id bigint, status_code int, reason string, "
            "mime_type string, charset string, n_headers bigint, "
            "body_len bigint, body_md5 string"
        ),
    )
    return out.orderBy("doc_id")


#: the file-level WARC fixture's per-record formulas (mirrors
#: sources.warc.fixture_record character-for-character): 8 files by
#: doc_id % 8, odd files gzipped, decoy boundary inside every
#: 7th-mod-3 payload
_WARC_FILE_RECS_SQL = """wrecs AS (
      SELECT doc_id, doc_id % 8 AS file_idx,
        'crawl-0000' || CAST(doc_id % 8 AS VARCHAR)
          || CASE WHEN doc_id % 2 = 1 THEN '.warc.gz' ELSE '.warc' END
          AS file_name,
        'https://c' || CAST(doc_id AS VARCHAR) || '.example.org/r'
          || CAST(doc_id % 13 AS VARCHAR) AS target_uri,
        '2026-02-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
          || 'T00:00:00Z' AS warc_date,
        'crawl doc ' || CAST(doc_id AS VARCHAR) || ' file '
          || CAST(doc_id % 8 AS VARCHAR) || ' '
          || repeat('y', CAST(9 + doc_id % 11 AS INT))
          || CASE WHEN doc_id % 7 = 3
                  THEN chr(13) || chr(10) || chr(13) || chr(10)
                       || 'WARC/1.0' || chr(13) || chr(10)
                  ELSE '' END AS payload
      FROM documents
    )"""


def _warc_file_oracle(pred: str = "TRUE") -> str:
    """Oracle for the file-level WARC source: recompute every field of
    every record — including its FILE assignment and position IN the
    file — from the fixture formulas; ``pred`` restricts to a file
    subset (the streaming twin reads only the gzip glob)."""
    return f"""
    WITH {_WARC_FILE_RECS_SQL}
    SELECT file_name,
      CAST(row_number() OVER (PARTITION BY file_idx ORDER BY doc_id) - 1
           AS INT) AS rec_idx,
      CAST(doc_id AS BIGINT) AS doc_id, target_uri, warc_date,
      CAST(length(payload) AS BIGINT) AS content_length,
      md5(payload) AS payload_md5
    FROM wrecs WHERE {pred} ORDER BY file_name, rec_idx
    """


def _warc_fixture_records(
    spark: SparkSession, sf_dir: str, stream: bool = False, glob: str = "*.warc*"
) -> DataFrame:
    """Shared front half of the two file-source queries: write the
    fixture files (driver-side test scaffolding — bounded at one int
    per document; the operator under test is the distributed reader),
    then read them back through the binaryFile source."""
    from gomrjob_spark.sources.warc import (
        read_warc_files,
        read_warc_files_stream,
        write_warc_fixture,
    )

    ids = [
        r[0]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    fixture = write_warc_fixture(sf_dir, ids)
    reader = read_warc_files_stream if stream else read_warc_files
    recs = reader(spark, fixture, glob=glob)
    return recs.select(
        "file_name",
        F.col("rec_idx").cast("int").alias("rec_idx"),
        F.regexp_extract(F.col("target_uri"), r"^https://c([0-9]+)\.", 1)
        .cast("bigint")
        .alias("doc_id"),
        "target_uri",
        "warc_date",
        "content_length",
        F.md5(F.col("payload")).alias("payload_md5"),
        "offset",
        "record_bytes",
    )


_REVISIT_PAYLOAD_SQL = """'capture doc ' || CAST({d} AS VARCHAR) || ' of u'
      || CAST({d} % 17 AS VARCHAR) || ' '
      || repeat('x', CAST(11 + {d} % 7 AS INT))
      || CASE WHEN {d} % 7 = 3
              THEN chr(13) || chr(10) || chr(13) || chr(10)
                   || 'WARC/1.0' || chr(13) || chr(10)
              ELSE '' END"""


@query(
    "warc_revisit_resolve",
    oracle=f"""
    WITH caps AS (
      SELECT doc_id AS d, doc_id % 17 AS grp FROM documents
    ),
    marked AS (
      SELECT d, grp,
        (d % 3 = 1 AND d <> min(d) OVER (PARTITION BY grp)) AS is_rev
      FROM caps
    ),
    reffed AS (
      SELECT d, grp, is_rev,
        max(CASE WHEN NOT is_rev THEN d END) OVER (
          PARTITION BY grp ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_resp
      FROM marked
    ),
    resp_set AS (
      SELECT d, grp, 1 + d % 28 AS day,
             'urn:rec:' || CAST(d AS VARCHAR) AS rid
      FROM marked WHERE NOT is_rev
    ),
    snm AS (
      SELECT r.d AS rev_d, min(p.rid) AS win_rid
      FROM reffed r JOIN resp_set p
        ON p.grp = r.grp AND p.day = 1 + r.prev_resp % 28
      WHERE r.is_rev AND r.d % 2 = 1 AND r.d % 9 <> 7
      GROUP BY r.d
    ),
    base AS (
      SELECT r.*,
        CAST(CASE WHEN s.win_rid IS NOT NULL THEN
          regexp_extract(s.win_rid, 'urn:rec:([0-9]+)', 1) END AS BIGINT)
          AS win_d
      FROM reffed r LEFT JOIN snm s ON s.rev_d = r.d
    )
    SELECT CAST(d AS BIGINT) AS doc_id,
      'https://dup.example.org/u' || CAST(grp AS VARCHAR) AS target_uri,
      CASE WHEN is_rev THEN 'revisit' ELSE 'response' END AS warc_type,
      CASE WHEN NOT is_rev THEN ''
           WHEN d % 2 = 0 THEN 'identical-payload-digest'
           ELSE 'server-not-modified' END AS profile,
      CAST(CASE WHEN is_rev AND d % 2 = 0 AND d % 9 <> 7 THEN prev_resp
           END AS BIGINT) AS refers_doc,
      CASE WHEN is_rev AND d % 9 <> 7
           THEN '2026-02-' || lpad(CAST(1 + prev_resp % 28 AS VARCHAR),
                                   2, '0') || 'T00:00:00Z'
           WHEN is_rev AND d % 2 = 1 THEN '2026-03-01T00:00:00Z'
           ELSE '' END AS refers_date,
      (NOT is_rev) OR (d % 2 = 0 AND d % 9 <> 7) OR (win_d IS NOT NULL)
        AS resolved,
      CASE WHEN NOT is_rev THEN {_REVISIT_PAYLOAD_SQL.format(d="d")}
           WHEN d % 2 = 0 AND d % 9 <> 7
             THEN {_REVISIT_PAYLOAD_SQL.format(d="prev_resp")}
           WHEN win_d IS NOT NULL
             THEN {_REVISIT_PAYLOAD_SQL.format(d="win_d")}
           END AS body
    FROM base ORDER BY doc_id
    """,
)
def warc_revisit_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ``revisit`` resolution (r14, the r13 verdict's item #6) —
    how Common Crawl expresses URL-level dedup, BOTH standard ISO
    28500 profiles: ``identical-payload-digest`` (§6.7.2, resolved by
    ``WARC-Refers-To`` record id) and ``server-not-modified`` (§6.7.1,
    the origin answered 304 — NO refers-to header at all; resolved by
    the §5.11 ``WARC-Refers-To-Target-URI``/``-Date`` companions, ties
    on the (uri, date) key broken by the lexicographically smallest
    record id — a documented deterministic rule both engines mirror).
    A pipeline that ignores revisits silently loses ~10-15% of real CC
    captures; one that handles only the digest profile still loses the
    304s. The writer twin synthesizes 8 files where captures share
    URLs (group d%17); every later d%3==1 capture in a group is a
    revisit of the most recent PRECEDING response (usually in a
    DIFFERENT file — resolution is genuinely cross-file), even d by
    record id, odd d by the companions alone; each path carries its
    own d%9==7 VOID decoy (a void record id / a date no capture has)
    that must surface as resolved=false with a NULL body — a resolver
    that inner-joins, drops, or substitutes the revisit's own empty
    payload cannot hash-match. The oracle recomputes the group mins,
    the preceding-response window lag, the (uri, date) winner with the
    tie rule, the void rules, and every resolved body from doc-id
    formulas.

    Plan (sources/warc.py resolve_revisits): responses pass through
    with NO shuffle; the revisit rows plus (key, payload) projections
    of the responses shuffle for the two left equi-joins — the minimum
    data movement resolution admits at CC scale."""
    from gomrjob_spark.sources.warc import (
        read_warc_files,
        resolve_revisits,
        write_warc_revisit_fixture,
    )

    ids = [
        r[0]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    fixture = write_warc_revisit_fixture(sf_dir, ids)
    recs = read_warc_files(spark, fixture, with_ids=True)
    res = resolve_revisits(recs)
    return res.select(
        F.regexp_extract(F.col("record_id"), r"^urn:rec:([0-9]+)$", 1)
        .cast("bigint")
        .alias("doc_id"),
        "target_uri",
        "warc_type",
        "profile",
        # try_cast: a void/absent referent extracts as '' and must land
        # NULL, not throw under ANSI mode; SNM revisits have no
        # refers_to at all, so refers_doc is NULL there by design (the
        # winner's identity is gated through the body bytes)
        F.regexp_extract(F.col("refers_to"), r"^urn:rec:([0-9]+)$", 1)
        .try_cast("bigint")
        .alias("refers_doc"),
        # the §5.11 companion date (absent on responses and on the
        # id-path void decoys)
        F.col("refers_to_date").alias("refers_date"),
        "resolved",
        F.col("resolved_payload").cast("string").alias("body"),
    ).orderBy("doc_id")


@query("warc_file_source", oracle=_warc_file_oracle())
def warc_file_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-level WARC ingestion — real multi-record ``.warc`` AND
    ``.warc.gz`` FILES from storage through the binaryFile source into
    the length-delimited walk (sources/warc.py). This is the
    reference's own position-zero capability — input file globs
    (runner.go:51-52) fed to the job's mappers (hdfs/job.go:27-56) —
    applied to the crawl format: Common Crawl ingestion is
    file-granular (~1 GiB gzip segments, not splittable), so ONE WHOLE
    FILE PER TASK is the correct 100 TB parallel unit and the file
    COUNT supplies the parallelism. The writer twin synthesizes 8
    fixture files (4 plain + 4 gzipped, records assigned by doc_id %
    8) so the oracle recomputes every byte — file assignment, position
    in file, URI/date/length/md5 — from the same formulas; every
    7th-mod-3 payload embeds a decoy record boundary, so a naive
    blank-line splitter shifts every later record in that file and
    cannot hash-match. Zero shuffles before the oracle-determinism
    orderBy; the glob prunes at FILE LISTING time (non-WARC files are
    never opened)."""
    return (
        _warc_fixture_records(spark, sf_dir)
        .drop("offset", "record_bytes")
        .orderBy("file_name", "rec_idx")
    )


@query(
    "warc_cdx_index",
    oracle="""
    WITH """
    + _WARC_FILE_RECS_SQL
    + """,
    wlen AS (
      SELECT doc_id, file_idx, file_name, target_uri,
        CAST(length('WARC/1.0' || chr(13) || chr(10)
          || 'WARC-Type: conversion' || chr(13) || chr(10)
          || 'WARC-Target-URI: ' || target_uri || chr(13) || chr(10)
          || 'WARC-Date: ' || warc_date || chr(13) || chr(10)
          || 'Content-Length: ' || CAST(length(payload) AS VARCHAR))
          + 4 + length(payload) + 4 AS BIGINT) AS record_bytes
      FROM wrecs
    )
    SELECT file_name,
      CAST(row_number() OVER (PARTITION BY file_idx ORDER BY doc_id) - 1
           AS INT) AS rec_idx,
      CAST(doc_id AS BIGINT) AS doc_id, target_uri,
      CAST(COALESCE(sum(record_bytes) OVER (PARTITION BY file_idx
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
             1 PRECEDING), 0) AS BIGINT) AS "offset",
      record_bytes
    FROM wlen ORDER BY file_name, rec_idx
    """,
)
def warc_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-style index over the WARC files — the artifact Common Crawl
    publishes NEXT TO every crawl so consumers can random-access one
    record without walking the file: per record, its FILE, its BYTE
    OFFSET in the (decompressed) stream, and its total size. This is
    the strongest possible gate on the walk's byte accounting: the
    oracle recomputes every record's size from the writer-twin header
    grammar (version line + 4 headers + CRLF framing + payload +
    terminator) and every offset as the running sum of its
    predecessors in doc_id order — so an off-by-one ANYWHERE in the
    length walk (a swallowed pad, a miscounted CRLF, a decoy-boundary
    slip) shifts every later offset in that file and cannot
    hash-match. Divergence from Common Crawl's CDX: CC compresses each
    record as its own gzip member and indexes COMPRESSED offsets; this
    fixture compresses whole files, so offsets address the logical
    stream (identical for the plain files). The CC-faithful variant is
    warc_cdx_member_index (r13), which member-compresses and gates the
    compressed offsets. Scan-local; one window per file for the
    prefix sum."""
    return (
        _warc_fixture_records(spark, sf_dir)
        .select(
            "file_name", "rec_idx", "doc_id", "target_uri",
            "offset", "record_bytes",
        )
        .orderBy("file_name", "rec_idx")
    )


#: shared mrecs/mlen CTE chain of the member-compressed CDX oracles
#: (the +23 stored-block compressed-size contract and the formula
#: payload reconstruction) — reused verbatim by the CDXJ renderer so
#: the two gates can never drift
_CDX_MEMBER_CTES = """mrecs AS (
      SELECT doc_id, doc_id % 8 AS file_idx,
        'crawl-cc-0000' || CAST(doc_id % 8 AS VARCHAR) || '.warc.gz'
          AS file_name,
        'https://c' || CAST(doc_id AS VARCHAR) || '.example.org/r'
          || CAST(doc_id % 13 AS VARCHAR) AS target_uri,
        '2026-02-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
          || 'T00:00:00Z' AS warc_date,
        'cc member doc ' || CAST(doc_id AS VARCHAR) || ' seg '
          || CAST(doc_id % 8 AS VARCHAR) || ' '
          || repeat('z', CAST(7 + doc_id % 13 AS INT))
          || CASE WHEN doc_id % 7 = 3
                  THEN chr(13) || chr(10) || chr(13) || chr(10)
                       || 'WARC/1.0' || chr(13) || chr(10)
                  ELSE '' END AS payload_text,
        CASE WHEN doc_id % 5 = 2 THEN 3 ELSE 0 END AS magic_len
      FROM documents
    ),
    mlen AS (
      SELECT doc_id, file_idx, file_name, target_uri,
        CAST(length(payload_text) + magic_len AS BIGINT) AS payload_len,
        md5(lower(hex(payload_text))
            || CASE WHEN magic_len = 3 THEN '1f8b08' ELSE '' END)
          AS payload_hexmd5,
        CAST(length('WARC/1.0' || chr(13) || chr(10)
          || 'WARC-Type: conversion' || chr(13) || chr(10)
          || 'WARC-Target-URI: ' || target_uri || chr(13) || chr(10)
          || 'WARC-Date: ' || warc_date || chr(13) || chr(10)
          || 'Content-Length: '
          || CAST(length(payload_text) + magic_len AS VARCHAR))
          + 4 + length(payload_text) + magic_len + 4 AS BIGINT)
          AS record_bytes
      FROM mrecs
    )"""


_CDX_MEMBER_ORACLE = f"""
    WITH {_CDX_MEMBER_CTES}
    SELECT file_name,
      CAST(row_number() OVER (PARTITION BY file_idx ORDER BY doc_id) - 1
           AS INT) AS rec_idx,
      CAST(doc_id AS BIGINT) AS doc_id, target_uri,
      CAST(COALESCE(sum(record_bytes + 23) OVER (PARTITION BY file_idx
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
             1 PRECEDING), 0) AS BIGINT) AS cmp_offset,
      CAST(record_bytes + 23 AS BIGINT) AS cmp_bytes,
      record_bytes, payload_hexmd5
    FROM mlen ORDER BY file_name, rec_idx
    """


@query("warc_cdx_member_index", oracle=_CDX_MEMBER_ORACLE)
def warc_cdx_member_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CC-FAITHFUL CDX: the member-compressed variant of
    warc_cdx_index, closing its documented divergence (the r12
    verdict's item #3). Common Crawl compresses EACH RECORD as its own
    gzip member and its CDX indexes COMPRESSED offsets — the property
    that makes random access work on a real crawl: seek to cmp_offset,
    read cmp_bytes, inflate one member, get one record. The writer
    twin (sources/warc.py write_warc_member_fixture) concatenates one
    level-0/mtime=0 gzip member per record, so every member's
    compressed size is the ASSERTED arithmetic contract record_bytes +
    23 (10-byte header + 5-byte stored-block header + verbatim bytes +
    8-byte trailer) and the oracle recomputes every compressed offset
    as a running sum — one byte of drift anywhere (a mis-split member,
    a swallowed trailer, a record-walk slip) shifts every later offset
    in the file and cannot hash-match. The reader
    (split_gzip_members) finds member boundaries from the DEFLATE
    stream structure (decompressobj eof/unused_data), never by
    scanning for the 1f 8b magic: every 5th-mod-2 payload ENDS with
    those raw bytes, stored verbatim at level 0, so a magic-scanner
    splits mid-member and fails the gate; the 7th-mod-3 WARC/1.0
    boundary decoy gates the inner record walk as before. Payload
    md5 is computed over the hex encoding (DuckDB md5 is
    VARCHAR-only and the magic bytes are not valid UTF-8).
    Scan-local file-per-task walk + one per-file window."""
    return _warc_member_fixture_records(spark, sf_dir).orderBy(
        "file_name", "rec_idx"
    )


@query(
    "warc_cdx_cdxj",
    oracle=f"""
    WITH {_CDX_MEMBER_CTES},
    idx AS (
      SELECT doc_id, file_idx, file_name, target_uri,
        'org,example,c' || CAST(doc_id AS VARCHAR) || ')/r'
          || CAST(doc_id % 13 AS VARCHAR) AS surt_key,
        '202602' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
          || '000000' AS ts14,
        CAST(COALESCE(sum(record_bytes + 23) OVER (PARTITION BY file_idx
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
               1 PRECEDING), 0) AS BIGINT) AS cmp_offset,
        CAST(record_bytes + 23 AS BIGINT) AS cmp_bytes,
        payload_hexmd5
      FROM mlen
    )
    SELECT surt_key, ts14,
      surt_key || ' ' || ts14 || ' {{"url":"' || target_uri
        || '","digest":"' || payload_hexmd5
        || '","length":"' || CAST(cmp_bytes AS VARCHAR)
        || '","offset":"' || CAST(cmp_offset AS VARCHAR)
        || '","filename":"' || file_name || '"}}' AS line
    FROM idx ORDER BY surt_key, ts14
    """,
)
def warc_cdx_cdxj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT-ordered CDXJ rendering of the member-compressed CDX (r14,
    the r13 verdict's item #7): warc_cdx_member_index gates the right
    arithmetic, but real consumers (pywb, the CC index) read CDXJ —
    one line per capture, ``<SURT key> <14-digit timestamp> <JSON>``
    with the length/offset published as JSON STRINGS (the CC index
    convention) — sorted globally BY the SURT key so the index is
    binary-searchable. This query emits that drop-in-consumable
    layout byte-exactly under the hash gate: the SURT transform
    (operators/urls.py surt — host labels reversed comma-joined,
    scheme dropped), the timestamp squeeze of the WARC date, and the
    JSON rendering are all recomputed by the oracle from the same
    formulas and the SAME shared mrecs/mlen CTE chain as the member
    index, so the two gates cannot drift.

    Plan: the per-file member walk + per-file offset window as before,
    then ONE global sort — of index LINES, not data: at CC scale the
    CDXJ is ~1/1000th of the archive bytes, and a range-partitioned
    sort of the index is exactly how the real cluster.idx is built."""
    from gomrjob_spark.operators.urls import surt

    recs = _warc_member_fixture_records(spark, sf_dir, with_date=True)
    ts14 = F.regexp_replace(
        F.col("warc_date"), r"[^0-9]", ""
    )
    staged = recs.select(
        surt(F.col("target_uri")).alias("surt_key"),
        ts14.alias("ts14"),
        "target_uri",
        "payload_hexmd5",
        "cmp_bytes",
        "cmp_offset",
        "file_name",
    )
    line = F.concat(
        F.col("surt_key"), F.lit(" "), F.col("ts14"),
        F.lit(' {"url":"'), F.col("target_uri"),
        F.lit('","digest":"'), F.col("payload_hexmd5"),
        F.lit('","length":"'), F.col("cmp_bytes").cast("string"),
        F.lit('","offset":"'), F.col("cmp_offset").cast("string"),
        F.lit('","filename":"'), F.col("file_name"), F.lit('"}'),
    )
    return staged.select(
        "surt_key", "ts14", line.alias("line")
    ).orderBy("surt_key", "ts14")


def _warc_member_fixture_records(
    spark: SparkSession, sf_dir: str, stream: bool = False,
    with_date: bool = False,
) -> DataFrame:
    """Shared front half of the member-compressed source queries
    (batch CDX + streaming twin): write the CC-layout fixture
    (driver-side scaffolding), read it back through the binaryFile
    member walk, and project the gated columns."""
    from gomrjob_spark.sources.warc import (
        read_warc_member_files,
        read_warc_member_files_stream,
        write_warc_member_fixture,
    )

    ids = [
        r[0]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    fixture = write_warc_member_fixture(sf_dir, ids)
    reader = read_warc_member_files_stream if stream else read_warc_member_files
    recs = reader(spark, fixture)
    extra = [F.col("warc_date")] if with_date else []
    return recs.select(
        *extra,
        "file_name",
        F.col("rec_idx").cast("int").alias("rec_idx"),
        F.regexp_extract(F.col("target_uri"), r"^https://c([0-9]+)\.", 1)
        .cast("bigint")
        .alias("doc_id"),
        "target_uri",
        F.col("cmp_offset").cast("bigint").alias("cmp_offset"),
        F.col("cmp_bytes").cast("bigint").alias("cmp_bytes"),
        F.col("record_bytes").cast("bigint").alias("record_bytes"),
        F.md5(F.lower(F.hex(F.col("payload")))).alias("payload_hexmd5"),
    )


#: the PSL snapshot as a SQL VALUES table (mirrors
#: urls.DEFAULT_PSL_SNAPSHOT — regenerated inline so the oracle text is
#: self-contained and the two rule sets cannot drift silently: the
#: pytest twin asserts this literal equals the operator's tuple)
_PSL_RULES_SQL = """psl_rules(rule) AS (VALUES
      ('com'), ('org'), ('net'), ('edu'), ('gov'), ('io'), ('co'),
      ('uk'), ('co.uk'), ('org.uk'), ('ac.uk'), ('gov.uk'),
      ('jp'), ('co.jp'), ('ne.jp'),
      ('au'), ('com.au'), ('org.au'),
      ('*.ck'), ('!www.ck'),
      ('github.io')
    )"""


@query(
    "url_registered_domain_psl",
    oracle=f"""
    WITH {_URL_CTES},
    {_PSL_RULES_SQL},
    hv AS (
      SELECT doc_id,
        CASE doc_id % 4
          WHEN 1 THEN 'a' || CAST(doc_id % 7 AS VARCHAR) || '.github.io'
          WHEN 2 THEN 'b' || CAST(doc_id % 5 AS VARCHAR) || '.zone'
                      || CAST(doc_id % 3 AS VARCHAR) || '.ck'
          WHEN 3 THEN CASE WHEN doc_id % 8 = 3 THEN 'github.io'
                           ELSE 'x' || CAST(doc_id % 6 AS VARCHAR)
                                || '.www.ck' END
          ELSE host END AS host_eff
      FROM normed
    ),
    heur AS (
      SELECT doc_id, host_eff,
        CASE WHEN host_eff LIKE '%.co.uk'
             THEN regexp_extract(host_eff, '([^.]+\\.co\\.uk)$', 1)
             ELSE regexp_extract(host_eff, '([^.]+\\.[^.]+)$', 1)
             END AS rd_heur,
        string_split(host_eff, '.') AS labels
      FROM hv
    ),
    rc AS (
      SELECT CASE WHEN rule LIKE '!%' THEN 'exc'
                  WHEN rule LIKE '*.%' THEN 'wild' ELSE 'plain' END AS cls,
             CASE WHEN rule LIKE '!%' THEN substr(rule, 2)
                  WHEN rule LIKE '*.%' THEN substr(rule, 3)
                  ELSE rule END AS key
      FROM psl_rules
    ),
    cand AS (
      SELECT doc_id, CAST(i AS INT) AS i,
        array_to_string(labels[CAST(i AS INT):], '.') AS s,
        len(labels) - i + 1 AS nl,
        array_to_string(labels[CAST(i + 1 AS INT):], '.') AS tail
      FROM heur, unnest(generate_series(1, len(labels))) t(i)
    ),
    m AS (
      SELECT c.doc_id, c.nl,
        bool_or(r.cls = 'exc' AND r.key = c.s) AS exc,
        bool_or((r.cls = 'plain' AND r.key = c.s)
             OR (r.cls = 'wild' AND c.nl >= 2 AND r.key = c.tail)) AS pub
      FROM cand c LEFT JOIN rc r ON r.key = c.s OR r.key = c.tail
      GROUP BY c.doc_id, c.nl
    ),
    agg AS (
      SELECT doc_id,
        max(CASE WHEN exc THEN nl END) AS exc_nl,
        max(CASE WHEN pub THEN nl END) AS pub_nl
      FROM m GROUP BY doc_id
    ),
    res AS (
      SELECT h.doc_id, h.host_eff, h.rd_heur,
        CASE WHEN a.exc_nl IS NOT NULL
             THEN array_to_string(
               h.labels[CAST(len(h.labels) - a.exc_nl + 1 AS INT):], '.')
             WHEN len(h.labels) > COALESCE(a.pub_nl, 1)
             THEN array_to_string(
               h.labels[CAST(len(h.labels) - COALESCE(a.pub_nl, 1)
                        AS INT):], '.')
             ELSE NULL END AS rd_psl
      FROM heur h JOIN agg a ON a.doc_id = h.doc_id
    )
    SELECT doc_id, host_eff AS host,
      rd_heur AS registered_domain_heuristic,
      rd_psl AS registered_domain_psl,
      rd_psl IS DISTINCT FROM rd_heur AS diverges
    FROM res ORDER BY doc_id
    """,
)
def url_registered_domain_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT public-suffix-list registrable domains THROUGH THE DRIVER
    GATE (the r12 verdict's item #4 — the path existed but had only
    pytest proof): per document, the normalized fixture host is
    replaced for three of every four ids by a divergence-device host
    exercising every PSL rule class the two-label heuristic cannot
    see — a private-section suffix (aN.github.io: PSL keeps 3 labels),
    a wildcard TLD (bN.zoneM.ck: ``*.ck`` makes zoneM.ck itself the
    public suffix), the wildcard's canonical exception (xN.www.ck:
    ``!www.ck`` caps it — agreeing with the heuristic, which is the
    point of exceptions), and a host that IS a public suffix
    (github.io -> null registrable). Both the heuristic verdict and
    the PSL verdict land in the gated output with an explicit
    ``diverges`` flag, so the divergence surface is pinned row by row.

    The oracle implements the published PSL algorithm independently —
    rules as a VALUES table classified into plain/wildcard/exception,
    candidate label-suffix expansion, exception-prevails then
    longest-rule-wins then the default ``*`` rule — against
    urls.registered_domain_psl's broadcast-map row-local fold (zero
    shuffles: the rule set rides a 1-row broadcast onto the scan).
    Snapshot drift between the SQL VALUES table and
    urls.DEFAULT_PSL_SNAPSHOT is pinned by
    tests/test_urls.py::test_psl_oracle_rules_match_snapshot."""
    staged = urls.with_url_columns(_docs_with_urls(spark, sf_dir))
    d = F.col("doc_id")
    host_eff = (
        F.when(
            d % 4 == 1,
            F.concat(F.lit("a"), (d % 7).cast("string"), F.lit(".github.io")),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit("b"), (d % 5).cast("string"), F.lit(".zone"),
                (d % 3).cast("string"), F.lit(".ck"),
            ),
        )
        .when(
            d % 4 == 3,
            F.when(d % 8 == 3, F.lit("github.io")).otherwise(
                F.concat(
                    F.lit("x"), (d % 6).cast("string"), F.lit(".www.ck")
                )
            ),
        )
        .otherwise(F.col("host"))
    )
    hv = staged.select("doc_id", host_eff.alias("host"))
    out = urls.registered_domain_psl(hv, host_col="host")
    return out.select(
        "doc_id",
        "host",
        urls.registered_domain("host").alias(
            "registered_domain_heuristic"
        ),
        F.col("registered_domain_psl"),
        (
            ~F.col("registered_domain_psl").eqNullSafe(
                urls.registered_domain("host")
            )
        ).alias("diverges"),
    ).orderBy("doc_id")


@query(
    "sitemap_frontier",
    oracle="WITH "
    + _URL_CTES
    + """,
    doms AS (
      SELECT DISTINCT registered_domain,
        CAST(regexp_extract(registered_domain, 'site([0-9]+)', 1)
             AS BIGINT) AS k
      FROM normed
    ),
    ent AS (
      SELECT registered_domain, k, CAST(i AS INT) AS url_idx
      FROM doms, unnest(generate_series(0, 2 + k % 4)) t(i)
    )
    SELECT registered_domain, url_idx,
      'https://' || registered_domain || '/page'
        || CAST(url_idx AS VARCHAR) AS loc,
      '2026-03-' || lpad(CAST(1 + (k + url_idx) % 28 AS VARCHAR), 2, '0')
        AS lastmod,
      CAST((1 + (k + url_idx) % 9) * 100000 AS BIGINT) AS priority_ppm
    FROM ent ORDER BY registered_domain, url_idx
    """,
)
def sitemap_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sitemap.xml frontier seeding (operators/sitemap.py) — robots'
    complement: per registered domain, the publisher's sitemap
    synthesizes from the site-number formula (the robots device), the
    XML parses row-locally (comment strip -> <url> block extraction ->
    per-field reads with the spec's whitespace trimming), and every
    entry's URL, lastmod, and exact fixed-point priority land under
    the hash gate. Every 3rd domain's file carries a COMMENTED-OUT
    decoy entry — a harvest that does not strip comments first counts
    a phantom URL and cannot match the oracle's formula-recomputed
    entries (the oracle never parses); every 2nd domain's <loc>
    values are whitespace-noised, so untrimmed extraction fails too.
    Zero shuffles beyond the domain distinct: one scan-local column
    program over ~|domains| rows."""
    from gomrjob_spark.operators.sitemap import parse_entries, synth_sitemap

    staged = urls.with_url_columns(_docs_with_urls(spark, sf_dir))
    doms = (
        staged.select("registered_domain")
        .distinct()
        .withColumn(
            "k",
            F.regexp_extract(
                F.col("registered_domain"), "site([0-9]+)", 1
            ).cast("bigint"),
        )
    )
    parsed = doms.select(
        "registered_domain",
        F.posexplode(parse_entries(synth_sitemap(F.col("k")))).alias(
            "url_idx", "e"
        ),
    )
    return parsed.select(
        "registered_domain",
        F.col("url_idx").cast("int").alias("url_idx"),
        F.col("e.loc").alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("e.priority_ppm").alias("priority_ppm"),
    ).orderBy("registered_domain", "url_idx")


#: shared decision-table chunk: is path allowed under site k's
#: synthesized robots.txt? SINGLE SOURCE for the gate, streaming-twin,
#: and funnel oracles (r12 added the two §2.2.3 pattern rules —
#: '/a*/p' wildcard on k%7==2, '/*0$' end-anchor on k%7==5 — both
#: LONGER than the base section Disallow, and the wildcard TIES the
#: Allow override so Allow-wins-tie is exercised against a pattern).
_ROBOTS_ALLOWED_CASE = """CASE
        WHEN k % 3 = 0
             AND starts_with(path, '/a' || CAST(k % 4 AS VARCHAR) || '/p')
        THEN TRUE
        WHEN k % 7 = 2 AND regexp_matches(path, '^/a.*/p') THEN FALSE
        WHEN k % 2 = 0 AND starts_with(path, '/buy') THEN FALSE
        WHEN k % 7 = 5 AND regexp_matches(path, '^/.*0$') THEN FALSE
        WHEN starts_with(path, '/a' || CAST(k % 4 AS VARCHAR)) THEN FALSE
        ELSE TRUE
      END"""



@query(
    "sitemap_discovery",
    oracle=f"""
    WITH {_URL_CTES},
    doms AS (
      SELECT DISTINCT registered_domain,
        CAST(regexp_extract(registered_domain, 'site([0-9]+)', 1)
             AS BIGINT) AS k
      FROM normed
    ),
    kids AS (
      SELECT registered_domain, k, CAST(j AS INT) AS child_idx
      FROM doms, unnest(generate_series(0, k % 3)) t(j)
    ),
    ent AS (
      SELECT registered_domain, k, child_idx, CAST(i AS INT) AS url_idx
      FROM kids, unnest(generate_series(0, 1 + (k + child_idx) % 3)) t(i)
    ),
    res AS (
      SELECT registered_domain, k, child_idx, url_idx,
        'https://' || registered_domain || '/sitemap-index.xml'
          AS sitemap_url,
        'https://' || registered_domain || '/sitemap-c'
          || CAST(child_idx AS VARCHAR) || '.xml' AS child_url,
        CASE WHEN url_idx % 2 = 1
             THEN '/a' || CAST((k + child_idx) % 4 AS VARCHAR)
                  || '/p' || CAST(url_idx AS VARCHAR)
             ELSE '/c' || CAST(child_idx AS VARCHAR)
                  || '/page' || CAST(url_idx AS VARCHAR) END AS path,
        '2026-03-'
          || lpad(CAST(1 + (k + child_idx + url_idx) % 28 AS VARCHAR),
                  2, '0') AS lastmod,
        CAST((1 + (k + child_idx + url_idx) % 9) * 100000 AS BIGINT)
          AS priority_ppm
      FROM ent
    )
    SELECT registered_domain, sitemap_url, child_idx, child_url, url_idx,
      'https://' || registered_domain || path AS loc, lastmod, priority_ppm,
      {_ROBOTS_ALLOWED_CASE} AS allowed,
      NOT ({_ROBOTS_ALLOWED_CASE}) AS publisher_inconsistent
    FROM res ORDER BY registered_domain, child_idx, url_idx
    """,
)
def sitemap_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL sitemap DISCOVERY chain (the r12 verdict's item #5),
    composing three operators the way a real crawler runs them:
    robots.txt ``Sitemap:`` directive (operators/robots.py
    parse_sitemap_directives — case-insensitive key, trimmed value,
    trailing-comment strip, with a COMMENTED-OUT decoy directive on
    every 3rd domain and a lowercase/whitespace-noised directive on
    odd domains) -> the referenced ``<sitemapindex>`` file
    (synth_sitemap_index / parse_index_entries — with a commented-out
    decoy child on every 3rd domain: an index harvest that skips
    comment-stripping fetches a phantom child and shifts every later
    child_idx) -> each child urlset (synth_child_sitemap /
    parse_entries) -> the frontier, JOINED against the domain's parsed
    robots rules (parse_rules + robots_verdict, the RFC 9309 decision
    incl. pattern rules): odd entries deliberately point into the
    robots-gated /a<n>/p section, so some publisher-listed URLs are
    robots-DISALLOWED — flagged ``publisher_inconsistent``, the
    publisher hygiene signal a crawl operator surfaces. The oracle
    recomputes the whole chain from the formulas (decision-table
    robots verdict — it never parses), so directive extraction, index
    walk, child parse, AND the admission join all sit under one hash
    gate. Zero shuffles beyond the domain distinct: every stage is a
    row-local column program over ~|domains| rows; at real scale the
    fetches are I/O rows and the joins stay domain-keyed."""
    from gomrjob_spark.operators.robots import (
        parse_rules,
        parse_sitemap_directives,
        robots_verdict,
        synth_robots,
    )
    from gomrjob_spark.operators.sitemap import (
        parse_entries,
        parse_index_entries,
        synth_child_sitemap,
        synth_sitemap_index,
    )

    staged = urls.with_url_columns(_docs_with_urls(spark, sf_dir))
    doms = (
        staged.select("registered_domain")
        .distinct()
        .withColumn(
            "k",
            F.regexp_extract(
                F.col("registered_domain"), "site([0-9]+)", 1
            ).cast("bigint"),
        )
    )
    k = F.col("k")
    robots_txt = F.concat(
        synth_robots("k"),
        F.when(
            k % 3 == 0,
            F.lit("# Sitemap: https://decoy.example/ignored.xml\n"),
        ).otherwise(F.lit("")),
        F.when(
            k % 2 == 1,
            F.concat(
                F.lit("sitemap:   https://"),
                F.col("registered_domain"),
                F.lit("/sitemap-index.xml  \n"),
            ),
        ).otherwise(
            F.concat(
                F.lit("Sitemap: https://"),
                F.col("registered_domain"),
                F.lit("/sitemap-index.xml\n"),
            )
        ),
    )
    # stage the text before the two independent parses (the no-CSE rule)
    with_txt = doms.withColumn("robots_txt", robots_txt)
    model = with_txt.select(
        "registered_domain",
        "k",
        parse_rules("robots_txt").alias("rules"),
        F.element_at(
            parse_sitemap_directives(F.col("robots_txt")), 1
        ).alias("sitemap_url"),
    )
    kids = model.withColumn(
        "index_xml", synth_sitemap_index(k)
    ).select(
        "registered_domain", "k", "rules", "sitemap_url",
        F.posexplode(parse_index_entries(F.col("index_xml"))).alias(
            "child_idx", "child_url"
        ),
    )
    ents = kids.withColumn(
        "child_xml", synth_child_sitemap(k, F.col("child_idx"))
    ).select(
        "registered_domain", "k", "rules", "sitemap_url",
        "child_idx", "child_url",
        F.posexplode(parse_entries(F.col("child_xml"))).alias(
            "url_idx", "e"
        ),
    )
    pathed = ents.withColumn(
        "_path",
        F.regexp_extract(F.col("e.loc"), r"^https://[^/]+(/.*)$", 1),
    )
    v = robots_verdict("_path", "rules")
    return pathed.select(
        "registered_domain",
        "sitemap_url",
        F.col("child_idx").cast("int").alias("child_idx"),
        "child_url",
        F.col("url_idx").cast("int").alias("url_idx"),
        F.col("e.loc").alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("e.priority_ppm").alias("priority_ppm"),
        v["allowed"].alias("allowed"),
        (~v["allowed"]).alias("publisher_inconsistent"),
    ).orderBy("registered_domain", "child_idx", "url_idx")


@query(
    "sitemap_discovery_gz",
    oracle=f"""
    WITH {_URL_CTES},
    doms AS (
      SELECT DISTINCT registered_domain,
        CAST(regexp_extract(registered_domain, 'site([0-9]+)', 1)
             AS BIGINT) AS k
      FROM normed
    ),
    kids AS (
      SELECT registered_domain, k, CAST(j AS INT) AS child_idx
      FROM doms, unnest(generate_series(0, k % 3)) t(j)
    ),
    ent AS (
      SELECT registered_domain, k, child_idx, CAST(i AS INT) AS url_idx
      FROM kids, unnest(generate_series(0, 1 + (k + child_idx) % 3)) t(i)
    )
    SELECT registered_domain, child_idx,
      'https://' || registered_domain || '/sitemap-c'
        || CAST(child_idx AS VARCHAR)
        || CASE WHEN (k + child_idx) % 2 = 0
                THEN '.xml.gz' ELSE '.xml' END AS child_url,
      CASE WHEN (k + child_idx) % 2 = 0
           THEN 'gzip' ELSE 'plain' END AS encoding,
      url_idx,
      'https://' || registered_domain ||
        CASE WHEN url_idx % 2 = 1
             THEN '/a' || CAST((k + child_idx) % 4 AS VARCHAR)
                  || '/p' || CAST(url_idx AS VARCHAR)
             ELSE '/c' || CAST(child_idx AS VARCHAR)
                  || '/page' || CAST(url_idx AS VARCHAR) END AS loc,
      '2026-03-'
        || lpad(CAST(1 + (k + child_idx + url_idx) % 28 AS VARCHAR),
                2, '0') AS lastmod,
      CAST((1 + (k + child_idx + url_idx) % 9) * 100000 AS BIGINT)
        AS priority_ppm
    FROM ent ORDER BY registered_domain, child_idx, url_idx
    """,
)
def sitemap_discovery_gz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed plain/GZIPPED sitemap discovery (r14, the r13 verdict's
    item #5 — real-world sitemaps are predominantly ``sitemap.xml.gz``,
    and until this round the discovery chain parsed plain XML strings
    only): the ``<sitemapindex>`` lists every (k + child_idx) % 2 == 0
    child with a ``.xml.gz`` extension; the fetch layer materializes
    each child as the BYTES a crawler would receive — gz children as
    TWO concatenated gzip members split mid-document (the writer twin
    encode_xml_payload) — and the reader decodes BY FILENAME EXTENSION
    through the WARC member splitter (decode_xml_payload ->
    sources/warc.py split_gzip_members: DEFLATE-structure boundaries,
    never magic-byte scanning) before the usual comment-stripping
    parse. The oracle recomputes every entry AND the compression
    choice from the site-number formulas without ever seeing bytes, so
    the full encode -> member-split -> inflate -> parse loop sits
    under the hash gate; a reader that inflates only the first member
    loses each gz child's tail entries and cannot match.

    Plan: scan-local column program over ~|domains| rows + one
    Arrow-batched codec pass (the multimodal convention — gzip is
    binary work Python must do); zero shuffles beyond the domain
    distinct. At 100 TB the fetch layer is I/O rows and the decode
    stays scan-local per fetched file."""
    from gomrjob_spark.operators.sitemap import (
        decode_xml_payload,
        encode_xml_payload,
        parse_entries,
        parse_index_entries,
        synth_child_sitemap,
        synth_sitemap_index,
    )

    staged = urls.with_url_columns(_docs_with_urls(spark, sf_dir))
    doms = (
        staged.select("registered_domain")
        .distinct()
        .withColumn(
            "k",
            F.regexp_extract(
                F.col("registered_domain"), "site([0-9]+)", 1
            ).cast("bigint"),
        )
    )
    k = F.col("k")
    kids = doms.withColumn(
        "index_xml", synth_sitemap_index(k, gz_children=True)
    ).select(
        "registered_domain",
        "k",
        F.posexplode(parse_index_entries(F.col("index_xml"))).alias(
            "child_idx", "child_url"
        ),
    )
    # the fetch layer: synthesize each child's XML, then REPLACE it
    # with the on-the-wire bytes — downstream sees only (url, payload),
    # exactly what a fetcher hands the parser
    fetched = kids.withColumn(
        "payload",
        encode_xml_payload(
            synth_child_sitemap(k, F.col("child_idx")),
            F.col("child_url").endswith(".gz"),
        ),
    ).select("registered_domain", "child_idx", "child_url", "payload")
    decoded = fetched.withColumn(
        "xml", decode_xml_payload(F.col("payload"), F.col("child_url"))
    )
    ents = decoded.select(
        "registered_domain",
        "child_idx",
        "child_url",
        F.when(F.col("child_url").endswith(".gz"), F.lit("gzip"))
        .otherwise(F.lit("plain"))
        .alias("encoding"),
        F.posexplode(parse_entries(F.col("xml"))).alias("url_idx", "e"),
    )
    return ents.select(
        "registered_domain",
        F.col("child_idx").cast("int").alias("child_idx"),
        "child_url",
        "encoding",
        F.col("url_idx").cast("int").alias("url_idx"),
        F.col("e.loc").alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("e.priority_ppm").alias("priority_ppm"),
    ).orderBy("registered_domain", "child_idx", "url_idx")


def _wet_walked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared WARC->HTTP front half of corpus_wet_pipeline and
    corpus_train_pipeline: each document synthesizes a WARC 'response'
    record whose HTTP payload body is its HTML page (the html-family
    formula via the COLUMN program), the record walks length-delimited
    and the HTTP response parses strictly — Arrow-batched, scan-local.
    Returns (doc_id, status_code, mime_type, html) for ALL documents;
    callers apply the HTTP-layer gate."""
    import pandas as pd  # noqa: PLC0415

    from gomrjob_spark.operators.html import synth_html
    from gomrjob_spark.operators.text import spread
    from gomrjob_spark.sources.warc import (
        encode_http_response,
        encode_warc,
        parse_http_response,
        parse_warc,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    paged = docs.select(
        "doc_id",
        synth_html("doc_id", "text", "lang").alias("page"),
    )

    def wrap_walk(batches):
        for pdf in batches:
            rows = {"doc_id": [], "status_code": [], "mime_type": [],
                    "html": []}
            for doc_id, page in zip(pdf["doc_id"], pdf["page"]):
                d = int(doc_id)
                status, reason = (404, "Not Found") if d % 10 == 0 else (200, "OK")
                ctype = "text/plain" if d % 3 == 1 else "text/html; charset=utf-8"
                stream = encode_warc([{
                    "uri": f"https://w{d}.example.com/",
                    "date": f"2026-01-{1 + d % 28:02d}T00:00:00Z",
                    "payload": encode_http_response(
                        status, reason, [("Content-Type", ctype)],
                        page.encode("utf-8"),
                    ),
                    "type": "response",
                }])
                (rec,) = parse_warc(stream)
                resp = parse_http_response(rec["payload"])
                rows["doc_id"].append(d)
                rows["status_code"].append(resp["status_code"])
                rows["mime_type"].append(
                    resp["headers"]["content-type"].split(";", 1)[0].strip()
                )
                rows["html"].append(resp["body"].decode("utf-8"))
            yield pd.DataFrame(rows)

    return spread(paged).mapInPandas(
        wrap_walk,
        schema="doc_id bigint, status_code int, mime_type string, html string",
    )


@query(
    "corpus_wet_pipeline",
    oracle=_html_gate_oracle("doc_id % 10 <> 0 AND doc_id % 3 <> 1"),
)
def corpus_wet_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl-ingest front half, composed end-to-end under ONE
    hash gate — exactly the WARC->WET derivation Common Crawl runs:

    1. each document synthesizes a WARC 'response' record whose HTTP
       payload body is the document's HTML page (the html-family
       formula, built by the COLUMN program so the wrap layers cannot
       drift from the gated synthesis);
    2. the WARC walk is length-delimited (sources.warc.parse_warc) and
       the HTTP parse strict (parse_http_response) — Arrow-batched,
       scan-local;
    3. non-200 responses (doc_id%10==0 -> 404) and non-HTML media
       types (doc_id%3==1 -> text/plain) drop at the HTTP layer —
       the real pipeline's cheap first filter;
    4. surviving pages run the jusText-style extractor + content gate
       (operators/html.py), emitting WET-style main_text + verdicts.

    The oracle replays only the formula restriction + the independent
    SQL extractor (the shared parameterized _html_gate_oracle), so a
    defect ANYWHERE in the chain — a WARC boundary slip, an HTTP
    header scan that reads the decoy Content-Type inside the body, a
    lost byte in wrap/unwrap, a block misclassification — surfaces as
    a hash mismatch. Everything before the oracle-determinism orderBy
    is scan-local: zero shuffles at 100 TB."""
    from gomrjob_spark.operators.html import (
        content_gate,
        doc_content_summary,
        with_blocks,
    )

    kept = _wet_walked(spark, sf_dir).filter(
        (F.col("status_code") == 200) & (F.col("mime_type") == "text/html")
    )
    gated = content_gate(doc_content_summary(with_blocks(kept)))
    return gated.select(
        "doc_id", "n_blocks", "n_content_blocks", "content_ppm",
        "main_text", "admitted",
    ).orderBy("doc_id")


#: registered-domain extraction over a resolved link URL (oracle-side
#: mirror of operators.urls.registered_domain, parameterized on source)
_LINK_CTES = """,
    hl AS (
      SELECT c.doc_id,
        regexp_extract_all(c.ch, '<a href="([^"]*)"', 1) AS hrefs,
        regexp_extract(n.norm_url, '^([a-z]+://[^/?#]+)', 1) AS base_prefix,
        n.registered_domain AS base_domain
      FROM hclean c JOIN normed n USING (doc_id)
    ),
    lx AS (
      SELECT doc_id, i AS link_idx, hrefs[CAST(i + 1 AS INT)] AS href,
             base_prefix, base_domain
      FROM hl, unnest(generate_series(0, len(hrefs) - 1)) t(i)
    ),
    lr AS MATERIALIZED (
      SELECT doc_id, CAST(link_idx AS INT) AS link_idx, href, base_domain,
        CASE WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*://')
             THEN href ELSE base_prefix || href END AS resolved_url
      FROM lx
    ),
    ld AS MATERIALIZED (
      SELECT doc_id, link_idx, href, resolved_url, base_domain,
        CASE WHEN host LIKE '%.co.uk'
             THEN regexp_extract(host, '([^.]+\\.co\\.uk)$', 1)
             ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1)
             END AS link_domain
      FROM (
        SELECT *,
          regexp_extract(resolved_url, '^[a-z]+://([^/:?#]+)', 1) AS host
        FROM lr
      )
    )"""


def _links_ctes() -> str:
    from gomrjob_spark.plans.html import _html_clean_ctes

    return "WITH " + _URL_CTES + "," + _html_clean_ctes() + _LINK_CTES


@query(
    "html_extract_links",
    oracle=_links_ctes()
    + """
    SELECT doc_id, link_idx, href, resolved_url, link_domain,
           link_domain = base_domain AS is_internal
    FROM ld ORDER BY doc_id, link_idx
    """,
)
def html_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link extraction + resolution over the synthesized pages
    (html.extract_links) — the link-graph half of WET derivation and
    the input to crawl-frontier scheduling: anchors extract from the
    CLEANED page in document order (the synthesis plants an anchor
    inside a script string — http://evil<k>.example — so a raw-byte
    scanner emits phantom edges and cannot hash-match), root-relative
    hrefs join to the base URL's scheme://host[:port], absolute hrefs
    keep theirs, every result re-normalizes through the urls-family
    contract (the oracle asserts the resolved forms are already
    canonical — a normalizer that corrupts them fails the hash), and
    is_internal compares registered domains (the same-site frontier
    test). Row-local codegen + one Generate; zero shuffles before the
    oracle-determinism orderBy."""
    from gomrjob_spark.operators.html import extract_links, synth_html

    staged = urls.with_url_columns(_docs_with_urls(spark, sf_dir, with_text=True))
    from gomrjob_spark.cache import scoped_persist

    staged = staged.withColumn(
        "html", synth_html("doc_id", "text", "lang")
    )
    # stage + persist the link array BEFORE the explode: a Generate
    # over an expensive transform re-evaluates the builder per emitted
    # element (the r5 plan rule, same fix as html_block_stats)
    staged = scoped_persist(
        staged.select(
            "doc_id",
            extract_links(F.col("html"), F.col("norm_url")).alias("links"),
        )
    )
    exploded = staged.select(
        "doc_id",
        F.posexplode("links").alias("link_idx", "link"),
    )
    return exploded.select(
        "doc_id",
        F.col("link_idx").cast("int").alias("link_idx"),
        F.col("link.href").alias("href"),
        F.col("link.resolved_url").alias("resolved_url"),
        F.col("link.link_domain").alias("link_domain"),
        F.col("link.is_internal").alias("is_internal"),
    ).orderBy("doc_id", "link_idx")


@query(
    "url_domain_pagerank",
    oracle="WITH "
    + _URL_CTES
    + """,
    edges AS MATERIALIZED (
      SELECT DISTINCT registered_domain AS src,
             'partner' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS dst
      FROM normed
    ),
    nodes AS (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst FROM edges
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    pr0 AS (SELECT node, 1000000::BIGINT AS pr FROM nodes),
    pr1 AS MATERIALIZED (
      SELECT n.node,
             CAST(150000 + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS pr
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
        FROM edges e JOIN pr0 p ON p.node = e.src JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    ),
    pr2 AS MATERIALIZED (
      SELECT n.node,
             CAST(150000 + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS pr
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
        FROM edges e JOIN pr1 p ON p.node = e.src JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    ),
    pr3 AS (
      SELECT n.node,
             CAST(150000 + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS pr
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
        FROM edges e JOIN pr2 p ON p.node = e.src JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    )
    SELECT node, pr FROM pr3 ORDER BY node
    """,
)
def url_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-graph PageRank from EXTRACTED links — the RefinedWeb/
    Common-Crawl domain-ranking pipeline composed end-to-end: pages ->
    link extraction (html.extract_links) -> external-edge projection
    (src = the page's registered domain, dst = the link's) -> distinct
    edges -> 3 rounds of exact-integer PageRank (graph.pagerank_
    fixedpoint — bit-identical across engines, the same operator the
    part-supplier graph query gates). The oracle recomputes the edge
    set from the synthesis formulas and replays the fixpoint as
    chained CTEs, so a phantom edge (the script decoy), a lost edge,
    or a drifted division anywhere in the chain breaks the hash.
    Scale: the edge projection is scan-local; the iterate shuffles
    only the |domains|-sized rank table."""
    from gomrjob_spark.operators.graph import pagerank_fixedpoint
    from gomrjob_spark.operators.html import extract_links, synth_html

    staged = urls.with_url_columns(_docs_with_urls(spark, sf_dir, with_text=True))
    staged = staged.withColumn(
        "html", synth_html("doc_id", "text", "lang")
    )
    from gomrjob_spark.cache import scoped_persist

    # stage + persist before the explode (the r5 Generate rule); the
    # frame is (domain, links-array)-sized, released after the iterate
    linked = scoped_persist(
        staged.select(
            F.col("registered_domain").alias("src"),
            extract_links(F.col("html"), F.col("norm_url")).alias("links"),
        )
    )
    links = linked.select("src", F.explode("links").alias("link"))
    edges = (
        links.filter(~F.col("link.is_internal"))
        .select("src", F.col("link.link_domain").alias("dst"))
        .distinct()
        # |domains|-sized frame feeding an iterate: lazily truncate the
        # lineage so the page-synthesis + extraction expression tree is
        # compiled/evaluated ONCE, not re-broadcast into every round's
        # tasks (measured 7 MiB task binaries per round without this —
        # the r9 iterative-trainer plan-size rule)
        .localCheckpoint(eager=False)
    )
    return pagerank_fixedpoint(edges, n_iters=3).orderBy("node")


def _robots_oracle(pred: str = "TRUE") -> str:
    """Decision-table oracle for the robots gate; ``pred`` restricts
    the source (the streaming twin's split)."""
    return (
        "WITH "
        + _URL_CTES
        + """,
    rsrc AS (
      SELECT doc_id, registered_domain,
        regexp_extract(norm_url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        CAST(regexp_extract(registered_domain, 'site([0-9]+)', 1)
             AS BIGINT) AS k
      FROM normed WHERE {pred}
    )
    SELECT doc_id, registered_domain, path,
      CASE
        WHEN k % 3 = 0
             AND starts_with(path, '/a' || CAST(k % 4 AS VARCHAR) || '/p')
        THEN '/a' || CAST(k % 4 AS VARCHAR) || '/p'
        WHEN k % 7 = 2 AND regexp_matches(path, '^/a.*/p')
        THEN '/a*/p'
        WHEN k % 2 = 0 AND starts_with(path, '/buy') THEN '/buy'
        WHEN k % 7 = 5 AND regexp_matches(path, '^/.*0$') THEN '/*0$'
        WHEN starts_with(path, '/a' || CAST(k % 4 AS VARCHAR))
        THEN '/a' || CAST(k % 4 AS VARCHAR)
        ELSE ''
      END AS rule_prefix,
      {allowed} AS allowed
    FROM rsrc ORDER BY doc_id
    """.format(pred=pred, allowed=_ROBOTS_ALLOWED_CASE)
    )


@query("robots_txt_gate", oracle=_robots_oracle())
def robots_txt_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt admission (operators/robots.py) — the crawl's
    position MINUS ONE, in front of even the URL gate: each domain's
    robots.txt synthesizes from its site number (comment / blank /
    unknown-directive lines interleaved — a parser that treats them as
    rules fails), the TEXT parses row-locally into rule structs, and
    every document's normalized path gets the RFC 9309 verdict:
    longest matching prefix wins, Allow wins length ties, no match ->
    allowed. Every third domain carries a LONGER Allow override inside
    its Disallowed section, so a first-match or any-disallow
    implementation mis-blocks those paths and cannot hash-match. The
    oracle is an independent DECISION-TABLE re-implementation (it
    never parses text — it recomputes the verdict from the rule
    formulas), so parse + match + precedence all sit under the
    differential gate. Zero shuffles: one scan-local column program
    (parse_url + regex + two array HOFs)."""
    from gomrjob_spark.streaming.ops import robots_gate_stream

    # the ONE robots column program: the streaming twin's function on a
    # static frame (stream==batch is shared code, not parallel copies)
    staged = urls.with_url_columns(_docs_with_urls(spark, sf_dir))
    return robots_gate_stream(staged).orderBy("doc_id")


@query(
    "dedup_canonical",
    oracle="WITH "
    + _URL_CTES
    + """,
    can AS (
      SELECT n.doc_id, n.norm_url,
        'https://canon.site' || CAST((n.doc_id // 6) % 11 AS VARCHAR)
          || '.com/c' || CAST(n.doc_id // 6 AS VARCHAR) AS canonical_href
      FROM normed n WHERE n.doc_id % 9 <> 8
    )
    SELECT canonical_href,
           CAST(min(doc_id) AS BIGINT) AS keeper,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT norm_url) AS BIGINT) AS n_norm_urls
    FROM can GROUP BY canonical_href ORDER BY keeper
    """,
)
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=canonical dedup — the publisher-declared dedup layer real
    pipelines apply BETWEEN URL dedup and content dedup: documents
    group by the canonical link EXTRACTED from their page bytes
    (html.extract_metadata, not the formula), and by construction each
    canonical group merges TWO url-dedup triples (six raw URLs, two
    canonical norm_urls declaring one canonical — the
    distinct-URLs-one-canonical case that makes this a different
    operator from dedup_url_exact), with every 9th document opting out
    (no canonical -> not groupable, excluded). Survivor convention:
    min doc_id. One partial-agg shuffle carrying canonical hrefs +
    norm_urls + ids — page text never enters the exchange."""
    from gomrjob_spark.operators.html import extract_metadata, synth_html

    staged = urls.with_url_columns(
        _docs_with_urls(spark, sf_dir, with_text=True)
    )
    staged = staged.withColumn(
        "html", synth_html("doc_id", "text", "lang")
    )
    m = extract_metadata("html")
    canon = staged.select(
        "doc_id",
        "norm_url",
        m["canonical_href"].alias("canonical_href"),
        m["has_canonical"].alias("has_canonical"),
    ).filter(F.col("has_canonical"))
    return (
        canon.groupBy("canonical_href")
        .agg(
            F.min("doc_id").cast("bigint").alias("keeper"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("norm_url").cast("bigint").alias("n_norm_urls"),
        )
        .orderBy("keeper")
    )


def _funnel_oracle() -> str:
    """Per-domain funnel accounting across the SEQUENTIAL admission
    chain — robots -> domain blocklist -> URL dedup (keeper chosen
    among gate survivors only, the real funnel semantics) -> HTML
    content gate — composed from the independent oracle chunks of all
    four families."""
    from gomrjob_spark.plans.html import (
        _HTML_BLOCK_SQL,
        _HTML_DOC_SQL,
        _html_clean_ctes,
    )

    return (
        "WITH "
        + _URL_CTES
        + ","
        + _html_clean_ctes()
        + ","
        + _HTML_BLOCK_SQL
        + _HTML_DOC_SQL
        + """,
    f0 AS (
      SELECT n.doc_id, n.registered_domain, n.norm_url,
        """
        + _ROBOTS_ALLOWED_CASE
        + """ AS robots_ok,
        NOT n.registered_domain IN ('site3.org', 'site7.com',
                                    'site5.co.uk', 'site0.com') AS domain_ok
      FROM (
        SELECT doc_id, registered_domain, norm_url,
          regexp_extract(norm_url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
          CAST(regexp_extract(registered_domain, 'site([0-9]+)', 1)
               AS BIGINT) AS k
        FROM normed
      ) n
    ),
    f1 AS (
      SELECT f0.*,
        min(CASE WHEN robots_ok AND domain_ok THEN doc_id END)
          OVER (PARTITION BY norm_url) AS surv_keeper
      FROM f0
    ),
    f2 AS (
      SELECT f1.doc_id, f1.registered_domain,
        CASE
          WHEN NOT robots_ok THEN 'robots_blocked'
          WHEN NOT domain_ok THEN 'domain_blocked'
          WHEN doc_id <> surv_keeper THEN 'url_dup'
          WHEN NOT ((CASE WHEN h.total_chars > 0
                          THEN (1000000 * h.content_chars) // h.total_chars
                          ELSE 0 END) >= 500000
                    AND h.n_content_blocks >= 1)
          THEN 'chrome_rejected'
          ELSE 'admitted'
        END AS stage
      FROM f1 JOIN hdoc h USING (doc_id)
    )
    SELECT registered_domain,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN stage = 'robots_blocked' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_robots_blocked,
      CAST(sum(CASE WHEN stage = 'domain_blocked' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_domain_blocked,
      CAST(sum(CASE WHEN stage = 'url_dup' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_url_dup,
      CAST(sum(CASE WHEN stage = 'chrome_rejected' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_chrome_rejected,
      CAST(sum(CASE WHEN stage = 'admitted' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_admitted
    FROM f2 GROUP BY registered_domain ORDER BY registered_domain
    """
    )


@query("corpus_funnel_report", oracle=_funnel_oracle())
def corpus_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-curation FUNNEL — the per-domain accounting report a
    curation operator actually reads: every document attributed to the
    FIRST gate that dropped it along the sequential admission chain
    (robots.txt RFC 9309 verdict -> domain blocklist -> URL-level
    dedup with the keeper chosen among gate SURVIVORS only, the real
    funnel semantics -> HTML content gate), with per-domain counts
    whose row sums equal n_docs by construction (pinned in
    tests/test_html.py). Composes four families' column programs into
    one plan: robots parse+verdict, URL canonicalization, a
    norm_url-partitioned min window for survivor keepers, and the
    zero-shuffle content rollup — total exchanges: the spread
    dispatch, one window shuffle on norm_url, one final domain agg.
    The oracle recomposes all four families' INDEPENDENT SQL chunks,
    so a defect in any gate or in the funnel ordering breaks the
    hash."""
    from pyspark.sql import Window

    from gomrjob_spark.operators import robots
    from gomrjob_spark.operators.html import (
        content_gate,
        doc_content_summary,
        synth_html,
        with_blocks,
    )

    staged = urls.with_url_columns(
        _docs_with_urls(spark, sf_dir, with_text=True)
    )
    staged = staged.withColumn(
        "html", synth_html("doc_id", "text", "lang")
    ).withColumn(
        "path",
        F.regexp_extract(F.col("norm_url"), "^[a-z]+://[^/?#]+([^?#]*)", 1),
    ).withColumn(
        "k",
        F.regexp_extract(F.col("registered_domain"), "site([0-9]+)", 1).cast(
            "bigint"
        ),
    )
    rules_sql = robots._parse_rules_sql(
        robots._synth_robots_sql("CAST(`k` AS BIGINT)")
    )
    verdict = robots.robots_verdict("path", rules_sql)
    gated = content_gate(doc_content_summary(with_blocks(staged)))
    f0 = gated.select(
        "doc_id",
        "registered_domain",
        "norm_url",
        verdict["allowed"].alias("robots_ok"),
        (~F.col("registered_domain").isin(*BLOCKLIST)).alias("domain_ok"),
        F.col("admitted").alias("content_ok"),
    )
    w = Window.partitionBy("norm_url")
    f1 = f0.withColumn(
        "surv_keeper",
        F.min(
            F.when(F.col("robots_ok") & F.col("domain_ok"), F.col("doc_id"))
        ).over(w),
    )
    stage = (
        F.when(~F.col("robots_ok"), F.lit("robots_blocked"))
        .when(~F.col("domain_ok"), F.lit("domain_blocked"))
        .when(F.col("doc_id") != F.col("surv_keeper"), F.lit("url_dup"))
        .when(~F.col("content_ok"), F.lit("chrome_rejected"))
        .otherwise(F.lit("admitted"))
    )
    f2 = f1.withColumn("stage", stage)
    cnt = lambda s: F.sum(  # noqa: E731
        F.when(F.col("stage") == s, 1).otherwise(0)
    ).cast("bigint")
    return (
        f2.groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            cnt("robots_blocked").alias("n_robots_blocked"),
            cnt("domain_blocked").alias("n_domain_blocked"),
            cnt("url_dup").alias("n_url_dup"),
            cnt("chrome_rejected").alias("n_chrome_rejected"),
            cnt("admitted").alias("n_admitted"),
        )
        .orderBy("registered_domain")
    )


#: KN-perplexity admission ceiling for the end-to-end pipeline, in
#: mbits/trigram — inside the survivor IQR at every fixture scale
#: (probed r12: drops 18->9 at sf0.01, 272->248 at sf0.1), so both
#: verdicts genuinely occur under the driver gate
_TRAIN_KN_CEILING = 5520


def _train_pipeline_oracle() -> str:
    """The END-TO-END crawl->train-set oracle: every stage of the
    composite recomputed from the INDEPENDENT SQL chunks of the nine
    families it chains (URL, minhash-md5, robots decision table, HTML
    extractor, langid NB, batch perceptron, modified-KN, pack) — a
    defect in any operator, any gate threshold, or the funnel ORDER
    itself breaks the hash. Sub-oracles run at full-corpus scope and
    join flags by doc_id (scoring is per-doc given the model, so
    subset-scoring on the Spark side is equivalent)."""
    from gomrjob_spark.plans.html import _html_gate_oracle
    from gomrjob_spark.plans.llm import (
        _kn_oracle,
        _langid_gate_oracle,
        _minhash_md5_sql,
        _perceptron_oracle,
    )

    bl = ", ".join(f"'{b}'" for b in BLOCKLIST)
    return f"""
    WITH {_URL_CTES},
    tp_url AS MATERIALIZED (
      SELECT doc_id, norm_url, registered_domain,
        regexp_extract(norm_url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        CAST(regexp_extract(registered_domain, 'site([0-9]+)', 1)
             AS BIGINT) AS k
      FROM normed
    ),
    tp_mh AS MATERIALIZED (
      SELECT id_a, id_b FROM ({_minhash_md5_sql(32, 16, 42, 0.6)}) tq
    ),
    tp_ht AS MATERIALIZED (
      SELECT doc_id, admitted FROM ({_html_gate_oracle("TRUE")}) tq
    ),
    tp_lg AS MATERIALIZED (
      SELECT doc_id, pred_lang
      FROM ({_langid_gate_oracle("doc_id % 5 = 0", "TRUE")}) tq
    ),
    tp_pc AS MATERIALIZED (
      SELECT doc_id, keep AS pc_keep FROM ({_perceptron_oracle(gate=True)}) tq
    ),
    tp_kn AS MATERIALIZED (
      SELECT doc_id, mbits_per_trigram AS mbits FROM ({_kn_oracle()}) tq
    ),
    tp_f1 AS MATERIALIZED (
      SELECT u.doc_id, u.norm_url, u.registered_domain, u.path, u.k,
        (u.doc_id % 10 <> 0 AND u.doc_id % 3 <> 1) AS s1
      FROM tp_url u
    ),
    tp_f2 AS (
      SELECT tp_f1.*,
        s1 AND NOT EXISTS (
          SELECT 1 FROM tp_mh m JOIN tp_f1 a ON a.doc_id = m.id_a
          WHERE m.id_b = tp_f1.doc_id AND a.s1) AS s2
      FROM tp_f1
    ),
    tp_f4 AS (
      SELECT tp_f2.*,
        s2 AND {_ROBOTS_ALLOWED_CASE} AS s3,
        s2 AND {_ROBOTS_ALLOWED_CASE}
           AND registered_domain NOT IN ({bl}) AS s4
      FROM tp_f2
    ),
    tp_f5 AS (
      SELECT tp_f4.*,
        s4 AND doc_id = min(CASE WHEN s4 THEN doc_id END)
          OVER (PARTITION BY norm_url) AS s5
      FROM tp_f4
    ),
    tp_f6 AS MATERIALIZED (
      SELECT tp_f5.*, s5 AND tp_ht.admitted AS s6, tp_lg.pred_lang
      FROM tp_f5 JOIN tp_ht USING (doc_id) JOIN tp_lg USING (doc_id)
    ),
    tp_major AS (
      SELECT pred_lang AS major_lang FROM tp_f6 WHERE s6
      GROUP BY pred_lang ORDER BY count(*) DESC, pred_lang ASC LIMIT 1
    ),
    tp_flags AS MATERIALIZED (
      SELECT tp_f6.doc_id, s1, s2, s3, s4, s5, s6,
        s6 AND pred_lang = (SELECT major_lang FROM tp_major) AS s7,
        s6 AND pred_lang = (SELECT major_lang FROM tp_major)
           AND pc_keep AS s8,
        s6 AND pred_lang = (SELECT major_lang FROM tp_major)
           AND pc_keep AND mbits <= {_TRAIN_KN_CEILING} AS s9
      FROM tp_f6 JOIN tp_pc USING (doc_id) LEFT JOIN tp_kn USING (doc_id)
    ),
    tp_pk AS (
      SELECT d.doc_id, d.lang,
        CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT)
          AS n_tokens,
        CAST(('0x' || substr(md5('pack' || CAST(d.doc_id AS VARCHAR)), 1, 15))
             ::BIGINT % 64 AS INT) AS bucket
      FROM documents d JOIN tp_flags fl ON fl.doc_id = d.doc_id AND fl.s9
    ),
    tp_pcum AS (
      SELECT doc_id, lang, bucket, n_tokens,
        CAST(sum(n_tokens) OVER (PARTITION BY lang, bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
             AS BIGINT) AS local_off
      FROM tp_pk
    ),
    tp_bt AS (
      SELECT lang, bucket, CAST(sum(n_tokens) AS BIGINT) AS btotal
      FROM tp_pk GROUP BY lang, bucket
    ),
    tp_off AS (
      SELECT lang, bucket,
        CAST(COALESCE(sum(btotal) OVER (PARTITION BY lang ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS bucket_off
      FROM tp_bt
    ),
    tp_batches AS (
      SELECT CAST(count(DISTINCT (c.lang, (o.bucket_off + c.local_off)
                                  // 2048)) AS BIGINT) AS nb
      FROM tp_pcum c JOIN tp_off o ON c.lang = o.lang AND c.bucket = o.bucket
    ),
    tp_counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(s1::int) AS BIGINT) AS c1, CAST(sum(s2::int) AS BIGINT) AS c2,
        CAST(sum(s3::int) AS BIGINT) AS c3, CAST(sum(s4::int) AS BIGINT) AS c4,
        CAST(sum(s5::int) AS BIGINT) AS c5, CAST(sum(s6::int) AS BIGINT) AS c6,
        CAST(sum(s7::int) AS BIGINT) AS c7, CAST(sum(s8::int) AS BIGINT) AS c8,
        CAST(sum(s9::int) AS BIGINT) AS c9,
        (SELECT nb FROM tp_batches) AS nb
      FROM tp_flags
    )
    SELECT CAST(stage_idx AS INT) AS stage_idx, stage, n_in, n_out FROM (
      SELECT 0 AS stage_idx, 'crawl_records' AS stage, n AS n_in, n AS n_out
        FROM tp_counts
      UNION ALL SELECT 1, 'http_gate', n, c1 FROM tp_counts
      UNION ALL SELECT 2, 'near_dedup', c1, c2 FROM tp_counts
      UNION ALL SELECT 3, 'robots_gate', c2, c3 FROM tp_counts
      UNION ALL SELECT 4, 'domain_gate', c3, c4 FROM tp_counts
      UNION ALL SELECT 5, 'url_dedup', c4, c5 FROM tp_counts
      UNION ALL SELECT 6, 'html_content_gate', c5, c6 FROM tp_counts
      UNION ALL SELECT 7, 'langid_gate', c6, c7 FROM tp_counts
      UNION ALL SELECT 8, 'quality_gate', c7, c8 FROM tp_counts
      UNION ALL SELECT 9, 'kn_gate', c8, c9 FROM tp_counts
      UNION ALL SELECT 10, 'pack', c9, nb FROM tp_counts
    ) tp_out ORDER BY stage_idx
    """


@query("corpus_train_pipeline", oracle=_train_pipeline_oracle())
def corpus_train_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FLAGSHIP end-to-end crawl->train-set pipeline, every stage a
    real operator run in sequence under ONE hash gate — the 100 TB
    dress rehearsal the r11 verdict ordered:

      0 crawl_records      WET walk: WARC record -> HTTP response parse
      1 http_gate          status 200 + text/html (the cheap first cut)
      2 near_dedup         MinHash-LSH (md5 twin, 32x16, j>=0.6) over
                           the FETCHED corpus — CCNet's order: dedup
                           against everything fetched, BEFORE quality;
                           conservative drop-every-id_b rule makes the
                           stage's drop set order-robust (it commutes
                           with the later gates)
      3 robots_gate        RFC 9309 longest-match (incl. r12 patterns)
      4 domain_gate        registered-domain blocklist
      5 url_dedup          canonical-URL keeper among gate survivors
      6 html_content_gate  jusText-style extraction + content ratio
      7 langid_gate        NB language-ID; keep the corpus's MAJORITY
                           predicted language (monolingual target —
                           majority because the fixture's labels are
                           separability-vacuous, see text_langid_train)
      8 quality_gate       TRAINED batch perceptron keep verdict
      9 kn_gate            modified-KN perplexity <= 5520 mbits/trigram
     10 pack               fixed-2048-token batch packing (n_out = the
                           packed BATCH count)

    Output is the accounting a curation operator reads: (stage, n_in,
    n_out) with n_in[k] = n_out[k-1] by construction, every stage
    non-vacuous at the driver gate scale (sf0.01: 500 -> 300 -> 290 ->
    207 -> 174 -> 102 -> 77 -> 44 -> 18 -> 9 -> 3 batches). The text-
    layer scorers (langid/perceptron/KN) run on the canonical document
    text their family formulas gate — which the fixture's HTML embeds
    verbatim — at full-corpus scope, mirroring the oracle's per-doc
    joins. Scale shape: the flag spine is ONE doc-level frame (column
    programs + one norm_url window); each scorer adds its family's
    own gated plan (1-row broadcast folds for langid/perceptron,
    vocab-sized stream-static joins for KN, banded candidate join for
    minhash); accounting is a single tiny aggregate. Reference parity:
    this is the multi-step job-chaining surface (runner.go Steps) at
    curation scale.

    REGISTRY CONTRACT NOTE (r15, documenting the r14 verdict's #6):
    unlike every other registry entry, CALLING this builder EXECUTES
    work — the funnel spine is a chain of eager localCheckpoints, and
    the three text-layer model trainers are launched on background
    threads at construction so they overlap the spine (guide §2.6).
    The returned frame is cheap to materialize; a caller that builds
    but never runs it still pays the full pipeline. This is inherent
    to the eager-checkpoint lineage truncation the composite needs
    (catalyst replanning measured in minutes without it), not an
    accident."""
    from pyspark.sql import Window

    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    from gomrjob_spark.cache import scoped_persist
    from gomrjob_spark.operators import dedup, robots
    from gomrjob_spark.operators.html import (
        content_gate,
        doc_content_summary,
        with_blocks,
    )
    from gomrjob_spark.operators.text import (
        kn_model,
        kn_score,
        langid_apply,
        langid_model,
        pack_token_batches,
        quality_perceptron_gate,
        quality_perceptron_train,
        spread,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    train = docs.filter(F.col("doc_id") % 5 == 0)

    # The three text-layer MODELS (langid NB, batch perceptron, modified
    # KN) depend only on `docs`/`train`, never on the funnel — but the
    # funnel's eager localCheckpoint spine used to serialize them onto
    # the critical path (stage attribution: a ~25 s chain of small
    # driver-paced stages, most cores idle). Pre-train them here as
    # CONCURRENT background jobs (guide §2.6 — overlap independent
    # jobs; FIFO scheduling back-fills the funnel's stragglers), each
    # persisted so the scorer reads the cache. Training inputs, the
    # trainers, and the scorers are unchanged — identical models, just
    # trained while the funnel runs instead of after it.
    lg_row = scoped_persist(langid_model(train))
    pc_w = scoped_persist(quality_perceptron_train(docs, n_rounds=8))
    # kn_model scoped-persists all six tables internally (r14) — no
    # outer persist, or the same frames double-register and warn
    knm = kn_model(train)

    def _materialize(*frames: DataFrame) -> None:
        for fr in frames:
            fr.write.format("noop").mode("overwrite").save()

    # inheritable_thread_target(spark) so the workers inherit job
    # tags/descriptions (the bare-function form logs a warning and
    # drops tag propagation); the try/finally below cancels and joins
    # the trainers if funnel CONSTRUCTION raises — otherwise non-daemon
    # workers keep running noop jobs past the exception
    pool = ThreadPoolExecutor(max_workers=3)
    _bg = inheritable_thread_target(spark)
    futs = [
        pool.submit(_bg(_materialize), lg_row),
        pool.submit(_bg(_materialize), pc_w),
        pool.submit(_bg(_materialize), *knm.values()),
    ]

    try:
        # flag spine: WET walk + URL staging + robots/domain column
        # programs. The html PAYLOAD stays OUT of the spine — it would
        # otherwise ride the norm_url window shuffle and every spine
        # recompute; the content gate joins it back for s5 survivors only.
        walked = scoped_persist(_wet_walked(spark, sf_dir))
        staged = urls.with_url_columns(
            walked.select("doc_id", "status_code", "mime_type").withColumn(
                "url", urls.synth_url("doc_id")
            )
        ).withColumn(
            "path",
            F.regexp_extract(F.col("norm_url"), "^[a-z]+://[^/?#]+([^?#]*)", 1),
        ).withColumn(
            "k",
            F.regexp_extract(F.col("registered_domain"), "site([0-9]+)", 1)
            .cast("bigint"),
        )
        rules_sql = robots._parse_rules_sql(
            robots._synth_robots_sql("CAST(`k` AS BIGINT)")
        )
        verdict = robots.robots_verdict("path", rules_sql)
        base = scoped_persist(
            staged.select(
                "doc_id",
                "norm_url",
                (
                    (F.col("status_code") == 200)
                    & (F.col("mime_type") == "text/html")
                ).alias("s1"),
                verdict["allowed"].alias("robots_ok"),
                (~F.col("registered_domain").isin(*BLOCKLIST)).alias("domain_ok"),
            )
        )

        # stage 2: fuzzy dedup of the FETCHED corpus (pairs computed on the
        # s1 subset — identical to filtering full-corpus pairs to both-in-s1
        # endpoints, since signatures are per-doc)
        fetched = docs.join(base.filter("s1").select("doc_id"), "doc_id")
        dups = (
            dedup.minhash_md5_dedup_pairs(
                fetched, threshold=0.6, num_hashes=32, bands=16
            )
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
            .withColumn("is_dup", F.lit(True))
        )
        f2 = (
            base.join(dups, "doc_id", "left")
            .withColumn(
                "s2", F.col("s1") & F.coalesce(~F.col("is_dup"), F.lit(True))
            )
            .withColumn("s3", F.col("s2") & F.col("robots_ok"))
            .withColumn("s4", F.col("s3") & F.col("domain_ok"))
        )
        w = Window.partitionBy("norm_url")
        f5 = f2.withColumn(
            "s5",
            F.col("s4")
            & (
                F.col("doc_id")
                == F.min(F.when(F.col("s4"), F.col("doc_id"))).over(w)
            ),
        )
        # HTML extraction + content gate for s5 SURVIVORS only (the oracle
        # scores all docs; s6 = s5 AND admitted makes subset scoring
        # equivalent). The flag spine through s6 is TINY (one row per doc,
        # 7 narrow columns) but its LINEAGE carries the WET walk, the
        # robots-fold HOF tree, and the minhash banding — every downstream
        # stage would re-embed (and catalyst re-optimize, and the
        # checkpoint's RDD path re-execute WITHOUT codegen) all of it, so
        # truncate here (the BPE/PageRank lineage rule).
        # the survivor id-lists are 1-partition checkpoints with no stats,
        # so every docs-side join broadcasts docs and streams the id list —
        # the CPU-dense consumers (HTML block parse here, token_count in
        # pack below) would run 1-task on the checkpoint's partitioning.
        # The text-layer scorers spread() internally; these two seams do
        # not, so spread the join output before the dense work (guide §2.5).
        s5_ids = f5.filter("s5").select("doc_id").localCheckpoint()
        admit = content_gate(
            doc_content_summary(
                with_blocks(spread(walked.join(s5_ids, "doc_id")))
            )
        ).select("doc_id", "admitted")
        gated = (
            f5.join(admit, "doc_id", "left")
            .select(
                "doc_id", "s1", "s2", "s3", "s4", "s5",
                (
                    F.col("s5") & F.coalesce(F.col("admitted"), F.lit(False))
                ).alias("s6"),
            )
            .localCheckpoint(eager=False)
        )

        # text-layer scorers run ONLY on each stage's survivors — the
        # 100 TB shape (you never KN-score a document the funnel already
        # dropped); per-doc scoring given a fixed model makes this exactly
        # equal to the oracle's score-everything-then-join formulation.
        # Models still train at their family's full scope. Each survivor
        # id-list is eagerly localCheckpoint'ed: WITHOUT the truncation the
        # scorer's input would re-embed the whole upstream flag plan, the
        # next join would embed it AGAIN, and the final plan nests
        # exponentially (measured: catalyst alone ran minutes at sf0.1) —
        # the BPE/PageRank lineage rule applied to the funnel.
        s6_ids = gated.filter("s6").select("doc_id").localCheckpoint()
        lg = langid_apply(docs.join(s6_ids, "doc_id"), lg_row).select(
            "doc_id", "pred_lang"
        )
        # read twice (majority agg + the s7 flag join): truncate the
        # langid fold out of both readers' plans
        flags6 = gated.join(lg, "doc_id", "left").localCheckpoint(eager=False)

        # monolingual target: the corpus's majority PREDICTED language —
        # a 1-row broadcast joined on a constant key (NOT a crossJoin: an
        # empty majority must not wipe the accounting rows)
        major = (
            flags6.filter("s6")
            .groupBy("pred_lang")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pred_lang"))
            .limit(1)
            .select(F.col("pred_lang").alias("major_lang"), F.lit(1).alias("one"))
        )
        flags7 = flags6.withColumn("one", F.lit(1)).join(
            F.broadcast(major), "one", "left"
        ).withColumn(
            "s7",
            F.col("s6")
            & F.coalesce(F.col("pred_lang") == F.col("major_lang"), F.lit(False)),
        )
        s7_ids = flags7.filter("s7").select("doc_id").localCheckpoint()
        pc = quality_perceptron_gate(
            docs.join(s7_ids, "doc_id"), pc_w
        ).select("doc_id", F.col("keep").alias("pc_keep"))
        flags8 = flags7.join(pc, "doc_id", "left").withColumn(
            "s8", F.col("s7") & F.coalesce(F.col("pc_keep"), F.lit(False))
        )
        s8_ids = flags8.filter("s8").select("doc_id").localCheckpoint()
        knf = kn_score(docs.join(s8_ids, "doc_id"), knm).select(
            "doc_id", "mbits_per_trigram"
        )
        # final spine truncation: counts and pack both read this frame
        flags = flags8.join(knf, "doc_id", "left").withColumn(
            "s9",
            F.col("s8")
            & F.coalesce(
                F.col("mbits_per_trigram") <= F.lit(_TRAIN_KN_CEILING),
                F.lit(False),
            ),
        ).localCheckpoint(eager=False)

        cnt = lambda c: F.sum(F.col(c).cast("int")).cast("bigint")  # noqa: E731
        counts = flags.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            *[cnt(f"s{i}").alias(f"c{i}") for i in range(1, 10)],
        )
        packed = pack_token_batches(
            spread(docs.join(flags.filter("s9").select("doc_id"), "doc_id")),
            budget=2048,
        )
        nb = packed.agg(
            F.count_distinct(F.col("lang"), F.col("batch_id"))
            .cast("bigint")
            .alias("nb")
        )
    except BaseException:
        # construction failed mid-build: stop the background
        # trainers so their noop jobs don't outlive the error
        for f in futs:
            f.cancel()
        pool.shutdown(wait=True)
        raise
    # join the background trainers (propagates any training failure; by
    # now the funnel's eager spine has run, so these are long finished)
    for f in futs:
        f.result()
    pool.shutdown(wait=True)
    return (
        counts.join(F.broadcast(nb))
        .selectExpr(
            "stack(11, "
            "0, 'crawl_records', n, n, "
            "1, 'http_gate', n, c1, "
            "2, 'near_dedup', c1, c2, "
            "3, 'robots_gate', c2, c3, "
            "4, 'domain_gate', c3, c4, "
            "5, 'url_dedup', c4, c5, "
            "6, 'html_content_gate', c5, c6, "
            "7, 'langid_gate', c6, c7, "
            "8, 'quality_gate', c7, c8, "
            "9, 'kn_gate', c8, c9, "
            "10, 'pack', c9, nb"
            ") AS (stage_idx, stage, n_in, n_out)"
        )
        .select(
            F.col("stage_idx").cast("int").alias("stage_idx"),
            "stage",
            F.col("n_in").cast("bigint").alias("n_in"),
            F.col("n_out").cast("bigint").alias("n_out"),
        )
        .orderBy("stage_idx")
    )
