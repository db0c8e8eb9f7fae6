"""sitemap.xml parsing — the crawl frontier's SEEDING step.

robots.txt says what a crawler may NOT fetch; the sitemap (the
sitemaps.org protocol, referenced from robots.txt's ``Sitemap:``
directive) says what the publisher WANTS fetched, with freshness
hints. A curation pipeline reads it to seed and prioritize the
frontier: per URL entry, ``<loc>`` (the URL — the spec requires
whitespace-tolerant parsing, so values must be trimmed), ``<lastmod>``
(W3C date) and ``<priority>`` (0.0-1.0, kept here as exact fixed-point
ppm — the repo's float-free convention).

The parse is a pure row-local column program (strip XML comments with
one dotall regex, extract ``<url>`` blocks, then per-block field
extraction) — zero UDFs, zero shuffles, the robots-family posture, so
frontier seeding composes into the same scan as robots admission.

The fixture synthesizes each domain's sitemap from its site number
(:func:`synth_sitemap` — the robots-family device) with the
adversarial cases baked in: every 3rd domain's file carries a
COMMENTED-OUT ``<url>`` block (a regex harvest that does not strip
comments first counts a phantom entry and fails the hash gate), and
every 2nd domain wraps its ``<loc>`` values in newlines/spaces (the
spec's whitespace rule — an untrimmed extraction cannot match the
oracle's clean URLs).

Reference parity note: jehiah/gomrjob has no crawl layer; this family
is part of the LLM-training-data surface the build brief adds
(SURVEY.md §2F extensions), sitting next to operators/robots.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def synth_sitemap(site_num: Column) -> Column:
    """sitemap.xml text per domain as a PURE formula of the domain's
    site number ``k`` and registered domain (mirrored by the oracle in
    plans/web.py, which recomputes entries from the formulas and never
    parses): 3 + k%4 ``<url>`` entries with formula loc/lastmod/
    priority; a commented-out decoy entry on k%3==0; whitespace-noised
    ``<loc>`` values on k%2==1."""
    k = site_num.cast("bigint")
    domain = F.col("registered_domain")

    def entry(i: Column) -> Column:
        loc = F.concat(
            F.lit("https://"), domain, F.lit("/page"), i.cast("string")
        )
        noised = F.when(
            k % 2 == 1,
            F.concat(F.lit("\n      "), loc, F.lit(" \n    ")),
        ).otherwise(loc)
        day = 1 + (k + i) % 28
        pri = 1 + (k + i) % 9
        return F.concat(
            F.lit("  <url>\n    <loc>"), noised, F.lit("</loc>\n"),
            F.lit("    <lastmod>2026-03-"),
            F.lpad(day.cast("string"), 2, "0"),
            F.lit("</lastmod>\n    <priority>0."),
            pri.cast("string"),
            F.lit("</priority>\n  </url>\n"),
        )

    entries = F.aggregate(
        F.sequence(F.lit(0).cast("bigint"), 2 + k % 4),
        F.lit("").cast("string"),
        lambda acc, i: F.concat(acc, entry(i)),
    )
    decoy = F.when(
        k % 3 == 0,
        F.lit(
            "  <!-- retired:\n  <url><loc>https://decoy.example/x</loc>"
            "<lastmod>2026-01-01</lastmod></url>\n  -->\n"
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit(
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        ),
        decoy,
        entries,
        F.lit("</urlset>\n"),
    )


def parse_entries(xml: Column) -> Column:
    """sitemap text -> array<struct<loc, lastmod, priority_ppm>> in
    file order. Comments strip FIRST (one dotall regex — a phantom
    commented-out entry is the classic harvest bug), then ``<url>``
    blocks extract and each field reads per block; ``<loc>`` trims per
    the spec's whitespace rule; ``<priority>`` accepts the full spec
    range 0.0-1.0 ('1.0', '0.55', bare '1') and converts to exact
    integer ppm with fixed-point string arithmetic (int part * 10^6 +
    first 6 fraction digits zero-padded — no floats; digits past the
    6th truncate). Entries missing a field get
    empty string / null ppm rather than erroring (sitemaps are
    publisher input: lenient field presence, strict structure)."""
    clean = F.regexp_replace(xml, r"(?s)<!--.*?-->", "")
    blocks = F.regexp_extract_all(clean, F.lit(r"(?s)<url>(.*?)</url>"), 1)

    # Spark's trim() strips SPACES only — the spec's whitespace rule
    # includes newlines/tabs, so trim with a regex on both ends
    def wtrim(c: Column) -> Column:
        return F.regexp_replace(c, r"(?s)^\s+|\s+$", "")

    def fields(b: Column) -> Column:
        loc = wtrim(F.regexp_extract(b, r"(?s)<loc>(.*?)</loc>", 1))
        lastmod = wtrim(
            F.regexp_extract(b, r"(?s)<lastmod>(.*?)</lastmod>", 1)
        )
        # full spec range 0.0-1.0 (the r12 advisor's finding #3:
        # '1.0' and multi-digit fractions like '0.55' are legal),
        # converted with fixed-point string arithmetic — int part *
        # 10^6 plus the first 6 fraction digits right-padded with
        # zeros — never a float. The integer-1 branch admits only
        # zero fractions (the r13 advisor's finding: '[01](\.[0-9]+)?'
        # accepted out-of-spec '1.5'/'1.9', yielding ppm > 1000000;
        # the spec caps priority at 1.0, so out-of-range values now
        # fail the extract and land as null ppm like any other
        # malformed field)
        pri = F.regexp_extract(
            b, r"<priority>(0(?:\.[0-9]+)?|1(?:\.0+)?)</priority>", 1
        )
        ip = F.split(pri, "\\.").getItem(0)
        fp = F.when(
            F.instr(pri, ".") > 0, F.split(pri, "\\.").getItem(1)
        ).otherwise(F.lit(""))
        ppm = ip.cast("bigint") * 1000000 + F.rpad(
            F.substring(fp, 1, 6), 6, "0"
        ).cast("bigint")
        return F.struct(
            loc.alias("loc"),
            lastmod.alias("lastmod"),
            F.when(pri != "", ppm)
            .otherwise(F.lit(None).cast("bigint"))
            .alias("priority_ppm"),
        )

    return F.transform(blocks, fields)


@F.pandas_udf("binary")
def encode_xml_payload(xml, gz):  # type: ignore[misc]
    """Writer twin for the fetch layer (r14, the r13 verdict's item
    #5): the sitemap file as the BYTES a crawler would fetch. Plain
    children are utf-8; ``.xml.gz`` children (``gz`` true) compress as
    TWO concatenated gzip members split mid-document (mtime=0,
    deterministic) — real-world large sitemaps ship multi-member, and
    a reader that inflates only the FIRST member silently loses the
    tail entries and fails the hash gate (the member-decode decoy,
    sources/warc.py's device applied one layer up)."""
    import gzip  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    out = []
    for text, g in zip(xml, gz):
        raw = text.encode("utf-8")
        if g:
            cut = len(raw) // 2
            out.append(
                gzip.compress(raw[:cut], mtime=0)
                + gzip.compress(raw[cut:], mtime=0)
            )
        else:
            out.append(raw)
    return pd.Series(out)


@F.pandas_udf("string")
def decode_xml_payload(payload, url):  # type: ignore[misc]
    """Fetched sitemap bytes -> XML text. The compression choice is
    made BY FILENAME EXTENSION (how a real crawler decides — the URL
    it fetched is authoritative), never by magic-byte sniffing; gz
    payloads inflate as a CONCATENATED-MEMBER stream via the WARC
    member splitter (DEFLATE-structure boundaries, sources/warc.py:
    split_gzip_members), so multi-member files decode whole."""
    import pandas as pd  # noqa: PLC0415

    from gomrjob_spark.sources.warc import split_gzip_members  # noqa: PLC0415

    out = []
    for data, u in zip(payload, url):
        b = bytes(data)
        if u.endswith(".gz"):
            b = b"".join(m[2] for m in split_gzip_members(b))
        out.append(b.decode("utf-8"))
    return pd.Series(out)


def synth_sitemap_index(site_num: Column, gz_children: bool = False) -> Column:
    """``<sitemapindex>`` XML per domain as a PURE formula of the
    domain's site number ``k`` and registered domain — the discovery
    layer above :func:`synth_sitemap`: real publishers shard large
    sitemaps into an index file referenced from robots.txt's
    ``Sitemap:`` directive. 1 + k%3 child sitemaps at
    ``/sitemap-c<j>.xml``; a COMMENTED-OUT decoy ``<sitemap>`` block on
    k%3==0 (an index harvest that does not strip comments first fetches
    a phantom child and over-counts every later child's entries);
    whitespace-noised child ``<loc>`` values on k%2==1 (the spec's
    trimming rule, same device as the urlset fixture).

    ``gz_children=True`` (r14): every (k + j) % 2 == 0 child is listed
    with a ``.xml.gz`` extension — the realistic mixed-encoding index
    (most production sitemaps ship gzipped; the spec blesses it). The
    formula choice lets the oracle recompute which children are
    compressed without ever seeing the bytes."""
    k = site_num.cast("bigint")
    domain = F.col("registered_domain")

    def child(j: Column) -> Column:
        ext = (
            F.when((k + j) % 2 == 0, F.lit(".xml.gz")).otherwise(F.lit(".xml"))
            if gz_children
            else F.lit(".xml")
        )
        loc = F.concat(
            F.lit("https://"), domain, F.lit("/sitemap-c"),
            j.cast("string"), ext,
        )
        noised = F.when(
            k % 2 == 1,
            F.concat(F.lit("\n      "), loc, F.lit(" \n    ")),
        ).otherwise(loc)
        return F.concat(
            F.lit("  <sitemap>\n    <loc>"), noised,
            F.lit("</loc>\n  </sitemap>\n"),
        )

    children = F.aggregate(
        F.sequence(F.lit(0).cast("bigint"), k % 3),
        F.lit("").cast("string"),
        lambda acc, j: F.concat(acc, child(j)),
    )
    decoy = F.when(
        k % 3 == 0,
        F.lit(
            "  <!-- migrated:\n  <sitemap><loc>https://decoy.example/"
            "old-sitemap.xml</loc></sitemap>\n  -->\n"
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit(
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
            'sitemap/0.9">\n'
        ),
        decoy,
        children,
        F.lit("</sitemapindex>\n"),
    )


def parse_index_entries(xml: Column) -> Column:
    """sitemapindex text -> array<string> of child sitemap URLs in
    file order: comments strip FIRST (the urlset rule — a phantom
    commented-out child is the same harvest bug one level up), then
    ``<sitemap>`` blocks extract and each ``<loc>`` trims per the
    spec's whitespace rule. A urlset file yields an empty array (its
    ``<url>`` blocks are not ``<sitemap>`` blocks) — discovery code
    can therefore probe a fetched file for index-ness before choosing
    the parser."""
    clean = F.regexp_replace(xml, r"(?s)<!--.*?-->", "")
    blocks = F.regexp_extract_all(
        clean, F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), 1
    )
    return F.transform(
        blocks,
        lambda b: F.regexp_replace(
            F.regexp_extract(b, r"(?s)<loc>(.*?)</loc>", 1),
            r"(?s)^\s+|\s+$",
            "",
        ),
    )


def synth_child_sitemap(site_num: Column, child_idx: Column) -> Column:
    """Child urlset ``j`` of domain ``k`` as a pure formula — the
    sharded second level under :func:`synth_sitemap_index`. 2 +
    (k+j)%3 entries; odd entries point INTO the domain's robots-gated
    ``/a<(k+j)%4>/p...`` section (so the discovery query's robots join
    has a real decision surface: some publisher-listed URLs are
    robots-disallowed — the inconsistency worth surfacing), even
    entries to ``/c<j>/page<i>``; same comment-decoy (k+j)%3==0 and
    whitespace-noise (k+j)%2==1 devices as the flat fixture."""
    k = site_num.cast("bigint")
    j = child_idx.cast("bigint")
    domain = F.col("registered_domain")

    def entry(i: Column) -> Column:
        path = F.when(
            i % 2 == 1,
            F.concat(
                F.lit("/a"), ((k + j) % 4).cast("string"),
                F.lit("/p"), i.cast("string"),
            ),
        ).otherwise(
            F.concat(
                F.lit("/c"), j.cast("string"),
                F.lit("/page"), i.cast("string"),
            )
        )
        loc = F.concat(F.lit("https://"), domain, path)
        noised = F.when(
            (k + j) % 2 == 1,
            F.concat(F.lit("\n      "), loc, F.lit(" \n    ")),
        ).otherwise(loc)
        day = 1 + (k + j + i) % 28
        pri = 1 + (k + j + i) % 9
        return F.concat(
            F.lit("  <url>\n    <loc>"), noised, F.lit("</loc>\n"),
            F.lit("    <lastmod>2026-03-"),
            F.lpad(day.cast("string"), 2, "0"),
            F.lit("</lastmod>\n    <priority>0."),
            pri.cast("string"),
            F.lit("</priority>\n  </url>\n"),
        )

    entries = F.aggregate(
        F.sequence(F.lit(0).cast("bigint"), 1 + (k + j) % 3),
        F.lit("").cast("string"),
        lambda acc, i: F.concat(acc, entry(i)),
    )
    decoy = F.when(
        (k + j) % 3 == 0,
        F.lit(
            "  <!-- retired:\n  <url><loc>https://decoy.example/x</loc>"
            "<lastmod>2026-01-01</lastmod></url>\n  -->\n"
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit(
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        ),
        decoy,
        entries,
        F.lit("</urlset>\n"),
    )
