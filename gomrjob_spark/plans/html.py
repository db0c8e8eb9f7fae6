"""HTML main-content extraction queries (operators/html.py) + oracles.

The documents fixture has no HTML column, so every query synthesizes a
page per document with :func:`gomrjob_spark.operators.html.synth_html` —
a pure formula in (doc_id, text) that the oracle recomputes byte-for-byte
(``_HTML_PAGE_SQL``), the multimodal synthesis device. The oracle then
re-implements the WHOLE extraction contract independently in SQL
(``_HTML_BLOCK_SQL``: regexp segmentation + list-HOF metrics), so the
hash gate compares two independent extractor implementations, not one
formula against itself — and the synthesized decoys (script/comment
blocks embedding fake ``<p>`` markup, a raw ``>`` inside an attribute
value, entity-encoded angle brackets) mean a naive splitter or
tag-stripper on EITHER side would hash-mismatch.

No f-strings here: the synthesized page and the quote-aware tag regexes
contain ``{``/``}`` and ``"`` literally, so the oracle strings compose by
plain concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gomrjob_spark.catalog import load_table
from gomrjob_spark.operators import html as H
from gomrjob_spark.plans.registry import query

#: oracle copy of the synth_html formula (byte-identical page); the
#: WHERE_PRED placeholder lets the streaming twin restrict the source
#: (plains string replace, not format: the SQL contains ``{``)
_HTML_PAGE_SQL = """
    hsrc AS (
      SELECT doc_id, coalesce(text, '') AS text,
             coalesce(lang, 'und') AS lang FROM documents
      WHERE WHERE_PRED
    ),
    hchunks AS (
      SELECT doc_id,
        string_agg(
          '<p class="c' || CAST(doc_id % 3 AS VARCHAR) || '">'
          || substr(text, CAST(i * 200 + 1 AS INT), 200)
          || CASE WHEN (doc_id + i) % 4 = 0
                  THEN ' <a href="/r' || CAST(i AS VARCHAR) || '">more</a>'
                  ELSE '' END
          || '</p>', '' ORDER BY i) AS paras
      FROM hsrc,
           unnest(generate_series(0, (len(text) + 199) // 200 - 1)) t(i)
      WHERE len(text) > 0
      GROUP BY doc_id
    ),
    hpages AS MATERIALIZED (
      SELECT s.doc_id,
        '<html lang="' || s.lang || '"><head><title>Doc '
        || CAST(s.doc_id AS VARCHAR)
        || '</title><meta name="description" content="Summary '
        || CAST(s.doc_id % 50 AS VARCHAR) || ' &amp; notes">'
        || CASE WHEN s.doc_id % 9 = 8 THEN ''
                ELSE '<link rel="canonical" href="https://canon.site'
                     || CAST((s.doc_id // 6) % 11 AS VARCHAR) || '.com/c'
                     || CAST(s.doc_id // 6 AS VARCHAR) || '">' END
        || '<style>p{font:12px}</style></head><body>'
        || '<nav><a href="/">Home</a> | <a href="/about">About</a> | <a href="/c'
        || CAST(s.doc_id % 5 AS VARCHAR) || '">Contact</a></nav>'
        || coalesce(c.paras, '')
        || '<div class="promo"><a href="/buy?x=' || CAST(s.doc_id AS VARCHAR)
        || '">Buy now &amp; save &lt;deals&gt;</a></div>'
        || '<script>var p = "<p>fake ' || CAST(s.doc_id AS VARCHAR)
        || '</p><a href="http://evil' || CAST(s.doc_id % 4 AS VARCHAR)
        || '.example/x">c</a>";</script>'
        || '<!-- build ' || CAST(s.doc_id % 97 AS VARCHAR)
        || ' <p>also fake</p> -->'
        || '<pre>v' || CAST(s.doc_id % 5 AS VARCHAR) || '</pre>'
        || '<div class="meta" title="rev>0">updated '
        || CAST(s.doc_id % 28 AS VARCHAR) || '</div>'
        || '<footer>Copyright &amp; Terms <abbr>TM</abbr> <a href="/t">Terms</a> <a href="/p">Privacy</a> <a href="http://partner'
        || CAST(s.doc_id % 7 AS VARCHAR) || '.example/p'
        || CAST(s.doc_id % 3 AS VARCHAR) || '">Partner</a></footer>'
        || '</body></html>' AS html
      FROM hsrc s LEFT JOIN hchunks c USING (doc_id)
    )"""

#: invisible-element removal (shared by the block and link extractors)
_HTML_CLEAN_SQL = """
    hclean AS (
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(html,
          '(?s)<script(?:[^>"]|"[^"]*")*>.*?</script>', '', 'g'),
          '(?s)<style(?:[^>"]|"[^"]*")*>.*?</style>', '', 'g'),
          '(?s)<!--.*?-->', '', 'g') AS ch
      FROM hpages
    )"""


def _html_clean_ctes(pred: str = "TRUE") -> str:
    """Page synthesis + invisible removal over a restricted document
    source — the shared prefix for link-layer oracles (plans/web.py)."""
    return (_HTML_PAGE_SQL + "," + _HTML_CLEAN_SQL).replace(
        "WHERE_PRED", pred
    )


#: independent SQL re-implementation of the extraction contract
#: (segment blocks -> per-block metrics, over hclean)
_HTML_BLOCK_SQL = """
    hfrag AS (
      SELECT doc_id,
        string_split_regex(ch,
          '<(?:p|div|nav|footer)(?:[ \t\r\n](?:[^>"]|"[^"]*")*)?>')
          AS fr,
        regexp_extract_all(ch,
          '<(p|div|nav|footer)(?:[ \t\r\n](?:[^>"]|"[^"]*")*)?>', 1)
          AS opens
      FROM hclean
    ),
    hblk AS (
      SELECT doc_id, i AS block_idx,
             opens[CAST(i + 1 AS INT)] AS tag,
             fr[CAST(i + 2 AS INT)] AS frag
      FROM hfrag, unnest(generate_series(0, len(opens) - 1)) t(i)
    ),
    hmet AS (
      SELECT doc_id, block_idx, tag,
        replace(replace(replace(replace(
          trim(regexp_replace(
            regexp_replace(frag, '<(?:[^>"]|"[^"]*")*>', '', 'g'),
            '\\s+', ' ', 'g')),
          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&')
          AS block_text,
        coalesce(list_sum(list_transform(
          regexp_extract_all(frag,
            '(?s)<a(?:[ \t\r\n](?:[^>"]|"[^"]*")*)?>(.*?)</a>', 1),
          l -> len(replace(replace(replace(replace(l,
            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&')))), 0)
          AS lc
      FROM hblk
    ),
    hstat AS MATERIALIZED (
      SELECT doc_id, CAST(block_idx AS INT) AS block_idx, tag, block_text,
        CAST(len(block_text) AS BIGINT) AS n_chars,
        CAST(lc AS BIGINT) AS link_chars,
        CAST(CASE WHEN len(block_text) > 0
                  THEN (1000 * lc) // len(block_text)
                  ELSE 1000 END AS BIGINT) AS link_density_pm,
        CAST(CASE WHEN block_text = '' THEN 0
                  ELSE len(string_split(block_text, ' ')) END AS BIGINT)
          AS n_words,
        CAST(len(list_filter(string_split(block_text, ' '),
                             w -> w IN ('the', 'a'))) AS BIGINT) AS n_stop,
        len(block_text) >= 40
          AND (CASE WHEN len(block_text) > 0
                    THEN (1000 * lc) // len(block_text)
                    ELSE 1000 END) <= 300
          AND len(list_filter(string_split(block_text, ' '),
                              w -> w IN ('the', 'a'))) >= 1 AS is_content
      FROM hmet
    )"""

_HTML_CTES = (
    _HTML_PAGE_SQL + "," + _HTML_CLEAN_SQL + "," + _HTML_BLOCK_SQL
).replace("WHERE_PRED", "TRUE")


def _html_gate_oracle(pred: str) -> str:
    """Gate oracle over a restricted document source — shared by the
    batch gate (pred TRUE) and the streaming twin (stream split)."""
    ctes = (
        _HTML_PAGE_SQL + "," + _HTML_CLEAN_SQL + "," + _HTML_BLOCK_SQL
    ).replace("WHERE_PRED", pred)
    return (
        "WITH "
        + ctes
        + _HTML_DOC_SQL
        + """
    SELECT doc_id, n_blocks, n_content_blocks,
      CAST(CASE WHEN total_chars > 0
                THEN (1000000 * content_chars) // total_chars
                ELSE 0 END AS BIGINT) AS content_ppm,
      main_text,
      (CASE WHEN total_chars > 0
            THEN (1000000 * content_chars) // total_chars
            ELSE 0 END) >= 500000 AND n_content_blocks >= 1 AS admitted
    FROM hdoc ORDER BY doc_id
    """
    )

#: shared per-document rollup over the block table
_HTML_DOC_SQL = """,
    hdoc AS (
      SELECT doc_id,
        CAST(count(*) AS BIGINT) AS n_blocks,
        CAST(sum(CASE WHEN is_content THEN 1 ELSE 0 END) AS BIGINT)
          AS n_content_blocks,
        CAST(sum(CASE WHEN is_content THEN n_chars ELSE 0 END) AS BIGINT)
          AS content_chars,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        coalesce(string_agg(block_text, ' ' ORDER BY block_idx)
                   FILTER (WHERE is_content), '') AS main_text
      FROM hstat GROUP BY doc_id
    )"""


def _docs_with_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with their synthesized page. text.spread fans the
    single-row-group fixture file across the local cores (measured
    14.5 s -> 0.9 s at sf0.1: the whole family is CPU-bound regex
    work that otherwise serializes into the file's one task); on a
    real cluster the conf is unset and spread is a no-op — the scan's
    own splits carry the parallelism, so the family's zero-EXTRA-
    shuffle property holds where it matters."""
    from gomrjob_spark.operators.text import spread

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    return spread(docs).select(
        "doc_id",
        H.synth_html("doc_id", "text", "lang").alias("html"),
    )


@query(
    "html_block_stats",
    oracle="WITH "
    + _HTML_CTES
    + """
    SELECT doc_id, block_idx, tag, block_text, n_chars, link_chars,
           link_density_pm, n_words, n_stop, is_content
    FROM hstat ORDER BY doc_id, block_idx
    """,
)
def html_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block segmentation + metrics (html.block_structs): every
    block-level element of every synthesized page with its visible
    text, link-text chars, fixed-point link density, word/stopword
    counts, and the jusText-style content verdict. The decoys make this
    the adversarial gate of the family — script/comment ``<p>`` decoys
    must NOT appear as blocks, and the ``title="rev>0"`` attribute must
    not truncate its tag. Row-local codegen + one Generate (posexplode
    in the scan stage): zero shuffles before the oracle-determinism
    orderBy."""
    from gomrjob_spark.cache import scoped_persist

    # persist BEFORE the explode: a Generate over an array built by an
    # expensive transform re-evaluates the whole builder per emitted
    # element (the r5 plan rule) — materializing the block array once
    # per document measured 20.7 s -> 4.7 s warm at sf0.1
    staged = scoped_persist(H.with_blocks(_docs_with_html(spark, sf_dir)))
    b = F.col("block")
    return (
        staged.select(
            "doc_id", F.posexplode("blocks").alias("block_idx", "block")
        )
        .select(
            "doc_id",
            F.col("block_idx").cast("int").alias("block_idx"),
            b["tag"].alias("tag"),
            b["block_text"].alias("block_text"),
            b["n_chars"].alias("n_chars"),
            b["link_chars"].alias("link_chars"),
            b["link_density_pm"].alias("link_density_pm"),
            b["n_words"].alias("n_words"),
            b["n_stop"].alias("n_stop"),
            b["is_content"].alias("is_content"),
        )
        .orderBy("doc_id", "block_idx")
    )


@query(
    "html_extract_text",
    oracle="WITH "
    + _HTML_CTES
    + _HTML_DOC_SQL
    + """
    SELECT doc_id, n_blocks, n_content_blocks, content_chars, total_chars,
           main_text
    FROM hdoc ORDER BY doc_id
    """,
)
def html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction (html.doc_content_summary): the WET-style
    per-document output — content blocks' visible text joined in
    document order, plus the content/chrome char split. Computed with
    array HOFs over the staged block array: ZERO shuffles (no groupBy
    anywhere), so at 100 TB this is a scan-local projection in the same
    stage as the WARC payload walk. The oracle reaches the same rollup
    through an unnest + GROUP BY — two independent aggregation
    strategies under one hash."""
    staged = H.doc_content_summary(
        H.with_blocks(_docs_with_html(spark, sf_dir))
    )
    return staged.select(
        "doc_id",
        "n_blocks",
        "n_content_blocks",
        "content_chars",
        "total_chars",
        "main_text",
    ).orderBy("doc_id")


@query(
    "html_content_gate",
    oracle="WITH "
    + _HTML_CTES
    + _HTML_DOC_SQL
    + """
    SELECT doc_id, n_content_blocks,
      CAST(CASE WHEN total_chars > 0
                THEN (1000000 * content_chars) // total_chars
                ELSE 0 END AS BIGINT) AS content_ppm,
      (CASE WHEN total_chars > 0
            THEN (1000000 * content_chars) // total_chars
            ELSE 0 END) >= 500000 AND n_content_blocks >= 1 AS admitted
    FROM hdoc ORDER BY doc_id
    """,
)
def html_content_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-ratio admission (html.content_gate): pages whose chrome
    outweighs their prose are dropped BEFORE any text operator runs —
    the trafilatura-class precision gate of a crawl ingest. Fixed-point
    ppm ratio (no floats in gates); both verdict classes are populated
    by construction (short/stopword-free documents fall under the
    50% content floor — non-vacuity pinned in tests/test_html.py).
    Zero shuffles: scan-local column program end to end."""
    staged = H.content_gate(
        H.doc_content_summary(H.with_blocks(_docs_with_html(spark, sf_dir)))
    )
    return staged.select(
        "doc_id", "n_content_blocks", "content_ppm", "admitted"
    ).orderBy("doc_id")


@query(
    "html_metadata",
    oracle="""
    SELECT doc_id,
      'Doc ' || CAST(doc_id AS VARCHAR) AS title,
      coalesce(lang, 'und') AS lang_attr,
      'Summary ' || CAST(doc_id % 50 AS VARCHAR) || ' & notes'
        AS description,
      CASE WHEN doc_id % 9 = 8 THEN ''
           ELSE 'https://canon.site'
                || CAST((doc_id // 6) % 11 AS VARCHAR) || '.com/c'
                || CAST(doc_id // 6 AS VARCHAR) END AS canonical_href,
      doc_id % 9 <> 8 AS has_canonical
    FROM documents ORDER BY doc_id
    """,
)
def html_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-metadata extraction (html.extract_metadata) — the surface
    every crawl extractor reads before the body: title and meta
    description (entity-decoded: the synthesized description carries
    '&amp;'), the html lang attribute (the fixture's REAL lang column
    round-trips through the page bytes — the langid prior), and the
    publisher's rel=canonical hint (absent on every 9th document, so
    has_canonical is non-vacuous). The oracle recomputes every field
    from the synthesis formulas, so a regex that reads a decoy, skips
    entity decode, or misparses the lang attribute cannot hash-match.
    Row-local codegen; zero shuffles before the orderBy."""
    staged = _docs_with_html(spark, sf_dir)
    m = H.extract_metadata("html")
    return staged.select(
        "doc_id",
        m["title"].alias("title"),
        m["lang_attr"].alias("lang_attr"),
        m["description"].alias("description"),
        m["canonical_href"].alias("canonical_href"),
        m["has_canonical"].alias("has_canonical"),
    ).orderBy("doc_id")
