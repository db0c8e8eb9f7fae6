"""robots.txt parsing + admission — the crawl's position MINUS ONE.

Before a crawler fetches (or a curation pipeline keeps) a URL, the
domain's robots.txt decides whether the path is allowed (RFC 9309).
The semantics that matter — and that naive substring matchers get
wrong — are:

1. group selection by ``User-agent`` (this engine models the ``*``
   group, the one curation pipelines honor);
2. per-path decision by the LONGEST matching rule prefix ("most
   specific wins"), not first-match or any-disallow;
3. on a length tie between an Allow and a Disallow, ALLOW wins;
4. no matching rule -> allowed (robots is a denylist protocol);
5. unknown directives (``Crawl-delay``, ``Sitemap``), comments, and
   blank lines are skipped, not errors.

The operator family is a pure row-local column program: the robots.txt
TEXT parses per row (split lines -> directive regex -> rule structs)
and the verdict folds over the matched rules with one array
``aggregate`` — zero shuffles, the URL-gate posture, so robots
admission composes into the same scan as url_normalize at 100 TB.

The fixture has no robots files, so the registered query SYNTHESIZES a
robots.txt per registered domain as a formula in the domain's site
number (the urls-family device), with the adversarial cases baked in:
every domain Disallows one ``/a<k>`` section; every third domain adds a
LONGER ``Allow: /a<k>/p`` override (so a first-match or any-disallow
implementation mis-blocks those paths and cannot hash-match); comment /
blank / unknown-directive lines are interleaved so a parser that treats
them as rules fails.

Reference parity note: jehiah/gomrjob has no crawl layer; this family
is part of the LLM-training-data surface the build brief adds
(SURVEY.md §2F extensions), sitting directly in front of
operators/urls.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: directive line: captures (verb, value); tolerates spaces; unknown
#: verbs are filtered out downstream
_RULE_PAT = "^(Allow|Disallow): (/[^ ]*)$"


def synth_robots(site_num: Column) -> Column:
    """robots.txt text per domain as a PURE formula of the domain's
    site number ``k`` (mirrored by the oracle CTE in plans/web.py):
    a comment header, the ``*`` group, ``Disallow: /a<k%4>``, a
    longest-match ``Allow: /a<k%4>/p`` override on every third domain,
    an extra ``Disallow: /buy`` on even domains, an unknown
    ``Crawl-delay`` directive, and a blank line."""
    k = site_num.cast("bigint")
    sec = (k % 4).cast("string")
    return F.concat(
        F.lit("# robots for site"),
        k.cast("string"),
        F.lit("\n\nUser-agent: *\nDisallow: /a"),
        sec,
        F.when(
            k % 3 == 0,
            F.concat(F.lit("\nAllow: /a"), sec, F.lit("/p")),
        ).otherwise(F.lit("")),
        F.when(k % 2 == 0, F.lit("\nDisallow: /buy")).otherwise(F.lit("")),
        F.lit("\nCrawl-delay: "),
        (k % 5).cast("string"),
        F.lit("\n"),
    )


def parse_rules(robots_txt: Column) -> Column:
    """robots.txt text -> array<struct<allow boolean, prefix string>>
    in file order: split lines, keep only Allow/Disallow directives
    with a path value (comments, blanks, User-agent, and unknown
    directives drop — rule 5), decode each into (allow, prefix)."""
    lines = F.split(robots_txt, "\n")
    rules = F.filter(
        lines, lambda ln: ln.rlike(_RULE_PAT)
    )
    return F.transform(
        rules,
        lambda ln: F.struct(
            (F.regexp_extract(ln, _RULE_PAT, 1) == "Allow").alias("allow"),
            F.regexp_extract(ln, _RULE_PAT, 2).alias("prefix"),
        ),
    )


def robots_verdict(path: Column, rules: Column) -> Column:
    """Struct (allowed, rule_prefix) for a URL path under a parsed
    rule array — RFC 9309 decision: longest matching prefix wins,
    Allow wins length ties, no match -> allowed with the empty rule.
    One array ``aggregate`` fold, row-local."""
    matches = F.filter(rules, lambda r: path.startswith(r["prefix"]))
    zero = F.struct(
        F.lit(True).alias("allow"), F.lit("").alias("prefix")
    )
    best = F.aggregate(
        matches,
        zero,
        lambda acc, r: F.when(
            (F.length(r["prefix"]) > F.length(acc["prefix"]))
            | (
                (F.length(r["prefix"]) == F.length(acc["prefix"]))
                & r["allow"]
                & ~acc["allow"]
            ),
            r,
        ).otherwise(acc),
    )
    return F.struct(
        best["allow"].alias("allowed"),
        best["prefix"].alias("rule_prefix"),
    )
