"""robots.txt parsing + RFC 9309 verdicts (operators/robots.py).

The driver hash gate proves parse+match+precedence against the oracle's
independent decision table; these tests pin the RFC semantics on
handcrafted files (longest-match, Allow tie-break, denylist default,
directive tolerance) and the plan shape (scan-local)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from gomrjob_spark.operators import robots as R


def _verdict(spark, txt: str, path: str):
    df = spark.createDataFrame([(txt, path)], "txt string, path string")
    out = df.select(
        R.robots_verdict(F.col("path"), R.parse_rules(F.col("txt"))).alias("v")
    ).select("v.*")
    return out.first()


ROBOTS = (
    "# comment line\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /private\n"
    "Allow: /private/ok\n"
    "Crawl-delay: 3\n"
    "Sitemap: https://x.example/s.xml\n"
)


class TestParse:
    def test_only_allow_disallow_become_rules(self, spark):
        df = spark.createDataFrame([(ROBOTS,)], "txt string")
        rules = df.select(
            R.parse_rules(F.col("txt")).alias("r")
        ).first()["r"]
        assert [(r["allow"], r["prefix"]) for r in rules] == [
            (False, "/private"),
            (True, "/private/ok"),
        ]


class TestVerdict:
    def test_no_match_is_allowed(self, spark):
        v = _verdict(spark, ROBOTS, "/public/page")
        assert v["allowed"] and v["rule_prefix"] == ""

    def test_disallow_prefix_blocks(self, spark):
        v = _verdict(spark, ROBOTS, "/private/data")
        assert not v["allowed"] and v["rule_prefix"] == "/private"

    def test_longer_allow_overrides_shorter_disallow(self, spark):
        v = _verdict(spark, ROBOTS, "/private/ok/page")
        assert v["allowed"] and v["rule_prefix"] == "/private/ok"

    def test_allow_wins_length_tie_either_order(self, spark):
        tie1 = "User-agent: *\nDisallow: /x\nAllow: /y\n"
        tie2 = "User-agent: *\nAllow: /z\nDisallow: /z\n"
        tie3 = "User-agent: *\nDisallow: /z\nAllow: /z\n"
        assert not _verdict(spark, tie1, "/x1")["allowed"]
        assert _verdict(spark, tie2, "/z9")["allowed"]
        assert _verdict(spark, tie3, "/z9")["allowed"]

    def test_first_match_semantics_would_be_wrong(self, spark):
        # Disallow listed FIRST but the longer Allow must still win
        txt = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
        assert _verdict(spark, txt, "/a/b/c")["allowed"]
        assert not _verdict(spark, txt, "/a/x")["allowed"]

    def test_empty_robots_allows_everything(self, spark):
        assert _verdict(spark, "", "/anything")["allowed"]


class TestSynthesisNonVacuity:
    def test_fixture_populates_both_verdicts_and_override(self, spark, sf_dir):
        from gomrjob_spark.plans.registry import QUERIES

        out = QUERIES["robots_txt_gate"](spark, sf_dir)
        counts = dict(out.groupBy("allowed").count().collect())
        assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0
        overrides = out.filter(F.col("rule_prefix").endswith("/p")).count()
        assert overrides > 0  # longest-match Allow genuinely fires


class TestPlanShape:
    def test_gate_is_scan_local(self, spark, sf_dir):
        from gomrjob_spark.plans.registry import QUERIES

        buf = io.StringIO()
        with redirect_stdout(buf):
            QUERIES["robots_txt_gate"](spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        # one Exchange allowed: the oracle-determinism global orderBy
        assert plan.count("Exchange") <= 2
        assert "BatchEvalPython" not in plan


class TestGroupSelection:
    """RFC 9309 group semantics (the r11 in-round review's finding #1:
    an all-groups parse lets a bot-specific Disallow leak into *)."""

    def test_other_agents_group_is_ignored(self, spark):
        txt = (
            "User-agent: googlebot\nDisallow: /\n\n"
            "User-agent: *\nAllow: /\n"
        )
        v = _verdict(spark, txt, "/page")
        assert v["allowed"] and v["rule_prefix"] == "/"

    def test_star_among_consecutive_agent_lines(self, spark):
        txt = (
            "User-agent: badbot\nUser-agent: *\nDisallow: /x\n"
        )
        assert not _verdict(spark, txt, "/x1")["allowed"]

    def test_agent_line_after_rules_starts_new_group(self, spark):
        txt = (
            "User-agent: *\nDisallow: /a\n"
            "User-agent: badbot\nDisallow: /\n"
        )
        v = _verdict(spark, txt, "/b")
        assert v["allowed"]  # badbot's Disallow / is NOT a * rule
        assert not _verdict(spark, txt, "/a1")["allowed"]

    def test_comments_do_not_end_a_group(self, spark):
        txt = (
            "User-agent: *\n# note\n\nCrawl-delay: 3\nDisallow: /a\n"
        )
        assert not _verdict(spark, txt, "/a1")["allowed"]

    def test_file_without_star_group_allows_all(self, spark):
        txt = "User-agent: badbot\nDisallow: /\n"
        assert _verdict(spark, txt, "/anything")["allowed"]


class TestLineLeniency:
    """Real-world line shapes (review finding #2): a dropped Disallow
    fails OPEN, so recognition must be RFC-lenient."""

    def test_lowercase_verb(self, spark):
        assert not _verdict(
            spark, "User-agent: *\ndisallow: /p\n", "/p1"
        )["allowed"]

    def test_no_space_and_extra_space_after_colon(self, spark):
        assert not _verdict(
            spark, "User-agent: *\nDisallow:/p\n", "/p1"
        )["allowed"]
        assert not _verdict(
            spark, "User-agent: *\nDisallow:   /p\n", "/p1"
        )["allowed"]

    def test_tabs_and_trailing_comment(self, spark):
        assert not _verdict(
            spark, "User-agent: *\nDisallow:\t/p # keep out\n", "/p1"
        )["allowed"]

    def test_crlf_line_endings(self, spark):
        assert not _verdict(
            spark, "User-agent: *\r\nDisallow: /p\r\n", "/p1"
        )["allowed"]

    def test_empty_disallow_value_matches_nothing(self, spark):
        v = _verdict(spark, "User-agent: *\nDisallow:\n", "/any")
        assert v["allowed"] and v["rule_prefix"] == ""


class TestSynthesizedGroupDecoy:
    def test_badbot_group_is_excluded_from_star_rules(self, spark):
        """k%5==1 domains carry a trailing 'User-agent: badbot /
        Disallow: /' group; the * rule set must be exactly the
        domain's own three rules (an all-groups parse would block
        everything and fail the driver hash gate)."""
        df = spark.createDataFrame([(6,)], "k bigint")
        rules = df.select(
            R.parse_rules(R.synth_robots(F.col("k"))).alias("r")
        ).first()["r"]
        assert [(r["allow"], r["prefix"]) for r in rules] == [
            (False, "/a2"),
            (True, "/a2/p"),
            (False, "/buy"),
        ]
        # and the decoy group is genuinely present in the file bytes
        txt = df.select(
            R.synth_robots(F.col("k")).alias("t")
        ).first()["t"]
        assert "User-agent: badbot" in txt


class TestPatternRules:
    """RFC 9309 §2.2.3 '*' wildcard and '$' end-anchor matching (the
    r11 advisor's finding: literal-startswith never matches
    'Disallow: /*.php' and fails OPEN). Cases follow the RFC's own
    example table plus the Google matcher's published edge cases."""

    def test_star_matches_any_sequence(self, spark):
        txt = "User-agent: *\nDisallow: /*.php\n"
        assert not _verdict(spark, txt, "/index.php")["allowed"]
        assert not _verdict(spark, txt, "/folder/any.php.html")["allowed"]
        assert _verdict(spark, txt, "/index.html")["allowed"]

    def test_dollar_anchors_at_end(self, spark):
        txt = "User-agent: *\nDisallow: /*.php$\n"
        assert not _verdict(spark, txt, "/index.php")["allowed"]
        # .php NOT at path end: the anchor must release it
        assert _verdict(spark, txt, "/index.php5")["allowed"]
        assert _verdict(spark, txt, "/index.php/")["allowed"]

    def test_fish_star_examples(self, spark):
        txt = "User-agent: *\nDisallow: /fish*\n"
        for p in ("/fish", "/fishheads", "/fish/salmon.html"):
            assert not _verdict(spark, txt, p)["allowed"], p
        assert _verdict(spark, txt, "/Fish.asp")["allowed"]  # case-sensitive

    def test_pattern_length_is_rule_octets(self, spark):
        # Allow '/a/b' (4) vs wildcard Disallow '/*/b/c' (6): the
        # PATTERN's octet count decides, so the wildcard wins
        txt = "User-agent: *\nAllow: /a/b\nDisallow: /*/b/c\n"
        v = _verdict(spark, txt, "/a/b/c")
        assert not v["allowed"] and v["rule_prefix"] == "/*/b/c"

    def test_allow_wins_tie_against_pattern(self, spark):
        # both length 5: literal Allow ties wildcard Disallow -> allow
        txt = "User-agent: *\nDisallow: /a*/p\nAllow: /a2/p\n"
        assert _verdict(spark, txt, "/a2/p9")["allowed"]
        assert not _verdict(spark, txt, "/a3/p9")["allowed"]

    def test_regex_metacharacters_in_rule_are_literal(self, spark):
        # '.' and '+' in a rule are literal octets, not regex metas
        txt = "User-agent: *\nDisallow: /a.b+c\n"
        assert not _verdict(spark, txt, "/a.b+c/d")["allowed"]
        assert _verdict(spark, txt, "/aXbbc/d")["allowed"]

    def test_literal_rules_still_prefix_match(self, spark):
        # regression: pattern support must not break plain prefixes
        txt = "User-agent: *\nDisallow: /private\n"
        assert not _verdict(spark, txt, "/private/data")["allowed"]

    def test_synth_pattern_rules_fire_in_fixture(self, spark, sf_dir):
        from gomrjob_spark.plans.registry import QUERIES

        out = QUERIES["robots_txt_gate"](spark, sf_dir)
        wild = out.filter(F.col("rule_prefix") == "/a*/p").count()
        anch = out.filter(F.col("rule_prefix") == "/*0$").count()
        assert wild > 0 and anch > 0  # both pattern rules non-vacuous


def test_sql_string_robots_match_dsl(spark):
    """The r15 SQL-string forms of synth_robots / parse_rules /
    robots_verdict (one server-side parse per consuming query) must
    evaluate bit-identically to the Column-DSL forms at every named
    call site — over every fixture site number x every fixture path
    shape, so every rule class (pattern, end-anchor, Allow override,
    second group, tie) is exercised on both paths."""
    import pyspark.sql.functions as F

    from gomrjob_spark.operators import robots

    ks = spark.range(0, 300).select(F.col("id").alias("k"))
    d1 = ks.select(
        robots.synth_robots("k").alias("a"),
        robots.synth_robots(F.col("k")).alias("b"),
    ).filter("NOT (a <=> b)")
    assert d1.count() == 0

    txts = ks.withColumn("robots_txt", robots.synth_robots("k"))
    d2 = txts.select(
        robots.parse_rules("robots_txt").alias("a"),
        robots.parse_rules(F.col("robots_txt")).alias("b"),
    ).filter("NOT (a <=> b)")
    assert d2.count() == 0

    paths = spark.createDataFrame(
        [("/a0/p7",), ("/a1/p9/",), ("/buy",), ("/a2",), ("/x0",),
         ("/",), ("",), ("/a3/p0",), ("/a0p",)],
        "path string",
    )
    both = txts.withColumn(
        "rules", robots.parse_rules("robots_txt")
    ).crossJoin(paths)
    va = robots.robots_verdict("path", "rules")
    vb = robots.robots_verdict(F.col("path"), F.col("rules"))
    d3 = both.select(va.alias("a"), vb.alias("b")).filter("NOT (a <=> b)")
    assert d3.count() == 0

    # the composed all-SQL chain (the funnel/train call shape) equals
    # the all-DSL chain end to end
    comp_sql = robots.robots_verdict(
        "path",
        robots._parse_rules_sql(robots._synth_robots_sql("CAST(`k` AS BIGINT)")),
    )
    comp_dsl = robots._robots_verdict_dsl(
        F.col("path"), robots._parse_rules_dsl(robots.synth_robots(F.col("k")))
    )
    d4 = (
        ks.crossJoin(paths)
        .select(comp_sql.alias("a"), comp_dsl.alias("b"))
        .filter("NOT (a <=> b)")
    )
    assert d4.count() == 0
