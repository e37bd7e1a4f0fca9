"""robots.txt politeness gate: RFC 9309 parser semantics against the
spec's own examples, parser == the oracle's hand-derived rule table,
and the distributed gate against the pure evaluator."""

from databricks_pdf_ocr_spark.functions import robotsmini
from databricks_pdf_ocr_spark.operators import linkgraph
from databricks_pdf_ocr_spark.queries import ROBOTS_TEXTS


def test_parse_groups_and_agent_selection():
    text = (
        "# comment only\n"
        "Disallow: /ignored-before-any-group/\n"
        "User-agent: a\n"
        "User-agent: b\n"
        "Disallow: /shared/\n"
        "Sitemap: https://x/s.xml\n"
        "Allow: /shared/ok/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /all/\n"
        "Disallow:\n"                      # empty value → no rule
    )
    groups = robotsmini.parse_robots(text)
    assert groups == [(["a", "b"], [(False, "/shared/"),
                                    (True, "/shared/ok/")]),
                      (["*"], [(False, "/all/")])]
    # most specific agent wins; '*' is the fallback
    assert robotsmini.rules_for_agent(groups, "a-crawler/1.0") == \
        [(False, "/shared/"), (True, "/shared/ok/")]
    assert robotsmini.rules_for_agent(groups, "other") == [(False, "/all/")]
    assert robotsmini.rules_for_agent([], "x") == []


def test_longest_match_precedence_rfc_examples():
    rules = [(True, "/p"), (False, "/")]
    assert robotsmini.evaluate(rules, "/page") == (True, "/p")
    rules = [(True, "/folder"), (False, "/folder")]
    assert robotsmini.evaluate(rules, "/folder/page")[0] is True  # tie→allow
    rules = [(True, "/page"), (False, "/*.htm")]
    assert robotsmini.evaluate(rules, "/page.htm") == (False, "/*.htm")
    rules = [(True, "/$"), (False, "/")]
    assert robotsmini.evaluate(rules, "/") == (True, "/$")
    assert robotsmini.evaluate(rules, "/page") == (False, "/")
    assert robotsmini.evaluate([], "/anything") == (True, None)


def test_pattern_to_regex_escaping():
    assert robotsmini.pattern_to_regex("/a.b") == "^/a\\.b"
    assert robotsmini.pattern_to_regex("/*.json$") == "^/.*\\.json$"
    assert robotsmini.pattern_to_regex("/$") == "^/$"


def test_parser_matches_oracle_hand_table(spark):
    """The oracle SQL pins a HAND-derived rule table for ROBOTS_TEXTS;
    the real parser must produce exactly it (variant 3 → no rules)."""
    robots = spark.createDataFrame(
        [(f"v{i}", t) for i, t in enumerate(ROBOTS_TEXTS)],
        "host string, robots_txt string")
    got = sorted((r["host"], r["allow"], r["pattern"], r["regex"],
                  r["spec_len"])
                 for r in linkgraph.robots_rules(
                     robots, agent="curatorbot").collect())
    assert got == [
        ("v0", False, "/private/", "^/private/", 9),
        ("v0", True, "/private/public/", "^/private/public/", 16),
        ("v1", False, "/*.json$", "^/.*\\.json$", 8),
        ("v2", False, "/", "^/", 1),
        ("v2", True, "/docs/", "^/docs/", 6),
    ]


def test_gate_matches_pure_evaluator(spark):
    robots = spark.createDataFrame(
        [(f"h{i}", ROBOTS_TEXTS[i % 4]) for i in range(8)],
        "host string, robots_txt string")
    paths = ["/private/x", "/private/public/y", "/api/data.json",
             "/docs/page", "/"]
    urls = spark.createDataFrame(
        [(i, f"h{i % 8}", paths[i % 5]) for i in range(40)],
        "doc_id long, host string, path string")
    rules = linkgraph.robots_rules(robots, agent="curatorbot")
    got = {r["doc_id"]: (r["allowed"], r["matched_pattern"])
           for r in linkgraph.robots_gate(urls, rules).collect()}
    assert len(got) == 40
    for i in range(40):
        parsed = robotsmini.rules_for_agent(
            robotsmini.parse_robots(ROBOTS_TEXTS[(i % 8) % 4]),
            "curatorbot")
        assert got[i] == robotsmini.evaluate(parsed, paths[i % 5]), i
