from __future__ import annotations

from sigraph_spark.operators.robots import parse_robots, robots_allowed

BODY = """# demo robots
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp

User-agent: fastbot
User-agent: slowbot
Disallow: /

User-agent: wildbot
Disallow: /*.gif$
"""


def _rules(spark, bodies):
    return parse_robots(
        spark.createDataFrame(bodies, "host string, body string")
    )


def test_parse_groups_and_consecutive_agents(spark):
    rows = {
        (r["agent"], r["rule"], r["prefix"])
        for r in _rules(spark, [("h", BODY)]).collect()
    }
    assert rows == {
        ("*", "disallow", "/private/"),
        ("*", "allow", "/private/ok/"),
        ("*", "disallow", "/tmp"),
        ("fastbot", "disallow", "/"),
        ("slowbot", "disallow", "/"),
        ("wildbot", "unsupported", "/*.gif$"),
    }


def test_empty_disallow_emits_nothing(spark):
    rows = _rules(spark, [("h", "User-agent: *\nDisallow:\n")]).collect()
    assert rows == []


def _allowed(spark, urls, agent="*"):
    rules = _rules(spark, [("ex.com", BODY)])
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    return {r["url"]: (r["allowed"], r["matched_prefix"]) for r in
            robots_allowed(u, rules, agent=agent).collect()}


def test_longest_match_and_allow_tiebreak(spark):
    got = _allowed(
        spark,
        [
            "https://ex.com/public/page",      # no rule -> allowed
            "https://ex.com/private/x",        # disallow /private/
            "https://ex.com/private/ok/x",     # allow wins (longer)
            "https://ex.com/tmpfile",          # prefix /tmp matches
            "https://other.com/private/x",     # no robots -> allowed
            "https://ex.com",                  # bare host -> path '/'
        ],
    )
    assert got["https://ex.com/public/page"] == (True, None)
    assert got["https://ex.com/private/x"] == (False, "/private/")
    assert got["https://ex.com/private/ok/x"] == (True, "/private/ok/")
    assert got["https://ex.com/tmpfile"] == (False, "/tmp")
    assert got["https://other.com/private/x"] == (True, None)
    assert got["https://ex.com"] == (True, None)


def test_agent_group_overrides_star(spark):
    got = _allowed(spark, ["https://ex.com/public/page"], agent="fastbot")
    # fastbot has its own group (Disallow: /) -> '*' group ignored
    assert got["https://ex.com/public/page"] == (False, "/")
    # an agent with no own group falls back to '*'
    got2 = _allowed(spark, ["https://ex.com/private/x"], agent="newbot")
    assert got2["https://ex.com/private/x"] == (False, "/private/")


def test_exact_tie_allow_wins(spark):
    rules = _rules(
        spark,
        [("t.com", "User-agent: *\nDisallow: /a/\nAllow: /a/\n")],
    )
    u = spark.createDataFrame([("https://t.com/a/x",)], "url string")
    [r] = robots_allowed(u, rules).collect()
    assert r["allowed"] is True and r["matched_rule"] == "allow"


def test_no_python_udf(spark):
    rules = _rules(spark, [("h", BODY)])
    assert "EvalPython" not in rules._jdf.queryExecution().executedPlan().toString()


def test_prefix_containing_colon_not_truncated(spark):
    rules = _rules(
        spark, [("h", "User-agent: *\nDisallow: /port:8080/admin\n")]
    )
    [r] = rules.collect()
    assert r["prefix"] == "/port:8080/admin"
