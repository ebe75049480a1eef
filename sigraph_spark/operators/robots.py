"""robots.txt parsing and crawl-permission evaluation.

The policy layer in front of every webtext corpus: which of the crawl's
urls was the crawler even ALLOWED to fetch. This module parses robots.txt
bodies into a (host, agent, rule, prefix) table and evaluates urls against
it with the standard longest-match semantics (REP, RFC 9309):

* ``User-agent`` lines open a group; CONSECUTIVE user-agent lines share
  the group's rules; ``Allow``/``Disallow`` lines attach to the open group;
* a url matches the group for its agent if one exists, else the ``*``
  group;
* among matching rules the LONGEST prefix wins; on an exact length tie,
  ``allow`` wins (RFC 9309 §2.2.2);
* an empty ``Disallow:`` value allows everything (emits no rule);
* subset: plain path prefixes (no ``*`` wildcards / ``$`` anchors —
  documented; wildcard rules are dropped loudly into a side channel).

Scale design: parsing is ONE pure-Column fold per robots file
(``F.aggregate`` over the split lines carrying the open agent group —
no UDF, no shuffle; robots bodies are KB-sized so the in-row state is
bounded). Evaluation joins urls to rules on the HOST equi-key (the rule
table is per-host tiny; broadcast under AQE) and picks the winner with
one bounded window over (url, matching rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RULES_T = (
    "struct<agents:array<string>,last_ua:boolean,"
    "rules:array<struct<agent:string,rule:string,prefix:string>>>"
)


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """robots bodies -> one row per (host, agent, rule, prefix).

    ``rule`` is 'allow' / 'disallow'. Wildcard rules (prefix containing
    ``*`` or ``$``) are emitted with rule 'unsupported' so callers can
    count/route them instead of silently mis-matching."""
    lines = F.split(F.col(body_col), "\n")
    clean = F.transform(
        lines, lambda ln: F.trim(F.substring_index(ln, "#", 1))
    )

    def step(acc, ln):
        low = F.lower(ln)
        is_ua = low.startswith("user-agent:")
        is_allow = low.startswith("allow:")
        is_dis = low.startswith("disallow:")
        # value = remainder after the FIRST ':' — substring_index(.., -1)
        # would keep only the tail after the LAST ':' and silently
        # truncate legal prefixes containing ':' (port, odd encodings)
        val = F.trim(
            F.substring(
                ln, F.length(F.substring_index(ln, ":", 1)) + 2, F.lit(1 << 20)
            )
        )
        ua_val = F.lower(val)
        # consecutive user-agent lines extend the open group; a user-agent
        # after rules starts a fresh group
        new_agents = (
            F.when(is_ua & acc["last_ua"], F.array_append(acc["agents"], ua_val))
            .when(is_ua, F.array(ua_val))
            .otherwise(acc["agents"])
        )
        kind = (
            F.when(is_allow, F.lit("allow"))
            .when(is_dis, F.lit("disallow"))
        )
        kind = F.when(
            (is_allow | is_dis) & (
                val.contains("*") | val.contains("$")
            ),
            F.lit("unsupported"),
        ).otherwise(kind)
        emitted = F.when(
            (is_allow | is_dis) & (val != ""),
            F.transform(
                acc["agents"],
                lambda a: F.struct(
                    a.alias("agent"), kind.alias("rule"), val.alias("prefix")
                ),
            ),
        ).otherwise(F.array().cast(
            "array<struct<agent:string,rule:string,prefix:string>>"
        ))
        return F.struct(
            new_agents.alias("agents"),
            is_ua.alias("last_ua"),
            F.concat(acc["rules"], emitted).alias("rules"),
        )

    init = F.struct(
        F.array().cast("array<string>").alias("agents"),
        F.lit(False).alias("last_ua"),
        F.array().cast(
            "array<struct<agent:string,rule:string,prefix:string>>"
        ).alias("rules"),
    )
    folded = robots.select(
        F.col(host_col).alias("host"),
        F.aggregate(clean, init, step).alias("_acc"),
    )
    return folded.select(
        "host", F.explode(F.col("_acc.rules")).alias("_r")
    ).select(
        "host",
        F.col("_r.agent").alias("agent"),
        F.col("_r.rule").alias("rule"),
        F.col("_r.prefix").alias("prefix"),
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Evaluate urls against a parsed rule table for one crawler agent:
    ``(url, allowed, matched_rule, matched_prefix)``.

    Group selection: the agent's own group if it has any rules for the
    host, else the ``*`` group. No matching rule (or no robots at all)
    => allowed (REP default-allow)."""
    from sigraph_spark.operators.links import page_host

    # path = everything after the host
    rest = F.substring_index(F.col(url_col), "://", -1)
    u = urls.select(
        F.col(url_col).alias("url"),
        page_host(F.col(url_col)).alias("host"),
        F.when(
            rest.contains("/"),
            F.substring(rest, F.length(F.substring_index(rest, "/", 1)) + 1, 1 << 20),
        ).otherwise(F.lit("/")).alias("path"),
    )
    r = rules.filter(
        F.col("rule").isin("allow", "disallow")
        & F.col("agent").isin(agent, "*")
    )
    # hosts where the specific agent has its own group -> '*' rows ignored
    has_own = r.filter(F.col("agent") == agent).select("host").distinct()
    if agent != "*":
        r = (
            r.join(has_own.withColumnRenamed("host", "h2"),
                   r["host"] == F.col("h2"), "left")
            .filter(
                (F.col("agent") == agent)
                | ((F.col("agent") == "*") & F.col("h2").isNull())
            )
            .drop("h2")
        )
    # keep every url: a rule row only COUNTS when its prefix matches the
    # path; urls whose rules all miss (or that have no robots) fall back
    # to the default-allow row
    cand = u.join(F.broadcast(r), "host", "left").withColumn(
        "_hit",
        F.col("prefix").isNotNull() & F.col("path").startswith(F.col("prefix")),
    )
    w = Window.partitionBy("url").orderBy(
        F.col("_hit").desc(),
        F.length("prefix").desc(),
        # tie: allow wins (sorts before 'disallow' lexicographically)
        F.col("rule").asc(),
    )
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return best.select(
        "url",
        F.when(F.col("_hit"), F.col("rule") != "disallow")
        .otherwise(F.lit(True)).alias("allowed"),
        F.when(F.col("_hit"), F.col("rule")).alias("matched_rule"),
        F.when(F.col("_hit"), F.col("prefix")).alias("matched_prefix"),
    )
