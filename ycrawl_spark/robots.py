"""robots.txt parsing and frontier gating — the north_rule's
"per-host politeness + robots.txt budgets" as real operators.

The reference consumes robots decisions implicitly (its URL lists are
curated; the crawler blocks images/resources in puppeteer,
/root/reference/Worker/node_handler.js:24-29). Here the robots path is
explicit: per-host robots.txt payloads are parsed DISTRIBUTED with
built-in expressions (split/posexplode + a running last_value window
for User-agent group scoping — no Python in the parse), and the
frontier gate is a pair of broadcast semi/anti joins, so gating 10^10
URLs against 10^8 hosts' rules costs zero shuffles.

Grammar covered (pinned against the stdlib ``urllib.robotparser``
oracle in tests/test_robots.py): comments, blank lines, multiple
User-agent groups with one agent per group (the common case — stacked
UA lines sharing one rule block would need a group-id aggregation
instead of last_value), Disallow prefix rules, and the empty
``Disallow:`` (= allow all). Allow-line longest-match precedence is
out of scope and absent from the fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

ROBOTS_SCHEMA = "host string, robots_txt string"


def parse_robots(robots: DataFrame, user_agent: str = "*") -> DataFrame:
    """(host, robots_txt) → (host, prefix) Disallow rules that apply to
    ``user_agent``'s group (or the ``*`` group).

    All JVM-side: split → posexplode keeps line order, a running
    last_value over (host, pos) scopes each rule line to its governing
    User-agent, comments/blanks drop out, empty prefixes (allow-all)
    drop out.
    """
    lines = robots.select(
        "host",
        F.posexplode(F.split("robots_txt", "\n")).alias("pos", "raw"),
    ).withColumn(
        # strip comments and surrounding whitespace
        "line", F.trim(F.regexp_replace("raw", "#.*$", ""))
    )
    ua = F.when(
        F.lower("line").startswith("user-agent:"),
        F.trim(F.expr("substring(line, 12)")),
    )
    w = W.partitionBy("host").orderBy("pos").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    scoped = lines.withColumn("cur_ua", F.last(ua, ignorenulls=True).over(w))
    # robots.txt group precedence (and the urllib.robotparser oracle):
    # a named agent obeys ONLY its most specific matching group — when a
    # host DECLARES a group for ``user_agent`` (even one whose only rule
    # is the empty allow-all ``Disallow:``), its ``*`` rules must NOT
    # also apply. The flag therefore comes from the group DECLARATIONS
    # in the scoped lines, not from the surviving non-empty rules — an
    # empty named group must still shadow ``*``. Per-host max-flag
    # window; for user_agent="*" every row is the specific group and
    # this is a no-op.
    spec = F.max(
        F.when(F.col("cur_ua") == user_agent, 1).otherwise(0)
    ).over(W.partitionBy("host"))
    return (
        scoped.withColumn("_spec", spec)
        .filter(F.lower("line").startswith("disallow:"))
        .filter((F.col("cur_ua") == user_agent)
                | ((F.col("cur_ua") == "*") & (F.col("_spec") == 0)))
        .select("host", F.trim(F.expr("substring(line, 10)")).alias("prefix"))
        .filter(F.col("prefix") != "")
        .distinct()
    )


def url_path(url_col: str = "url", host_col: str = "canonical_host"):
    """Path component of ``https://host...`` URLs (column expr)."""
    return F.expr(f"substring({url_col}, 9 + length({host_col}))")


def split_by_robots(urls: DataFrame, rules: DataFrame,
                    url_col: str = "url",
                    host_col: str = "canonical_host") -> tuple[DataFrame, DataFrame]:
    """(allowed, blocked) partition of the frontier by the parsed
    rules. Both sides are broadcast joins against the small rule set —
    a left_semi for blocked, left_anti for allowed — so the full
    frontier never shuffles and never fans out (a semi join emits each
    URL at most once no matter how many prefixes match)."""
    path = url_path(url_col, host_col)
    cond = (F.col(f"u.{host_col}") == F.col("r.host")) & path.startswith(
        F.col("r.prefix")
    )
    u = urls.alias("u")
    r = F.broadcast(rules.alias("r"))
    blocked = u.join(r, cond, "left_semi")
    allowed = u.join(r, cond, "left_anti")
    return allowed, blocked
