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
oracle in tests/test_robots.py): comments, blank lines, stacked
User-agent headers sharing one rule block, declaration-only groups
(dropped, exactly as robotparser drops entries with no rule lines),
blank-line group resets, Disallow prefix rules, the empty
``Disallow:`` (= allow all), and robotparser's entry-selection rule —
the FIRST named entry matching the agent wins, else the first ``*``
entry (a stacked header containing ``*`` is a default entry only,
never a named one). Agent matching is exact-name (robotparser's
substring loosening is out of scope); Allow-line longest-match
precedence is likewise out of scope and absent from the fixtures —
``Allow:`` lines count as rule lines for group retention but emit no
prefixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

ROBOTS_SCHEMA = "host string, robots_txt string"


def parse_robots(robots: DataFrame, user_agent: str = "*") -> DataFrame:
    """(host, robots_txt) → (host, prefix) Disallow rules that apply to
    ``user_agent`` under urllib.robotparser's entry semantics.

    All JVM-side, a window-based replica of robotparser's line state
    machine (ADVICE r03 #1 — the last_value scoping mis-attributed
    stacked UA headers and let declaration-only groups shadow ``*``):

    * entries = maximal runs of stacked ``User-agent`` lines plus the
      rule lines that follow them with no blank line in between; blank
      lines terminate entries (a pending UA stack with no rules is
      discarded; rule lines after a blank are orphans and ignored);
    * an entry with zero rule lines does not exist (robotparser drops
      it), so it cannot shadow anything; the empty ``Disallow:`` IS a
      rule line, so an empty named group still shadows ``*``;
    * an entry whose agents include ``*`` is a DEFAULT entry only —
      robotparser never enters it in the named list even when other
      agents are stacked on it;
    * selection: the first (lowest-position) named entry matching
      ``user_agent``, else the first default entry.
    """
    agent = user_agent.lower()
    lines = robots.select(
        "host",
        F.posexplode(F.split("robots_txt", "\n")).alias("pos", "raw"),
    ).withColumn(
        # strip comments and surrounding whitespace
        "line", F.trim(F.regexp_replace("raw", "#.*$", ""))
    )
    low = F.lower("line")
    lines = lines.withColumn(
        "kind",
        F.when(F.col("line") == "", "blank")
        .when(low.startswith("user-agent:"), "ua")
        .when(low.startswith("disallow:") | low.startswith("allow:"), "rule")
        .otherwise("other"),  # unknown keys: no state change (robotparser)
    )
    w_run = W.partitionBy("host").orderBy("pos").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_prev = W.partitionBy("host").orderBy("pos").rowsBetween(
        W.unboundedPreceding, -1
    )
    scoped = (
        lines
        # blank-delimited segment: rule lines only attach inside the
        # segment of their UA stack
        .withColumn(
            "seg", F.sum((F.col("kind") == "blank").cast("int")).over(w_run))
        # a UA line starts a new entry unless the previous relevant
        # (non-'other') line was also a UA line (header stacking)
        .withColumn(
            "prev_rel",
            F.last(F.when(F.col("kind") != "other", F.col("kind")),
                   ignorenulls=True).over(w_prev))
        .withColumn(
            "entry_start",
            ((F.col("kind") == "ua")
             & (F.col("prev_rel").isNull() | (F.col("prev_rel") != "ua"))
             ).cast("int"))
        .withColumn("entry_id", F.sum("entry_start").over(w_run))
        .withColumn(
            "last_ua_seg",
            F.last(F.when(F.col("kind") == "ua", F.col("seg")),
                   ignorenulls=True).over(w_run))
    )
    ua_rows = scoped.filter(F.col("kind") == "ua").select(
        "host", "entry_id",
        F.lower(F.trim(F.expr("substring(line, 12)"))).alias("ua"),
    )
    rule_rows = scoped.filter(
        (F.col("kind") == "rule")
        & (F.col("entry_id") >= 1)
        & (F.col("last_ua_seg") == F.col("seg"))
    ).select(
        "host", "entry_id",
        # Allow lines retain the entry but contribute no prefix
        F.when(low.startswith("disallow:"),
               F.trim(F.expr("substring(line, 10)"))).alias("prefix"),
    )
    flags = ua_rows.groupBy("host", "entry_id").agg(
        F.max((F.col("ua") == "*").cast("int")).alias("has_star"),
        F.max((F.col("ua") == agent).cast("int")).alias("has_named"),
    )
    retained = rule_rows.groupBy("host", "entry_id").agg(
        F.count("*").alias("n_rules"))
    pick = (
        flags.join(retained, ["host", "entry_id"])
        .groupBy("host")
        .agg(
            F.min(F.when((F.col("has_named") == 1) & (F.col("has_star") == 0),
                         F.col("entry_id"))).alias("named_id"),
            F.min(F.when(F.col("has_star") == 1,
                         F.col("entry_id"))).alias("star_id"),
        )
        .select("host", F.coalesce("named_id", "star_id").alias("entry_id"))
    )
    return (
        rule_rows.join(pick, ["host", "entry_id"])
        .filter(F.col("prefix").isNotNull() & (F.col("prefix") != ""))
        .select("host", "prefix")
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
