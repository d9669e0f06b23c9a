"""robots.txt parsing + frontier gating, pinned against the stdlib
``urllib.robotparser`` as an independent oracle over the same texts."""

from __future__ import annotations

import urllib.robotparser

from ycrawl_spark import robots, synth
from ycrawl_spark.config import CrawlConfig

CFG = CrawlConfig(n_urls=600, n_hosts=30)


def _stdlib_verdicts(urls_rows):
    parsers = {}
    out = {}
    for r in urls_rows:
        host = r["canonical_host"]
        if host not in parsers:
            p = urllib.robotparser.RobotFileParser()
            p.parse(synth.robots_txt_for(host, CFG).splitlines())
            parsers[host] = p
        out[r["key"]] = parsers[host].can_fetch("ycrawl", r["url"])
    return out


def test_split_matches_stdlib_robotparser(spark):
    frontier = spark.createDataFrame(
        synth.frontier_pdf(CFG), schema=synth.FRONTIER_SCHEMA)
    rules = robots.parse_robots(
        spark.createDataFrame(synth.robots_pdf(CFG),
                              schema=robots.ROBOTS_SCHEMA))
    allowed, blocked = robots.split_by_robots(frontier, rules)
    got_allowed = {r["key"] for r in allowed.select("key").collect()}
    got_blocked = {r["key"] for r in blocked.select("key").collect()}

    rows = frontier.select("key", "url", "canonical_host").collect()
    expect = _stdlib_verdicts(rows)
    assert got_allowed == {k for k, ok in expect.items() if ok}
    assert got_blocked == {k for k, ok in expect.items() if not ok}
    assert got_allowed and got_blocked  # both sides non-vacuous
    # partition: every URL lands exactly once
    assert len(got_allowed) + len(got_blocked) == len(rows)


def test_parse_grammar_edges(spark):
    """Decoy group ignored, comments stripped, empty Disallow = no
    rule, host-specific extras only where planted."""
    rules_df = robots.parse_robots(
        spark.createDataFrame(synth.robots_pdf(CFG),
                              schema=robots.ROBOTS_SCHEMA))
    by_host = {}
    for r in rules_df.collect():
        by_host.setdefault(r["host"], set()).add(r["prefix"])
    from ycrawl_spark.hashing import xxh64_str

    for host, prefixes in by_host.items():
        h = xxh64_str(f"robots:{host}:{CFG.seed}")
        expect = set(CFG.robots_disallow)
        if h % 3 == 0:
            expect.add("/img/img_0000")
        assert prefixes == expect, host
        assert "/" not in prefixes  # the decoy group's rule never leaks
        assert "" not in prefixes

def _stdlib_rules_agree(host, txt, got, paths=("/named/x", "/star/x",
                                               "/stack/x", "/ok", "/a", "/b")):
    p = urllib.robotparser.RobotFileParser()
    p.parse(txt.splitlines())
    for path in paths:
        expect = p.can_fetch("ycrawl", f"https://{host}{path}")
        blocked = any(h == host and path.startswith(pre) for h, pre in got)
        assert (not blocked) == expect, (host, path)


def test_declaration_only_group_does_not_shadow_star(spark):
    """ADVICE r03 #1 shape A: a 'User-agent: ycrawl' header with NO
    rule lines is discarded by robotparser (entries need >=1 ruleline),
    so the '*' rules still apply to ycrawl. The old flag fired on ANY
    line scoped to the agent and wrongly suppressed '*'."""
    txt = (
        "User-agent: ycrawl\n\n"
        "User-agent: *\nDisallow: /star/\n"
    )
    df = spark.createDataFrame([("decl.example.com", txt)],
                               schema=robots.ROBOTS_SCHEMA)
    got = {(r["host"], r["prefix"])
           for r in robots.parse_robots(df, user_agent="ycrawl").collect()}
    assert got == {("decl.example.com", "/star/")}
    _stdlib_rules_agree("decl.example.com", txt, got)


def test_stacked_ua_headers_share_rule_block(spark):
    """ADVICE r03 #1 shape B: 'User-agent: ycrawl\\nUser-agent: *' is
    ONE entry whose rules bind both agents; robotparser files it as the
    default entry (a '*' member makes it default-only), so ycrawl gets
    its rules via the default path and nothing is shadowed."""
    txt = (
        "User-agent: ycrawl\nUser-agent: *\nDisallow: /stack/\n"
    )
    df = spark.createDataFrame([("stack.example.com", txt)],
                               schema=robots.ROBOTS_SCHEMA)
    got = {(r["host"], r["prefix"])
           for r in robots.parse_robots(df, user_agent="ycrawl").collect()}
    assert got == {("stack.example.com", "/stack/")}
    _stdlib_rules_agree("stack.example.com", txt, got)
    # ...and an agent NOT in the stack still gets the default rules
    got_other = {(r["host"], r["prefix"])
                 for r in robots.parse_robots(df, user_agent="zzz").collect()}
    assert got_other == {("stack.example.com", "/stack/")}


def test_first_matching_named_entry_wins(spark):
    """robotparser selects the FIRST named entry matching the agent;
    a second group naming the same agent is dead text."""
    txt = (
        "User-agent: ycrawl\nDisallow: /a\n\n"
        "User-agent: ycrawl\nDisallow: /b\n\n"
        "User-agent: *\nDisallow: /star/\n"
    )
    df = spark.createDataFrame([("dup.example.com", txt)],
                               schema=robots.ROBOTS_SCHEMA)
    got = {(r["host"], r["prefix"])
           for r in robots.parse_robots(df, user_agent="ycrawl").collect()}
    assert got == {("dup.example.com", "/a")}
    _stdlib_rules_agree("dup.example.com", txt, got)


def test_orphan_rules_and_blank_resets(spark):
    """Rule lines separated from their UA stack by a blank line are
    orphans (robotparser resets on blank); a UA stack reset by a blank
    before any rules is discarded."""
    txt = (
        "Disallow: /orphan-at-start/\n\n"
        "User-agent: ycrawl\nDisallow: /a\n\n"
        "Disallow: /orphan-after-entry/\n\n"
        "User-agent: reset-me\n\n"
        "Disallow: /orphan-after-reset/\n"
    )
    df = spark.createDataFrame([("orphan.example.com", txt)],
                               schema=robots.ROBOTS_SCHEMA)
    got = {(r["host"], r["prefix"])
           for r in robots.parse_robots(df, user_agent="ycrawl").collect()}
    assert got == {("orphan.example.com", "/a")}
    _stdlib_rules_agree("orphan.example.com", txt, got,
                        paths=("/a", "/orphan-at-start/x",
                               "/orphan-after-entry/x",
                               "/orphan-after-reset/x", "/ok"))


def test_named_agent_group_precedence(spark):
    """robots.txt group precedence: a host that defines BOTH a named
    group and ``*`` applies ONLY the named group to that agent (union
    semantics over-block — ADVICE r02). Pinned against
    urllib.robotparser on the same text."""
    txt_both = (
        "User-agent: ycrawl\nDisallow: /named/\n\n"
        "User-agent: *\nDisallow: /star/\n"
    )
    txt_star_only = "User-agent: *\nDisallow: /star/\n"
    # an EMPTY named group (bare 'Disallow:' = allow all) must still
    # shadow the '*' group — the named agent gets free rein
    txt_empty_named = (
        "User-agent: ycrawl\nDisallow:\n\n"
        "User-agent: *\nDisallow: /star/\n"
    )
    df = spark.createDataFrame(
        [("both.example.com", txt_both), ("star.example.com", txt_star_only),
         ("empty.example.com", txt_empty_named)],
        schema=robots.ROBOTS_SCHEMA,
    )
    rules = robots.parse_robots(df, user_agent="ycrawl")
    got = {(r["host"], r["prefix"]) for r in rules.collect()}
    assert got == {
        ("both.example.com", "/named/"),   # named group only — no /star/
        ("star.example.com", "/star/"),    # * group applies when no named
        # empty.example.com: no rules at all — empty named group shadows *
    }
    # stdlib oracle agrees on every (host, path) verdict
    for host, txt in (("both.example.com", txt_both),
                      ("star.example.com", txt_star_only),
                      ("empty.example.com", txt_empty_named)):
        p = urllib.robotparser.RobotFileParser()
        p.parse(txt.splitlines())
        for path in ("/named/x", "/star/x", "/ok"):
            expect = p.can_fetch("ycrawl", f"https://{host}{path}")
            blocked = any(h == host and path.startswith(pre) for h, pre in got)
            assert (not blocked) == expect, (host, path)
