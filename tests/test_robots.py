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
