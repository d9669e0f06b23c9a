"""Pure-Python single-threaded reference-semantics crawl simulator.

This is the oracle for crawl-order + URL-seen-set equivalence
(SURVEY.md §5.2, BASELINE.json north_rule): same key assignment
(/root/reference/Coordinator/main.py:28-31), anti-join against the
seen set (main.py:68), forfeit at max_retry errors (main.py:21-23),
per-host politeness budget, and seeded-hash shuffle order (the
engine's deterministic replacement for random.shuffle, main.py:58-59).

It shares the frontier/budget/failure derivations with the engine
(ycrawl_spark.synth / .config / .hashing) — the *semantics* live here
independently, implemented with plain dicts and sorts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ycrawl_spark.config import CrawlConfig, fail_roll
from ycrawl_spark.hashing import xxh64_signed
from ycrawl_spark.synth import (
    child_ids, discovered_row, frontier_row, politeness_pdf,
)


@dataclass
class SimResult:
    order: list[str] = field(default_factory=list)  # fetch order, all epochs
    done: set = field(default_factory=set)
    forfeit: set = field(default_factory=set)
    per_epoch: list[dict] = field(default_factory=list)


def simulate(cfg: CrawlConfig) -> SimResult:
    rows = [frontier_row(i, cfg) for i in range(cfg.seed_urls)]
    # every key that ever ENTERED the frontier — seed rows included
    # robots-blocked ones (the engine appends the whole seed build and
    # filters robots at read), so a discovered child colliding with a
    # blocked seed id is never re-derived
    entered = {r["key"] for r in rows}
    rows = [r for r in rows if r["robots_ok"]]
    budgets = {
        r.canonical_host: int(r.max_per_epoch)
        for r in politeness_pdf(cfg).itertuples()
    }

    res = SimResult()
    err_counts: dict[str, int] = {}
    for epoch in range(1, cfg.max_epochs + 1):
        candidates = [
            r for r in rows
            if r["key"] not in res.done and r["key"] not in res.forfeit
        ]
        # per-host politeness: top-budget by (priority, depth, ts, key)
        by_host: dict[str, list[dict]] = {}
        for r in candidates:
            by_host.setdefault(r["canonical_host"], []).append(r)
        selected: list[dict] = []
        for host, items in by_host.items():
            items.sort(key=lambda r: (r["priority"], r["depth"], r["discovered_ts"], r["key"]))
            selected.extend(items[: budgets.get(host, cfg.default_budget_per_host)])
        if not selected:
            break
        # epoch fetch order: seeded-hash shuffle
        suffix = f":{cfg.shuffle_salt}:{epoch}"
        selected.sort(key=lambda r: (xxh64_signed(r["key"] + suffix), r["key"]))
        n_ok = n_err = 0
        epoch_disc: dict[int, int] = {}  # child id → min(parent depth)+1
        for r in selected:
            key = r["key"]
            attempt = err_counts.get(key, 0) + 1
            res.order.append(key)
            if fail_roll(key, attempt, cfg):
                err_counts[key] = attempt
                n_err += 1
                if attempt >= cfg.max_retry:
                    res.forfeit.add(key)
            else:
                res.done.add(key)
                n_ok += 1
                # link discovery: an ok fetch below the depth cap yields
                # deterministic children (same pure function the engine
                # explodes); min over this epoch's discovering parents
                if cfg.discovery_fanout and r["depth"] < cfg.discovery_max_depth:
                    for cid in child_ids(r["image_id"], cfg):
                        d = r["depth"] + 1
                        epoch_disc[cid] = min(epoch_disc.get(cid, d), d)
        # novel children enter the frontier at epoch end (the engine
        # appends them after the fetch commit, anti-joined against every
        # key that ever entered)
        n_disc = 0
        for cid in sorted(epoch_disc):
            row = discovered_row(cid, epoch_disc[cid], epoch, cfg)
            if row["key"] in entered:
                continue
            entered.add(row["key"])
            n_disc += 1
            if row["robots_ok"]:
                rows.append(row)
        res.per_epoch.append(
            {"epoch": epoch, "selected": len(selected), "ok": n_ok,
             "err": n_err, "discovered": n_disc}
        )
    return res
