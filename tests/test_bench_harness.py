"""Smoke the bench harness end-to-end — the scaling evidence for the
north_rule's N→4N ≥0.8 criterion is produced by ``bench.py --scaling``
(subprocess per parallelism level, cached shared input), so the harness
itself must be pinned: JSON contract keys, throughput at two levels,
efficiency arithmetic. Tiny input keeps this under a couple of minutes;
the efficiency VALUE is not asserted here (a 4k-URL crawl is all fixed
cost — the real measurement protocol and numbers live in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scaling_mode_contract(tmp_path):
    env = dict(
        os.environ,
        BENCH_SCALING_REPS="1",
        BENCH_INPUT_CACHE=str(tmp_path),
        PYTHONPATH=REPO,
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--scaling",
         "--n-urls", "4000", "--scale-low", "2", "--scale-high", "4"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    for level in ("local[2]", "local[4]"):
        assert res[level]["urls"] > 0
        assert res[level]["urls_per_sec"] > 0
        assert res[level]["cores"] == int(level[6:-1])
    assert "scaling_efficiency" in res
    # both levels crawled the same input to quiescence
    assert res["local[2]"]["urls"] == res["local[4]"]["urls"]


def test_core16_is_frozen_subset():
    """CORE16 is the longitudinal anchor (VERDICT r03 #8): exactly the
    round-1 headline set, a subset of the growing HEADLINE list, and
    every name still resolves in the registry."""
    import bench
    from ycrawl_spark.queries import QUERIES

    assert len(bench.CORE16) == 16
    assert set(bench.CORE16) <= set(bench.HEADLINE)
    assert all(n in QUERIES for n in bench.HEADLINE)
    # frozen: the r01 suite, byte for byte
    assert bench.CORE16 == [
        "q1_pricing_summary", "dedupe_latest_order", "fx_enrich_orders",
        "weekly_best_order", "daily_drift", "top3_orders_per_customer",
        "customers_without_orders", "union_live_history",
        "sessionize_users", "exact_dedup_prefix", "minhash_lsh_candidates",
        "simhash_near_dups", "doc_token_stats", "cosine_topk",
        "ann_lsh_topk", "multimodal_image_features",
    ]
