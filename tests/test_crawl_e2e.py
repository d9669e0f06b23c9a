"""End-to-end crawl equivalence vs the pure-Python reference simulator
(SURVEY.md §5.2): crawl order + URL-seen set must match EXACTLY, plus
resume determinism and per-row payload invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sim.reference_sim import simulate
from ycrawl_spark.config import CrawlConfig
from ycrawl_spark.pipeline import crawl_order, read_parsed, run_crawl, seen_sets

CFG = CrawlConfig(
    n_urls=800,
    n_hosts=12,
    default_budget_per_host=16,
    hot_host_threshold=60,
    n_salt=4,
    max_retry=2,
    fail_pct=15,
    max_epochs=40,
    bloom_min_items=0,  # force the Bloom path at test scale
)


@pytest.fixture(scope="module")
def crawl_run(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("crawl"))
    stats = run_crawl(spark, CFG, wd, use_bloom=True)
    return wd, stats


def test_crawl_order_and_seen_set_match_simulator(spark, crawl_run):
    wd, stats = crawl_run
    sim = simulate(CFG)
    assert crawl_order(spark, wd) == sim.order
    done, forfeit = seen_sets(spark, wd, CFG)
    assert done == sim.done
    assert forfeit == sim.forfeit
    # per-epoch counters match too
    engine_epochs = [(s.epoch, s.n_selected, s.n_ok, s.n_err)
                     for s in stats if s.n_selected > 0]
    sim_epochs = [(e["epoch"], e["selected"], e["ok"], e["err"])
                  for e in sim.per_epoch]
    assert engine_epochs == sim_epochs


def test_payload_invariants(spark, crawl_run):
    wd, _ = crawl_run
    parsed = read_parsed(spark, wd)
    n = parsed.count()
    assert n > 0
    assert parsed.filter(~F.col("valid")).count() == 0
    assert parsed.filter((F.col("fmt") == "lossy") & (F.col("psnr") < 40.0)).count() == 0
    # every fetched-ok key parsed exactly once per (key, epoch)
    assert parsed.groupBy("key", "epoch").count().filter("count > 1").count() == 0


def test_resume_determinism(spark, tmp_path_factory, crawl_run):
    wd_full, _ = crawl_run
    wd = str(tmp_path_factory.mktemp("crawl_resume"))
    # run only 2 epochs, then resume to completion
    partial_cfg = CrawlConfig(**{**CFG.__dict__, "max_epochs": 2})
    run_crawl(spark, partial_cfg, wd, use_bloom=True)
    run_crawl(spark, CFG, wd, use_bloom=True, resume=True)
    assert crawl_order(spark, wd) == crawl_order(spark, wd_full)
    assert seen_sets(spark, wd, CFG) == seen_sets(spark, wd_full, CFG)


def test_exact_vs_bloom_path_identical(spark, tmp_path_factory):
    small = CrawlConfig(**{**CFG.__dict__, "n_urls": 300, "max_epochs": 30})
    wd1 = str(tmp_path_factory.mktemp("c_exact"))
    wd2 = str(tmp_path_factory.mktemp("c_bloom"))
    run_crawl(spark, small, wd1, use_bloom=False)
    run_crawl(spark, small, wd2, use_bloom=True)
    assert crawl_order(spark, wd1) == crawl_order(spark, wd2)


def test_incremental_vs_regenerate_mode_identical(spark, tmp_path_factory, crawl_run):
    """The incremental frontier (zero steady-state joins) and the
    reference-mechanics regenerate mode (seen-join per tick, bloom-
    gated) must produce byte-identical crawl order and seen sets."""
    wd_inc, _ = crawl_run  # module fixture runs the default (incremental)
    assert CFG.frontier_mode == "incremental"
    regen = CrawlConfig(**{**CFG.__dict__, "frontier_mode": "regenerate"})
    wd_re = str(tmp_path_factory.mktemp("c_regen"))
    run_crawl(spark, regen, wd_re, use_bloom=True)
    assert crawl_order(spark, wd_re) == crawl_order(spark, wd_inc)
    assert seen_sets(spark, wd_re, regen) == seen_sets(spark, wd_inc, CFG)


def test_resume_in_regenerate_mode(spark, tmp_path_factory, crawl_run):
    """Kill/resume determinism holds in regenerate mode too (the bloom-
    gated per-epoch state join path)."""
    wd_full, _ = crawl_run
    regen = CrawlConfig(**{**CFG.__dict__, "frontier_mode": "regenerate"})
    wd = str(tmp_path_factory.mktemp("c_regen_resume"))
    partial = CrawlConfig(**{**regen.__dict__, "max_epochs": 2})
    run_crawl(spark, partial, wd, use_bloom=True)
    run_crawl(spark, regen, wd, use_bloom=True, resume=True)
    assert crawl_order(spark, wd) == crawl_order(spark, wd_full)
    assert seen_sets(spark, wd, regen) == seen_sets(spark, wd_full, CFG)


def test_sharded_bloom_backend_identical(spark, tmp_path_factory, crawl_run):
    """The partitioned-Bloom backend (cfg.bloom_backend='sharded' — the
    10^10-key layout where the filter is never broadcast) must produce
    byte-identical crawl order and seen sets, in both frontier modes."""
    wd_ref, _ = crawl_run  # driver-bloom incremental run
    for mode in ("incremental", "regenerate"):
        cfg = CrawlConfig(**{**CFG.__dict__, "frontier_mode": mode,
                             "bloom_backend": "sharded", "bloom_shards": 8})
        wd = str(tmp_path_factory.mktemp(f"c_sharded_{mode}"))
        run_crawl(spark, cfg, wd, use_bloom=True)
        assert crawl_order(spark, wd) == crawl_order(spark, wd_ref)
        assert seen_sets(spark, wd, cfg) == seen_sets(spark, wd_ref, CFG)


def test_distributed_counter_sink_identical(spark, tmp_path_factory, crawl_run):
    """Above cfg.counter_collect_max hosts the per-epoch lineage
    counters append through a distributed write instead of a driver
    collect; both paths must leave identical checkpoint-table contents
    (and identical crawl results)."""
    from ycrawl_spark.catalog import Catalog

    wd_ref, _ = crawl_run  # collect path (n_hosts=12 < default max)
    cfg = CrawlConfig(**{**CFG.__dict__, "counter_collect_max": 0})
    wd = str(tmp_path_factory.mktemp("c_dist_counters"))
    run_crawl(spark, cfg, wd, use_bloom=True)
    assert crawl_order(spark, wd) == crawl_order(spark, wd_ref)

    def counter_rows(w):
        df = Catalog(w).table("checkpoint").read(spark)
        return sorted(
            (r["canonical_host"], r["epoch"], r["fetched"], r["ok"], r["err"])
            for r in df.collect()
        )

    assert counter_rows(wd) == counter_rows(wd_ref)


def test_sharded_resume_uses_durable_shards(spark, tmp_path_factory, crawl_run):
    """Regenerate+sharded resume: the durable bloom_shards snapshot
    (written at exit, labelled with fetch_log's epoch) is loaded on
    re-entry instead of an O(seen) rebuild, and the resumed crawl still
    matches the uninterrupted reference run exactly."""
    from ycrawl_spark.catalog import Catalog

    wd_full, _ = crawl_run
    cfg = CrawlConfig(**{**CFG.__dict__, "frontier_mode": "regenerate",
                         "bloom_backend": "sharded", "bloom_shards": 8,
                         "state_compact_every": 2})
    wd = str(tmp_path_factory.mktemp("c_sharded_resume"))
    partial = CrawlConfig(**{**cfg.__dict__, "max_epochs": 2})
    run_crawl(spark, partial, wd, use_bloom=True)
    cat = Catalog(wd)
    # the mid-crawl compaction persisted a shard snapshot labelled
    # with the epoch it covered
    assert cat.table("bloom_shards").latest_epoch() == 2
    run_crawl(spark, cfg, wd, use_bloom=True, resume=True)
    assert cat.table("bloom_shards").latest_epoch() == \
        cat.table("fetch_log").latest_epoch()
    assert crawl_order(spark, wd) == crawl_order(spark, wd_full)
    assert seen_sets(spark, wd, cfg) == seen_sets(spark, wd_full, CFG)


def test_log_compaction_mode_identical(spark, tmp_path_factory, crawl_run):
    """Crawling with per-3-epoch fetch_log compaction yields the exact
    same crawl order + seen sets, keeps resume idempotent (selects 0 on
    a finished workdir), and actually compacts (few live snapshots)."""
    from ycrawl_spark.catalog import Catalog

    wd_full, _ = crawl_run
    wd = str(tmp_path_factory.mktemp("crawl_compact"))
    cfg = CrawlConfig(**{**CFG.__dict__, "log_compact_every": 3})
    stats = run_crawl(spark, cfg, wd, use_bloom=True)
    assert crawl_order(spark, wd) == crawl_order(spark, wd_full)
    assert seen_sets(spark, wd, cfg) == seen_sets(spark, wd_full, CFG)
    n_epochs = len([s for s in stats if s.n_selected > 0])
    n_snaps = len(Catalog(wd).table("fetch_log").snapshots())
    assert n_snaps < n_epochs  # compaction really ran
    again = run_crawl(spark, cfg, wd, use_bloom=True, resume=True)
    assert sum(s.n_selected for s in again) == 0


def test_frontier_ingestion_crawls_only_delta(spark, tmp_path_factory):
    """Mid-crawl URL discovery: ingest_frontier + resume schedules
    exactly the novel URLs — no refetch of attempted keys, no frontier
    rewrite; the entry seen-state anti-join does the filtering."""
    import pandas as pd

    from ycrawl_spark import codecs, synth
    from ycrawl_spark.catalog import Catalog
    from ycrawl_spark.pipeline import ingest_frontier

    cfg = CrawlConfig(**{**CFG.__dict__, "n_urls": 300, "max_epochs": 30})
    wd = str(tmp_path_factory.mktemp("crawl_ingest"))
    run_crawl(spark, cfg, wd, use_bloom=True)
    log_before = Catalog(wd).table("fetch_log").read(spark).count()
    done0, forf0 = seen_sets(spark, wd, cfg)

    new_urls = spark.createDataFrame(
        synth.frontier_pdf(cfg, 300, 380), schema=synth.FRONTIER_SCHEMA)
    new_images = spark.createDataFrame(
        pd.DataFrame([codecs.make_image_row(synth.image_id_for(i))
                      for i in range(300, 380)]),
        schema=synth.IMAGES_SCHEMA)
    assert ingest_frontier(spark, wd, new_urls, new_images) == 80
    run_crawl(spark, cfg, wd, use_bloom=True, resume=True)

    done1, forf1 = seen_sets(spark, wd, cfg)
    new_keys = {r["key"]
                for r in new_urls.filter("robots_ok").select("key").collect()}
    assert done0 <= done1 and forf0 <= forf1
    assert (done1 | forf1) - (done0 | forf0) == new_keys
    log = Catalog(wd).table("fetch_log").read(spark)
    assert log.filter(~F.col("key").isin(list(new_keys))).count() == log_before


def test_frontier_bucket_spec_prunes_host_scan(spark, crawl_run):
    """north_rule layout: run_crawl creates the frontier under a hidden
    bucket(N, canonical_host) partition spec, so a host-scoped scan
    prunes to that host's bucket directory (PartitionFilters in the
    plan) and matches a full-scan row filter exactly; the pipeline's
    own read() path never sees the derived column."""
    from ycrawl_spark.catalog import Catalog

    wd, _ = crawl_run
    t = Catalog(wd).table("frontier")
    assert t.partition_spec() == [("bucket", CFG.n_buckets, "canonical_host")]
    host = "host003.example.com"
    scan = t.scan(spark, eq={"canonical_host": host})
    plan = scan._sc._jvm.PythonSQLUtils.explainString(
        scan._jdf.queryExecution(), "formatted")
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert f"_p_bucket{CFG.n_buckets}_canonical_host" in pf
    expect = t.read(spark).filter(F.col("canonical_host") == host)
    assert sorted(r["key"] for r in scan.collect()) == \
        sorted(r["key"] for r in expect.collect())
    assert scan.count() > 0
    assert "_p_bucket" not in str(t.read(spark).columns)
