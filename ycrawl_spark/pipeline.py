"""The crawl pipeline: epoch loop over frontier → schedule → fetch →
parse/validate → commit, with checkpoint/resume.

Reference lifecycle (SURVEY.md §3): hourly cron epochs
(/root/reference/cron.yaml:2-4), coordinator anti-join per tick
(/root/reference/Coordinator/main.py:65-77), worker stage barriers
(/root/reference/Worker/main.py:61-64), completion manifest
(/root/reference/Frontend/functions.py:17-35).

Engine: one driver loop; each epoch is a lazy DataFrame plan committed
as catalog appends. **All crawl state derives from the append-only
``fetch_log`` table** — seen set = keys with an 'ok' row, error counts
= count of 'ERR' rows, forfeits = err_count ≥ max_retry — so resume
after a kill is trivially deterministic: re-read fetch_log, recompute
state, continue with the next epoch. That is the checkpoint/lineage
story the north_rule asks for; the ``checkpoint`` table additionally
records per-epoch, per-partition counters for observability.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from . import fetch as fetch_mod
from . import scheduler, seen as seen_mod, synth
from .catalog import Catalog
from .config import CrawlConfig


@dataclass
class EpochStats:
    epoch: int
    n_candidates: int
    n_selected: int
    n_ok: int
    n_err: int


def _agg_from_log(log: DataFrame) -> DataFrame:
    """(key, done, err_count) derived from the append-only fetch_log —
    the ground-truth derivation, used to (re)build ``seen_agg``."""
    return log.groupBy("key").agg(
        F.max(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("done"),
        F.sum(F.when(F.col("status") == "ERR", 1).otherwise(0)).alias("err_count"),
    )


def load_seen_agg(spark: SparkSession, cat: Catalog) -> DataFrame | None:
    """Latest compacted seen-state, reconciled against fetch_log.

    ``seen_agg`` is a compaction of ``_agg_from_log`` maintained
    incrementally each epoch (so the hot path never re-aggregates the
    whole log). fetch_log remains the source of truth: if the compact
    snapshot is missing or stale (crash between the log append and the
    seen_agg replace), it is rebuilt from the log — resume stays
    deterministic either way.
    """
    log_t, agg_t = cat.table("fetch_log"), cat.table("seen_agg")
    last_log = log_t.latest_epoch()
    if last_log is None:
        return None
    if agg_t.latest_epoch() != last_log:
        agg_t.replace(_agg_from_log(log_t.read(spark)), epoch=last_log)
    return agg_t.read(spark)


def seen_state(seen_agg: DataFrame | None, cfg: CrawlConfig):
    """(excluded_keys_df, attempts_df) from the compacted seen_agg.

    excluded = done ∪ forfeit; attempts = (key, err_count) for keys
    still retryable.
    """
    if seen_agg is None:
        return None, None
    excluded = seen_agg.filter(
        (F.col("done") == 1) | (F.col("err_count") >= cfg.max_retry)
    ).select("key")
    attempts = seen_agg.filter(
        (F.col("done") == 0) & (F.col("err_count") < cfg.max_retry)
    ).select("key", "err_count")
    return excluded, attempts


def run_epoch(spark: SparkSession, cat: Catalog, cfg: CrawlConfig,
              pending: DataFrame, politeness: DataFrame, images: DataFrame,
              epoch: int, use_bloom: bool = True,
              seen_agg: DataFrame | None = None,
              n_seen_hint: int = 0,
              hot_hosts: list[str] | None = None,
              ) -> tuple[EpochStats, DataFrame | None, DataFrame]:
    """One epoch. Returns (stats, new_seen_agg, new_pending).

    ``pending`` is the shrinking live frontier (rows not yet done or
    forfeited as of the *previous* epoch — exclusion is monotone, so
    filtering it again against the fresh ``seen_agg`` yields exactly the
    full-frontier anti-join result while joining ever fewer rows).
    ``seen_agg`` is the driver-held compacted seen-state; ``n_seen_hint``
    an upper bound on attempted keys (cumulative selected count — sizes
    the Bloom filter without a count() job); ``hot_hosts`` the static
    salting list (scheduler.hot_hosts_of).

    Job budget per epoch: fused fetch+parse materialization (1), parsed
    append (1), counters collect (1, drives termination — checkpoint
    counters go to parquet driver-side), state localCheckpoint (1),
    pending localCheckpoint (1), plus a durable seen_agg parquet
    compaction every ``cfg.state_compact_every`` epochs.
    """
    candidates = pending
    if seen_agg is not None:
        bloom = None
        if use_bloom and n_seen_hint >= max(cfg.bloom_min_items, 1):
            # Bloom over *attempted* keys: one state join for maybe-hits
            # only, instead of anti-join + attempts-join over the full
            # frontier (two shuffles → at most one, of a small subset).
            bloom = seen_mod.build_bloom(
                seen_agg.select("key"), "key", n_items_hint=n_seen_hint
            )
        candidates = seen_mod.join_seen_state(
            candidates, seen_agg, "key", bloom, spark,
            broadcast_state=n_seen_hint < cfg.bloom_min_items,
        )
        candidates = candidates.filter(
            (F.col("done") == 0) & (F.col("err_count") < cfg.max_retry)
        ).drop("done")
    else:
        candidates = candidates.withColumn("err_count", F.lit(0).cast("long"))
    # Materialize the filtered frontier once (localCheckpoint): it is
    # both this epoch's candidate set and the (smaller) pending set for
    # the next epoch. Eager truncation keeps every later plan this epoch
    # — and the pending chain across epochs — shallow; with lazy persist
    # chains instead, driver-side analysis time grows with epoch count
    # and dwarfs the one extra job this costs (measured via event log).
    candidates = candidates.localCheckpoint()
    new_pending = candidates.drop("err_count")

    with_attempt = candidates.withColumn(
        "attempt", (F.col("err_count") + 1).cast("int")
    ).drop("err_count")
    selected = scheduler.select_per_host_budget(with_attempt, politeness, cfg, hot_hosts)
    ordered = scheduler.crawl_shuffle_order(selected, cfg, epoch)

    fp = fetch_mod.fetch_parse_stage(ordered, cfg, epoch).persist()
    # Per-partition lineage counters (north_rule observability) — the
    # collect both materializes the fused stage and decides termination;
    # the tiny counter frame lands in parquet without a Spark write job.
    counter_rows = (
        fp.groupBy("canonical_host")
        .agg(
            F.count("*").alias("fetched"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
            F.sum(F.when(F.col("status") == "ERR", 1).otherwise(0)).alias("err"),
        )
        .collect()
    )
    n_selected = sum(r["fetched"] for r in counter_rows)
    if n_selected == 0:
        fp.unpersist()
        return EpochStats(epoch, 0, 0, 0, 0), seen_agg, new_pending
    n_ok = sum(r["ok"] for r in counter_rows)
    n_err = sum(r["err"] for r in counter_rows)

    # Few, right-sized output files: the epoch's rows are already cached,
    # so the writes are narrow coalesced scans of the cache — at cluster
    # scale file sizing is the table format's job, here it keeps small
    # epochs from paying 32 task launches + 32 file commits per write.
    n_files = max(4, min(n_selected // 50_000 + 1,
                         spark.sparkContext.defaultParallelism))
    cat.table("fetch_log").append(
        fp.select("key", "canonical_host", "epoch", "attempt", "shuffle_rank",
                  "status", "exetime").coalesce(n_files),
        epoch=epoch,
    )
    cat.table("checkpoint").append_pdf(
        pd.DataFrame(
            [(r["canonical_host"], r["fetched"], r["ok"], r["err"], epoch)
             for r in counter_rows],
            columns=["canonical_host", "fetched", "ok", "err", "epoch"],
        ),
        epoch=epoch,
    )

    parsed = fp.filter(F.col("status") == "ok").select(
        "key", "image_id", "epoch", "w", "h", "fmt", "phash", "psnr",
        "caption_scraped",
    )
    validated = fetch_mod.validate_against_images(parsed, images)
    cat.table("parsed").append(
        validated.select(
            "key", "image_id", "epoch", "w", "h", "fmt", "phash", "psnr",
            "caption_scraped", "valid",
        ).coalesce(n_files),
        epoch=epoch,
    )

    # Incremental seen-state compaction: old agg ∪ epoch delta,
    # localCheckpoint'ed (fp is unpersisted below, and shallow state
    # plans keep driver planning O(1) per epoch); durable parquet
    # snapshot every state_compact_every epochs — fetch_log remains the
    # crash-rebuild source of truth.
    delta = fp.groupBy("key").agg(
        F.max(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("done"),
        F.sum(F.when(F.col("status") == "ERR", 1).otherwise(0)).alias("err_count"),
    )
    merged = (
        delta if seen_agg is None else seen_agg.unionByName(delta)
        .groupBy("key")
        .agg(F.max("done").alias("done"), F.sum("err_count").alias("err_count"))
    )
    new_agg = merged.localCheckpoint()
    fp.unpersist()
    return EpochStats(epoch, -1, n_selected, n_ok, n_err), new_agg, new_pending


def run_crawl(spark: SparkSession, cfg: CrawlConfig, workdir: str,
              use_bloom: bool = True, resume: bool = False) -> list[EpochStats]:
    """Full crawl to quiescence (or cfg.max_epochs). Resumable: with
    ``resume=True`` continues after the last committed epoch.

    AQE is switched off for the duration of the loop: every join and
    shuffle here is explicitly sized (broadcast hints, pinned fetch
    partitioning, coalesced writes), so adaptive re-planning only adds
    driver latency to each of the many small per-epoch actions —
    measurable as inter-job gaps in the event log. Restored on exit so
    the analytic query surface keeps AQE's skew/coalesce benefits.
    """
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _run_crawl_inner(spark, cfg, workdir, use_bloom, resume)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)


def _run_crawl_inner(spark: SparkSession, cfg: CrawlConfig, workdir: str,
                     use_bloom: bool, resume: bool) -> list[EpochStats]:
    cat = Catalog(workdir)
    frontier_t = cat.table("frontier")
    if frontier_t.read(spark) is None:
        frontier_t.append(synth.frontier_df(spark, cfg), epoch=0)
    frontier = frontier_t.read(spark).persist()

    images_t = cat.table("images")
    if images_t.read(spark) is None:
        images_t.append(synth.images_df(spark, cfg), epoch=0)
    # Only the metadata columns feed the validation join (bytes is
    # pruned at the parquet scan); cache the dim once instead of
    # re-scanning the table every epoch.
    images = images_t.read(spark).select(
        "image_id", "w", "h", "fmt", "caption", "phash"
    ).persist()

    politeness = spark.createDataFrame(synth.politeness_pdf(cfg)).persist()

    start_epoch = 1
    if resume:
        last = cat.table("fetch_log").latest_epoch()
        if last is not None:
            start_epoch = last + 1

    # Existing state is honoured whether or not resume renumbers epochs:
    # a second run on a finished workdir selects 0 (idempotent).
    seen_agg = load_seen_agg(spark, cat)
    n_seen_hint = 0
    if seen_agg is not None:
        seen_agg = seen_agg.localCheckpoint()
        n_seen_hint = seen_agg.count()

    hot_hosts = scheduler.hot_hosts_of(frontier.filter(F.col("robots_ok")), cfg)
    pending = frontier.filter(F.col("robots_ok"))

    stats: list[EpochStats] = []
    for epoch in range(start_epoch, cfg.max_epochs + 1):
        st, seen_agg, pending = run_epoch(
            spark, cat, cfg, pending, politeness, images, epoch, use_bloom,
            seen_agg=seen_agg, n_seen_hint=n_seen_hint, hot_hosts=hot_hosts,
        )
        stats.append(st)
        if st.n_selected == 0:
            break
        n_seen_hint += st.n_selected
        # Durable state snapshot every K epochs (state itself is already
        # materialized via localCheckpoint; this is the resume fast-path).
        if epoch % cfg.state_compact_every == 0 and seen_agg is not None:
            cat.table("seen_agg").replace(seen_agg, epoch=epoch)
    # Final durable state snapshot so a warm resume needs no log rebuild
    # (labelled with the log's latest epoch — the staleness check in
    # load_seen_agg compares against fetch_log).
    last_log = cat.table("fetch_log").latest_epoch()
    if seen_agg is not None and last_log is not None and (
        cat.table("seen_agg").latest_epoch() != last_log
    ):
        cat.table("seen_agg").replace(seen_agg, epoch=last_log)
    images.unpersist()
    frontier.unpersist()
    politeness.unpersist()
    return stats


def crawl_order(spark: SparkSession, workdir: str) -> list[str]:
    """The engine's total crawl order: fetch_log keys ordered by
    (epoch, shuffle_rank, key) — compared verbatim with the simulator."""
    log = Catalog(workdir).table("fetch_log").read(spark)
    rows = log.select("epoch", "shuffle_rank", "key").orderBy(
        "epoch", "shuffle_rank", "key"
    ).collect()
    return [r["key"] for r in rows]


def seen_sets(spark: SparkSession, workdir: str, cfg: CrawlConfig) -> tuple[set, set]:
    """(done_keys, forfeit_keys) from fetch_log."""
    log = Catalog(workdir).table("fetch_log").read(spark)
    agg = log.groupBy("key").agg(
        F.max(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("done"),
        F.sum(F.when(F.col("status") == "ERR", 1).otherwise(0)).alias("errs"),
    )
    done = {r["key"] for r in agg.filter("done = 1").select("key").collect()}
    forfeit = {
        r["key"]
        for r in agg.filter(
            (F.col("done") == 0) & (F.col("errs") >= cfg.max_retry)
        ).select("key").collect()
    }
    return done, forfeit
