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


def seen_state(spark: SparkSession, cat: Catalog, cfg: CrawlConfig):
    """(excluded_keys_df, attempts_df) derived from fetch_log.

    excluded = done ∪ forfeit; attempts = (key, err_count) for keys
    still retryable. Both are aggregations over the append-only log.
    """
    log = cat.table("fetch_log").read(spark)
    if log is None:
        return None, None
    agg = log.groupBy("key").agg(
        F.max(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("done"),
        F.sum(F.when(F.col("status") == "ERR", 1).otherwise(0)).alias("err_count"),
    )
    excluded = agg.filter(
        (F.col("done") == 1) | (F.col("err_count") >= cfg.max_retry)
    ).select("key")
    attempts = agg.filter(
        (F.col("done") == 0) & (F.col("err_count") < cfg.max_retry)
    ).select("key", "err_count")
    return excluded, attempts


def run_epoch(spark: SparkSession, cat: Catalog, cfg: CrawlConfig,
              frontier: DataFrame, politeness: DataFrame, images: DataFrame,
              epoch: int, use_bloom: bool = True) -> EpochStats:
    excluded, attempts = seen_state(spark, cat, cfg)

    candidates = frontier.filter(F.col("robots_ok"))
    if excluded is not None:
        bloom = None
        if use_bloom:
            n_seen = excluded.count()
            if n_seen:
                bloom = seen_mod.build_bloom(excluded, "key", n_items_hint=n_seen)
        candidates = seen_mod.anti_join_unseen(candidates, excluded, "key", bloom, spark)
        candidates = candidates.join(attempts, "key", "left")
    else:
        candidates = candidates.withColumn("err_count", F.lit(None).cast("long"))
    candidates = candidates.withColumn(
        "attempt", (F.coalesce(F.col("err_count"), F.lit(0)) + 1).cast("int")
    ).drop("err_count")

    selected = scheduler.select_per_host_budget(candidates, politeness, cfg)
    ordered = scheduler.crawl_shuffle_order(selected, cfg, epoch).persist()
    n_selected = ordered.count()
    if n_selected == 0:
        ordered.unpersist()
        return EpochStats(epoch, 0, 0, 0, 0)

    fetched = fetch_mod.fetch_stage(ordered, cfg, epoch).persist()
    log_cols = fetched.select(
        "key", "canonical_host", "epoch", "attempt", "shuffle_rank",
        "status", "exetime",
    )
    cat.table("fetch_log").append(log_cols, epoch=epoch)

    ok = fetched.filter(F.col("status") == "ok")
    parsed = fetch_mod.parse_stage(ok)
    validated = fetch_mod.validate_against_images(parsed, images)
    cat.table("parsed").append(
        validated.select(
            "key", "image_id", "epoch", "w", "h", "fmt", "phash", "psnr",
            "caption_scraped", "valid",
        ),
        epoch=epoch,
    )

    counters = (
        fetched.groupBy("canonical_host")
        .agg(
            F.count("*").alias("fetched"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
            F.sum(F.when(F.col("status") == "ERR", 1).otherwise(0)).alias("err"),
        )
        .withColumn("epoch", F.lit(epoch))
    )
    cat.table("checkpoint").append(counters, epoch=epoch)

    n_ok = ok.count()
    n_err = n_selected - n_ok
    fetched.unpersist()
    ordered.unpersist()
    return EpochStats(epoch, -1, n_selected, n_ok, n_err)


def run_crawl(spark: SparkSession, cfg: CrawlConfig, workdir: str,
              use_bloom: bool = True, resume: bool = False) -> list[EpochStats]:
    """Full crawl to quiescence (or cfg.max_epochs). Resumable: with
    ``resume=True`` continues after the last committed epoch."""
    cat = Catalog(workdir)
    frontier_t = cat.table("frontier")
    if frontier_t.read(spark) is None:
        frontier_t.append(synth.frontier_df(spark, cfg), epoch=0)
    frontier = frontier_t.read(spark).persist()

    images_t = cat.table("images")
    if images_t.read(spark) is None:
        images_t.append(synth.images_df(spark, cfg), epoch=0)
    images = images_t.read(spark)

    politeness = spark.createDataFrame(synth.politeness_pdf(cfg)).persist()

    start_epoch = 1
    if resume:
        last = cat.table("fetch_log").latest_epoch()
        if last is not None:
            start_epoch = last + 1

    stats: list[EpochStats] = []
    for epoch in range(start_epoch, cfg.max_epochs + 1):
        st = run_epoch(spark, cat, cfg, frontier, politeness, images, epoch, use_bloom)
        stats.append(st)
        if st.n_selected == 0:
            break
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
