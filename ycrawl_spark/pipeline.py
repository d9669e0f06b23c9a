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

Two frontier modes (cfg.frontier_mode, identical results — asserted in
tests), see config.py. The default ("incremental") keeps the
steady-state epoch at FOUR jobs, none of them O(frontier) after epoch 1
(driver-side fixed cost is what kills N→4N scaling efficiency, measured
via the phase profile):
  1. rank localCheckpoint: politeness windows materialized once; both
     the selected set and next epoch's survivors are cheap filters of
     it (+ a near-free count on the materialized blocks that
     right-sizes the fetch stage);
  2. ONE heavy job: fused fetch+parse+validate (Arrow stage) → single
     wide ``fetch_log`` append. Epoch totals ride the same job via
     ``Observation``; validation needs no join — expected metadata
     rides the frontier (fetch.REF_COLS, joined from the images table
     once at crawl start);
  3. per-host lineage counters: tiny columnar scan of the just-written
     snapshot → driver-side parquet (no Spark write job);
  4. next pending localCheckpoint: budget losers ∪ retryable errors
     (frontier columns echoed on ERR rows — fetch.ECHO_COLS — so the
     retry path is a projection of the epoch delta, not a join).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from . import fetch as fetch_mod
from . import scheduler, seen as seen_mod, synth
from .catalog import Catalog
from .config import CrawlConfig

PARSED_COLS = ["key", "image_id", "epoch", "w", "h", "fmt", "phash", "psnr",
               "caption_scraped", "valid"]

# Frontier-shaped columns a pending row carries (frontier ∪ REF_COLS).
PENDING_COLS = [
    "key", "url", "canonical_host", "host_bucket", "priority", "depth",
    "discovered_ts", "image_id", "epoch_added", "robots_ok",
    "w_ref", "h_ref", "fmt_ref", "caption_ref", "phash_ref",
]


class _phase:
    """Per-phase wall-clock trace, on when YCRAWL_EPOCH_TRACE is set —
    the measurement behind the fixed-cost-per-epoch numbers in
    BASELINE.md (scaling efficiency erodes exactly as fast as the
    core-count-independent slice of an epoch grows)."""

    on = os.environ.get("YCRAWL_EPOCH_TRACE", "") not in ("", "0")

    def __init__(self, epoch: int, name: str):
        self.epoch, self.name = epoch, name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.on:
            print(f"[epoch-trace] e{self.epoch:03d} {self.name} "
                  f"{time.perf_counter() - self.t0:.3f}s", flush=True)
        return False


@dataclass
class EpochStats:
    epoch: int
    n_candidates: int
    n_selected: int
    n_ok: int
    n_err: int
    n_discovered: int = 0


def _agg_from_log(log: DataFrame) -> DataFrame:
    """(key, done, err_count) derived from the append-only fetch_log —
    the ground-truth derivation, used to (re)build ``seen_agg``."""
    return log.groupBy("key").agg(
        F.max(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("done"),
        F.sum(F.when(F.col("status") == "ERR", 1).otherwise(0)).alias("err_count"),
    )


def load_seen_agg(spark: SparkSession, cat: Catalog) -> DataFrame | None:
    """Latest compacted seen-state, reconciled against fetch_log.

    fetch_log remains the source of truth: if the compact snapshot is
    missing or stale (crash between the log append and the seen_agg
    replace), it is rebuilt from the log — resume stays deterministic
    either way.
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


def apply_seen_state(pending: DataFrame, seen_agg: DataFrame | None,
                     cfg: CrawlConfig, spark: SparkSession,
                     use_bloom: bool, n_seen_hint: int,
                     bloom: seen_mod.Bloom | None = None,
                     shards: DataFrame | None = None) -> DataFrame:
    """THE URL-seen membership test: attach crawl state to frontier rows
    and drop done/forfeited ones. Bloom-gated (definitely-unseen rows
    bypass the join; maybe-hits take the exact check) once the state
    outgrows broadcast. Runs per epoch in "regenerate" mode; at resume
    entry and frontier ingestion in "incremental" mode. With a sharded
    filter (cfg.bloom_backend="sharded") the gate is the partitioned
    Bloom — no filter broadcast, tasks hold one shard's bits each."""
    if seen_agg is None:
        return pending.withColumn("err_count", F.lit(0).cast("long"))
    gated = use_bloom and n_seen_hint >= max(cfg.bloom_min_items, 1)
    broadcast_state = n_seen_hint <= cfg.state_broadcast_max
    if gated and shards is not None:
        out = seen_mod.join_seen_state_sharded(
            pending, seen_agg, shards, cfg.bloom_shards,
            broadcast_state=broadcast_state,
        )
    else:
        out = seen_mod.join_seen_state(
            pending, seen_agg, "key", bloom if gated else None, spark,
            broadcast_state=broadcast_state,
        )
    return out.filter(
        (F.col("done") == 0) & (F.col("err_count") < cfg.max_retry)
    ).drop("done")


def _fetch_commit(spark: SparkSession, cat: Catalog, cfg: CrawlConfig,
                  selected: DataFrame, epoch: int, n_cand: int):
    """Shared epoch tail: fused fetch → single wide append (totals via
    Observation) → delta read-back → per-host lineage counters.
    Returns (stats, delta_df | None)."""
    ordered = scheduler.crawl_shuffle_order(selected, cfg, epoch)
    n_parts = max(1, min(n_cand // 3000 + 1,
                         4 * spark.sparkContext.defaultParallelism))
    fp = fetch_mod.fetch_parse_stage(ordered, cfg, epoch, n_parts=n_parts)
    obs = Observation(f"epoch_{epoch}")
    fp = fp.observe(
        obs,
        F.count(F.lit(1)).alias("fetched"),
        F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
        F.sum(F.when(F.col("status") == "ERR", 1).otherwise(0)).alias("err"),
    )
    with _phase(epoch, "fetch_append"):
        snap_id = cat.table("fetch_log").append(fp, epoch=epoch)
        m = obs.get
    n_selected = int(m["fetched"] or 0)
    if n_selected == 0:
        # Un-commit the empty snapshot: the Observation only reports
        # after the append's action ran, and a zero-row commit would
        # advance latest_epoch (shifting resume numbering) and leave a
        # part-file-less dir in every later multi-path read.
        cat.table("fetch_log").rollback(snap_id)
        return EpochStats(epoch, n_cand, 0, 0, 0), None
    stats = EpochStats(epoch, n_cand, n_selected,
                       int(m["ok"] or 0), int(m["err"] or 0))

    delta = cat.table("fetch_log").read_snapshot(spark, snap_id)
    counters = delta.groupBy("canonical_host").agg(
        F.count("*").alias("fetched"),
        F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
        F.sum(F.when(F.col("status") == "ERR", 1).otherwise(0)).alias("err"),
    )
    with _phase(epoch, "counters"):
        if cfg.n_hosts > cfg.counter_collect_max:
            # Web-scale host cardinality: the counters never visit the
            # driver — distributed append (same schema, same table).
            cat.table("checkpoint").append(
                counters.withColumn("epoch", F.lit(epoch).cast("long")),
                epoch=epoch,
            )
        else:
            counter_rows = counters.collect()
            cat.table("checkpoint").append_pdf(
                pd.DataFrame(
                    [(r["canonical_host"], r["fetched"], r["ok"], r["err"], epoch)
                     for r in counter_rows],
                    columns=["canonical_host", "fetched", "ok", "err", "epoch"],
                ),
                epoch=epoch,
            )
    return stats, delta


def _explode_children(parents: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """ok-parent rows (image_id, depth[, epoch]) → exploded child
    candidates (id, depth=parent+1[, epoch]) via the shared pure link
    function (synth.child_ids) — the same derivation the simulator
    runs, so crawl-order parity extends to discovered URLs."""
    has_epoch = "epoch" in parents.columns

    def gen(batches):
        for b in batches:
            out = []
            eps = b["epoch"].tolist() if has_epoch else None
            for i, (img, d) in enumerate(zip(b["image_id"], b["depth"])):
                for cid in synth.child_ids(img, cfg):
                    out.append((int(cid), int(d) + 1,
                                int(eps[i]) if eps is not None else 0))
            yield pd.DataFrame(out, columns=["id", "depth", "epoch"])

    return parents.mapInPandas(gen, schema="id long, depth int, epoch int")


def _child_rows(kids: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """(id, depth, epoch_added) → full frontier-schema rows — the same
    mapInPandas build path as the seed frontier (synth.frontier_df),
    with the discovery dynamics overriding the static derivation."""
    cols = ["key", "url", "canonical_host", "host_bucket", "priority",
            "depth", "discovered_ts", "image_id", "epoch_added", "robots_ok"]

    def gen(batches):
        for b in batches:
            yield pd.DataFrame(
                [synth.discovered_row(int(i), int(d), int(e), cfg)
                 for i, d, e in zip(b["id"], b["depth"], b["epoch_added"])],
                columns=cols,
            )

    return kids.mapInPandas(gen, schema=synth.FRONTIER_SCHEMA)


class DiscoveryBuffer:
    """Novel frontier rows accumulated across epochs, appended to the
    frontier table every ``flush_every`` epochs instead of every epoch.
    Rows are already localCheckpoint-pinned when they arrive (the same
    materialization the pending set needs anyway), so deferring the
    append removes one fixed-cost driver job per epoch without losing
    anything on a crash: the fetch_log commits every epoch and
    ``rebuild_discovered_frontier`` re-derives any number of missing
    discovery appends from it on resume. Unflushed keys still count as
    "entered" for novelty tests via ``extra_entered``."""

    def __init__(self, flush_every: int):
        self.flush_every = max(1, int(flush_every))
        self.parts: list[DataFrame] = []

    def add(self, rows: DataFrame) -> None:
        self.parts.append(rows)

    def extra_entered(self) -> list[DataFrame]:
        return self.parts

    def flush(self, cat: Catalog, epoch: int, force: bool = False) -> None:
        if not self.parts or not (force or epoch % self.flush_every == 0):
            return
        df = self.parts[0]
        for p in self.parts[1:]:
            df = df.unionByName(p)
        with _phase(epoch, "frontier_flush"):
            cat.table("frontier").append(df, epoch=epoch)
        self.parts = []


def _novel_against_frontier(spark: SparkSession, cat: Catalog,
                            cfg: CrawlConfig, rows: DataFrame,
                            n_rows: int, kid_keys: DataFrame | None = None,
                            extra: list[DataFrame] | None = None) -> DataFrame:
    """Drop child rows whose key ever entered the frontier (seed rows,
    earlier discoveries — robots-blocked ones included, so they are
    never re-derived). Scale shape: children are delta-sized; the huge
    side (every frontier key, 10^10 at target scale) is only SCANNED
    with the read pruned to the key column, never shuffled — membership
    resolves as two broadcast passes (hits = frontier ⋉ bc(children);
    novel = children ▷ bc(hits)) while the children fit a broadcast,
    falling back to a plain anti-join past that. ``kid_keys`` is a
    cheap column-only derivation of the children's keys for the
    broadcast build side, so the full row builder (mapInPandas) runs
    once, on the probe side only. ``extra`` holds checkpointed
    not-yet-flushed discovery batches — their keys are "entered" too."""
    entered = cat.table("frontier").read(spark).select("key")
    for p in extra or []:
        entered = entered.unionByName(p.select("key"))
    if n_rows <= cfg.state_broadcast_max:
        build = kid_keys if kid_keys is not None else rows.select("key")
        hits = entered.join(F.broadcast(build), "key", "inner")
        return rows.join(F.broadcast(hits), "key", "left_anti")
    return rows.join(entered, "key", "left_anti")


def _discover(spark: SparkSession, cat: Catalog, cfg: CrawlConfig,
              delta: DataFrame, images_ref: DataFrame, epoch: int,
              n_ok: int, buffer: DiscoveryBuffer,
              ) -> tuple[DataFrame | None, int]:
    """Mid-crawl link discovery over this epoch's delta: each ok fetch
    below discovery_max_depth yields deterministic children; novel ones
    (never in the frontier before, including not-yet-flushed batches in
    ``buffer``) are localCheckpoint-pinned, handed to the buffer for a
    batched frontier append, and returned as pending rows with
    depth = 1 + min(parent depth among this epoch's discoverers).
    Returns (pending_rows | None, n_novel).

    Per-epoch cost is ONE job (fixed driver cost is what erodes N→4N
    scaling efficiency): the novel-rows checkpoint, whose count rides
    an Observation. The anti-join's broadcast strategy is sized from
    the known ok count (n_kids ≤ n_ok · fanout), its broadcast build
    side derives child keys as a pure column expression (the pandas
    row builder runs once, probe side), and the durable frontier
    append amortizes to 1/flush_every per epoch via the buffer."""
    if n_ok == 0:
        return None, 0
    parents = delta.filter(
        (F.col("status") == "ok") & F.col("depth").isNotNull()
        & (F.col("depth") < cfg.discovery_max_depth)
    ).select("image_id", "depth")
    kids = (
        _explode_children(parents, cfg)
        .groupBy("id").agg(F.min("depth").alias("depth"))
        .withColumn("epoch_added", F.lit(int(epoch)))
    )
    rows = _child_rows(kids, cfg)
    # key = f"{date_str}_H{id+1:04d}" (synth.frontier_row) as a column
    # expression — java.util.Formatter %04d pads-never-truncates, same
    # as Python's :04d, so parity holds past 4 digits.
    kid_keys = kids.select(
        F.format_string(cfg.date_str + "_H%04d", F.col("id") + 1).alias("key")
    )
    n_hint = n_ok * cfg.discovery_fanout
    novel = _novel_against_frontier(
        spark, cat, cfg, rows, n_hint, kid_keys, buffer.extra_entered()
    )
    obs = Observation(f"discover_{epoch}")
    with _phase(epoch, "discover"):
        novel = novel.observe(obs,
                              F.count(F.lit(1)).alias("n")).localCheckpoint()
        n_novel = int(obs.get["n"] or 0)
    if n_novel == 0:
        return None, 0
    buffer.add(novel)
    pending = (
        novel.filter(F.col("robots_ok"))
        .join(images_ref, "image_id", "left")
        .select(*PENDING_COLS)
        .withColumn("err_count", F.lit(0).cast("long"))
    )
    return pending, n_novel


def rebuild_discovered_frontier(spark: SparkSession, cat: Catalog,
                                cfg: CrawlConfig) -> int:
    """Resume self-heal: discovered frontier rows are a PURE function of
    the fetch_log (children of ok rows, first-discovering-epoch cohort,
    min parent depth within it), so a crash in the window between the
    fetch_log append and the frontier append loses nothing — re-derive
    every discovered row from the log and append the ones the frontier
    table is missing. Idempotent; returns the number healed."""
    log = cat.table("fetch_log").read(spark)
    if log is None or not cfg.discovery_fanout:
        return 0
    ok = log.filter(
        (F.col("status") == "ok") & F.col("depth").isNotNull()
        & (F.col("depth") < cfg.discovery_max_depth)
    ).select("image_id", "depth", "epoch")
    kids = _explode_children(ok, cfg)
    first = kids.groupBy("id").agg(F.min("epoch").alias("e0"))
    cohort = (
        kids.join(first, "id")
        .filter(F.col("epoch") == F.col("e0"))
        .groupBy("id", "e0").agg(F.min("depth").alias("depth"))
        .select("id", "depth", F.col("e0").alias("epoch_added"))
    )
    rows = _child_rows(cohort, cfg).localCheckpoint()
    n_rows = rows.count()
    if n_rows == 0:
        return 0
    missing = _novel_against_frontier(spark, cat, cfg, rows, n_rows)
    missing = missing.localCheckpoint()
    n_missing = missing.count()
    if n_missing:
        cat.table("frontier").append(
            missing, epoch=cat.table("fetch_log").latest_epoch() or 0
        )
    return n_missing


def run_epoch_incremental(spark: SparkSession, cat: Catalog, cfg: CrawlConfig,
                          pending: DataFrame, politeness: DataFrame,
                          epoch: int, hot_hosts: list[str] | None,
                          images_ref: DataFrame | None = None,
                          buffer: DiscoveryBuffer | None = None,
                          ) -> tuple[EpochStats, DataFrame]:
    """One epoch, incremental frontier (see module docstring). ``pending``
    carries exact state: every row is live (not done, not forfeited)
    with its true ``err_count``."""
    with_attempt = pending.withColumn(
        "attempt", (F.col("err_count") + 1).cast("int")
    )
    rank_obs = Observation(f"rank_{epoch}")
    with _phase(epoch, "rank"):
        ranked = scheduler.rank_per_host(
            with_attempt, politeness, cfg, hot_hosts
        ).observe(rank_obs, F.count(F.lit(1)).alias("n")).localCheckpoint()
        n_cand = int(rank_obs.get["n"] or 0)
    if n_cand == 0:
        return EpochStats(epoch, 0, 0, 0, 0), pending

    sel_pred = scheduler.is_selected()
    selected = ranked.filter(sel_pred).drop("max_per_epoch", "err_count")
    stats, delta = _fetch_commit(spark, cat, cfg, selected, epoch, n_cand)
    if delta is None:
        return stats, pending

    # Next pending = budget losers (state unchanged) ∪ retryable errors
    # (err_count = the attempt that just failed; frontier columns come
    # from the ERR echo — a projection, not a join) ∪ novel discovered
    # children (when discovery is on).
    losers = ranked.filter(~sel_pred).select(*PENDING_COLS, "err_count")
    retry = (
        delta.filter(
            (F.col("status") == "ERR") & (F.col("attempt") < cfg.max_retry)
        )
        .withColumn("robots_ok", F.lit(True))
        .withColumn("err_count", F.col("attempt").cast("long"))
        .select(*PENDING_COLS, "err_count")
    )
    # The union stays LAZY: losers project a checkpointed frame, retry
    # re-reads a written parquet snapshot, novel is checkpointed inside
    # _discover — lineage is one epoch deep either way, and the next
    # epoch's rank checkpoint is the materialization point. A pending
    # checkpoint here would be a redundant fixed-cost job per epoch.
    new_pending = losers.unionByName(retry)
    if cfg.discovery_fanout and images_ref is not None and buffer is not None:
        novel, n_novel = _discover(spark, cat, cfg, delta, images_ref, epoch,
                                   stats.n_ok, buffer)
        if novel is not None:
            new_pending = new_pending.unionByName(novel)
            stats.n_discovered = n_novel
    return stats, new_pending


def run_epoch_regenerate(spark: SparkSession, cat: Catalog, cfg: CrawlConfig,
                         pending: DataFrame, politeness: DataFrame,
                         epoch: int, use_bloom: bool,
                         seen_agg: DataFrame | None, n_seen_hint: int,
                         hot_hosts: list[str] | None,
                         bloom: seen_mod.Bloom | None,
                         shards: DataFrame | None = None,
                         images_ref: DataFrame | None = None,
                         buffer: DiscoveryBuffer | None = None,
                         ) -> tuple[EpochStats, DataFrame | None, DataFrame,
                                    DataFrame | None]:
    """One epoch, reference mechanics: the (monotonically shrinking)
    pending set re-takes the seen-membership test every tick
    (/root/reference/Coordinator/main.py:65-68), Bloom-gated at scale.
    Exclusion is monotone, so filtering the previous pending against
    the fresh state equals the full-frontier anti-join result."""
    cand_obs = Observation(f"cand_{epoch}")
    candidates = apply_seen_state(
        pending.drop("err_count"), seen_agg, cfg, spark, use_bloom,
        n_seen_hint, bloom, shards,
    ).observe(cand_obs, F.count(F.lit(1)).alias("n")).localCheckpoint()
    n_cand = int(cand_obs.get["n"] or 0)
    new_pending = candidates
    if n_cand == 0:
        return EpochStats(epoch, 0, 0, 0, 0), seen_agg, new_pending, shards

    with_attempt = candidates.withColumn(
        "attempt", (F.col("err_count") + 1).cast("int")
    ).drop("err_count")
    selected = scheduler.select_per_host_budget(
        with_attempt, politeness, cfg, hot_hosts
    )
    stats, delta = _fetch_commit(spark, cat, cfg, selected, epoch, n_cand)
    if delta is None:
        return stats, seen_agg, new_pending, shards

    if cfg.discovery_fanout and images_ref is not None and buffer is not None:
        novel, n_novel = _discover(spark, cat, cfg, delta, images_ref, epoch,
                                   stats.n_ok, buffer)
        if novel is not None:
            # Novel children join the pending set directly — they are
            # unattempted by construction, so next epoch's seen-state
            # re-test passes them through unchanged. Union stays lazy:
            # novel is checkpointed inside _discover and candidates is
            # already checkpointed, so the lineage is shallow either way.
            new_pending = new_pending.unionByName(novel)
            stats.n_discovered = n_novel

    # Incremental seen-state compaction: old agg ∪ epoch delta.
    delta_agg = delta.groupBy("key").agg(
        F.max(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("done"),
        F.sum(F.when(F.col("status") == "ERR", 1).otherwise(0)).alias("err_count"),
    )
    merged = (
        delta_agg if seen_agg is None else seen_agg.unionByName(delta_agg)
        .groupBy("key")
        .agg(F.max("done").alias("done"), F.sum("err_count").alias("err_count"))
    )
    new_agg = merged.localCheckpoint()

    # Keep the filter current with O(delta) work, never an O(seen)
    # rebuild: driver Bloom ORs the delta's keys in; the sharded filter
    # rewrites only the shards the delta touches.
    if use_bloom and cfg.bloom_backend == "sharded":
        if shards is None:  # first delta of a fresh sharded crawl
            shards = seen_mod.build_sharded_bloom(
                delta.select("key"), max(2 * cfg.n_urls, 1024),
                cfg.bloom_shards,
            ).localCheckpoint()
        else:
            shards = seen_mod.update_sharded_bloom(
                shards, delta.select("key"), cfg.bloom_shards
            ).localCheckpoint()
    elif bloom is not None:
        seen_mod.add_keys_to_bloom(bloom, delta.select("key"), "key")

    return stats, new_agg, new_pending, shards


def run_crawl(spark: SparkSession, cfg: CrawlConfig, workdir: str,
              use_bloom: bool = True, resume: bool = False) -> list[EpochStats]:
    """Full crawl to quiescence (or cfg.max_epochs). Resumable: with
    ``resume=True`` continues after the last committed epoch.

    AQE is switched off for the duration of the loop: every join and
    shuffle here is explicitly sized (broadcast hints, pinned fetch
    partitioning, right-sized writes), so adaptive re-planning only adds
    driver latency to each of the many small per-epoch actions —
    measurable as inter-job gaps in the event log. Restored on exit so
    the analytic query surface keeps AQE's skew/coalesce benefits.
    """
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    shuffle_before = spark.conf.get("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _run_crawl_inner(spark, cfg, workdir, use_bloom, resume)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_before)


def _run_crawl_inner(spark: SparkSession, cfg: CrawlConfig, workdir: str,
                     use_bloom: bool, resume: bool) -> list[EpochStats]:
    cat = Catalog(workdir)
    frontier_t = cat.table("frontier")
    if frontier_t.read(spark) is None:
        # north_rule layout: the frontier lives bucketed by
        # canonicalized-host hash — a hidden bucket(N, canonical_host)
        # partition spec, so host-scoped reads (per-host audits, retry
        # sweeps, politeness forensics) prune to one bucket directory
        # instead of scanning 10^10 rows (catalog.Table.scan projects
        # host-equality through the spec; pruning pinned in
        # tests/test_catalog.py / test_crawl_e2e.py).
        if cfg.n_buckets and not frontier_t.partition_spec():
            frontier_t.set_partition_spec(
                [("bucket", cfg.n_buckets, "canonical_host")])
        frontier_t.append(synth.frontier_df(spark, cfg), epoch=0)
    if resume and cfg.discovery_fanout:
        # Heal the frontier before reading it: a crash between the
        # fetch_log append and the frontier append would otherwise lose
        # that epoch's discoveries (they are re-derivable from the log).
        rebuild_discovered_frontier(spark, cat, cfg)
    frontier = frontier_t.read(spark).filter(F.col("robots_ok")).persist()

    images_t = cat.table("images")
    if images_t.read(spark) is None:
        images_t.append(synth.images_df(spark, cfg), epoch=0)
    # Expected metadata joins onto the frontier ONCE here (bytes pruned
    # at the parquet scan; phash as string — see fetch.REF_COLS) and
    # rides every epoch's pending set, so per-row validation inside the
    # fetch stage needs no join at all. At cluster scale both tables
    # bucket by image_id, making this single join co-located too.
    images_ref = images_t.read(spark).select(
        F.col("image_id"),
        F.col("w").alias("w_ref"),
        F.col("h").alias("h_ref"),
        F.col("fmt").alias("fmt_ref"),
        F.col("caption").alias("caption_ref"),
        F.col("phash").cast("string").alias("phash_ref"),
    )
    pending = frontier.join(images_ref, "image_id", "left").select(*PENDING_COLS)

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

    # Driver-held incremental Bloom over attempted keys: pre-sized once
    # (~2 attempts/URL), fed O(delta) per epoch in regenerate mode, or
    # rebuilt once from the compacted state where membership testing
    # actually happens (resume entry / regenerate loop).
    incremental = cfg.frontier_mode != "regenerate"
    sharded = cfg.bloom_backend == "sharded"
    bloom = None
    shards = None
    # Incremental mode consults the filter exactly once (resume entry),
    # and apply_seen_state only gates when n_seen_hint >= bloom_min_items
    # — so a small-resume O(seen) filter build would be pure waste.
    # Regenerate mode still builds eagerly: gating can engage mid-crawl
    # as the seen set grows past the threshold.
    if use_bloom and (
        not incremental
        or (seen_agg is not None
            and n_seen_hint >= max(cfg.bloom_min_items, 1))
    ):
        if sharded:
            if seen_agg is not None and n_seen_hint > 0:
                # Resume fast-path: the durable shard table (written at
                # crawl exit, labelled with fetch_log's latest epoch — the
                # "bloom shard paths" of the checkpoint manifest) skips
                # the O(seen) rebuild; stale/missing → rebuild from state.
                shards_t = cat.table("bloom_shards")
                if shards_t.latest_epoch() == cat.table("fetch_log").latest_epoch():
                    shards = shards_t.read(spark).localCheckpoint()
                else:
                    shards = seen_mod.build_sharded_bloom(
                        seen_agg.select("key"), max(2 * cfg.n_urls, 1024),
                        cfg.bloom_shards,
                    ).localCheckpoint()
        else:
            bloom = seen_mod.Bloom.sized_for(max(2 * cfg.n_urls, 1024))
            if seen_agg is not None and n_seen_hint > 0:
                seen_mod.add_keys_to_bloom(bloom, seen_agg.select("key"), "key")

    # The URL-seen membership test at the frontier boundary: in
    # incremental mode it runs here exactly once per (re)entry — fresh
    # crawls skip it (state empty), resumes take the bloom-gated join.
    if incremental:
        pending = apply_seen_state(
            pending, seen_agg, cfg, spark, use_bloom, n_seen_hint, bloom,
            shards,
        )

    hot_hosts = scheduler.hot_hosts_of(frontier, cfg)
    # Pending-size estimate drives per-epoch shuffle sizing: tail retry
    # epochs run dozens of rows — 32-partition window shuffles there are
    # pure task-launch overhead (16 scheduling waves on a 2-core run).
    # AQE would coalesce these adaptively; with it off in the loop, the
    # driver does the arithmetic itself from the stats it already has.
    n_pending_est = frontier.count()  # cheap: frontier is persisted
    max_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    stats: list[EpochStats] = []
    disc_buffer = DiscoveryBuffer(cfg.discovery_flush_every)
    last_epoch = start_epoch
    for epoch in range(start_epoch, cfg.max_epochs + 1):
        last_epoch = epoch
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(2, min(n_pending_est // 20_000 + 1, max_shuffle))),
        )
        if incremental:
            st, pending = run_epoch_incremental(
                spark, cat, cfg, pending, politeness, epoch, hot_hosts,
                images_ref, disc_buffer,
            )
        else:
            st, seen_agg, pending, shards = run_epoch_regenerate(
                spark, cat, cfg, pending, politeness, epoch, use_bloom,
                seen_agg, n_seen_hint, hot_hosts, bloom, shards, images_ref,
                disc_buffer,
            )
        stats.append(st)
        if st.n_selected == 0:
            break
        disc_buffer.flush(cat, epoch)
        n_seen_hint += st.n_selected
        # next pending ≤ losers + retryable errors + discovered children
        # (exact in incremental mode, an upper bound in regenerate mode)
        n_pending_est = max(
            st.n_candidates - st.n_selected + st.n_err, 1
        ) + st.n_discovered
        # Durable state snapshot every K epochs (resume fast-path). In
        # incremental mode the loop never reads seen_agg, so no snapshot
        # jobs run here — fetch_log is the single source of truth and
        # load_seen_agg rebuilds the compact state exactly once at the
        # next (re)entry.
        if not incremental and seen_agg is not None and (
            epoch % cfg.state_compact_every == 0
        ):
            cat.table("seen_agg").replace(seen_agg, epoch=epoch)
            if shards is not None:
                cat.table("bloom_shards").replace(shards, epoch=epoch)
        # fetch_log small-file compaction (opt-in): epoch-per-snapshot
        # appends are rewritten into one snapshot every K epochs —
        # bounded manifest/file-count at 10^3+-epoch crawls, content
        # provably unchanged (latest_epoch preserved for resume).
        if cfg.log_compact_every and epoch % cfg.log_compact_every == 0:
            # pending's retry branch is a LAZY projection of this
            # epoch's fetch_log snapshot; compaction rewrites those
            # files, so pin pending first. Costs one job only on the
            # compaction cadence — every other epoch pending stays lazy
            # (the next rank checkpoint is its materialization point).
            pending = pending.localCheckpoint()
            cat.table("fetch_log").compact(spark)
    # Any discovery batch still buffered becomes durable here — after
    # this point the frontier table is complete (readers outside the
    # loop, resume without heal, final-state tests all rely on it).
    disc_buffer.flush(cat, last_epoch, force=True)
    # Final durable state snapshot so a warm resume needs no log rebuild
    # (labelled with the log's latest epoch — the staleness check in
    # load_seen_agg compares against fetch_log).
    last_log = cat.table("fetch_log").latest_epoch()
    if not incremental and seen_agg is not None and last_log is not None and (
        cat.table("seen_agg").latest_epoch() != last_log
    ):
        cat.table("seen_agg").replace(seen_agg, epoch=last_log)
    # Durable shard snapshot (the checkpoint's bloom-shard paths): only
    # in regenerate mode, where the loop keeps shards current with every
    # delta — incremental-entry shards go stale the moment fetching
    # starts, and a stale filter persisted as fresh would produce false
    # negatives (re-crawls) on the next resume.
    if not incremental and shards is not None and last_log is not None and (
        cat.table("bloom_shards").latest_epoch() != last_log
    ):
        cat.table("bloom_shards").replace(shards, epoch=last_log)
    frontier.unpersist()
    politeness.unpersist()
    return stats


def ingest_frontier(spark: SparkSession, workdir: str, urls: DataFrame,
                    images: DataFrame | None = None,
                    epoch_added: int | None = None) -> int:
    """Ingest newly discovered URLs (and their expected-image metadata)
    into an existing crawl's frontier — the between-runs discovery path
    (reference analog: the Coordinator regenerating its todo list from
    fresh cross-products each tick, Coordinator/main.py:34-61).

    Appends a frontier snapshot stamped with ``epoch_added`` (defaults
    to the log's latest epoch so provenance survives); the next
    ``run_crawl(..., resume=True)`` re-enters, and the entry-point
    seen-state anti-join — the ONE place membership is unknown in
    incremental mode — filters already-attempted keys, so exactly the
    novel URLs are scheduled. No rewrite of the existing frontier, no
    state rebuild beyond the entry join the resume pays anyway.

    Returns the number of ingested rows.
    """
    cat = Catalog(workdir)
    if epoch_added is None:
        epoch_added = cat.table("fetch_log").latest_epoch() or 0
    urls = urls.withColumn("epoch_added", F.lit(int(epoch_added)))
    n = urls.count()
    cat.table("frontier").append(urls, epoch=epoch_added)
    if images is not None:
        cat.table("images").append(images, epoch=epoch_added)
    return n


def read_parsed(spark: SparkSession, workdir: str) -> DataFrame:
    """The parsed/validated view over the wide fetch_log: ok rows with
    their decode features + per-row ``valid`` verdict. A narrow
    projection — parquet column pruning keeps it as cheap as the
    separate table it replaced (one write per epoch instead of two)."""
    log = Catalog(workdir).table("fetch_log").read(spark)
    return log.filter(F.col("status") == "ok").select(*PARSED_COLS)


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
