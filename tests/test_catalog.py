"""Catalog facade semantics: atomic append commits, snapshot time
travel, replace-as-single-snapshot, epoch bookkeeping — the properties
the crawl's checkpoint/resume story leans on (SURVEY.md §2.1
sink_checkpoint_meta; Iceberg-equivalent behavior per §7)."""

from __future__ import annotations

import pandas as pd

from ycrawl_spark.catalog import Catalog


def test_append_and_time_travel(spark, tmp_path):
    t = Catalog(str(tmp_path)).table("facts")
    s1 = t.append(spark.createDataFrame([(1, "a")], "id int, v string"), epoch=1)
    s2 = t.append(spark.createDataFrame([(2, "b")], "id int, v string"), epoch=2)

    assert {r["id"] for r in t.read(spark).collect()} == {1, 2}
    # time travel to the first commit sees only its rows (fx_fallback
    # pattern: read the previous snapshot when today's load fails)
    assert {r["id"] for r in t.read(spark, as_of=s1).collect()} == {1}
    assert {r["id"] for r in t.read(spark, as_of=s2).collect()} == {1, 2}
    assert t.latest_epoch() == 2


def test_replace_supersedes_all_snapshots(spark, tmp_path):
    t = Catalog(str(tmp_path)).table("state")
    t.append(spark.createDataFrame([(1,)], "id int"), epoch=1)
    t.append(spark.createDataFrame([(2,)], "id int"), epoch=2)
    t.replace(spark.createDataFrame([(9,)], "id int"), epoch=3)

    assert [r["id"] for r in t.read(spark).collect()] == [9]
    assert len(t.snapshots()) == 1
    assert t.latest_epoch() == 3


def test_rollback_uncommits_snapshot(spark, tmp_path):
    """rollback drops one snapshot from the manifest AND its data dir —
    the zero-yield-epoch un-commit path: latest_epoch must fall back
    and later multi-path reads must not see an orphan dir."""
    import os

    t = Catalog(str(tmp_path)).table("log")
    t.append(spark.createDataFrame([(1,)], "id int"), epoch=1)
    s2 = t.append(spark.createDataFrame([], "id int"), epoch=2)
    assert t.latest_epoch() == 2
    dirs_before = [p for s in t.snapshots() for p in s.files]

    t.rollback(s2)
    assert t.latest_epoch() == 1
    assert [r["id"] for r in t.read(spark).collect()] == [1]
    gone = [p for p in dirs_before if not os.path.exists(p)]
    assert len(gone) == 1  # exactly the rolled-back snapshot's dir


def test_append_pdf_no_spark_job(spark, tmp_path):
    t = Catalog(str(tmp_path)).table("counters")
    t.append_pdf(pd.DataFrame({"host": ["h1", "h2"], "n": [3, 4]}), epoch=1)
    t.append_pdf(pd.DataFrame({"host": ["h1"], "n": [5]}), epoch=2)
    got = t.read(spark).groupBy().sum("n").collect()[0][0]
    assert got == 12
    assert t.latest_epoch() == 2


def test_truncate_then_read_none(spark, tmp_path):
    t = Catalog(str(tmp_path)).table("tmp")
    t.append(spark.createDataFrame([(1,)], "id int"), epoch=1)
    t.truncate()
    assert t.read(spark) is None
    assert t.latest_epoch() is None


def test_compact_preserves_content_and_epoch(spark, tmp_path):
    """rewrite_data_files + expire_snapshots analog: N snapshots → 1,
    identical rows, latest_epoch preserved, old data dirs GC'd."""
    import os

    t = Catalog(str(tmp_path)).table("log")
    for e in range(1, 5):
        t.append(spark.range(e * 10, e * 10 + 5).toDF("id"), epoch=e)
    before = sorted(r["id"] for r in t.read(spark).collect())
    old_dirs = [p for s in t.snapshots() for p in s.files]
    assert t.compact(spark) is not None
    snaps = t.snapshots()
    assert len(snaps) == 1
    assert snaps[0].meta["compacted_from"] == 4
    assert t.latest_epoch() == 4
    assert sorted(r["id"] for r in t.read(spark).collect()) == before
    assert not any(os.path.exists(d) for d in old_dirs)
    # idempotent: a single-snapshot table has nothing to compact
    assert t.compact(spark) is None
