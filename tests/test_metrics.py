"""Scan-cost metering gates: the parquet-footer dry-run numbers must
be REAL bytes — pinned against the OS file size and the projection
must be strictly cheaper than the full scan (the whole point of the
reference's total_bytes_processed metering)."""

from __future__ import annotations

import glob
import os

import pytest

from ycrawl_spark.metrics import scan_cost, scan_cost_total

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_file_bytes_match_os(spark, lineitem):
    got = {r["file"]: r for r in scan_cost(spark, lineitem).collect()}
    on_disk = {
        os.path.basename(p): os.path.getsize(p)
        for p in glob.glob(f"{SF_DIR}/lineitem.parquet")
        + glob.glob(f"{SF_DIR}/lineitem.parquet/*.parquet")
        if os.path.isfile(p)
    }
    assert set(got) == set(on_disk)
    for f, r in got.items():
        assert r["file_bytes"] == on_disk[f]


def test_rows_match_table_count(spark, lineitem):
    total = scan_cost_total(spark, lineitem).collect()[0]
    assert total["n_rows"] == lineitem.count()


def test_projection_strictly_cheaper_than_full_scan(spark, lineitem):
    pruned = scan_cost_total(
        spark, lineitem, columns=["l_orderkey", "l_extendedprice"]
    ).collect()[0]
    full = scan_cost_total(spark, lineitem).collect()[0]
    assert 0 < pruned["scan_bytes"] < full["scan_bytes"]
    # data bytes never exceed the physical file (footer overhead aside)
    assert full["scan_bytes"] <= full["file_bytes"]
    # a 2-column projection must prune a substantial share (these two
    # columns are ~53% of the synthetic table's bytes at sf0.001)
    assert pruned["scan_bytes"] < 0.6 * full["scan_bytes"]


def test_unknown_columns_scan_nothing(spark, lineitem):
    r = scan_cost_total(spark, lineitem, columns=["no_such_col"]).collect()[0]
    assert r["scan_bytes"] == 0
