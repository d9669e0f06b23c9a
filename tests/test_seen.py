from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ycrawl_spark.seen import Bloom, Cuckoo, anti_join_unseen, build_bloom


def test_bloom_no_false_negatives_and_fp_bound():
    b = Bloom.sized_for(5000, fpp=0.01)
    keys = [f"k{i}" for i in range(5000)]
    b.add_many(keys)
    assert b.contains_many(keys).all()
    probe = [f"absent{i}" for i in range(20000)]
    fp_rate = b.contains_many(probe).mean()
    assert fp_rate < 0.03  # 3× headroom over target 1%


def test_bloom_merge():
    a = Bloom(1 << 14, 7)
    c = Bloom(1 << 14, 7)
    a.add_many(["x1", "x2"])
    c.add_many(["y1"])
    m = a.merge(c)
    assert m.contains_many(["x1", "x2", "y1"]).all()


def test_cuckoo_insert_contains_delete():
    c = Cuckoo(1024)
    keys = [f"k{i}" for i in range(500)]
    for k in keys:
        assert c.insert(k)
    assert all(c.contains(k) for k in keys)
    for k in keys[:100]:
        assert c.delete(k)
    # deleted keys may still FP-collide with remaining fingerprints, but most gone
    still = sum(c.contains(k) for k in keys[:100])
    assert still < 10
    assert all(c.contains(k) for k in keys[100:])


def test_anti_join_with_bloom_equals_exact(spark):
    cand = spark.createDataFrame([(f"k{i}", i) for i in range(2000)], "key string, v int")
    seen = spark.createDataFrame([(f"k{i}",) for i in range(0, 2000, 3)], "key string")
    bloom = build_bloom(seen, "key", n_items_hint=700, n_shards=8)
    exact = {r["key"] for r in cand.join(seen, "key", "left_anti").collect()}
    with_bloom = {
        r["key"] for r in anti_join_unseen(cand, seen, "key", bloom, spark).collect()
    }
    assert with_bloom == exact
