"""approx_percentile (the mergeable-sketch scale path) must track the
exact per-group quantiles the oracle certifies."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_approx_percentile_within_1pct_of_exact(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    both = (
        o.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", 0.5).alias("exact50"),
            F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("approx50"),
            F.percentile("o_totalprice", 0.95).alias("exact95"),
            F.expr("approx_percentile(o_totalprice, 0.95, 1000)").alias("approx95"),
        )
        .collect()
    )
    assert len(both) == 5
    for r in both:
        assert abs(r["approx50"] - r["exact50"]) <= 0.01 * r["exact50"]
        assert abs(r["approx95"] - r["exact95"]) <= 0.01 * r["exact95"]
