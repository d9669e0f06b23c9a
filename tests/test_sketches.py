"""Count-min-sketch heavy-hitter estimates vs the exact counts the
oracle certifies: CMS guarantees estimate >= true and, with width w,
overestimate <= total_mass/w with high probability — both gated here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_count_min_sketch_bounds_heavy_hitters(spark):
    tok = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("tok"))
    )
    exact = {
        r["tok"]: r["n"]
        for r in tok.groupBy("tok").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok")).limit(20).collect()
    }
    total = tok.count()

    # one-pass mergeable sketch built executor-side (eps=0.001 → width 2719)
    sk_bytes = tok.agg(
        F.count_min_sketch("tok", F.lit(0.001), F.lit(0.01), F.lit(42)).alias("sk")
    ).collect()[0]["sk"]

    sketch = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytearray(sk_bytes)
    )
    for t, n in exact.items():
        est = sketch.estimateCount(t)
        assert est >= n                       # CMS never underestimates
        assert est - n <= 0.002 * total       # 2·eps slack on the bound
