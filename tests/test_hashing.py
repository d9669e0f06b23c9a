"""XXH64 parity: our pure-Python impl must equal Spark's F.xxhash64
for UTF8 strings (seed 42), since crawl-shuffle order depends on it."""

from __future__ import annotations

from pyspark.sql import functions as F

from ycrawl_spark.hashing import xxh64, xxh64_signed

# Published XXH64 test vectors (seed 0): empty string and "a".
def test_known_vectors():
    assert xxh64(b"", seed=0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", seed=0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", seed=0) == 0x44BC2CF5AD770999


def test_spark_parity(spark):
    samples = [
        "",
        "a",
        "20260816_H0001:shuffle-42",
        "img_00000042",
        "x" * 31,
        "y" * 32,
        "z" * 100,
        "host007.example.com/img/img_00001234",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert got[s] == xxh64_signed(s), f"mismatch for {s!r}"
