"""CSV/JSONL round-trip robustness on adversarial content the synthetic
events table never contains: nulls, empty strings, embedded newlines,
commas and quotes must survive write→read with the pinned options."""

from __future__ import annotations


ROWS = [
    (1, 10, "view", '{"k": 1}'),
    (2, 11, "click", ""),                 # empty string (not null)
    (3, 12, "purchase", None),            # real null
    (4, 13, "view", "line1\nline2"),      # embedded newline
    (5, 14, "click", 'comma, "quote"'),   # delimiter + quote
]
SCHEMA = "event_id BIGINT, user_id BIGINT, event_type STRING, props STRING"


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip_adversarial(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = str(tmp_path / "csv")
    df.write.option("header", True).option("nullValue", "\\N").csv(out)
    back = (
        spark.read.schema(SCHEMA)
        .option("header", True)
        .option("nullValue", "\\N")
        .option("multiLine", True)
        .csv(out)
    )
    assert _collect(back) == _collect(df)


def test_jsonl_roundtrip_adversarial(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = str(tmp_path / "jsonl")
    df.write.json(out)
    back = spark.read.schema(SCHEMA).json(out)
    assert _collect(back) == _collect(df)
