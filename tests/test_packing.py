"""Sequence-packing prefix sum: the two-phase (partition-local window +
broadcast partition offsets) global token offset must be invariant to
the input's physical partitioning and equal to a driver-side cumsum.
"""

from __future__ import annotations

from ycrawl_spark import textops


def _expected(rows: list[tuple[int, str]], ctx: int):
    out = {}
    off = 0
    for doc_id, text in sorted(rows):
        n = len(text.split(" "))
        first, last = off // ctx, (off + n - 1) // ctx
        out[doc_id] = (n, off, first, last, last - first + 1)
        off += n
    return out


def _got(df, ctx):
    return {
        r["doc_id"]: (
            r["n_tokens"], r["start_tok"], r["first_chunk"],
            r["last_chunk"], r["n_chunks"],
        )
        for r in textops.pack_concat_chunks(df, ctx=ctx).collect()
    }


def test_pack_offsets_match_driver_cumsum_any_partitioning(spark):
    # ragged doc lengths (1..40 tokens), ids deliberately out of order
    rows = [
        (doc_id, " ".join(f"t{doc_id}_{j}" for j in range(1 + (doc_id * 7) % 40)))
        for doc_id in range(400, 0, -1)
    ]
    exp = _expected(rows, ctx=16)
    for nparts in (1, 16):
        df = spark.createDataFrame(rows, "doc_id long, text string").repartition(nparts)
        assert _got(df, ctx=16) == exp, f"nparts={nparts}"


def test_pack_chunk_spans_are_contiguous(spark):
    rows = [(i, " ".join(["w"] * (1 + i % 9))) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["start_tok"], r["n_tokens"], r["first_chunk"], r["last_chunk"])
        for r in textops.pack_concat_chunks(df, ctx=8).collect()
    )
    pos = 0
    for start, n, first, last in got:
        assert start == pos  # no gaps or overlaps in the packed stream
        assert first == start // 8 and last == (start + n - 1) // 8
        pos += n
