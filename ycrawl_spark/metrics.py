"""Scan-cost metering: the BigQuery-dry-run analog of the reference's
``total_bytes_processed`` (/root/reference/Frontend/historyplot.py:62,
83,120,189,242,284 — every query there reports the bytes BigQuery
estimates it will scan).

Parquet makes the same estimate available from file footers: a query
that projects columns C over files F will read ~Σ_{f∈F, c∈C}
compressed_size(column chunk c of f). ``scan_cost`` computes exactly
that, DISTRIBUTED: the file list becomes a DataFrame and executors
read footers in parallel via ``mapInPandas`` (footers are a few KB
each — at a 100 TB table with 10^5-10^6 files this is a small parallel
metadata job, never a driver-side loop over files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

COST_SCHEMA = ("file string, n_rows long, file_bytes long, "
               "scan_bytes long, n_cols int")


def _footer_reader(columns: list[str] | None):
    def read_footers(batches):
        import os

        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["path"]:
                local = path[len("file:"):] if path.startswith("file:") else path
                md = pq.ParquetFile(local).metadata
                names = md.schema.names
                want = set(columns) if columns is not None else set(names)
                scan = 0
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        # path_in_schema is 'col' or 'col.list.element'…
                        root = col.path_in_schema.split(".")[0]
                        if root in want:
                            scan += col.total_compressed_size
                out.append((os.path.basename(local), md.num_rows,
                            os.path.getsize(local), scan,
                            len(want & set(names))))
            yield pd.DataFrame(
                out, columns=["file", "n_rows", "file_bytes",
                              "scan_bytes", "n_cols"])

    return read_footers


def scan_cost(spark: SparkSession, df: DataFrame,
              columns: list[str] | None = None) -> DataFrame:
    """Per-file dry-run scan cost for reading ``columns`` of ``df``'s
    input files (all columns when None): (file, n_rows, file_bytes,
    scan_bytes, n_cols). ``scan_bytes`` ≤ ``file_bytes`` — the gap is
    what column pruning saves, the number the reference surfaces as
    ``total_bytes_processed`` before running a query."""
    files = df.inputFiles()
    paths = spark.createDataFrame([(p,) for p in files], "path string")
    n_parts = max(1, min(len(files), spark.sparkContext.defaultParallelism))
    return paths.repartition(n_parts).mapInPandas(
        _footer_reader(columns), COST_SCHEMA,
    )


def scan_cost_total(spark: SparkSession, df: DataFrame,
                    columns: list[str] | None = None) -> DataFrame:
    """One-row total over ``scan_cost`` — the headline dry-run number."""
    return scan_cost(spark, df, columns).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("file_bytes").alias("file_bytes"),
        F.sum("scan_bytes").alias("scan_bytes"),
    )
