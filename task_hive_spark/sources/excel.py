"""Excel sheet source (S1): the reference's spider input.

The reference reads ``spider.xlsx`` with tealeg/xlsx
(tasks/spider.go:21-49): sheet 0, skip the header row, coerce every
cell to string, fan each row out into a task. Spark has no built-in
xlsx reader; the idiomatic small-file path is pandas → ``spark.create
DataFrame`` on the driver (sheet files are KB-to-MB sized control
inputs, not data-plane files — at 100 TB scale the sheet is still one
driver-side read that *produces* the distributed task stream).

No xlsx engine (openpyxl/xlrd) ships in this container, so the reader
is gated behind an import-try and raises ``NotImplementedError`` with
the real implementation in place; ``sheet_rows_standin`` provides the
deterministic parquet stand-in the oracle suite uses (SURVEY §2.1 maps
S1 to it), so every downstream operator (row fan-out, cell coercion,
task compose) is exercised end-to-end either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_sheet(spark: SparkSession, path: str, skip_header: bool = True) -> DataFrame:
    """Read sheet 0 of an xlsx file into (row_id INT, row_data
    ARRAY<STRING>) — the WechatTask shape (model/model.go:25-29), cells
    coerced to string like spider.go:47-50."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=0, header=0 if skip_header else None, dtype=str)
    except ImportError as exc:
        raise NotImplementedError(
            "xlsx engine (openpyxl) not available in this environment; "
            "use sheet_rows_standin for the deterministic oracle path"
        ) from exc
    rows = [
        (i + 1, [("" if pd.isna(c) else str(c)) for c in rec])
        for i, rec in enumerate(pdf.itertuples(index=False, name=None))
    ]
    return spark.createDataFrame(rows, "row_id INT, row_data ARRAY<STRING>")


def sheet_rows_standin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver-fixture stand-in for the spider sheet: ``part`` rows
    as (row_id, row_data) with the same string coercion (decimal cells
    via fixed-scale decimal so formatting is engine-portable)."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    return p.select(
        F.col("p_partkey").cast("int").alias("row_id"),
        F.array(
            F.col("p_name"),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size").cast("string"),
            F.col("p_retailprice").cast("decimal(12,2)").cast("string"),
        ).alias("row_data"),
    )
