"""Excel source: gated xlsx reader + deterministic stand-in shape."""

from __future__ import annotations

import pytest

from task_hive_spark.sources.excel import read_sheet, sheet_rows_standin


def _has_xlsx_engine() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False


def test_read_sheet_real_or_gated(spark):
    """With an xlsx engine present the reference's own spider.xlsx
    parses; without one the reader must fail loudly, not silently."""
    if _has_xlsx_engine():
        df = read_sheet(spark, "/root/reference/spider.xlsx")
        assert df.columns == ["row_id", "row_data"]
        assert df.count() > 0
    else:
        with pytest.raises(NotImplementedError):
            read_sheet(spark, "/root/reference/spider.xlsx")


def test_standin_shape(spark, sf_dir):
    df = sheet_rows_standin(spark, sf_dir)
    assert df.columns == ["row_id", "row_data"]
    row = df.orderBy("row_id").first()
    assert row["row_id"] >= 0
    # five string cells per row, decimal cell rendered at fixed scale
    assert len(row["row_data"]) == 5
    assert all(isinstance(c, str) for c in row["row_data"])
    assert "." in row["row_data"][4]
