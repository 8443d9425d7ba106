"""Edge cases for the text column functions (functions/text.py):
empty strings, sub-n-token documents, hash-lane independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from task_hive_spark.functions import text as T


def _vals(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text STRING")


def test_token_count_empty_and_whitespace(spark):
    df = _vals(spark, ["", "   ", "one", "two words", "a  b\t c\nd"])
    rows = df.select(T.ws_token_count(F.col("text")).alias("n")).collect()
    assert [r.n for r in rows] == [0, 0, 1, 2, 4]


def test_shingles_short_docs_yield_whole_text(spark):
    df = _vals(spark, ["", "one", "one two", "one two three", "a b c d"])
    rows = df.select(T.shingles(F.col("text"), 3).alias("g")).collect()
    assert rows[1].g == ["one"]
    assert rows[2].g == ["one two"]  # < 3 tokens -> one truncated shingle
    assert rows[3].g == ["one two three"]
    assert rows[4].g == ["a b c", "b c d"]


def test_quality_score_bounds(spark):
    df = _vals(spark, ["", "x", "!!!???!!!", "the quick brown fox " * 20])
    rows = df.select(T.quality_score(F.col("text")).alias("q")).collect()
    for r in rows:
        assert 0.0 <= r.q <= 1.0


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = _vals(spark, ["Hello   World", "hello world", "  hello\tworld  "])
    rows = df.select(T.fingerprint(F.col("text")).alias("fp")).collect()
    assert rows[0].fp == rows[1].fp == rows[2].fp


def test_portable_hash_lanes_are_independent(spark):
    df = _vals(spark, ["abc", "def", "ghi"])
    rows = df.select(
        T.portable_hash64(F.col("text"), seed="s-", offset=1).alias("lo"),
        T.portable_hash64(F.col("text"), seed="s-", offset=17).alias("hi"),
    ).collect()
    for r in rows:
        assert r.lo != r.hi
        assert 0 <= r.lo < 2**60 and 0 <= r.hi < 2**60
