"""Composition invariants for the stratified split and the packed
tokenized dataset — conservation laws the per-query oracle hash can't
state (it checks the output, not its relation to the inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from task_hive_spark.operators.textops import (
    txt_bpe_tokenize,
    txt_filter_pipeline,
    txt_stratified_split,
    txt_tokenized_dataset,
)
from task_hive_spark.sources.fixtures import load_table


def test_stratified_split_partitions_corpus(spark, sf_dir):
    rows = txt_stratified_split(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    # exactly a partition: counts and the doc_id checksum both conserve
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["sum_doc_id"] for r in rows) == (
        docs.agg(F.sum("doc_id")).collect()[0][0]
    )
    per_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    by_lang: dict[str, int] = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["n_docs"]
    assert by_lang == per_lang
    # global proportions near 90/5/5 (hash-uniformity; generous bound
    # for the 500-doc fixture: binomial 3σ on 5% of 500 is ~±3%)
    train = sum(r["n_docs"] for r in rows if r["split"] == "train")
    assert 0.82 * n_docs <= train <= 0.97 * n_docs


def test_tokenized_dataset_writer_roundtrip(spark, sf_dir, tmp_path):
    import json
    import os

    from task_hive_spark.operators.textops import materialize_tokenized_dataset

    out = str(tmp_path / "ds")
    summary = materialize_tokenized_dataset(spark, sf_dir, out)[0]
    bins = spark.read.parquet(os.path.join(out, "bins"))
    assert bins.count() == summary["n_bins"]
    totals = bins.agg(
        F.sum("n_docs").alias("d"), F.sum("n_bpe_tokens").alias("t")
    ).collect()[0]
    assert totals["d"] == summary["n_docs"]
    assert totals["t"] == summary["n_bpe_tokens"]
    merges = spark.read.parquet(os.path.join(out, "merges"))
    assert merges.count() == summary["bpe_merges"]
    with open(os.path.join(out, "summary.json")) as f:
        assert json.load(f)[0] == summary


def test_tokenized_dataset_conserves_tokens_and_order(spark, sf_dir):
    bins = txt_tokenized_dataset(spark, sf_dir).collect()
    kept = set(
        r["doc_id"]
        for r in txt_filter_pipeline(spark, sf_dir).where("keep").collect()
    )
    per_doc = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in txt_bpe_tokenize(spark, sf_dir).collect()
        if r["doc_id"] in kept
    }
    # conservation: every kept doc's BPE tokens land in exactly one bin
    assert sum(r["n_docs"] for r in bins) == len(kept)
    assert sum(r["n_bpe_tokens"] for r in bins) == sum(per_doc.values())
    # bins tile the kept corpus in doc_id order: spans don't overlap
    spans = [(r["bin_id"], r["first_doc_id"], r["last_doc_id"]) for r in bins]
    assert spans == sorted(spans)
    for (_, _, last_prev), (_, first_next, _) in zip(spans, spans[1:]):
        assert last_prev < first_next
    # hand-check the first bin: its docs are the first kept docs whose
    # running BPE-token total stays under SEQ_LEN (bin = START offset)
    from task_hive_spark.operators.textops import SEQ_LEN

    ordered = sorted(kept)
    run, expect_first_bin = 0, []
    for d in ordered:
        if run // SEQ_LEN != 0:
            break
        expect_first_bin.append(d)
        run += per_doc[d]
    b0 = next(r for r in bins if r["bin_id"] == 0)
    assert b0["n_docs"] == len(expect_first_bin)
    assert b0["first_doc_id"] == expect_first_bin[0]
    assert b0["last_doc_id"] == expect_first_bin[-1]
