"""Cross-operator integration: the pipeline stages must agree with each
other, not just each with its own oracle — keep decisions, drop
reasons, token budgets, and mix accounting are different views of ONE
corpus and must reconcile row-for-row."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_filter_pipeline_agrees_with_exact_dedup(spark):
    """filter_pipeline's 'duplicate' verdicts must be exactly the
    exact-dedup keep-list's drops (restricted to the original corpus —
    the dedup module's augmented copies use ids >= DUP_OFFSET and can
    never steal canonical status from an original), modulo gate ordering:
    a dropped duplicate that is also too short reports 'too_short'."""
    from task_hive_spark.operators.dedup import DUP_OFFSET, dd_exact_keep_list
    from task_hive_spark.operators.textops import FILTER_MIN_TOKENS, txt_filter_pipeline

    fp = {r["doc_id"]: r for r in txt_filter_pipeline(spark, SF_DIR).collect()}
    keep = {
        r["doc_id"]: r["keep"]
        for r in dd_exact_keep_list(spark, SF_DIR).collect()
        if r["doc_id"] < DUP_OFFSET
    }
    assert set(fp) == set(keep)
    for doc_id, row in fp.items():
        if row["reason"] == "duplicate":
            assert not keep[doc_id], doc_id
        if not keep[doc_id] and row["n_tokens"] >= FILTER_MIN_TOKENS:
            assert row["reason"] == "duplicate", (doc_id, row["reason"])


def test_mix_accounting_conserves_corpus(spark):
    """training-mix rows must partition the corpus: per-language doc
    counts equal the raw table's, and kept + dropped reconcile."""
    from task_hive_spark.operators.textops import txt_training_mix
    from task_hive_spark.sources.fixtures import load_table

    mix = txt_training_mix(spark, SF_DIR).collect()
    raw = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {r["lang"]: r["n_docs"] for r in mix} == raw
    for r in mix:
        assert r["n_kept"] + r["n_dup_dropped"] + r["n_quality_dropped"] == r["n_docs"]


def test_sequence_pack_conserves_tokens(spark):
    """Every non-empty document's tokens land in exactly one bin: the
    bin totals must sum to the corpus token count, and doc counts to
    the non-empty corpus size."""
    from task_hive_spark.functions.text import ws_token_count
    from task_hive_spark.operators.textops import txt_sequence_pack
    from task_hive_spark.sources.fixtures import load_table

    bins = txt_sequence_pack(spark, SF_DIR).collect()
    d = load_table(spark, SF_DIR, "documents").where(F.length(F.trim("text")) > 0)
    exp = d.agg(
        F.sum(ws_token_count(F.col("text")).cast("long")).alias("toks"),
        F.count("*").alias("docs"),
    ).collect()[0]
    assert sum(r["total_tokens"] for r in bins) == exp["toks"]
    assert sum(r["n_docs"] for r in bins) == exp["docs"]


def test_aux_cache_lifecycle(spark):
    """Module-level session caches registered with materialize share the
    session_index lifecycle: dead-session keys are evicted and
    clear_indexes drops (and unpersists) a session's entries — so the
    BPE trainer's checkpointed vocab can't outlive its session."""
    from task_hive_spark import materialize as m
    from task_hive_spark.operators.textops import _BPE_MERGE_CACHE

    assert _BPE_MERGE_CACHE in m._AUX_CACHES

    fake: dict = {}
    m.register_aux_cache(fake)
    try:
        live_app = spark.sparkContext.applicationId
        probe = spark.range(1)
        fake[("app-dead-123", "sfX")] = ([1, 2], probe)
        fake[(live_app, "sfX")] = ([3], probe)

        m._evict_dead_sessions()
        assert ("app-dead-123", "sfX") not in fake, "dead session not evicted"
        assert (live_app, "sfX") in fake, "live session wrongly evicted"

        m.clear_indexes(spark)
        assert fake == {}, "clear_indexes left live-session aux entries"
    finally:
        m._AUX_CACHES.remove(fake)


def test_crawl_to_corpus_pipeline(spark, tmp_path):
    """The full crawl ingestion path composed end to end: corpus →
    boilerplate-laden HTML pages → WARC archive (distributed sink,
    per-record gzip members) → SPLIT-read with resync (4 KB ranges) →
    HTML main-content extraction → profile hash-identical to the
    source corpus. Every stage is the real operator; a leaked nav
    item, swallowed entity, digest slip or split-ownership error
    anywhere breaks the final equality."""
    import pandas as pd

    from task_hive_spark.operators.htmlextract import (
        extract_main_text,
        synth_html_page,
    )
    from task_hive_spark.sources.textfiles import _XML_TAIL, _derived, _profile
    from task_hive_spark.sources.warc import read_warc_dir_split, write_warc_dir

    d = _derived(spark, SF_DIR, _XML_TAIL)

    def render(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "text": [
                        synth_html_page(int(i), la, t)
                        for i, la, t in zip(pdf["doc_id"], pdf["lang"], pdf["text"])
                    ],
                }
            )

    pages = d.repartition(2).mapInPandas(
        render, schema="doc_id long, lang string, text string"
    )
    out = str(tmp_path / "crawl")
    n = write_warc_dir(pages, out)
    assert n == d.count() > 0

    crawled = read_warc_dir_split(spark, out, split_bytes=4096)

    def extract(batches):
        for pdf in batches:
            langs, texts = [], []
            for warc_lang, page in zip(pdf["lang"], pdf["text"]):
                html_lang, text = extract_main_text(page)
                assert html_lang == warc_lang  # URI and <html lang> agree
                langs.append(html_lang)
                texts.append(text)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "lang": langs, "text": texts}
            )

    corpus = crawled.mapInPandas(
        extract, schema="doc_id long, lang string, text string"
    )
    assert _profile(corpus).collect() == _profile(d).collect()
