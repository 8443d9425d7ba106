"""Cleaned-corpus materializer (operators/pipeline.py).

The oracle gate proves Spark and DuckDB agree; these tests prove the
stages do what the papers say:

* span excision matches an INDEPENDENT pure-Python re-derivation over
  the full survivor set (the Lee et al. apply-step's first-occurrence
  retention, island merge and rebuild — the genuinely new logic);
* the boilerplate hosts behave as designed (first surviving host keeps
  the shared passage, every other one is cut down to its filler);
* the temperature quantization boundary margins are DERIVED-safe (the
  test_textops_lm.py method: assert distance from every floor/compare
  boundary far exceeds the worst plausible cross-engine divergence);
* materialize_clean_corpus writes a parquet corpus + accounting that
  round-trip to the query results.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import functions as F

import pytest

from task_hive_spark.operators import pipeline as P


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    # session-indexed inside _stage_frames: the eager CC fixpoint and
    # the excision pass run once per session, shared by all tests
    return P._stage_frames(spark, sf_dir)


@pytest.fixture(scope="module")
def near(frames):
    return frames["near"]


@pytest.fixture(scope="module")
def clean(frames):
    return frames["clean"]


def test_span_excision_matches_pure_python(spark, sf_dir, near, clean):
    """Re-derive stage 4 from the stage-3 survivor texts with plain
    Python dicts and compare EVERY doc's cleaned text: duplicated
    SPAN_L-token windows keep their (min doc_id, min pos) occurrence,
    all other occurrences' token ranges are cut, docs falling under
    FILTER_MIN_TOKENS are dropped."""
    texts = {r["doc_id"]: r["text"] for r in near.collect()}

    occ: dict[tuple, list[tuple[int, int]]] = {}
    toks_low = {d: t.strip().lower().split() for d, t in texts.items()}
    L = P.SPAN_L
    for d in sorted(toks_low):
        t = toks_low[d]
        for p in range(len(t) - L + 1):
            occ.setdefault(tuple(t[p : p + L]), []).append((d, p))
    cover: dict[int, set[int]] = {}
    for win, places in occ.items():
        if len(places) > 1:
            for d, p in sorted(places)[1:]:
                cover.setdefault(d, set()).update(range(p, p + L))
    expected = {}
    for d, text in texts.items():
        orig = text.strip().split()
        kept = [tok for i, tok in enumerate(orig) if i not in cover.get(d, set())]
        if len(kept) >= P.FILTER_MIN_TOKENS:
            expected[d] = (" ".join(kept), len(kept))

    got = {
        r["doc_id"]: (r["text_clean"], r["n_tokens_clean"])
        for r in clean.collect()
    }
    assert got == expected
    # the stage is value-bearing on this fixture: something was cut
    assert any(d in cover for d in got), "no spans excised — fixture degenerate"


def test_boilerplate_hosts_lose_the_passage(spark, sf_dir, near, clean):
    """Every surviving boilerplate host except the first keeps ONLY its
    16 unique filler tokens; the first (min doc_id) surviving host keeps
    the full passage."""
    hosts = sorted(
        r["doc_id"]
        for r in near.where(F.col("doc_id") >= P.BOILER_OFFSET).collect()
    )
    assert len(hosts) >= 3, "fixture must keep several hosts"
    cleaned = {
        r["doc_id"]: r
        for r in clean.where(F.col("doc_id") >= P.BOILER_OFFSET).collect()
    }
    n_passage = len(P._BOILER_PASSAGE.split())
    first, rest = hosts[0], hosts[1:]
    assert cleaned[first]["text_clean"].startswith(P._BOILER_PASSAGE)
    assert cleaned[first]["n_tokens_clean"] == n_passage + 16
    for h in rest:
        row = cleaned[h]
        assert row["n_tokens_clean"] == 16, f"host {h} kept passage tokens"
        assert P._BOILER_PASSAGE.split()[0] not in row["text_clean"].split()


def test_temperature_quantization_margins(spark, sf_dir, clean):
    """Derived-margin method: the mix factor is floor-quantized at
    f·1e6; a cross-engine flip needs f·1e6 within ~1e-9 of an integer
    (ulp-level pow/sum divergence). Assert every language's factor sits
    ≥ 1e-3 from the nearest boundary — 10^6x the worst divergence."""
    from task_hive_spark.sources.fixtures import load_table

    langs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    }
    prof: dict[str, int] = {}
    for r in clean.collect():
        lg = langs[r["doc_id"] % P.DUP_OFFSET]
        prof[lg] = prof.get(lg, 0) + r["n_tokens_clean"]
    # recompute the factor in python (same formula) and check margins
    t_all = sum(prof.values())
    pows = {lg: (tok / t_all) ** P.MIX_ALPHA for lg, tok in prof.items()}
    z = sum(pows[lg] for lg in sorted(pows))
    for lg, tok in prof.items():
        f = pows[lg] / z / (tok / t_all) * 1_000_000.0
        margin = abs(f - round(f))
        assert margin > 1e-3, f"{lg}: f_micro boundary margin {margin}"


def test_stats_accounting_is_monotone_and_consistent(spark, sf_dir):
    rows = {r["stage"]: r for r in P.txt_clean_corpus_stats(spark, sf_dir).collect()}
    assert [rows[s]["stage_no"] for s in
            ["corpus", "gates", "exact_dedup", "near_dedup",
             "span_excision", "temperature_sample"]] == [0, 1, 2, 3, 4, 5]
    # docs can only shrink until resampling; tokens shrink until stage 4
    assert (
        rows["corpus"]["n_docs"]
        > rows["gates"]["n_docs"]
        > rows["exact_dedup"]["n_docs"]
        > rows["near_dedup"]["n_docs"]
        >= rows["span_excision"]["n_docs"]
        >= rows["temperature_sample"]["n_docs"]
    )
    assert rows["span_excision"]["n_tokens"] < rows["near_dedup"]["n_tokens"]
    # final corpus aggregates must equal the stage-5 accounting row
    final = P.txt_clean_corpus(spark, sf_dir)
    agg = final.agg(
        F.count("*").alias("d"),
        F.sum(F.col("n_copies").cast("long") * F.col("n_tokens_clean")).alias("t"),
    ).collect()[0]
    assert agg["d"] == rows["temperature_sample"]["n_docs"]
    assert agg["t"] == rows["temperature_sample"]["n_tokens"]


def test_materialize_writes_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "clean")
    stats = P.materialize_clean_corpus(spark, sf_dir, out)
    assert [s["stage"] for s in stats][-1] == "temperature_sample"
    with open(os.path.join(out, "accounting.json")) as f:
        assert json.load(f) == stats
    back = spark.read.parquet(os.path.join(out, "corpus"))
    want = P.txt_clean_corpus(spark, sf_dir)
    cols = want.columns
    assert sorted(tuple(r) for r in back.select(*cols).collect()) == sorted(
        tuple(r) for r in want.collect()
    )
