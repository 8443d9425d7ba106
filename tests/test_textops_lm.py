"""LM-family text operators: TF-IDF keywords, the exact-integer bigram
LM gate, and DSIR selection.

The float-discipline contract: every cross-engine double in these
operators is either (a) absent (bigram LM — pure integer divisions), or
(b) a deterministic per-row expression whose ordering/rounding decisions
clear a measured fixture margin (TF-IDF scores, DSIR feature
log-ratios). The margin tests here pin (b): if a fixture regeneration
ever lands a score within ulp distance of a rank/floor/round boundary,
these fail loudly instead of the oracle gate failing mysteriously.
"""

from __future__ import annotations

import math

import pytest

from task_hive_spark.operators import textops
from task_hive_spark.plans.oracle import duckdb_conn

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _tfidf_scores(sf: str) -> list[tuple]:
    con = duckdb_conn(sf)
    return con.execute(
        """
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
          FROM documents WHERE length(trim(text)) > 0
        ),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks)
        SELECT doc_id, tok, tf, df, n_docs FROM tf JOIN dfreq USING (tok), nd
        """
    ).fetchall()


@pytest.mark.parametrize("sf", SFS)
def test_tfidf_rank_and_round_margins(sf):
    """Within every doc, consecutive DISTINCT scores are separated by
    far more than cross-engine ln ulp noise (so the rank-3 cutoff can't
    flip), and no score sits at a ROUND(·, 6) half-way boundary."""
    per_doc: dict[int, list[float]] = {}
    for doc_id, _tok, tf, df, n in _tfidf_scores(sf):
        score = tf * (math.log((n + 1.0) / (df + 1.0)) + 1.0)
        per_doc.setdefault(doc_id, []).append(score)
        # ROUND(score, 6) margin: distance from the .5 rounding boundary
        frac = (score * 1e6) % 1.0
        assert abs(frac - 0.5) > 1e-6, (doc_id, _tok, score)
    for doc_id, scores in per_doc.items():
        scores.sort(reverse=True)
        for a, b in zip(scores, scores[1:]):
            if a != b:  # exact ties break on term order in both engines
                assert (a - b) / max(a, 1.0) > 1e-9, (doc_id, a, b)


@pytest.mark.parametrize("sf", SFS)
def test_dsir_logratio_floor_margin(sf):
    """Every hashed-bucket log-ratio lands well inside its 1e-6
    quantization cell: FLOOR(ln(r)·1e6) agrees across engines as long
    as their ln differs by less than the asserted margin. |ln r| < 1
    here, so a 2-ulp library divergence is < 5e-10 quantization units;
    the 1e-6-unit margin leaves three orders of magnitude."""
    con = duckdb_conn(sf)
    rows = con.execute(
        f"""
        WITH {textops._HASHED_FEATS_CTES.strip()}
        SELECT f, SUM(n_f) AS cr,
               SUM(CASE WHEN lang = 'en' THEN n_f ELSE 0 END) AS ct
        FROM feats GROUP BY f
        """
    ).fetchall()
    assert rows
    tr = sum(r[1] for r in rows)
    tt = sum(r[2] for r in rows)
    b = textops.DSIR_BUCKETS
    for _f, cr, ct in rows:
        v = math.log(((ct + 1) * (tr + b)) / ((cr + 1) * (tt + b))) * 1e6
        frac = v - math.floor(v)
        assert 1e-6 < frac < 1 - 1e-6, (_f, v)


@pytest.mark.parametrize("sf", SFS)
def test_classifier_weight_floor_margins(sf):
    """Same pin as the DSIR test, for the NB student's B class-ratio
    weights and the prior-odds term: every ln lands well inside its
    1e-6 quantization cell."""
    con = duckdb_conn(sf)
    b = textops.DSIR_BUCKETS
    rows = con.execute(
        f"""
        WITH lab AS (
          SELECT doc_id, keep FROM ( {textops.ORACLES['txt_unigram_logprob']} ) t
        ),
        {textops._HASHED_FEATS_CTES.strip()}
        SELECT f.f,
               SUM(CASE WHEN l.keep THEN f.n_f ELSE 0 END) AS ck,
               SUM(CASE WHEN l.keep THEN 0 ELSE f.n_f END) AS cd
        FROM feats f JOIN lab l USING (doc_id) GROUP BY 1
        """
    ).fetchall()
    assert rows
    tk = sum(r[1] for r in rows)
    td = sum(r[2] for r in rows)
    vals = [
        math.log(((ck + 1) * (td + b)) / ((cd + 1) * (tk + b))) * 1e6
        for _f, ck, cd in rows
    ]
    n_keep = con.execute(
        f"SELECT SUM(CASE WHEN keep THEN 1 ELSE 0 END),"
        f" SUM(CASE WHEN keep THEN 0 ELSE 1 END)"
        f" FROM ( {textops.ORACLES['txt_unigram_logprob']} ) t"
    ).fetchone()
    vals.append(math.log(n_keep[0] / n_keep[1]) * 1e6)
    for v in vals:
        frac = v - math.floor(v)
        assert 1e-6 < frac < 1 - 1e-6, v


@pytest.mark.parametrize("sf", SFS)
def test_classifier_teacher_label_margins(sf):
    """One flipped teacher label reshapes every NB weight, so the
    teacher's own float boundary needs a pin too: each doc's raw
    avg-NLL must sit well clear of its ROUND(·, 6) half-way point (the
    only place a cross-engine summation-order ulp could flip keep).
    Worst-case fold-order divergence of a ≤100-term double average at
    |avg| ≈ 3.5 is (n−1)·eps·|avg| ≈ 4e-14 ≈ 4e-8 rounding cells; the
    1e-6-cell margin leaves ~25×."""
    con = duckdb_conn(sf)
    vals = con.execute(
        """
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
          FROM documents WHERE length(trim(text)) > 0
        ),
        vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
        tot AS (SELECT SUM(cnt) AS n_total FROM vocab)
        SELECT AVG(-ln(cnt * 1.0 / n_total)) AS avg_nll
        FROM toks JOIN vocab USING (tok), tot
        GROUP BY doc_id
        """
    ).fetchall()
    assert vals
    for (v,) in vals:
        frac = (v * 1e6) % 1.0
        assert abs(frac - 0.5) > 1e-6, v


def test_classifier_beats_base_rate(spark):
    """The distilled student must actually learn the teacher: agreement
    well above the majority-class base rate (measured 0.79 at sf0.001;
    floor 0.70), and the integer decision margin must be non-degenerate
    (no doc scores exactly 0)."""
    rows = textops.txt_quality_classifier(spark, "/root/testdata/sf0.001").collect()
    assert rows
    agree = sum(r["agrees"] for r in rows) / len(rows)
    pos = sum(r["label"] for r in rows)
    base = max(pos, len(rows) - pos) / len(rows)
    assert agree >= 0.70, agree
    assert agree > base + 0.1, (agree, base)
    assert all(r["score_micro"] != 0 for r in rows)


def test_bigram_lm_is_exact_and_bounded(spark):
    """The score path carries no floats: every per-pair likelihood is a
    pair of positive integer divisions, so avg_p_micro is an exact
    integer in [0, 1e6] and n_pairs is exactly ntok − 1."""
    sf = "/root/testdata/sf0.001"
    rows = textops.txt_bigram_lm_score(spark, sf).collect()
    assert rows
    ntok = {
        r["doc_id"]: r["ntok"]
        for r in textops.token_index(spark, sf).select("doc_id", "ntok").collect()
    }
    for r in rows:
        assert 0 <= r["avg_p_micro"] <= 1_000_000
        assert r["n_pairs"] == ntok[r["doc_id"]] - 1
    keeps = {r["keep"] for r in rows}
    assert keeps == {True, False}, "LM_KEEP_MIN must split the corpus"


@pytest.mark.parametrize("sf", SFS)
def test_temperature_mix_margins_and_flattening(sf):
    """The α-sampling outputs: round-6 boundaries clear a margin ≫ the
    cross-engine pow/division ulp (the only float surface), and the
    temperature distribution actually flattens — the rarest language is
    oversampled (factor > 1), the most common undersampled (< 1), and
    the temperature shares still sum to 1."""
    con = duckdb_conn(sf)
    rows = con.execute(
        textops.ORACLES["txt_temperature_mix"]
        .replace("ROUND(share_raw, 6)", "share_raw")
        .replace("ROUND(pow_raw / z, 6)", "pow_raw / z")
        .replace("ROUND((pow_raw / z) / share_raw, 6)", "(pow_raw / z) / share_raw")
    ).fetchall()
    assert rows
    for _lang, _n, nat, temp, over in rows:
        for v in (nat, temp, over):
            frac = (v * 1e6) % 1.0
            assert abs(frac - 0.5) > 1e-6, (_lang, v)
    by_nat = sorted(rows, key=lambda r: r[2])
    assert by_nat[0][4] > 1.0 and by_nat[-1][4] < 1.0
    assert abs(sum(r[3] for r in rows) - 1.0) < 1e-12


def test_dsir_selects_target_like_docs(spark):
    """Directional sanity: the DSIR top-K is enriched in the target
    domain (lang='en') relative to the corpus base rate — the whole
    point of importance weighting toward a target distribution."""
    sf = "/root/testdata/sf0.001"
    sel = textops.txt_dsir_sample(spark, sf).collect()
    assert len(sel) == textops.DSIR_K
    assert [r["rank"] for r in sel] == list(range(1, textops.DSIR_K + 1))
    en_sel = sum(r["lang"] == "en" for r in sel) / len(sel)
    stats = (
        textops.doc_stats(spark, sf)
        .groupby()
        .agg({"doc_id": "count"})
        .collect()[0][0]
    )
    en_all = (
        textops.doc_stats(spark, sf).where("lang = 'en'").count() / stats
    )
    assert en_sel > en_all, (en_sel, en_all)
