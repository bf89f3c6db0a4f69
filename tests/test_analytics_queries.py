"""Round-5 analytics extensions: invariants at smoke scale (the oracle
hash-match itself runs via tools/check_correctness.py at SF_ORACLE)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proyecto_gasto_publico_etl_per__spark.plans import analytics_queries as A

from conftest import SF_SMOKE


def test_dq_rules_fixed_report_shape(spark):
    rows = {
        r["rule"]: r for r in A.dq_rule_violations(spark, SF_SMOKE).collect()
    }
    assert len(rows) == 9
    for r in rows.values():
        assert 0 <= r["n_violations"] <= r["n_checked"]
        if r["n_checked"]:
            assert r["violation_rate"] == pytest.approx(
                r["n_violations"] / r["n_checked"]
            )
    # referential integrity holds on the generated data
    assert rows["lineitem_orphan_orderkey"]["n_violations"] == 0


def test_table_profile_covers_all_columns(spark):
    out = A.table_profile(spark, SF_SMOKE).collect()
    assert {r["column_name"] for r in out} == set(A._PROFILE_COLS)
    for r in out:
        assert r["n_distinct"] <= r["n_rows"]
        assert 0.0 <= r["null_frac"] <= 1.0


def test_editdist_pairs_are_blocked_and_bounded(spark):
    out = A.editdist_neardup(spark, SF_SMOKE)
    rows = out.collect()
    assert all(r["doc_a"] < r["doc_b"] for r in rows)
    assert all(0 <= r["edit_dist"] <= A.EDIT_T for r in rows)


def test_fuzzy_dim_match_same_nation_same_length(spark):
    rows = A.fuzzy_dim_match(spark, SF_SMOKE).collect()
    for r in rows:
        assert len(r["name_a"]) == len(r["name_b"])
        assert r["edit_dist"] <= 2
        assert r["suppkey_a"] < r["suppkey_b"]


def test_pmi_lift_ranked_and_positive(spark):
    rows = A.pmi_bigram_lift(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 50
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    assert all(r["n_ab"] >= 5 for r in rows)


def test_token_entropy_bounds(spark):
    """0 ≤ H ≤ log2(n_distinct) (uniform maximizes entropy)."""
    import math

    rows = A.token_entropy(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        h = r["entropy_micro"] / 1e6
        assert -1e-6 <= h <= math.log2(max(r["n_distinct"], 1)) + 1e-3
        assert r["n_distinct"] <= r["n_tokens"]


def test_zipf_slope_negative(spark):
    row = A.zipf_slope(spark, SF_SMOKE).collect()[0]
    assert row["n_ranks"] >= 2
    assert row["slope"] < 0  # frequency decreases with rank by construction


def test_langid_confusion_fracs_sum_to_one(spark):
    rows = A.langid_confusion(spark, SF_SMOKE).collect()
    by_lang: dict[str, float] = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0.0) + r["frac"]
    for lang, total in by_lang.items():
        assert total == pytest.approx(1.0), lang


def test_boilerplate_removal_marks_repeated_lines(spark):
    df = spark.createDataFrame(
        [
            (1, "shared header line unique one alpha"),
            (2, "shared header line unique two beta"),
            (3, "shared header line unique three gamma"),
            (4, "totally different text here now folks"),
        ],
        "doc_id BIGINT, text STRING",
    )
    import proyecto_gasto_publico_etl_per__spark.plans.analytics_queries as mod
    from proyecto_gasto_publico_etl_per__spark.operators.dedup import _tokens

    # inline the same pipeline over a fixture corpus: the first 3-token
    # line is shared by 3 docs ≥ BOILER_DF, so it must be dropped
    toks = df.select(F.col("doc_id").alias("doc"), _tokens("text").alias("toks"))
    nwin = F.floor(F.size("toks") / 3).cast("int")
    lines = toks.where(F.size("toks") >= 3).select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nwin - 1),
                lambda i: F.concat(
                    F.element_at(F.col("toks"), i * 3 + 1),
                    F.lit(" "),
                    F.element_at(F.col("toks"), i * 3 + 2),
                    F.lit(" "),
                    F.element_at(F.col("toks"), i * 3 + 3),
                ),
            )
        ).alias("pos", "line"),
    )
    ldf = lines.groupBy("line").agg(F.count_distinct("doc").alias("df"))
    boiler = {r["line"] for r in ldf.where(F.col("df") >= mod.BOILER_DF).collect()}
    assert boiler == {"shared header line"}

    out = {r["doc_id"]: r for r in A.boilerplate_removal(spark, SF_SMOKE).collect()}
    assert out
    for r in out.values():
        assert 0 <= r["n_boiler"] <= r["n_lines"]
        assert len(r["kept_hash"]) == 16


def test_containment_direction_asymmetric(spark):
    rows = A.containment_pairs(spark, SF_SMOKE).collect()
    for r in rows:
        assert r["n_common"] <= r["n_sh_sub"]
        assert r["containment"] >= A.CONTAIN_T


def test_dup_token_inflation_consistent(spark):
    row = A.dup_token_inflation(spark, SF_SMOKE).collect()[0]
    assert 0 <= row["dup_tokens"] <= row["total_tokens"]
    assert row["n_dup_docs"] <= row["n_docs"]
    assert row["inflation"] == pytest.approx(
        row["dup_tokens"] / row["total_tokens"]
    )


def test_rolling_distinct_users_window_superset(spark):
    """Each day's trailing-7d count ≥ that single day's distinct count."""
    from proyecto_gasto_publico_etl_per__spark.sources.tables import load_table

    daily = {
        r["day"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .select(
            F.to_date(F.col("ts").cast("timestamp_ntz")).alias("day"), "user_id"
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    rolling = {
        r["cover_day"]: r["n_active_7d"]
        for r in A.rolling_distinct_users(spark, SF_SMOKE).collect()
    }
    assert daily
    for day, n in daily.items():
        assert rolling[day] >= n


def test_bpe_merge_step_pairs_are_char_bigrams(spark):
    rows = A.bpe_merge_step(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(len(r["pair"]) == 2 for r in rows)


def test_ngram_novelty_first_doc_is_fully_novel(spark):
    rows = sorted(
        A.ngram_novelty(spark, SF_SMOKE).collect(), key=lambda r: r["doc_id"]
    )
    assert rows
    first = rows[0]
    assert first["n_novel"] == first["n_shingles"]  # nothing precedes it
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_shingles"]


def test_corpus_quality_by_source_rates(spark):
    rows = A.corpus_quality_by_source(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_quality_ok"] <= r["n_docs"]
        assert 0.0 <= r["ok_rate"] <= 1.0


def test_doclen_percentiles_ordered(spark):
    rows = A.doclen_percentiles_by_source(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["p50_tokens"] <= r["p90_tokens"] <= r["max_tokens"]


def test_sq8_codes_bounded_and_errors_small(spark):
    rows = A.sq8_encode_audit(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_dims"] == 64
        assert 0 <= r["code_sum"] <= 255 * 64
        # max per-dim error is (scale/255/2)^2; scales are O(1) for the
        # synthetic unit-ish embeddings, so total error stays tiny
        assert 0 <= r["recon_err_q9"] < 10_000_000  # < 0.01 total sq err


def test_daily_anomalies_exceed_two_sigma(spark):
    rows = A.daily_anomalies(spark, SF_SMOKE).collect()
    for r in rows:
        assert r["zsq"] >= 4.0


def test_rfm_scores_quintiles(spark):
    rows = A.rfm_segments(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["recency_days"] >= 0


def test_basket_pairs_lift_symmetric_support(spark):
    rows = A.basket_brand_pairs(spark, SF_SMOKE).collect()
    for r in rows:
        assert r["brand_a"] < r["brand_b"]
        assert r["n_ab"] <= min(r["n_a"], r["n_b"])
        assert r["lift"] > 0


def test_hhi_bounds(spark):
    rows = A.hhi_concentration(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # 1/n <= HHI <= 1 for n suppliers
        assert 1.0 / r["n_suppliers"] - 1e-9 <= r["hhi"] <= 1.0 + 1e-9


def test_kfold_balanced_and_stable(spark):
    rows = A.kfold_assign(spark, SF_SMOKE).collect()
    folds = {}
    for r in rows:
        assert 0 <= r["fold"] <= 4
        folds[r["fold"]] = folds.get(r["fold"], 0) + 1
    assert len(folds) == 5  # every fold populated at 500 docs
    # rough balance: no fold more than 2x the smallest
    assert max(folds.values()) <= 2 * min(folds.values())
    again = {r["doc_id"]: r["fold"] for r in A.kfold_assign(spark, SF_SMOKE).collect()}
    assert all(again[r["doc_id"]] == r["fold"] for r in rows)  # stable


def test_subsample_curve_monotone(spark):
    rows = sorted(
        A.subsample_curve(spark, SF_SMOKE).collect(), key=lambda r: r["decile"]
    )
    assert len(rows) == 10
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_docs_cum"] >= prev["n_docs_cum"]
        assert cur["n_tokens_cum"] >= prev["n_tokens_cum"]
        assert cur["vocab_cum"] >= prev["vocab_cum"]
    # full-corpus sanity: decile 9 covers everything
    from proyecto_gasto_publico_etl_per__spark.sources.tables import load_table

    assert rows[-1]["n_docs_cum"] == load_table(spark, SF_SMOKE, "documents").count()


def test_user_lifetime_invariants(spark):
    rows = A.events_user_lifetime(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["first_seen"] <= r["last_seen"]
        assert 1 <= r["active_days"] <= r["lifetime_days"] + 1
        assert r["n_events"] >= r["active_days"]


def test_basket_histogram_sums_to_one(spark):
    import pytest as _pt

    rows = A.basket_size_histogram(spark, SF_SMOKE).collect()
    assert sum(r["frac"] for r in rows) == _pt.approx(1.0)
    assert sum(r["n_orders"] for r in rows) > 0
