"""Mathematical invariants for the round-4 statistics/IR/graph wave
(session 2): properties that must hold for ANY input data, so they
catch refactors the oracle hash-gate would re-baseline into.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from quantum_rag_data_pipeline_spark.queries import QUERIES


def test_record_linkage_match_band_is_pure(spark, sf_dir):
    rows = {r.decision: r for r in QUERIES["record_linkage_fellegi_sunter"](spark, sf_dir).collect()}
    assert set(rows) <= {"match", "possible", "non_match"}
    for r in rows.values():
        assert 0 <= r.n_true_pairs <= r.n_pairs
    # a cross-identity pair can never agree on the full name, so it can
    # never clear the 12.0 match threshold: the match band is 100% true
    if "match" in rows:
        assert rows["match"].n_true_pairs == rows["match"].n_pairs
    if "non_match" in rows:
        assert rows["non_match"].n_true_pairs == 0


def test_l_diversity_l_bounded_by_k(spark, sf_dir):
    for r in QUERIES["l_diversity_audit"](spark, sf_dir).collect():
        assert 1 <= r.l_distinct <= r.k_size
        assert r.meets_k5 == (r.k_size >= 5)
        assert r.meets_l3 == (r.l_distinct >= 3)


def test_mutual_information_bounds(spark, sf_dir):
    r = QUERIES["mutual_information_features"](spark, sf_dir).first()
    assert r.mi_nats >= -1e-9
    assert r.mi_nats <= min(r.h_x, r.h_y) + 1e-6
    assert -1e-9 <= r.nmi_sqrt <= 1.0 + 1e-6


def test_spearman_rho_in_range(spark, sf_dir):
    for r in QUERIES["spearman_rank_correlation"](spark, sf_dir).collect():
        assert abs(r.spearman_rho) <= 1.0 + 1e-9
        # Σd² is bounded by the anti-sorted permutation: n(n²-1)/3
        assert 0 <= r.sum_d2 <= r.n * (r.n * r.n - 1) / 3 + 1e-9


def test_chi_square_nonnegative_and_v_unit(spark, sf_dir):
    r = QUERIES["chi_square_independence"](spark, sf_dir).first()
    assert r.chi2 >= 0.0
    assert 0.0 <= r.cramers_v <= 1.0 + 1e-9
    assert r.dof >= 1


def test_decision_stump_partition_counts(spark, sf_dir):
    r = QUERIES["decision_stump_best_split"](spark, sf_dir).first()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(F.col("value").isNotNull())
    total = ev.count()
    clicks = ev.filter(F.col("event_type") == "click").count()
    assert r.n_left + r.n_right == total
    assert r.pos_left + r.pos_right == clicks
    assert 0.0 <= r.weighted_gini <= 0.5 + 1e-9  # binary Gini max is 0.5


def test_holt_brown_forecast_identity(spark, sf_dir):
    r = QUERIES["holt_brown_double_smoothing"](spark, sf_dir).first()
    assert abs(r.forecast_h1 - (r.level + r.trend)) <= 2e-6
    assert abs(r.forecast_h7 - (r.level + 7 * r.trend)) <= 2e-5
    assert r.s1 > 0 and r.s2 > 0


def test_mmr_picks_distinct_and_first_is_pure_relevance(spark, sf_dir):
    rows = sorted(QUERIES["mmr_diversified_rerank"](spark, sf_dir).collect(),
                  key=lambda r: r.step)
    assert [r.step for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in rows}) == 5
    # step 1 pays no diversity penalty: mmr == λ·rel exactly
    assert abs(rows[0].mmr_score - 0.7 * rows[0].relevance) <= 2e-6
    # later steps: mmr <= λ·rel + (1-λ)·1 (cosine penalty is >= -1)
    for r in rows[1:]:
        assert r.mmr_score <= 0.7 * r.relevance + 0.3 + 1e-9


def test_mmr_restores_aqe_conf(spark, sf_dir):
    """Round 8 scoped AQE off for the five tiny greedy-step compiles;
    the caller's session must never observe the change — same pin as
    drain_available_now's state-partition scoping. Covers both the
    normal path and the exception path through the finally."""
    from unittest import mock

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    QUERIES["mmr_diversified_rerank"](spark, sf_dir)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # exception inside the scoped block still restores
    with mock.patch(
        "pyspark.sql.DataFrame.unionByName", side_effect=RuntimeError("boom")
    ):
        try:
            QUERIES["mmr_diversified_rerank"](spark, sf_dir)
        except RuntimeError:
            pass
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_naive_bayes_confusion_covers_test_split(spark, sf_dir):
    rows = QUERIES["naive_bayes_lang_classifier"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    n_test = docs.filter(F.col("doc_id") % 2 == 1).count()
    assert sum(r.n_docs for r in rows) == n_test
    assert {r.true_lang for r in rows} <= langs
    assert {r.pred_lang for r in rows} <= langs


def test_hits_authorities_normalized(spark, sf_dir):
    rows = QUERIES["hits_hubs_authorities"](spark, sf_dir).collect()
    assert len(rows) <= 15
    for r in rows:
        assert 0.0 < r.authority_permille <= 1000.0


def test_query_likelihood_scores_are_log_probs(spark, sf_dir):
    rows = QUERIES["query_likelihood_dirichlet"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.ql_log_score < 0.0  # log of a probability product


def test_rocchio_topk_shape(spark, sf_dir):
    rows = QUERIES["rocchio_relevance_feedback"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    assert len({r.vec_id for r in rows}) == len(rows)
    assert 0 not in {r.vec_id for r in rows}  # query never retrieves itself


def test_fano_and_burstiness_ranges(spark, sf_dir):
    for r in QUERIES["burstiness_fano_factor"](spark, sf_dir).collect():
        assert r.fano_factor >= 0.0
        assert -1.0 - 1e-9 <= r.burstiness_b <= 1.0 + 1e-9
        assert r.n_nonzero <= r.n_hours


def test_wow_growth_first_week_is_null(spark, sf_dir):
    rows = sorted(QUERIES["period_over_period_growth"](spark, sf_dir).collect(),
                  key=lambda r: r.week_start)
    assert rows[0].wow_growth_pct is None
    for r in rows:
        assert r.revenue > 0
        assert r.rolling_4wk_avg > 0


def test_mann_kendall_pair_count_identity(spark, sf_dir):
    r = QUERIES["mann_kendall_theil_sen"](spark, sf_dir).first()
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    assert abs(r.mk_s) <= r.n_pairs
    assert r.var_s > 0


def test_kendall_tau_bounds(spark, sf_dir):
    for r in QUERIES["kendall_tau_blocked"](spark, sf_dir).collect():
        assert abs(r.kendall_tau_b) <= 1.0 + 1e-9
        assert r.concordant + r.discordant <= r.n_pairs


def test_treatment_effect_strata_partition_users(spark, sf_dir):
    rows = QUERIES["stratified_treatment_effect"](spark, sf_dir).collect()
    assert len(rows) == 3
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_users
    for r in rows:
        assert 0.0 <= r.propensity <= 1.0


def test_quantile_normalization_equalizes_marginals(spark, sf_dir):
    rows = QUERIES["quantile_normalization"](spark, sf_dir).collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.normalized)
    dists = [sorted(v) for v in by_type.values()]
    # after quantile normalization every series has the same marginal
    # (up to series-length differences, which the ref-mean absorbs)
    n = min(len(d) for d in dists)
    for d in dists[1:]:
        assert d[:n] == dists[0][:n]


def test_acf_in_unit_interval(spark, sf_dir):
    rows = QUERIES["autocorrelation_function"](spark, sf_dir).collect()
    assert {r.lag_k for r in rows} == set(range(1, 8))
    for r in rows:
        assert abs(r.acf) <= 1.0 + 1e-6


def test_nelson_aalen_monotone(spark, sf_dir):
    rows = sorted(QUERIES["nelson_aalen_hazard"](spark, sf_dir).collect(),
                  key=lambda r: r.day_t)
    prev_h, prev_risk = -1.0, None
    for r in rows:
        assert r.cumulative_hazard >= prev_h - 1e-9
        prev_h = r.cumulative_hazard
        if prev_risk is not None:
            assert r.n_risk <= prev_risk
        prev_risk = r.n_risk
        assert 0 < r.n_events <= r.n_risk


def test_assortativity_is_a_correlation(spark, sf_dir):
    r = QUERIES["degree_assortativity"](spark, sf_dir).first()
    assert abs(r.assortativity_r) <= 1.0 + 1e-9
    assert r.mean_neighbor_degree >= 1.0  # every listed endpoint has >=1 edge


def test_modularity_sums_to_unit_range(spark, sf_dir):
    rows = QUERIES["modularity_by_brand"](spark, sf_dir).collect()
    q = sum(r.q_contribution for r in rows)
    assert -1.0 <= q <= 1.0
    m = sum(r.edges_within for r in rows)
    d = sum(r.degree_sum for r in rows)
    assert d % 2 == 0 and m <= d // 2  # handshake bound


def test_gini_in_unit_interval(spark, sf_dir):
    for r in QUERIES["gini_coefficient_revenue"](spark, sf_dir).collect():
        assert 0.0 - 1e-9 <= r.gini < 1.0
        assert r.total_revenue > 0


def test_kurtosis_lower_bound(spark, sf_dir):
    # excess kurtosis >= skewness² - 2 for ANY distribution (Pearson)
    for r in QUERIES["higher_moments_skew_kurtosis"](spark, sf_dir).collect():
        assert r.sd_price > 0
        assert r.excess_kurtosis >= r.skewness ** 2 - 2.0 - 1e-6
        assert math.isfinite(r.skewness)
