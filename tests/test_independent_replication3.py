"""Third wave of independent replications: CUPED, exact AUC, Fano/
burstiness, Zipf fit, Nelson-Aalen, Kaplan-Meier. Same rationale as
test_independent_replication.py — recompute from raw parquet with no
shared algebra; survival estimators use pedestrian per-subject loops."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_cuped_theta_and_rho_sq(spark, sf_dir):
    con = _con(sf_dir)
    mid_us = con.execute(
        "SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 FROM events"
    ).fetchone()[0]
    rows = con.execute("""
        SELECT SUM(CASE WHEN epoch_us(ts) < ? THEN 1 ELSE 0 END) AS x,
               SUM(CASE WHEN epoch_us(ts) >= ? THEN 1 ELSE 0 END) AS y
        FROM events GROUP BY user_id
    """, [mid_us, mid_us]).fetchall()
    con.close()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    y = np.array([r[1] for r in rows], dtype=np.float64)
    cov = ((x - x.mean()) * (y - y.mean())).mean()
    theta = cov / x.var()
    rho_sq = cov * cov / (x.var() * y.var())
    r = QUERIES["cuped_variance_reduction"](spark, sf_dir).first()
    assert r.n_users == len(x)
    assert abs(r.theta - theta) < 1e-3 * max(1.0, abs(theta))
    assert abs(r.rho_sq - rho_sq) < 1e-3
    assert abs(r.variance_ratio_after_cuped - (1 - rho_sq)) < 1e-3


def test_auc_matches_pairwise_definition(spark, sf_dir):
    """The query uses the rank-sum identity; the replication counts the
    ACTUAL pairs (wins + half-ties) — the O(n+ n-) definition the
    identity is supposed to equal."""
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               ROUND(-1.2 + 0.9 * ROUND(n_chars / 1000.0, 6)
                     + 2.0 * ROUND((LENGTH(text) - LENGTH(REPLACE(text, ' ', '')))
                                   / CAST(n_chars AS DOUBLE), 6), 6) AS z
        FROM documents
    """).fetchall()
    con.close()
    pos = np.array([z for yv, z in rows if yv == 1])
    neg = np.array([z for yv, z in rows if yv == 0])
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    r = QUERIES["auc_exact_rank_sum"](spark, sf_dir).first()
    assert (r.n_positives, r.n_negatives) == (len(pos), len(neg))
    assert abs(r.auc - auc) < 1e-5


def test_fano_burstiness_with_zero_hours(spark, sf_dir):
    """Zero-count hours must be in the denominator — the replication
    materializes the full hour grid and checks both F and B."""
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    """).fetchall()
    span = con.execute("""
        SELECT CAST(date_diff('hour', date_trunc('hour', MIN(ts)),
                              date_trunc('hour', MAX(ts))) + 1 AS BIGINT)
        FROM events
    """).fetchone()[0]
    con.close()
    by_type = {}
    for et, hr, c in rows:
        by_type.setdefault(et, []).append(c)
    got = {r.event_type: r for r in
           QUERIES["burstiness_fano_factor"](spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    for et, cs in by_type.items():
        counts = np.zeros(span)
        counts[:len(cs)] = cs  # placement irrelevant for moments
        mu, var = counts.mean(), counts.var()
        sd = math.sqrt(var)
        r = got[et]
        assert abs(r.mean_per_hour - mu) < 1e-3 * max(1.0, mu)
        assert abs(r.fano_factor - var / mu) < 5e-3 * max(1.0, var / mu)
        assert abs(r.burstiness_b - (sd - mu) / (sd + mu)) < 5e-3


def test_zipf_slope_matches_polyfit(spark, sf_dir):
    con = _con(sf_dir)
    freqs = [r[0] for r in con.execute("""
        SELECT CAST(COUNT(*) AS BIGINT) AS f FROM (
          SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                    t -> t <> '')) AS tok
          FROM documents
        ) GROUP BY tok ORDER BY f DESC, tok ASC LIMIT 100
    """).fetchall()]
    con.close()
    x = np.log(np.arange(1, len(freqs) + 1))
    y = np.log(np.array(freqs, dtype=np.float64))
    slope = np.polyfit(x, y, 1)[0]
    r = QUERIES["zipf_vocabulary_fit"](spark, sf_dir).first()
    assert r.n_points == len(freqs)
    assert abs(r.zipf_slope - slope) < 1e-3 * max(1.0, abs(slope))
    assert r.zipf_slope < 0  # Zipf direction


def _event_subjects(con):
    """(duration_days, event_flag) per user for time-to-first-purchase
    from FIRST EVENT day, censored at the corpus horizon — the
    nelson_aalen_hazard subject definition."""
    rows = con.execute("""
        SELECT MIN(CAST(ts AS DATE)) AS first_day,
               MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
                 AS purch_day
        FROM events GROUP BY user_id
    """).fetchall()
    last = con.execute("SELECT MAX(CAST(ts AS DATE)) FROM events").fetchone()[0]
    subj = []
    for first_day, purch_day in rows:
        if purch_day is not None:
            subj.append(((purch_day - first_day).days, 1))
        else:
            subj.append(((last - first_day).days, 0))
    return subj


def test_nelson_aalen_cumulative_hazard(spark, sf_dir):
    con = _con(sf_dir)
    subj = _event_subjects(con)
    con.close()
    event_days = sorted({t for t, e in subj if e == 1})
    got = {r.day_t: r for r in
           QUERIES["nelson_aalen_hazard"](spark, sf_dir).collect()}
    assert sorted(got) == event_days
    H = 0.0
    for t in event_days:
        d = sum(1 for tt, e in subj if e == 1 and tt == t)
        n = sum(1 for tt, _ in subj if tt >= t)
        H += d / n
        r = got[t]
        assert (r.n_events, r.n_risk if hasattr(r, "n_risk") else r.n_at_risk) \
            == (d, n)
        assert abs(r.cumulative_hazard - H) < 1e-4


def test_kaplan_meier_product_limit(spark, sf_dir):
    """Per-subject loop: duration = first purchase AFTER first click,
    else censored at the horizon; S(t) = Π (1 - d/n) over event times."""
    con = _con(sf_dir)
    rows = con.execute("""
        WITH fc AS (
          SELECT user_id, MIN(ts) AS c_ts FROM events
          WHERE event_type = 'click' GROUP BY user_id
        ),
        fp AS (
          SELECT e.user_id, MIN(e.ts) AS p_ts
          FROM events e JOIN fc ON fc.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > fc.c_ts
          GROUP BY e.user_id
        )
        SELECT CAST(fc.c_ts AS DATE), CAST(fp.p_ts AS DATE)
        FROM fc LEFT JOIN fp ON fp.user_id = fc.user_id
    """).fetchall()
    last = con.execute("SELECT CAST(MAX(ts) AS DATE) FROM events").fetchone()[0]
    con.close()
    subj = [((p - c).days, 1) if p is not None else ((last - c).days, 0)
            for c, p in rows]
    event_days = sorted({t for t, e in subj if e == 1})
    got = {r.duration_day: r for r in
           QUERIES["kaplan_meier_survival"](spark, sf_dir).collect()}
    assert sorted(got) == event_days
    S = 1.0
    for t in event_days:
        d = sum(1 for tt, e in subj if e == 1 and tt == t)
        n = sum(1 for tt, _ in subj if tt >= t)
        S *= 1 - d / n
        r = got[t]
        assert (r.n_events, r.n_at_risk) == (d, n)
        # query's survival rides a 1e-6 product grid — a few steps of
        # rounding compound, so compare at 1e-4
        assert abs(r.survival - S) < 1e-4
