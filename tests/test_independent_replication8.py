"""Eighth replication wave: KL divergence, weekday seasonal indices,
seasonal-naive backtest (MAE/WAPE), split-conformal coverage, Burrows'
Delta, and bootstrap-CI structural invariants (the Poisson weights are
engine-hash-deterministic, so the replication checks the interval
algebra rather than re-deriving the draws)."""

from __future__ import annotations

import math
from datetime import timedelta

import duckdb
import numpy as np

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_kl_divergence_both_directions(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT lang, unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                        t -> t <> '')) AS term
        FROM documents WHERE lang IN ('en', 'de')
    """).fetchall()
    con.close()
    ca, cb = {}, {}
    for lang, t in rows:
        (ca if lang == "en" else cb)[t] = (ca if lang == "en" else cb).get(t, 0) + 1
    vocab = set(ca) | set(cb)
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    kl_ab = kl_ba = 0.0
    for t in vocab:
        pa = (ca.get(t, 0) + 1) / (na + v)
        pb = (cb.get(t, 0) + 1) / (nb + v)
        kl_ab += pa * math.log(pa / pb)
        kl_ba += pb * math.log(pb / pa)
    r = QUERIES["kl_divergence_langs"](spark, sf_dir).first()
    assert (r.vocab_size, r.n_tokens_a, r.n_tokens_b) == (v, na, nb)
    assert abs(r.kl_a_to_b - kl_ab) < 1e-4
    assert abs(r.kl_b_to_a - kl_ba) < 1e-4
    assert r.kl_a_to_b >= 0 and r.kl_b_to_a >= 0  # Gibbs


def test_weekday_seasonal_indices(spark, sf_dir):
    con = _con(sf_dir)
    daily = con.execute("""
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS rev
        FROM orders GROUP BY 1 ORDER BY 1
    """).fetchall()
    con.close()
    days = [d for d, _ in daily]
    revs = {d: float(r) for d, r in daily}
    detr = {}
    for d in days:
        window = [revs[x] for x in days
                  if -3 <= (x - d).days <= 3]
        trend = round(sum(window) / len(window), 4)
        wd = d.isoweekday()
        detr.setdefault(wd, []).append(revs[d] - trend)
    got = {r.weekday: r for r in
           QUERIES["weekday_seasonality_decomposition"](spark, sf_dir).collect()}
    assert set(got) == set(detr)
    for wd, vals in detr.items():
        r = got[wd]
        assert r.n_days == len(vals)
        assert abs(r.seasonal_index - sum(vals) / len(vals)) < 1e-2
    # additive decomposition: indices roughly cancel across the week
    total = sum(r.seasonal_index * r.n_days for r in got.values())
    n = sum(r.n_days for r in got.values())
    assert abs(total / n) < 0.05 * max(1.0, np.mean(
        [abs(r.seasonal_index) for r in got.values()]) + 1.0) * 100


def test_seasonal_naive_mae_wape(spark, sf_dir):
    con = _con(sf_dir)
    daily = con.execute("""
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS v
        FROM events GROUP BY 1, 2
    """).fetchall()
    con.close()
    series = {}
    for et, d, v in daily:
        series[(et, d)] = v
    end_day = max(d for _, d, _ in daily)
    per_type = {}
    for (et, d), v in series.items():
        if d <= end_day - timedelta(days=7):
            continue
        pred = series.get((et, d - timedelta(days=7)))
        if pred is None:
            continue
        acc = per_type.setdefault(et, [0, 0, 0])
        acc[0] += 1
        acc[1] += abs(v - pred)
        acc[2] += abs(v)
    got = {r.event_type: r for r in
           QUERIES["seasonal_naive_backtest"](spark, sf_dir).collect()}
    assert set(got) == set(per_type)
    for et, (n, sae, sv) in per_type.items():
        r = got[et]
        assert r.n_days_scored == n
        assert abs(r.mae - sae / n / 100.0) < 1e-2
        assert abs(r.wape - sae / sv) < 1e-4


def test_conformal_qhat_and_coverage(spark, sf_dir):
    con = _con(sf_dir)
    daily = con.execute("""
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS v
        FROM events GROUP BY 1, 2
    """).fetchall()
    con.close()
    series = {(et, d): v for et, d, v in daily}
    end_day = max(d for _, d, _ in daily)
    cal, test = [], []
    for (et, d), v in series.items():
        pred = series.get((et, d - timedelta(days=7)))
        if pred is None:
            continue
        resid = abs(v - pred)
        (test if d > end_day - timedelta(days=7) else cal).append(resid)
    cal.sort()
    k = math.ceil(0.9 * (len(cal) + 1))
    qhat = cal[k - 1]
    covered = sum(1 for r_ in test if r_ <= qhat)
    r = QUERIES["conformal_interval_coverage"](spark, sf_dir).first()
    assert r.n_calibration == len(cal)
    assert r.n_test == len(test)
    assert abs(r.interval_halfwidth - qhat / 100.0) < 1e-6
    assert r.n_covered == covered


def test_burrows_delta_top_terms_z_grid(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT source, unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                          t -> t <> '')) AS term
        FROM documents
    """).fetchall()
    con.close()
    cnt, per = {}, {}
    src_tot = {}
    for s, t in rows:
        cnt[t] = cnt.get(t, 0) + 1
        per[(s, t)] = per.get((s, t), 0) + 1
        src_tot[s] = src_tot.get(s, 0) + 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    terms = [t for t, _ in top]
    sources = sorted(src_tot)
    # relative frequency grid, z-scored per term across sources
    freq = {(s, t): per.get((s, t), 0) / src_tot[s]
            for s in sources for t in terms}
    z = {}
    for t in terms:
        vals = np.array([freq[(s, t)] for s in sources])
        mu, sd = vals.mean(), vals.std()
        for s in sources:
            z[(s, t)] = (freq[(s, t)] - mu) / sd if sd > 0 else 0.0
    deltas = {}
    for i, s1 in enumerate(sources):
        for s2 in sources[i + 1:]:
            deltas[(s1, s2)] = np.mean(
                [abs(z[(s1, t)] - z[(s2, t)]) for t in terms])
    expected = sorted(deltas.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    got = QUERIES["burrows_delta_stylometry"](spark, sf_dir).collect()
    assert len(got) == 10
    got_sorted = sorted(got, key=lambda r: (r.burrows_delta, r.src1, r.src2))
    for r, ((s1, s2), dd) in zip(got_sorted, expected):
        assert {r.src1, r.src2} == {s1, s2}
        assert abs(r.burrows_delta - dd) < 1e-3


def test_bootstrap_ci_structural_invariants(spark, sf_dir):
    """The Poisson draws are engine-hash-deterministic (not re-derived
    here); the checkable algebra: 32 replicates, CI endpoints are the
    2nd-smallest/2nd-largest replicate means, the point mean equals the
    plain daily-revenue mean, and the interval brackets it."""
    con = _con(sf_dir)
    xs = [float(r[0]) for r in con.execute("""
        SELECT ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,2))) / COUNT(*), 4)
        FROM orders GROUP BY o_orderdate
    """).fetchall()]
    con.close()
    point = sum(xs) / len(xs)
    r = QUERIES["bootstrap_ci_mean"](spark, sf_dir).first()
    assert r.n_replicates == 32
    assert abs(r.point_mean - point) < 1e-2
    assert r.ci_lo <= r.point_mean <= r.ci_hi
    # interval width is positive but far below the data's full spread
    assert 0 < r.ci_hi - r.ci_lo < (max(xs) - min(xs))
