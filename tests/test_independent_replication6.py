"""Sixth replication wave: decision stump (brute-force Gini over every
split), Benford digits, Heaps' law fit, calibration/ECE, k-fold CV OLS
(per-fold leave-out closed form), and the two-proportion sample-size
formula."""

from __future__ import annotations

import math

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


def test_decision_stump_is_true_min_gini_split(spark, sf_dir):
    """Brute force every bucket threshold and recompute weighted Gini
    directly — the argmin class of check that caught the changepoint."""
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS b,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS pos
        FROM events WHERE value IS NOT NULL
    """).fetchall()
    con.close()
    from collections import Counter

    n_b, p_b = Counter(), Counter()
    for b, pos in rows:
        n_b[b] += 1
        p_b[b] += pos
    buckets = sorted(n_b)
    nt, pt = sum(n_b.values()), sum(p_b.values())
    best = None
    for t in buckets:  # split: bucket <= t goes left
        nl = sum(n_b[b] for b in buckets if b <= t)
        pl = sum(p_b[b] for b in buckets if b <= t)
        nr, pr = nt - nl, pt - pl
        if nl == 0 or nr == 0:
            continue
        gl = 2 * (pl / nl) * (1 - pl / nl)
        gr = 2 * (pr / nr) * (1 - pr / nr)
        g = (nl * gl + nr * gr) / nt
        if best is None or g < best[0] - 1e-12:
            best = (g, t, nl, nr, pl, pr)
    r = QUERIES["decision_stump_best_split"](spark, sf_dir).first()
    g, t, nl, nr, pl, pr = best
    assert (r.n_left, r.n_right, r.pos_left, r.pos_right) == (nl, nr, pl, pr)
    assert abs(r.weighted_gini - g) < 1e-4


def test_benford_expected_and_observed(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d,
               COUNT(*) AS n
        FROM orders WHERE o_totalprice >= 1 GROUP BY 1
    """).fetchall()
    con.close()
    tot = sum(n for _, n in rows)
    exp = {d: n for d, n in rows}
    got = {r.d: r for r in
           QUERIES["benford_first_digit_audit"](spark, sf_dir).collect()}
    assert set(got) == set(exp)
    for d, r in got.items():
        assert r.n_observed == exp[d]
        assert abs(r.p_observed - exp[d] / tot) < 1e-6
        assert abs(r.p_benford - math.log10(1 + 1 / d)) < 1e-6
    # Benford masses over ALL nine digits sum to 1
    assert abs(sum(math.log10(1 + 1 / d) for d in range(1, 10)) - 1.0) < 1e-12


def test_heaps_fit_matches_polyfit_on_checkpoints(spark, sf_dir):
    """Recompute the decile checkpoints (tokens-so-far, distinct terms
    whose first doc is within the prefix) and the log-log fit."""
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                   t -> t <> '') AS tk
        FROM documents ORDER BY doc_id
    """).fetchall()
    con.close()
    max_doc = max(r[0] for r in rows)
    cuts = [max_doc * k // 10 for k in range(1, 11)]
    pts = []
    seen = set()
    tokens_so_far = 0
    it = iter(sorted(rows))
    doc_iter = sorted(rows)
    idx = 0
    for cut in cuts:
        while idx < len(doc_iter) and doc_iter[idx][0] <= cut:
            tokens_so_far += len(doc_iter[idx][1])
            seen.update(doc_iter[idx][1])
            idx += 1
        pts.append((tokens_so_far, len(seen)))
    x = np.log([p[0] for p in pts])
    y = np.log([p[1] for p in pts])
    beta, logk = np.polyfit(x, y, 1)
    r = QUERIES["heaps_law_vocab_growth"](spark, sf_dir).first()
    assert r.corpus_tokens == pts[-1][0]
    assert r.vocabulary == pts[-1][1]
    assert abs(r.heaps_beta - beta) < 1e-3
    assert abs(r.heaps_k - math.exp(logk)) < 1e-2 * max(1.0, math.exp(logk))


def test_calibration_bins_and_ece(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               ROUND(0.5 + 0.5 * z / (1.0 + ABS(z)), 6) AS p
        FROM (
          SELECT lang,
                 ROUND(-1.2 + 0.9 * ROUND(n_chars / 1000.0, 6)
                       + 2.0 * ROUND((LENGTH(text) - LENGTH(REPLACE(text, ' ', '')))
                                     / CAST(n_chars AS DOUBLE), 6), 6) AS z
          FROM documents
        )
    """).fetchall()
    con.close()
    bins = {}
    for y, p in rows:
        b = min(9, int(p * 10 // 1))
        c = bins.setdefault(b, [0, 0, 0.0])
        c[0] += 1
        c[1] += y
        c[2] += p
    n_total = sum(c[0] for c in bins.values())
    ece = sum(c[0] / n_total * abs(c[2] / c[0] - c[1] / c[0])
              for c in bins.values())
    got = {r.bin: r for r in
           QUERIES["calibration_reliability_ece"](spark, sf_dir).collect()}
    assert set(got) == set(bins)
    for b, (n, n_pos, psum) in bins.items():
        r = got[b]
        assert r.n_docs == n
        assert abs(r.avg_predicted - psum / n) < 1e-4
        assert abs(r.observed_rate - n_pos / n) < 1e-6
        assert abs(r.ece - ece) < 1e-4


def test_kfold_cv_ols_leave_one_fold_out(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT (event_id * 2654435761) % 4294967296 % 4 AS fold,
               EXTRACT(hour FROM ts) AS x, value AS y
        FROM events
    """).fetchall()
    con.close()
    folds = {}
    for f, x, yv in rows:
        folds.setdefault(int(f), []).append((float(x), float(yv)))
    got = {r.fold: r for r in QUERIES["kfold_cv_ols"](spark, sf_dir).collect()}
    assert set(got) == set(folds)
    for f in folds:
        train = [(x, yv) for g, pts in folds.items() if g != f for x, yv in pts]
        X = np.array([t[0] for t in train])
        Y = np.array([t[1] for t in train])
        slope, intercept = np.polyfit(X, Y, 1)
        test = np.array(folds[f])
        mse = float(((test[:, 1] - (intercept + slope * test[:, 0])) ** 2).mean())
        r = got[f]
        assert r.n_train == len(train)
        assert r.n_test == len(folds[f])
        assert abs(r.slope - slope) < 1e-3 * max(1.0, abs(slope))
        assert abs(r.intercept - intercept) < 1e-2 * max(1.0, abs(intercept))
        assert abs(r.test_mse - mse) < 1e-2 * max(1.0, mse)


def test_sample_size_two_proportion_formula(spark, sf_dir):
    con = _con(sf_dir)
    n1, c1, n2, c2 = con.execute("""
        SELECT SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END),
               SUM(CASE WHEN event_type = 'view' AND value > 50 THEN 1 ELSE 0 END),
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END),
               SUM(CASE WHEN event_type = 'click' AND value > 50 THEN 1 ELSE 0 END)
        FROM events
    """).fetchone()
    con.close()
    p1, p2 = round(c1 / n1, 6), round(c2 / n2, 6)
    pbar = (p1 + p2) / 2
    za, zb = 1.959964, 0.841621
    n_req = (za * math.sqrt(2 * pbar * (1 - pbar))
             + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))) ** 2 / (p2 - p1) ** 2
    r = QUERIES["sample_size_power_calc"](spark, sf_dir).first()
    assert (r.n_control, r.n_treatment) == (n1, n2)
    assert abs(r.observed_effect - (p2 - p1)) < 1e-6
    assert abs(r.n_required_per_arm - math.ceil(n_req)) <= 1
    assert r.adequately_powered == (min(n1, n2) >= r.n_required_per_arm)
