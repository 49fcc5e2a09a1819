"""Twenty-fifth replication wave: three attribution models side by side,
per-domain caps, exact stratified sampling, delivery completeness,
modal imputation accuracy, and skip-gram window-2 PMI — recomputed from
raw parquet in pure Python."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import timedelta
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("customer", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x: float, n: int) -> float:
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _g(x: float) -> int:
    return int(math.floor(x + 0.5))


# ---------------------------------------------------------------------------
# attribution_model_compare — first/last/linear credits by weekday
# ---------------------------------------------------------------------------

def test_attribution_three_models(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT event_id, user_id, epoch_us(ts), CAST(ts AS DATE),
               event_type, value
        FROM events WHERE event_type IN ('purchase', 'click')
    """).fetchall()
    con.close()
    clicks = defaultdict(list)
    for eid, uid, t, d, et, _v in rows:
        if et == "click":
            clicks[uid].append((t, eid, d.isoweekday()))
    win = 3 * 24 * 3_600_000_000
    agg = defaultdict(lambda: [0, 0])
    for eid, uid, t, _d, et, v in rows:
        if et != "purchase":
            continue
        touches = [(ct, cid, wd) for ct, cid, wd in clicks.get(uid, ())
                   if ct <= t and ct > t - win]
        if not touches:
            continue
        touches.sort()
        cents = _g(float(v) * 100)
        first_wd = touches[0][2]
        last_wd = touches[-1][2]
        a = agg[("first_touch", first_wd)]
        a[0] += 1
        a[1] += cents
        a = agg[("last_touch", last_wd)]
        a[0] += 1
        a[1] += cents
        share = _g(float(v) * 100 / len(touches))
        for _ct, _cid, wd in touches:
            a = agg[("linear", wd)]
            a[0] += 1
            a[1] += share
    got = {(r.model, r.click_weekday): (r.n_credits, r.credited_revenue)
           for r in QUERIES["attribution_model_compare"](spark, sf_dir)
           .collect()}
    expected = {k: (n, cents / 100.0) for k, (n, cents) in agg.items()}
    assert got == expected


# ---------------------------------------------------------------------------
# curation_domain_cap — first-15-by-id caps per source
# ---------------------------------------------------------------------------

def test_domain_caps(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT source, doc_id, n_chars FROM documents").fetchall()
    con.close()
    per = defaultdict(list)
    for src, doc_id, nc in rows:
        per[src].append((doc_id, nc))
    got = {r.source: r for r in
           QUERIES["curation_domain_cap"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for src, docs in per.items():
        docs.sort()
        kept = docs[:15]
        r = got[src]
        assert r.n_kept == len(kept)
        assert r.n_dropped == len(docs) - len(kept)
        assert r.kept_chars == sum(nc for _d, nc in kept)


# ---------------------------------------------------------------------------
# curation_stratified_sample — ceil(20%) by hash rank per stratum
# ---------------------------------------------------------------------------

def test_stratified_exact_counts(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT source, lang, doc_id, n_chars FROM documents").fetchall()
    con.close()
    per = defaultdict(list)
    for src, lang, doc_id, nc in rows:
        hv = (doc_id * 2654435761 + 5 * 40503) % 4294967296
        per[(src, lang)].append((hv, doc_id, nc))
    got = {(r.source, r.lang): r for r in
           QUERIES["curation_stratified_sample"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for key, docs in per.items():
        docs.sort()
        k = math.ceil(len(docs) * 0.2)
        sampled = docs[:k]
        r = got[key]
        assert r.n_sampled == k
        assert r.sampled_chars == sum(nc for _h, _d, nc in sampled)


# ---------------------------------------------------------------------------
# delivery_completeness_audit — calendar gaps and volume bounds
# ---------------------------------------------------------------------------

def test_delivery_completeness(spark, sf_dir):
    con = _con(sf_dir)
    days_raw = con.execute("SELECT CAST(ts AS DATE) FROM events").fetchall()
    con.close()
    daily = Counter(d for (d,) in days_raw)
    lo, hi = min(daily), max(daily)
    n_expected = (hi - lo).days + 1
    present = set(daily)
    missing = sum(1 for i in range(n_expected)
                  if lo + timedelta(days=i) not in present)
    [r] = QUERIES["delivery_completeness_audit"](spark, sf_dir).collect()
    assert r.n_days_expected == n_expected
    assert r.n_days_present == len(present)
    assert r.n_days_missing == missing
    assert r.min_daily_rows == min(daily.values())
    assert r.max_daily_rows == max(daily.values())


# ---------------------------------------------------------------------------
# categorical_imputation_accuracy — modal fill on a deterministic holdout
# ---------------------------------------------------------------------------

def test_modal_imputation_accuracy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT c_custkey, c_nationkey, c_mktsegment FROM customer").fetchall()
    con.close()
    masked = [(ck, nk, seg) for ck, nk, seg in rows
              if (ck * 2654435761 % 4294967296) % 10 == 0]
    train = [(nk, seg) for ck, nk, seg in rows
             if (ck * 2654435761 % 4294967296) % 10 != 0]
    counts = defaultdict(Counter)
    for nk, seg in train:
        counts[nk][seg] += 1
    modal = {nk: min(((-c, seg) for seg, c in cnt.items()))[1]
             for nk, cnt in counts.items()}
    scored = [(seg, modal[nk]) for _ck, nk, seg in masked if nk in modal]
    n_correct = sum(1 for truth, pred in scored if truth == pred)
    n_segments = len({seg for _ck, _nk, seg in rows})
    [r] = QUERIES["categorical_imputation_accuracy"](spark, sf_dir).collect()
    assert r.n_masked == len(scored)
    assert r.n_correct == n_correct
    assert r.imputation_accuracy == _r(n_correct / len(scored), 6)
    assert r.random_baseline == _r(1.0 / n_segments, 6)


# ---------------------------------------------------------------------------
# skipgram_cooccurrence_pmi — window-2 ordered pairs, micro-nat PMI
# ---------------------------------------------------------------------------

def test_skipgram_pmi_top15(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("SELECT text FROM documents").fetchall()
    con.close()
    cp = Counter()
    for (text,) in rows:
        toks = [t.lower() for t in text.strip().split()]
        for i, w1 in enumerate(toks):
            for j in (i + 1, i + 2):
                if j < len(toks):
                    cp[(w1, toks[j])] += 1
    m1 = Counter()
    m2 = Counter()
    for (w1, w2), c in cp.items():
        m1[w1] += c
        m2[w2] += c
    n = sum(cp.values())
    scored = []
    for (w1, w2), c in cp.items():
        if c < 20:
            continue
        pmi6 = round(math.log(c * n / (m1[w1] * m2[w2])) * 1e6)
        scored.append((-pmi6, w1, w2, c))
    scored.sort()
    got = QUERIES["skipgram_cooccurrence_pmi"](spark, sf_dir).collect()
    assert len(got) == min(15, len(scored))
    for r, (negp, w1, w2, c) in zip(got, scored[:15]):
        assert (r.w1, r.w2, r.n_cooccur) == (w1, w2, c)
        assert r.pmi_nats == _r(-negp / 1e6, 4)
