"""Eleventh replication wave: the next tier of
tools/replication_coverage.py's risk list — offline changepoint, Huber
IRLS, the exact-sum correlation matrix, regression discontinuity,
inventory policy formulas (safety stock, newsvendor, pinball loss),
k-core peeling, debut-cohort velocity, and the dataset-card roll-up —
each recomputed from raw parquet in pure Python/numpy. DuckDB only
FETCHES raw rows; every statistic is re-derived here.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from datetime import date, timedelta
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES

_EDGES_SQL = """
    WITH sup AS (
      SELECT l_partkey FROM lineitem
      GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 8
    ),
    items AS (
      SELECT DISTINCT l.l_orderkey, l.l_partkey
      FROM lineitem l JOIN sup USING (l_partkey)
    )
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "part", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x: float, n: int) -> float:
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _g(x: float) -> int:
    """floor(x + 0.5): the positive-domain integerization all three
    engines compute identically (DETERMINISM.md rule 5)."""
    return int(math.floor(x + 0.5))


# ---------------------------------------------------------------------------
# binary_segmentation_changepoint — exact int sufficient sums, one split
# ---------------------------------------------------------------------------

def test_binseg_best_split(spark, sf_dir):
    con = _con(sf_dir)
    days_raw = con.execute("SELECT CAST(ts AS DATE) FROM events").fetchall()
    con.close()
    counts = Counter(d for (d,) in days_raw)
    days = sorted(counts)
    ys = [counts[d] for d in days]
    n, t1, t2 = len(ys), sum(ys), sum(y * y for y in ys)
    best = None
    c1 = c2 = 0
    for i1, y in enumerate(ys, start=1):
        c1 += y
        c2 += y * y
        if not (2 <= i1 <= n - 2):
            continue
        g = (n - i1) * (i1 * c2 - c1 * c1) \
            + i1 * ((n - i1) * (t2 - c2) - (t1 - c1) * (t1 - c1))
        sse = float(g) / (i1 * (n - i1))
        key = (sse, days[i1 - 1])
        if best is None or key < best[0]:
            best = (key, i1, c1)
    (sse, split_day), i1, c1 = best
    [r] = QUERIES["binary_segmentation_changepoint"](spark, sf_dir).collect()
    assert r.split_day == split_day
    assert (r.n_left, r.n_right) == (i1, n - i1)
    assert r.mean_left == _r(c1 / i1, 4)
    assert r.mean_right == _r((t1 - c1) / (n - i1), 4)
    assert abs(r.variance_explained
               - (1.0 - sse / (float(t2) - float(t1) * t1 / n))) < 2e-6


# ---------------------------------------------------------------------------
# huber_m_estimator_one_step — median/MAD start, one IRLS step, exact cents
# ---------------------------------------------------------------------------

def test_huber_one_irls_step(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT o_custkey, o_totalprice FROM orders").fetchall()
    con.close()
    cents = defaultdict(int)
    for ck, v in rows:
        cents[ck] += _g(float(v) * 100)
    xs = sorted((x, ck) for ck, x in cents.items())
    n = len(xs)
    m = (xs[(n + 1) // 2 - 1][0] + xs[(n + 2) // 2 - 1][0]) / 2
    ads = sorted(abs(x - m) for x, _ in xs)
    mad = (ads[(n + 1) // 2 - 1] + ads[(n + 2) // 2 - 1]) / 2
    c_sig = 1.345 * 1.4826 * mad
    swx6 = sw9 = 0  # micro / nano grids, exact ints
    n_down = 0
    for x, _ck in xs:
        dev = abs(x - m)
        w = 1.0 if dev <= c_sig else c_sig / dev
        if w < 1.0:
            n_down += 1
        swx6 += int(Decimal(repr(_r(w * x, 6))).scaleb(6).to_integral_value())
        sw9 += int(Decimal(repr(_r(w, 9))).scaleb(9).to_integral_value())
    [r] = QUERIES["huber_m_estimator_one_step"](spark, sf_dir).collect()
    assert r.n_customers == n
    assert r.n_downweighted == n_down
    assert r.median_revenue == _r(m / 100.0, 2)
    assert r.scaled_mad == _r(mad * 1.4826 / 100.0, 2)
    huber = (swx6 / 1e6) / (sw9 / 1e9) / 100.0
    assert abs(r.huber_mean_revenue - huber) < 2e-4


# ---------------------------------------------------------------------------
# corr_matrix_lineitem — Pearson from exact grid-integer sums
# ---------------------------------------------------------------------------

def test_corr_matrix_grid_sums(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem
    """).fetchall()
    con.close()
    cols = list(zip(*rows))
    names = {"q": 0, "p": 1, "dc": 2, "tx": 3}
    pairs = [("qty_price", "q", "p"), ("qty_discount", "q", "dc"),
             ("qty_tax", "q", "tx"), ("price_discount", "p", "dc"),
             ("price_tax", "p", "tx"), ("discount_tax", "dc", "tx")]
    got = {r.pair: r.corr for r in
           QUERIES["corr_matrix_lineitem"](spark, sf_dir).collect()}
    assert set(got) == {p[0] for p in pairs}
    n = float(len(rows))
    for pair, a, b in pairs:
        xs = [float(v) for v in cols[names[a]]]
        ys = [float(v) for v in cols[names[b]]]
        sx = sum(_g(x * 10000) for x in xs) / 10000.0
        sy = sum(_g(y * 10000) for y in ys) / 10000.0
        sxy = sum(_g(x * y * 1000000) for x, y in zip(xs, ys)) / 1000000.0
        sxx = sum(_g(x * x * 1000000) for x in xs) / 1000000.0
        syy = sum(_g(y * y * 1000000) for y in ys) / 1000000.0
        corr = (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
        assert abs(got[pair] - corr) < 2e-6, pair


# ---------------------------------------------------------------------------
# regression_discontinuity_local — two local OLS fits in exact cents
# ---------------------------------------------------------------------------

def test_rdd_two_sided_fits(spark, sf_dir):
    con = _con(sf_dir)
    cust = con.execute("""
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal >= 4000 AND c_acctbal < 6000""").fetchall()
    ords = con.execute("SELECT o_custkey FROM orders").fetchall()
    con.close()
    n_orders = Counter(ck for (ck,) in ords)
    sides = {"above": [0, 0, 0, 0, 0], "below": [0, 0, 0, 0, 0]}
    for ck, bal in cust:
        x = _g(float(bal) * 100) - 500000
        y = n_orders.get(ck, 0)
        s = sides["below" if x < 0 else "above"]
        s[0] += 1
        s[1] += x
        s[2] += y
        s[3] += x * y
        s[4] += x * x
    fits = {}
    for side, (n, sx, sy, sxy, sxx) in sides.items():
        slope = (float(n) * float(sxy) - float(sx) * sy) \
            / (float(n) * float(sxx) - float(sx) * sx)
        fits[side] = (n, slope, (float(sy) - slope * sx) / n)
    [r] = QUERIES["regression_discontinuity_local"](spark, sf_dir).collect()
    assert (r.n_above, r.n_below) == (fits["above"][0], fits["below"][0])
    assert abs(r.slope_above_per_1k - fits["above"][1] * 100000.0) < 2e-6
    assert abs(r.slope_below_per_1k - fits["below"][1] * 100000.0) < 2e-6
    assert abs(r.limit_above - fits["above"][2]) < 2e-6
    assert abs(r.limit_below - fits["below"][2]) < 2e-6
    assert abs(r.rd_effect - (fits["above"][2] - fits["below"][2])) < 2e-6


# ---------------------------------------------------------------------------
# brand daily demand helpers (safety stock / newsvendor / pinball share
# the same raw fetch but each statistic is re-derived separately)
# ---------------------------------------------------------------------------

def _brand_daily(sf_dir, lo, hi):
    con = _con(sf_dir)
    rows = con.execute(f"""
        SELECT p.p_brand, CAST(l.l_shipdate AS DATE), l.l_quantity
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= DATE '{lo}' AND l.l_shipdate < DATE '{hi}'
    """).fetchall()
    con.close()
    daily = defaultdict(int)
    for brand, day, q in rows:
        daily[(brand, day)] += _g(float(q))
    out = defaultdict(dict)
    for (brand, day), d in daily.items():
        out[brand][day] = d
    return out


def test_safety_stock_formulas(spark, sf_dir):
    per = _brand_daily(sf_dir, "1996-01-01", "1997-01-01")
    got = {r.brand: r for r in
           QUERIES["safety_stock_reorder_point"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for brand, by_day in per.items():
        ds = list(by_day.values())
        n, s1, s2 = len(ds), sum(ds), sum(d * d for d in ds)
        mean = float(s1) / n
        sd = math.sqrt(float(s2) / n - mean * mean)
        r = got[brand]
        assert r.n_days == n
        assert r.mean_demand == _r(mean, 4)
        assert abs(r.sd_demand - sd) < 2e-4
        assert abs(r.safety_stock - 1.645 * sd * math.sqrt(7.0)) < 2e-4
        assert abs(r.reorder_point
                   - (mean * 7.0 + 1.645 * sd * math.sqrt(7.0))) < 2e-4


def test_newsvendor_critical_quantile(spark, sf_dir):
    per = _brand_daily(sf_dir, "1996-01-01", "1996-07-01")
    got = {r.brand: r for r in
           QUERIES["newsvendor_optimal_stock"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for brand, by_day in per.items():
        pairs = sorted((d, day) for day, d in by_day.items())
        n = len(pairs)
        r = got[brand]
        assert r.n_days == n
        assert r.q_star == pairs[math.ceil(0.3 * n) - 1][0]
        assert r.mean_daily_demand == _r(sum(d for d, _ in pairs) / n, 4)


def test_pinball_loss_exact_tenths(spark, sf_dir):
    per = _brand_daily(sf_dir, "1996-01-01", "1997-01-01")
    cut = date(1996, 7, 1)
    got = {r.brand: r for r in
           QUERIES["pinball_loss_quantile_eval"](spark, sf_dir).collect()}
    for brand, by_day in per.items():
        train = sorted((d, day) for day, d in by_day.items() if day < cut)
        evald = [d for day, d in by_day.items() if day >= cut]
        if brand not in got:
            assert not train or not evald
            continue
        n = len(train)
        q50 = train[math.ceil(0.5 * n) - 1][0]
        q90 = train[math.ceil(0.9 * n) - 1][0]
        pin50 = sum(5 * abs(d - q50) for d in evald)
        pin90 = sum(9 * (d - q90) if d >= q90 else (q90 - d) for d in evald)
        r = got[brand]
        assert (r.q50_forecast, r.q90_forecast) == (q50, q90)
        assert r.n_eval == len(evald)
        assert r.pinball_q50 == _r(pin50 / 10.0 / len(evald), 4)
        assert r.pinball_q90 == _r(pin90 / 10.0 / len(evald), 4)
        assert r.q90_coverage == _r(
            sum(1 for d in evald if d <= q90) / len(evald), 4)
    assert set(got) <= set(per)


# ---------------------------------------------------------------------------
# kcore_decomposition_bounded — 3 peel rounds at k=4, pure Python
# ---------------------------------------------------------------------------

def test_kcore_peeling_rounds(spark, sf_dir):
    con = _con(sf_dir)
    pairs = con.execute(_EDGES_SQL).fetchall()
    con.close()
    both = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    n_nodes = len({s for s, _ in both})
    survivors = []
    for _ in range(3):
        deg = Counter(s for s, _ in both)
        keep = {s for s, d in deg.items() if d >= 4}
        both = [(s, t) for s, t in both if s in keep and t in keep]
        survivors.append(len(keep))
    [r] = QUERIES["kcore_decomposition_bounded"](spark, sf_dir).collect()
    assert r.n_nodes == n_nodes
    assert (r.after_round1, r.after_round2, r.after_round3) == tuple(survivors)
    assert r.peeling_monotone == (
        survivors[0] >= survivors[1] >= survivors[2])


# ---------------------------------------------------------------------------
# item_debut_velocity — debut cohorts and 28-day windows in pure Python
# ---------------------------------------------------------------------------

def test_item_debut_cohorts(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT l.l_partkey, CAST(o.o_orderdate AS DATE)
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    """).fetchall()
    con.close()
    sales = defaultdict(list)
    for pk, day in rows:
        sales[pk].append(day)
    by_month = defaultdict(list)
    for pk, days in sales.items():
        first = min(days)
        early = sum(1 for d in days if d < first + timedelta(days=28))
        month = date(first.year, first.month, 1)
        if month >= date(1995, 3, 1):
            by_month[month].append(early)
    got = {r.debut_month: r for r in
           QUERIES["item_debut_velocity"](spark, sf_dir).collect()}
    assert set(got) == set(by_month)
    for month, earls in by_month.items():
        r = got[month]
        assert r.n_new_items == len(earls)
        assert r.best_debut == max(earls)
        assert r.avg_first28_sales == _r(sum(earls) / len(earls), 4)


# ---------------------------------------------------------------------------
# dataset_card_report — the whole roll-up from raw text
# ---------------------------------------------------------------------------

def test_dataset_card_rollup(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("SELECT lang, text FROM documents").fetchall()
    con.close()
    langs = Counter()
    fps = set()
    n_tokens = n_quality = 0
    for lang, text in rows:
        langs[lang] += 1
        toks = text.strip().split()
        fps.add(hashlib.md5(" ".join(text.strip().split()).lower().encode())
                .hexdigest())
        n_tokens += len(toks)
        mwl = sum(len(t) for t in toks) / len(toks)
        topr = max(Counter(toks).values()) / len(toks)
        if (30 <= len(toks) <= 5000 and 3.0 <= mwl <= 4.8
                and topr <= 0.15 and "the" in toks):
            n_quality += 1
    n = len(rows)
    h = sum(-(c / n) * math.log(c / n) for c in langs.values())
    [r] = QUERIES["dataset_card_report"](spark, sf_dir).collect()
    assert r.n_docs == n
    assert r.n_tokens == n_tokens
    assert r.n_langs == len(langs)
    assert abs(r.lang_entropy - h) < 2e-6
    assert r.exact_dup_rate == _r(1.0 - len(fps) / n, 6)
    assert r.quality_pass_rate == _r(n_quality / n, 6)
    assert r.mean_doc_tokens == _r(n_tokens / n, 6)
