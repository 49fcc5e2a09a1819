"""Targeted invariants for the round-4 operator waves, beyond the
oracle hash-match: structural guarantees a refactor could silently
break while still producing internally-consistent (and thus
oracle-green-at-a-different-answer) results.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def test_pq_codebook_seeds_self_retrieve(spark, sf_dir):
    # vec_ids 0..4 are both queries and codebook seeds: their code in
    # every subspace is their own centroid (distance 0), so ADC distance
    # to themselves is exactly 0 and they MUST rank first.
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["pq_ann_topk"](spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    firsts = out.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).collect()
    for r in firsts:
        assert r.vec_id == r.query_id and r.adc_dist == 0.0


def test_bloom_filter_no_false_negatives_and_fp_rate(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    row = QUERIES["bloom_filter_membership"](spark, sf_dir).first()
    assert row.no_false_negatives is True
    # false-positive rate sanity: maybe-count can exceed members only by
    # the bloom FP margin; with m=2048,k=3 and n_keys set bits the
    # theoretical fpp = (n_set_bits/m)^k — observed must be in that
    # ballpark (generous 3x to stay flake-free)
    fp_observed = (row.n_maybe - row.n_members) / max(1, row.n_probes - row.n_members)
    fpp_theory = (row.n_set_bits / row.m) ** row.k
    assert fp_observed <= 3 * fpp_theory + 0.01


def test_snapshot_diff_classes_partition_the_union(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = {r.change_class: r.n_rows for r in QUERIES["snapshot_diff_cdc"](spark, sf_dir).collect()}
    assert set(rows) == {"added", "removed", "changed", "unchanged"}
    # every key classified exactly once: classes partition the key union
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a_keys = o.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    b_keys = o.filter(
        (F.col("o_orderdate") < F.lit("1997-07-01").cast("date"))
        & (F.col("o_orderkey") % 13 != 3)
    )
    n_union = a_keys.select("o_orderkey").union(b_keys.select("o_orderkey")).distinct().count()
    assert sum(rows.values()) == n_union


def test_compaction_bins_respect_target_within_2x(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    plan = QUERIES["compaction_bin_packing"](spark, sf_dir)
    # sequential fill: any bin except a partition's last is at least
    # half-target whenever no single file exceeds the target
    over = plan.filter(
        (F.col("bin_bytes") > 2 * 2500) & (F.col("bin_files") > 1)
    ).count()
    assert over == 0, "a multi-file bin exceeded 2x target"


def test_interpolation_hits_anchors_exactly(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["timeseries_interpolate_linear"](spark, sf_dir)
    # non-gap days carry the original value and are flagged was_gap=false;
    # gaps are strictly between neighbor values (linearity)
    anchors = out.filter(~F.col("was_gap")).count()
    gaps = out.filter(F.col("was_gap")).count()
    assert anchors > 0 and gaps > 0
    bad = out.filter(F.col("value_interp").isNull()).count()
    assert bad == 0


def test_variant_matches_from_json(spark, sf_dir):
    # variant_get path extraction must agree with the schema-declared
    # from_json route on every row
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    both = ev.select(
        F.variant_get(F.parse_json("props"), "$.k", "int").alias("v_variant"),
        F.from_json("props", "k int")["k"].alias("v_struct"),
    )
    assert both.filter(F.col("v_variant") != F.col("v_struct")).count() == 0


def test_recursive_cte_depth_bounded(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["recursive_cte_ancestors"](spark, sf_dir)
    # decimal trie: depth never exceeds digits(max custkey), every chain
    # terminates at ancestor 0
    stats = out.agg(
        F.max("depth").alias("max_depth"),
        F.count_distinct("c_custkey").alias("n_keys"),
    ).first()
    assert stats.max_depth <= 7
    roots = out.groupBy("c_custkey").agg(F.min("ancestor").alias("mn"))
    assert roots.filter(F.col("mn") != 0).count() == 0


def test_referential_integrity_clean_on_testdata(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["referential_integrity_audit"](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_orphans == 0, f"{r.relationship} has orphans"


def test_winsorize_clips_about_two_percent(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    for r in QUERIES["winsorized_robust_stats"](spark, sf_dir).collect():
        frac = r.n_clipped / r.n_rows
        # p1/p99 clipping on a continuous column clips ~2% per group
        assert 0.005 <= frac <= 0.05, (r.o_orderpriority, frac)


def test_sliding_distinct_users_bounds(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["sliding_distinct_users"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total_users = ev.select("user_id").distinct().count()
    mx = out.agg(F.max("distinct_users_7d").alias("m")).first().m
    assert 0 < mx <= total_users


def test_contamination_matrix_upper_triangle_and_symmetric_recount(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["cross_source_contamination"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        # strict upper triangle: each unordered pair reported once
        assert r.src_a < r.src_b and r.shared_shingles > 0


def test_mad_outliers_are_a_small_minority(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    for r in QUERIES["length_outlier_mad"](spark, sf_dir).collect():
        assert r.mad_chars >= 0 and 0 <= r.n_outliers <= r.n_docs
        # 3 robust sigmas keeps the flagged set a tail, not a mode
        assert r.n_outliers / r.n_docs < 0.1, (r.lang, r.n_outliers, r.n_docs)


def test_zipf_slope_negative_over_full_top100(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    row = QUERIES["zipf_vocabulary_fit"](spark, sf_dir).first()
    # capped top-k: the tiny test fixture has a vocabulary under 100
    assert 0 < row.n_points <= 100
    # frequency is non-increasing in rank, so the OLS slope must be <= 0
    assert row.zipf_slope < 0


def test_ewma_stays_within_per_user_value_range(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["ewma_event_smoothing"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rng = ev.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    j = out.join(rng, "user_id")
    # a convex combination of observed values can never leave their range
    eps = 1e-6  # round(…, 6) slack
    bad = j.filter((F.col("ewma_value") < F.col("lo") - eps) | (F.col("ewma_value") > F.col("hi") + eps))
    assert bad.count() == 0
    # exactly one smoothed row per user
    assert out.count() == rng.count()


def test_knn_graph_k_edges_per_node_and_mutuality_symmetry(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["knn_graph_mutual"](spark, sf_dir).cache()
    n_nodes = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    deg = out.groupBy("src").count().collect()
    assert len(deg) == n_nodes and all(r["count"] == 5 for r in deg)
    # mutuality is symmetric: (a->b mutual) iff (b->a mutual)
    m = out.filter("is_mutual").select("src", "dst")
    rev = m.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert m.exceptAll(rev).count() == 0
    out.unpersist()


def test_embedding_norm_audit_totals(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["embedding_norm_audit"](spark, sf_dir).collect()
    n_total = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_vecs for r in rows) == n_total
    for r in rows:
        assert r.min_norm <= r.avg_norm <= r.max_norm
        assert 0 <= r.n_zero <= r.n_vecs and 0 <= r.n_unit <= r.n_vecs


def test_streaming_dedup_collapses_double_delivery(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["streaming_dedup_exactly_once"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_type = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    got = {r.event_type: (r.n_events, r.n_unique) for r in rows}
    assert set(got) == set(per_type)
    for t, (n_ev, n_uq) in got.items():
        # exactly-once: double delivery collapsed to the single-copy counts
        assert n_ev == n_uq == per_type[t]


def test_join_hints_force_distinct_physical_operators(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.sources.registry import load_table

    o = load_table(spark, "orders", sf_dir).select("o_custkey")
    c = load_table(spark, "customer", sf_dir).select("c_custkey")
    for hint, op in (
        ("broadcast", "BroadcastHashJoin"),
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
    ):
        j = o.join(c.hint(hint), o["o_custkey"] == c["c_custkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert op in plan, f"hint {hint} did not force {op}"


def test_scd1_merge_classifies_inserts_and_updates(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["scd1_merge_upsert"](spark, sf_dir).cache()
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n_new = c.filter(F.col("c_custkey") < 50).count()
    ins = out.filter("action = 'insert'")
    assert ins.count() == n_new
    # inserts carry no old value; updates always change the value
    assert ins.filter(F.col("old_segment").isNotNull()).count() == 0
    upd = out.filter("action = 'update'")
    assert upd.filter(F.col("old_segment") == F.col("new_segment")).count() == 0
    out.unpersist()


def test_topk_with_ties_keeps_all_boundary_ties(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["grouped_topk_with_ties"](spark, sf_dir).cache()
    assert out.filter((F.col("rnk") < 1) | (F.col("rnk") > 3)).count() == 0
    # rank() semantics: every nation keeps AT LEAST 3 rows (more on ties)
    per_nation = out.groupBy("nation").count().collect()
    assert all(r["count"] >= 3 for r in per_nation)
    out.unpersist()


def test_pivot_multi_agg_partitions_row_count(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["pivot_multi_agg"](spark, sf_dir)
    li_n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    tot = out.agg(
        F.sum(F.col("F_n_rows") + F.col("O_n_rows")).alias("t")
    ).first().t
    assert tot == li_n


def test_cluster_histogram_accounts_for_every_doc(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["dedup_cluster_size_histogram"](spark, sf_dir).collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # corpus + injected re-delivery of every 3rd doc
    n_docs_total = d.count() + d.filter(F.col("doc_id") % 3 == 0).count()
    assert sum(r.n_docs for r in rows) == n_docs_total
    assert any(r.cluster_size >= 2 for r in rows), "injected dups missing"
    for r in rows:
        # identities: docs = size x clusters, removable = docs - clusters
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert r.n_removable == r.n_docs - r.n_clusters


def test_keep_longest_never_keeps_a_truncated_copy(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    keepers = QUERIES["dedup_keep_longest_canonical"](spark, sf_dir).cache()
    assert keepers.count() > 0
    assert keepers.filter(F.col("cluster_size") < 2).count() == 0
    # a clipped copy shares its prefix key with its original, which is
    # longer (or equal with a lower id) -- so it can NEVER win a cluster
    assert keepers.filter(F.col("keeper_id") >= 2000000).count() == 0
    keepers.unpersist()


def test_curation_funnel_is_monotone_and_consistent(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = sorted(
        QUERIES["curation_funnel_report"](spark, sf_dir).collect(),
        key=lambda r: r.stage_no,
    )
    assert [r.stage for r in rows] == ["raw", "lang_en", "quality", "dedup", "decontaminated"]
    # each stage only removes documents (and therefore tokens)
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs <= a.n_docs and b.n_tokens <= a.n_tokens
    assert rows[0].n_docs == spark.read.parquet(f"{sf_dir}/documents.parquet").count()


def test_incremental_knn_equals_batch_rebuild(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.operators import similarity as sim_ops

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = e.filter(F.col("vec_id") % 5 != 0)
    new = e.filter(F.col("vec_id") % 5 == 0)
    inc = sim_ops.knn_graph_incremental(old, new, k=5, dim=64)
    batch = sim_ops.knn_graph(e, k=5, dim=64)
    assert inc.exceptAll(batch).count() == 0
    assert batch.exceptAll(inc).count() == 0


def test_auto_blocks_regimes():
    """_auto_blocks (round 8): parallelism-targeted block count, capped
    so small corpora aren't shattered into per-group Arrow overhead
    (measured 2x on knn_graph at sf0.1) and floored so a block pair
    fits executor memory at scale."""
    from quantum_rag_data_pipeline_spark.operators.similarity import _auto_blocks

    # small corpus: BLAS-sized cap wins (sf0.1's 2000 vectors -> 2)
    assert _auto_blocks(2000, 32) == 2
    assert _auto_blocks(100, 32) == 1
    # big-enough data: the round-5 parallelism rule sqrt(2*n_part)
    assert _auto_blocks(20000, 32) == 8       # sf1 regime unchanged
    assert _auto_blocks(20000, 200) == 20
    # huge corpus: the memory floor ceil(n/8192) dominates (round 11:
    # the floor budgets the worker's gram-slice footprint, measured at
    # the 200k sf10fresh control — see _auto_blocks docstring)
    assert _auto_blocks(10_000_000, 32) == 1221
    # floor never exceeds what the cap allows going UP (floor > cap case)
    assert _auto_blocks(8192 * 4, 2) == 4


def test_knn_graph_invariant_to_block_count(spark, sf_dir):
    """The exactness argument in _auto_blocks' docstring, pinned: any B
    yields the identical graph (every pair meets in exactly one group;
    shrinking B only widens each group's candidate superset)."""
    from quantum_rag_data_pipeline_spark.operators import similarity as sim_ops

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    auto = sim_ops.knn_graph(e, k=3, dim=64)
    forced = sim_ops.knn_graph(e, k=3, dim=64, n_blocks=5)
    assert auto.exceptAll(forced).count() == 0
    assert forced.exceptAll(auto).count() == 0


def test_pareto_shares_ordered_and_gini_in_range(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["user_activity_pareto"](spark, sf_dir).first()
    assert 0.0 <= r.gini < 1.0
    # top-1% is a subset of top-10%; both are real shares
    assert 0.0 < r.share_top1pct <= r.share_top10pct <= 1.0
    # the top 10% of users must account for at least 10% of events
    assert r.share_top10pct >= 0.10 - 1e-9


def test_quality_logreg_buckets_partition_docs(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["quality_logreg_score"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        # bucket mean must lie inside the bucket's quarter-logit band
        assert r.score_bucket / 4.0 - 1e-9 <= r.avg_logit < (r.score_bucket + 1) / 4.0 + 1e-9


def test_fertility_at_least_one_subword_per_word(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    for r in QUERIES["tokenizer_fertility_by_lang"](spark, sf_dir).collect():
        # punctuation splitting can only create MORE tokens than whitespace
        assert r.fertility >= 1.0 and r.chars_per_token > 0


def test_watermark_append_withholds_open_tail(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES
    from quantum_rag_data_pipeline_spark.sources.registry import load_table

    out = QUERIES["streaming_watermark_append_semantics"](spark, sf_dir)
    ev = load_table(spark, "events", sf_dir)
    batch = ev.groupBy(F.date_trunc("day", "ts").alias("d")).count()
    n_days = batch.count()
    wm = ev.agg((F.max("ts") - F.expr("INTERVAL 2 DAYS")).alias("w")).first().w
    n_closed = batch.filter(F.col("d") + F.expr("INTERVAL 1 DAY") <= F.lit(wm)).count()
    got = out.count()
    # append mode: exactly the closed windows are emitted, never the open tail
    assert got == n_closed < n_days


def test_reconciliation_covers_all_orders_with_lineitems(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["order_totals_reconciliation"](spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_orders_with_lines = li.select("l_orderkey").distinct().count()
    assert sum(r.n_orders for r in rows) == n_orders_with_lines
    for r in rows:
        assert 0 <= r.n_reconciled <= r.n_orders
        assert r.mean_abs_diff <= r.max_abs_diff


def test_schema_evolution_missing_population_is_even_keys(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = {r.status: r.n_rows for r in QUERIES["schema_evolution_merge_read"](spark, sf_dir).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_even = o.filter(F.col("o_orderkey") % 2 == 0).count()
    assert rows.get("<missing>") == n_even
    assert sum(rows.values()) == o.count()


def test_rag_context_respects_budget_and_rank_order(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["rag_context_assembly"](spark, sf_dir).collect()
    assert len(rows) > 0
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        # ranks are a prefix (budget cuts the tail, never the middle)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert rs[-1].cum_tokens <= 192
        assert rs[-1].cum_tokens == sum(r.ntok for r in rs)
        # cosine non-increasing with rank
        for a, b in zip(rs, rs[1:]):
            assert a.cos_sim >= b.cos_sim


def test_k_anonymity_counts_consistent(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["k_anonymity_audit"](spark, sf_dir).first()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert r.n_groups == d.select("lang", "source").distinct().count()
    assert r.groups_below_k5 <= r.n_groups
    assert r.rows_below_k5 < 5 * max(1, r.groups_below_k5) + 1


def test_dataset_card_fields_consistent(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES
    import math

    r = QUERIES["dataset_card_report"](spark, sf_dir).first()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert r.n_docs == d.count()
    assert r.n_langs == d.select("lang").distinct().count()
    # entropy bounded by ln(n_langs); rates are probabilities
    assert 0 <= r.lang_entropy <= math.log(r.n_langs) + 1e-9
    assert 0 <= r.exact_dup_rate <= 1 and 0 <= r.quality_pass_rate <= 1
    assert abs(r.mean_doc_tokens * r.n_docs - r.n_tokens) < r.n_docs


def test_partition_pruning_scan_reduction(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["partition_pruning_measurement"](spark, sf_dir).first()
    assert r.partition_filter_pushed is True
    # the 10-day predicate must prune to a strict subset of the month
    assert 0 < r.n_days_scanned <= 10 < r.n_days_total


def test_pipe_syntax_equals_classic_sql(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES
    from quantum_rag_data_pipeline_spark.sources.registry import load_table

    out = {r.l_returnflag: (r.sum_qty, r.n_rows)
           for r in QUERIES["pipe_syntax_rollup"](spark, sf_dir).collect()}
    li = load_table(spark, "lineitem", sf_dir)
    ref = (li.filter(F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
           .groupBy("l_returnflag")
           .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(30,2)")).cast("double"), 2).alias("s"),
                F.count(F.lit(1)).alias("n")))
    for r in ref.collect():
        assert out[r.l_returnflag] == (r.s, r.n)


def test_try_divide_nulls_exactly_div_zero_rows(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES
    from quantum_rag_data_pipeline_spark.sources.registry import load_table

    rows = QUERIES["ansi_safe_arithmetic"](spark, sf_dir).collect()
    ev = load_table(spark, "events", sf_dir)
    n_zero = ev.filter(F.get_json_object("props", "$.k").cast("int") == 0).count()
    assert sum(r.n_div_zero for r in rows) == n_zero
    assert sum(r.n_rows for r in rows) == ev.count()


def test_map_surface_frequent_subset_of_all(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES
    import json

    for r in QUERIES["map_functions_surface"](spark, sf_dir).collect():
        allm = json.loads(r.type_counts_json)
        freq = json.loads(r.frequent_json)
        assert set(freq) <= set(allm)
        assert all(v >= 3 for v in freq.values())
        assert r.n_keys == len(allm)
        assert r.max_count == max(allm.values())


def test_stateful_accumulator_matches_batch_groupby(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["streaming_stateful_key_counts"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ref = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("event_id").cast("long").alias("min_id"),
    )
    assert out.exceptAll(ref).count() == 0 and ref.exceptAll(out).count() == 0


def test_collation_merges_case_variants(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES
    from quantum_rag_data_pipeline_spark.sources.registry import load_table

    rows = QUERIES["collation_aware_grouping"](spark, sf_dir).collect()
    ev = load_table(spark, "events", sf_dir)
    # CI groups == distinct lowercase types; each absorbed 2 spellings
    assert len(rows) == ev.select(F.lower("event_type")).distinct().count()
    for r in rows:
        assert r.n_case_variants == 2
    assert sum(r.n_rows for r in rows) == ev.count()


def test_xml_roundtrip_is_lossless(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES
    from quantum_rag_data_pipeline_spark.sources.registry import load_table

    rows = QUERIES["xml_ingest_shredding"](spark, sf_dir).collect()
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") < 1000)
    ref = {r.event_type: (r.n, r.c) for r in ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias("c"),
    ).collect()}
    got = {r.event_type: (r.n_rows, r.total_cents) for r in rows}
    assert got == ref


def test_bfs_levels_partition_the_node_set(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = {r.level: r.n_nodes for r in QUERIES["bfs_levels_copurchase"](spark, sf_dir).collect()}
    assert set(rows) == {-1, 0, 1, 2, 3}
    assert rows[0] == 1
    # levels + unreachable partition all nodes exactly once
    total = sum(rows.values())
    assert total > 1 and all(v >= 0 for v in rows.values())


def test_csv_ingest_counts_injected_corrupt_rows(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["csv_ingest_typed"](spark, sf_dir).collect()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(F.col("o_orderkey") < 5000)
    assert sum(r.n_good for r in rows) == o.count()
    for r in rows:
        assert r.n_corrupt == 2  # exactly the injected garbage lines


def test_jsonl_nested_struct_survives_roundtrip(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES
    from quantum_rag_data_pipeline_spark.sources.registry import load_table

    rows = QUERIES["jsonl_ingest_scan"](spark, sf_dir).collect()
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") < 2000)
    ref = {r.event_type: r.mk for r in ev.groupBy("event_type").agg(
        F.max(F.get_json_object("props", "$.k").cast("int")).alias("mk")).collect()}
    for r in rows:
        assert r.max_k == ref[r.event_type]


def test_format_matrix_checksums_agree_across_formats(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = {r.format: r for r in QUERIES["format_matrix_roundtrip"](spark, sf_dir).collect()}
    assert set(rows) == {"orc", "text"}
    # both codecs must carry the identical row set
    assert rows["orc"].n_rows == rows["text"].n_rows
    assert rows["orc"].id_checksum == rows["text"].id_checksum


def test_binaryfile_source_reads_exact_bytes(spark, sf_dir):
    import os

    path = f"{sf_dir}/events.parquet"
    df = spark.read.format("binaryFile").load(path)
    r = df.select("length", "content").first()
    assert r.length == os.path.getsize(path)
    assert len(r.content) == r.length


def test_range_frame_handles_calendar_gaps(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["range_frame_trailing_revenue"](spark, sf_dir).cache()
    # trailing sum >= the day's own revenue, never more than 7 days of data
    bad = out.filter(F.col("trailing_7d_revenue") < F.col("day_revenue") - 1e-6).count()
    assert bad == 0
    assert out.count() == out.select("day").distinct().count()
    out.unpersist()


def test_null_safe_join_gap_is_null_population(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = {r.join_semantics: r.n_matched
            for r in QUERIES["null_safe_join_semantics"](spark, sf_dir).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(F.col("o_orderkey") < 4000)
    n_null_keys = o.filter(F.col("o_orderstatus") == "O").count()
    # '=' loses exactly the NULL-keyed rows that '<=>' keeps
    assert rows["null_safe"] - rows["equals"] == n_null_keys


def test_scd2_point_in_time_join_is_one_to_one(spark, sf_dir):
    # intervals partition the per-user timeline, and every purchase day
    # has a daily row by construction — so the join is exactly 1:1 and
    # the tier rollup must account for every purchase event once.
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["scd2_point_in_time_join"](spark, sf_dir)
    matched = out.agg(F.sum("n_purchases")).first()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert matched == n_purchases


def test_incremental_agg_merge_equals_full_recompute(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["incremental_agg_maintenance"](spark, sf_dir).cache()
    assert out.filter(~F.col("matches_full_recompute")).count() == 0
    total = out.agg(F.sum("n_orders")).first()[0]
    assert total == spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    out.unpersist()


def test_logreg_gd_steps_structure(spark, sf_dir):
    import math

    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = {r.feature: r for r in QUERIES["logreg_gd_steps"](spark, sf_dir).collect()}
    assert set(rows) == {"bias", "kchars", "space_ratio"}
    for r in rows.values():
        assert all(math.isfinite(v) for v in
                   (r.weight_step1, r.weight_step2, r.mse_step2))
    # mse of a {0,1} label vs probabilities in (0,1) is bounded by 1,
    # and with p near 0.5 after one small step it cannot be ~0
    mse = rows["bias"].mse_step2
    assert 0.0 < mse <= 1.0
    # step 2 actually moved the weights (gradient is nonzero on this data)
    assert any(rows[f].weight_step1 != rows[f].weight_step2 for f in rows)


def test_tfidf_cosine_pairs_bounds_and_uniqueness(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["tfidf_cosine_pairs"](spark, sf_dir).cache()
    n = out.count()
    assert out.filter(
        (F.col("cosine") < 0.15) | (F.col("cosine") > 1.0 + 1e-9)
    ).count() == 0
    assert out.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0
    assert out.select("doc_a", "doc_b").distinct().count() == n
    out.unpersist()


def test_link_prediction_pairs_are_nonedges(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["link_prediction_scores"](spark, sf_dir).cache()
    assert out.filter(
        (F.col("jaccard") <= 0) | (F.col("jaccard") > 1.0)
        | (F.col("adamic_adar") <= 0) | (F.col("common_neighbors") < 2)
        | (F.col("node_a") >= F.col("node_b"))
    ).count() == 0
    # rebuild the edge set and prove zero overlap with predictions
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sup = (
        li.groupBy("l_partkey").agg(F.count_distinct("l_orderkey").alias("s"))
        .filter("s >= 8").select("l_partkey")
    )
    items = li.join(sup, "l_partkey").select("l_orderkey", "l_partkey").distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("node_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("node_b"))
    edges = (
        a.join(b, "l_orderkey").filter("node_a < node_b")
        .groupBy("node_a", "node_b").count().filter("count >= 2")
        .select("node_a", "node_b")
    )
    assert out.join(edges, ["node_a", "node_b"]).count() == 0
    out.unpersist()


def test_weekday_seasonality_covers_all_days(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["weekday_seasonality_decomposition"](spark, sf_dir).cache()
    rows = out.collect()
    assert {r.weekday for r in rows} <= set(range(1, 8))
    n_days = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderdate").cast("date")).distinct().count()
    )
    assert sum(r.n_days for r in rows) == n_days
    out.unpersist()


def test_cusum_stat_nonnegative_and_daily(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["cusum_changepoint_detection"](spark, sf_dir).cache()
    assert out.filter(F.col("cusum_stat") < 0).count() == 0
    n_days = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.to_date("ts")).distinct().count()
    )
    assert out.count() == n_days
    out.unpersist()


def test_arrow_udf_agrees_with_closed_form(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["arrow_python_udf_digital_root"](spark, sf_dir).cache()
    assert out.filter(~F.col("udf_matches_closed_form")).count() == 0
    total = out.agg(F.sum("n_orders")).first()[0]
    assert total == spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    out.unpersist()


def test_ab_test_welch_counts_and_df_bounds(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["ab_test_welch"](spark, sf_dir).first()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert r.n_view == ev.filter("event_type='view'").count()
    assert r.n_click == ev.filter("event_type='click'").count()
    # Welch-Satterthwaite df is bounded by min(n)-1 and n1+n2-2
    assert min(r.n_view, r.n_click) - 1 <= r.welch_df <= r.n_view + r.n_click - 2


def test_audience_overlap_bounds(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["audience_overlap_matrix"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.users_both <= min(r.users_a, r.users_b)
        assert 0 < r.jaccard <= 1.0
        assert r.hll_estimate_within_20pct is True


def test_bootstrap_ci_brackets_point_mean(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["bootstrap_ci_mean"](spark, sf_dir).first()
    assert r.n_replicates == 32
    assert r.ci_lo < r.ci_hi
    assert r.ci_lo <= r.point_mean <= r.ci_hi


def test_streaming_outer_join_accounts_for_every_click(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = {r.category: r.n_rows for r in
            QUERIES["streaming_outer_join_null_emission"](spark, sf_dir).collect()}
    assert set(rows) == {"matched", "null_emitted", "withheld"}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_clicks = ev.filter("event_type='click'").count()
    # every click is matched (>=1 pair), null-emitted, or withheld;
    # matched counts pairs (fan-out), so the inequality is the invariant
    assert rows["null_emitted"] + rows["withheld"] <= n_clicks
    assert rows["matched"] + rows["null_emitted"] + rows["withheld"] >= n_clicks


def test_dynamic_partition_overwrite_preserves_untouched(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["dynamic_partition_overwrite"](spark, sf_dir).first()
    assert r.untouched_partitions_preserved is True
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    target_day_rows = (
        ev.select(F.to_date("ts").alias("day"))
        .groupBy("day").count().orderBy("day").first()["count"]
    )
    # the rewritten partition holds only the even-id half
    assert r.rows_target_day < target_day_rows


def test_pca_power_iteration_matches_numpy(spark, sf_dir):
    import numpy as np

    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["pca_power_iteration"](spark, sf_dir).collect()
    assert len(rows) == 8
    eig = rows[0].gram_eigenvalue_est
    assert eig > 0
    # replicate the same 2-step power iteration in float numpy: the
    # micro-grid quantization error is ~1e-6 per step, so loadings must
    # agree to ~1e-3
    emb = np.array(
        [r.embedding for r in
         spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()],
        dtype=np.float64,
    )
    v = np.full(64, 0.125)
    for _ in range(2):
        y = emb.T @ (emb @ v)
        nrm = np.linalg.norm(y)
        v = y / nrm
    for r in rows:
        assert abs(abs(r.loading) - abs(v[r.dim])) < 1e-3
    assert abs(eig - nrm) / nrm < 1e-3


def test_rendezvous_hashing_minimal_movement(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = {r.shard: r for r in
            QUERIES["rendezvous_hashing_stability"](spark, sf_dir).collect()}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_before for r in rows.values()) == n_docs
    assert sum(r.n_after for r in rows.values()) == n_docs
    assert rows[3].n_after == 0
    assert sum(r.n_inherited for r in rows.values()) == rows[3].n_before
    assert all(r.only_removed_shard_moved for r in rows.values())


def test_kfold_cv_partitions_and_finite_coefs(spark, sf_dir):
    import math

    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["kfold_cv_ols"](spark, sf_dir).collect()
    assert len(rows) == 4
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    for r in rows:
        assert r.n_train + r.n_test == total
        assert math.isfinite(r.slope) and math.isfinite(r.intercept)
        assert r.test_mse >= 0


def test_kaplan_meier_survival_is_monotone_decreasing(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = sorted(
        QUERIES["kaplan_meier_survival"](spark, sf_dir).collect(),
        key=lambda r: r.duration_day,
    )
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= prev + 1e-9
        prev = r.survival
        assert r.n_events >= 1
    # at-risk counts are non-increasing over time
    risks = [r.n_at_risk for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_kl_divergence_nonnegative_and_asymmetric(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["kl_divergence_langs"](spark, sf_dir).first()
    # Gibbs: KL >= 0 (within micro-grid quantization)
    assert r.kl_a_to_b >= -1e-4 and r.kl_b_to_a >= -1e-4
    assert r.vocab_size > 0
    assert r.n_tokens_a > 0 and r.n_tokens_b > 0


def test_bucketed_join_shuffle_free_and_matches_plain_join(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["bucketed_join_no_shuffle"](spark, sf_dir).cache()
    assert out.filter(~F.col("join_is_shuffle_free")).count() == 0
    plain = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment").count()
    )
    got = {r.c_mktsegment: r.n_orders for r in out.collect()}
    exp = {r.c_mktsegment: r["count"] for r in plain.collect()}
    assert got == exp
    out.unpersist()


def test_time_hierarchy_grains_sum_to_same_total(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["time_hierarchy_rollup"](spark, sf_dir).cache()
    totals = {
        r.grain: r.total
        for r in out.groupBy("grain").agg(F.sum("n_orders").alias("total")).collect()
    }
    # every grain partitions the same order slice
    assert totals["day"] == totals["week"] == totals["month"]
    out.unpersist()


def test_attribution_models_agree_on_purchase_count(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["attribution_model_compare"](spark, sf_dir).cache()
    per_model = {
        r.model: (r.credits, r.revenue)
        for r in out.groupBy("model").agg(
            F.sum("n_credits").alias("credits"),
            F.round(F.sum("credited_revenue"), 2).alias("revenue"),
        ).collect()
    }
    # first and last touch allocate exactly one credit per attributed
    # purchase; linear allocates one per touch (>= purchases)
    assert per_model["first_touch"][0] == per_model["last_touch"][0]
    assert per_model["linear"][0] >= per_model["first_touch"][0]
    # single-credit models carry the full purchase value: totals equal
    assert abs(per_model["first_touch"][1] - per_model["last_touch"][1]) < 0.01
    # linear totals match to within a cent per touch (integer-cent split)
    assert abs(per_model["linear"][1] - per_model["first_touch"][1]) \
        <= 0.01 * per_model["linear"][0]
    out.unpersist()


def test_label_centroid_matrix_shape_and_bounds(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["label_centroid_distances"](spark, sf_dir).collect()
    labels = set()
    for r in rows:
        assert r.label_a < r.label_b
        assert -1.0 - 1e-6 <= r.centroid_cosine <= 1.0 + 1e-6
        labels |= {r.label_a, r.label_b}
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2


def test_observed_metrics_match_recomputation(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["observed_write_metrics"](spark, sf_dir).first()
    assert r.observed_equals_recomputed is True
    assert r.n_rows == spark.read.parquet(f"{sf_dir}/orders.parquet").count()


def test_update_mode_emits_every_group_twice(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["streaming_update_mode_semantics"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    totals = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    assert {r.event_type for r in rows} == set(totals)
    for r in rows:
        assert r.final_count == totals[r.event_type]
        assert r.n_emissions in (1, 2)
        assert r.first_emitted_count <= r.final_count


def test_file_provenance_each_day_one_file(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["file_provenance_audit"](spark, sf_dir).cache()
    assert out.filter(~F.col("file_path_matches_partition")).count() == 0
    assert out.filter(F.col("n_files") != 1).count() == 0
    total = out.agg(F.sum("n_rows")).first()[0]
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    out.unpersist()


def test_array_surface_intersection_is_subset(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    for r in QUERIES["array_functions_surface"](spark, sf_dir).collect():
        types = set(r.distinct_types.split(","))
        funnel = set(r.funnel_types.split(",")) - {""}
        assert funnel <= types & {"click", "purchase", "view"}
        assert r.n_types == len(types)


def test_null_semantics_identities(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["null_semantics_matrix"](spark, sf_dir).first()
    assert r.count_col < r.count_star  # nulls exist and are skipped
    assert r.asc_nulls_first_leads_null is True
    # UNKNOWN rows are exactly the null-keyed rows
    assert r.three_valued_unknowns == r.count_star - r.count_col
    # IS DISTINCT FROM counts nulls as non-matching values
    assert r.is_distinct_from_matches >= r.three_valued_unknowns


def test_timezone_histogram_covers_all_events(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["timezone_wall_clock_histogram"](spark, sf_dir).cache()
    assert out.agg(F.sum("n_events")).first()[0] == \
        spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.filter((F.col("ny_hour") < 0) | (F.col("ny_hour") > 23)).count() == 0
    out.unpersist()


def test_order_lifecycle_covers_orders_with_lines(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["order_lifecycle_durations"](spark, sf_dir)
    total = out.agg(F.sum("n_orders")).first()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert total == li.select("l_orderkey").distinct().count()
    for r in out.collect():
        # the synthetic generator doesn't enforce orderdate <= shipdate,
        # so only the max>=min spread invariant is data-independent
        assert r.avg_fulfillment_spread >= 0
        assert 0 <= r.n_orders_over_90d <= r.n_orders


def test_topn_other_preserves_regional_totals(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["topn_plus_other_rollup"](spark, sf_dir).cache()
    per_region = {
        r.region: r.total
        for r in out.groupBy("region").agg(
            F.round(F.sum("revenue"), 2).alias("total")
        ).collect()
    }
    named = out.filter(F.col("nation_bucket") != "OTHER") \
        .groupBy("region").count().collect()
    for r in named:
        assert r["count"] <= 3
    # totals must equal the plain rollup (the tail is bucketed, not dropped)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rg = spark.read.parquet(f"{sf_dir}/region.parquet")
    plain = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(rg, n["n_regionkey"] == rg["r_regionkey"])
        .groupBy("r_name")
        .agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double"), 2).alias("t"))
    )
    for r in plain.collect():
        assert abs(per_region[r.r_name] - r.t) < 0.02
    out.unpersist()


def test_kmv_estimate_within_bound(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["kmv_distinct_sketch"](spark, sf_dir).first()
    assert r.within_loose_bound is True
    assert r.exact_distinct >= 64


def test_cdc_apply_accounts_for_every_user(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["cdc_log_apply"](spark, sf_dir).first()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .filter(F.col("event_type").isin("view", "click", "purchase"))
    n_users = ev.select("user_id").distinct().count()
    assert r.n_live_rows + r.n_deleted_rows == n_users
    assert r.live_value_total >= 0


def test_band_join_is_one_to_one_and_plans_nested_loop(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["band_join_price_tiers"](spark, sf_dir).cache()
    total = out.agg(F.sum("n_orders")).first()[0]
    assert total == spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    out.unpersist()


def test_group_by_all_matches_explicit_grouping(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["group_by_all_surface"](spark, sf_dir)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .filter(F.col("l_shipdate") < F.lit("1998-09-01").cast("date"))
    explicit = li.groupBy("l_returnflag", "l_linestatus").count()
    got = {(r.l_returnflag, r.l_linestatus): r.n_lines for r in out.collect()}
    exp = {(r.l_returnflag, r.l_linestatus): r["count"] for r in explicit.collect()}
    assert got == exp


def test_seasonal_naive_scores_only_holdout_week(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    for r in QUERIES["seasonal_naive_backtest"](spark, sf_dir).collect():
        assert 1 <= r.n_days_scored <= 7
        assert r.mae >= 0 and r.wape >= 0


def test_conformal_quantile_is_calibration_residual(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["conformal_interval_coverage"](spark, sf_dir).first()
    assert r.n_calibration > 0 and r.n_test > 0
    assert 0 <= r.n_covered <= r.n_test
    assert r.interval_halfwidth >= 0


def test_expectations_all_pass_on_clean_testdata(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["data_expectations_report"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.passed is True and r.n_violations == 0, r.expectation


def test_feature_leakage_pit_never_exceeds_final(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["feature_leakage_audit"](spark, sf_dir).first()
    # cumulative as-of value can never exceed the final cumulative value,
    # so the average leaked amount is nonnegative; and any purchase that
    # precedes a user's last active day is leaky by construction
    assert r.avg_future_info_leaked >= 0
    assert 0 <= r.n_leaky_rows <= r.n_feature_rows
    n_purch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("event_type='purchase'").count()
    )
    assert r.n_feature_rows == n_purch


def test_tpch_q3_plan_uses_take_ordered(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    df = QUERIES["tpch_q3_shipping_priority"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_tpch_q5_local_constraint_holds(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["tpch_q5_local_supplier_volume"](spark, sf_dir).collect()
    # only ASIA nations can appear
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    asia = {
        x.n_name
        for x in n.join(r, n["n_regionkey"] == r["r_regionkey"])
        .filter("r_name='ASIA'").select("n_name").collect()
    }
    assert {x.n_name for x in rows} <= asia


def test_tpch_q10_top20_ordering(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["tpch_q10_returned_items"](spark, sf_dir).collect()
    assert len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_encoding_planner_recommends_dict_for_low_cardinality(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = {r.col: r for r in QUERIES["column_encoding_planner"](spark, sf_dir).collect()}
    assert rows["lang"].recommend_dictionary is True
    assert rows["text"].recommend_dictionary is False  # near-unique text
    assert rows["lang"].n_distinct < rows["source"].n_distinct <= rows["text"].n_distinct


def test_rfm_segments_partition_customers(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["rfm_segmentation"](spark, sf_dir).collect()
    n_custs = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_custs
    for r in rows:
        assert 1.0 <= r.avg_r <= 4.0 and 1.0 <= r.avg_f <= 4.0


def test_association_rules_bounds(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["association_rules_lift"](spark, sf_dir).collect()
    for r in rows:
        assert 0.1 <= r.confidence <= 1.0 + 1e-9
        assert r.lift > 0 and r.support_count >= 3
        assert r.antecedent != r.consequent


def test_snippet_window_contains_hits(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["snippet_best_window"](spark, sf_dir).cache()
    assert out.filter(F.col("n_matches") < 1).count() == 0
    # one best window per doc
    assert out.count() == out.select("doc_id").distinct().count()
    out.unpersist()


def test_aqe_coalesces_post_filter_shuffle(spark, sf_dir):
    # AQE must coalesce the 8 shuffle partitions of a tiny post-filter
    # aggregate down to fewer partitions at runtime
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    agg = o.filter("o_orderkey < 50").groupBy("o_orderpriority").count()
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan


def test_aqe_splits_skewed_join(spark, sf_dir):
    # one key carries ~all rows; with thresholds lowered AQE's skew-join
    # rule must split the hot partition
    from pyspark.sql import functions as FF

    keys = [
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.forceOptimizeSkewedJoin",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # the downstream aggregate requires hash partitioning; skew split
        # breaks it, so AQE only applies the rule when forced (or when no
        # required distribution follows) — force it for the plan pin
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # non-foldable 99%-hot key (a literal key constant-folds to a
        # cartesian and bypasses the join entirely)
        left = spark.range(0, 200_000).select(
            FF.when(FF.col("id") % 100 < 99, 0)
            .otherwise((FF.col("id") % 4)).cast("int").alias("k"),
            FF.lit("x" * 64).alias("pad"),
        )
        right = spark.range(0, 40_000).select(
            (FF.col("id") % 4).cast("int").alias("k"), FF.lit("dim").alias("d")
        )
        j = left.join(right, "k").groupBy("k").count()
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan and "skewed" in plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_filtered_search_respects_metadata_predicate(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["filtered_vector_search"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.label in (2, 3, 5)  # pre-filter respected
        assert -1.0 - 1e-6 <= r.cosine <= 1.0 + 1e-6
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.cosine)
    for cos in per_q.values():
        assert cos == sorted(cos, reverse=True) and len(cos) <= 5


def test_maxsim_dominates_any_single_vector(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["multivector_maxsim_retrieval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_vectors >= 1
        assert -1.0 - 1e-6 <= r.maxsim <= 1.0 + 1e-6


def test_quantile_transform_uniform_marginals(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = sorted(
        QUERIES["quantile_transform_scaler"](spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    n_total = sum(r.n_rows for r in rows)
    for r in rows:
        # uniform marginals: each decile holds ~10% of rows
        assert abs(r.n_rows - n_total / 10) <= n_total / 10 * 0.2 + 2
    # decile price ranges are non-overlapping and increasing
    for a, b in zip(rows, rows[1:]):
        assert a.max_price <= b.min_price + 1e-9


def test_personalized_pagerank_concentrates_on_seeds(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["personalized_pagerank_seeds"](spark, sf_dir).collect()
    assert rows
    seeds = [r for r in rows if r.is_seed]
    # restart mass keeps the seeds themselves in the top ranks
    assert len(seeds) >= 1
    total = sum(r.ppr for r in rows)
    # mass is conserved up to floor-division leakage: top-15 can't
    # exceed the unit total
    assert 0 < total <= 1.0 + 1e-9
    pprs = [r.ppr for r in rows]
    assert pprs == sorted(pprs, reverse=True)


def test_matched_pairs_cover_every_treated_user(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["matched_cohort_rank_pairing"](spark, sf_dir).first()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    treated = (
        ev.select("user_id").distinct()
        .filter(((F.col("user_id") * 2654435761 + 283521) % 4294967296) % 2 == 1)
        .count()
    )
    assert r.n_pairs == treated
    assert 0 <= r.avg_activity_gap <= r.worst_pair_gap


def test_phash_recovers_every_injected_twin(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["image_phash_near_dup"](spark, sf_dir).cache()
    n_images = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id % 3 = 0").count()
    )
    # the sum-preserving 2-pixel nudge flips at most 2 bits, and the
    # 4-block pigeonhole guarantees a bucket hit: every twin MUST appear
    twins = out.filter(F.col("is_injected_twin"))
    assert twins.count() == n_images
    assert twins.filter(F.col("hamming") > 2).count() == 0
    assert out.filter(F.col("id_a") >= F.col("id_b")).count() == 0
    out.unpersist()


def test_seasonal_anomalies_are_a_tail(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["seasonal_adjusted_anomalies"](spark, sf_dir).cache()
    n_days = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderdate").cast("date")).distinct().count()
    )
    n_anom = out.count()
    assert 0 <= n_anom < 0.15 * n_days
    assert out.filter(~F.col("is_anomaly")).count() == 0
    out.unpersist()


def test_price_volume_bridge_closes(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["price_volume_decomposition"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bridge_closes is True
        assert abs(r.total_change - (r.volume_effect + r.price_effect)) < 0.1


def test_bag_of_words_detects_constructed_permutation(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.operators import text as text_ops
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["dedup_bag_of_words"](spark, sf_dir).first()
    assert r.n_docs == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert r.n_bow_duplicates >= r.n_order_permuted_variants >= 0
    # the detector itself must not be blind: a constructed word
    # permutation collides on bow_fp but not exact_fp
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta delta")],
        "doc_id long, text string",
    )
    fp = df.select(
        F.md5(F.array_join(F.array_sort(text_ops.tokens("text")), " ")).alias("bow"),
        F.md5(F.array_join(text_ops.tokens("text"), " ")).alias("exact"),
    ).collect()
    assert fp[0].bow == fp[1].bow and fp[0].exact != fp[1].exact
    assert fp[0].bow != fp[2].bow


def test_ignore_nulls_window_matches_groupby_derivation(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = {r.user_id: r for r in
           QUERIES["window_ignore_nulls_matrix"](spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter("user_id < 40")
    nn = ev.filter("event_type <> 'view'")
    firsts = {
        r.user_id: round(r.v, 2)
        for r in nn.groupBy("user_id")
        .agg(F.min_by("value", F.struct("ts", "event_id")).alias("v")).collect()
    }
    lasts = {
        r.user_id: round(r.v, 2)
        for r in nn.groupBy("user_id")
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("v")).collect()
    }
    for uid, r in out.items():
        assert r.first_non_null == firsts.get(uid)
        assert r.last_non_null == lasts.get(uid)


def test_regexp_extract_all_counts_are_consistent(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    for r in QUERIES["regexp_extract_all_surface"](spark, sf_dir).collect():
        n_distinct = len([x for x in r.doubled_sorted.split(",") if x])
        assert n_distinct <= r.n_doubled
        assert r.n_doubled >= 0 and r.n_st_words >= 0
        assert r.n_doubled + r.n_st_words > 0


def test_lpa_communities_cover_all_nodes(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["label_propagation_communities"](spark, sf_dir).collect()
    assert rows
    sizes = [r.n_members for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    assert all(s >= 1 for s in sizes)


def test_wl_refinement_is_monotone(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["wl_node_signatures"](spark, sf_dir).first()
    assert r.refinement_monotone is True
    assert r.classes_r0 <= r.classes_r1 <= r.classes_r2 <= r.n_nodes


def test_chained_windows_emit_complete_weeks_only(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = sorted(
        QUERIES["streaming_chained_window_aggs"](spark, sf_dir).collect(),
        key=lambda r: r.week_start,
    )
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    import datetime

    mx = ev.agg(F.max("ts")).first()[0]
    for r in rows:
        # only weeks fully behind the watermark emit
        assert r.week_start + datetime.timedelta(days=7) \
            <= mx - datetime.timedelta(days=2)
        assert r.max_daily_events <= r.total_events
        assert 1 <= r.n_days <= 7


def test_bellman_ford_distances_monotone_and_seeded(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = sorted(
        QUERIES["bellman_ford_bounded"](spark, sf_dir).collect(),
        key=lambda r: r.rk,
    )
    assert rows
    assert rows[0].dist_micro == 0  # the seed itself
    dists = [r.dist_micro for r in rows]
    assert dists == sorted(dists)


def test_strict_funnel_is_monotone_and_tighter_than_loose(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = {r.stage: r for r in
            QUERIES["strict_funnel_bounded_gaps"](spark, sf_dir).collect()}
    v = rows["viewed"].n_users
    c = rows["clicked_within_1h"].n_users
    p = rows["purchased_within_1h_of_click"].n_users
    assert v >= c >= p >= 0
    for st in ("clicked_within_1h", "purchased_within_1h_of_click"):
        r = rows[st]
        if r.n_users > 0:
            assert 0 < r.median_gap_seconds <= 3600


def test_growth_accounting_ledger_closes(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = sorted(
        QUERIES["user_growth_accounting"](spark, sf_dir).collect(),
        key=lambda r: r.week_start,
    )
    assert rows
    wau = [r.n_new + r.n_retained + r.n_resurrected for r in rows]
    # WAU(t) - WAU(t-1) = new + resurrected - churned for every interior week
    for prev_wau, r, cur_wau in zip(wau, rows[1:], wau[1:]):
        assert cur_wau - prev_wau == r.n_new + r.n_resurrected - r.n_churned
    # first week: everyone is new
    assert rows[0].n_retained == 0 and rows[0].n_resurrected == 0


def test_peak_concurrency_bounds(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["peak_concurrency_analysis"](spark, sf_dir).first()
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert 1 <= r.peak_concurrent <= n_users
    assert r.n_sessions >= n_users  # every user has at least one session
    assert r.first_peak_at is not None


def test_skyline_is_an_antichain(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["pareto_skyline_2d"](spark, sf_dir).collect()
    assert rows
    assert rows[0].skyline_size >= len(rows) > 0
    # no frontier point dominates another (>= on both axes, > on one)
    for a in rows:
        for b in rows:
            if a.o_orderkey == b.o_orderkey:
                continue
            dominates = (
                a.price >= b.price and a.order_day >= b.order_day
                and (a.price > b.price or a.order_day > b.order_day)
            )
            assert not dominates, (a, b)


def test_multiset_ops_obey_bag_algebra(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = {r.op: r.n_rows for r in
            QUERIES["multiset_ops_semantics"](spark, sf_dir).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    na = o.filter("o_orderpriority = '1-URGENT'").count()
    assert rows["intersect_all"] >= rows["intersect_distinct"]
    assert rows["except_all"] >= rows["except_distinct"]
    # |A| = |A intersect_all B| + |A except_all B| (bag identity)
    assert rows["intersect_all"] + rows["except_all"] == na


def test_window_origin_covers_all_events(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["window_origin_offset_semantics"](spark, sf_dir).cache()
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # every window starts at 06:00 local
    import datetime

    for r in out.collect():
        assert r.win_start.hour == 6 and r.win_start.minute == 0
    out.unpersist()


def test_streaming_sketch_pins_hold(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["streaming_approx_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.stream_equals_batch_estimate is True
        assert r.stream_estimate_within_5pct is True
        assert r.exact_users > 0


def test_shadow_compare_counts_are_consistent(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["shadow_model_compare"](spark, sf_dir).first()
    assert r.n_docs == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # flip accounting: kept_new = kept_old - newly_dropped + newly_kept
    assert r.kept_new == r.kept_old - r.newly_dropped + r.newly_kept
    assert 0 <= r.decision_flip_rate <= 1


def test_business_days_never_exceed_calendar_days(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.operators import text as _  # noqa: F401
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["business_days_latency"](spark, sf_dir).collect()
    assert rows
    # closed-form sanity on a known pair: Mon 1970-01-05 -> Mon 1970-01-12
    # is exactly 5 business days
    from pyspark.sql import functions as FF

    probe = spark.sql("""
        SELECT (5 * (d2 div 7) + LEAST(d2 % 7, 5))
             - (5 * (d1 div 7) + LEAST(d1 % 7, 5)) AS bd
        FROM (SELECT 0 AS d1, 7 AS d2)
    """).first()
    assert probe.bd == 5
    for r in rows:
        assert 0 <= r.n_within_20bd <= r.n_orders


def test_stemming_reduces_vocab_without_losing_tokens(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["stemming_vocab_reduction"](spark, sf_dir).first()
    assert r.vocab_stemmed <= r.vocab_raw
    assert 0 <= r.vocab_reduction < 1
    assert 0 <= r.n_tokens_changed <= r.n_tokens


def test_tpch_q1_accounting_identities(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["tpch_q1_pricing_summary"](spark, sf_dir).collect()
    assert rows
    total = sum(r.count_order for r in rows)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .filter(F.col("l_shipdate") <= F.lit("2001-06-01").cast("date"))
    assert total == li.count()
    for r in rows:
        # discounting lowers price; tax raises it back above disc price
        assert r.sum_disc_price <= r.sum_base_price
        assert r.sum_charge >= r.sum_disc_price
        assert 0 <= r.avg_disc <= 0.2


def test_tpch_q18_every_order_exceeds_threshold(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["tpch_q18_large_volume"](spark, sf_dir).collect()
    for r in rows:
        assert r.total_qty > 150
    prices = [r.o_totalprice for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_imputation_beats_random_baseline(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["categorical_imputation_accuracy"](spark, sf_dir).first()
    assert r.n_masked > 0
    assert 0 <= r.n_correct <= r.n_masked
    assert 0 < r.random_baseline <= 1


def test_psi_nonnegative_and_bins_fixed(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["psi_drift_monitor"](spark, sf_dir).first()
    # PSI is a symmetrized KL — nonnegative up to micro-grid quantization
    assert r.psi >= -1e-4
    assert r.n_bins == 10


def test_calibration_bins_and_ece_consistent(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["calibration_reliability_ece"](spark, sf_dir).collect()
    assert rows
    total = sum(r.n_docs for r in rows)
    assert total == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    ece = rows[0].ece
    assert all(abs(r.ece - ece) < 1e-9 for r in rows)
    # ECE is the weighted mean of per-bin |pred - obs| gaps
    manual = sum(
        abs(r.avg_predicted - r.observed_rate) * r.n_docs for r in rows
    ) / total
    assert abs(manual - ece) < 1e-4
    for r in rows:
        assert 0 <= r.avg_predicted <= 1 and 0 <= r.observed_rate <= 1


def test_gains_curve_is_monotone_to_one(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = sorted(
        QUERIES["cumulative_gains_by_decile"](spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    gains = [r.cumulative_gain for r in rows]
    assert gains == sorted(gains)
    assert abs(gains[-1] - 1.0) < 1e-9
    total = sum(r.n_docs for r in rows)
    assert total == spark.read.parquet(f"{sf_dir}/documents.parquet").count()


def test_auc_matches_naive_pair_count(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["auc_exact_rank_sum"](spark, sf_dir).first()
    assert 0 <= r.auc <= 1
    # verify against the O(n_pos*n_neg) definition locally (tiny sf)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    import math

    pts = []
    for row in d:
        x1 = round(row.n_chars / 1000.0, 6)
        x2 = round((len(row.text) - len(row.text.replace(" ", ""))) / row.n_chars, 6)
        z = round(-1.2 + 0.9 * x1 + 2.0 * x2, 6)
        pts.append((1 if row.lang == "en" else 0, z))
    pos = [z for y, z in pts if y == 1]
    neg = [z for y, z in pts if y == 0]
    wins = sum(
        1.0 if zp > zn else (0.5 if zp == zn else 0.0)
        for zp in pos for zn in neg
    )
    naive = wins / (len(pos) * len(neg))
    assert math.isclose(r.auc, naive, abs_tol=1e-5)
    assert r.n_positives == len(pos) and r.n_negatives == len(neg)


def test_role_playing_ship_month_never_precedes_data_range(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    out = QUERIES["role_playing_date_dims"](spark, sf_dir).cache()
    total = out.agg(F.sum("n_orders")).first()[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("date"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with_lines = o.join(
        li.select("l_orderkey").distinct(),
        o["o_orderkey"] == F.col("l_orderkey"),
    ).count()
    assert total == with_lines
    out.unpersist()


def test_interval_overlap_counts_bounded_by_sessions(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["interval_overlap_join"](spark, sf_dir).collect()
    assert {r.promo for r in rows} <= {"week1_flash", "mid_month", "month_end"}
    for r in rows:
        assert r.n_users <= r.n_overlapping_sessions
        assert r.session_value >= 0


def test_recsys_metrics_in_valid_ranges(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["recsys_coverage_diversity"](spark, sf_dir).first()
    assert 0 < r.catalog_coverage <= 1
    # 10 queries x top-5 bounds distinct recommendations
    assert 1 <= r.n_recommended <= 50
    assert 0 <= r.intra_list_diversity <= 2.0 + 1e-6


def test_kcore_peeling_monotone(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["kcore_decomposition_bounded"](spark, sf_dir).first()
    assert r.peeling_monotone is True
    assert r.n_nodes >= r.after_round1 >= r.after_round2 >= r.after_round3 >= 0


def test_rank_churn_accounting(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["topk_rank_churn"](spark, sf_dir).first()
    assert r.n_stayed + r.n_entered == r.k
    assert r.n_entered == r.n_dropped
    assert 0 <= r.jaccard_stability <= 1


def test_pseudonymization_is_bijective_and_invertible(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["pseudonymization_bijective"](spark, sf_dir).first()
    assert r.no_collisions is True
    assert r.count_profile_preserved is True
    # the modular inverse of the odd multiplier recovers the original id
    A, M = 2654435761, 4294967296
    inv = pow(A, -1, M)
    uid = 12345
    pid = (uid * A + 40503) % M
    assert ((pid - 40503) * inv) % M == uid


def test_stickiness_bounded_by_one(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["dau_mau_stickiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.stickiness <= 1.0 + 1e-9
        assert r.avg_dau <= r.mau


def test_latency_percentiles_ordered(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["latency_percentile_slo"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.p50 <= r.p90 <= r.p99
        assert r.n_lines > 0


def test_negative_samples_never_collide_with_positives(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["negative_sampling_implicit"](spark, sf_dir).first()
    assert r.n_drawn == 3 * r.n_positives
    assert 0 < r.n_clean_negatives <= r.n_drawn
    assert 0 < r.acceptance_rate <= 1


def test_abc_classes_partition_revenue(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = {r.abc_class: r for r in
            QUERIES["abc_inventory_classification"](spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    total_share = sum(r.revenue_share for r in rows.values())
    assert abs(total_share - 1.0) < 1e-4
    # Pareto shape: class A has fewer parts per revenue dollar than C
    if "C" in rows:
        a, c = rows["A"], rows["C"]
        assert a.revenue / max(a.n_parts, 1) > c.revenue / max(c.n_parts, 1)


def test_power_calc_scales_with_effect(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["sample_size_power_calc"](spark, sf_dir).first()
    assert r.n_required_per_arm > 0
    # closed-form sanity: tiny observed effects need huge samples
    if abs(r.observed_effect) < 0.02:
        assert r.n_required_per_arm > 1000


def test_uplift_near_zero_under_null_treatment(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["segment_uplift_report"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_treated > 0 and r.n_control > 0
        # uplift rounds from the unrounded rates; 2 ulp at 1e-6 scale
        assert abs(r.uplift - (r.rate_treated - r.rate_control)) < 2.1e-6
        # A/A sanity only where the arms are big enough for the CLT:
        # tiny sf0.001 segments legitimately swing wide
        if min(r.n_treated, r.n_control) >= 200:
            assert abs(r.uplift) < 0.25


def test_id_sequence_audit_matches_direct_counts(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["id_sequence_gap_audit"](spark, sf_dir).first()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert r.n_rows == ev.count()
    assert r.n_missing_ids >= 0 and r.n_duplicate_ids >= 0
    assert r.n_gap_runs <= r.n_missing_ids or r.n_missing_ids == 0
    if r.sequence_complete:
        assert r.n_missing_ids == 0 and r.n_duplicate_ids == 0


def test_decayed_ranking_top15_sorted_and_bounded(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["decayed_popularity_ranking"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 15
    scores = [r.decayed_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # decayed weight per sale is at most 1
        assert r.decayed_score <= r.n_lifetime_sales + 1e-9


def test_funnel_windows_are_monotone(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["funnel_window_sensitivity"](spark, sf_dir).first()
    assert r.converted_15m <= r.converted_1h <= r.converted_6h <= r.converted_ever
    assert r.converted_ever <= r.n_viewers


def test_trigram_paths_have_three_steps(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["action_trigram_paths"](spark, sf_dir).collect()
    assert rows
    types = {
        r.event_type
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type").distinct().collect()
    }
    for r in rows:
        steps = r.path.split(">")
        assert len(steps) == 3 and set(steps) <= types
        assert r.n_users <= r.n_occurrences


def test_debut_velocity_bounded_by_28_days(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["item_debut_velocity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_new_items > 0
        assert 1 <= r.avg_first28_sales <= r.best_debut


def test_retention_rates_in_unit_interval(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["dn_retention_curve"](spark, sf_dir).first()
    assert r.n_users == (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    for v in (r.d1_retention, r.d7_retention, r.d14_retention):
        assert v is None or 0 <= v <= 1


def test_abandonment_rate_bounds(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["session_abandonment_rate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_abandoned <= r.n_sessions
        assert r.abandonment_rate is None or 0 <= r.abandonment_rate <= 1


def test_burn_rate_alert_requires_both_windows(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["slo_burn_rate_multiwindow"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.burn_1d >= 0 and r.burn_7d >= 0
        if r.page_alert:
            assert r.burn_1d > 1.0 and r.burn_7d > 1.0


def test_littles_law_pinned(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    r = QUERIES["littles_law_identity"](spark, sf_dir).first()
    assert r.littles_law_holds is True
    assert r.avg_concurrency_L > 0
    # cross-check L against the independent product of rounded outputs
    assert abs(r.avg_concurrency_L
               - r.arrival_rate_per_sec * r.avg_duration_sec_W) < 0.01
