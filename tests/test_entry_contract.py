"""Driver-contract invariants: entry/queries/oracle_sql shape + determinism."""

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query is callable
    assert all(callable(f) for f in qs.values())
    # substantial coverage: at least 40 queries; rows-only (no-oracle)
    # budget is 10: adwin, impute, logreg_cv, ivf_kmeans, model_zoo,
    # model_selection_grid (MLlib), and the four sequence-model cells
    # lstm_cv / gru_cv / conv1d_cv / cnn_lstm_cv (iterative training is
    # not SQL-expressible; gradients finite-difference-verified in
    # tests/test_deep.py). ann_lsh_topk graduated in r06 via md5-derived
    # (SQL-replayable) hyperplanes; ivf_kmeans got its deterministic
    # twin ivf_lloyd_topk in r07; quantile_3way_label_approx graduated
    # in r09 via a label-level (cut-point-free) oracle.
    assert len(qs) >= 40
    assert len(set(qs) - set(oracles)) <= 10


def test_entry_runs_and_is_deterministic(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == entrymod.entry(spark).columns
    again = entrymod.entry(spark).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_sample_queries_run_at_sf0001(spark, sf_dir):
    qs = entrymod.queries()
    for name in ("daily_event_stats", "pbsi_composite", "gaps_islands_segments"):
        out = qs[name](spark, sf_dir)
        assert out.count() > 0, name


def test_attestation_window_is_stable():
    """The external harness attests the FIRST 50 queries; pin the window so
    a stray registration cannot silently displace an entry before it has
    been attested. Round-9 window = the canary + every new or
    behavior-touched query this round + the 13 r05 leftovers + 6 of the
    44-query r06 cohort (remainder rolls to r10; ledger in COVERAGE.md).
    Rows-only (no-oracle) queries must NOT occupy window slots."""
    names = list(entrymod.queries())
    window = names[:50]
    oracles = entrymod.oracle_sql()
    assert window[0] == "daily_event_stats"  # cross-round canary
    for must in (
        # new this round: the ExactSubstr span-cut intervention; the
        # approx-quantile path's new oracle; the Bloom-prefiltered exact
        # screen; the CMS-prefiltered exact heavy hitters; BM25 lexical
        # retrieval; the RRF hybrid combiner; the bigram LM quality
        # score; the TPC-H Q7/Q10 join-order shapes
        "duplicate_span_cut", "quantile_3way_label_approx",
        "bloom_screen_decisions", "heavy_hitter_tokens",
        "bm25_topk", "hybrid_rrf_topk", "bigram_surprisal",
        "repetition_profile", "volume_shipping", "returned_item_report",
        # behavior-touched late-r09: the ingest stream's new
        # hp-partitioned index layout + Bloom-pruned exact screen
        "streaming_ingest_decisions",
        # behavior-touched r09: deterministic salt, minhash checkpoint
        # placement, artifact-writer explicit partition counts, streaming
        # index append repartition + compaction, encrypted-backup keybag
        # reuse + NaN size guard
        "salted_priority_counts", "salted_join_revenue",
        "minhash_lsh_pairs", "vector_index_topk", "multitable_index_topk",
        "ivf_index_topk", "incremental_vector_decisions",
        "streaming_vector_decisions", "encrypted_backup_scan",
        "encrypted_payload_scan",
        # r05-leftover rotation (the full 13)
        "audio_frame_features", "cluster_best_keeper",
        "cube_segment_priority", "customer_spend_quartiles",
        "daily_tag_sets", "incremental_exact_dedup", "langid_confusion",
        "ngram_jaccard_pairs", "ngram_novelty", "reagg_consistency",
        "stratified_sample_k", "user_last_value", "xml_records_scan",
        # new this round (third session): flat PQ, IVFADC (residual
        # PQ over trained cells) and the TPC-H Q8/Q13/Q17/Q22 shapes
        "pq_adc_topk", "ivf_pq_topk", "ivfpq_index_topk", "market_share",
        "customer_order_distribution",
        "small_quantity_revenue", "idle_customer_balance",
        "disjunctive_brand_revenue", "sole_return_supplier",
        # r06 cohort rotation (spot-pin a representative subset;
        # iphone_backup_scan is also r09-behavior-touched)
        "iphone_backup_scan", "anchor_first_window", "ann_lsh_topk",
        "chunk_dedup_profile", "dedup_clusters",
    ):
        assert must in window, must
    # every window slot must carry a value-hash oracle: a rows-only entry
    # posts as `err: no_oracle` (red on the driver board) by construction
    no_oracle_in_window = [n for n in window if n not in oracles]
    assert not no_oracle_in_window, no_oracle_in_window


def test_front_order_fits_attestation_window():
    """Everything placed in _FRONT_ORDER is meant to be attested; if the
    list outgrows the harness's first-50 window, the tail silently loses
    its attestation — fail loudly instead."""
    from practicum2_nof1_adhd_bd_spark import registry

    assert len(registry._FRONT_ORDER) <= 50


def test_no_oracle_emits_hugeint():
    """DuckDB widens sum(integer) to HUGEINT (int128); Spark emits BIGINT.
    The driver's value hasher renders the two differently even when the
    numbers are equal, so a single uncast integer sum() in an oracle turns
    its query hash-red (the root cause of all six r05 failures). Bind every
    oracle's plan and assert no result column is HUGEINT — integer sums
    must be CAST(... AS BIGINT)."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders "
        "lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    offenders = []
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)  # lazy: binds types without executing
        for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
            if "HUGEINT" in typ:
                offenders.append((name, col, typ))
    assert not offenders, offenders


def test_readme_counts_match_registry():
    """README drift guard (r05 verdict): the advertised query/oracle counts
    must track the registry."""
    import re

    text = open("README.md").read()
    m = re.search(r"\*\*(\d+) registered queries\*\* \((\d+) with", text)
    assert m, "README query-count line missing"
    qs, orc = entrymod.queries(), entrymod.oracle_sql()
    assert int(m.group(1)) == len(qs), (m.group(1), len(qs))
    assert int(m.group(2)) == len(orc), (m.group(2), len(orc))


def test_bench_headline_queries_exist():
    """bench.py's HEADLINE list must track the registry — a renamed query
    would otherwise break the driver's per-round bench run."""
    import bench

    qs = entrymod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, missing
