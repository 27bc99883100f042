"""Driver-contract invariants: entry/queries/oracle_sql shape + determinism."""

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query is callable
    assert all(callable(f) for f in qs.values())
    # substantial coverage: at least 40 queries; rows-only (no-oracle)
    # budget is 8: adwin, impute, logreg_cv, lstm_cv (r07 numpy-BPTT
    # net — iterative training is not SQL-expressible), ivf_kmeans,
    # model_zoo, quantile_3way_label_approx (sketch cut points are
    # ulp-unstable), model_selection_grid (MLlib). ann_lsh_topk
    # graduated in r06 via md5-derived (SQL-replayable) hyperplanes;
    # ivf_kmeans got its deterministic twin ivf_lloyd_topk in r07.
    assert len(qs) >= 40
    assert len(set(qs) - set(oracles)) <= 8


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
    been attested. Round-8 window = the canary + every new or
    behavior-touched query this round + the r03-remainder cohort + the
    r05 cohort. Rows-only (no-oracle) queries must NOT occupy window
    slots."""
    names = list(entrymod.queries())
    window = names[:50]
    oracles = entrymod.oracle_sql()
    assert window[0] == "daily_event_stats"  # cross-round canary
    for must in (
        # new this round: unified int8 index artifact, directed
        # multi-probe, CDA oracle, SemDeDup over trained cells
        "vector_index_topk", "ann_multiprobe_topk", "multitable_index_topk",
        "cda_probe", "semantic_dedup_ivf", "encrypted_backup_scan",
        "encrypted_payload_scan", "ivf_index_topk",
        "salted_priority_counts", "salted_join_revenue",
        "csv_permissive_scan", "medallion_silver_scan", "media_resize_scan",
        # behavior/oracle-touched: int8-form ingest screens, checkpointed
        # multitable candidates, Lloyd fit extraction, localCheckpoint'd
        # LSH frames
        "incremental_vector_decisions", "streaming_vector_decisions",
        "ann_multitable_topk", "ivf_lloyd_topk",
        "minhash_lsh_pairs", "incremental_near_dup",
        # new late-r08: position-level duplicate spans, TPC-H Q5 shape
        "duplicate_spans", "local_supplier_volume",
        # r03-remainder cohort rotation (spot-pin a representative subset)
        "asof_snapshot_select", "boundary_range_join", "dedup_by_key",
        "safe_ratio_daily", "rolling_corr_7d", "segment_zscore_month",
        "topk_per_group", "language_id", "token_stats",
        "winnow_fingerprints", "media_real_decode",
        # r05 cohort rotation (spot-pin a representative subset;
        # xml_records_scan + user_last_value rolled to the r09 ledger to
        # make room for the late-r08 queries)
        "daily_median_stats", "date_spine_unify", "outer_join_daily",
        "gaps_islands_segments", "unigram_surprisal",
        "snapshot_diff_report",
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
