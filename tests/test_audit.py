"""Audit framework tests — checks fire on planted defects."""

import datetime as dt

from practicum2_nof1_adhd_bd_spark.operators import audit


def _daily(spark, rows):
    return spark.createDataFrame(
        rows, "date date, value_mean double, value_min double, value_std double"
    )


def test_audit_clean_frame_all_ok(spark):
    d0 = dt.date(2024, 1, 1)
    rows = [
        (d0 + dt.timedelta(days=i), 50.0 + i, 40.0 + i, 5.0) for i in range(10)
    ]
    rep = {r["check_name"]: r for r in audit.audit_daily_frame(_daily(spark, rows)).collect()}
    assert len(rep) == 4
    assert all(r["severity"] == "OK" for r in rep.values())


def test_audit_duplicate_dates_critical(spark):
    d = dt.date(2024, 1, 1)
    rows = [(d, 1.0, 0.5, 1.0), (d, 2.0, 1.0, 1.0)]
    rep = {r["check_name"]: r for r in audit.audit_daily_frame(_daily(spark, rows)).collect()}
    assert rep["duplicate_dates"]["severity"] == "CRITICAL"
    assert rep["duplicate_dates"]["metric"] == 1.0


def test_audit_fabrication_fires(spark):
    # constant signal: min == mean and std == 0 on every day
    d0 = dt.date(2024, 1, 1)
    rows = [(d0 + dt.timedelta(days=i), 60.0, 60.0, 0.0) for i in range(10)]
    rep = {r["check_name"]: r for r in audit.audit_daily_frame(_daily(spark, rows)).collect()}
    assert rep["fabrication_min_eq_mean_pct"]["severity"] == "WARNING"
    assert rep["fabrication_min_eq_mean_pct"]["metric"] == 100.0
    assert rep["fabrication_zero_std_pct"]["severity"] == "WARNING"


def test_audit_span_gap_warning(spark):
    d0 = dt.date(2024, 1, 1)
    # 5 present days across a 30-day span -> ~83% missing
    rows = [(d0 + dt.timedelta(days=i * 7), 50.0, 40.0, 2.0) for i in range(5)]
    rep = {r["check_name"]: r for r in audit.audit_daily_frame(_daily(spark, rows)).collect()}
    assert rep["span_missing_pct"]["severity"] == "WARNING"
    assert rep["span_missing_pct"]["metric"] > 80


def test_audit_value_ranges_fires_on_out_of_band(spark):
    d0 = dt.date(2024, 1, 1)
    # 2 of 10 daily means outside [30, 220] -> 20% > 10% threshold; three
    # single-sample days -> INFO row carries 30%, never gates
    rows = [
        (d0 + dt.timedelta(days=i), 300.0 if i < 2 else 60.0, 1 if i < 3 else 50)
        for i in range(10)
    ]
    d = spark.createDataFrame(rows, "date date, value_mean double, n_events int")
    rep = {r["check_name"]: r for r in audit.audit_value_ranges(d).collect()}
    assert rep["range_violation_pct"]["severity"] == "CRITICAL"
    assert rep["range_violation_pct"]["metric"] == 20.0
    assert rep["single_sample_days_pct"]["severity"] == "INFO"
    assert rep["single_sample_days_pct"]["metric"] == 30.0


def test_audit_cross_layer_detects_dropped_day(spark):
    import pyspark.sql.functions as F

    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1 + d, h), 50.0) for d in range(3) for h in range(4)],
        "ts timestamp, value double",
    )
    daily = ev.groupBy(F.to_date("ts").alias("date")).agg(
        F.avg("value").alias("value_mean")
    )
    spine = daily.agg(F.min("date").alias("d0"), F.max("date").alias("d1")).select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("date")
    )
    unified = spine.join(daily, "date", "left")
    rep = {r["check_name"]: r
           for r in audit.audit_cross_layer(ev, daily, unified).collect()}
    assert rep["xlayer_events_vs_daily_days"]["severity"] == "OK"
    assert rep["xlayer_daily_vs_unified_days"]["severity"] == "OK"
    assert rep["xlayer_unified_coverage_pct"]["metric"] == 100.0
    # drop a day from the daily layer: events->daily goes CRITICAL
    broken = daily.filter(F.col("date") != dt.date(2024, 1, 2))
    rep2 = {r["check_name"]: r
            for r in audit.audit_cross_layer(ev, broken, unified).collect()}
    assert rep2["xlayer_events_vs_daily_days"]["severity"] == "CRITICAL"
    assert rep2["xlayer_events_vs_daily_days"]["metric"] == 1.0
    # unified layer losing days relative to daily: WARNING
    lossy = unified.filter(F.col("date") == dt.date(2024, 1, 1))
    rep3 = {r["check_name"]: r
            for r in audit.audit_cross_layer(ev, daily, lossy).collect()}
    assert rep3["xlayer_daily_vs_unified_days"]["severity"] == "WARNING"


def test_reagg_consistency_detects_corruption(spark):
    import pyspark.sql.functions as F

    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, h), float(h)) for h in range(10)]
        + [(dt.datetime(2024, 1, 2, h), 5.0) for h in range(4)],
        "ts timestamp, value double",
    )
    good = ev.groupBy(F.to_date("ts").alias("date")).agg(
        F.avg("value").alias("value_mean"), F.count("value").alias("n_events")
    )
    out = audit.reaggregation_consistency(ev, good)
    assert out.filter(~F.col("consistent")).count() == 0
    # corrupt one day's mean -> exactly one inconsistent row
    bad = good.withColumn(
        "value_mean",
        F.when(F.col("date") == "2024-01-01", F.col("value_mean") + 1).otherwise(
            F.col("value_mean")
        ),
    )
    out2 = audit.reaggregation_consistency(ev, bad)
    assert out2.filter(~F.col("consistent")).count() == 1
    # a fabricated day (present in daily, absent in events) must read
    # inconsistent, not null-propagate to a silent pass
    fabricated = good.union(
        spark.createDataFrame([(dt.date(2024, 2, 1), 1.0, 5)], good.schema)
    )
    out3 = audit.reaggregation_consistency(ev, fabricated)
    assert out3.filter(~F.col("consistent")).count() == 1


def test_audit_exit_code_severity_gate(spark):
    from practicum2_nof1_adhd_bd_spark.operators.audit import audit_exit_code

    def rep(*sev):
        return spark.createDataFrame([(s,) for s in sev], "severity string")

    assert audit_exit_code(rep("OK", "INFO")) == 0
    assert audit_exit_code(rep("OK", "WARNING", "INFO")) == 1
    assert audit_exit_code(rep("WARNING", "CRITICAL", "OK")) == 2


def _events(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, value double")


def test_audit_hourly_full_coverage_ok(spark):
    d0 = dt.datetime(2024, 1, 1)
    rows = [
        (d0 + dt.timedelta(days=day, hours=h), 1.0)
        for day in range(3)
        for h in range(24)
    ]
    rep = {
        r["check_name"]: r
        for r in audit.audit_hourly_frame(_events(spark, rows)).collect()
    }
    assert len(rep) == 3
    assert rep["hour_coverage_pct"]["severity"] == "OK"
    assert rep["hour_coverage_pct"]["metric"] == 100.0
    assert rep["empty_hour_slots_pct"]["severity"] == "OK"
    assert rep["empty_hour_slots_pct"]["metric"] == 0.0
    assert rep["midnight_wrap_imbalance_pct"]["severity"] == "INFO"
    assert rep["midnight_wrap_imbalance_pct"]["metric"] == 0.0


def test_audit_hourly_office_hours_warns(spark):
    # signal confined to 9am-5pm: hour coverage 8/24, most slots empty
    d0 = dt.datetime(2024, 1, 1)
    rows = [
        (d0 + dt.timedelta(days=day, hours=h), 1.0)
        for day in range(4)
        for h in range(9, 17)
    ]
    rep = {
        r["check_name"]: r
        for r in audit.audit_hourly_frame(_events(spark, rows)).collect()
    }
    assert rep["hour_coverage_pct"]["severity"] == "WARNING"
    assert abs(rep["hour_coverage_pct"]["metric"] - 8 * 100.0 / 24) < 1e-6
    assert rep["empty_hour_slots_pct"]["severity"] == "WARNING"


def test_audit_hourly_midnight_wrap_imbalance(spark):
    # hour 23 populated every day, hour 0 never: the wrap INFO metric
    # reads 100% imbalance (a midnight-attribution bug signature)
    d0 = dt.datetime(2024, 1, 1, 23)
    rows = [(d0 + dt.timedelta(days=day), 1.0) for day in range(5)]
    rows += [(dt.datetime(2024, 1, 1, 12), 1.0)]
    rep = {
        r["check_name"]: r
        for r in audit.audit_hourly_frame(_events(spark, rows)).collect()
    }
    assert rep["midnight_wrap_imbalance_pct"]["metric"] == 100.0


def test_benford_audit_recognizes_benford_and_flat_data(spark):
    """A 1..N integer range IS Benford-ish only in log-complete spans:
    2^k geometric data follows Benford closely (every chi2 term small),
    while a constant-magnitude block (all values 5xxx) concentrates on
    one digit — the audit must separate the two."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import audit

    # geometric series 1.5^k spans magnitudes uniformly in log space
    # (k <= 80 keeps every value inside DECIMAL(18,2)'s 16 integer digits)
    geo = spark.range(1, 81).select(
        F.pow(F.lit(1.5), F.col("id").cast("double")).alias("v")
    )
    rows = {r["digit"]: r for r in audit.benford_digit_audit(geo, "v").collect()}
    assert set(rows) == set(range(1, 10))
    assert sum(r["n"] for r in rows.values()) == 80
    # out-of-domain outliers are EXCLUDED, never fatal (try_cast):
    huge = spark.range(1, 200).select(
        F.pow(F.lit(1.5), F.col("id").cast("double")).alias("v")
    )
    n_in_domain = sum(
        r["n"] for r in audit.benford_digit_audit(huge, "v").collect()
    )
    assert 0 < n_in_domain < 199
    # digit 1 most frequent, monotone-ish decline, and obs tracks exp
    assert rows[1]["n"] == max(r["n"] for r in rows.values())
    for d in range(1, 10):
        assert abs(rows[d]["obs_freq"] - rows[d]["exp_freq"]) < 0.05, d

    flat = spark.range(1000).select((F.col("id") % 7 + 5000).alias("v"))
    frows = {r["digit"]: r for r in audit.benford_digit_audit(flat, "v").collect()}
    # zero-observation digits still emit their chi2 term (total * exp_d):
    # dropping them would understate chi2 exactly on fabricated data
    assert set(frows) == set(range(1, 10))
    assert frows[5]["obs_freq"] == 1.0
    assert frows[5]["chi2_term"] > 1000  # massive deviation flagged
    for d in set(range(1, 10)) - {5}:
        assert frows[d]["n"] == 0
        assert frows[d]["obs_freq"] == 0.0
        # (obs - exp)^2 / exp * total with obs=0 reduces to total * exp
        assert abs(frows[d]["chi2_term"] - 1000 * frows[d]["exp_freq"]) < 1e-3


def test_benford_audit_ignores_nonpositive_and_reads_decimal_digit(spark):
    """Zero/negative rows are excluded; sub-1 values take their first
    NONZERO digit (0.0042 -> 4) via the decimal string form."""
    from practicum2_nof1_adhd_bd_spark.operators import audit

    df = spark.createDataFrame(
        [(0.0,), (-12.0,), (0.4212,), (0.43,)], "v double"
    )
    rows = {r["digit"]: r["n"]
            for r in audit.benford_digit_audit(df, "v", digits_scale=4).collect()}
    assert rows == {4: 2, **{d: 0 for d in range(1, 10) if d != 4}}


def test_sketch_drift_rows_severity_bands_and_exit_code(spark):
    """PSI stability cuts: <0.10 OK, 0.10-0.25 WARNING, >0.25 CRITICAL;
    audit_exit_code folds drift with the other checks (r14 verdict #7)."""
    psi = spark.createDataFrame(
        [("stable", 0.03), ("moderate", 0.18), ("shifted", 0.40)],
        "event_type string, psi double",
    )
    rows = {
        r["check_name"]: r
        for r in audit.sketch_drift_rows(psi, "event_type").collect()
    }
    assert rows["sketch_drift_psi:stable"]["severity"] == "OK"
    assert rows["sketch_drift_psi:moderate"]["severity"] == "WARNING"
    assert rows["sketch_drift_psi:shifted"]["severity"] == "CRITICAL"
    assert rows["sketch_drift_psi:shifted"]["metric"] == 0.4
    assert rows["sketch_drift_psi:stable"]["threshold"] == 0.1
    # exit-code contract: CRITICAL drift alone gates the pipeline at 2;
    # without it the WARNING row gates at 1; stable-only exits 0
    report = audit.sketch_drift_rows(psi, "event_type")
    assert audit.audit_exit_code(report) == 2
    assert audit.audit_exit_code(
        report.filter("check_name != 'sketch_drift_psi:shifted'")
    ) == 1
    assert audit.audit_exit_code(
        report.filter("check_name = 'sketch_drift_psi:stable'")
    ) == 0
