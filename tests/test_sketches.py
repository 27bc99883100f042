"""KMV bottom-k distinct sketch: merge law, exact-small path, accuracy."""

from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark.operators import sketches


def test_kmv_exact_when_under_k(spark):
    """Fewer distinct values than k: the sketch saw everything and the
    estimate must be EXACTLY the distinct count."""
    df = spark.range(1000).select(
        F.lit("g").alias("g"), (F.col("id") % 37).alias("v")
    )
    row = sketches.kmv_estimate(df, ["g"], "v", k=64).collect()[0]
    assert row["sketch_size"] == 37
    assert row["kmv_estimate"] == 37.0


def test_kmv_partitioning_invariant(spark):
    """bottomk(bottomk(A) u bottomk(B)) = bottomk(A u B): the estimate
    must be byte-identical under any input partitioning — the property
    that makes the sketch mergeable across 1000 executors."""
    df = spark.range(20000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 5011).alias("v"),
    )
    a = {r["g"]: r["kmv_estimate"]
         for r in sketches.kmv_estimate(df.repartition(1), ["g"], "v").collect()}
    b = {r["g"]: r["kmv_estimate"]
         for r in sketches.kmv_estimate(df.repartition(13), ["g"], "v").collect()}
    assert a == b


def test_kmv_error_within_theory(spark):
    """KMV relative standard error is ~1/sqrt(k-2); assert the observed
    error stays inside 4 sigma on a 5011-distinct stream at k=64."""
    df = spark.range(20000).select(
        F.lit("g").alias("g"), (F.col("id") % 5011).alias("v")
    )
    row = sketches.kmv_estimate(df, ["g"], "v", k=64).collect()[0]
    assert row["sketch_size"] == 64
    rel = abs(row["kmv_estimate"] - 5011) / 5011
    assert rel < 4.0 / (62 ** 0.5), rel


def test_kmv_sketch_carries_k_smallest_hashes(spark):
    """The sketch array is the sorted k smallest distinct hashes — spot
    check against a driver-side recomputation on a tiny set."""
    import hashlib

    vals = [str(i) for i in range(200)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    got = sketches.kmv_sketch(df, ["g"], "v", k=8).collect()[0]["kmin"]
    exp = sorted(
        int(hashlib.md5(v.encode()).hexdigest()[:15], 16) for v in vals
    )[:8]
    assert got == exp


def test_kmv_null_values_ignored_and_partition_invariant(spark):
    """Null values must not poison the sketch (r13 ADVICE high): a null
    hash entering the Arrow partial turns the int64 batch into float64,
    whose 53-bit mantissa collapses distinct 60-bit hashes — and WHICH
    hashes collapse depends on where the null lands, breaking
    partitioning-invariance. Nulls are dropped pre-Arrow, so the sketch
    over a null-bearing column equals the sketch over its non-null
    subset, exactly, under any partitioning."""
    df = spark.range(5000).select(
        F.lit("g").alias("g"),
        F.when(F.col("id") % 7 != 0, F.col("id") % 1201).alias("v"),
    )
    clean = df.filter(F.col("v").isNotNull())
    got1 = sketches.kmv_sketch(df.repartition(1), ["g"], "v", k=64)
    got13 = sketches.kmv_sketch(df.repartition(13), ["g"], "v", k=64)
    exp = sketches.kmv_sketch(clean, ["g"], "v", k=64)
    kmin = exp.collect()[0]["kmin"]
    assert got1.collect()[0]["kmin"] == kmin
    assert got13.collect()[0]["kmin"] == kmin
    # hashes stay int64-exact end to end (no float64 round-trip)
    assert all(isinstance(h, int) for h in kmin)


def test_qhist_quantiles_rejects_out_of_range_probs(spark):
    """p=0 satisfies no bucket and p>1 exceeds every rank — both would
    silently DROP their (group, p) output row; entry validation turns
    that into an error (r13 ADVICE)."""
    import pytest

    sk = sketches.qhist_sketch(
        spark.range(10).select(
            F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
        ),
        ["g"], "v", n_buckets=16, lo=0.0, hi=16.0,
    )
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="probs"):
            sketches.qhist_quantiles(
                sk, ["g"], [0.5, bad], n_buckets=16, lo=0.0, hi=16.0
            )


def test_qhist_merge_invariance_bit_exact(spark):
    """The fixed-grid sketch's merge law is EXACT: sketching two halves
    and merging yields the identical (group, bucket, n) rows as
    sketching the whole — under any split and any partitioning."""
    from pyspark.sql import functions as F

    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 37) % 450).cast("double").alias("v"),
    )
    knobs = dict(n_buckets=128, lo=0.0, hi=512.0)
    whole = sketches.qhist_sketch(df, ["g"], "v", **knobs)
    a = sketches.qhist_sketch(
        df.filter(F.col("id") % 2 == 0).repartition(7), ["g"], "v", **knobs
    )
    b = sketches.qhist_sketch(
        df.filter(F.col("id") % 2 == 1).repartition(3), ["g"], "v", **knobs
    )
    merged = sketches.qhist_merge(a, b)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_qhist_quantiles_within_one_bucket_width(spark):
    """Estimates land within one bucket width of the exact order
    statistic, and the rank-location rule finds exactly one bucket per
    (group, p)."""
    from pyspark.sql import functions as F

    df = spark.range(5000).select(
        F.lit("g").alias("g"),
        ((F.col("id") * 7919) % 997).cast("double").alias("v"),
    )
    knobs = dict(n_buckets=256, lo=0.0, hi=1024.0)  # width 4
    sk = sketches.qhist_sketch(df, ["g"], "v", **knobs)
    probs = [0.1, 0.5, 0.9]
    out = {
        r["p"]: r
        for r in sketches.qhist_quantiles(sk, ["g"], probs, **knobs).collect()
    }
    assert len(out) == 3
    exact = df.agg(
        *[F.expr(f"percentile(v, {p})").alias(str(p)) for p in probs]
    ).collect()[0]
    for p in probs:
        assert abs(out[p]["q_est"] - exact[str(p)]) <= 4.0, p
        assert out[p]["total_n"] == 5000


def test_qhist_clamps_out_of_domain_values(spark):
    """Values outside [lo, hi) land in the edge buckets — an
    out-of-domain outlier shifts tail mass, never crashes or drops."""
    df = spark.createDataFrame(
        [("g", -50.0), ("g", 5.0), ("g", 999999.0)], "g string, v double"
    )
    sk = sketches.qhist_sketch(df, ["g"], "v", n_buckets=16, lo=0.0, hi=16.0)
    rows = {r["bucket"]: r["n"] for r in sk.collect()}
    assert rows == {0: 1, 5: 1, 15: 1}


def test_qhist_log_merge_invariance_bit_exact(spark):
    """The log grid keeps the fixed grid's EXACT merge law: sketching
    two halves and merging yields identical (group, bucket_lo, n) rows
    as sketching the whole, under any split and partitioning."""
    df = spark.range(4000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        ((F.col("id") * 7919) % 100000).alias("v"),
    )
    whole = sketches.qhist_log_sketch(df, ["g"], "v")
    a = sketches.qhist_log_sketch(
        df.filter(F.col("id") % 3 == 0).repartition(5), ["g"], "v"
    )
    b = sketches.qhist_log_sketch(
        df.filter(F.col("id") % 3 != 0).repartition(2), ["g"], "v"
    )
    merged = sketches.qhist_merge(a, b)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_qhist_log_unbounded_domain_beats_fixed_grid_clamp(spark):
    """The clamp-loss property (r13 verdict #3): on a heavy-tailed
    domain spanning 1..10^8, the FIXED grid sized for [0, 1024) clamps
    all tail mass into its top bucket — its p95 estimate cannot exceed
    the grid ceiling and misses the true order statistic by orders of
    magnitude — while the auto-ranged LOG grid, with no range knob at
    all, stays within its ~10% relative-width guarantee."""
    # ids 0..999 -> v = 10^(id % 9): nine decades, no a-priori range
    df = spark.range(1000).select(
        F.lit("g").alias("g"),
        F.pow(F.lit(10.0), (F.col("id") % 9).cast("double")).cast("long").alias("v"),
    )
    exact_p95 = df.selectExpr("percentile(v, 0.95) AS q").collect()[0]["q"]
    assert exact_p95 >= 10**8  # the tail the fixed grid cannot see

    fixed = sketches.qhist_sketch(
        df, ["g"], "v", n_buckets=256, lo=0.0, hi=1024.0
    )
    fixed_p95 = sketches.qhist_quantiles(
        fixed, ["g"], [0.95], n_buckets=256, lo=0.0, hi=1024.0
    ).collect()[0]["q_est"]
    assert fixed_p95 <= 1024.0  # clamped: off by ~5 orders of magnitude

    logsk = sketches.qhist_log_sketch(df, ["g"], "v")
    log_p95 = sketches.qhist_log_quantiles(logsk, ["g"], [0.95]).collect()[
        0
    ]["q_est"]
    assert abs(log_p95 - exact_p95) / exact_p95 <= 0.11, log_p95


def test_qhist_log_exact_below_100_and_underflow_bucket(spark):
    """Values 0..99 are their own bucket (quantiles exact there);
    negatives land in the visible underflow bucket -1, never silently
    clamped into real mass."""
    df = spark.createDataFrame(
        [("g", -7), ("g", 0), ("g", 42), ("g", 99), ("g", 12345)],
        "g string, v long",
    )
    sk = {r["bucket_lo"]: r["n"] for r in
          sketches.qhist_log_sketch(df, ["g"], "v").collect()}
    assert sk == {-1: 1, 0: 1, 42: 1, 99: 1, 12000: 1}


def test_qhist_psi_identity_disjoint_and_smoothing(spark):
    """PSI contract: identical sketches score ~0; disjoint distributions
    score large (>0.25, the classic 'major shift' line); buckets present
    on one side only get finite smoothed mass (no inf/NaN)."""
    df_a = spark.range(1000).select(
        F.lit("g").alias("g"), (F.col("id") % 50).alias("v")
    )
    sk_a = sketches.qhist_log_sketch(df_a, ["g"], "v")
    same = sketches.qhist_psi(sk_a, sk_a, ["g"]).collect()[0]
    assert same["psi"] == 0.0
    # disjoint: values 1000..1049 vs 0..49
    df_b = spark.range(1000).select(
        F.lit("g").alias("g"), (F.col("id") % 50 + 1000).alias("v")
    )
    sk_b = sketches.qhist_log_sketch(df_b, ["g"], "v")
    dis = sketches.qhist_psi(sk_a, sk_b, ["g"]).collect()[0]
    assert dis["psi"] > 0.25
    # PSI is symmetric: (p-q)ln(p/q) is invariant under side swap
    rev = sketches.qhist_psi(sk_b, sk_a, ["g"]).collect()[0]
    assert rev["psi"] == dis["psi"]
    import math

    assert math.isfinite(dis["psi"])
    # union domain: 50 exact sub-100 buckets + the single 1000-1099
    # log band holding all of side b, fully disjoint
    assert dis["n_buckets"] == 51


def test_cms_one_sided_error_and_merge_invariance(spark):
    """Count-Min contract: estimates NEVER undercount (cms_est >=
    exact, for every queried value), the merge law is exact cell
    addition under any split/partitioning, and an unseen value's
    estimate is bounded by the sketch's collision mass (width >> n
    here, so small)."""
    df = spark.range(2000).select(
        F.concat(F.lit("t"), (F.col("id") % 73).cast("string")).alias("v")
    )
    knobs = dict(depth=4, width=256)
    whole = sketches.cms_sketch(df, "v", **knobs)
    a = sketches.cms_sketch(
        df.filter(F.col("id") % 2 == 0).repartition(5), "v", **knobs
    )
    b = sketches.cms_sketch(
        df.filter(F.col("id") % 2 == 1).repartition(2), "v", **knobs
    )
    merged = sketches.cms_merge(a, b)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("n_exact"))
    est = sketches.cms_estimate(merged, exact.select("v"), "v", **knobs)
    rows = est.join(exact, "v").collect()
    assert len(rows) == 73
    assert all(r["cms_est"] >= r["n_exact"] for r in rows)
    # total overcount across all 73 values stays within the CMS bound's
    # ballpark (2N/width per value on average-collision terms)
    over = sum(r["cms_est"] - r["n_exact"] for r in rows)
    assert over <= 73 * 2 * 2000 / 256


def test_cms_weighted_build_matches_row_grain(spark):
    """r16 weight_col contract: building a CMS from a pre-aggregated
    (value, count) frame is CELL-EXACT against the row-grain build —
    counters are pure addition, so summing weights == counting rows."""
    df = spark.range(3000).select(
        F.concat(F.lit("w"), (F.col("id") % 57).cast("string")).alias("v")
    )
    knobs = dict(depth=4, width=128)
    rowgrain = sketches.cms_sketch(df, "v", **knobs)
    pre = df.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    weighted = sketches.cms_sketch(pre, "v", weight_col="cnt", **knobs)
    assert sorted(map(tuple, weighted.collect())) == sorted(
        map(tuple, rowgrain.collect())
    )
    assert dict(weighted.dtypes)["n"] == dict(rowgrain.dtypes)["n"]


def test_kmv_distinct_support_invariance(spark):
    """KMV of a multiset equals KMV of its distinct support: the sketch
    keeps the k smallest DISTINCT hashes, so duplicate rows cannot move
    it — the invariance that lets kmv_distinct_estimate build the
    sketch from the exact side's already-paid distinct frame (r17)."""
    dup = spark.range(12000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 311).alias("v"),
    )
    sup = dup.select("g", "v").distinct()
    a = sorted(map(tuple, sketches.kmv_sketch(dup, ["g"], "v", k=64).collect()))
    b = sorted(map(tuple, sketches.kmv_sketch(sup, ["g"], "v", k=64).collect()))
    assert a == b
