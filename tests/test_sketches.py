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
