"""Provenance manifest: content digest is order/partitioning-invariant."""

from practicum2_nof1_adhd_bd_spark.operators import provenance


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, name string")


def test_manifest_invariant_to_order_and_partitioning(spark):
    rows = [(i, f"name_{i * 7 % 13}") for i in range(200)]
    a = provenance.table_manifest(_df(spark, rows), "t", ["k", "name"])
    b = provenance.table_manifest(
        _df(spark, list(reversed(rows))).repartition(7), "t", ["k", "name"]
    )
    assert a.collect() == b.collect()


def test_manifest_detects_single_value_change(spark):
    rows = [(i, f"name_{i}") for i in range(50)]
    changed = list(rows)
    changed[17] = (17, "name_17x")
    a = provenance.table_manifest(_df(spark, rows), "t", ["k", "name"]).collect()[0]
    b = provenance.table_manifest(_df(spark, changed), "t", ["k", "name"]).collect()[0]
    assert a["n_rows"] == b["n_rows"] == 50
    assert a["content_digest"] != b["content_digest"]


def test_manifest_empty_table_digest_zero(spark):
    empty = _df(spark, []).filter("k IS NOT NULL").filter("k < 0")
    row = provenance.table_manifest(empty, "t", ["k", "name"]).collect()[0]
    assert row["n_rows"] == 0
    assert row["content_digest"] == 0


def test_digest_sql_matches_duckdb(spark):
    """The shared row-digest expression must evaluate identically in both
    engines — the whole point of spelling it in common SQL."""
    import duckdb

    expr = provenance.row_digest_sql(["k", "name"])
    rows = [(i, f"n{i}") for i in range(20)]
    s = (
        _df(spark, rows)
        .selectExpr("k", f"{expr} AS dig")
        .orderBy("k")
        .collect()
    )
    con = duckdb.connect()
    con.sql("CREATE TABLE t (k BIGINT, name VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    d = con.sql(f"SELECT k, {expr} AS dig FROM t ORDER BY k").fetchall()
    assert [(r["k"], r["dig"]) for r in s] == d


def test_spark_fast_digest_equals_portable_fold(spark):
    """table_manifest uses conv() (Spark-only fast path); the oracle uses
    the portable unrolled fold — they must agree bit-for-bit."""
    rows = [(i, f"name_{i}") for i in range(500)]
    df = _df(spark, rows)
    both = df.selectExpr(
        f"{provenance.row_digest_sql(['k', 'name'])} AS slow",
        f"{provenance.row_digest_spark_sql(['k', 'name'])} AS fast",
    ).filter("slow != fast")
    assert both.count() == 0
