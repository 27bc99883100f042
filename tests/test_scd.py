"""SCD Type-2 history build + incremental merge (operators/scd.py)."""

import pytest

from practicum2_nof1_adhd_bd_spark.operators import scd


def _log(spark, rows):
    return spark.createDataFrame(rows, "k string, o long, e long, v string")


def test_scd2_from_log_collapses_noops_and_chains_intervals(spark):
    log = _log(
        spark,
        [
            ("a", 1, 0, "x"), ("a", 2, 1, "x"), ("a", 3, 2, "y"),
            ("a", 4, 3, "y"), ("a", 5, 4, "x"),
        ],
    )
    out = sorted(
        scd.scd2_from_log(log, "k", ["o", "e"], "v").collect(),
        key=lambda r: r["version"],
    )
    assert [(r["v"], r["valid_from"], r["valid_to"], r["version"],
             r["is_current"]) for r in out] == [
        ("x", 1, 3, 1, 0), ("y", 3, 5, 2, 0), ("x", 5, None, 3, 1),
    ]


def _rebuild_vs_merge(spark, rows, cut):
    full = scd.scd2_from_log(_log(spark, rows), "k", ["o", "e"], "v")
    first = [r for r in rows if r[1] < cut]
    second = [r for r in rows if r[1] >= cut]
    dim = scd.scd2_from_log(_log(spark, first), "k", ["o", "e"], "v")
    merged = scd.scd2_merge(dim, _log(spark, second), "k", ["o", "e"], "v")
    key = lambda r: (r["k"], r["version"])
    assert sorted(map(tuple, full.collect()), key=str) == sorted(
        map(tuple, merged.collect()), key=str
    ), f"cut={cut}"


def test_scd2_merge_equals_rebuild_at_every_cut(spark):
    """The attestation invariant, exhaustively over cut points: runs that
    straddle the cut (boundary no-op), multi-version keys, a key absent
    from the batch, a key new in the batch, and an order tie broken by
    the secondary column."""
    rows = [
        ("a", 1, 0, "x"), ("a", 2, 1, "x"), ("a", 3, 2, "y"),
        ("a", 5, 3, "y"), ("a", 6, 4, "z"),
        ("b", 2, 5, "p"), ("b", 4, 6, "q"), ("b", 4, 7, "r"),  # tie on o
        ("c", 1, 8, "m"),                                     # never changes
        ("d", 7, 9, "n"),                                     # late new key
    ]
    for cut in range(2, 8):
        _rebuild_vs_merge(spark, rows, cut)


def test_scd2_merge_rejects_out_of_order_batch(spark):
    dim = scd.scd2_from_log(
        _log(spark, [("a", 5, 0, "x")]), "k", ["o", "e"], "v"
    )
    with pytest.raises(ValueError, match="append-only"):
        scd.scd2_merge(
            dim, _log(spark, [("a", 5, 1, "y")]), "k", ["o", "e"], "v"
        ).collect()


def test_scd2_merge_all_noop_batch_is_identity(spark):
    rows = [("a", 1, 0, "x"), ("a", 2, 1, "y")]
    dim = scd.scd2_from_log(_log(spark, rows), "k", ["o", "e"], "v")
    merged = scd.scd2_merge(
        dim, _log(spark, [("a", 9, 2, "y")]), "k", ["o", "e"], "v"
    )
    assert sorted(map(tuple, dim.collect()), key=str) == sorted(
        map(tuple, merged.collect()), key=str
    )
