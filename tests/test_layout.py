"""Z-order layout: Morton interleave + range-clustered write."""

from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark.operators import layout


def test_morton_code_hand_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (3, 1), (1, 3), (65535, 0), (0, 65535)],
        "x long, y long",
    )
    got = [
        r["z"]
        for r in df.select(
            layout.morton_code(F.col("x"), F.col("y")).alias("z")
        ).collect()
    ]
    # (3,1): x bits at even positions 0b0111=7; (1,3): 0b1011=11
    def ref(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == [ref(*p) for p in [(0, 0), (3, 1), (1, 3), (65535, 0), (0, 65535)]]
    assert got[1] == 7 and got[2] == 11


def test_morton_preserves_quadrant_locality(spark):
    """Points in the same half-plane of BOTH dims share the top Morton
    bit pair — the clustering property the layout relies on."""
    df = spark.createDataFrame(
        [(x, y) for x in (1, 2, 40000) for y in (1, 2, 40000)],
        "x long, y long",
    )
    rows = df.select(
        "x", "y", layout.morton_code(F.col("x"), F.col("y")).alias("z")
    ).collect()
    top = {(r["x"] >= 32768, r["y"] >= 32768, r["z"] >> 30) for r in rows}
    # each (x-half, y-half) combination maps to exactly one top quadrant
    assert len({(a, b) for a, b, _ in top}) == len(top)


def test_zorder_cells_boxes_are_tight(spark):
    """With the default 64-cell grid, per-cell bounding boxes must each
    cover about 1/16 of the normalized domain (a quadtree cell at depth
    3 spans 1/8 of each axis; slack 2x for partial occupancy edges) —
    the whole point of the curve. Dimensions have UNEQUAL raw domains to
    exercise the normalization."""
    df = spark.createDataFrame(
        [((i * 37) % 1024, (i * 59) % 32) for i in range(4000)],
        "x long, y long",
    )
    cells = layout.zorder_cells(df, "x", "y").collect()
    assert len(cells) > 30
    assert sum(c["n_rows"] for c in cells) == 4000
    for c in cells:
        frac_x = (c["x_max"] - c["x_min"] + 1) / 1024
        frac_y = (c["y_max"] - c["y_min"] + 1) / 32
        assert frac_x <= 0.26 and frac_y <= 0.26, (c, frac_x, frac_y)


def test_zorder_repartition_preserves_rows_and_sorts(spark, tmp_path):
    df = spark.createDataFrame(
        [((i * 37) % 1024, (i * 59) % 1024, i) for i in range(4000)],
        "x long, y long, rid long",
    )
    out = layout.zorder_repartition(df, "x", "y", n_partitions=8)
    assert out.columns == ["x", "y", "rid"]
    assert sorted(r["rid"] for r in out.collect()) == list(range(4000))
    # within every output partition the (normalized) morton codes are
    # nondecreasing — recompute the same scaled code the writer used
    z = layout.morton_code(
        layout.scale_to_bits(F.col("x"), 0, 1023),
        layout.scale_to_bits(F.col("y"), 0, 1023),
    )
    parts = (
        out.withColumn("_z", z)
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            (
                F.expr(
                    "forall(zip_with(slice(collect_list(_z), 1,"
                    " size(collect_list(_z)) - 1),"
                    " slice(collect_list(_z), 2, size(collect_list(_z)) - 1),"
                    " (a, b) -> a <= b), x -> x)"
                )
            ).alias("sorted")
        )
        .collect()
    )
    assert all(p["sorted"] for p in parts if p["sorted"] is not None)
