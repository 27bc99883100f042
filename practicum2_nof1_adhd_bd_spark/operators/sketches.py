"""Mergeable cardinality sketches (brief §"Beyond": dedup / profiling at
100 TB needs distinct counts without shuffling every distinct value).

KMV (k-minimum-values, the bottom-k structure behind Apache DataSketches'
Theta sketch; Bar-Yossef et al. RANDOM'02, Beyer et al. SIGMOD'07): keep
the k smallest distinct hash values; the k-th smallest, normalized, pins
the density of the hashed stream, so n ~= (k-1) / m_k with relative error
~1/sqrt(k-2).

Why not Spark's built-in ``approx_count_distinct``: that is HLL++ with
engine-private registers — correct, but not replayable by the DuckDB
oracle. KMV over the md5-derived 60-bit hash (functions.hash64_md5) is
bit-exactly reproducible in SQL, so the ESTIMATE itself carries a
value-hash oracle, and the merge law is plain set algebra:

    bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B))

which is exactly how the two-level plan below distributes: per-partition
partial sketches (k rows each) are exploded and re-sketched — the only
corpus-wide shuffle carries <= k rows per (group, input-partition), never
the distinct values themselves. The result is partitioning-invariant, so
the sf0.01 oracle attests the same bytes a 1000-executor merge would
produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import hash64_md5

HASH_SPACE = float(1 << 60)  # hash64_md5 range [0, 2^60)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group bottom-k sketch: ``kmin`` (sorted array of the k smallest
    distinct hashes) via per-partition partials + one k-bounded merge."""
    part = df.select(
        *group_cols,
        hash64_md5(F.col(value_col).cast("string")).alias("h"),
        F.spark_partition_id().alias("_pid"),
    )
    # partial sketch per input partition: collect_set dedupes map-side
    # within the (group, partition) cell — bounded by one partition's
    # distinct values — then the slice caps what enters the shuffle at k.
    partial = part.groupBy(*group_cols, "_pid").agg(
        F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("kmin")
    )
    return (
        partial.select(*group_cols, F.explode("kmin").alias("h"))
        .groupBy(*group_cols)
        .agg(F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("kmin"))
    )


def kmv_estimate(df: DataFrame, group_cols: list[str], value_col: str, k: int = 64) -> DataFrame:
    """Distinct-count estimate from the bottom-k sketch.

    If the sketch holds fewer than k hashes it saw EVERY distinct value
    and the count is exact; otherwise n ~= (k-1) * 2^60 / h_(k) — the
    unbiased KMV estimator on the un-normalized 60-bit hash."""
    sk = kmv_sketch(df, group_cols, value_col, k)
    est = F.when(
        F.size("kmin") < k, F.size("kmin").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.element_at("kmin", k)
    )
    return sk.select(
        *group_cols,
        F.size("kmin").alias("sketch_size"),
        F.round(est, 4).alias("kmv_estimate"),
    )
