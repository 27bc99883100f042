"""Skew management — salting for hot keys (100 TB design note made
concrete, with MEASURED boundaries in SCALING.md §2e).

Where each device actually helps, per measurement:

- ``salted_join``: a shuffle join's hot key funnels every matching row
  through one reducer. AQE's skew-join split is the engine's first
  answer (session.py enables it); this manual salt reproduces the split
  for plans AQE cannot rewrite — streaming joins, non-sort-merge
  strategies, AQE-off deployments. Measured 2.3x over the naive
  single-reducer plan at 90% key concentration (§2e).
- ``salted_agg``: a REDUCER-side device only. For algebraic aggregates
  Spark's map-side combine already collapses hot keys before the
  exchange, and NO salt can spread a physically hot input partition
  (the map work is partition-bound either way — measured 0.74x when we
  tried). It earns its keep when the reduce side itself fans out
  per-key state wider than a partial (e.g., merging pre-aggregated
  shards whose per-key partial count is itself huge), and it is the
  shape streaming foreachBatch merges reuse.

Only ALGEBRAIC aggregates can be salted (sum/count/min/max and anything
derivable from them, e.g. mean = sum/count); the helpers here expose
exactly that contract. salted_agg is value-hash attested for
salt-INVARIANCE by salted_priority_counts; salted_join by
tests/test_stateful_skew.py. (salted_join_revenue was restructured in
r17 to pre-aggregate the fact side at the join key instead — when every
downstream aggregate is algebraic, map-side partial aggregation absorbs
the hot key for free and the salt's n_salts dim fan-out is pure
shuffle-byte overhead; salted_join remains the device for consumers
whose rows must SURVIVE the join un-aggregated.)

The salt is DETERMINISTIC (a content hash of the row, never
monotonically_increasing_id or rand): a nondeterministic shuffle key is
the classic partial-retry hazard — after a shuffle-fetch failure, only
the lost map tasks recompute, and rows that re-salt differently on the
second attempt land in reducers that already consumed the first
attempt's blocks, double-counting or dropping them (the same bug class
Spark patched for repartition()). The cost of determinism: rows that
are bit-identical duplicates collapse onto ONE salt. Callers whose hot
key is literal duplicate rows should include a stable unique id column
in the frame (most tables have one — order key, line number, doc id) so
the hash spreads them; both helpers salt over ALL columns, so the id
just needs to be present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_salt(cols: list[str], n_salts: int):
    """Deterministic per-row salt in [0, n_salts): content hash of every
    column. Retry-safe (see module docstring); include a unique id
    column in the frame to spread bit-identical duplicate rows."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    n_salts: int = 16,
    sum_cols: list[str] | None = None,
    count: bool = True,
) -> DataFrame:
    """Two-phase skew-safe aggregation: per-(key, salt) partials, then a
    cheap merge over at most ``n_salts`` rows per key.

    The salt is a deterministic content hash of the whole row (module
    docstring: retry safety) — the aggregate RESULT is independent of
    salt assignment either way, so the oracle attests plain-GROUP-BY
    equality. Output: key_cols + sum_<c> per sum col + n_rows.
    """
    sum_cols = sum_cols or []
    salt = _row_salt(df.columns, n_salts).alias("_salt")
    phase1 = (
        df.select(*df.columns, salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            *[F.sum(c).alias(f"_sum_{c}") for c in sum_cols],
        )
    )
    # always aggregate the count internally: groupBy().agg() with an empty
    # list is an error, and the merge needs at least one expression
    aggs = [F.sum("_cnt").alias("n_rows")]
    aggs += [F.sum(f"_sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    out = phase1.groupBy(*key_cols).agg(*aggs)
    return out if count else out.drop("n_rows")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: the fact side gets a deterministic per-row
    content-hash salt (module docstring: retry safety; include a unique
    id column in the fact frame to spread bit-identical duplicates), the
    (small) dim side is EXPLODED n_salts times so every salted fact key
    finds its partner. Use when the dim is too big to broadcast but the
    fact key is skewed; shuffle partitions then hold at most ~1/n_salts
    of any hot key. Join output is independent of salt assignment.
    """
    salted_fact = fact.withColumn(
        "_salt", _row_salt(fact.columns, n_salts)
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(salted_dim, [key, "_salt"])
    return out.drop("_salt")
