"""Iterative graph operators over DataFrames (brief §"Beyond").

Crawl pipelines rank hosts by link centrality to prioritize fetches and
weight corpus mixtures (Common Crawl publishes harmonic-centrality and
PageRank host rankings for exactly this). The engine form is K rounds of
relational algebra — no graph library, no driver-side adjacency:

- each iteration is ``ranks ⋈ edges`` on src (one shuffle) + a
  ``groupBy(dst)`` partial-aggregated sum (one shuffle), both standard
  exchanges Catalyst plans well at any scale;
- edges are the big side and keep a STABLE partitioning on src across
  iterations (the per-iteration rank frame is node-sized, far smaller);
- dangling mass (nodes with no out-edges) is a 1-row aggregate
  broadcast back — never a collect;
- lineage is cut per iteration with ``localCheckpoint`` so K iterations
  don't stack K joins into one exploding plan.

Fixed iteration count (the crawl-ranking use runs a handful of rounds —
rank ORDER stabilizes long before values converge), which also keeps
the operator oracle-replayable: the DuckDB twin unrolls the same K
rounds symbolically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over an edge list after ``n_iter`` synchronous rounds.

    Node set = every id appearing as src or dst (distinct union).
    Initial rank 1/N; per round
    ``rank' = (1-d)/N + d * (Σ in-contribs + dangling_mass/N)`` with
    contrib = rank/out_degree. Returns ``(node, rank)`` rounded to 9dp
    (double combine-order differences live far below that).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        with_deg = ranks.join(
            out_deg, ranks["node"] == out_deg["src"], "left"
        ).select("node", "rank", "out_deg")
        dangling = with_deg.filter(F.col("out_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contribs = (
            with_deg.filter(F.col("out_deg").isNotNull())
            .join(e, with_deg["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_sum"), F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("rank", 9).alias("rank"))
