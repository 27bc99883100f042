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


def _hll_estimate(regs, m: int):
    """HyperLogLog cardinality estimate from a register array column
    (Flajolet et al. 2007): alpha_m * m^2 / sum(2^-M_j), with the
    small-range linear-counting correction when the raw estimate is
    under 2.5m and empty registers exist."""
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 64 else (0.709 if m == 32 else 0.673)
    inv_sum = F.aggregate(
        regs, F.lit(0.0), lambda acc, r: acc + F.pow(F.lit(2.0), -r)
    )
    raw = F.lit(alpha * m * m) / inv_sum
    zeros = F.size(F.filter(regs, lambda r: r == 0))
    return F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)


def hyperball_harmonic(
    edges: DataFrame,
    n_iter: int = 4,
    log2m: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HyperBall approximate harmonic centrality (Boldi & Vigna 2013) —
    the algorithm behind Common Crawl's published host rankings, where
    exact all-pairs distances are unthinkable. Per node keep an
    m=2^log2m-register HLL counter of its in-ball (nodes that REACH it);
    round r merges every in-neighbor's counter (elementwise register
    max — union of the underlying sets) and adds
    ``(|B_r| - |B_{r-1}|) / r`` to the harmonic sum, crediting nodes
    first reached at distance r.

    Distributed shape per round: registers explode to (node, idx, reg)
    triples only ALONG EDGES (the join carries m small ints per edge),
    the elementwise max is a hash aggregate on (dst, idx) — partial
    map-side, so hub in-degrees collapse before the shuffle — and the
    array rebuilds with an order-pinned sort_array(collect_list).
    Estimates are HLL (~1.04/sqrt(m) relative error), which is why this
    is a rows-only operator: exact parity is the wrong spec for a
    sketch. Register hashing uses the md5-derived device every sketch
    in this engine uses, so runs are deterministic."""
    from pyspark.sql import Window  # noqa: F401  (parity with pagerank)

    m = 1 << log2m
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # init: each node's counter contains exactly itself — one hashed
    # item: bucket = low log2m bits, rank = leading-zeros+1 of the rest
    h = F.conv(F.substring(F.md5(F.col("node").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    bucket = (h % m).cast("int")
    rest = F.floor(h / m).cast("long")
    # HLL rank = leading zeros + 1 within the quotient's fixed bit
    # budget: h < 2^60 and bucket takes log2m bits, so rest < 2^(60-log2m)
    # and rank = (60-log2m) - floor(log2(rest)); uniform values give the
    # geometric rank distribution HLL needs. rest == 0 maps to the
    # all-zeros word (maximum rank). Ranks are STRICTLY POSITIVE — the
    # elementwise-max merge treats 0 as "empty register".
    width = 60 - log2m
    rank = F.when(rest == 0, F.lit(width + 1)).otherwise(
        (F.lit(width) - F.floor(F.log2(rest))).cast("int")
    )
    state = nodes.select(
        "node",
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.when(j == bucket, rank).otherwise(F.lit(0)),
        ).alias("regs"),
    ).localCheckpoint(eager=True)
    harm = nodes.select("node", F.lit(0.0).alias("harmonic"))
    prev_card = state.select("node", _hll_estimate(F.col("regs"), m).alias("card"))
    for r in range(1, n_iter + 1):
        # gather in-neighbors' registers along edges, elementwise max
        flat = (
            state.join(e, state["node"] == e["src"])
            .select(F.col("dst").alias("node"), F.posexplode("regs"))
            .groupBy("node", "pos")
            .agg(F.max("col").alias("mx"))
            .groupBy("node")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "mx"))),
                    lambda s: s["mx"],
                ).alias("in_regs")
            )
        )
        state = (
            state.join(flat, "node", "left")
            .select(
                "node",
                F.when(
                    F.col("in_regs").isNotNull(),
                    F.zip_with("regs", "in_regs", lambda a, b: F.greatest(a, b)),
                )
                .otherwise(F.col("regs"))
                .alias("regs"),
            )
            .localCheckpoint(eager=True)
        )
        card = state.select("node", _hll_estimate(F.col("regs"), m).alias("card"))
        delta = card.alias("c").join(
            prev_card.select("node", F.col("card").alias("pc")), "node"
        )
        harm = (
            harm.join(
                delta.select(
                    "node",
                    (F.greatest(F.col("card") - F.col("pc"), F.lit(0.0)) / r).alias(
                        "d"
                    ),
                ),
                "node",
            )
            .select("node", (F.col("harmonic") + F.col("d")).alias("harmonic"))
            .localCheckpoint(eager=True)
        )
        prev_card = card
    return harm.select("node", F.round("harmonic", 6).alias("harmonic"))


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
    # out_deg is read twice per round (degree attach + dangling split)
    # across every round; with_deg twice per round — both checkpoint
    # lazily so consumers share one materialization instead of re-running
    # the upstream join chain (r17, the triangle_count/LPA device).
    out_deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        with_deg = (
            ranks.join(out_deg, ranks["node"] == out_deg["src"], "left")
            .select("node", "rank", "out_deg")
            .localCheckpoint(eager=False)
        )
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
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.round("rank", 9).alias("rank"))


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient via
    degree orientation (Suri & Vassilvitskii, WWW 2011) — the link-farm
    / community-density signal a crawl ranker reads next to PageRank.

    The naive wedge join explodes on hubs (a degree-d node contributes
    d^2 wedges). Orienting every undirected edge from its (degree, id)-
    smaller endpoint to the larger caps oriented out-degree at
    O(sqrt(m)), so total wedge work is O(m^1.5) regardless of skew —
    the hub's star is charged to its many low-degree neighbors. Each
    triangle is generated exactly once: wedges fan out from the
    orientation-minimal apex and close along the oriented (v1, v2) edge.

    Plan: canonicalize (least, greatest) + distinct (drops reversed
    duplicates and self-loops); degree is one map-side-combined count
    over the exploded endpoints; the two degree attachments broadcast
    (node-dim, far smaller than edges); wedge formation and closure are
    two self-equi-joins on edge keys — standard exchanges, no driver
    state, no collect."""
    a, b = F.col(src_col), F.col(dst_col)
    # multi-consumer frames checkpoint lazily (r17, guide §5/§3.3):
    # e feeds deg + dd, deg feeds both broadcast attachments + the final
    # left join, oriented feeds both wedge sides + the closure probe —
    # without the cuts each consumer re-ran the whole upstream chain
    # (the committed before-plan is 6,286 lines / 184 Exchange refs of
    # duplicated subtrees; plan build alone dominated the fixture query)
    e = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=False)
    )
    dd = e.join(
        F.broadcast(deg.select(F.col("node").alias("a"), F.col("degree").alias("_da"))),
        "a",
    ).join(
        F.broadcast(deg.select(F.col("node").alias("b"), F.col("degree").alias("_db"))),
        "b",
    )
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = dd.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("_db")).otherwise(F.col("_da")).alias("_dv"),
    ).localCheckpoint(eager=False)
    o1 = oriented.select(
        F.col("u"), F.col("v").alias("v1"), F.col("_dv").alias("_d1")
    )
    o2 = oriented.select(
        F.col("u"), F.col("v").alias("v2"), F.col("_dv").alias("_d2")
    )
    v1_first = (F.col("_d1") < F.col("_d2")) | (
        (F.col("_d1") == F.col("_d2")) & (F.col("v1") < F.col("v2"))
    )
    wedges = o1.join(o2, "u").filter(v1_first).select("u", "v1", "v2")
    tri = wedges.join(
        oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        ["v1", "v2"],
    )
    per_node = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("v1").alias("node")))
        .unionByName(tri.select(F.col("v2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    F.coalesce(F.col("n_triangles"), F.lit(0))
                    * 2.0
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            ).alias("clustering"),
        )
    )


def label_propagation(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007) with DETERMINISTIC tie-breaks — the near-
    linear community pass a crawl/link graph gets next to PageRank
    (centrality) and triangle counting (density).

    Semantics, pinned so a SQL oracle can replay every round: the graph
    is symmetrized (both directions, self-loops dropped, distinct);
    labels start as the node id; each round every node adopts the label
    with the HIGHEST neighbor count, ties broken by SMALLEST label —
    GraphX's LPA breaks ties by hash-map iteration order and is run-to-
    run unstable; this one is bit-stable anywhere.

    Scale shape: one round = an edge-grain hash join (messages flow
    along edges), a (node, label) count — which collapses a hub's
    millions of neighbor messages to its distinct incident labels
    before the top-1 pick sees them — and a per-node top-1 as a
    map-side min_by aggregate (no window sort; r17). Work is O(E) per
    round with no
    dependence on round number; localCheckpoint truncates the iterative
    lineage exactly as pagerank() does.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    # lazy checkpoints throughout: lineage is truncated identically, but
    # no blocking per-round job is submitted — all rounds run inside the
    # final action's single job, each checkpoint materializing when its
    # first consumer computes it (r16; eager=True cost one synchronous
    # driver round-trip per iteration). Storage trade-off (r16 ADVICE):
    # each round's checkpoint blocks stay persisted on executors for the
    # session lifetime (superseded rounds can't be unpersisted from in
    # here — with lazy checkpoints round k's blocks are still needed
    # until k+1 materializes, which this builder never observes), and
    # localCheckpoint data is unrecoverable on executor loss; a
    # long-lived cluster session would wrap the returned frame's action
    # in its own cleanup. Accepted: K node-grain frames per invocation.
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = sym.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    for _ in range(n_iter):
        msgs = sym.join(labels.withColumnRenamed("node", "dst"), "dst").select(
            F.col("src").alias("node"), "lab"
        )
        votes = msgs.groupBy("node", "lab").agg(F.count(F.lit(1)).alias("n"))
        # top-1 as a map-side min_by over (-n, lab) (r17, guide §2.4):
        # the r16 row_number window re-exchanged votes on (node) and
        # SORTED every partition just to keep one row per node; min of
        # the (-n, lab) struct is the same "highest count, smallest
        # label" winner (counts are exact BIGINTs, negation is lossless)
        # with a partial aggregate instead of a sort.
        labels = (
            votes.groupBy("node")
            .agg(
                F.min_by(
                    F.col("lab"),
                    F.struct((-F.col("n")).alias("_nn"), F.col("lab")),
                ).alias("lab")
            )
            .localCheckpoint(eager=False)
        )
    sizes = labels.groupBy("lab").agg(F.count(F.lit(1)).alias("community_size"))
    return labels.join(sizes, "lab").select(
        "node", F.col("lab").alias("community"), "community_size"
    )
