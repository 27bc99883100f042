"""Iterative graph operators (operators/graph.py)."""

from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark.operators import graph


def test_pagerank_hand_computed_triangle_with_dangler(spark):
    """a->b, a->c, b->c; c dangling. One round from uniform 1/3, d=0.85:
    contribs: b gets 1/3/2, c gets 1/3/2 + 1/3; dangling mass = 1/3.
    rank(a) = .15/3 + .85*(0 + (1/3)/3)        = 0.14444444...
    rank(b) = .15/3 + .85*(1/6 + 1/9)          = 0.28611111...
    rank(c) = .15/3 + .85*(1/2 + 1/9)          = 0.56944444...
    """
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(edges, n_iter=1).collect()
    }
    assert abs(got["a"] - 0.144444444) < 1e-8
    assert abs(got["b"] - 0.286111111) < 1e-8
    assert abs(got["c"] - 0.569444444) < 1e-8


def test_pagerank_mass_conserved_and_duplicate_edges_collapse(spark):
    """Total rank mass stays 1.0 every round (the dangling redistribution
    is what makes this hold), and duplicate edge rows don't double a
    contribution."""
    edges = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 2), (2, 0), (3, 0)],  # dup (0,1); 3 dangles? no: 3->0
        "src int, dst int",
    )
    for k in (1, 3):
        total = (
            graph.pagerank(edges, n_iter=k)
            .agg(F.sum("rank").alias("s"))
            .first()["s"]
        )
        assert abs(total - 1.0) < 1e-9, (k, total)
    one = {
        r["node"]: r["rank"] for r in graph.pagerank(edges, n_iter=1).collect()
    }
    nodup = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 0)], "src int, dst int"
    )
    one_nodup = {
        r["node"]: r["rank"] for r in graph.pagerank(nodup, n_iter=1).collect()
    }
    assert one == one_nodup


def test_hyperball_harmonic_tracks_exact_on_a_path_graph(spark):
    """Directed path 0->1->2->3->4: exact harmonic centrality of node v
    is sum over u<v of 1/(v-u). With one item per counter and 64
    registers, collisions are absent at this size, so the HLL estimates
    sit within sketch error and the RANKING must match exactly
    (monotone along the path)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "src int, dst int"
    )
    got = {
        r["node"]: r["harmonic"]
        for r in graph.hyperball_harmonic(edges, n_iter=4).collect()
    }
    exact = {v: sum(1.0 / d for d in range(1, v + 1)) for v in range(5)}
    order = sorted(got, key=got.get)
    assert order == [0, 1, 2, 3, 4]
    for v in range(5):
        assert abs(got[v] - exact[v]) <= 0.30 * max(exact[v], 1.0), (
            v, got[v], exact[v],
        )


def test_hyperball_hub_outranks_periphery(spark):
    """A star pointing at one hub: the hub's in-ball is the whole graph
    at distance 1, so its harmonic score must dominate every leaf."""
    edges = spark.createDataFrame(
        [(i, 99) for i in range(1, 25)], "src int, dst int"
    )
    got = {
        r["node"]: r["harmonic"]
        for r in graph.hyperball_harmonic(edges, n_iter=2).collect()
    }
    hub = got.pop(99)
    assert hub > max(got.values()) * 3


def test_triangle_count_k4_every_node_fully_clustered(spark):
    """K4: 4 triangles total, every node in C(3,2)=3 of them, local
    clustering exactly 1.0."""
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "src int, dst int",
    )
    rows = {r["node"]: r for r in graph.triangle_count(edges).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        assert r["degree"] == 3
        assert r["n_triangles"] == 3
        assert r["clustering"] == 1.0


def test_triangle_count_path_graph_has_none(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src int, dst int"
    )
    rows = graph.triangle_count(edges).collect()
    assert all(r["n_triangles"] == 0 for r in rows)
    # degree-1 endpoints carry NULL clustering (undefined), middles 0.0
    by = {r["node"]: r for r in rows}
    assert by[0]["clustering"] is None and by[5]["clustering"] is None
    assert by[2]["clustering"] == 0.0


def test_triangle_count_canonicalization_hygiene(spark):
    """Reversed duplicates, exact duplicates, and self-loops must not
    change counts: one triangle {0,1,2} however noisily it arrives."""
    clean = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "src int, dst int"
    )
    noisy = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 1), (1, 2), (2, 1), (0, 2), (0, 0), (2, 2)],
        "src int, dst int",
    )
    a = sorted(map(tuple, graph.triangle_count(clean).collect()))
    b = sorted(map(tuple, graph.triangle_count(noisy).collect()))
    assert a == b
    assert a[0][2] == 1  # n_triangles


def test_triangle_count_skewed_hub_matches_brute_force(spark):
    """Wheel graph (hub 9 joined to an 8-cycle): brute-force the
    triangle set in Python and compare per-node counts exactly."""
    import itertools

    ring = [(i, (i + 1) % 8) for i in range(8)]
    spokes = [(9, i) for i in range(8)]
    adj = set()
    for s, t in ring + spokes:
        adj.add((min(s, t), max(s, t)))
    tri_per_node = {n: 0 for n in list(range(8)) + [9]}
    for x, y, z in itertools.combinations(sorted(tri_per_node), 3):
        if {(x, y), (y, z), (x, z)} <= adj:
            for n in (x, y, z):
                tri_per_node[n] += 1
    edges = spark.createDataFrame(ring + spokes, "src int, dst int")
    rows = {r["node"]: r for r in graph.triangle_count(edges).collect()}
    assert {n: r["n_triangles"] for n, r in rows.items()} == tri_per_node


def test_lpa_two_cliques_separate_communities(spark):
    """Two K4 cliques joined by one bridge edge: LPA must give each
    clique one label and must not merge them across the weak tie."""
    from practicum2_nof1_adhd_bd_spark.operators import graph

    k4a = [(a, b) for a in range(4) for b in range(4) if a < b]
    k4b = [(a + 10, b + 10) for a, b in k4a]
    edges = spark.createDataFrame(
        k4a + k4b + [(3, 10)], "src long, dst long"
    )
    out = {r["node"]: r["community"]
           for r in graph.label_propagation(edges, n_iter=4).collect()}
    assert len({out[n] for n in (0, 1, 2, 3)}) == 1
    assert len({out[n] for n in (10, 11, 12, 13)}) == 1
    assert out[0] != out[10]


def test_lpa_tie_breaks_to_smallest_label(spark):
    """Single triangle, round 1: every node sees two distinct labels
    with equal counts — the pinned tie-break must choose the smaller,
    and by round 2 the whole triangle must sit on label 0."""
    from practicum2_nof1_adhd_bd_spark.operators import graph

    tri = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    r1 = {r["node"]: r["community"]
          for r in graph.label_propagation(tri, n_iter=1).collect()}
    assert r1 == {0: 1, 1: 0, 2: 0}
    r2 = {r["node"]: r["community"]
          for r in graph.label_propagation(tri, n_iter=2).collect()}
    assert r2 == {0: 0, 1: 0, 2: 0}


def test_lpa_symmetrizes_and_drops_self_loops(spark):
    """Directed duplicates and self-loops must not distort the vote:
    an edge given in both directions plus a self-loop behaves exactly
    like the plain undirected edge."""
    from practicum2_nof1_adhd_bd_spark.operators import graph

    noisy = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 0), (1, 2)], "src long, dst long"
    )
    clean = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    a = sorted(map(tuple, graph.label_propagation(noisy, n_iter=3).collect()))
    b = sorted(map(tuple, graph.label_propagation(clean, n_iter=3).collect()))
    assert a == b
