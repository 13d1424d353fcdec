"""triangle_count / bfs_levels vs networkx ground truth."""

import pytest

nx = pytest.importorskip("networkx")

from pyspark.sql import functions as F  # noqa: E402


def _gnp(seed=7, n=40, p=0.12):
    return nx.gnp_random_graph(n, p, seed=seed)


def _edges_df(spark, g):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in g.edges()], "src long, dst long")


def test_triangle_count_matches_networkx(spark):
    from zef_spark.graph.algorithms import triangle_count
    g = _gnp()
    got = triangle_count(_edges_df(spark, g)).collect()[0]["n_triangles"]
    expected = sum(nx.triangles(g).values()) // 3
    assert got == expected and expected > 0


def test_triangle_count_per_node(spark):
    from zef_spark.graph.algorithms import triangle_count
    g = _gnp(seed=11)
    got = {r["id"]: r["n_triangles"] for r in
           triangle_count(_edges_df(spark, g), per_node=True).collect()}
    for node, t in nx.triangles(g).items():
        assert got.get(node, 0) == t


def test_triangle_count_dedups_multi_edges(spark):
    from zef_spark.graph.algorithms import triangle_count
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)],
        "src long, dst long")  # one triangle, duplicated/reversed/self
    assert triangle_count(df).collect()[0]["n_triangles"] == 1


def test_bfs_levels_matches_networkx(spark):
    from zef_spark.graph.algorithms import bfs_levels
    g = _gnp(seed=3)
    src = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["level"] for r in
           bfs_levels(_edges_df(spark, g), src,
                      directed=False).collect()}
    expected = nx.single_source_shortest_path_length(g, 0)
    assert got == {int(k): v for k, v in expected.items()}


def test_bfs_multi_source_and_depth_cap(spark):
    from zef_spark.graph.algorithms import bfs_levels
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long")
    srcs = spark.createDataFrame([(0,), (9,)], "id long")
    got = {r["id"]: r["level"] for r in
           bfs_levels(chain, srcs).collect()}
    assert got[0] == 0 and got[9] == 0
    assert got[10] == 1          # reached from source 9
    assert got[5] == 5           # reached from source 0, directed
    capped = {r["id"]: r["level"] for r in
              bfs_levels(chain, spark.createDataFrame([(0,)], "id long"),
                         max_depth=3).collect()}
    assert max(capped.values()) == 3 and 4 not in capped.values()


def test_clustering_coefficient_matches_networkx(spark):
    from zef_spark.graph.algorithms import clustering_coefficient
    g = _gnp(seed=5)
    got = {r["id"]: (r["degree"], r["n_triangles"], r["coefficient"])
           for r in clustering_coefficient(_edges_df(spark, g)).collect()}
    ref_c = nx.clustering(g)
    ref_t = nx.triangles(g)
    for node in g.nodes():
        if g.degree(node) == 0:
            assert node not in got  # isolated nodes have no edge rows
            continue
        d, t, c = got[node]
        assert d == g.degree(node) and t == ref_t[node]
        assert abs(c - ref_c[node]) < 1e-6


def test_shortest_paths_bellman_ford(spark):
    from zef_spark.graph.algorithms import shortest_paths
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 5.0),
         ("c", "d", 1.0)],
        "src string, dst string, w double")
    srcs = spark.createDataFrame([("a",)], "id string")
    d = {r.id: r.dist for r in
         shortest_paths(edges, srcs, weight_col="w",
                        max_hops=3).collect()}
    assert d == {"a": 0.0, "b": 1.0, "c": 2.0, "d": 3.0}
    # hop bound semantics: with 1 hop, c keeps the direct (worse) edge
    d1 = {r.id: r.dist for r in
          shortest_paths(edges, srcs, weight_col="w",
                         max_hops=1).collect()}
    assert d1 == {"a": 0.0, "b": 1.0, "c": 5.0}
    # unit weights == hop count; undirected reaches back
    du = {r.id: r.dist for r in
          shortest_paths(edges, spark.createDataFrame([("d",)],
                                                      "id string"),
                         max_hops=5, directed=False).collect()}
    assert du == {"d": 0.0, "c": 1.0, "b": 2.0, "a": 2.0}


def test_k_core_peeling(spark):
    from zef_spark.graph.algorithms import k_core
    # triangle a-b-c (each degree 2) + pendant d attached to a
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")],
        "src string, dst string")
    core2 = sorted(r.id for r in k_core(edges, 2).collect())
    assert core2 == ["a", "b", "c"]          # d peels (degree 1)
    # k=3: removing d makes everyone degree 2 -> empty 3-core
    assert k_core(edges, 3).count() == 0
    # cascade: a chain a-b-c-d has NO 2-core (peeling cascades)
    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    assert k_core(chain, 2).count() == 0


def test_pagerank_convergence_mode(spark):
    """tol= early-stops on max rank delta (r05 verdict §4). On a
    symmetric cycle the rank vector is stationary from round 1, so a
    high cap with tol set must return almost immediately — a cap
    that high WITHOUT early stop would blow the test budget — and
    match the fixed-iteration ranks exactly."""
    from zef_spark.graph.algorithms import pagerank
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long")
    conv = {r["id"]: r["rank"]
            for r in pagerank(edges, n_iter=200, tol=1e-9).collect()}
    assert conv == {0: 0.25, 1: 0.25, 2: 0.25, 3: 0.25}
    fixed = {r["id"]: r["rank"]
             for r in pagerank(edges, n_iter=3).collect()}
    assert conv == fixed


def test_hits_convergence_and_niter_guard(spark):
    from zef_spark.graph.algorithms import hits
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        hits(edges, n_iter=0)
    # stationary from round 1 -> the 200-round cap must early-stop
    conv = {r["id"]: (r["hub"], r["authority"])
            for r in hits(edges, n_iter=200, tol=1e-9).collect()}
    assert conv == {i: (0.25, 0.25) for i in range(4)}
    fixed = {r["id"]: (r["hub"], r["authority"])
             for r in hits(edges, n_iter=3).collect()}
    assert conv == fixed


def test_random_walk_cooccurrence_deterministic(spark):
    """Walks are a pure function of (start, walk, step, cur): two
    runs and a repartitioned input give identical counts; pairs stay
    within the window; every walk node is a graph node."""
    from zef_spark.graph.algorithms import random_walk_cooccurrence
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)],
        "src long, dst long")
    a = {(r["a"], r["b"]): r["n"]
         for r in random_walk_cooccurrence(edges, n_walks=2,
                                           walk_len=3).collect()}
    b = {(r["a"], r["b"]): r["n"]
         for r in random_walk_cooccurrence(edges.repartition(5),
                                           n_walks=2,
                                           walk_len=3).collect()}
    assert a == b and a
    assert all(x < y for x, y in a)          # normalized unordered
    nodes = {0, 1, 2, 3}
    assert all(x in nodes and y in nodes for x, y in a)
