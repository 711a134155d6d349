"""Multi-hop graph analytics over the TPC-H-derived graph (known topology:
region→nation→customer→order→lineitem-defs→part-imports)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def kg(spark):
    from knowledge_graph_spark.adapters import tpch

    return tpch.build_graph(spark, SF_SMALL).cache()


def test_k_hop_neighbors(spark, kg):
    from knowledge_graph_spark.graph.algorithms import k_hop_neighbors

    # region dir (id 1) → 1 hop: its nations; 2 hops: their customers + back
    res = k_hop_neighbors(kg, "directory_nodes", 1, k=2).collect()
    by_hop = {}
    for r in res:
        by_hop.setdefault(r.hops, set()).add((r.t, r.id))
    nations_of_r0 = {
        ("directory_nodes", r.n_nationkey + 11)
        for r in spark.read.parquet(f"{SF_SMALL}/nation.parquet")
        .filter(F.col("n_regionkey") == 0)
        .collect()
    }
    assert by_hop[1] == nations_of_r0
    assert all(t == "directory_nodes" for t, _ in by_hop[2])  # customers


def test_reachability_closure(spark, kg):
    from knowledge_graph_spark.graph.algorithms import reachable_from

    # from a region dir, everything below it is reachable via DIR_CONTAINS_*
    res = reachable_from(
        kg, "directory_nodes", 1, edge_types=("DIR_CONTAINS_DIR", "DIR_CONTAINS_FILE")
    )
    kinds = {r.t for r in res.collect()}
    assert kinds == {"directory_nodes", "file_nodes"}
    assert res.count() > 10


def test_connected_components_regions_disconnected(spark, kg):
    from knowledge_graph_spark.graph.algorithms import connected_components

    # restrict to the directory forest: 5 region trees → 5 components
    from knowledge_graph_spark.graph.model import KnowledgeGraph

    dirs_only = KnowledgeGraph(
        kg.spark,
        nodes=kg.nodes,
        edges={
            "directory_relationships": kg.edges["directory_relationships"].filter(
                F.col("type") == "DIR_CONTAINS_DIR"
            ),
            "file_relationships": kg.edges["file_relationships"].limit(0),
            "definition_relationships": kg.edges["definition_relationships"].limit(0),
            "imported_symbol_relationships": kg.edges["imported_symbol_relationships"].limit(0),
        },
    )
    cc = connected_components(dirs_only)
    n_components = cc.select("component").distinct().count()
    assert n_components == 5


def test_pagerank_orders_by_centrality(kg):
    from knowledge_graph_spark.graph.algorithms import pagerank

    pr = pagerank(kg, iterations=5)
    top = pr.limit(20).collect()
    assert abs(sum(r.rank for r in pr.collect()) - 1.0) < 1e-6
    # imported parts receive edges from many defs → parts should rank high
    assert any(r.node_table == "imported_symbol_nodes" for r in top)


def test_resolve_import_chains(spark, kg):
    from knowledge_graph_spark.graph.algorithms import resolve_import_chains

    res = resolve_import_chains(kg)
    rows = {r.import_id: (r.resolved_table, r.depth) for r in res.collect()}
    # every import resolves (all parts have def terminals reachable), and
    # definitions beat files at every depth (follow-through semantics:
    # chains are walked to the end, deepest definition wins)
    assert len(rows) == kg.imports.count()
    assert all(t == "definition_nodes" for t, _ in rows.values())
    # imports with no outgoing imp→imp link must resolve at depth 0
    from pyspark.sql import functions as F

    chained = {
        r.source_id
        for r in kg.edges["imported_symbol_relationships"]
        .filter(F.col("type") == "IMPORTED_SYMBOL_TO_IMPORTED_SYMBOL")
        .select("source_id")
        .collect()
    }
    assert all(d == 0 for i, (_, d) in rows.items() if i not in chained)
    assert all(d >= 1 for i, (_, d) in rows.items() if i in chained)


def test_resolve_import_chains_follows_links(spark):
    """Synthetic chain imp1→imp2→imp3→def: origins resolve at their depth."""
    from knowledge_graph_spark.graph.algorithms import resolve_import_chains
    from knowledge_graph_spark.graph.model import KnowledgeGraph
    from knowledge_graph_spark import schema as S

    imps = spark.createDataFrame(
        [(i, "import", f"m{i}", f"n{i}", None, "f.py", 0, 1, 0, 0, 0, 1) for i in (1, 2, 3)],
        S.IMPORTED_SYMBOL_NODE,
    )
    defs = spark.createDataFrame(
        [(7, "m.f", "f", "Function", "m.py", 0, 9, 0, 0, 0, 1, 1)], S.DEFINITION_NODE
    )
    def edge(src, dst, st, tt, ty):
        return (src, dst, st, tt, ty, None, None, None, None, None, None)

    ir = spark.createDataFrame(
        [
            edge(1, 2, "imported_symbol_nodes", "imported_symbol_nodes", "IMPORTED_SYMBOL_TO_IMPORTED_SYMBOL"),
            edge(2, 3, "imported_symbol_nodes", "imported_symbol_nodes", "IMPORTED_SYMBOL_TO_IMPORTED_SYMBOL"),
            edge(3, 7, "imported_symbol_nodes", "definition_nodes", "IMPORTED_SYMBOL_TO_DEFINITION"),
        ],
        S.RELATIONSHIP,
    )
    empty_rel = spark.createDataFrame([], S.RELATIONSHIP)
    kg2 = KnowledgeGraph(
        spark,
        nodes={
            "directory_nodes": spark.createDataFrame([], S.DIRECTORY_NODE),
            "file_nodes": spark.createDataFrame([], S.FILE_NODE),
            "definition_nodes": defs,
            "imported_symbol_nodes": imps,
        },
        edges={
            "directory_relationships": empty_rel,
            "file_relationships": empty_rel,
            "definition_relationships": empty_rel,
            "imported_symbol_relationships": ir,
        },
    )
    res = {r.import_id: r.depth for r in resolve_import_chains(kg2).collect()}
    assert res == {1: 2, 2: 1, 3: 0}


def test_triangle_count_known_graph(spark):
    """K4 has 4 triangles; duplicate/reversed edges and a pendant vertex
    must not change the count."""
    from knowledge_graph_spark.graph.algorithms import triangle_count

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    edges = k4 + [(b, a) for a, b in k4] + [("d", "e"), ("a", "b")]
    df = spark.createDataFrame(edges, "src string, dst string")
    assert triangle_count(df).collect()[0].n_triangles == 4


def test_k_core_peels_to_triangle(spark):
    """Triangle + pendant tail: the 2-core is exactly the triangle, and
    peeling must cascade (removing the leaf makes its neighbor weak too)."""
    from knowledge_graph_spark.graph.algorithms import k_core
    from knowledge_graph_spark.graph.model import KnowledgeGraph
    from tests.conftest import make_edge_df

    # a-b-c triangle; c-d-e chain hanging off it
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    kg = KnowledgeGraph(
        spark,
        nodes={},
        edges={"definition_relationships": make_edge_df(spark, pairs)},
    )
    out = k_core(kg, k=2).collect()
    # hashed ids: check by count and degrees — the triangle survives with
    # degree 2 each; d and e cascade out
    assert len(out) == 3
    assert all(r.degree == 2 for r in out)
    assert k_core(kg, k=3).count() == 0


def test_label_propagation_invariants(spark):
    """Every node gets exactly one community; disconnected subgraphs never
    share one; the assignment is deterministic."""
    from knowledge_graph_spark.graph.algorithms import label_propagation
    from knowledge_graph_spark.graph.model import KnowledgeGraph
    from tests.conftest import make_edge_df

    clique1 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    clique2 = [(a, b) for a in "wxyz" for b in "wxyz" if a < b]
    kg = KnowledgeGraph(
        spark, nodes={},
        edges={"definition_relationships": make_edge_df(spark, clique1 + clique2)},
    )
    rows = label_propagation(kg).collect()
    assert len(rows) == 8 and len({r.node_id for r in rows}) == 8
    comm = {r.node_id: r.community for r in rows}
    left = {comm[ord(c) * 100 + 1] for c in "abcd"}
    right = {comm[ord(c) * 100 + 1] for c in "wxyz"}
    assert not (left & right)  # disconnected components never merge
    assert len(left) == 1 and len(right) == 1  # cliques converge to one label
    rows2 = label_propagation(kg).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]


def test_pagerank_top20_matches_float_ordering(kg):
    """The graduated pagerank_top20 entry surfaces the BIGINT fixed-point
    recurrence at the float variant's depth (5 iterations): the top-20 node
    SET must agree with float PageRank, and the heads must coincide — the
    integer micro-unit math is the same recurrence with deterministic
    rounding, not a different algorithm."""
    from knowledge_graph_spark.graph.algorithms import pagerank, pagerank_exact

    fl = pagerank(kg, iterations=5).limit(20).collect()
    ex = pagerank_exact(kg, iterations=5).limit(20).collect()
    fl_set = {(r.node_table, r.node_id) for r in fl}
    ex_set = {
        (r.node.split("#", 1)[0], int(r.node.split("#", 1)[1])) for r in ex
    }
    # boundary positions may swap on float-vs-integer rounding near-ties;
    # the bulk of the set and the head must agree
    assert len(fl_set & ex_set) >= 18, sorted(fl_set ^ ex_set)
    head = ex[0].node.split("#", 1)
    assert (fl[0].node_table, fl[0].node_id) == (head[0], int(head[1]))


def test_label_prop_community_size_invariants(kg):
    """The graduated label_prop_communities entry's two invariants, checked
    at test scale directly from the LPA output: sizes sum to the labeled
    node count, and every community label is the xxhash of a labeled node."""
    from knowledge_graph_spark.graph.algorithms import label_propagation

    lpa = label_propagation(kg, rounds=2).cache()
    n = lpa.count()
    sizes = lpa.groupBy("community").agg(F.count(F.lit(1)).alias("size"))
    assert sizes.agg(F.sum("size")).collect()[0][0] == n
    node_hashes = lpa.select(
        F.xxhash64("node_table", "node_id").alias("community")
    ).distinct()
    assert sizes.join(node_hashes, "community", "left_anti").count() == 0
    lpa.unpersist()
