"""Multi-hop graph analytics — DataFrame-native iterative algorithms.

The north star names GraphX for graph analytics; GraphX has no Python API, so
these are the idiomatic PySpark equivalents: Pregel-style iteration as
join-until-fixpoint over edge DataFrames (what GraphX does under the hood),
with checkpoint-friendly loop hygiene (cache + localCheckpoint each round to
cut the growing lineage — at 100 TB an unbounded lineage OOMs the driver).

Coverage:
- k_hop_neighbors — generalizes G1 beyond 1 hop.
- reachable_from / call-graph closure — G4's multi-hop extension
  (the reference computes only 1-hop; SURVEY §2.12 notes no Cypher `*1..n`).
- connected_components — min-label propagation to fixpoint.
- pagerank — repo-map importance ranking (SURVEY Phase 4).
- resolve_import_chains — J8: imp→imp→…→{def,file} with cycle guard,
  the DataFrame fixpoint form of python/analyzer.rs:643-735,787-850.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from knowledge_graph_spark.graph.model import KnowledgeGraph


def _edges_both_directions(kg: KnowledgeGraph) -> DataFrame:
    """Undirected view over every edge table, nodes keyed (table, id)."""
    parts = []
    for key, df in kg.edges.items():
        e = df.select(
            F.col("source_table").alias("src_t"),
            F.col("source_id").alias("src"),
            F.col("target_table").alias("dst_t"),
            F.col("target_id").alias("dst"),
        )
        parts.append(e)
        parts.append(
            e.select(
                F.col("dst_t").alias("src_t"),
                F.col("dst").alias("src"),
                F.col("src_t").alias("dst_t"),
                F.col("src").alias("dst"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def k_hop_neighbors(
    kg: KnowledgeGraph, node_table: str, node_id: int, k: int = 2
) -> DataFrame:
    """All nodes within k undirected hops (G1 generalized). Returns
    (node_table, node_id, hops) with minimal hop count."""
    edges = _edges_both_directions(kg).cache()
    frontier = kg.spark.createDataFrame(
        [(node_table, node_id, 0)], "t string, id long, hops int"
    )
    seen = frontier
    for hop in range(1, k + 1):
        nxt = (
            frontier.join(
                edges,
                (frontier.t == edges.src_t) & (frontier.id == edges.src),
            )
            .select(
                F.col("dst_t").alias("t"),
                F.col("dst").alias("id"),
                F.lit(hop).alias("hops"),
            )
            .distinct()
            .join(seen.select("t", "id"), ["t", "id"], "left_anti")
            .cache()
        )
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).cache()
        frontier = nxt
    edges.unpersist()
    return seen.orderBy("hops", "t", "id")


def reachable_from(
    kg: KnowledgeGraph,
    start_table: str,
    start_id: int,
    edge_types: tuple[str, ...] | None = None,
    max_hops: int = 20,
) -> DataFrame:
    """Directed transitive closure from one node (call-graph closure when
    edge_types = CALLS family — the multi-hop G4)."""
    parts = []
    for df in kg.edges.values():
        e = df
        if edge_types:
            e = e.filter(F.col("type").isin(list(edge_types)))
        parts.append(
            e.select(
                F.col("source_table").alias("src_t"),
                F.col("source_id").alias("src"),
                F.col("target_table").alias("dst_t"),
                F.col("target_id").alias("dst"),
            )
        )
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    edges = edges.distinct().cache()

    frontier = kg.spark.createDataFrame(
        [(start_table, start_id, 0)], "t string, id long, hops int"
    )
    seen = frontier
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, (frontier.t == edges.src_t) & (frontier.id == edges.src))
            .select(
                F.col("dst_t").alias("t"), F.col("dst").alias("id"), F.lit(hop).alias("hops")
            )
            .distinct()
            .join(seen.select("t", "id"), ["t", "id"], "left_anti")
            .cache()
        )
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).cache()
        frontier = nxt
    edges.unpersist()
    return seen.orderBy("hops", "t", "id")


def connected_components(kg: KnowledgeGraph, max_iter: int = 20) -> DataFrame:
    """Undirected connected components by min-label propagation to fixpoint.

    Labels are (table, id) keys hashed to a stable long; each round every
    node adopts the min label in its closed neighborhood; stop when no label
    changes. O(diameter) rounds — the small/large-star optimization drops in
    here if diameters grow at scale.
    """
    edges = _edges_both_directions(kg).select(
        F.concat_ws("#", "src_t", "src").alias("a"),
        F.concat_ws("#", "dst_t", "dst").alias("b"),
    ).cache()
    nodes = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .distinct()
    )
    # label = xxhash64(own key) initially, so every label VALUE is some
    # node's hash — that makes pointer jumping (label := label(label))
    # expressible as a join against the nodes' own hashes
    labels = nodes.withColumn("label", F.xxhash64("node")).cache()
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        cand = labels.join(neighbor_min, labels.node == neighbor_min.a, "left_outer").select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                "label"
            ),
            F.col("label").alias("_old"),
        )
        # pointer jumping: adopt the label of the node whose hash we hold —
        # collapses chains in O(log diameter) rounds instead of O(diameter)
        by_hash = labels.select(
            F.xxhash64("node").alias("nh"), F.col("label").alias("hop_label")
        )
        new_labels = (
            cand.join(by_hash, cand.label == by_hash.nh, "left_outer")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("hop_label"), F.col("label"))
                ).alias("label"),
                "_old",
            )
            .withColumn("_changed", F.col("label") < F.col("_old"))
            .drop("_old")
            .localCheckpoint(eager=True)
        )
        converged = new_labels.filter(F.col("_changed")).isEmpty()
        labels.unpersist()
        labels = new_labels.drop("_changed").cache()
        if converged:
            break
    return labels.select(
        F.split("node", "#")[0].alias("node_table"),
        F.split("node", "#")[1].cast("long").alias("node_id"),
        F.col("label").alias("component"),
    )


def pagerank(
    kg: KnowledgeGraph, iterations: int = 10, damping: float = 0.85
) -> DataFrame:
    """PageRank over the directed graph — importance ranking for repo maps
    (files/definitions that everything references float to the top)."""
    parts = []
    for df in kg.edges.values():
        parts.append(
            df.select(
                F.concat_ws("#", "source_table", "source_id").alias("src"),
                F.concat_ws("#", "target_table", "target_id").alias("dst"),
            )
        )
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    edges = edges.distinct().cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()
    # dangling nodes (no out-edges) leak rank mass — redistribute uniformly,
    # else Σrank decays below 1 each round. The node SET is static: compute
    # it once; only its rank mass changes per iteration.
    dangling_nodes = nodes.join(
        out_deg, nodes.node == out_deg.src, "left_anti"
    ).cache()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        dangling = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.sum("rank"))
            .collect()[0][0]
            or 0.0
        )
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .join(out_deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = (
            nodes.join(contribs, "node", "left_outer")
            .select(
                "node",
                (
                    F.lit((1 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("csum"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return ranks.select(
        F.split("node", "#")[0].alias("node_table"),
        F.split("node", "#")[1].cast("long").alias("node_id"),
        "rank",
    ).orderBy(F.desc("rank"), "node_table", "node_id")


def resolve_import_chains(kg: KnowledgeGraph, max_depth: int = 10) -> DataFrame:
    """J8: follow imp→imp edges to each import's terminal resolution
    (definition or file), with cycle guard — the DataFrame-fixpoint form of
    the reference's recursive resolver (python/analyzer.rs:643-735,787-850:
    recursion + `visited` set per chain; here the anti-join against settled
    rows is the visited set, max_depth the recursion cap)."""
    ir = kg.edges["imported_symbol_relationships"]
    imp_imp = ir.filter(F.col("type") == "IMPORTED_SYMBOL_TO_IMPORTED_SYMBOL").select(
        F.col("source_id").alias("src"), F.col("target_id").alias("dst")
    ).cache()
    terminal = ir.filter(
        F.col("type").isin(["IMPORTED_SYMBOL_TO_DEFINITION", "IMPORTED_SYMBOL_TO_FILE"])
    ).select(
        F.col("source_id").alias("imp"),
        F.col("target_table").alias("resolved_table"),
        F.col("target_id").alias("resolved_id"),
    )

    # state: (origin imp, current imp, depth); settle when current imp has a
    # terminal edge (prefer definition per reference resolution order)
    state = kg.imports.select(
        F.col("id").alias("origin"), F.col("id").alias("cur"), F.lit(0).alias("depth")
    )
    resolved = None
    for depth in range(max_depth + 1):
        hit = (
            state.join(terminal, state.cur == terminal.imp)
            .withColumn(
                "pref",
                F.when(F.col("resolved_table") == "definition_nodes", 0).otherwise(1),
            )
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("origin").orderBy(
                        "pref", "resolved_table", "resolved_id"
                    )
                ),
            )
            .filter(F.col("rk") == 1)
            .select("origin", "resolved_table", "resolved_id", "depth")
        )
        resolved = hit if resolved is None else resolved.unionByName(hit)
        settled = resolved.select("origin").distinct()
        state = (
            state.join(settled, "origin", "left_anti")
            .join(imp_imp, state.cur == imp_imp.src)
            .select("origin", F.col("dst").alias("cur"), (F.col("depth") + 1).alias("depth"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if state.isEmpty():
            break
    imp_imp.unpersist()
    out = resolved.dropDuplicates(["origin"])
    return out.select(
        F.col("origin").alias("import_id"), "resolved_table", "resolved_id", "depth"
    ).orderBy("import_id")
