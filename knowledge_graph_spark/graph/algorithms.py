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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knowledge_graph_spark.graph.model import KnowledgeGraph


# shared persisted-block hygiene (see knowledge_graph_spark.persist);
# aliased here because every loop below uses them
from knowledge_graph_spark.persist import (  # noqa: E402
    checkpoint_and_release as _checkpoint_and_release,
    persistent_rdd_ids as _persistent_rdd_ids,
    release_persisted_since as _release_persisted_since,
)


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
    before = _persistent_rdd_ids(kg.spark)
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
    return _checkpoint_and_release(kg.spark, before, seen.orderBy("hops", "t", "id"))


def reachable_from(
    kg: KnowledgeGraph,
    start_table: str,
    start_id: int,
    edge_types: tuple[str, ...] | None = None,
    max_hops: int = 20,
    assume_tree: bool = False,
) -> DataFrame:
    """Directed transitive closure from one node (call-graph closure when
    edge_types = CALLS family — the multi-hop G4).

    ``assume_tree=True`` (safe when every node has ≤1 parent, e.g. the
    DIR_CONTAINS_* forest) drops the per-hop distinct + seen anti-join and
    the setup distinct: a tree walk reaches each node exactly once, so those
    three shuffles per hop are pure overhead."""
    before = _persistent_rdd_ids(kg.spark)
    from knowledge_graph_spark.schema import tables_for_edge_types

    parts = []
    # static pruning: a typed walk (e.g. DIR_CONTAINS_*) touches only the
    # tables whose closed type set intersects the request — at 100 TB that is
    # the difference between scanning one edge table and all four
    for key in tables_for_edge_types(edge_types):
        e = kg.edges[key]
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
    if not assume_tree:
        edges = edges.distinct()
    edges = edges.cache()

    frontier = kg.spark.createDataFrame(
        [(start_table, start_id, 0)], "t string, id long, hops int"
    )
    seen = frontier
    for hop in range(1, max_hops + 1):
        nxt = frontier.join(
            edges, (frontier.t == edges.src_t) & (frontier.id == edges.src)
        ).select(
            F.col("dst_t").alias("t"), F.col("dst").alias("id"), F.lit(hop).alias("hops")
        )
        if not assume_tree:
            nxt = nxt.distinct().join(seen.select("t", "id"), ["t", "id"], "left_anti")
        nxt = nxt.cache()
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).cache()
        frontier = nxt
    edges.unpersist()
    return _checkpoint_and_release(kg.spark, before, seen.orderBy("hops", "t", "id"))


def _driver_union_find(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Finish a contracted component graph on the driver: union-find with
    path compression + min-root union over the collected (a, b) pairs,
    returned as a (u, lab) merge map. Deterministic: rows sorted before
    processing, smaller root always wins."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in sorted((r["a"], r["b"]) for r in edges.collect()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return spark.createDataFrame(
        [(u, find(u)) for u in parent], "u long, lab long"
    )


def connected_components(
    kg: KnowledgeGraph, max_iter: int = 30, driver_finish_rows: int = 600_000
) -> DataFrame:
    """Undirected connected components by randomized contraction.

    Each round, every node merges into ``least(self, min(neighbors))`` and the
    edge list is REWRITTEN onto the merged labels — so the graph shrinks
    geometrically and only round 1 touches the full edge set (min-label
    propagation, by contrast, re-joins the full edge list every round).
    Node keys are xxhash64 longs, which (a) keeps shuffles narrow and
    (b) randomizes the key order relative to the topology, so min-merge
    behaves like random-mate contraction: O(log n) rounds w.h.p. even on
    paths, where an ordered-id min-merge degenerates to O(n).

    The per-round merge maps are retained (they shrink with the graph) and
    composed at the end in a single plan — one shuffled join for the round-1
    map, broadcast joins for the tail.

    Collision bound (r9 audit, shared by every algorithm in this module
    that keys nodes as ``xxhash64(table, id)`` — components, pagerank,
    k_core, label_propagation, triangle_count): birthday odds ≈ k²/2⁶⁵ for
    k distinct nodes — 2.7e-8 at 1M, 2.7e-6 at 10M, and EXPECTED past ~2³²
    keys. ``knowledge_graph_spark.audit.audit_graph_node_keys`` runs the
    one-pass distinct-keys vs distinct-hashes certification
    (tests/test_hash_audit.py at sf0.01; ROUND_NOTES for the replicated
    sf1) — run it before trusting a new 1e8+-node corpus.
    """
    before = _persistent_rdd_ids(kg.spark)
    parts = []
    for df in kg.edges.values():
        # multi-arg xxhash64 chains (table, id) through the hash JVM-side —
        # no per-row string concat allocation (measurably faster at 5M+ rows)
        ha = F.xxhash64("source_table", "source_id")
        hb = F.xxhash64("target_table", "target_id")
        parts.append(
            df.select(
                F.col("source_table").alias("t"),
                F.col("source_id").alias("id"),
                ha.alias("a"),
                hb.alias("b"),
            )
        )
        parts.append(
            df.select(
                F.col("target_table").alias("t"),
                F.col("target_id").alias("id"),
                hb.alias("a"),
                ha.alias("b"),
            )
        )
    und = parts[0]
    for p in parts[1:]:
        und = und.unionByName(p)
    # one pass of string hashing, cached; everything round 0 needs is a
    # projection of this (no distinct — groupBy-min ignores duplicates, and a
    # distinct is a full extra shuffle of the widest dataset here). Coalesced
    # to the cluster's parallelism: the raw union inherits one partition per
    # upstream cache block (hundreds of tiny tasks locally) while each
    # downstream pass over it is a full scan anyway.
    und = und.coalesce(kg.spark.sparkContext.defaultParallelism).cache()

    # round 0 fused with the node dictionary: ONE shuffle of the full edge
    # list yields both (t, id, key) per node AND its round-0 merge target
    # (every endpoint appears as `a` because both directions were emitted)
    out0 = (
        und.groupBy("t", "id", "a")
        .agg(F.min("b").alias("mb"))
        .select("t", "id", F.col("a").alias("u"), F.least("a", "mb").alias("lab"))
        .localCheckpoint(eager=True)
    )

    # a merge map of ≤ ~50M rows (two longs ≈ 16B/row) broadcasts fine; past
    # that, fall back to shuffle joins (the 100 TB path)
    broadcast_rows = 50_000_000
    # ``driver_finish_rows``: once the contracted graph fits comfortably on
    # the driver, finish with union-find there — geometric shrink means the
    # tail rounds process a few thousand edges but still pay 3-4 Spark jobs
    # each (~2 s/round of pure scheduling). Bounded driver memory (two longs
    # × threshold ≈ 10 MB at the default), so this is scale-safe — at 100 TB
    # the loop contracts down to the same threshold. 0 disables (pure
    # distributed loop). Measured at sf0.1: 600k (skips one distributed
    # round vs 200k) is ~30-40% faster end-to-end.

    edges = und.filter(F.col("a") != F.col("b")).select("a", "b")
    m = out0.select("u", "lab")
    m_small = m.count() <= broadcast_rows  # free: out0 is checkpointed
    merge_maps: list = []
    for _ in range(max_iter):
        la = m.select(F.col("u").alias("a"), F.col("lab").alias("la"))
        lb = m.select(F.col("u").alias("b"), F.col("lab").alias("lb"))
        if m_small:
            la, lb = F.broadcast(la), F.broadcast(lb)
        nxt = (
            edges.join(la, "a")
            .join(lb, "b")
            .filter(F.col("la") != F.col("lb"))
            .select(F.col("la").alias("a"), F.col("lb").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        edges = nxt
        ec = edges.count()  # cheap: edges are checkpointed
        if ec == 0:
            break
        if ec <= driver_finish_rows:
            merge_maps.append((_driver_union_find(kg.spark, edges), True))
            break
        # merge target = min over the CLOSED neighborhood (self via least)
        m = (
            edges.groupBy("a")
            .agg(F.min("b").alias("mb"))
            .select(F.col("a").alias("u"), F.least("a", "mb").alias("lab"))
            .localCheckpoint(eager=True)
        )
        # merge-map rows ≤ contracted edge rows, so ec bounds the broadcast
        # decision without a second count job per round
        m_small = ec <= broadcast_rows
        merge_maps.append((m, m_small))

    und.unpersist()
    out = out0.select("t", "id", F.col("lab").alias("component"))
    for m, small in merge_maps:
        mm = m.withColumnsRenamed({"u": "component", "lab": "_nl"})
        if small:
            mm = F.broadcast(mm)
        out = out.join(mm, "component", "left_outer").select(
            "t", "id", F.coalesce(F.col("_nl"), F.col("component")).alias("component")
        )
    out = out.select(
        F.col("t").alias("node_table"), F.col("id").alias("node_id"), "component"
    )
    return _checkpoint_and_release(kg.spark, before, out)


def _weighted_adjacency(e: DataFrame) -> DataFrame:
    """(src, dst) pairs → deduped (src, dst, w=1/out-degree) in ONE exchange.

    Hash-partition on src, then dedup (src,dst) and out-degree as two window
    passes — both window specs are satisfied by hash(src) clustering (same
    src ⇒ same partition ⇒ same (src,dst) co-located), so neither adds a
    shuffle, one sort serves both, and the result stays partitioned on src
    for downstream joins to reuse. (A distinct → degree-groupBy → join →
    repartition shape pays three exchanges for the same output; pinned by
    tests/test_plans.py.)"""
    w_pair = Window.partitionBy("src", "dst").orderBy("dst")
    w_src = Window.partitionBy("src")
    return (
        e.repartition(F.col("src"))
        .withColumn("rn", F.row_number().over(w_pair))
        .filter(F.col("rn") == 1)
        .select("src", "dst", (F.lit(1.0) / F.count(F.lit(1)).over(w_src)).alias("w"))
    )


def pagerank(
    kg: KnowledgeGraph, iterations: int = 10, damping: float = 0.85
) -> DataFrame:
    """PageRank over the directed graph — importance ranking for repo maps
    (files/definitions that everything references float to the top).

    Node keys are xxhash64 longs (narrow shuffles); the adjacency is
    pre-weighted with 1/out-degree, hash-partitioned on src, and cached ONCE.
    Each iteration shuffles only the rank vector (2 longs + a double per
    node): rank⋈adj reuses adj's partitioning, then one groupBy(dst) and one
    join back to the node keys — the same plan shape that runs at 100 TB,
    where the rank vector is far past any broadcast threshold. The
    dangling-mass scalar folds into the update via a 1-row crossJoin instead
    of a per-iteration driver collect, and each iteration ends in an eager
    checkpoint so lineage stays flat. Driver-side broadcast builds are
    deliberately avoided: they re-execute the rank subplan per broadcast and
    degrade in long-lived sessions."""
    before = _persistent_rdd_ids(kg.spark)
    # AQE OFF for the whole loop: adaptive partition coalescing rewrites the
    # post-shuffle partition count per stage, which breaks the
    # hash(src)/hash(key) alignment the iteration relies on — every
    # coalesced stage forces the NEXT iteration to re-exchange the rank
    # vector. A fixed partition count keeps rank⋈adj and keys⋈contribs
    # exchange-free after the first shuffle.
    conf = kg.spark.conf
    aqe_before = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _pagerank_loop(kg, iterations, damping, before)
    finally:
        conf.set("spark.sql.adaptive.enabled", aqe_before)


def _pagerank_loop(
    kg: KnowledgeGraph, iterations: int, damping: float, before
) -> DataFrame:
    e = None
    for df in kg.edges.values():
        p = df.select(
            F.col("source_table").alias("st"),
            F.col("source_id").alias("si"),
            F.col("target_table").alias("dt"),
            F.col("target_id").alias("di"),
        )
        e = p if e is None else e.unionByName(p)
    e = e.select(
        F.xxhash64("st", "si").alias("src"),
        F.xxhash64("dt", "di").alias("dst"),
    )
    adj = _weighted_adjacency(e).cache()
    adj.count()

    # node inventory straight from the node tables — a narrow union scan, not
    # a distinct over the (much larger) edge-endpoint multiset; dropDuplicates
    # because a duplicated key would double-count its contribution
    nodes = None
    for t, df in kg.nodes.items():
        p = df.select(
            F.lit(t).alias("t"),
            F.col("id"),
            F.xxhash64(F.lit(t), "id").alias("key"),
        )
        nodes = p if nodes is None else nodes.unionByName(p)
    nodes = nodes.dropDuplicates(["key"]).localCheckpoint(eager=True)
    n = nodes.count()

    # dangling nodes (no out-edges) leak rank mass — their summed rank is
    # redistributed uniformly each round. The SET is static: fold it into the
    # initial rank vector as a boolean ONCE (one checkpoint, not two), so each
    # iteration reads the flag off the rank vector instead of paying a
    # per-iteration semi-join. adj.select(src).distinct() re-uses the cache's
    # hash(src) partitioning — partial/final agg, no exchange.
    srcs = adj.select("src").distinct()
    ranks = (
        nodes.select("key")
        .join(srcs, nodes.key == srcs.src, "left_outer")
        .select(
            "key",
            F.col("src").isNull().alias("is_dangling"),
            F.lit(1.0 / n).alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    keys = ranks.select("key", "is_dangling")
    # `keys` reads the INITIAL ranks checkpoint every round, so the loop's
    # release base protects everything up to here (nodes, adj, ranks0) and
    # only prior-round rank vectors are dropped — without this, iterations
    # pin O(rounds x |V|) rank blocks (local checkpoints are only freed on
    # GC of the DataFrame) and block-manager eviction churn dominates at sf1
    loop_base = _persistent_rdd_ids(kg.spark)
    for _ in range(iterations):
        round_start = _persistent_rdd_ids(kg.spark)
        r = ranks.select(F.col("key").alias("k"), F.col("rank").alias("rk"))
        # dangling mass fused into the contribs aggregation: dangling ranks
        # enter the SAME shuffle under a NULL dst (node keys are never null),
        # so one grouped exchange yields both the per-node sums and the
        # dangling total — no separate dmass job per iteration. Map-side
        # partial agg collapses the dangling rows to one per partition.
        grouped = (
            adj.join(r, adj.src == r.k)
            .select("dst", (F.col("rk") * F.col("w")).alias("v"))
            .unionByName(
                ranks.filter("is_dangling").select(
                    F.lit(None).cast("long").alias("dst"), F.col("rank").alias("v")
                )
            )
            .groupBy("dst")
            .agg(F.sum("v").alias("csum"))
        )
        contribs = grouped.filter(F.col("dst").isNotNull())
        # agg (not filter alone): stays one row even with zero dangling nodes
        dmass = grouped.filter(F.col("dst").isNull()).agg(
            F.sum("csum").alias("dm")
        )
        ranks = (
            keys.join(contribs, keys.key == contribs.dst, "left_outer")
            .crossJoin(dmass)
            .select(
                "key",
                "is_dangling",
                (
                    F.lit((1 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("csum"), F.lit(0.0))
                        + F.coalesce(F.col("dm"), F.lit(0.0)) / n
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        _release_persisted_since(
            kg.spark, loop_base, _persistent_rdd_ids(kg.spark) - round_start
        )
    adj.unpersist()
    out = nodes.join(ranks, "key").select(
        F.col("t").alias("node_table"), F.col("id").alias("node_id"), "rank"
    ).orderBy(F.desc("rank"), "node_table", "node_id")
    return _checkpoint_and_release(kg.spark, before, out)


def pagerank_exact_prep(kg: KnowledgeGraph):
    """The iteration-invariant prep of :func:`pagerank_exact` — deduped
    edge set, node dictionary (+count), degree-joined edges — as three
    eager checkpoints. Split out so callers running the recurrence at
    SEVERAL depths (pagerank_exact @3 and pagerank_top20 @5 share a bench
    session) pay the edge distinct + degree shuffle once.

    Keys are xxhash64 LONGS inside every shuffle (r8 optimization, guide
    §2.3 "narrower types"): the edge distinct, the degree aggregation, the
    degree join and every per-iteration rank exchange move 8-byte keys
    instead of ~24-byte ``table#id`` strings. The textual keys the oracle
    compares live ONLY in the ``names`` dictionary (key → ``table#id``),
    joined back once after the last iteration. Rank values are
    key-representation-independent (the recurrence sums over graph
    structure), so results are bit-identical — the same xxhash64-collision
    bet as triangle_count/connected_components, documented there."""
    eparts = []
    nparts = []
    for df in kg.edges.values():
        ha = F.xxhash64("source_table", "source_id")
        hb = F.xxhash64("target_table", "target_id")
        eparts.append(df.select(ha.alias("src"), hb.alias("dst")))
        nparts.append(
            df.select(
                ha.alias("key"),
                F.concat_ws("#", "source_table", "source_id").alias("node"),
            )
        )
        nparts.append(
            df.select(
                hb.alias("key"),
                F.concat_ws("#", "target_table", "target_id").alias("node"),
            )
        )
    e = eparts[0]
    for p in eparts[1:]:
        e = e.unionByName(p)
    e = e.distinct().localCheckpoint(eager=True)
    names = nparts[0]
    for p in nparts[1:]:
        names = names.unionByName(p)
    names = names.dropDuplicates(["key"]).localCheckpoint(eager=True)
    n = names.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    return names, n, deg, ed


def pagerank_exact(
    kg: KnowledgeGraph, iterations: int = 3, scale: int = 10**12, prep=None
) -> DataFrame:
    """Bit-exact fixed-point PageRank — the oracle-checkable twin of
    :func:`pagerank`.

    Float PageRank cannot be hash-compared across engines (shuffle order
    perturbs double summation), so this variant does the whole power
    iteration in BIGINT micro-units (``scale`` = 1.0): identical truncating
    integer division (Spark ``DIV`` ≡ DuckDB ``//`` on positives) at every
    step makes the result deterministic and engine-independent —
    ``__spark_entry__._pagerank_exact_sql`` unrolls the very same recurrence
    as DuckDB CTEs. The update rule per node v with damping 85/100::

        rank'(v) = (15 * (scale DIV n)) DIV 100
                 + (85 * (Σ_{u→v} rank(u) DIV outdeg(u) + dangling DIV n)) DIV 100

    Same scale shape as :func:`pagerank` (edge set shuffled once, rank
    vector per iteration); the per-iteration dangling-mass collect is a
    1-row scalar, bounded at any data size. The loop iterates on xxhash64
    LONG keys (narrow shuffles, guide §2.3); the ``table#id`` strings the
    oracle reproduces textually are joined back from the prep's ``names``
    dictionary after the final iteration — rank values are structure-only,
    so they are bit-identical either way. Pass ``prep`` (from
    :func:`pagerank_exact_prep`) to reuse the edge/degree build across
    depths."""
    before = _persistent_rdd_ids(kg.spark)
    names, n, deg, ed = prep if prep is not None else pagerank_exact_prep(kg)
    nodes = names.select(F.col("key").alias("node"))
    base = (15 * (scale // n)) // 100
    # the dangling SET (no out-edges) is iteration-INVARIANT — fold it into
    # the rank vector as a boolean ONCE, so each iteration reads the flag
    # instead of paying a per-iteration string-keyed anti-join (measured at
    # 10x: the 5-deep recurrence was the one superlinear query, exponent
    # 1.22, and the anti-join was the only per-iteration exchange the float
    # variant had already eliminated). Values are bit-identical — the
    # recurrence is unchanged, only WHERE the static set is computed moved.
    r = (
        nodes.join(deg.select("src"), nodes.node == F.col("src"), "left_outer")
        .select(
            "node",
            F.col("src").isNull().alias("is_dangling"),
            F.lit(scale // n).cast("long").alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    # prior-round rank vectors are dead once the new checkpoint is
    # materialized — release them (same hygiene as pagerank/k_core r8);
    # the base protects prep's edge/degree checkpoints and the initial r
    loop_base = _persistent_rdd_ids(kg.spark)
    for _ in range(iterations):
        round_start = _persistent_rdd_ids(kg.spark)
        # dangling mass as a broadcast 1-row frame — the scalar never
        # round-trips through the driver and each iteration is ONE action
        dang_df = r.filter("is_dangling").agg(
            F.expr(f"coalesce(sum(rank), CAST(0 AS BIGINT)) DIV {n}").alias("dang_per")
        )
        contribs = (
            ed.join(r, ed.src == r.node)
            .select("dst", F.expr("rank DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .withColumnRenamed("dst", "node")
        )
        r = (
            r.select("node", "is_dangling")
            .join(contribs, "node", "left_outer")
            .crossJoin(F.broadcast(dang_df))
            .selectExpr(
                "node",
                "is_dangling",
                f"CAST({base} + (85 * (coalesce(s, CAST(0 AS BIGINT)) + dang_per))"
                " DIV 100 AS BIGINT) AS rank",
            )
            .localCheckpoint(eager=True)
        )
        _release_persisted_since(
            kg.spark, loop_base, _persistent_rdd_ids(kg.spark) - round_start
        )
    # reattach the textual node keys ONCE, after the last iteration — the
    # only place the oracle-visible strings are needed
    out = (
        r.select(F.col("node").alias("key"), "rank")
        .join(names, "key")
        .select("node", "rank")
        .orderBy(F.desc("rank"), "node")
    )
    return _checkpoint_and_release(kg.spark, before, out)


def resolve_import_chains(kg: KnowledgeGraph, max_depth: int = 10) -> DataFrame:
    """J8: follow imp→imp edges to each import's terminal resolution
    (definition or file), with cycle guard — the DataFrame-fixpoint form of
    the reference's recursive resolver (python/analyzer.rs:643-735,787-850:
    recursion + `visited` set per chain; here the anti-join against settled
    rows is the visited set, max_depth the recursion cap)."""
    before = _persistent_rdd_ids(kg.spark)
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

    # state: (origin imp, current imp, depth). Chains are followed to the
    # END (every reachable terminal is collected), then one result per
    # origin is picked by (definition-over-file, DEEPEST depth, table, id):
    # a re-export that carries both an imp→file edge (its resolved file)
    # and an imp→imp edge (the re-exporting binding) resolves through the
    # chain to the terminal definition, exactly like the reference's
    # recursion into matched imported symbols — the depth-0 file link is
    # only the fallback when the chain dies unresolved.
    state = kg.imports.select(
        F.col("id").alias("origin"), F.col("id").alias("cur"), F.lit(0).alias("depth")
    )
    hits = None
    for _depth in range(max_depth + 1):
        hit = state.join(terminal, state.cur == terminal.imp).select(
            "origin", "resolved_table", "resolved_id", "depth"
        )
        hits = hit if hits is None else hits.unionByName(hit)
        state = (
            state.join(imp_imp, state.cur == imp_imp.src)
            .select("origin", F.col("dst").alias("cur"), (F.col("depth") + 1).alias("depth"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if state.isEmpty():
            break
    imp_imp.unpersist()
    out = (
        hits.withColumn(
            "pref",
            F.when(F.col("resolved_table") == "definition_nodes", 0).otherwise(1),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("origin").orderBy(
                    "pref", F.desc("depth"), "resolved_table", "resolved_id"
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            F.col("origin").alias("import_id"), "resolved_table", "resolved_id", "depth"
        )
        .orderBy("import_id")
    )
    return _checkpoint_and_release(kg.spark, before, out)


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst", orient: str = "degree"
) -> DataFrame:
    """Global triangle count over an undirected graph given as (src, dst)
    pairs (any direction, duplicates fine). Returns one row (n_triangles).

    A canonical total-order orientation + the join pattern
    e1(u,v)⋈e2(v,w)⋈e3(u,w) enumerates each triangle exactly once. The
    DEFAULT orientation is DEGREE ordering — every edge points from its
    lower-(degree, id) endpoint, bounding the wedge fan-out per node by
    O(sqrt(m)) (arboricity argument), so a hub node never becomes a
    quadratic wedge generator; the 3-join pattern is unchanged because rank
    orientation is a total order exactly like u < v. Measured (round 4,
    xxhash64 long keys): degree beats key ordering at BOTH scales — 4.7 s
    vs 5.9 s at sf0.1, and 24.7 s vs 207.5 s on the 10x-replicated sf1
    whose shared-directory hubs (max degree 643 → 6421) blow the key path
    up superlinearly (exponent 1.47 → 0.73; ROUND_NOTES r4). The r3 note
    that degree ordering was net slower predates the long-key change.
    ``orient="key"`` keeps the plain u < v path for comparison.
    """
    spark = edges.sparkSession
    before = _persistent_rdd_ids(spark)
    e = (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("u"),
            F.greatest(src, dst).alias("v"),
        )
        .distinct()
        .cache()
    )
    if orient != "key":
        deg = (
            e.select(F.explode(F.array("u", "v")).alias("n"))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        du = deg.withColumnsRenamed({"n": "u", "d": "_du"})
        dv = deg.withColumnsRenamed({"n": "v", "d": "_dv"})
        lower_first = (F.col("_du") < F.col("_dv")) | (
            (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
        )
        e = (
            e.join(du, "u")
            .join(dv, "v")
            .select(
                F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("_a"),
                F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("_b"),
            )
            .withColumnsRenamed({"_a": "u", "_b": "v"})
            .cache()
        )
    e1 = e
    e2 = e.select(F.col("u").alias("v2"), F.col("v").alias("w"))
    e3 = e.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    tri = (
        e1.join(e2, e1.v == e2.v2)
        .join(e3, (e1.u == e3.u3) & (e2.w == e3.w3))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    # release the cached canonical edge set once the count is materialized —
    # without this every invocation leaked a session-lifetime cached dataset
    return _checkpoint_and_release(spark, before, tri)


def k_core(kg: KnowledgeGraph, k: int = 2, max_iter: int = 50) -> DataFrame:
    """k-core decomposition: iteratively peel nodes with (undirected, deduped)
    degree < k until fixpoint; returns surviving (node_table, node_id, degree)
    — degree as of the final core.

    Peeling is the canonical 'iterate until stable' graph reduction (dense
    subgraph mining, spam/bot cluster surfacing in training-data graphs).
    Each round costs one degree aggregation and one semi-join edge filter on
    the shrinking edge set; rounds are O(peeling depth), and every round ends
    in an eager checkpoint so lineage stays flat. Node keys are xxhash64
    longs (narrow shuffles), the same trick as connected_components.
    """
    before = _persistent_rdd_ids(kg.spark)
    nparts = []
    eparts = []
    for df in kg.edges.values():
        ha = F.xxhash64("source_table", "source_id")
        hb = F.xxhash64("target_table", "target_id")
        nparts.append(
            df.select(
                F.col("source_table").alias("t"), F.col("source_id").alias("id"),
                ha.alias("a"),
            )
        )
        nparts.append(
            df.select(
                F.col("target_table").alias("t"), F.col("target_id").alias("id"),
                hb.alias("a"),
            )
        )
        # canonical (least, greatest) orientation at the SOURCE (r8
        # optimization, guide §2.3): the dedup shuffle moves ONE row per
        # directed edge instead of the two mirrored rows the old
        # both-directions union shuffled — half the distinct's input for the
        # identical undirected edge set (the mirror is re-added map-side
        # after the dedup)
        eparts.append(
            df.select(F.least(ha, hb).alias("u"), F.greatest(ha, hb).alias("v"))
        )
    und = nparts[0]
    for p in nparts[1:]:
        und = und.unionByName(p)
    # node dictionary (one row per endpoint key), one pass over the union
    names = und.groupBy("a").agg(F.first("t").alias("t"), F.first("id").alias("id"))
    ecan = eparts[0]
    for p in eparts[1:]:
        ecan = ecan.unionByName(p)
    ecan = ecan.filter(F.col("u") != F.col("v")).distinct()
    edges = (
        ecan.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(ecan.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .localCheckpoint(eager=True)
    )
    converged = False
    deg = None
    for _ in range(max_iter):
        round_start = _persistent_rdd_ids(kg.spark)
        # pin the per-round degree table (|V| narrow rows) instead of a
        # separate weak-set checkpoint (r8 optimization): the weak set is a
        # FILTER over it, the emptiness probe a cheap scan of pinned rows,
        # the anti-join build sides read it with true size stats (AQE
        # broadcasts exactly when weak is genuinely small), and on
        # convergence the SAME pinned table is the output degree — the old
        # shape re-ran a full-edge degree shuffle after the loop
        deg = (
            edges.groupBy("a")
            .agg(F.count(F.lit(1)).alias("d"))
            .localCheckpoint(eager=True)
        )
        weak = deg.filter(F.col("d") < k).select("a")
        if weak.isEmpty():
            converged = True
            break
        # drop every edge touching a weak node (both directions are present,
        # so two semi-filters on `a`-side suffice via the mirrored copy).
        # No forced broadcast: round-1 weak can be a large node fraction at
        # scale; the pinned deg gives AQE the true size, so it picks
        # broadcast-anti exactly when weak is genuinely small
        edges = (
            edges.join(weak, "a", "left_anti")
            .join(weak.withColumnRenamed("a", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        # the new edge checkpoint holds its own partitions — PREVIOUS
        # rounds' edge/weak blocks are dead weight. Unlike CC, peeled edge
        # sets need not shrink geometrically, so leaving every round pinned
        # accumulates O(rounds x |E|) in the block manager and eviction
        # churn made repeat sf1 runs swing 53 -> 201 s (measured r8).
        # Release everything the loop created before this round.
        _release_persisted_since(
            kg.spark, before, _persistent_rdd_ids(kg.spark) - round_start
        )
    if converged and deg is not None:
        deg = deg.withColumnRenamed("d", "degree")
    else:
        # max_iter exhausted mid-peel: the pinned deg predates the final
        # edge update — recompute from the last edge set (convergence
        # normally breaks the loop, so this path is the rare fallback)
        deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
    out = (
        deg.join(names, "a")
        .select(F.col("t").alias("node_table"), F.col("id").alias("node_id"), "degree")
        .orderBy("node_table", "node_id")
    )
    return _checkpoint_and_release(kg.spark, before, out)


def label_propagation(kg: KnowledgeGraph, rounds: int = 3) -> DataFrame:
    """Semi-synchronous label propagation (LPA) communities: every node
    repeatedly adopts the most frequent label among its neighbors (ties →
    smallest label, so the result is deterministic). Unlike
    connected_components (pure connectivity), LPA splits a connected graph
    into DENSITY-based communities — the near-dup-cluster / spam-ring lens
    on a training-data graph.

    Fixed round count (LPA does not converge monotonically); each round is
    one join of the label vector onto the pinned adjacency (reusing its
    hash(b) clustering), one (node, label) count aggregation, and one
    per-node argmax window — all shuffles carry at most |E| narrow rows, and
    each round ends in an eager checkpoint. Isolated nodes keep their own
    label via the left join.

    The adjacency's hash(b) layout is pinned PHYSICALLY — repartition +
    eager localCheckpoint — rather than via cache() semantics, which
    canChangeCachedPlanOutputPartitioning (session.py) allows AQE to
    re-plan. (An r8 A/B first blamed that conf for a 2x sf1 swing; a
    reversed-order re-run showed the swing was page-cache warmup, not the
    conf. The physical pin stays: it makes the layout contract explicit
    instead of optimizer-mode-dependent, and costs nothing.)
    """
    return _lpa_loop(kg, rounds)


def _lpa_loop(kg: KnowledgeGraph, rounds: int) -> DataFrame:
    before = _persistent_rdd_ids(kg.spark)
    nparts = []
    eparts = []
    for df in kg.edges.values():
        ha = F.xxhash64("source_table", "source_id")
        hb = F.xxhash64("target_table", "target_id")
        nparts.append(
            df.select(
                F.col("source_table").alias("t"), F.col("source_id").alias("id"),
                ha.alias("a"),
            )
        )
        nparts.append(
            df.select(
                F.col("target_table").alias("t"), F.col("target_id").alias("id"),
                hb.alias("a"),
            )
        )
        # canonical orientation at the source — half the dedup shuffle,
        # identical undirected edge set (same shape as k_core r8)
        eparts.append(
            df.select(F.least(ha, hb).alias("u"), F.greatest(ha, hb).alias("v"))
        )
    und = nparts[0]
    for p in nparts[1:]:
        und = und.unionByName(p)
    names = und.groupBy("a").agg(F.first("t").alias("t"), F.first("id").alias("id"))
    ecan = eparts[0]
    for p in eparts[1:]:
        ecan = ecan.unionByName(p)
    ecan = ecan.filter(F.col("u") != F.col("v")).distinct()
    # eager localCheckpoint, not cache(): the materialized RDD's hash(b)
    # layout survives in LogicalRDD where a cached plan's can be re-planned
    # away by AQE (see docstring)
    edges = (
        ecan.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(ecan.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .repartition(F.col("b")).localCheckpoint(eager=True)
    )
    labels = names.select(F.col("a").alias("u"), F.col("a").alias("lab"))
    w = Window.partitionBy("a").orderBy(F.desc("n"), "lab")
    # release prior-round label vectors as soon as the new checkpoint is
    # materialized (r8 loop hygiene, see k_core) — keeps live blocks at one
    # |V| vector instead of O(rounds x |V|)
    loop_base = _persistent_rdd_ids(kg.spark)
    for _ in range(rounds):
        round_start = _persistent_rdd_ids(kg.spark)
        nb = (
            edges.join(labels.withColumnRenamed("u", "b"), "b")
            .groupBy("a", "lab")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("a").alias("u"), F.col("lab").alias("new_lab"))
        )
        labels = (
            labels.join(nb, "u", "left_outer")
            .select("u", F.coalesce("new_lab", "lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
        _release_persisted_since(
            kg.spark, loop_base, _persistent_rdd_ids(kg.spark) - round_start
        )
    edges.unpersist()
    out = (
        labels.join(names, labels.u == names.a)
        .select(
            F.col("t").alias("node_table"), F.col("id").alias("node_id"),
            F.col("lab").alias("community"),
        )
        .orderBy("node_table", "node_id")
    )
    return _checkpoint_and_release(kg.spark, before, out)
