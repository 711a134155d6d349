"""Property-based tests (hypothesis) for the hand-built distributed
operators — the ones whose semantics are easiest to get subtly wrong at the
partition boundary. The reference has no randomized testing (SURVEY §5);
these check our custom compositions against brute-force Python references on
arbitrary small inputs.

Kept deliberately cheap: session-scoped Spark, ≤15 examples per property,
single-digit row counts — each example is a handful of local Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# -- as-of join vs brute force ----------------------------------------------

_asof_inputs = st.tuples(
    # left: (key, ts) purchases
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=1, max_size=8
    ),
    # right: (key, ts, value) clicks — unique per (key, ts) via dict
    st.dictionaries(
        st.tuples(st.integers(0, 2), st.integers(0, 20)),
        st.integers(-100, 100),
        max_size=8,
    ),
)


@given(_asof_inputs)
@settings(**SETTINGS)
def test_asof_join_matches_bruteforce(spark, inputs):
    from knowledge_graph_spark.operators.asof import asof_join

    left_rows, right_map = inputs
    left = spark.createDataFrame(
        [(k, t, float(i)) for i, (k, t) in enumerate(left_rows)],
        "user_id long, ts long, value double",
    )
    right_rows = [(k, t, i, float(v)) for i, ((k, t), v) in enumerate(sorted(right_map.items()))]
    right = spark.createDataFrame(
        right_rows or [(None, None, None, None)],
        "user_id long, ts long, event_id long, value double",
    )
    if not right_rows:
        right = right.filter("user_id is not null")

    got = {
        (r.user_id, r.ts, r.value): r.matched_value
        for r in asof_join(left, right).collect()
    }

    for i, (k, t) in enumerate(left_rows):
        prior = [(rt, v) for (rk, rt), v in right_map.items() if rk == k and rt <= t]
        expect = float(max(prior)[1]) if prior else None
        assert got[(k, t, float(i))] == expect, (k, t, prior)


# -- connected components vs union-find --------------------------------------


def _uf_partition(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    groups: dict = {}
    for n in nodes:
        groups.setdefault(find(n), set()).add(n)
    return {frozenset(g) for g in groups.values()}


@given(st.lists(st.tuples(st.integers(0, 11), st.integers(0, 11)), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    from knowledge_graph_spark.graph.algorithms import connected_components
    from knowledge_graph_spark.graph.model import KnowledgeGraph

    edf = spark.createDataFrame(
        [("n", a, "n", b) for a, b in edges],
        "source_table string, source_id long, target_table string, target_id long",
    )
    kg = KnowledgeGraph(spark, nodes={}, edges={"definition_relationships": edf})

    nodes = {a for a, _ in edges} | {b for _, b in edges}
    expected = _uf_partition(edges, nodes)
    # driver_finish_rows=0 forces the pure distributed contraction loop;
    # the default takes the driver union-find shortcut on graphs this small —
    # both paths must produce the same partition
    for finish_rows in (200_000, 0):
        cc = connected_components(kg, driver_finish_rows=finish_rows).collect()
        by_label: dict = {}
        for r in cc:
            by_label.setdefault(r.component, set()).add(r.node_id)
        got = {frozenset(g) for g in by_label.values()}
        assert got == expected, finish_rows


# -- deterministic sampling ---------------------------------------------------


@given(st.lists(st.text(min_size=1, max_size=6), min_size=1, max_size=12, unique=True))
@settings(**SETTINGS)
def test_deterministic_sample_stable_and_monotone(spark, ids):
    """Same input ⇒ identical sample, and a larger k only ever EXTENDS the
    selection (hash-order prefix property — what makes re-runs reproducible
    across cluster sizes and scale factors)."""
    from knowledge_graph_spark.beyond.sampling import deterministic_sample

    df = spark.createDataFrame([(d,) for d in ids], "doc_id string")
    k = max(1, len(ids) // 2)
    cols = ("doc_id",)
    s1 = [r.doc_id for r in deterministic_sample(df, k=k, cols=cols).collect()]
    s2 = [r.doc_id for r in deterministic_sample(df, k=k, cols=cols).collect()]
    bigger = [r.doc_id for r in deterministic_sample(df, k=len(ids), cols=cols).collect()]
    assert s1 == s2
    assert len(s1) == min(k, len(ids))
    assert s1 == bigger[: len(s1)]
