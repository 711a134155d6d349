"""Property-based tests (hypothesis) for the hand-built distributed
operators — the ones whose semantics are easiest to get subtly wrong at the
partition boundary. The reference has no randomized testing (SURVEY §5);
these check our custom compositions against brute-force Python references on
arbitrary small inputs.

Kept deliberately cheap: session-scoped Spark, ≤15 examples per property,
single-digit row counts — each example is a handful of local Spark jobs.
"""

from __future__ import annotations

import re

import pytest
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


# -- interval join vs brute force -------------------------------------------

_ij_inputs = st.tuples(
    # points: (key, ts)
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 40)), max_size=10),
    # intervals: (key, start, length)
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 15)),
        max_size=6,
    ),
    st.sampled_from([3, 7, 100]),  # bucket width incl. degenerate wide bucket
)


@given(_ij_inputs)
@settings(**SETTINGS)
def test_interval_join_matches_bruteforce(spark, inputs):
    from knowledge_graph_spark.operators.range_join import interval_join

    points, intervals, bucket = inputs
    p = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(points)] or [(None,) * 3],
        "event_id long, user_id long, ts long",
    ).filter("event_id is not null")
    iv = spark.createDataFrame(
        [(j, k, s, s + ln) for j, (k, s, ln) in enumerate(intervals)] or [(None,) * 4],
        "iid long, user_id long, session_start long, session_end long",
    ).filter("iid is not null")
    got = {
        (r.event_id, r.iid)
        for r in interval_join(p, iv, bucket_seconds=bucket).collect()
    }
    expect = {
        (i, j)
        for i, (k, t) in enumerate(points)
        for j, (k2, s, ln) in enumerate(intervals)
        if k == k2 and s <= t <= s + ln
    }
    assert got == expect


# -- triangle count vs brute force ------------------------------------------

_tri_edges = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), max_size=20
)


@given(_tri_edges)
@settings(**SETTINGS)
def test_triangle_count_matches_bruteforce(spark, pairs):
    from itertools import combinations

    from knowledge_graph_spark.graph.algorithms import triangle_count

    df = spark.createDataFrame(
        pairs or [(None, None)], "src long, dst long"
    ).filter("src is not null")
    got = triangle_count(df).collect()[0].n_triangles or 0
    und = {frozenset(p) for p in pairs if p[0] != p[1]}
    nodes = {n for e in und for n in e}
    expect = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= und
    )
    assert got == expect


# -- k-core vs brute-force peeling ------------------------------------------

_core_edges = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=15
)


@given(_core_edges, st.integers(1, 3))
@settings(**SETTINGS)
def test_k_core_matches_bruteforce(spark, pairs, k):
    from knowledge_graph_spark.graph.algorithms import k_core
    from knowledge_graph_spark.graph.model import KnowledgeGraph

    labels = sorted({n for p in pairs for n in p})
    name = {n: chr(ord("a") + n) for n in labels}
    from tests.conftest import make_edge_df

    kg = KnowledgeGraph(
        spark,
        nodes={},
        edges={"definition_relationships": make_edge_df(
            spark, [(name[a], name[b]) for a, b in pairs]
        )},
    )
    got = {(r.node_id, r.degree) for r in k_core(kg, k=k).collect()}

    # brute-force peel
    und = {frozenset(p) for p in pairs if p[0] != p[1]}
    alive = {n for e in und for n in e}
    while True:
        deg = {n: sum(1 for e in und if n in e) for n in alive}
        weak = {n for n in alive if deg.get(n, 0) < k}
        if not weak:
            break
        alive -= weak
        und = {e for e in und if not (e & weak)}
    expect = {
        (ord(name[n][0]) * 100 + 1, sum(1 for e in und if n in e)) for n in alive
    }
    assert got == expect


# -- masking pre-pass invariants ----------------------------------------------
# (extract._mask_text: the per-line char-length contract every downstream
# column/byte offset depends on)

_mask_inputs = st.tuples(
    st.sampled_from(
        ["Python", "Ruby", "TypeScript", "Java", "Kotlin", "CSharp", "Rust"]
    ),
    st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("abc_ ()#\"'`/*=\\{}.;:") + ["\t"]
            ),
            max_size=24,
        ),
        max_size=8,
    ),
)


@given(_mask_inputs)
@settings(**SETTINGS)
def test_mask_text_preserves_line_geometry(inputs):
    """Both masked variants of every line have EXACTLY the source line's
    char length, and the line count is unchanged — the property all
    downstream column and byte-offset math silently assumes."""
    from knowledge_graph_spark.pipeline.extract import _mask_text

    language, lines = inputs
    text = "\n".join(lines)
    masked = _mask_text(language, text)
    src = text.split("\n")
    assert len(masked) == len(src)
    for (code, imp), orig in zip(masked, src):
        assert len(code) == len(orig)
        assert len(imp) == len(orig)


@given(st.sampled_from(["Python", "Java", "Kotlin", "CSharp", "Rust", "Ruby"]),
       st.lists(st.sampled_from(
           ["def f():", "x = 1", "class A:", "  return x", "fn main() {", "}"]),
           max_size=6))
@settings(**SETTINGS)
def test_mask_text_identity_on_plain_code(language, lines):
    """Lines with no comments or strings mask to themselves."""
    from knowledge_graph_spark.pipeline.extract import _mask_text

    text = "\n".join(lines)
    for (code, imp), orig in zip(_mask_text(language, text), text.split("\n")):
        assert code == orig and imp == orig


# -- WAV / Y4M codec round-trips ----------------------------------------------
# (beyond.multimodal: synth params -> bytes -> parse returns the same params;
# the synthesizers here are plain-Python twins of the Catalyst expressions)


@given(
    st.integers(4000, 48000),  # rate
    st.integers(1, 2),         # channels
    st.integers(1, 500),       # n frames
)
@settings(**SETTINGS)
def test_wav_parse_roundtrip(rate, ch, n):
    import struct as _s

    from knowledge_graph_spark.beyond.multimodal import _parse_wav

    block = ch * 2
    payload = bytes(n * block)
    b = (
        b"RIFF" + _s.pack("<I", 36 + len(payload)) + b"WAVEfmt "
        + _s.pack("<IHHIIHH", 16, 1, ch, rate, rate * block, block, 16)
        + b"data" + _s.pack("<I", len(payload)) + payload
    )
    assert _parse_wav(b) == (rate, ch, 16, len(payload))


@given(
    st.integers(1, 100).map(lambda v: v * 2),  # even width
    st.integers(1, 50).map(lambda v: v * 2),   # even height
    st.integers(1, 12),                        # frames
)
@settings(**SETTINGS)
def test_y4m_parse_roundtrip(w, h, n):
    from knowledge_graph_spark.beyond.multimodal import _parse_y4m

    frame = b"FRAME\n" + bytes(w * h * 3 // 2)
    b = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode() + frame * n
    pw, ph, pn, off = _parse_y4m(b)
    assert (pw, ph, pn) == (w, h, n)
    assert b[off : off + 6] == b"FRAME\n"


# -- same-line lambda nesting vs a bracket-matching reference ------------------


@given(st.sampled_from([
    ("lambda x: lambda y: x + y", True),
    ("f(lambda a: a, lambda b: b)", False),
    ("f(lambda a: g(a, b), lambda c: c)", False),
    ("sorted(v, key=lambda p: (lambda q: q)(p))", True),
]))
@settings(max_examples=8, deadline=None)
def test_py_nested_same_line_cases(case):
    """Pinned classifications for the paren-depth comma scan that decides
    whether a second same-line lambda nests inside the first."""
    import re

    from knowledge_graph_spark.pipeline.extract import (
        _PY_LAMBDA,
        _py_nested_same_line,
    )

    line, nested = case
    cols = [m.start() for m in _PY_LAMBDA.finditer(line)]
    assert len(cols) == 2
    assert _py_nested_same_line(line, cols[0], cols[1]) is nested


# ---- Switch-arm vs lambda disambiguation (Java / C#) ------------------------


@given(st.sampled_from([
    # (language, masked line, expected lambda count)
    ("Java", "switch (x) { case A -> run(() -> f()); }", 1),
    ("Java", "case a -> handle(v -> v + 1);", 1),
    ("Java", "default -> fallback();", 0),
    ("Java", "case LOW, HIGH -> 0;", 0),
    ("Java", "list.forEach(item -> process(item));", 1),
    # `casey` must not be mistaken for a `case` head
    ("Java", "casey -> run();", 1),
    ("CSharp", "var r = x switch { Big b => b.Size, _ => 0 };", 0),
    # a real lambda argument sharing a line with a switch expression
    ("CSharp", "var r = Map(x switch { A => 1, _ => 0 }, y => y * 2);", 1),
    ("CSharp", "items.Select(a => a.Name);", 1),
    ("CSharp", "int F() => x;", 0),  # expression-bodied member
]))
@settings(max_examples=12, deadline=None)
def test_switch_arm_arrows_are_not_lambdas(case):
    """Only actual switch ARM arrows are suppressed — genuine lambdas on
    mixed lines containing `switch`/`case` still extract (the reference's
    tree-sitter grammars distinguish switch arms from lambda expressions
    structurally; this pins the regex analyzer to the same classification)."""
    from knowledge_graph_spark.pipeline.extract import _lambda_hits

    language, line, n = case
    hits = _lambda_hits(language, line)
    assert len(hits) == n, (line, hits)


# -- extractor vs stdlib ast on GENERATED programs ----------------------------
# (the fixed-corpus cross-validation lives in test_language_golden; this one
# drives randomized nesting/decorators/async through the same invariant)


@st.composite
def _py_program(draw):
    names = iter(f"sym{i}" for i in range(50))

    def block(depth):
        lines = []
        for _ in range(draw(st.integers(1, 3 if depth == 0 else 2))):
            kind = draw(st.sampled_from(["def", "adef", "class", "stmt"]))
            ind = "    " * depth
            name = next(names)
            if kind == "stmt":
                stmt = draw(st.sampled_from([
                    f"x_{name} = {depth}",
                    # r8 hostile: nested quote in an f-string interpolation
                    # smuggles '}' and def text (ast-validated: the superset
                    # invariant proves no real def is lost after it)
                    "x_" + name + " = f\"{d['}']}" + " def symphantom(): pass\"",
                    f'x_{name} = """\ndef symphantom_tq(): pass\n"""',
                ]))
                for part in stmt.split("\n"):
                    lines.append(ind + part if part else part)
                continue
            if draw(st.booleans()):
                lines.append(f"{ind}@decorator")
            if kind == "class":
                base = draw(st.sampled_from(["", "(Base)", "(ns.Base)"]))
                lines.append(f"{ind}class {name}{base}:")
            else:
                kw = "async def" if kind == "adef" else "def"
                params = draw(
                    st.sampled_from(["self", "a, b=1", "x: int, *args, **kw", ""])
                )
                ret = draw(st.sampled_from(["", " -> int", " -> 'Thing'"]))
                lines.append(f"{ind}{kw} {name}({params}){ret}:")
            if depth < 2 and draw(st.booleans()):
                lines.extend(block(depth + 1))
            else:
                lines.append("    " * (depth + 1) + "pass")
        return lines

    return "\n".join(block(0)) + "\n"


@given(_py_program())
@settings(**SETTINGS)
def test_python_extractor_superset_of_ast_on_generated(src):
    """Every ClassDef/FunctionDef/AsyncFunctionDef stdlib ast finds in a
    generated program is extracted with the same name on the same 0-based
    line — nesting depth, decorators, async, annotations included."""
    import ast as pyast

    from knowledge_graph_spark.pipeline.extract import _extract_one

    tree = pyast.parse(src)
    expected = {
        (n.name, n.lineno - 1)
        for n in pyast.walk(tree)
        if isinstance(n, (pyast.ClassDef, pyast.FunctionDef, pyast.AsyncFunctionDef))
    }
    got = {
        (r[3], r[8]) for r in _extract_one("gen.py", "Python", src) if r[2] == "definition"
    }
    assert expected <= got, (sorted(expected - got), src)
    # hostile-noise negatives: def text inside f-string interpolations and
    # triple-quoted strings must not mint definitions (r8)
    assert not any(n.startswith("symphantom") for n, _l in got), sorted(got)


def _py_ast_oracle(src):
    """Expected (defs, lambdas) from a REAL parser: defs as
    {(name, line0, kind, parent_chain)} with the reference's kind rule —
    ClassDef → Class, (Async)FunctionDef → Method iff the nearest
    class-or-def ancestor is a class (If/Try/With/For/While are transparent,
    python/analyzer.rs scope walk) — and lambdas as {(line0, col)}, the
    extractor's position-derived naming."""
    import ast as pyast

    defs, lambdas = set(), set()

    def walk(node, chain, in_class):
        for child in pyast.iter_child_nodes(node):
            if isinstance(child, pyast.ClassDef):
                defs.add((child.name, child.lineno - 1, "Class", ".".join(chain) or None))
                walk(child, chain + [child.name], True)
            elif isinstance(child, (pyast.FunctionDef, pyast.AsyncFunctionDef)):
                kind = "Method" if in_class else "Function"
                defs.add((child.name, child.lineno - 1, kind, ".".join(chain) or None))
                walk(child, chain + [child.name], False)
            elif isinstance(child, pyast.Lambda):
                lambdas.add((child.lineno - 1, child.col_offset))
                walk(child, chain, False)
            else:
                # If/Try/With/For/While/expressions: transparent for scope
                walk(child, chain, in_class)

    walk(pyast.parse(src), [], False)
    return defs, lambdas


@st.composite
def _py_program_scoped(draw):
    """Programs exercising SCOPE-BOUNDARY shapes: defs inside transparent
    if/try blocks, statements that close a frame at module level, multiline
    string tails at column 0, bracket/backslash continuations, lambdas in
    assignments and one-liner defs. Expected sets come from stdlib ast
    (_py_ast_oracle), not construction."""
    names = iter(f"sym{i}" for i in range(80))

    def block(depth, in_class):
        lines = []
        for _ in range(draw(st.integers(1, 3 if depth == 0 else 2))):
            kinds = (
                ["stmt", "lam", "oneliner"]
                if depth >= 3
                else ["def", "adef", "class", "if", "try", "stmt", "lam", "oneliner"]
            )
            kind = draw(st.sampled_from(kinds))
            ind = "    " * depth
            if kind == "stmt":
                name = next(names)
                stmt = draw(st.sampled_from([
                    [f"x_{name} = {depth}"],
                    # multiline string whose closing delimiter sits at col 0
                    [f'x_{name} = """', "def symphantom(): pass", '"""'],
                    # bracket continuation with an unindented tail line
                    [f"x_{name} = (1,", "2)"],
                    # backslash continuation
                    [f"x_{name} = 1 + \\", "2"],
                    ["# def symphantom2(): pass"],
                ]))
                lines.append(ind + stmt[0])
                lines.extend(stmt[1:])  # continuation/tail lines stay at col 0
                continue
            if kind == "lam":
                name = next(names)
                lines.append(f"{ind}f_{name} = lambda v: v + {depth}")
                continue
            if kind == "oneliner":
                name = next(names)
                lines.append(f"{ind}def {name}(): return lambda y: y")
                continue
            if kind in ("if", "try"):
                opener = "if True:" if kind == "if" else "try:"
                lines.append(f"{ind}{opener}")
                lines.extend(block(depth + 1, in_class))
                # bodies can draw only comments — guarantee a real statement
                lines.append("    " * (depth + 1) + "pass")
                if kind == "try":
                    lines.append(f"{ind}except Exception:")
                    lines.append("    " * (depth + 1) + "pass")
                continue
            name = next(names)
            if draw(st.booleans()):
                lines.append(f"{ind}@decorator")
            if kind == "class":
                lines.append(f"{ind}class {name}:")
                body = block(depth + 1, True)
            else:
                kw = "async def" if kind == "adef" else "def"
                lines.append(f"{ind}{kw} {name}(a, b=1):")
                body = block(depth + 1, False)
            lines.extend(body)
            # bodies can draw only comments — guarantee a real statement
            lines.append("    " * (depth + 1) + "pass")
        return lines

    return "\n".join(block(0, False)) + "\n"


@given(_py_program_scoped())
@settings(**SETTINGS)
def test_python_extractor_exactly_matches_ast(src):
    """EXACT agreement with stdlib ast — names, 0-based lines, kinds
    (Class / Method / Function per the reference's class-ancestor rule),
    parent chains, and lambda positions, in BOTH directions: nothing
    missing, nothing phantom. This is the strongest oracle available
    in-container for any language (a real parser), upgraded r8 from the
    superset-only check after it caught the lazy frame-pop parent bug
    (a def inside a module-level if-block inherited the previous def as
    parent)."""
    import ast as pyast

    from knowledge_graph_spark.pipeline.extract import _extract_one

    exp_defs, exp_lams = _py_ast_oracle(src)
    got_defs, got_lams = set(), set()
    for r in _extract_one("gen.py", "Python", src):
        if r[2] != "definition":
            continue
        if r[5] == "Lambda":
            _, l, c = r[3].split("_")
            got_lams.add((int(l), int(c)))
        else:
            got_defs.add((r[3], r[8], r[5], r[4]))
    assert got_defs == exp_defs, (
        sorted(exp_defs - got_defs), sorted(got_defs - exp_defs), src
    )
    assert got_lams == exp_lams, (sorted(exp_lams), sorted(got_lams), src)


# ---------------------------------------------------------------------------
# Generated-program cross-validation for languages with no in-container
# parser (r7 verdict task 3): grammar-constrained emitters whose expected
# definition set is known BY CONSTRUCTION — every constructed definition
# must extract at the right (name, 0-based line, kind), whatever nesting,
# noise statements, comments, or string literals the draw interleaves.
# The Python twin (test_python_extractor_superset_of_ast_on_generated)
# validates against stdlib ast; these validate against the construction.
# ---------------------------------------------------------------------------


@st.composite
def _rb_program(draw):
    names = iter(f"sym{i}" for i in range(64))
    expected: list = []
    lines: list = []

    def block(depth):
        for _ in range(draw(st.integers(1, 3 if depth == 0 else 2))):
            kind = draw(
                st.sampled_from(["module", "class", "def", "sdef", "stmt", "block"])
            )
            ind = "  " * depth
            if kind == "stmt":
                noise = draw(st.sampled_from([
                    'x = "def not_a_def"',
                    "# def commented_out",
                    "y = compute(1, 2)",
                    "puts 'class NotAClass'",
                    "@ivar = Widget.new",
                    "HEREDOC",
                    # r8 hostile: a string literal NESTED in an interpolation
                    # smuggles '}' and def text — neither may desync the mask
                    'z = "#{h["} def symphantom_ni; end"]}"',
                    's2 = "#{x} def symphantom_tail; end"',
                ]))
                if noise == "HEREDOC":
                    # heredoc bodies are data: fake defs inside must not
                    # extract (mask pre-pass)
                    lines.append(ind + "tpl = <<~HTML")
                    lines.append(ind + "  def fake_heredoc_def")
                    lines.append(ind + "  class FakeHeredocClass")
                    lines.append(ind + "HTML")
                else:
                    lines.append(ind + noise)
                continue
            if kind == "block":
                # do-blocks are NOT lambdas and define nothing
                lines.append(ind + "items.each do |it|")
                lines.append(ind + "  use(it)")
                lines.append(ind + "end")
                continue
            nm = next(names)
            if kind in ("module", "class"):
                cname = nm.capitalize()
                expected.append((cname, len(lines), "Module" if kind == "module" else "Class"))
                if kind == "module":
                    lines.append(f"{ind}module {cname}")
                else:
                    sup = draw(st.sampled_from(["", " < Base", " < NS::Base"]))
                    lines.append(f"{ind}class {cname}{sup}")
                if kind == "class" and draw(st.booleans()):
                    # singleton-class block: contained defs are singleton
                    # methods of cname, FQN-transparent
                    snm = next(names)
                    lines.append(f"{ind}  class << self")
                    expected.append((snm, len(lines), "SingletonMethod"))
                    lines.append(f"{ind}    def {snm}")
                    lines.append(f"{ind}      :s")
                    lines.append(f"{ind}    end")
                    lines.append(f"{ind}  end")
                if depth < 2 and draw(st.booleans()):
                    block(depth + 1)
                else:
                    lines.append(f"{ind}  VALUE = {depth}")
                lines.append(f"{ind}end")
            else:
                bang = draw(st.sampled_from(["", "!", "?"]))
                endless = draw(st.booleans())
                if endless:
                    # complete one-line definition: no end, no frame
                    body = draw(st.sampled_from(["(x) = x * x", " = 42"]))
                    kindname = "SingletonMethod" if kind == "sdef" else "Method"
                    sp = "self." if kind == "sdef" else ""
                    expected.append((nm + bang if not body.startswith("(") else nm, len(lines), kindname))
                    lines.append(f"{ind}def {sp}{nm}{'' if body.startswith('(') else bang}{body}")
                    continue
                params = draw(st.sampled_from(["", "(a)", "(a, b = 1)", " a, b"]))
                if kind == "sdef":
                    expected.append((nm + bang, len(lines), "SingletonMethod"))
                    lines.append(f"{ind}def self.{nm}{bang}{params}")
                else:
                    expected.append((nm + bang, len(lines), "Method"))
                    lines.append(f"{ind}def {nm}{bang}{params}")
                lines.append(f"{ind}  :done")
                lines.append(f"{ind}end")

    block(0)
    return "\n".join(lines) + "\n", expected


@given(_rb_program())
@settings(**SETTINGS)
def test_ruby_extractor_matches_generated_programs(prog):
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src, expected = prog
    got = {
        (r[3], r[8], r[5])
        for r in _extract_one("gen.rb", "Ruby", src)
        if r[2] == "definition"
    }
    missing = set(expected) - got
    assert not missing, (sorted(missing), sorted(got), src)
    # no phantom definitions under generated names: every sym*-named row
    # the extractor emits must be one we constructed
    phantom = {g for g in got if g[0].lower().startswith("sym")} - set(expected)
    assert not phantom, (sorted(phantom), src)


@st.composite
def _ts_program(draw):
    names = iter(f"sym{i}" for i in range(64))
    expected: list = []
    lines: list = []

    def members(depth, host):
        for _ in range(draw(st.integers(1, 2))):
            nm = next(names)
            style = draw(st.sampled_from(["plain", "static_async", "accessor", "gen", "field"]))
            ind = "  " * depth
            if style == "field":
                lines.append(f"{ind}{nm}: number = {depth};")  # NOT indexed
                continue
            if style == "accessor":
                expected.append((nm, len(lines), "Method"))
                lines.append(f"{ind}get {nm}(): number {{")
                lines.append(f"{ind}  return 1;")
                lines.append(f"{ind}}}")
                expected.append((nm, len(lines), "Method"))
                lines.append(f"{ind}set {nm}(v: number) {{")
                lines.append(f"{ind}  this._x = v;")
                lines.append(f"{ind}}}")
                continue
            head = {
                "plain": f"{nm}(a: number, b = 1): void {{",
                "static_async": f"static async {nm}(): Promise<void> {{",
                "gen": f"*{nm}(): Iterator<number> {{",
            }[style]
            expected.append((nm, len(lines), "Method"))
            lines.append(ind + head)
            lines.append(f"{ind}  return;")
            lines.append(f"{ind}}}")

    def block(depth):
        for _ in range(draw(st.integers(1, 3 if depth == 0 else 2))):
            kind = draw(
                st.sampled_from(["class", "iface", "fn", "arrow", "stmt", "ns"])
            )
            ind = "  " * depth
            if kind == "stmt":
                lines.append(ind + draw(st.sampled_from([
                    'const s = "function fake() {";',
                    "// function commented() {}",
                    "let n = compute(1, 2);",
                    "register(handler, cb);",
                    # r8 hostile: template literals carrying code text, incl.
                    # a NESTED template inside the interpolation with a '}'
                    # smuggled in a string — no phantom defs, no mask desync
                    "const t = `function symphantomTpl() {} ${x} class SymphantomTpl {}`;",
                    'const u = `${a(`${b("}")}`)} function symphantomNested() {}`;',
                ])))
                continue
            nm = next(names)
            if kind == "class":
                cname = nm.capitalize()
                mod = draw(st.sampled_from(["", "export ", "export abstract ", "export default "]))
                expected.append((cname, len(lines), "Class"))
                sup = draw(st.sampled_from(["", " extends Base"]))
                lines.append(f"{ind}{mod}class {cname}{sup} {{")
                members(depth + 1, cname)
                lines.append(ind + "}")
            elif kind == "iface":
                cname = nm.capitalize()
                expected.append((cname, len(lines), "Interface"))
                lines.append(f"{ind}interface {cname} {{")
                lines.append(f"{ind}  width: number;")
                lines.append(ind + "}")
            elif kind == "arrow":
                # named arrow folds to Function (typescript.rs:286-303)
                expected.append((nm, len(lines), "Function"))
                lines.append(f"{ind}const {nm} = (x: number): number => {{")
                lines.append(f"{ind}  return x;")
                lines.append(ind + "};")
            elif kind == "ns":
                # namespaces are scope-transparent: NO definition row
                # (typescript.rs:42-44), but contents still extract
                lines.append(f"{ind}namespace Ns{nm.capitalize()} {{")
                if depth < 2:
                    block(depth + 1)
                else:
                    lines.append(f"{ind}  const nsLocal = 1;")
                lines.append(ind + "}")
            else:
                expected.append((nm, len(lines), "Function"))
                mod = draw(st.sampled_from(["", "async ", "export ", "export default "]))
                lines.append(f"{ind}{mod}function {nm}(a: string) {{")
                if depth < 2 and draw(st.booleans()):
                    block(depth + 1)
                else:
                    lines.append(f"{ind}  return a;")
                lines.append(ind + "}")

    block(0)
    return "\n".join(lines) + "\n", expected


@given(_ts_program())
@settings(**SETTINGS)
def test_ts_extractor_matches_generated_programs(prog):
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src, expected = prog
    got = {
        (r[3], r[8], r[5])
        for r in _extract_one("gen.ts", "TypeScript", src)
        if r[2] == "definition"
    }
    missing = set(expected) - got
    assert not missing, (sorted(missing), sorted(got), src)
    phantom = {g for g in got if g[0].lower().startswith("sym")} - set(expected)
    assert not phantom, (sorted(phantom), src)


@st.composite
def _kt_program(draw):
    names = iter(f"sym{i}" for i in range(64))
    expected: list = []
    lines: list = []
    lines.append("package gen.prog")

    def fun_body(depth):
        ind = "    " * depth
        noise = draw(st.sampled_from([
            "val local = compute(1)",   # LocalVariable → not indexed
            "return",
            'val s = "fun fake() {}"',
            "// fun commented() {}",
            # r8 hostile: nested literal inside ${} smuggles '}' + fun text
            'val ni = "${f("} fun symphantomNi() = 1 ")}"',
            "RAWSTRING",
        ]))
        if noise == "RAWSTRING":
            # triple-quoted raw string: body is data across lines
            lines.append(ind + 'val raw = """')
            lines.append(ind + "    fun symphantomRaw() = 1")
            lines.append(ind + "    class SymphantomRawCls")
            lines.append(ind + '"""')
        else:
            lines.append(ind + noise)

    def class_body(depth, kind):
        ind = "    " * depth
        for _ in range(draw(st.integers(1, 2))):
            member = draw(st.sampled_from(["fun", "prop", "ctor", "companion", "nested"]))
            nm = next(names)
            if member == "fun":
                expected.append((nm, len(lines), "Function"))
                mods = draw(st.sampled_from(["", "override ", "private ", "suspend "]))
                lines.append(f"{ind}{mods}fun {nm}(a: Int, b: String = \"x\") {{")
                fun_body(depth + 1)
                lines.append(ind + "}")
            elif member == "prop":
                expected.append((nm, len(lines), "Property"))
                form = draw(st.sampled_from([
                    f"val {nm}: Int = 1",
                    f"var {nm} = compute()",
                    f"lateinit var {nm}: Widget",
                ]))
                lines.append(ind + form)
            elif member == "ctor" and kind == "class":
                expected.append(("<init>", len(lines), "Constructor"))
                if draw(st.booleans()):
                    lines.append(f"{ind}constructor() : this(1) {{")
                    lines.append(f"{ind}    val t = 0")  # shielded
                    lines.append(ind + "}")
                else:
                    lines.append(f"{ind}constructor(n: Long) : this(n.toInt())")
            elif member == "companion" and kind == "class":
                # companion object simplifies to Class named Companion
                expected.append(("Companion", len(lines), "Class"))
                cnm = next(names)
                lines.append(f"{ind}companion object {{")
                expected.append((cnm, len(lines), "Function"))
                lines.append(f"{ind}    fun {cnm}() {{")
                lines.append(f"{ind}        return")
                lines.append(f"{ind}    }}")
                lines.append(ind + "}")
            elif member == "nested":
                cname = nm.capitalize()
                expected.append((cname, len(lines), "Class"))
                lines.append(f"{ind}class {cname} {{")
                lines.append(f"{ind}    val NESTED = 1")
                lines.append(ind + "}")

    def top(depth=0):
        ind = "    " * depth
        for _ in range(draw(st.integers(2, 4))):
            kind = draw(st.sampled_from(
                ["class", "iface", "fun", "prop", "object", "enum", "stmt"]
            ))
            nm = next(names)
            if kind == "stmt":
                noise = draw(st.sampled_from([
                    'check("class Fake(val x: Int)")',
                    "// constructor(q: Int) : this()",
                    "private val topNoise = make(1, 2)",
                ]))
                lines.append(noise)
                if "topNoise" in noise:
                    # a top-level val IS a Property by the rules
                    expected.append(("topNoise", len(lines) - 1, "Property"))
                continue
            if kind == "class":
                cname = nm.capitalize()
                expected.append((cname, len(lines), "Class"))
                # primary ctor: val/var params ARE Properties, plain are not
                params = draw(st.sampled_from(["", "ctor", "multiline"]))
                if params == "":
                    sup = draw(st.sampled_from(["", " : Base()", " : Face"]))
                    lines.append(f"{ind}class {cname}{sup} {{")
                elif params == "ctor":
                    p1, p2 = next(names), next(names)
                    expected.append((p1, len(lines), "Property"))
                    lines.append(
                        f"{ind}class {cname}(val {p1}: String, var plainX: Int, plainY: Long) {{"
                    )
                    # NOTE: `var plainX` IS a property too
                    expected.append(("plainX", len(lines) - 1, "Property"))
                    del p2
                else:
                    p1 = next(names)
                    lines.append(f"{ind}class {cname}(")
                    expected.append((p1, len(lines), "Property"))
                    lines.append(f"{ind}    val {p1}: Map<String, Int> = mapOf(),")
                    lines.append(f"{ind}    plain: Double,")
                    lines.append(f"{ind}) {{")
                class_body(depth + 1, "class")
                lines.append(ind + "}")
            elif kind == "iface":
                cname = nm.capitalize()
                expected.append((cname, len(lines), "Interface"))
                inm = next(names)
                lines.append(f"{ind}interface {cname} {{")
                expected.append((inm, len(lines), "Property"))
                lines.append(f"{ind}    val {inm}: Int")
                lines.append(ind + "}")
            elif kind == "fun":
                expected.append((nm, len(lines), "Function"))
                mods = draw(st.sampled_from(["", "suspend ", "private ", "inline "]))
                lines.append(f"{ind}{mods}fun {nm}(x: Int): Int {{")
                fun_body(depth + 1)
                lines.append(ind + "}")
            elif kind == "prop":
                expected.append((nm, len(lines), "Property"))
                lines.append(f"{ind}val {nm} = Widget()")
            elif kind == "object":
                cname = nm.capitalize()
                expected.append((cname, len(lines), "Class"))  # Object → Class
                onm = next(names)
                lines.append(f"{ind}object {cname} {{")
                expected.append((onm, len(lines), "Function"))
                lines.append(f"{ind}    fun {onm}() {{")
                lines.append(f"{ind}        return")
                lines.append(f"{ind}    }}")
                lines.append(ind + "}")
            else:  # enum
                cname = nm.capitalize()
                expected.append((cname, len(lines), "Class"))
                lines.append(f"{ind}enum class {cname} {{")
                e1, e2 = f"E{nm.upper()}A", f"E{nm.upper()}B"
                expected.append((e1, len(lines), "EnumEntry"))
                expected.append((e2, len(lines), "EnumEntry"))
                lines.append(f"{ind}    {e1}, {e2};")
                fnm = next(names)
                expected.append((fnm, len(lines), "Function"))
                lines.append(f"{ind}    fun {fnm}() {{")
                lines.append(f"{ind}        return")
                lines.append(f"{ind}    }}")
                lines.append(ind + "}")

    top()
    return "\n".join(lines) + "\n", expected


@given(_kt_program())
@settings(**SETTINGS)
def test_kotlin_extractor_matches_generated_programs(prog):
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src, expected = prog
    got = {
        (r[3], r[8], r[5])
        for r in _extract_one("gen.kt", "Kotlin", src)
        if r[2] == "definition"
    }
    missing = set(expected) - got
    assert not missing, (sorted(missing), sorted(got), src)
    phantom = {
        g for g in got
        if g[0].lower().startswith(("sym", "fake", "plain", "local", "noise", "t", "nested"))
        and g[0] not in ("topNoise",)
    } - set(expected)
    assert not phantom, (sorted(phantom), src)


@st.composite
def _java_program(draw):
    names = iter(f"sym{i}" for i in range(64))
    expected: list = []
    lines: list = []
    lines.append("package gen.prog;")
    lines.append("import java.util.List;")

    def class_body(depth, cname, kind):
        ind = "    " * depth
        for _ in range(draw(st.integers(1, 2))):
            member = draw(st.sampled_from(
                ["method", "field", "ctor", "nested", "textblock", "comment"]
            ))
            nm = next(names)
            if member == "method":
                mods = draw(st.sampled_from(
                    ["public ", "private static ", "protected final ", ""]
                ))
                if draw(st.booleans()):
                    lines.append(f"{ind}@Override")
                # deeply nested generics in the signature must not break
                # the name capture (r8 hostile)
                rtype = draw(st.sampled_from(
                    ["List<String>", "Map<String, List<Map<Integer, String>>>"]
                ))
                expected.append((nm, len(lines), "Method"))
                lines.append(f"{ind}{mods}{rtype} {nm}(int a, String b) {{")
                lines.append(f"{ind}    return null;")
                lines.append(ind + "}")
            elif member == "textblock":
                # Java 15 text block: body is DATA (r8 hostile — caught a
                # real bug: `\"\"\"` was not a multiline delimiter and the
                # body leaked class/method text into the code view)
                lines.append(f'{ind}String tb_{nm} = """')
                lines.append(f"{ind}    class SymphantomTb {{ }}")
                lines.append(f"{ind}    void symphantomTb() {{ }}")
                lines.append(f'{ind}    """;')
            elif member == "comment":
                lines.append(f"{ind}/* class SymphantomCmt {{")
                lines.append(f"{ind}   void symphantomCmt() {{ }} */")
            elif member == "field":
                # fields are NOT definitions (java/analyzer.rs:64-69)
                lines.append(
                    f"{ind}private static final String F_{nm} = \"class Fake {{\";"
                )
            elif member == "ctor" and kind == "class":
                expected.append((cname, len(lines), "Method"))
                lines.append(f"{ind}public {cname}(int n) {{")
                lines.append(f"{ind}    this.n = n;")
                lines.append(ind + "}")
            else:
                nested = nm.capitalize()
                expected.append((nested, len(lines), "Class"))
                lines.append(f"{ind}static class {nested} {{")
                lines.append(f"{ind}    void tick() {{")
                lines.append(f"{ind}    }}")
                lines.append(ind + "}")
                expected.append(("tick", len(lines) - 3, "Method"))

    def top():
        for _ in range(draw(st.integers(2, 4))):
            kind = draw(st.sampled_from(["class", "iface", "enum"]))
            nm = next(names)
            cname = nm.capitalize()
            if kind == "class":
                mods = draw(st.sampled_from(["public ", "public abstract ", ""]))
                sup = draw(st.sampled_from(["", " extends Base", " implements Face"]))
                expected.append((cname, len(lines), "Class"))
                lines.append(f"{mods}class {cname}{sup} {{")
                class_body(1, cname, "class")
                lines.append("}")
            elif kind == "iface":
                inm = next(names)
                expected.append((cname, len(lines), "Interface"))
                lines.append(f"public interface {cname} {{")
                expected.append((inm, len(lines), "Method"))
                lines.append(f"    default int {inm}() {{")
                lines.append("        return 1;")
                lines.append("    }")
                lines.append("}")
            else:
                e1, e2 = f"E{nm.upper()}A", f"E{nm.upper()}B"
                expected.append((cname, len(lines), "Class"))
                lines.append(f"public enum {cname} {{")
                expected.append((e1, len(lines), "EnumConstant"))
                expected.append((e2, len(lines), "EnumConstant"))
                arg = draw(st.sampled_from(["", "(1)", "(new Hue(255))"]))
                lines.append(f"    {e1}{arg}, {e2};")
                mnm = next(names)
                expected.append((mnm, len(lines), "Method"))
                lines.append(f"    public int {mnm}() {{")
                lines.append("        return 0;")
                lines.append("    }")
                lines.append("}")

    top()
    return "\n".join(lines) + "\n", expected


@given(_java_program())
@settings(**SETTINGS)
def test_java_extractor_matches_generated_programs(prog):
    """Java by construction: classes/interfaces/enums (+constants with
    payload args that must NOT leak — the r7 ADVICE repro — and post-;
    members), constructors (Method kind, like the reference), default
    interface methods, nested types, @Override noise — while FIELDS are
    never definitions (java/analyzer.rs:64-69)."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src, expected = prog
    got = {
        (r[3], r[8], r[5])
        for r in _extract_one("Gen.java", "Java", src)
        if r[2] == "definition"
    }
    missing = set(expected) - got
    assert not missing, (sorted(missing), sorted(got), src)
    phantom = {
        g for g in got
        if g[0].lower().startswith(("sym", "fake", "f_", "hue"))
    } - set(expected)
    assert not phantom, (sorted(phantom), src)


@st.composite
def _cs_program(draw):
    names = iter(f"sym{i}" for i in range(64))
    expected: list = []
    lines: list = []
    lines.append("namespace Gen.Prog;")
    lines.append("using System.Collections.Generic;")

    def class_body(depth, cname):
        ind = "    " * depth
        for _ in range(draw(st.integers(1, 2))):
            member = draw(st.sampled_from(
                ["method", "prop", "field", "ctor", "event", "region", "verbatim"]
            ))
            nm = next(names).capitalize()
            if member == "region":
                # r8 hostile: #region titles are FREE TEXT and #if blocks
                # are transparent — no phantom from the title, the guarded
                # method still extracts
                lines.append(f"{ind}#region class SymphantomRegion")
                lines.append(f"{ind}#if DEBUG")
                expected.append((f"Dbg{nm}", len(lines), "Method"))
                lines.append(f"{ind}public void Dbg{nm}() {{")
                lines.append(f"{ind}    return;")
                lines.append(ind + "}")
                lines.append(f"{ind}#endif")
                lines.append(f"{ind}#endregion")
                continue
            if member == "verbatim":
                # verbatim + interpolated-verbatim strings carry code text
                lines.append(
                    f'{ind}string _v{nm} = @"class SymphantomVb {{ }} ""q"" t";'
                )
                lines.append(
                    f'{ind}string _w{nm} = $@"{{x}} void SymphantomIv() {{{{ }}}}";'
                )
                continue
            if member == "method":
                mods = draw(st.sampled_from(
                    ["public ", "public static async ", "internal override ", ""]
                ))
                expected.append((nm, len(lines), "Method"))
                lines.append(f"{ind}{mods}List<string> {nm}(int a, string b) {{")
                lines.append(f"{ind}    return null;")
                lines.append(ind + "}")
            elif member == "prop":
                expected.append((nm, len(lines), "Property"))
                lines.append(f"{ind}public int {nm} {{ get; set; }}")
            elif member == "field":
                # Field -> None (csharp.rs:280): never a definition
                lines.append(f"{ind}private readonly string _f{nm} = \"class Fake {{\";")
            elif member == "event":
                # Event -> None (csharp.rs:292)
                lines.append(f"{ind}public event EventHandler Changed{nm};")
            else:
                expected.append((cname, len(lines), "Constructor"))
                lines.append(f"{ind}public {cname}(int n) {{")
                lines.append(f"{ind}    _n = n;")
                lines.append(ind + "}")

    def top():
        for _ in range(draw(st.integers(2, 4))):
            kind = draw(st.sampled_from(
                ["class", "iface", "struct", "record", "rstruct", "enum", "delegate"]
            ))
            nm = next(names)
            cname = nm.capitalize()
            if kind in ("class", "struct"):
                mods = draw(st.sampled_from(["public ", "public sealed ", "internal "]))
                expected.append((cname, len(lines), "Class"))
                lines.append(f"{mods}{'class' if kind == 'class' else 'struct'} {cname} {{")
                class_body(1, cname)
                lines.append("}")
            elif kind == "iface":
                pnm = next(names).capitalize()
                expected.append((f"I{cname}", len(lines), "Interface"))
                lines.append(f"public interface I{cname} {{")
                # Interface→InstanceMethod IS an arm (InterfaceToMethod,
                # csharp.rs:170-175): signatures extract as Methods
                expected.append((pnm, len(lines), "Method"))
                lines.append(f"    int {pnm}();")
                lines.append("}")
            elif kind == "record":
                p1 = next(names).capitalize()
                expected.append((cname, len(lines), "Class"))
                expected.append((p1, len(lines), "Property"))
                lines.append(f"public record {cname}(string {p1}, int PlainAge = 0);")
                expected.append(("PlainAge", len(lines) - 1, "Property"))
            elif kind == "rstruct":
                p1 = next(names).capitalize()
                expected.append((cname, len(lines), "Class"))
                expected.append((p1, len(lines), "Property"))
                lines.append(f"public readonly record struct {cname}(double {p1});")
            elif kind == "enum":
                e1, e2 = f"E{nm.upper()}A", f"E{nm.upper()}B"
                expected.append((cname, len(lines), "Class"))
                lines.append(f"public enum {cname} {{")
                # the C# inventory has NO enum-member kind (csharp.rs
                # simplify table) — constants are not definitions there
                lines.append(f"    {e1},")
                lines.append(f"    {e2}")
                lines.append("}")
            else:
                expected.append((cname, len(lines), "Class"))  # delegate → Class
                lines.append(f"public delegate void {cname}(int x);")

    top()
    return "\n".join(lines) + "\n", expected


@given(_cs_program())
@settings(**SETTINGS)
def test_csharp_extractor_matches_generated_programs(prog):
    """C# by construction: classes/structs/records (+positional
    properties)/readonly record structs/interfaces/enums/delegates (→
    Class), constructors (Constructor kind), auto-properties — while
    FIELDS and EVENTS are never definitions (csharp.rs:280,292) and
    interface method signatures stay unextracted."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src, expected = prog
    got = {
        (r[3], r[8], r[5])
        for r in _extract_one("Gen.cs", "CSharp", src)
        if r[2] == "definition"
    }
    missing = set(expected) - got
    assert not missing, (sorted(missing), sorted(got), src)
    phantom = {
        g for g in got
        if g[0].lower().startswith(("sym", "fake", "_f", "changed", "isym"))
    } - set(expected)
    assert not phantom, (sorted(phantom), src)
    # enum constants must be ABSENT (no kind for them in the C# inventory)
    assert not any(n.startswith("ESYM") for n, _l, _k in got), sorted(got)


@st.composite
def _rs_program(draw):
    names = iter(f"sym{i}" for i in range(64))
    expected: list = []
    lines: list = []

    def top(depth):
        ind = "    " * depth
        for _ in range(draw(st.integers(2, 3 if depth == 0 else 2))):
            kind = draw(st.sampled_from(
                ["struct", "enum", "trait", "impl", "fn", "mod", "const", "macro"]
            ))
            nm = next(names)
            cname = nm.capitalize()
            if kind == "macro":
                # r8 hostile (caught a real bug): macro_rules! bodies are
                # TOKEN TREES — struct/fn text inside must not extract
                lines.append(f"{ind}macro_rules! mk_{nm} {{")
                lines.append(f"{ind}    ($x:ident) => {{")
                lines.append(f"{ind}        pub struct Symphantom{cname};")
                lines.append(f"{ind}        fn symphantom_{nm}() {{}}")
                lines.append(f"{ind}    }};")
                lines.append(ind + "}")
                continue
            if kind == "struct":
                f1 = next(names)
                if draw(st.booleans()):
                    # attribute-heavy items (r8 hostile): attrs with string
                    # args must not perturb the following definition
                    lines.append(f"{ind}#[derive(Debug, Clone)]")
                    lines.append(f'{ind}#[serde(rename_all = "camelCase")]')
                expected.append((cname, len(lines), "Class"))
                lines.append(f"{ind}pub struct {cname} {{")
                expected.append((f1, len(lines), "Field"))
                lines.append(f"{ind}    pub {f1}: Vec<String>,")
                lines.append(f"{ind}    plain_ty: u32,")
                expected.append(("plain_ty", len(lines) - 1, "Field"))
                lines.append(ind + "}")
            elif kind == "enum":
                v1 = f"V{nm.capitalize()}"
                expected.append((cname, len(lines), "Class"))
                lines.append(f"{ind}pub enum {cname} {{")
                expected.append((v1, len(lines), "Variant"))
                payload = draw(st.sampled_from(["", "(u32)", "(HashMap<String, Value>)", " = 3"]))
                lines.append(f"{ind}    {v1}{payload},")
                lines.append(ind + "}")
            elif kind == "trait":
                m1 = next(names)
                expected.append((cname, len(lines), "Interface"))
                lines.append(f"{ind}pub trait {cname} {{")
                expected.append((m1, len(lines), "Method"))
                sig = draw(st.sampled_from(
                    [f"fn {m1}(&self);", f"fn {m1}(&self) -> u32 {{ 1 }}"]
                ))
                lines.append(f"{ind}    {sig}")
                lines.append(ind + "}")
            elif kind == "impl":
                m1 = next(names)
                lines.append(f"{ind}impl Host{cname} {{")
                expected.append((m1, len(lines), "Method"))
                lines.append(f"{ind}    pub fn {m1}(&self) -> bool {{")
                lines.append(f"{ind}        let flag: bool = true;")
                lines.append(f"{ind}        flag")
                lines.append(f"{ind}    }}")
                lines.append(ind + "}")
            elif kind == "fn":
                expected.append((nm, len(lines), "Function"))
                mods = draw(st.sampled_from(["pub ", "pub async ", "", "pub(crate) "]))
                lines.append(f"{ind}{mods}fn {nm}(x: u32) -> u32 {{")
                if draw(st.booleans()):
                    # raw strings carry code text (r8 hostile)
                    lines.append(
                        f'{ind}    let s = r#"fn symphantom_rw() {{}} struct SymphantomRw;"#;'
                    )
                lines.append(f"{ind}    x + 1")
                lines.append(ind + "}")
            elif kind == "mod" and depth == 0:
                expected.append((nm, len(lines), "Module"))
                lines.append(f"{ind}pub mod {nm} {{")
                top(depth + 1)
                lines.append(ind + "}")
            else:
                # consts are NOT indexed (no const kind in the inventory)
                lines.append(f"{ind}pub const C_{nm.upper()}: u32 = 9;")

    top(0)
    return "\n".join(lines) + "\n", expected


@given(_rs_program())
@settings(**SETTINGS)
def test_rust_extractor_matches_generated_programs(prog):
    """Rust by construction: structs+fields (Field IS indexed), enums+
    variants (payload identifiers must not leak), traits (+default and
    required methods), impl-hosted Methods, free Functions, nested mods —
    while consts and fn-body typed lets are never definitions."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src, expected = prog
    got = {
        (r[3], r[8], r[5])
        for r in _extract_one("gen.rs", "Rust", src)
        if r[2] == "definition"
    }
    missing = set(expected) - got
    assert not missing, (sorted(missing), sorted(got), src)
    phantom = {
        g for g in got
        if g[0].lower().startswith(("sym", "c_", "flag", "string", "value", "hashmap"))
    } - set(expected)
    assert not phantom, (sorted(phantom), src)


# ---------------------------------------------------------------------------
# Masking layer vs Pygments lexers (r8): the container ships no tree-sitter,
# but Pygments has battle-tested LEXERS for all 7 languages — enough to
# differentially validate the string/comment MASKING layer (where regex
# analyzers historically desync) character by character. Adjudicated
# exclusions, each verified by hand:
#   - Ruby `:symbols` lex as Literal.String.Symbol — not string literals for
#     masking purposes; the extractor rightly keeps them visible.
#   - Rust attributes `#[...]` and C# preprocessor directives lex as
#     Comment.Preproc — not comments; checked separately (C# directives are
#     masked as of r8, Rust attributes stay visible by design).
#   - String.Affix / String.Interpol / String.Escape / String.Delimiter are
#     markers, not content.
#   - Interpolation BODIES are deliberately visible in this repo's masked
#     view (call-scan parity); lines containing interpolation openers are
#     excluded from the strings-must-mask direction.
#   - Pygments' Kotlin lexer itself desyncs on nested quotes inside
#     interpolations (`"${f("}")}"` — its String.Interpol ends at the
#     smuggled `}`; probed r8); examples containing that shape skip the
#     strings-must-mask direction.
# ---------------------------------------------------------------------------

_PYG_LEXER = {
    "Python": "python", "Ruby": "ruby", "TypeScript": "typescript",
    "Java": "java", "Kotlin": "kotlin", "CSharp": "csharp", "Rust": "rust",
}
_INTERP_OPENER = re.compile(r'\$\{|#\{|\$"|\$@"|@\$"|f"|f\'|`')


def _pyg_char_classes(language, src):
    """Per-char class from Pygments: 'c' comment (Single/Multiline only),
    's' string content, 'x' code, 'i' ignored (markers, preproc, symbols)."""
    from pygments.lexers import get_lexer_by_name

    cls = ["x"] * len(src)
    for idx, tt, val in get_lexer_by_name(_PYG_LEXER[language]).get_tokens_unprocessed(src):
        tn = str(tt)
        if tn.startswith("Token.Comment"):
            mark = "i" if "Preproc" in tn else "c"
        elif tn.startswith("Token.Literal.String"):
            ignorable = (
                "Affix" in tn or "Interpol" in tn or "Escape" in tn
                or "Delimiter" in tn or "Symbol" in tn
            )
            mark = "i" if ignorable else "s"
        else:
            continue
        for j in range(idx, min(idx + len(val), len(cls))):
            cls[j] = mark
    return cls


def _mask_divergences(language, src):
    from knowledge_graph_spark.pipeline.extract import _mask_text

    masked = [m for m, _ in _mask_text(language, src)]
    cls = _pyg_char_classes(language, src)
    out = []
    off = 0
    for ln, ol in enumerate(src.split("\n")):
        ml = masked[ln] if ln < len(masked) else ""
        interp_line = bool(_INTERP_OPENER.search(ol))
        for col, ch in enumerate(ol):
            if ch.isalnum() or ch == "_":
                if ch in "rb" and re.match(r'[rb]{1,2}#*"', ol[col:]):
                    continue  # raw/byte-string affix: marker, not content
                c = cls[off + col] if off + col < len(cls) else "x"
                kept = col < len(ml) and ml[col] == ch
                if c == "c" and kept:
                    out.append(("comment-kept", ln, col, ol[:80]))
                elif c == "x" and not kept:
                    out.append(("code-masked", ln, col, ol[:80]))
                elif c == "s" and kept and not interp_line:
                    out.append(("string-kept", ln, col, ol[:80]))
        off += len(ol) + 1
    return out


@pytest.mark.parametrize(
    "language,gen",
    [
        ("Python", _py_program_scoped), ("Ruby", _rb_program),
        ("TypeScript", _ts_program), ("Kotlin", _kt_program),
        ("Java", _java_program), ("CSharp", _cs_program), ("Rust", _rs_program),
    ],
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_masking_agrees_with_pygments_on_generated(language, gen):
    """Every alphanumeric character Pygments lexes as comment content must be
    masked, every code character must survive, and (outside interpolation
    lines and known lexer desyncs) every string-content character must be
    masked — over the hostile generated programs of all 7 languages."""
    from hypothesis import given, settings as hsettings, HealthCheck as HC

    failures = []

    @given(gen())
    @hsettings(max_examples=25, deadline=None, suppress_health_check=list(HC))
    def run(prog):
        src = prog if isinstance(prog, str) else prog[0]
        if language == "Kotlin" and re.search(r'\$\{[^}]*"', src):
            return  # pygments' own nested-interpolation desync (see header)
        div = _mask_divergences(language, src)
        if div:
            failures.append((div[:5], src))
            raise AssertionError(div[:5])

    run()
    assert not failures, failures[0]


def test_csharp_preprocessor_lines_fully_masked():
    """#region titles are FREE TEXT (`#region helpers compute(1, 2) {`):
    before r8 the title minted a phantom call and its unbalanced brace
    desynced scope depth. The whole directive line is preproc trivia
    (tree-sitter-c-sharp), so it masks away; #if/#else BODIES stay visible —
    the reference parses both branches."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src = (
        "namespace App;\n"
        "public class C {\n"
        "    #region helpers compute(1, 2) class Fake {\n"
        "    public void M() { helper(); }\n"
        "    #endregion\n"
        "    #if DEBUG\n"
        "    public void D() { }\n"
        "    #else\n"
        "    public void E() { }\n"
        "    #endif\n"
        "}\n"
    )
    rows = list(_extract_one("K.cs", "CSharp", src))
    defs = {(r[3], r[4], r[5]) for r in rows if r[2] == "definition"}
    calls = {r[3] for r in rows if r[2] == "call"}
    assert defs == {
        ("C", "App", "Class"), ("M", "App.C", "Method"),
        ("D", "App.C", "Method"), ("E", "App.C", "Method"),
    }, defs
    assert "compute" not in calls, calls
