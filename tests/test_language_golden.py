"""Golden language-analysis tests over the REFERENCE'S OWN fixture corpora,
mirroring the assertions of its per-language analyzer tests:

- Ruby: crates/indexer/src/analysis/languages/ruby/tests.rs (1019 LoC) over
  fixtures/ruby-references — receiver-typed call resolution to the exact
  `Class#method` / `Class::singleton` FQNs the reference asserts.
- Ruby structure: crates/indexer/src/tests.rs test_inheritance_relationships
  over fixtures/test-repo — class definitions + CLASS_TO_METHOD edges.
- Java: crates/indexer/src/analysis/languages/java/tests.rs over
  fixtures/java/main — package-based FQNs, static/instance resolution,
  constructor calls, calls to imported symbols.

The fixtures are read from the read-only reference checkout; nothing from the
reference's code is executed or copied.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

RUBY_REFS = "/root/reference/fixtures/ruby-references"
RUBY_REPO = "/root/reference/fixtures/test-repo"
JAVA_MAIN = "/root/reference/fixtures/java/main"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RUBY_REFS), reason="reference fixtures not present"
)


def _index(spark, root):
    from knowledge_graph_spark.pipeline.build import build_graph_from_entities
    from knowledge_graph_spark.pipeline.extract import extract_entities, list_files

    files = list_files(spark, root)
    return build_graph_from_entities(spark, files, extract_entities(files), "golden")


def _call_pairs(kg) -> set[tuple[str, str]]:
    """(caller_fqn, callee_fqn) for every def→def CALLS/AMBIGUOUSLY_CALLS."""
    de = kg.edges["definition_relationships"]
    refs = de.filter(
        F.col("type").isin(["CALLS", "AMBIGUOUSLY_CALLS"])
        & (F.col("target_table") == "definition_nodes")
    )
    d = kg.definitions.select("id", "fqn")
    rows = (
        refs.join(d.withColumnsRenamed({"id": "source_id", "fqn": "caller"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "callee"}), "target_id")
        .select("caller", "callee")
        .collect()
    )
    return {(r.caller, r.callee) for r in rows}


@pytest.fixture(scope="module")
def ruby_refs(spark):
    return _index(spark, RUBY_REFS)


@pytest.fixture(scope="module")
def ruby_repo(spark):
    return _index(spark, RUBY_REPO)


@pytest.fixture(scope="module")
def java_main(spark):
    return _index(spark, JAVA_MAIN)


# ---- Ruby: receiver-typed call resolution (ruby/tests.rs) -----------------


def test_notification_service_call_resolution(ruby_refs):
    """ruby/tests.rs:138-182: UsersController#destroy →
    NotificationService::notify (constant receiver, singleton method)."""
    pairs = _call_pairs(ruby_refs)
    assert ("UsersController#destroy", "NotificationService::notify") in pairs, sorted(
        p for p in pairs if "destroy" in p[0]
    )


def test_send_welcome_email_resolution(ruby_refs):
    """ruby/tests.rs:186-220: create → User#send_welcome_email (local var
    typed by `User.new`), which in turn calls EmailService::send_welcome."""
    pairs = _call_pairs(ruby_refs)
    assert ("UsersController#create", "User#send_welcome_email") in pairs, sorted(
        p for p in pairs if p[0].endswith("#create")
    )
    assert any(
        caller == "User#send_welcome_email"
        and "EmailService" in callee
        and "send_welcome" in callee
        for caller, callee in pairs
    ), sorted(p for p in pairs if p[0] == "User#send_welcome_email")


def test_static_method_call_resolution(ruby_refs):
    """ruby/tests.rs:222-280 shape: constant-receiver class-method calls
    resolve to `Class::method` singletons across files. (Calls to methods
    the corpus does not define — e.g. ActiveRecord's `User.find` — stay
    unresolved and emit no edge, as in the reference.)"""
    pairs = _call_pairs(ruby_refs)
    assert ("UsersController#create", "Profile::create_default") in pairs
    assert (
        "UsersController#authenticate_user",
        "AuthService::authenticate_token",
    ) in pairs
    assert ("User#get_profile", "Profile::find_by_user_id") in pairs


def test_instance_method_call_via_local_var_type(ruby_refs):
    """`user = User.find(...)` then `user.activate!` → User#activate!
    (find-like singletons type the local as an instance)."""
    pairs = _call_pairs(ruby_refs)
    assert ("UsersController#activate", "User#activate!") in pairs


def test_singleton_vs_instance_fqn_format(ruby_refs):
    """Reference FQN conventions: Class#instance_method,
    Class::singleton_method, no file-path prefix."""
    fqns = {r.fqn for r in ruby_refs.definitions.select("fqn").collect()}
    assert "User#send_welcome_email" in fqns
    assert "User::find_by_email" in fqns
    assert "NotificationService::notify" in fqns
    assert not any(f.startswith("app.") or f.startswith("app/") for f in fqns)


def test_class_to_singleton_method_edges(ruby_refs):
    """def self.x inside a class → CLASS_TO_SINGLETON_METHOD
    (relationship.rs:29-31, ruby/analyzer.rs:208-210)."""
    de = ruby_refs.edges["definition_relationships"]
    n = de.filter(F.col("type") == "CLASS_TO_SINGLETON_METHOD").count()
    assert n >= 5  # User + EmailService + NotificationService singletons


# ---- Ruby: structure over fixtures/test-repo (indexer tests.rs:803+) ------


def test_inheritance_relationships(ruby_repo):
    """tests.rs test_inheritance_relationships: BaseModel & UserModel exist
    as Class definitions; CLASS_TO_METHOD edges exist; BaseModel has
    methods (edges sourced in base_model.rb)."""
    defs = {
        r.fqn: r.definition_type
        for r in ruby_repo.definitions.select("fqn", "definition_type").collect()
    }
    assert defs.get("BaseModel") == "Class"
    assert defs.get("UserModel") == "Class"
    de = ruby_repo.edges["definition_relationships"]
    ctm = de.filter(F.col("type") == "CLASS_TO_METHOD")
    assert ctm.count() > 0
    base_methods = (
        ctm.join(
            ruby_repo.definitions.select(
                F.col("id").alias("source_id"), F.col("fqn").alias("src_fqn")
            ),
            "source_id",
        )
        .filter(F.col("src_fqn") == "BaseModel")
        .count()
    )
    assert base_methods > 0


def test_inherited_method_resolution_through_chain(ruby_repo):
    """UserModel < BaseModel: an instance call to a method only defined on
    BaseModel resolves through the inheritance chain
    (scope_resolver.rs find_method_in_hierarchy)."""
    pairs = _call_pairs(ruby_repo)
    inherited = {
        (c1, c2)
        for c1, c2 in pairs
        if c2.startswith("BaseModel#") and not c1.startswith("BaseModel")
    }
    assert inherited, sorted(pairs)[:30]


# ---- Java: package FQNs + resolution (java/tests.rs) ----------------------


def test_java_package_fqns(java_main):
    """java/tests.rs asserts com.example.app.* FQNs — package declaration,
    not file path, prefixes the scope chain."""
    fqns = {r.fqn for r in java_main.definitions.select("fqn").collect()}
    assert any(f.startswith("com.example.app.") for f in fqns), sorted(fqns)[:20]
    assert "com.example.app.Foo.bar" in fqns or any(
        f.startswith("com.example.app.Foo.") for f in fqns
    ), sorted(f for f in fqns if "Foo" in f)


def test_java_static_and_instance_calls(java_main):
    """java/tests.rs:136-260 shape: calls into com.example.app.Foo.bar /
    Bar.baz resolve (static receiver or typed local)."""
    pairs = _call_pairs(java_main)
    callees = {c for _, c in pairs}
    assert any(c.startswith("com.example.app.Foo") for c in callees), sorted(callees)[:30]
    assert any(c.endswith(".baz") or c.endswith(".bar") for c in callees), sorted(
        callees
    )[:30]


def test_java_constructor_call_resolution(java_main):
    """`new Foo()` resolves as a call whose target is the class definition
    (find_calls_to_method("com.example.app.Foo") in the reference)."""
    pairs = _call_pairs(java_main)
    assert any(
        c == "com.example.app.Foo" or c.endswith(".Foo") for _, c in pairs
    ), sorted({c for _, c in pairs})[:30]


def test_java_calls_to_imported_symbol(java_main):
    """java/tests.rs:281-330: `new ArrayList<>()` with `import
    java.util.ArrayList` → def→imported-symbol CALLS edge."""
    de = java_main.edges["definition_relationships"]
    imp_calls = de.filter(
        (F.col("type") == "CALLS")
        & (F.col("target_table") == "imported_symbol_nodes")
    )
    named = imp_calls.join(
        java_main.imports.select(
            F.col("id").alias("target_id"), F.col("name").alias("imp_name"),
            F.col("import_path").alias("imp_path"),
        ),
        "target_id",
    )
    rows = {(r.imp_path, r.imp_name) for r in named.select("imp_path", "imp_name").collect()}
    assert ("java.util", "ArrayList") in rows or ("java.util", "List") in rows, rows
