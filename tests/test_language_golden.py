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


# ---- TypeScript: fixtures/typescript/test-repo (indexer tests.rs:369-518) --

TS_REPO = "/root/reference/fixtures/typescript/test-repo"


@pytest.fixture(scope="module")
def ts_repo(spark, tmp_path_factory):
    """Index the reference's TS fixture WITH the import modification its
    golden tests apply (tests.rs:118-132 modify_test_repo_typescript inserts
    UserManagement + UserModel imports after main.ts line 2), so line-number
    and import-count assertions carry over verbatim."""
    import shutil

    root = tmp_path_factory.mktemp("ts_fixture")
    dst = root / "test-repo"
    shutil.copytree(TS_REPO, dst)
    main = dst / "main.ts"
    content = main.read_text().replace(
        "import { Authentication } from './lib/authentication';",
        "import { Authentication } from './lib/authentication';\n"
        "import { UserManagement } from './lib/user_management';\n"
        "import { UserModel } from './app/models/user_model';",
    )
    main.write_text(content)
    return _index(spark, str(dst))


def test_ts_definition_inventory(ts_repo):
    """tests.rs:415-419: 84 definitions globally; tests.rs:421-434: 32 in
    user_model.ts + base_model.ts. The inventory is classes + interfaces +
    functions + methods/ctors/accessors — namespaces and fields excluded."""
    assert ts_repo.definitions.count() == 84
    models = ts_repo.definitions.filter(
        F.col("primary_file_path").isin(
            ["app/models/user_model.ts", "app/models/base_model.ts"]
        )
    )
    assert models.count() == 32


def test_ts_main_imports(ts_repo):
    """tests.rs:436-449: main.ts carries 5 imported symbols after the
    modification (3 original + 2 inserted; location-keyed, not deduped)."""
    assert ts_repo.imports.filter(F.col("file_path") == "main.ts").count() == 5


def test_ts_internal_call_location(ts_repo):
    """tests.rs:490-518: Application::run CALLS
    Application::testAuthenticationProviders with source line 21 (0-based,
    after the 2-line import insertion)."""
    d = ts_repo.definitions.select("id", "fqn")
    de = ts_repo.edges["definition_relationships"].filter(
        (F.col("type") == "CALLS") & (F.col("target_table") == "definition_nodes")
    )
    rows = (
        de.join(d.withColumnsRenamed({"id": "source_id", "fqn": "caller"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "callee"}), "target_id")
        .filter(
            (F.col("caller") == "Application::run")
            & (F.col("callee") == "Application::testAuthenticationProviders")
        )
        .collect()
    )
    assert rows, "expected TS internal call row"
    assert rows[0].source_start_line == 21 and rows[0].source_end_line == 21


def test_ts_namespace_scoped_fqns(ts_repo):
    """Namespaces emit no definition node (typescript.rs:42-44) but scope
    the FQNs of everything inside them."""
    fqns = {r.fqn for r in ts_repo.definitions.select("fqn").collect()}
    assert "Authentication" not in fqns  # namespace itself skipped
    assert "UserManagement" not in fqns
    assert "Authentication::authenticateUser" in fqns
    assert "Authentication::Token::expired" in fqns
    assert "Authentication::Providers::LdapProvider::authenticate" in fqns
    assert "UserManagement::User::verifyPassword" in fqns
    assert "UserModel::fullName" in fqns  # get-accessor


def test_ts_receiver_typed_namespace_calls(ts_repo):
    """Receiver-typed resolution through namespace containers:
    Authentication.createSession / UserManagement.createUser from
    Application methods."""
    pairs = _call_pairs(ts_repo)
    assert ("Application::testTokenManagement", "Authentication::createSession") in pairs
    assert ("Application::testAuthentication", "UserManagement::createUser") in pairs
    assert ("Application::run", "Application::testAuthentication") in pairs  # this.x()


def test_ts_static_call_climbs_inheritance(ts_repo):
    """UserModel.create(data) in main.ts: create is defined on BaseModel —
    resolution climbs the extends chain like the reference's
    find_method_in_hierarchy."""
    pairs = _call_pairs(ts_repo)
    assert ("Application::createSampleUsers", "BaseModel::create") in pairs
    # dotted receiver path: UserManagement.User.findByUsername
    assert (
        "Authentication::authenticateUser",
        "UserManagement::User::findByUsername",
    ) in pairs


def test_ts_constructor_calls(ts_repo):
    """`new Token(userId)` → CALLS targeting the class definition; dotted
    `new Providers.LdapProvider(config)` resolves through the last segment."""
    pairs = _call_pairs(ts_repo)
    assert ("Authentication::createSession", "Authentication::Token") in pairs
    assert (
        "Authentication::configureProvider",
        "Authentication::Providers::LdapProvider",
    ) in pairs


def test_ts_relative_import_resolution(ts_repo):
    """'./base_model' from app/models/user_model.ts resolves against the
    importing file's directory, landing on the BaseModel class definition."""
    imp_def = ts_repo.edges["imported_symbol_relationships"].filter(
        F.col("type") == "IMPORTED_SYMBOL_TO_DEFINITION"
    )
    resolved = (
        imp_def.join(
            ts_repo.imports.select(
                F.col("id").alias("source_id"), F.col("file_path").alias("src")
            ),
            "source_id",
        )
        .join(
            ts_repo.definitions.select(F.col("id").alias("target_id"), "fqn"),
            "target_id",
        )
    )
    pairs = {(r.src, r.fqn) for r in resolved.collect()}
    assert ("app/models/user_model.ts", "BaseModel") in pairs, pairs
    # root-level relative import from main.ts → lib file's class
    imp_file = ts_repo.edges["imported_symbol_relationships"].filter(
        F.col("type") == "IMPORTED_SYMBOL_TO_FILE"
    )
    fpairs = {
        (r.src, r.dst)
        for r in imp_file.join(
            ts_repo.imports.select(F.col("id").alias("source_id"), F.col("file_path").alias("src")),
            "source_id",
        )
        .join(
            ts_repo.files.select(F.col("id").alias("target_id"), F.col("path").alias("dst")),
            "target_id",
        )
        .collect()
    }
    assert ("main.ts", "lib/user_management.ts") in fpairs, fpairs


# ---- Kotlin: kotlin/tests.rs over fixtures/kotlin -------------------------
# Mirrors crates/indexer/src/analysis/languages/kotlin/tests.rs (553 LoC):
# constructor + instance + companion + inherited-interface resolution from
# main, super-calls, inner classes, nested classes, enum constants, imported
# types, and the same-name edge case, plus when/if/try branch-type unification
# to the least common ancestor. The extension-receiver tests are NOT
# mirrored (tree-sitter-only semantics, documented analyzer gap).

KOTLIN_MAIN = "/root/reference/fixtures/kotlin"


@pytest.fixture(scope="module")
def kotlin_main(spark):
    return _index(spark, KOTLIN_MAIN)


def test_kotlin_main_calls_foo_constructor_and_method(kotlin_main):
    """kotlin/tests.rs:118-146: main → Foo() constructor and foo.foo()
    instance method (local `val foo = Foo()` types the receiver)."""
    pairs = _call_pairs(kotlin_main)
    assert ("com.example.main", "com.example.foo.Foo") in pairs
    assert ("com.example.main", "com.example.foo.Foo.foo") in pairs


def test_kotlin_companion_method_resolution(kotlin_main):
    """kotlin/tests.rs:147-156: foo.companionFoo() resolves into the
    companion object — exact reference FQN Foo.Companion.companionFoo."""
    pairs = _call_pairs(kotlin_main)
    assert ("com.example.main", "com.example.foo.Foo.Companion.companionFoo") in pairs


def test_kotlin_interface_method_through_inheritance(kotlin_main):
    """kotlin/tests.rs:158-167: foo.baz() climbs Foo → Bar → Baz (interface)."""
    pairs = _call_pairs(kotlin_main)
    assert ("com.example.main", "com.example.foo.Baz.baz") in pairs


def test_kotlin_super_call_to_parent(kotlin_main):
    """kotlin/tests.rs:173-196: Foo.foo's super.bar() → Bar.bar."""
    pairs = _call_pairs(kotlin_main)
    assert ("com.example.foo.Foo.foo", "com.example.foo.Bar.bar") in pairs


def test_kotlin_inner_class_calls(kotlin_main):
    """kotlin/tests.rs:198-228: fooInFooBody() called from both Foo.foo and
    Foo.InnerFoo.innerFoo."""
    pairs = _call_pairs(kotlin_main)
    assert ("com.example.foo.Foo.foo", "com.example.foo.Foo.fooInFooBody") in pairs
    assert (
        "com.example.foo.Foo.InnerFoo.innerFoo",
        "com.example.foo.Foo.fooInFooBody",
    ) in pairs


def test_kotlin_logger_import_call(kotlin_main):
    """kotlin/tests.rs:312-330 (find_calls_to_imported_symbol): logger.info()
    where `val logger: Logger` and Logger is imported from org.slf4j."""
    de = kotlin_main.edges["definition_relationships"]
    impr = de.filter(F.col("target_table") == "imported_symbol_nodes")
    d = kotlin_main.definitions.select("id", "fqn")
    rows = (
        impr.join(d.withColumnsRenamed({"id": "source_id", "fqn": "caller"}), "source_id")
        .join(
            kotlin_main.imports.select(
                F.col("id").alias("target_id"), "name", "import_path"
            ),
            "target_id",
        )
        .select("caller", "import_path", "name")
        .collect()
    )
    assert ("com.example.main", "org.slf4j", "Logger") in {
        (r.caller, r.import_path, r.name) for r in rows
    }


def test_kotlin_nested_class_resolution(kotlin_main):
    """kotlin/tests.rs:332-378: inferred (`val x = Parent.Child.GrandChild()`)
    and typed (`val y: Parent.GrandChild`) nested receivers both resolve
    their greet() — two same-name GrandChild classes make it ambiguous for
    the regex analyzer, but both reference-asserted edges exist."""
    pairs = _call_pairs(kotlin_main)
    assert (
        "com.example.main",
        "com.example.nestedclasses.Parent.Child.GrandChild.greet",
    ) in pairs
    assert (
        "com.example.main",
        "com.example.nestedclasses.Parent.GrandChild.greet",
    ) in pairs
    # ctor edges for both nested classes
    assert ("com.example.main", "com.example.nestedclasses.Parent.Child.GrandChild") in pairs
    assert ("com.example.main", "com.example.nestedclasses.Parent.GrandChild") in pairs


def test_kotlin_nested_super_call(kotlin_main):
    """kotlin/tests.rs:345-357: Parent.GrandChild.greet's super.greet() →
    Parent.Child.GrandChild.greet."""
    pairs = _call_pairs(kotlin_main)
    assert (
        "com.example.nestedclasses.Parent.GrandChild.greet",
        "com.example.nestedclasses.Parent.Child.GrandChild.greet",
    ) in pairs


def test_kotlin_enum_constant_method_calls(kotlin_main):
    """kotlin/tests.rs:437-470: Enum.ENUM_VALUE_1.enumMethod() (constant
    receiver) and enumValue.enumMethod2() (local typed by enum-constant
    assignment) both resolve to the enum's methods."""
    pairs = _call_pairs(kotlin_main)
    assert ("com.example.main", "com.example.enums.Enum.enumMethod") in pairs
    assert ("com.example.main", "com.example.enums.Enum.enumMethod2") in pairs


def test_kotlin_same_name_filter_edge_case(kotlin_main):
    """kotlin/tests.rs:399-421: ServerFilter.filter's super.filter() reaches
    the top-level Filter interface's filter (same-name inner class makes the
    candidate set ambiguous; the reference-asserted edge exists)."""
    pairs = _call_pairs(kotlin_main)
    assert (
        "com.example.edgecases.filter.ServerFilter.filter",
        "com.example.edgecases.filter.Filter.filter",
    ) in pairs


def test_kotlin_definition_fqns(kotlin_main):
    """Package-based FQNs with Companion segments — schema parity spot
    checks against the reference's asserted FQN strings."""
    fqns = {r.fqn for r in kotlin_main.definitions.select("fqn").collect()}
    for expected in (
        "com.example.main",
        "com.example.foo.Foo",
        "com.example.foo.Foo.Companion",
        "com.example.foo.Foo.Companion.companionFoo",
        "com.example.foo.Foo.InnerFoo.innerFoo",
        "com.example.operator.AnimalList.Companion.of",
        "com.example.enums.Enum.enumMethod",
        "com.example.entites.Person.getName",
    ):
        assert expected in fqns, expected


def test_kotlin_when_expression_type_inference(kotlin_main):
    """kotlin/tests.rs:232-256: `val person = when {.. -> Admin(); else ->
    User()}` then person.getName() — the branch-type set {Admin, User}
    unifies to its least common ancestor Person
    (expression_resolver.rs:352-363,1560-1599) and resolves
    Person.getName."""
    pairs = _call_pairs(kotlin_main)
    assert (
        "com.example.when.whenTypeInference",
        "com.example.entites.Person.getName",
    ) in pairs


def test_kotlin_if_expression_type_inference(kotlin_main):
    """kotlin/tests.rs:258-282: expression-bodied `fun ifTypeInference(..) =
    if (..) Admin() else User()`; the call-site receiver
    `ifTypeInference(config).getName()` types through the inferred return
    set and unifies to Person.getName."""
    pairs = _call_pairs(kotlin_main)
    assert (
        "com.example.if.usageOfIfTypeInference",
        "com.example.entites.Person.getName",
    ) in pairs


def test_kotlin_extension_functions_and_properties(kotlin_main):
    """kotlin/tests.rs:482-553: extension functions resolve as members of
    their receiver type with receiver-free FQNs; extension-property result
    types carry one member hop (extendMe.reversed.printValue() resolves
    through the cross-file property typed ExtendMe)."""
    pairs = _call_pairs(kotlin_main)
    # fun ExtendMe.printValue(), same-file receiver-typed call
    assert (
        "com.example.extensions.callToExtensions",
        "com.example.extensions.printValue",
    ) in pairs
    # fun ExtendMe.reverse() in utils, wildcard-imported
    assert (
        "com.example.extensions.callToImportedExtensions",
        "com.example.extensions.utils.reverse",
    ) in pairs
    # extendMe.extend.printValue() → ExtendMeFromProperty.printValue via the
    # extension property's getter type
    assert (
        "com.example.extensions.callToExtensions",
        "com.example.extensions.entities.ExtendMeFromProperty.printValue",
    ) in pairs
    # extendMe.reversed.printValue() → ExtendMe.printValue via the
    # cross-file extension property typed ExtendMe
    assert (
        "com.example.extensions.callToImportedExtensions",
        "com.example.extensions.printValue",
    ) in pairs
    # externalType.print() → the ExternalType.print extension (print is not
    # bare-call noise when receiver-qualified)
    assert (
        "com.example.extensions.imported.callToImported",
        "com.example.extensions.imported.print",
    ) in pairs


def test_kotlin_try_expression_type_inference(kotlin_main):
    """kotlin/tests.rs:284-308: `val result = try { .. Admin() .. User() }
    catch (..) { null }` — throw X(..) ctors never type the expression;
    result?.getName() unifies {Admin, User} → Person.getName."""
    pairs = _call_pairs(kotlin_main)
    assert (
        "com.example.try.tryTypeInference",
        "com.example.entites.Person.getName",
    ) in pairs


# ---- comment / string masking negatives (all language families) -----------
# The reference's tree-sitter parse never sees comments or literals as code;
# the masking pre-pass must keep commented-out and quoted "code" out of the
# entity stream.


def _names(path, language, text):
    from knowledge_graph_spark.pipeline.extract import _extract_one

    return {(r[2], r[3]) for r in _extract_one(path, language, text)}


def test_masking_python_negatives():
    out = _names(
        "m.py",
        "Python",
        "# def hidden(): pass\n"
        "x = \"def sneaky(): pass\"\n"
        "'''\n"
        "class InDocstring:\n"
        "    def in_docstring(self): pass\n"
        "'''\n"
        "s = 'User.find(1)'\n"
        "def real():\n"
        "    return x\n",
    )
    names = {n for _, n in out}
    assert "real" in names
    for bad in ("hidden", "sneaky", "InDocstring", "in_docstring", "find"):
        assert bad not in names, bad


def test_masking_ruby_negatives():
    out = _names(
        "m.rb",
        "Ruby",
        "# def hidden\n"
        "=begin\n"
        "def in_block\nend\n"
        "=end\n"
        "msg = \"User.find(\"\n"
        "def real\nend\n",
    )
    names = {n for _, n in out}
    assert "real" in names
    for bad in ("hidden", "in_block", "find"):
        assert bad not in names, bad


def test_masking_nested_literals_inside_interpolations():
    """A quote or '}' inside a string literal NESTED in an interpolation
    (Ruby "#{h["}"]}", Kotlin "${f("}")}") must not close the interpolation
    early — pre-r8 this desynced the mask and ate real code after the
    string (r7 ADVICE low, extract.py interp state)."""
    cases = [
        # the nested literal smuggles both '}' and def-keyword text —
        # neither may close the interp early nor mint a phantom definition
        # (interp EXPRESSIONS like f(...) stay visible by design: call scans)
        ("m.rb", "Ruby",
         'x = "#{h["} def phantom "]}"\ndef real\nend\n', "real"),
        ("m.kt", "Kotlin",
         'val s = "${f("} fun phantom() = 1 ")}"\nfun real() = 1\n', "real"),
        ("m.py", "Python",
         "x = f\"{d['} def phantom(): pass ']}\"\ndef real(): pass\n", "real"),
        ("m.cs", "CSharp",
         'class C {\n'
         '  string S => $"{F("} void Phantom() {} ")}";\n'
         '  void Real() {}\n'
         '}\n',
         "Real"),
    ]
    for path, lang, text, want in cases:
        names = {n for _, n in _names(path, lang, text)}
        assert want in names, (lang, names)
        assert not ({"phantom", "Phantom"} & names), (lang, names)


def test_typescript_namespace_module_scoping():
    """TS namespaces emit no definition row but scope member FQNs
    (typescript.rs:41-44 Namespace → continue); the legacy `module X {}`
    syntax behaves identically, and ambient `declare module "pkg"` bodies
    scope under the quoted name instead of leaking into the previous
    top-level frame."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    out = {
        (r[3], r[4])
        for r in _extract_one(
            "n.ts",
            "TypeScript",
            "namespace Utils {\n"
            "  export function helper(): void {}\n"
            "}\n"
            "export module Legacy {\n"
            "  export function old(): void {}\n"
            "}\n"
            'declare module "ambient-pkg" {\n'
            "  export function hidden(): void;\n"
            "}\n"
            "function top(): void {}\n",
        )
        if r[2] == "definition"
    }
    assert ("helper", "Utils") in out
    assert ("old", "Legacy") in out
    assert ("hidden", "ambient-pkg") in out
    assert ("top", None) in out
    names = {n for n, _ in out}
    # the namespace/module frames themselves emit no definition rows
    assert not ({"Utils", "Legacy", "ambient-pkg"} & names)


def test_masking_ruby_heredocs():
    """Heredoc bodies are data, not code (tree-sitter parity): no phantom
    defs/classes/imports from heredoc content; `<<` shift/append expressions
    are untouched; stacked same-line heredocs terminate FIFO."""
    out = _names(
        "h.rb",
        "Ruby",
        "class Reports\n"
        "  def build\n"
        "    sql = <<~SQL\n"
        "      def fake_method\n"
        "      require 'phantom'\n"
        "    SQL\n"
        "    raw = <<-EOS\n"
        "      class Phantom\n"
        "    EOS\n"
        "    doc = <<DOC\n"
        "def bare_body\n"
        "DOC\n"
        "    queue << item\n"
        "    multi = foo(<<~A, <<~B)\n"
        "      def inside_a\n"
        "    A\n"
        "      def inside_b\n"
        "    B\n"
        "    x = 1\n"
        "  end\n"
        "  def after_heredocs\n"
        "  end\n"
        "end\n",
    )
    names = {n for _, n in out}
    assert {"Reports", "build", "after_heredocs"} <= names
    for bad in ("fake_method", "Phantom", "bare_body", "inside_a", "inside_b"):
        assert bad not in names, bad


def test_masking_typescript_negatives():
    out = _names(
        "m.ts",
        "TypeScript",
        "// function hidden() {}\n"
        "/*\n"
        "class InBlock {}\n"
        "*/\n"
        "const s = \"callMe()\";\n"
        "const t = `function inTemplate() {}\n"
        "more ${x} lines`;\n"
        "function real() {}\n",
    )
    names = {n for _, n in out}
    assert "real" in names
    for bad in ("hidden", "InBlock", "callMe", "inTemplate"):
        assert bad not in names, bad


def test_masking_kotlin_java_negatives():
    for path, lang in (("M.kt", "Kotlin"), ("M.java", "Java")):
        out = _names(
            path,
            lang,
            "// fun hidden() {}\n"
            "/*\n"
            "class InBlock {}\n"
            "*/\n"
            'val s = "callMe()"\n' if lang == "Kotlin" else
            "// fun hidden() {}\n"
            "/*\n"
            "class InBlock {}\n"
            "*/\n"
            'String s = "callMe()";\n',
        )
        names = {n for _, n in out}
        for bad in ("hidden", "InBlock", "callMe"):
            assert bad not in names, (lang, bad)


def test_masking_import_paths_survive():
    """Imports read from string literals must still extract (the import
    pass sees comment-masked, string-INTACT lines)."""
    rb = _names("m.rb", "Ruby", "require 'user_service'\n")
    assert ("import", "user_service") in rb
    ts = _names(
        "m.ts", "TypeScript", "import { Widget } from './lib/widget';\n"
    )
    assert ("import", "Widget") in ts


# ---- C# / Rust receiver-typed call resolution (synthetic fixtures) --------
# The reference ships no C#/Rust fixture repos; these synthetic corpora
# assert the same resolution semantics the analyzer families share:
# constructor/let-typed locals, base/assoc calls, inheritance climb.

CSHARP_CORPUS = {
    "App/Services/UserService.cs": (
        "using System;\n"
        "namespace App.Services;\n"
        "public class BaseService {\n"
        "    public void Log() {\n"
        "    }\n"
        "}\n"
        "public class UserService : BaseService {\n"
        "    private readonly UserRepo _repo;\n"
        "    public void Activate() {\n"
        "        var user = new UserModel();\n"
        "        user.Validate();\n"
        "        _repo.Save();\n"
        "        base.Log();\n"
        "    }\n"
        "}\n"
    ),
    "App/Models/UserModel.cs": (
        "namespace App.Models;\n"
        "public class UserModel {\n"
        "    public void Validate() {\n"
        "    }\n"
        "}\n"
        "public class UserRepo {\n"
        "    public void Save() {\n"
        "    }\n"
        "}\n"
    ),
}

RUST_CORPUS = {
    "src/user.rs": (
        "pub struct User;\n"
        "impl User {\n"
        "    pub fn new() -> Self {\n"
        "        User\n"
        "    }\n"
        "    pub fn activate(&self) {\n"
        "    }\n"
        "}\n"
    ),
    "src/main.rs": (
        "use crate::user::User;\n"
        "fn main() {\n"
        "    let u = User::new();\n"
        "    u.activate();\n"
        "}\n"
    ),
}


def _index_corpus(spark, tmp_path_factory, corpus, name):
    root = tmp_path_factory.mktemp(name)
    for rel, content in corpus.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    return _index(spark, str(root))


@pytest.fixture(scope="module")
def csharp_repo(spark, tmp_path_factory):
    return _index_corpus(spark, tmp_path_factory, CSHARP_CORPUS, "cs-repo")


@pytest.fixture(scope="module")
def rust_repo(spark, tmp_path_factory):
    return _index_corpus(spark, tmp_path_factory, RUST_CORPUS, "rs-repo")


def test_csharp_receiver_resolution(csharp_repo):
    pairs = _call_pairs(csharp_repo)
    by_name = {(c.split(".")[-2], c.split(".")[-1], t.split(".")[-1]) for c, t in pairs}
    # var-typed local -> cross-file instance method
    assert ("UserService", "Activate", "Validate") in by_name, sorted(pairs)
    # field-typed receiver (_repo: UserRepo)
    assert ("UserService", "Activate", "Save") in by_name, sorted(pairs)
    # base.Log() climbs to BaseService.Log
    assert ("UserService", "Activate", "Log") in by_name, sorted(pairs)
    # constructor call edge to the class
    assert ("UserService", "Activate", "UserModel") in by_name, sorted(pairs)


def test_rust_receiver_resolution(rust_repo):
    pairs = _call_pairs(rust_repo)
    by_name = {(c.split(".")[-1], t.split(".")[-1]) for c, t in pairs}
    # Type::assoc call resolves into the impl'd type
    assert ("main", "new") in by_name, sorted(pairs)
    # let-typed local (`let u = User::new()`) -> instance method
    assert ("main", "activate") in by_name, sorted(pairs)


# ---- multi-line signatures (tree-sitter parses these; line regexes must
# ---- confirm the body brace on a continuation line before emitting) --------


def test_ts_multiline_method_signatures():
    out = _names(
        "svc.ts",
        "TypeScript",
        "class UserService {\n"
        "  findUser(\n"
        "    id: number,\n"
        "    opts: QueryOpts,\n"
        "  ): Promise<User | null> {\n"
        "    return id;\n"
        "  }\n"
        "\n"
        "  allmanBrace(): void\n"
        "  {\n"
        "    return;\n"
        "  }\n"
        "\n"
        "  abstract declOnly(\n"
        "    x: number,\n"
        "  ): void;\n"
        "\n"
        "  fieldArrow = (\n"
        "    a: number,\n"
        "  ) => a + 1;\n"
        "}\n",
    )
    defs = {n for k, n in out if k == "definition"}
    assert "findUser" in defs, sorted(out)
    assert "allmanBrace" in defs, sorted(out)
    # signature-only declarations and field arrows are NOT method definitions
    assert "declOnly" not in defs, sorted(out)
    assert "fieldArrow" not in defs, sorted(out)


def test_ts_multiline_not_confused_by_calls():
    # a multi-line CALL at class-body depth must not become a method: the
    # continuation probe requires ')' then '{' with no ';'/'=' between
    out = _names(
        "calls.ts",
        "TypeScript",
        "registerHandler(\n"
        "  onEvent,\n"
        ");\n"
        "class C {\n"
        "  real() {\n"
        "    dispatch(\n"
        "      payload,\n"
        "    );\n"
        "  }\n"
        "}\n",
    )
    defs = {n for k, n in out if k == "definition"}
    assert defs == {"C", "real"}, sorted(out)


def test_csharp_allman_properties():
    out = _names(
        "Counter.cs",
        "CSharp",
        "public class Counter\n"
        "{\n"
        "    private int _count;\n"
        "\n"
        "    public int Count\n"
        "    {\n"
        "        get { return _count; }\n"
        "        set { _count = value; }\n"
        "    }\n"
        "\n"
        "    public string Name\n"
        "    {\n"
        "        get;\n"
        "        init;\n"
        "    }\n"
        "\n"
        "    public int Inline { get; set; }\n"
        "\n"
        "    public void DoWork()\n"
        "    {\n"
        "        var x = _count;\n"
        "    }\n"
        "}\n",
    )
    defs = {n for k, n in out if k == "definition"}
    assert {"Counter", "Count", "Name", "Inline", "DoWork"} <= defs, sorted(out)


def test_python_parenthesized_multiline_imports():
    out = {
        (r[2], r[3], r[6], r[7])
        for r in __import__(
            "knowledge_graph_spark.pipeline.extract", fromlist=["_extract_one"]
        )._extract_one(
            "m.py",
            "Python",
            "from pkg.mod import (\n"
            "    alpha,\n"
            "    beta as b,\n"
            ")\n"
            "from one_line import (x, y as z)\n"
            "from .rel import (\n"
            "    thing,\n"
            ")\n",
        )
    }
    assert ("import", "alpha", "pkg.mod", None) in out, sorted(out)
    assert ("import", "beta", "pkg.mod", "b") in out, sorted(out)
    assert ("import", "x", "one_line", None) in out, sorted(out)
    assert ("import", "y", "one_line", "z") in out, sorted(out)
    # relative base keeps its dots for the build-stage candidate join
    assert ("import", "thing", ".rel", None) in out, sorted(out)


def test_ts_multiline_named_imports():
    out = {
        (r[2], r[3], r[6], r[7])
        for r in __import__(
            "knowledge_graph_spark.pipeline.extract", fromlist=["_extract_one"]
        )._extract_one(
            "m.ts",
            "TypeScript",
            "import {\n"
            "  UserModel,\n"
            "  BaseModel as BM,\n"
            "} from './models';\n"
            "import Default, {\n"
            "  helper,\n"
            "} from './util';\n",
        )
    }
    assert ("import", "UserModel", "./models", None) in out, sorted(out)
    assert ("import", "BaseModel", "./models", "BM") in out, sorted(out)
    assert ("import", "Default", "./util", None) in out, sorted(out)
    assert ("import", "helper", "./util", None) in out, sorted(out)


def test_csharp_namespace_fqn_prefix():
    out = {
        (r[2], r[3], r[4])
        for r in __import__(
            "knowledge_graph_spark.pipeline.extract", fromlist=["_extract_one"]
        )._extract_one(
            "Svc.cs",
            "CSharp",
            "namespace App.Services;\n"
            "public class UserService {\n"
            "    public void Activate() {\n"
            "    }\n"
            "}\n",
        )
    }
    assert ("definition", "UserService", "App.Services") in out, sorted(out)
    assert ("definition", "Activate", "App.Services.UserService") in out, sorted(out)


def test_kotlin_extension_function_names():
    out = _names(
        "Ext.kt",
        "Kotlin",
        "package com.example.extensions\n"
        "\n"
        "fun ExtendMe.printValue(): Unit {\n"
        "}\n"
        "\n"
        "fun <T> genericFn(x: T) {\n"
        "}\n"
        "\n"
        "async_guard = 0\n",
    )
    defs = {n for k, n in out if k == "definition"}
    # the receiver is not the definition name (kotlin/tests.rs:495 expects
    # com.example.extensions.printValue for `fun ExtendMe.printValue()`)
    assert "printValue" in defs, sorted(out)
    assert "genericFn" in defs, sorted(out)
    assert "ExtendMe" not in defs, sorted(out)


def test_python_async_def():
    out = _names(
        "m.py",
        "Python",
        "async def fetch():\n"
        "    return 1\n"
        "\n"
        "class Svc:\n"
        "    async def run(self):\n"
        "        return fetch()\n",
    )
    defs = {n for k, n in out if k == "definition"}
    assert {"fetch", "Svc", "run"} <= defs, sorted(out)


# ---- Round-3 additions: the remaining ruby/tests.rs + java/tests.rs
# assertions not yet mirrored ------------------------------------------------


def _call_pairs_loc(kg) -> dict[tuple[str, str], tuple[int, int]]:
    """(caller_fqn, callee_fqn) → (source_start_line, source_end_line)."""
    de = kg.edges["definition_relationships"]
    refs = de.filter(
        F.col("type").isin(["CALLS", "AMBIGUOUSLY_CALLS"])
        & (F.col("target_table") == "definition_nodes")
    )
    d = kg.definitions.select("id", "fqn")
    rows = (
        refs.join(d.withColumnsRenamed({"id": "source_id", "fqn": "caller"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "callee"}), "target_id")
        .select("caller", "callee", "source_start_line", "source_end_line")
        .collect()
    )
    return {
        (r.caller, r.callee): (r.source_start_line, r.source_end_line) for r in rows
    }


def test_ruby_chained_method_call_resolution(ruby_refs):
    """ruby/tests.rs:326-384: User#get_profile calls Profile.find_by_user_id;
    User#update_profile calls get_profile (bare parenless RHS call)."""
    pairs = _call_pairs(ruby_refs)
    assert ("User#get_profile", "Profile::find_by_user_id") in pairs, sorted(
        p for p in pairs if p[0] == "User#get_profile"
    )
    assert ("User#update_profile", "User#get_profile") in pairs, sorted(
        p for p in pairs if p[0] == "User#update_profile"
    )


def test_ruby_cross_file_reference_resolution(ruby_refs):
    """ruby/tests.rs:387-443: main.rb classes calling model/service methods
    across files — Application → User.create_with_profile, TestUtilities →
    Profile.create_default and NotificationService.notify_all."""
    pairs = _call_pairs(ruby_refs)
    assert (
        "Application#test_user_creation_flow",
        "User::create_with_profile",
    ) in pairs, sorted(p for p in pairs if p[0].startswith("Application"))
    assert ("TestUtilities::create_test_data", "Profile::create_default") in pairs
    assert (
        "TestUtilities::send_bulk_notifications",
        "NotificationService::notify_all",
    ) in pairs


def test_ruby_instance_variable_resolution(ruby_refs):
    """ruby/tests.rs:734-752: @user typed by `@user = User.find(...)` in the
    before_action helper find_user — defined BELOW show in the file — still
    resolves @user.get_profile in show (class-level ivar typing)."""
    pairs = _call_pairs(ruby_refs)
    assert ("UsersController#show", "User#get_profile") in pairs, sorted(
        p for p in pairs if p[0] == "UsersController#show"
    )


def test_ruby_constant_resolution(ruby_refs):
    """ruby/tests.rs:756-784: constant receivers resolve to singleton
    methods — User::create_with_profile and Profile::create_default both
    have callers."""
    pairs = _call_pairs(ruby_refs)
    assert any(c == "User::create_with_profile" for _, c in pairs)
    assert any(c == "Profile::create_default" for _, c in pairs)


def test_ruby_nested_method_calls(ruby_refs):
    """ruby/tests.rs:788-816: NotificationService::notify calls its own
    build_notification / determine_delivery_method / log_notification."""
    pairs = _call_pairs(ruby_refs)
    for callee in (
        "NotificationService::build_notification",
        "NotificationService::determine_delivery_method",
        "NotificationService::log_notification",
    ):
        assert ("NotificationService::notify", callee) in pairs, sorted(
            p for p in pairs if p[0] == "NotificationService::notify"
        )


def test_ruby_cross_service_calls(ruby_refs):
    """ruby/tests.rs:820-848: service-to-service — notify →
    EmailService::send_notification; User#send_welcome_email →
    EmailService::send_welcome."""
    pairs = _call_pairs(ruby_refs)
    assert ("NotificationService::notify", "EmailService::send_notification") in pairs
    assert ("User#send_welcome_email", "EmailService::send_welcome") in pairs


def test_ruby_private_method_calls(ruby_refs):
    """ruby/tests.rs:852-882: User#activate! calls SOMETHING (bang-method
    defs + bare calls), and the private send_notification →
    NotificationService::notify."""
    pairs = _call_pairs(ruby_refs)
    assert any(a == "User#activate!" for a, _ in pairs), sorted(
        a for a, _ in pairs if "activate" in a
    )
    assert ("User#send_notification", "NotificationService::notify") in pairs


def test_ruby_block_and_iterator_calls(ruby_refs):
    """ruby/tests.rs:908-935: bare calls inside `each do |x|` blocks still
    belong to the enclosing method — send_batch_notifications and
    notify_all both call notify."""
    pairs = _call_pairs(ruby_refs)
    assert (
        "NotificationService::send_batch_notifications",
        "NotificationService::notify",
    ) in pairs
    assert ("NotificationService::notify_all", "NotificationService::notify") in pairs


def test_ruby_conditional_method_calls(ruby_refs):
    """ruby/tests.rs:939-961: `profile = get_profile` then
    `profile.update(...) if profile` — the get_profile call resolves; the
    reference documents profile.update (framework method) as unresolved."""
    pairs = _call_pairs(ruby_refs)
    assert ("User#update_profile", "User#get_profile") in pairs


def test_ruby_method_resolution_accuracy(ruby_refs):
    """ruby/tests.rs:964-1018: the five precision assertions in one."""
    pairs = _call_pairs(ruby_refs)
    assert ("User#send_welcome_email", "EmailService::send_welcome") in pairs
    assert (
        "NotificationService::notify",
        "NotificationService::build_notification",
    ) in pairs
    assert ("User#send_notification", "NotificationService::notify") in pairs
    assert ("UsersController#show", "User#get_profile") in pairs
    assert any(c == "Profile::create_default" for _, c in pairs)


def test_java_same_class_name_in_same_package(java_main):
    """java/tests.rs:339-359: nested `class Filter extends ServerFilter`
    (same simple name as the package's Filter interface) — super.apply()
    climbs extends→implements into the interface's default apply."""
    pairs = _call_pairs(java_main)
    assert (
        "com.example.filter.ServerFilter.Filter.apply",
        "com.example.filter.Filter.apply",
    ) in pairs, sorted(p for p in pairs if "ilter" in p[0])


def test_java_call_relationship_has_location(java_main):
    """java/tests.rs:362-461: exact 0-based source lines on CALLS edges —
    Main.main → Application.run via `await(() -> super.run())` at line 21,
    → Outer.make at 24, → imported ArrayList ctor at 41."""
    locs = _call_pairs_loc(java_main)
    assert locs.get(
        ("com.example.app.Main.main", "com.example.app.Application.run")
    ) == (21, 21), {k: v for k, v in locs.items() if k[0].endswith("Main.main")}
    assert locs.get(("com.example.app.Main.main", "com.example.util.Outer.make")) == (
        24,
        24,
    )
    de = java_main.edges["definition_relationships"]
    imp = (
        de.filter(
            (F.col("type") == "CALLS")
            & (F.col("target_table") == "imported_symbol_nodes")
        )
        .join(
            java_main.imports.select(
                F.col("id").alias("target_id"),
                F.col("name").alias("imp_name"),
                F.col("import_path").alias("imp_path"),
            ),
            "target_id",
        )
        .select("imp_path", "imp_name", "source_start_line")
        .collect()
    )
    rows = {(r.imp_path, r.imp_name): r.source_start_line for r in imp}
    assert rows.get(("java.util", "ArrayList")) == 41, rows


def test_java_reference_to_deep_nested_class(java_main):
    """java/tests.rs:464-486: InnerInnerHelpers.innerInnerDoHelp →
    (super.innerDoHelp()) → Helpers.InnerHelpers.innerDoHelp, two levels of
    nesting deep."""
    pairs = _call_pairs(java_main)
    assert (
        "com.example.helpers.Helpers.InnerInnerHelpers.innerInnerDoHelp",
        "com.example.helpers.Helpers.InnerHelpers.innerDoHelp",
    ) in pairs, sorted(p for p in pairs if "Helpers" in p[0])


# ---- import_usage MCP tool over fixtures/java-user-service -----------------
# (crates/mcp/src/tools/import_usage/tool.rs:159-260)

JAVA_USER_SERVICE = "/root/reference/fixtures/java-user-service"


@pytest.fixture(scope="module")
def java_user_service(spark):
    return _index(spark, JAVA_USER_SERVICE)


def test_import_usage_java_spring_imports_and_refs(java_user_service):
    """tool.rs:159-190: querying import_path
    org.springframework.web.bind.annotation (a wildcard `.*` import) renders
    <imports>/<usages> blocks containing the import source line."""
    from knowledge_graph_spark.queries.shaping import import_usage_xml

    xml = import_usage_xml(
        java_user_service, ["org.springframework.web.bind.annotation"]
    ).collect()[0].xml
    assert "<imports>" in xml
    assert "<usages>" in xml
    assert "import org.springframework.web.bind.annotation" in xml, xml[:800]


def test_import_usage_java_logging_import(java_user_service):
    """tool.rs:193-224: the log4j import block lists the import lines and the
    logger.* usage sites inside UserController's methods."""
    from knowledge_graph_spark.queries.shaping import import_usage_xml

    xml = import_usage_xml(
        java_user_service, ["org.apache.logging.log4j"]
    ).collect()[0].xml
    assert "import org.apache.logging.log4j" in xml
    assert "UserController.java" in xml
    assert "getUserById" in xml
    assert "getAllUsers" in xml


def test_import_usage_case_insensitive_import_path(java_user_service):
    """tool.rs:226-258: import paths match case-insensitively."""
    from knowledge_graph_spark.queries.shaping import import_usage_xml

    xml = import_usage_xml(
        java_user_service, ["ORG.APACHE.LOGGING.LOG4J"]
    ).collect()[0].xml
    assert "import org.apache.logging.log4j" in xml


def test_import_usage_pagination_limits_files(java_user_service):
    """tool.rs:373-429: page_size=1 yields one file block and a next-page
    token; the last page carries none."""
    from knowledge_graph_spark.queries.shaping import import_usage_xml

    p1 = import_usage_xml(
        java_user_service, ["org.apache.logging.log4j"], page=1, page_size=1
    ).collect()[0]
    assert p1.n_files == 1 and p1.next_page == 2
    assert "More results available via next-page." in p1.system_message
    p3 = import_usage_xml(
        java_user_service, ["org.apache.logging.log4j"], page=3, page_size=1
    ).collect()[0]
    assert p3.next_page is None


def test_java_field_type_feeds_receiver_resolution(java_user_service):
    """`private static final Logger logger = LogManager.getLogger(...)` —
    the field's declared type resolves logger.info() receivers, and the
    initializer's LogManager.getLogger call is a call from the field
    (java/expression_resolver.rs field typing)."""
    de = java_user_service.edges["definition_relationships"]
    d = java_user_service.definitions.select("id", "fqn")
    imp_calls = {
        (r.caller, r.imp_name)
        for r in de.filter(
            (F.col("type") == "CALLS")
            & (F.col("target_table") == "imported_symbol_nodes")
        )
        .join(d.withColumnsRenamed({"id": "source_id", "fqn": "caller"}), "source_id")
        .join(
            java_user_service.imports.select(
                F.col("id").alias("target_id"), F.col("name").alias("imp_name")
            ),
            "target_id",
        )
        .select("caller", "imp_name")
        .collect()
    }
    assert (
        "com.example.userservice.controller.UserController.getAllUsers",
        "Logger",
    ) in imp_calls, sorted(c for c in imp_calls if "getAllUsers" in c[0])
    # fields are not definitions (java/analyzer.rs:64-69 skips Field), so
    # the initializer's call attributes to the CLASS
    assert (
        "com.example.userservice.controller.UserController",
        "LogManager",
    ) in imp_calls, sorted(c for c in imp_calls if c[1] == "LogManager")
    assert not any(
        c[0].endswith(".logger") for c in imp_calls
    )  # no field definition nodes exist to be callers


def test_get_references_xml_populated(ruby_refs):
    """get_references tool render over ruby-references (get_references/
    tool.rs asserts callers of NotificationService.notify): referencing
    definitions grouped with CALLS sites and ±2-line contexts."""
    from knowledge_graph_spark.queries.shaping import get_references_xml

    row = get_references_xml(
        ruby_refs, "notify", "app/services/notification_service.rb"
    ).collect()[0]
    xml = row.xml
    assert row.n_results >= 3, xml[:500]
    assert "<definitions>" in xml and "<reference-type>CALLS</reference-type>" in xml
    for caller in (
        "UsersController#destroy",
        "User#send_notification",
        "NotificationService::notify_all",
    ):
        assert f"<fqn>{caller}</fqn>" in xml, xml[:2000]
    # context carries real source text from the referencing file
    assert "NotificationService.notify" in xml
    assert "Found a total of" in row.system_message
    assert "Decision Framework:" in row.system_message


def test_get_references_xml_empty_branch(ruby_refs):
    """A definition with no references renders the empty document and the
    empty-branch decision framework (output.rs:11-18 empty())."""
    from knowledge_graph_spark.queries.shaping import get_references_xml

    row = get_references_xml(
        ruby_refs, "no_such_method_anywhere", "app/models/user.rb"
    ).collect()[0]
    assert row.n_results == 0 and row.next_page is None
    assert "<definitions>\n  </definitions>" in row.xml
    assert "No indexed references found" in row.system_message


def test_read_definitions_xml_bodies(ruby_refs):
    """read_definitions tool render (read_definitions/output.rs:28-50,
    service.rs:26-98): the requested definition's FULL body — its whole line
    span from the source — lands in <definition-body>."""
    from knowledge_graph_spark.queries.shaping import read_definitions_xml

    row = read_definitions_xml(
        ruby_refs, [("get_profile", "app/models/user.rb")]
    ).collect()[0]
    assert row.n_results == 1, row.xml[:500]
    assert "<name>get_profile</name>" in row.xml
    assert "Profile.find_by_user_id(id)" in row.xml  # the body's call line
    assert "Processed 1 definition requests, found 1 definitions." in row.system_message
    assert "Successfully read 1 definition bodies, 0 had errors." in row.system_message


def test_read_definitions_xml_empty(ruby_refs):
    """Unknown requests render the empty branch with its own framework."""
    from knowledge_graph_spark.queries.shaping import read_definitions_xml

    row = read_definitions_xml(
        ruby_refs, [("nope", "app/models/user.rb")]
    ).collect()[0]
    assert row.n_results == 0
    assert "found 0 definitions" in row.system_message
    assert "Verify that the definition names and file paths" in row.system_message


def test_get_definition_xml_resolves_call_site(ruby_refs):
    """get_definition tool render (get_definition/service.rs:30-228): the
    symbol at a call site resolves to its definition with id/fqn/span/cols,
    an is-ambiguous flag, and the full code span."""
    from knowledge_graph_spark.queries.shaping import get_definition_xml

    row = get_definition_xml(
        ruby_refs,
        "app/controllers/users_controller.rb",
        "profile = @user.get_profile",
        "get_profile",
    ).collect()[0]
    assert row.n_results == 1, row.xml[:600]
    assert "<type>Definition</type>" in row.xml
    assert "<fqn>User#get_profile</fqn>" in row.xml
    assert "<is-ambiguous>false</is-ambiguous>" in row.xml
    assert "Profile.find_by_user_id(id)" in row.xml  # code span content
    assert row.system_message == ""  # one line, one occurrence


def test_get_definition_xml_no_match(ruby_refs):
    """An unmatched line renders the empty document (service.rs:41-46)."""
    from knowledge_graph_spark.queries.shaping import get_definition_xml

    row = get_definition_xml(
        ruby_refs, "app/models/user.rb", "this line is nowhere", "nothing"
    ).collect()[0]
    assert row.n_results == 0
    assert "<definitions>\n  </definitions>" in row.xml


def test_search_xml_context_lines_java(java_main):
    """search_codebase_definitions.rs:447-556: searching 'main' over the
    java fixture renders the full document — Main class/method fqns with
    the real surrounding source (annotation, signature) in <context>, and
    no next-page token for a sub-page result set."""
    from knowledge_graph_spark.queries.shaping import search_definitions_xml

    row = search_definitions_xml(java_main, ["main"], page=1, page_size=50).collect()[0]
    xml = row.xml
    assert "<ToolResponse>" in xml and "<definitions>" in xml
    assert "<system-message>" in xml
    assert row.next_page is None and "<next-page>" not in xml
    assert "<definition>" in xml
    assert "<fqn>com.example.app.Main</fqn>" in xml
    assert "public class Main extends Application" in xml
    assert "<fqn>com.example.app.Main.main</fqn>" in xml
    assert "@Traceable" in xml
    assert "public void main() {" in xml


def test_search_xml_has_next_page_java(java_main):
    """search_codebase_definitions.rs:559+: a full page yields the
    next-page token; the following page renders and eventually drains."""
    from knowledge_graph_spark.queries.shaping import search_definitions_xml

    p1 = search_definitions_xml(java_main, ["e"], page=1, page_size=3).collect()[0]
    assert p1.n_results == 3 and p1.next_page == 2
    assert "<next-page>2</next-page>" in p1.xml
    assert "There are more results on page 2" in p1.system_message
    p2 = search_definitions_xml(java_main, ["e"], page=2, page_size=3).collect()[0]
    assert p2.n_results >= 1


def test_repo_map_xml_basic_depth2(ts_repo):
    """repo_map/tool.rs:317-352: depth-2 map over the TS fixture shows the
    nested files, class headers with source snippets, and the ASCII
    directory tree."""
    from knowledge_graph_spark.queries.shaping import repo_map_xml

    xml = repo_map_xml(ts_repo, depth=2, page=1, page_size=200).collect()[0].xml
    assert "app/models/user_model.ts" in xml
    assert "main.ts" in xml
    assert "export class BaseModel" in xml
    assert "export class UserModel" in xml
    assert "class Application" in xml
    assert "<directories>" in xml
    assert "├── app" in xml or "└── app" in xml


def test_repo_map_xml_flags_toggle(ts_repo):
    """repo_map/tool.rs:355-404: show_directories / show_definitions
    independently gate their blocks."""
    from knowledge_graph_spark.queries.shaping import repo_map_xml

    dirs_only = repo_map_xml(ts_repo, depth=2, show_definitions=False).collect()[0].xml
    assert "<directories>" in dirs_only and "<files>" not in dirs_only
    defs_only = repo_map_xml(ts_repo, depth=2, show_directories=False).collect()[0].xml
    assert "<directories>" not in defs_only and "<files>" in defs_only


def test_repo_map_xml_depth_respected(ts_repo):
    """repo_map/tool.rs:407-446: depth=1 excludes app/models files; depth=2
    includes them."""
    from knowledge_graph_spark.queries.shaping import repo_map_xml

    d1 = repo_map_xml(ts_repo, depth=1).collect()[0].xml
    assert "app/models/user_model.ts" not in d1
    d2 = repo_map_xml(ts_repo, depth=2).collect()[0].xml
    assert "app/models/user_model.ts" in d2


def test_repo_map_xml_snippet_dedup(ts_repo):
    """output.rs test_build_definitions_text_dedup_snippets: overlapping
    definition spans never reprint a source line within one file block."""
    from knowledge_graph_spark.queries.shaping import repo_map_xml

    xml = repo_map_xml(ts_repo, depth=2, page=1, page_size=200).collect()[0].xml
    block = xml.split("<path>app/models/base_model.ts</path>")[1].split("</file>")[0]
    line = "│ export class BaseModel {"
    assert block.count(line) == 1, block[:500]


# ---- Lambda / Proc definitions + the LAMBDA_TO_* edge family ---------------
# (relationship.rs:36-66; python/analyzer.rs:1084-1112;
#  ruby/analyzer.rs:214-218; java/analyzer.rs:222-252; kotlin/analyzer.rs:256)


def test_java_fixture_lambda_definition_and_edge(java_main):
    """fixtures/java Main.java:22 (0-based 21) `await(() -> super.run());`
    carries a real Java lambda: a Lambda definition node on that line whose
    hierarchy edge is METHOD_TO_LAMBDA from Main.main — while the call
    INSIDE it (super.run → Application.run) stays attributed to Main.main
    (java/tests.rs pins that caller at the same line)."""
    lams = java_main.definitions.filter(F.col("definition_type") == "Lambda")
    rows = lams.filter(F.col("primary_file_path").endswith("Main.java")).collect()
    assert len(rows) == 1 and rows[0].start_line == 21, rows
    de = java_main.edges["definition_relationships"]
    d = java_main.definitions.select("id", "fqn")
    pairs = {
        (r.caller, r.callee)
        for r in de.filter(F.col("type") == "METHOD_TO_LAMBDA")
        .join(d.withColumnsRenamed({"id": "source_id", "fqn": "caller"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "callee"}), "target_id")
        .collect()
    }
    assert ("com.example.app.Main.main", "com.example.app.Main.main.lambda_21_14") in pairs, pairs
    # the call inside the lambda still attributes to the METHOD (the
    # reference pins Main.main→Application.run at this line)
    assert ("Application::run", "Application::run") not in pairs


def test_ruby_blocks_are_not_lambdas(ruby_refs):
    """Plain `do |x| ... end` iterator blocks are NOT definitions — Block is
    not a RubyDefinitionType (ruby/analyzer.rs:248 comment); only
    lambda/->/proc/Proc.new forms are. The ruby-references fixture is full
    of do-blocks and has zero Lambda/Proc nodes."""
    n = ruby_refs.definitions.filter(
        F.col("definition_type").isin("Lambda", "Proc")
    ).count()
    assert n == 0


def test_ts_arrows_are_not_lambdas(ts_repo):
    """TypeScript has NO Lambda definition type (typescript.rs; the 84-count
    inventory in tests.rs:415-419 covers a fixture full of anonymous
    callbacks) — anonymous arrows must not emit definitions."""
    n = ts_repo.definitions.filter(
        F.col("definition_type").isin("Lambda", "Proc")
    ).count()
    assert n == 0


LAMBDA_GOLDEN_CORPUS = {
    "py/app.py": (
        "class H:\n"
        "    make = lambda s: s\n"
        "    def run(self):\n"
        "        f = lambda x: lambda y: x + y\n"
        "        pairs = sorted(xs, key=lambda a: a)\n"
    ),
    "rb/jobs.rb": (
        "class Jobs\n"
        "  GREET = lambda { |n| n }\n"
        "  PACK = proc { |x| x }\n"
        "  HOOK = Proc.new { |y| y }\n"
        "  def run\n"
        "    inner = ->(v) { v }\n"
        "  end\n"
        "end\n"
    ),
}


@pytest.fixture(scope="module")
def lambda_repo(spark, tmp_path_factory):
    return _index_corpus(spark, tmp_path_factory, LAMBDA_GOLDEN_CORPUS, "lambda-repo")


def _edge_types(kg) -> dict[tuple[str, str], str]:
    de = kg.edges["definition_relationships"]
    d = kg.definitions.select("id", "fqn")
    return {
        (r.p, r.c): r.type
        for r in de.filter(F.col("target_table") == "definition_nodes")
        .join(d.withColumnsRenamed({"id": "source_id", "fqn": "p"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "c"}), "target_id")
        .select("p", "c", "type")
        .collect()
    }


def test_python_lambda_fqns_and_edges(lambda_repo):
    """Python: class-attribute lambda → CLASS_TO_LAMBDA; method-local →
    METHOD_TO_LAMBDA; same-line nested lambda → LAMBDA_TO_LAMBDA with the
    outer lambda's FQN as its scope parent; sibling callback args do NOT
    nest (python/analyzer.rs:1084-1112 pair table)."""
    et = _edge_types(lambda_repo)
    assert et[("py.app.H", "py.app.H.lambda_1_11")] == "CLASS_TO_LAMBDA"
    assert et[("py.app.H.run", "py.app.H.run.lambda_3_12")] == "METHOD_TO_LAMBDA"
    assert (
        et[("py.app.H.run.lambda_3_12", "py.app.H.run.lambda_3_12.lambda_3_22")]
        == "LAMBDA_TO_LAMBDA"
    )
    # the sorted(key=...) lambda is a sibling of run, not of lambda_3_*
    assert et[("py.app.H.run", "py.app.H.run.lambda_4_31")] == "METHOD_TO_LAMBDA"


def test_ruby_lambda_proc_edges_and_method_suppression(lambda_repo):
    """Ruby: class-body lambda → CLASS_TO_LAMBDA, proc/Proc.new →
    CLASS_TO_PROC; the method-scoped arrow lambda emits a definition but NO
    hierarchy edge (ruby/analyzer.rs:203-235 maps only Class parents for
    Lambda/Proc children)."""
    et = _edge_types(lambda_repo)
    assert et[("Jobs", "Jobs::lambda_1_10")] == "CLASS_TO_LAMBDA"
    assert et[("Jobs", "Jobs::proc_2_9")] == "CLASS_TO_PROC"
    assert et[("Jobs", "Jobs::proc_3_9")] == "CLASS_TO_PROC"
    defs = {
        r.fqn
        for r in lambda_repo.definitions.filter(
            F.col("definition_type").isin("Lambda", "Proc")
        ).collect()
    }
    assert "Jobs::run::lambda_5_12" in defs  # definition exists...
    assert not any(c == "Jobs::run::lambda_5_12" for _, c in et)  # ...edge-less


# ---- Multi-line signatures (masking-pass continuation joining) -------------


MULTILINE_CORPUS = {
    "jv/Wide.java": (
        "package mx;\n"
        "public class Wide\n"
        "        extends Base {\n"
        "    public static java.util.Map<String, Integer>\n"
        "            countItems(java.util.List<String> items) {\n"
        "        return null;\n"
        "    }\n"
        "}\n"
        "class Base {\n"
        "    public void ping() {\n"
        "    }\n"
        "}\n"
    ),
    "cs/Big.cs": (
        "namespace mx;\n"
        "public class Big {\n"
        "    public virtual System.Collections.Generic.List<int>\n"
        "            Fetch(int id) {\n"
        "        return null;\n"
        "    }\n"
        "}\n"
    ),
    "kt/Wrap.kt": (
        "package mx\n"
        "class Wrap {\n"
        "    fun wrapped(\n"
        "        a: Int,\n"
        "        b: String\n"
        "    ): Int {\n"
        "        return a\n"
        "    }\n"
        "}\n"
    ),
}


@pytest.fixture(scope="module")
def multiline_repo(spark, tmp_path_factory):
    return _index_corpus(spark, tmp_path_factory, MULTILINE_CORPUS, "ml-repo")


def test_multiline_java_signature(multiline_repo):
    """A Java signature whose return type wraps BEFORE the member name
    extracts with start_line = the head line (the reference's tree-sitter
    nodes span the whole signature; parsing/processor.rs), and the wrapped
    `extends` clause still feeds the inheritance chain."""
    d = {
        r.fqn: r.start_line
        for r in multiline_repo.definitions.filter(
            F.col("primary_file_path").endswith(".java")
        ).collect()
    }
    assert d["mx.Wide.countItems"] == 3, d
    assert d["mx.Wide"] == 1
    # no phantom CALLS row from the continuation line (`countItems(...)`)
    pairs = _call_pairs(multiline_repo)
    assert ("mx.Wide.countItems", "mx.Wide.countItems") not in pairs


def test_multiline_csharp_signature(multiline_repo):
    d = {
        r.fqn: r.start_line
        for r in multiline_repo.definitions.filter(
            F.col("primary_file_path").endswith(".cs")
        ).collect()
    }
    # C# FQNs carry the module-path prefix before the namespace chain
    assert d["cs.Big.mx.Big.Fetch"] == 2, d


def test_multiline_kotlin_fun(multiline_repo):
    d = {
        r.fqn: r.start_line
        for r in multiline_repo.definitions.filter(
            F.col("primary_file_path").endswith(".kt")
        ).collect()
    }
    assert d["mx.Wrap.wrapped"] == 2, d


# ---- TypeScript named-expression folding (typescript.rs:286-303) -----------

_TS_NAMED_EXPR_SRC = {
    "web/store.ts": (
        "export const makeStore = () => {\n"
        "  return {};\n"
        "};\n"
        "const Registry = class {\n"
        "  register(): void {\n"
        "  }\n"
        "};\n"
        "const walk = function named(t: number) {\n"
        "  return t;\n"
        "};\n"
        "let gen = function* () {\n"
        "  yield 1;\n"
        "};\n"
        "export const api = createApi({ reducerPath: 'x' });\n"
        "const fetchUser = async (id: number): Promise<string> => {\n"
        "  return String(id);\n"
        "};\n"
    ),
}


@pytest.fixture(scope="module")
def ts_named_expr(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ts_named")
    for rel, content in _TS_NAMED_EXPR_SRC.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    return _index(spark, str(root))


def test_ts_named_arrow_folds_to_function(ts_named_expr):
    """NamedArrowFunction → Function under the declarator name
    (typescript.rs:294-296), including async + typed arrows."""
    defs = {
        r.name: r.definition_type
        for r in ts_named_expr.definitions.select("name", "definition_type").collect()
    }
    assert defs.get("makeStore") == "Function"
    assert defs.get("fetchUser") == "Function"


def test_ts_named_class_expression_folds_to_class(ts_named_expr):
    """NamedClassExpression → Class (typescript.rs:288-290); members inside
    the class expression body scope under the declarator name."""
    defs = {
        r.name: r.definition_type
        for r in ts_named_expr.definitions.select("name", "definition_type").collect()
    }
    assert defs.get("Registry") == "Class"


def test_ts_named_function_and_generator_expressions(ts_named_expr):
    """NamedFunctionExpression / NamedGeneratorFunctionExpression → Function,
    keyed by the DECLARATOR name, not the inner expression name
    (typescript.rs:291-293,297-299)."""
    defs = {
        r.name: r.definition_type
        for r in ts_named_expr.definitions.select("name", "definition_type").collect()
    }
    assert defs.get("walk") == "Function"
    assert defs.get("gen") == "Function"
    assert "named" not in defs  # the inner expression name is not a definition


def test_ts_named_call_expression_excluded(ts_named_expr):
    """`const api = createApi(...)` is NOT a definition: the reference's own
    84-definition inventory over fixtures/typescript/test-repo excludes
    const bindings of call expressions (tests.rs:369-454), and method bodies
    are full of them (`const index = storage.findIndex(...)`)."""
    names = {r.name for r in ts_named_expr.definitions.select("name").collect()}
    assert "api" not in names
    # exactly the six folded definitions + the class-expression method
    assert names == {"makeStore", "Registry", "register", "walk", "gen", "fetchUser"}


def test_python_decorated_defs_extract():
    """Decorator lines (incl. stacked and argumented decorators) must not
    hide the def they wrap: tree-sitter sees through `decorated_definition`
    nodes; the regex scan matches the `def` line itself, so decorators are
    inert prefix lines. Pins plain, stacked-argumented, and decorated
    methods inside a class."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src = (
        "import os\n\n"
        "@cache\n"
        "def plain(): pass\n\n"
        '@app.route("/x")\n'
        "@functools.lru_cache(maxsize=None)\n"
        "def routed(a, b):\n"
        "    return a + b\n\n"
        "class C:\n"
        "    @staticmethod\n"
        "    def sm(x):\n"
        "        return x\n\n"
        "    @property\n"
        "    def val(self):\n"
        "        return 1\n"
    )
    rows = list(_extract_one("t.py", "Python", src))
    defs = {(r[3], r[4]) for r in rows if r[2] == "definition"}
    assert ("plain", None) in defs
    assert ("routed", None) in defs
    assert ("C", None) in defs
    assert ("sm", "C") in defs
    assert ("val", "C") in defs
    # decorator names themselves must not leak as definitions
    names = {r[3] for r in rows if r[2] == "definition"}
    assert not {"cache", "route", "lru_cache", "staticmethod", "property"} & names


def test_ts_one_line_method_bodies_extract():
    """`render(): void {}` / `get x() { return this._x; }` are
    method_definition nodes in the reference's tree-sitter grammar even
    with the whole body on the signature line; the class-member scan must
    not require the opening brace to END the line. Control flow and call
    statements inside multi-line bodies must still not leak as methods."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src = (
        "class W {\n"
        "  render(): void {}\n"
        "  get x() { return this._x; }\n"
        "  big(): void {\n"
        "    if (this.flag) { return; }\n"
        "    items.forEach((i) => { handle(i); });\n"
        "  }\n"
        "}\n"
    )
    rows = list(_extract_one("t.ts", "TypeScript", src))
    defs = {(r[3], r[4]) for r in rows if r[2] == "definition"}
    assert defs == {("W", None), ("render", "W"), ("x", "W"), ("big", "W")}


def test_java_package_private_methods_extract():
    """Methods with NO access modifier (package-private: `void run()`,
    `int bits()` in an enum body) are method_declaration nodes like any
    other; statement lines (`return compute(x)`, `process(x);`) must not
    false-positive into the bare-method scan."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src = (
        "public class Outer {\n"
        "  enum Mode { A, B;\n"
        "    int bits() { return compute(1); }\n"
        "  }\n"
        "  static class Nested {\n"
        "    void run(String... args) {\n"
        "      int x = compute(args.length);\n"
        "      process(x);\n"
        "    }\n"
        "    Map<String, Integer> tally() { return null; }\n"
        "  }\n"
        "}\n"
    )
    rows = list(_extract_one("Outer.java", "Java", src))
    defs = {r[3] for r in rows if r[2] == "definition"}
    assert {"Outer", "Mode", "bits", "Nested", "run", "tally"} <= defs
    calls = {r[3] for r in rows if r[2] == "call"}
    assert {"compute", "process"} <= calls
    assert not {"compute", "process", "x"} & defs


def test_csharp_modifierless_members_extract():
    """C# members without modifiers are implicitly private, still
    method_declaration nodes (`int Bits() => 1;`); statement calls and
    `var` declarations stay calls."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src = (
        "namespace App;\n"
        "public class Repo {\n"
        "  int Bits() => 1;\n"
        "  Task<int> CountAsync() => Task.FromResult(1);\n"
        "  string Render(int n) {\n"
        "    var s = Helper(n);\n"
        "    return s;\n"
        "  }\n"
        "}\n"
    )
    rows = list(_extract_one("t.cs", "CSharp", src))
    defs = {r[3] for r in rows if r[2] == "definition"}
    assert {"Repo", "Bits", "CountAsync", "Render"} <= defs
    assert "Helper" not in defs


def test_java_annotation_type_and_ts_const_enum():
    """`public @interface Marker {}` is an annotation_type_declaration —
    the reference simplifies JavaDefinitionType::AnnotationDeclaration to
    CLASS (java/analyzer.rs:276, r8 kind audit; an earlier round pinned
    Interface from the tree-sitter node name, which was wrong at the
    indexing layer). `export const enum Dir {` is still an
    enum_declaration. Variable declarators named like keywords
    (`const namespace = x`) must not false-positive."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    jv = list(
        _extract_one(
            "A.java",
            "Java",
            "public class A {\n  public @interface Marker {}\n}\n",
        )
    )
    assert ("Marker", "Class") in {
        (r[3], r[5]) for r in jv if r[2] == "definition"
    }
    ts = list(
        _extract_one(
            "t.ts",
            "TypeScript",
            "export const enum Dir { Up }\nconst namespace = x;\n",
        )
    )
    defs = {r[3] for r in ts if r[2] == "definition"}
    assert "Dir" in defs and "namespace" not in defs


def test_ts_import_forms():
    """Type-only imports must not leak a bogus 'type' default binding;
    namespace imports map to the '*'+alias wildcard convention; re-exports
    (`export {a as b} from`, `export * from`) ARE imports for re-export
    chain resolution (J8)."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src = (
        'import type { Foo } from "./foo";\n'
        'import * as path from "path";\n'
        'import Def, { a, b as c } from "./mixed";\n'
        'export { renamed as publicName } from "./impl";\n'
        'export * from "./everything";\n'
    )
    imps = {
        (r[3], r[6], r[7])
        for r in _extract_one("t.ts", "TypeScript", src)
        if r[2] == "import"
    }
    assert ("Foo", "./foo", None) in imps
    assert ("*", "path", "path") in imps
    assert ("Def", "./mixed", None) in imps
    assert ("b", "./mixed", "c") in imps
    assert ("renamed", "./impl", "publicName") in imps
    assert ("*", "./everything", None) in imps
    assert "type" not in {n for n, _, _ in imps}


def test_import_alias_forms_kotlin_csharp_rust():
    """Alias clauses must survive into the import row (resolution matches
    receivers on coalesce(alias, name)): Kotlin `import a.b.C as D`,
    C# `using Alias = Some.Deep.Type;` (+ `global using`), Rust
    `use p::T as U`."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    def imps(path, lang, src):
        return {
            (r[3], r[6], r[7])
            for r in _extract_one(path, lang, src)
            if r[2] == "import"
        }

    kt = imps("t.kt", "Kotlin", "import a.b.C as D\nimport x.y.Z\n")
    assert ("C", "a.b", "D") in kt and ("Z", "x.y", None) in kt
    cs = imps(
        "t.cs",
        "CSharp",
        "using Alias = Some.Deep.Type;\nglobal using System.Text;\n",
    )
    assert ("Type", "Some.Deep", "Alias") in cs
    assert ("Text", "System", None) in cs
    rs = imps("t.rs", "Rust", "use std::collections::HashMap as Map;\n")
    assert ("HashMap", "std::collections", "Map") in rs


def test_python_super_calls_resolve_to_parent(spark, tmp_path):
    """`super().m()` resolves into the parent class like Java's
    `super.m()` (the zero-arg super form is by far the common one):
    A.m -> Base.base_m must land as a def->def CALLS edge."""
    root = tmp_path / "superrepo"
    root.mkdir()
    (root / "mod.py").write_text(
        "class Base:\n"
        "    def base_m(self):\n"
        "        return 1\n"
        "\n"
        "class A(Base):\n"
        "    def m(self):\n"
        "        return super().base_m()\n"
    )
    from knowledge_graph_spark.pipeline.indexer import index_repository

    kg, _ = index_repository(spark, str(root), repository_name="superrepo")
    from pyspark.sql import functions as F

    d = kg.definitions.select("id", "fqn")
    edges = (
        kg.edges["definition_relationships"]
        .filter(F.col("type").isin("CALLS", "AMBIGUOUSLY_CALLS"))
        .join(d.withColumnRenamed("id", "source_id").withColumnRenamed("fqn", "src"), "source_id")
        .join(d.withColumnRenamed("id", "target_id").withColumnRenamed("fqn", "dst"), "target_id")
        .select("src", "dst")
        .collect()
    )
    assert ("mod.A.m", "mod.Base.base_m") in {(r.src, r.dst) for r in edges}


def test_param_typed_receivers_and_safe_navigation():
    """Declared parameter types seed the local-type map (`fun run(u: User)`
    / `void run(User u)` / `def m(self, user: User)`), and safe-navigation
    operators (`?.`, `!!.`, `&.`) are transparent — both resolve receiver
    calls the plain constructor-assignment path already resolves."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    def calls(path, lang, src):
        return {(r[3], r[4]) for r in _extract_one(path, lang, src) if r[2] == "call"}

    kt = calls(
        "t.kt",
        "Kotlin",
        "package p\nclass Main {\n    fun run(u: User?) {\n        u?.getName()\n        u!!.refresh()\n    }\n}\n",
    )
    assert ("getName", "p.Main.run") in kt and ("refresh", "p.Main.run") in kt
    jv = calls(
        "Main.java",
        "Java",
        "public class Main {\n  void run(User u, Map<String, Integer> counts) {\n    u.activate();\n    counts.put(\"k\", 1);\n  }\n}\n",
    )
    assert ("activate", "Main.Main.run") in jv and ("put", "Main.Main.run") in jv
    py = calls(
        "t.py",
        "Python",
        "class Main:\n    def run(self, user: User):\n        user.activate()\n",
    )
    assert ("activate", "Main.run") in py
    ts = calls(
        "t.ts",
        "TypeScript",
        "class App {\n  svc: Svc;\n  go(s: Svc): void {\n    s.load();\n    this.svc?.push();\n  }\n}\n",
    )
    assert ("load", "App.go") in ts and ("push", "App.go") in ts
    rb = calls(
        "t.rb",
        "Ruby",
        "class Main\n  def run\n    @user = User.new\n    @user&.name\n  end\nend\n",
    )
    assert ("name", "Main.run") in rb


def test_one_hop_chain_calls_resolve():
    """`u.name().shout()` — the tail's receiver is the mid call's DECLARED
    return type (per-file pre-scan; Ruby infers the `def profile;
    Profile.new; end` factory idiom instead since it has no annotations).
    One hop only, matching the reference's navigation-expression typing."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    def calls(path, lang, src):
        return {(r[3], r[4]) for r in _extract_one(path, lang, src) if r[2] == "call"}

    kt = calls(
        "t.kt",
        "Kotlin",
        "package p\nclass Name {\n    fun shout(): String = \"\"\n}\n"
        "class User {\n    fun name(): Name = Name()\n}\n"
        "class Main {\n    fun run(u: User) {\n        u.name().shout()\n    }\n}\n",
    )
    assert ("shout", "p.Main.run") in kt
    jv = calls(
        "P.java",
        "Java",
        "public class Conn { void close() {} }\n"
        "public class Pool {\n  Conn acquire() { return null; }\n"
        "  void run(Pool p) {\n    p.acquire().close();\n  }\n}\n",
    )
    assert ("close", "P.Pool.run") in jv
    py = calls(
        "t.py",
        "Python",
        "class Conn:\n    def close(self): pass\n\n"
        "class Pool:\n    def acquire(self) -> Conn:\n        return Conn()\n\n"
        "    def run(self, p: Pool):\n        p.acquire().close()\n",
    )
    assert ("close", "Pool.run") in py
    ts = calls(
        "t.ts",
        "TypeScript",
        "class Store {\n  save(): void {\n    flush();\n  }\n}\n"
        "class Factory {\n  make(): Store {\n    return new Store();\n  }\n"
        "  use(f: Factory): void {\n    f.make().save();\n  }\n}\n",
    )
    assert ("save", "Factory.use") in ts
    rb = calls(
        "t.rb",
        "Ruby",
        "class Profile\n  def display_name; end\nend\n"
        "class User\n  def profile\n    Profile.new\n  end\nend\n"
        "class Main\n  def run\n    user = User.new\n    user.profile.display_name\n  end\nend\n",
    )
    assert ("display_name", "Main.run") in rb


def test_chain_tail_super_cycle_terminates():
    """Supers are keyed by LAST dotted segment, so `class Foo(proto.Foo)`
    self-maps and cross-namespace pairs (`class A(ns.B)` + `class B(o.A)`)
    cycle — the chain-tail super climb must terminate, not hang the whole
    distributed extract stage on one such source file."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src = (
        "class Foo(proto.Foo):\n"
        "    def run(self, f: Factory):\n"
        "        f.clone().start()\n"
    )
    rows = list(_extract_one("cycle.py", "Python", src))  # must not hang
    assert any(r[2] == "definition" for r in rows)
    src2 = (
        "class A(ns.B):\n    pass\n\n"
        "class B(other.A):\n"
        "    def go(self, f: F):\n"
        "        f.make().use()\n"
    )
    assert list(_extract_one("cycle2.py", "Python", src2)) is not None


def test_safe_navigation_preserves_source_columns():
    """Normalizing `?.`/`!!.`/`&.`/`super().` to a plain dot DELETES chars —
    emitted columns/byte offsets must map back to the ORIGINAL source
    position (build.py dedups on start_byte; the reference's call locations
    are exact)."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    def call_sites(path, lang, src):
        lines = src.split("\n")
        return {
            (r[3], lines[r[8]][r[10]:r[11]])
            for r in _extract_one(path, lang, src)
            if r[2] == "call"
        }

    ts = call_sites(
        "t.ts",
        "TypeScript",
        "class C {\n  go(u: User): void {\n    u?.save()\n    u!!.flush()\n  }\n}\n",
    )
    assert ("save", "save") in ts and ("flush", "flush") in ts
    rb = call_sites(
        "t.rb",
        "Ruby",
        "class C\n  def go\n    @u = User.new\n    @u&.save\n  end\nend\n",
    )
    assert ("save", "save") in rb
    py = call_sites(
        "t.py",
        "Python",
        "class B:\n    def save(self): pass\n\n"
        "class C(B):\n    def go(self):\n        super().save()\n",
    )
    assert ("save", "save") in py


def test_csharp_pascal_case_chain_tail_resolves():
    """C# methods are PascalCase — `p.Acquire().Close()` must resolve the
    tail through the Acquire return-type scan (the lowercase-only tail
    pattern could never match it)."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src = (
        "namespace N {\n"
        "  class Conn { public void Close() {} }\n"
        "  class Pool {\n"
        "    public Conn Acquire() { return new Conn(); }\n"
        "    public void Run(Pool p) {\n"
        "      p.Acquire().Close();\n"
        "    }\n"
        "  }\n"
        "}\n"
    )
    calls = {(r[3], r[14]) for r in _extract_one("p.cs", "CSharp", src) if r[2] == "call"}
    assert ("Close", "Conn") in calls


def test_ts_field_and_return_scans_guarded_by_class_frame():
    """Object-literal properties / multi-line call params must NOT pollute
    the per-file field-type map, and a call statement shaped like a method
    signature (`register(h, (x): Config => {`) must NOT register a bogus
    return type that fabricates chain-tail CALLS edges."""
    from knowledge_graph_spark.pipeline.extract import (
        _extract_one,
        _mask_text,
        _scan_method_returns,
    )

    # object-literal property `user: User` at top level — not a class field;
    # `this.user` inside the class must stay untyped (no fabricated edge)
    src = (
        "const cfg = {\n"
        "  user: User,\n"
        "};\n"
        "class App {\n"
        "  go(): void {\n"
        "    this.user.save();\n"
        "  }\n"
        "}\n"
    )
    calls = {r[3] for r in _extract_one("t.ts", "TypeScript", src) if r[2] == "call"}
    assert "save" not in calls  # receiver type unknown → dropped, not faked
    # a call statement inside a function body matching _TS_METHOD must not
    # enter the method-returns map
    src2 = (
        "function setup(): void {\n"
        "  register(handler, (x): Config => {\n"
        "    return x;\n"
        "  });\n"
        "}\n"
        "class Svc {\n"
        "  fetch(): Config {\n"
        "    return load();\n"
        "  }\n"
        "}\n"
    )
    rets = _scan_method_returns("TypeScript", _mask_text("TypeScript", src2))
    assert ("Svc", "fetch") in rets
    assert all(m != "register" for (_t, m) in rets)


# ---- TS call locations + fixtures/java-user-service deep pins (r6) ---------
# (indexer tests.rs:454 test_typescript_call_relationship_has_location;
#  mcp import_usage tool fixtures; verdict-r5 #7 sweep)

TS_TEST_REPO = "/root/reference/fixtures/typescript/test-repo"


@pytest.fixture(scope="module")
def ts_test_repo(spark):
    return _index(spark, TS_TEST_REPO)


def _call_sites(kg):
    """(caller, callee, start_line, start_col) for def→def calls."""
    de = kg.edges["definition_relationships"]
    refs = de.filter(
        F.col("type").isin(["CALLS", "AMBIGUOUSLY_CALLS"])
        & (F.col("target_table") == "definition_nodes")
    )
    d = kg.definitions.select("id", "fqn")
    rows = (
        refs.join(d.withColumnsRenamed({"id": "source_id", "fqn": "caller"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "callee"}), "target_id")
        .select("caller", "callee", "source_start_line", "source_start_col")
        .collect()
    )
    return {(r.caller, r.callee): (r.source_start_line, r.source_start_col) for r in rows}


def test_ts_call_relationship_has_exact_location(ts_test_repo):
    """tests.rs:454 asserts Application::run → Application::
    testAuthenticationProviders carries source_start_line == the `this.…()`
    statement's 0-based line (21 there, AFTER the test prepends two import
    lines; the raw fixture places it at line 19). Pinning line AND column
    guards the safe-navigation shift-map too."""
    sites = _call_sites(ts_test_repo)
    key = ("Application::run", "Application::testAuthenticationProviders")
    assert key in sites, sorted(k for k in sites if k[0] == "Application::run")
    line, col = sites[key]
    assert (line, col) == (19, 9), (line, col)
    # the three sibling statements sit on consecutive lines, same column
    for callee, ln in (
        ("Application::createSampleUsers", 16),
        ("Application::testAuthentication", 17),
        ("Application::testTokenManagement", 18),
    ):
        assert sites[("Application::run", callee)] == (ln, 9)


def test_ts_main_imported_symbols_sorted(ts_test_repo):
    """tests.rs:440-450 sorts main.ts's imported symbols by start_line and
    asserts the count — the raw fixture declares exactly 3 named imports on
    0-based lines 2-4."""
    rows = (
        ts_test_repo.imports.filter(F.col("file_path").endswith("main.ts"))
        .orderBy("start_line")
        .select("name", "import_path", "start_line")
        .collect()
    )
    assert [(r.name, r.import_path, r.start_line) for r in rows] == [
        ("Authentication", "./lib/authentication", 2),
        ("UserManagement", "./lib/user_management", 3),
        ("UserModel", "./app/models/user_model", 4),
    ]


def test_java_user_service_controller_to_service_calls(java_user_service):
    """All five REST endpoints dispatch into UserService through the
    @Autowired field's declared type (the import_usage fixture's central
    relationship set)."""
    pairs = _call_pairs(java_user_service)
    svc = "com.example.userservice.service.UserService"
    ctl = "com.example.userservice.controller.UserController"
    for m in ("getAllUsers", "getUserById", "createUser", "updateUser", "deleteUser"):
        assert (f"{ctl}.{m}", f"{svc}.{m}") in pairs, sorted(
            p for p in pairs if p[0].startswith(ctl)
        )


def test_java_user_service_param_typed_model_calls(java_user_service):
    """@RequestBody User user → user.getUsername() resolves through the
    parameter's declared type to the model's getter; UserService.updateUser
    resolves the userDetails-typed getters the same way."""
    pairs = _call_pairs(java_user_service)
    model = "com.example.userservice.model.User"
    assert (
        "com.example.userservice.controller.UserController.createUser",
        f"{model}.getUsername",
    ) in pairs
    upd = "com.example.userservice.service.UserService.updateUser"
    for getter in ("getEmail", "getFirstName", "getLastName"):
        assert (upd, f"{model}.{getter}") in pairs, sorted(
            c for _s, c in pairs if _s == upd
        )


def test_ruby_bang_method_and_typed_ivar_resolution(ruby_refs):
    """UsersController#activate → User#activate! (bang-suffixed method
    name preserved) and #update → User#update_profile through the @user
    ivar's tracked type (ruby/tests.rs controller-actions block)."""
    pairs = _call_pairs(ruby_refs)
    assert ("UsersController#activate", "User#activate!") in pairs, sorted(
        p for p in pairs if p[0].startswith("UsersController")
    )
    assert ("UsersController#update", "User#update_profile") in pairs
    assert ("UsersController#show", "User#get_profile") in pairs


def test_python_extractor_agrees_with_stdlib_ast():
    """Cross-validate the regex extractor against a REAL parser: the
    container ships no tree-sitter, but Python can parse Python — every
    ClassDef/FunctionDef/AsyncFunctionDef stdlib `ast` finds must be
    extracted with the same name on the same 0-based line. Runs over the
    synthetic pipeline corpus (the text every golden-count oracle is pinned
    on) plus a handcrafted stress file."""
    import ast as pyast

    from knowledge_graph_spark.pipeline.extract import _extract_one
    from knowledge_graph_spark.pipeline.synthetic import _file_text

    sources = {
        f"corpus_{i}_v{v}.py": _file_text(i, i + 1, v)
        for i in (0, 3, 7, 10, 15)
        for v in (1, 2)
    }
    sources["stress.py"] = (
        "import os\n"
        "\n"
        "@decorator\n"
        "@other.decorator(arg=1)\n"
        "def decorated():\n"
        "    pass\n"
        "\n"
        "async def fetch_all(\n"
        "    url: str,\n"
        "    timeout: float = 1.0,\n"
        ") -> list:\n"
        "    return []\n"
        "\n"
        "class Outer:\n"
        "    class Inner:\n"
        "        def method(self):\n"
        "            def local_helper():\n"
        "                return 1\n"
        "            return local_helper()\n"
        "\n"
        "    @staticmethod\n"
        "    def static_method():\n"
        "        return 2\n"
        "\n"
        "def trailing(x, *args, **kwargs):\n"
        "    if x:\n"
        "        def conditional():\n"
        "            return x\n"
        "        return conditional\n"
        "    return None\n"
    )
    for path, src in sources.items():
        tree = pyast.parse(src)
        expected = {
            (n.name, n.lineno - 1)
            for n in pyast.walk(tree)
            if isinstance(n, (pyast.ClassDef, pyast.FunctionDef, pyast.AsyncFunctionDef))
        }
        got = {
            (r[3], r[8])
            for r in _extract_one(path, "Python", src)
            if r[2] == "definition"
        }
        missing = expected - got
        assert not missing, (path, sorted(missing), sorted(got))


def test_rust_variants_unions_and_method_kinds(spark, tmp_path_factory):
    """Rust kind parity (rust.rs relationship table): enum variants are
    definitions whose enum edge REUSES CLASS_TO_METHOD; `union` declares a
    type; fns hosted in a type/impl body are Methods, free fns stay
    Functions."""
    corpus = {
        "src/conn.rs": (
            "pub enum Mode { Fast, Slow }\n"
            "pub enum Packet {\n"
            "    Ping,\n"
            "    Data(u32),\n"
            "    Eof = 3,\n"
            "}\n"
            "pub union Raw { a: u32, b: f32 }\n"
            "pub struct Conn;\n"
            "impl Conn {\n"
            "    pub fn new() -> Conn { Conn }\n"
            "    pub fn close(&self) {}\n"
            "}\n"
            "pub fn helper() {}\n"
        ),
    }
    kg = _index_corpus(spark, tmp_path_factory, corpus, "rs-kinds")
    # Rust FQNs are module-path-prefixed (src.conn.Mode.Fast) — key by the
    # path-free suffix
    kinds = {
        r.fqn.split("conn.", 1)[-1]: r.definition_type
        for r in kg.definitions.select("fqn", "definition_type").collect()
    }
    assert kinds["Mode.Fast"] == "Variant" and kinds["Mode.Slow"] == "Variant"
    assert kinds["Packet.Ping"] == "Variant"
    assert kinds["Packet.Data"] == "Variant"
    assert kinds["Packet.Eof"] == "Variant"
    assert kinds["Raw"] == "Class"
    assert kinds["Conn.new"] == "Method"  # associated fn — same edge family
    assert kinds["Conn.close"] == "Method"
    assert kinds["helper"] == "Function"
    # enum→variant hierarchy edge reuses CLASS_TO_METHOD (rust.rs:295-301)
    de = kg.edges["definition_relationships"]
    d = kg.definitions.select("id", "fqn")
    edges = {
        (r.src.split("conn.", 1)[-1], r.tgt.split("conn.", 1)[-1], r.type)
        for r in de.join(d.withColumnsRenamed({"id": "source_id", "fqn": "src"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "tgt"}), "target_id")
        .select("src", "tgt", "type")
        .collect()
    }
    assert ("Mode", "Mode.Fast", "CLASS_TO_METHOD") in edges, sorted(edges)[:20]
    assert ("Packet", "Packet.Data", "CLASS_TO_METHOD") in edges
    assert not any(t == "CLASS_TO_VARIANT" for _s, _t2, t in edges)


def test_java_kotlin_enum_entries_extract():
    """Enum members are definitions: Java EnumConstants (several per line,
    ctor args, `;`-terminated section) with the package-private constructor
    AFTER the `;` read as a Constructor-family definition rather than a
    call; Kotlin EnumEntries (annotated, arg-bearing, one-line bodies) —
    both edge to CLASS_TO_ENUM_ENTRY (java/analyzer.rs:216,
    kotlin/analyzer.rs:230)."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    jv = list(_extract_one(
        "Color.java", "Java",
        "package p;\n"
        "public enum Color {\n"
        "    RED(0xFF0000), GREEN, BLUE;\n"
        "    private final int code;\n"
        "    Color(int code) { this.code = code; }\n"
        "    public int getCode() { return code; }\n"
        "}\n",
    ))
    kinds = {(r[3], r[5]) for r in jv if r[2] == "definition"}
    assert {("RED", "EnumConstant"), ("GREEN", "EnumConstant"), ("BLUE", "EnumConstant")} <= kinds
    assert ("Color", "Method") in kinds  # the package-private constructor
    assert not any(r[2] == "call" and r[3] == "Color" for r in jv)

    kt = list(_extract_one(
        "D.kt", "Kotlin",
        "package p\n"
        "enum class Direction(val deg: Int) {\n"
        "    NORTH(0),\n"
        "    @Deprecated SOUTH(180),\n"
        "    EAST(90);\n"
        "    fun turn() {}\n"
        "}\n"
        "enum class Tiny { A, B }\n",
    ))
    kk = {(r[3], r[4], r[5]) for r in kt if r[2] == "definition"}
    assert ("NORTH", "p.Direction", "EnumEntry") in kk
    assert ("SOUTH", "p.Direction", "EnumEntry") in kk
    assert ("EAST", "p.Direction", "EnumEntry") in kk
    assert ("turn", "p.Direction", "Function") in kk  # past the `;`
    assert ("A", "p.Tiny", "EnumEntry") in kk and ("B", "p.Tiny", "EnumEntry") in kk
    assert ("Deprecated", "p.Direction", "EnumEntry") not in kk  # annotation


def test_enum_entry_edges_class_to_enum_entry(spark, tmp_path_factory):
    """The hierarchy edge for Java EnumConstant / Kotlin EnumEntry is
    CLASS_TO_ENUM_ENTRY in both languages (Java via the override map,
    Kotlin via natural snake-casing)."""
    corpus = {
        "p/Color.java": (
            "package p;\n"
            "public enum Color {\n    RED, GREEN;\n}\n"
        ),
        "p/Dir.kt": (
            "package p\n"
            "enum class Dir { UP, DOWN }\n"
        ),
    }
    kg = _index_corpus(spark, tmp_path_factory, corpus, "enum-edges")
    de = kg.edges["definition_relationships"]
    d = kg.definitions.select("id", "fqn")
    edges = {
        (r.src.split(".")[-1], r.tgt.split(".")[-1], r.type)
        for r in de.join(d.withColumnsRenamed({"id": "source_id", "fqn": "src"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "tgt"}), "target_id")
        .select("src", "tgt", "type").collect()
    }
    assert ("Color", "RED", "CLASS_TO_ENUM_ENTRY") in edges, sorted(edges)[:20]
    assert ("Dir", "UP", "CLASS_TO_ENUM_ENTRY") in edges


def test_enum_entry_payloads_are_not_definitions():
    """Capitalized identifiers INSIDE an entry's payload are not members:
    Rust `Payload(HashMap<String, Value>),` must not emit a `String`
    Variant, `Pair(A, B),` no `A`/`B`, Java `RED(new Hue(255)),` no `Hue`
    constant — tree-sitter surfaces only enum_variant / enum_constant
    nodes (rust.rs:295, java/analyzer.rs:216). ADVICE r7 repro."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    rs = list(_extract_one(
        "m.rs", "Rust",
        "pub enum Msg {\n"
        "    Payload(HashMap<String, Value>),\n"
        "    Pair(A, B),\n"
        "    #[serde(rename = \"x\")] Tagged(u32),\n"
        "    Plain,\n"
        "}\n",
    ))
    defs = {r[3] for r in rs if r[2] == "definition"}
    assert defs == {"Msg", "Payload", "Pair", "Tagged", "Plain"}, defs

    jv = list(_extract_one(
        "E.java", "Java",
        "package p;\n"
        "public enum Hue {\n"
        "    RED(new Hue(255)), GREEN;\n"
        "}\n",
    ))
    jdefs = {(r[3], r[5]) for r in jv if r[2] == "definition"}
    assert ("RED", "EnumConstant") in jdefs and ("GREEN", "EnumConstant") in jdefs
    assert ("Hue", "EnumConstant") not in jdefs  # payload ctor arg
    assert ("Hue", "Class") in jdefs  # the enum itself keeps its row


def test_rust_trait_default_methods_are_methods(spark, tmp_path_factory):
    """Trait-hosted fns (default methods AND required signatures) are kind
    Method with a CLASS_TO_METHOD hierarchy edge — rust.rs:299-304 maps
    Trait→Method to ClassToMethod, not InterfaceToMethod. ADVICE r7."""
    corpus = {
        "src/greet.rs": (
            "pub trait Greet {\n"
            "    fn hello(&self) { println!(\"hi\"); }\n"
            "    fn name(&self) -> String;\n"
            "}\n"
            "pub fn free() {}\n"
        ),
    }
    kg = _index_corpus(spark, tmp_path_factory, corpus, "rs-trait")
    kinds = {
        r.fqn.split("greet.", 1)[-1]: r.definition_type
        for r in kg.definitions.select("fqn", "definition_type").collect()
    }
    assert kinds["Greet"] == "Interface"
    assert kinds["Greet.hello"] == "Method"
    assert kinds["Greet.name"] == "Method"
    assert kinds["free"] == "Function"
    de = kg.edges["definition_relationships"]
    d = kg.definitions.select("id", "fqn")
    edges = {
        (r.src.split("greet.", 1)[-1], r.tgt.split("greet.", 1)[-1], r.type)
        for r in de.join(d.withColumnsRenamed({"id": "source_id", "fqn": "src"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "tgt"}), "target_id")
        .select("src", "tgt", "type").collect()
    }
    assert ("Greet", "Greet.hello", "CLASS_TO_METHOD") in edges, sorted(edges)[:20]
    assert ("Greet", "Greet.name", "CLASS_TO_METHOD") in edges
    assert not any(t == "INTERFACE_TO_FUNCTION" for _s, _t2, t in edges)
    assert not any("ENUM_CONSTANT" in t for _a, _b, t in edges)


def test_csharp_delegate_and_event_simplification():
    """csharp.rs:276-292 simplify rules: Delegate indexes as a Class
    definition; Event (and Field) simplify to None and must NOT extract."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src = (
        "namespace N {\n"
        "  public delegate void Handler(int x);\n"
        "  public class Bus {\n"
        "    public event Handler Changed;\n"
        "    public void Fire() { }\n"
        "  }\n"
        "}\n"
    )
    defs = {(r[3], r[5]) for r in _extract_one("b.cs", "CSharp", src) if r[2] == "definition"}
    assert ("Handler", "Class") in defs
    assert ("Bus", "Class") in defs and ("Fire", "Method") in defs
    assert all(n != "Changed" for n, _k in defs)  # events are not indexed


def test_kotlin_property_definitions():
    """KotlinDefinitionType::Property is a first-class indexed kind
    (kotlin/analyzer.rs:221-245,300): class-body and top-level val/var are
    Property definitions (incl. receiver-free extension properties);
    function-body vals are LocalVariable there and simplify to None —
    not extracted."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src = (
        "package corp.app\n"
        "class Config {\n"
        "    val kind: String = \"a\"\n"
        "    private var count = 0\n"
        "    fun get(): String {\n"
        "        val local = kind\n"
        "        return local\n"
        "    }\n"
        "}\n"
        "val topLevel = Config()\n"
        "val Config.twin: Config\n"
        "    get() = Config()\n"
        "interface I {\n"
        "    val required: Int\n"
        "}\n"
    )
    defs = {
        (r[3], r[4], r[5]) for r in _extract_one("C.kt", "Kotlin", src) if r[2] == "definition"
    }
    assert ("kind", "corp.app.Config", "Property") in defs
    assert ("count", "corp.app.Config", "Property") in defs
    assert ("topLevel", "corp.app", "Property") in defs  # effective top-level parent
    assert ("twin", "corp.app", "Property") in defs      # receiver-free ext property
    assert ("required", "corp.app.I", "Property") in defs
    assert all(n != "local" for n, _p, _k in defs)  # function body → LocalVariable → None


def test_kotlin_property_hierarchy_edges(spark, tmp_path_factory):
    """Class→Property is CLASS_TO_PROPERTY, Interface→Property is
    INTERFACE_TO_PROPERTY (kotlin/analyzer.rs:221,243)."""
    corpus = {
        "p/M.kt": (
            "package p\n"
            "class Box {\n"
            "    val size: Int = 1\n"
            "}\n"
            "interface Shape {\n"
            "    val area: Int\n"
            "}\n"
        ),
    }
    kg = _index_corpus(spark, tmp_path_factory, corpus, "kt-props")
    de = kg.edges["definition_relationships"]
    d = kg.definitions.select("id", "fqn")
    edges = {
        (r.src.split(".")[-1], r.tgt.split(".")[-1], r.type)
        for r in de.join(d.withColumnsRenamed({"id": "source_id", "fqn": "src"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "tgt"}), "target_id")
        .select("src", "tgt", "type").collect()
    }
    assert ("Box", "size", "CLASS_TO_PROPERTY") in edges, sorted(edges)[:20]
    assert ("Shape", "area", "INTERFACE_TO_PROPERTY") in edges


def test_kotlin_object_simplifies_to_class_and_method_edges(spark, tmp_path_factory):
    """kotlin/analyzer.rs:293-294: Object and CompanionObject simplify to
    Class; kotlin/analyzer.rs:218-219,240-241: a Function hosted in a
    class/interface edges as CLASS_TO_METHOD / INTERFACE_TO_METHOD (never
    the generic CLASS_TO_FUNCTION). Ruby/Rust modules keep Module."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    kinds = {
        (r[3], r[5])
        for r in _extract_one(
            "T.kt", "Kotlin",
            "package p\nobject Tool {\n    fun run() {}\n}\n"
            "class C {\n    companion object {\n        fun make() {}\n    }\n}\n",
        )
        if r[2] == "definition"
    }
    assert ("Tool", "Class") in kinds and ("Companion", "Class") in kinds
    rb = {
        (r[3], r[5])
        for r in _extract_one("m.rb", "Ruby", "module Util\n  def self.go; end\nend\n")
        if r[2] == "definition"
    }
    assert ("Util", "Module") in rb  # Ruby modules are REAL modules

    corpus = {
        "p/S.kt": (
            "package p\n"
            "class Svc {\n    fun run() {}\n}\n"
            "interface Api {\n    fun call()\n}\n"
            "object Tool {\n    fun go() {}\n}\n"
        ),
    }
    kg = _index_corpus(spark, tmp_path_factory, corpus, "kt-objedges")
    de = kg.edges["definition_relationships"]
    d = kg.definitions.select("id", "fqn")
    edges = {
        (r.src.split(".")[-1], r.tgt.split(".")[-1], r.type)
        for r in de.join(d.withColumnsRenamed({"id": "source_id", "fqn": "src"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "tgt"}), "target_id")
        .select("src", "tgt", "type").collect()
    }
    assert ("Svc", "run", "CLASS_TO_METHOD") in edges, sorted(edges)[:20]
    assert ("Api", "call", "INTERFACE_TO_METHOD") in edges
    assert ("Tool", "go", "CLASS_TO_METHOD") in edges  # object → Class
    assert not any(t in ("CLASS_TO_FUNCTION", "MODULE_TO_FUNCTION") for _a, _b, t in edges)


def test_kotlin_constructor_kinds():
    """KotlinDefinitionType::Constructor (r7, verdict task 2): secondary
    `constructor(...)` declarations extract as `<init>` Constructor
    definitions — the reference resolves constructor calls at the FQN key
    `{Class}.<init>` (expression_resolver.rs:742,1460) — and
    primary-constructor `val`/`var` parameters extract as class
    Properties; PLAIN parameters stay unindexed (Parameter → None)."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src = (
        "package p\n"
        "class Config(val host: String, var port: Int, timeout: Int) {\n"
        "    constructor() : this(\"h\", 0, 1) {\n"
        "        val t = port\n"
        "    }\n"
        "}\n"
        "class Multi(\n"
        "    val a: String,\n"
        "    var b: Int = make(1),\n"
        "    c: Long,\n"
        ") {\n"
        "    fun go() {}\n"
        "}\n"
        "class Box<T>(val item: T)\n"
        "class Sub : Base(1) {\n"
        "    val real: Int = 2\n"
        "}\n"
    )
    rows = list(_extract_one("C.kt", "Kotlin", src))
    defs = {(r[3], r[4], r[5]) for r in rows if r[2] == "definition"}
    assert ("host", "p.Config", "Property") in defs
    assert ("port", "p.Config", "Property") in defs
    assert ("timeout", "p.Config", "Property") not in defs  # plain param
    assert ("<init>", "p.Config", "Constructor") in defs
    assert ("a", "p.Multi", "Property") in defs   # continuation line
    assert ("b", "p.Multi", "Property") in defs   # default-arg call nested
    assert all(n != "c" for n, _p, _k in defs)    # plain param, multi-line
    assert ("item", "p.Box", "Property") in defs  # generic class header
    assert ("real", "p.Sub", "Property") in defs
    # `Base(1)` supertype-call args never read as primary-ctor props, the
    # ctor body's `val t` is a LocalVariable (the <init> frame shields it),
    # and `this(...)` delegation is syntax — not a call row
    assert all(n != "t" for n, _p, _k in defs)
    assert not any(r[2] == "call" and r[3] in ("this", "constructor") for r in rows)


def test_kotlin_constructor_edge_class_to_constructor(spark, tmp_path_factory):
    """Class→Constructor is CLASS_TO_CONSTRUCTOR (kotlin/analyzer.rs:
    227-228), and primary-ctor properties ride CLASS_TO_PROPERTY."""
    corpus = {
        "p/K.kt": (
            "package p\n"
            "class Conn(val host: String) {\n"
            "    constructor() : this(\"local\")\n"
            "}\n"
        ),
    }
    kg = _index_corpus(spark, tmp_path_factory, corpus, "kt-ctor")
    de = kg.edges["definition_relationships"]
    d = kg.definitions.select("id", "fqn")
    edges = {
        (r.src.split("p.", 1)[-1], r.tgt.split("p.", 1)[-1], r.type)
        for r in de.join(d.withColumnsRenamed({"id": "source_id", "fqn": "src"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "tgt"}), "target_id")
        .select("src", "tgt", "type").collect()
    }
    assert ("Conn", "Conn.<init>", "CLASS_TO_CONSTRUCTOR") in edges, sorted(edges)
    assert ("Conn", "Conn.host", "CLASS_TO_PROPERTY") in edges


def test_csharp_record_kinds_and_positional_properties():
    """Golden sweep r7: records (incl. `record struct` / `readonly record
    struct`) simplify to Class (csharp.rs:252-255), and positional record
    parameters extract as Properties — each IS a public init-only property
    of the record. Attributes and defaults are transparent; a bare base
    clause (`record Copy : Person;`) contributes nothing."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    cs = list(_extract_one(
        "P.cs", "CSharp",
        "namespace App;\n"
        "public record Person(string Name, int Age = 0);\n"
        "public record struct Point(double X, double Y);\n"
        "public readonly record struct Size(int W, int H);\n"
        "public record Employee(\n"
        "    string Name,\n"
        "    List<string> Tags,\n"
        "    [property: JsonRequired] decimal Pay\n"
        ") {\n"
        "    public void Work() { }\n"
        "}\n"
        "public record Marker();\n"
        "public record Copy : Person;\n",
    ))
    defs = {(r[3], r[4], r[5]) for r in cs if r[2] == "definition"}
    assert ("Person", "App", "Class") in defs
    assert ("Name", "App.Person", "Property") in defs
    assert ("Age", "App.Person", "Property") in defs
    assert ("Point", "App", "Class") in defs  # not a bogus `struct` class
    assert all(n != "struct" for n, _p, _k in defs)
    assert ("X", "App.Point", "Property") in defs
    assert ("Size", "App", "Class") in defs
    assert ("Name", "App.Employee", "Property") in defs  # continuation line
    assert ("Tags", "App.Employee", "Property") in defs  # generic type
    assert ("Pay", "App.Employee", "Property") in defs   # attributed param
    assert ("Work", "App.Employee", "Method") in defs
    assert ("Copy", "App", "Class") in defs
    # the base clause / empty list yield no phantom properties
    assert not any(p == "App.Copy" for _n, p, _k in defs)
    assert not any(p == "App.Marker" for _n, p, _k in defs)


def test_csharp_record_tuple_and_generic_positional_properties():
    """r8 (ADVICE low): parenthesized tuple types and generic-comma types
    in positional record parameters — the tuple's parens used to blank to
    a one-token chunk that the (type, name) guard rejected, and generic
    commas split chunks so the name only extracted by accident."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    cs = list(_extract_one(
        "T.cs", "CSharp",
        "namespace App;\n"
        "public record R((int A, string B) Pair, Dictionary<int, string> Map);\n"
        "public record Multi(\n"
        "    (int X, int Y) Point,\n"
        "    List<(string K, int V)> Items,\n"
        "    Func<int, int> Op = null\n"
        ");\n",
    ))
    defs = {(r[3], r[4], r[5]) for r in cs if r[2] == "definition"}
    assert ("Pair", "App.R", "Property") in defs
    assert ("Map", "App.R", "Property") in defs
    assert ("Point", "App.Multi", "Property") in defs
    assert ("Items", "App.Multi", "Property") in defs
    assert ("Op", "App.Multi", "Property") in defs
    # tuple ELEMENT names are not record properties; generic params either
    names = {n for n, _p, _k in defs}
    assert not ({"A", "B", "X", "Y", "K", "V", "int", "string"} & names), names


def test_rust_associated_consts_not_indexed():
    """Golden sweep r7 (negative pin): RustDefinitionType has NO const
    kind (rust.rs inventory: Struct/Enum/Union/Trait/Impl/Method/
    AssociatedFunction/Function/Variant/Field/Module) — `const` items in
    trait or impl bodies must not extract."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    rs = list(_extract_one(
        "c.rs", "Rust",
        "pub trait Limits {\n"
        "    const MAX: u32;\n"
        "    fn cap(&self) -> u32 { Self::MAX }\n"
        "}\n"
        "impl Limits for Conn {\n"
        "    const MAX: u32 = 5;\n"
        "    fn cap(&self) -> u32 { 5 }\n"
        "}\n"
        "pub const GLOBAL: u32 = 9;\n",
    ))
    defs = {(r[3], r[5]) for r in rs if r[2] == "definition"}
    assert ("Limits", "Interface") in defs
    assert ("cap", "Method") in defs
    assert all(n not in ("MAX", "GLOBAL") for n, _k in defs), defs


def test_ts_accessor_decorator_generator_members():
    """Golden sweep r7: get/set accessors, decorated methods, static async
    factories and generator methods (`*gen()` / `async *stream()`) are all
    method_definition nodes → Method; class fields stay unindexed
    (tests.rs:369-454 count excludes fields)."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    ts = list(_extract_one(
        "t.ts", "TypeScript",
        "class Temp {\n"
        "  private _c = 0;\n"
        "  get celsius(): number {\n"
        "    return this._c;\n"
        "  }\n"
        "  set celsius(v: number) {\n"
        "    this._c = v;\n"
        "  }\n"
        "  @action\n"
        "  reset(): void {\n"
        "    this._c = 0;\n"
        "  }\n"
        "  static async create(): Promise<Temp> {\n"
        "    return new Temp();\n"
        "  }\n"
        "  *gen(): Iterator<number> {\n"
        "    yield 1;\n"
        "  }\n"
        "  async *stream() {\n"
        "    yield 2;\n"
        "  }\n"
        "}\n",
    ))
    defs = [(r[3], r[4], r[5]) for r in ts if r[2] == "definition"]
    assert defs.count(("celsius", "Temp", "Method")) == 2  # get + set nodes
    assert ("reset", "Temp", "Method") in defs
    assert ("create", "Temp", "Method") in defs
    assert ("gen", "Temp", "Method") in defs
    assert ("stream", "Temp", "Method") in defs
    assert all(n != "_c" for n, _p, _k in defs)


def test_ruby_endless_methods_and_singleton_class():
    """Golden sweep r7: endless methods (`def square(x) = x * x`) are
    complete one-line definitions that must not swallow following defs as
    children, and `class << self` is a transparent singleton-class scope —
    contained defs are SingletonMethods of the enclosing class with no
    extra FQN segment (ruby/scope_resolver.rs:49-53). Setters
    (`def width=(w)`) index under their Ruby method name `width=` —
    adjudicated r8 from tree-sitter-ruby's published grammar (the method
    node's name field for a setter is a `setter` node whose text includes
    the `=`) and Ruby's own method naming (`:width=`); the reference has no
    setter fixture, so the grammar is the authority."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    src = (
        "class Calc\n"
        "  def square(x) = x * x\n"
        "  def answer = 42\n"
        "  def width=(w)\n"
        "    @w = w\n"
        "  end\n"
        "  class << self\n"
        "    def version\n"
        "      1\n"
        "    end\n"
        "  end\n"
        "  def after_sclass\n"
        "    2\n"
        "  end\n"
        "end\n"
    )
    defs = {(r[3], r[4], r[5]) for r in _extract_one("c.rb", "Ruby", src) if r[2] == "definition"}
    assert ("square", "Calc", "Method") in defs
    assert ("answer", "Calc", "Method") in defs       # parent is Calc, not square
    assert ("width=", "Calc", "Method") in defs       # setter keeps its `=`
    assert ("width", "Calc", "Method") not in defs    # ...and ONLY the `=` name
    assert ("version", "Calc", "SingletonMethod") in defs  # sclass: no FQN segment
    assert ("after_sclass", "Calc", "Method") in defs  # back to instance scope
    assert not any("." in (p or "") and p != "Calc" for _n, p, _k in defs), defs


def test_kotlin_ctor_call_resolves_to_init(spark, tmp_path_factory):
    """Constructor preference (expression_resolver.rs:741-749): a `Foo(...)`
    call resolves to `Foo.<init>` when an explicit secondary constructor
    exists; classes WITHOUT one keep resolving to the class row."""
    corpus = {
        "p/Conn.kt": (
            "package p\n"
            "class Conn(val host: String) {\n"
            "    constructor() : this(\"local\")\n"
            "}\n"
            "class Plain {\n"
            "    fun id() = 1\n"
            "}\n"
        ),
        "p/Main.kt": (
            "package p\n"
            "fun main() {\n"
            "    val c = Conn()\n"
            "    val q = Plain()\n"
            "}\n"
        ),
    }
    kg = _index_corpus(spark, tmp_path_factory, corpus, "kt-ctor-call")
    de = kg.edges["definition_relationships"]
    d = kg.definitions.select("id", "fqn")
    edges = {
        (r.src, r.tgt, r.type)
        for r in de.join(d.withColumnsRenamed({"id": "source_id", "fqn": "src"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "tgt"}), "target_id")
        .filter(F.col("type").isin("CALLS", "AMBIGUOUSLY_CALLS"))
        .select("src", "tgt", "type").collect()
    }
    assert ("p.main", "p.Conn.<init>", "CALLS") in edges, sorted(edges)
    assert not any(t == "p.Conn" for _s, t, _ty in edges)  # redirected
    assert ("p.main", "p.Plain", "CALLS") in edges  # fallback: the class


def test_string_interpolation_expressions_are_code():
    """tree-sitter parses string interpolations as real expression nodes —
    calls inside f"{fmt(x)}" (Python), `${touch()}` (TS template),
    "#{touch()}" (Ruby), $"{Touch()}" (C#) are call sites in the
    reference. The interpolation DELIMITERS stay masked (brace-counting
    logic never sees them), plain string contents stay data, and escaped
    {{braces}} stay literal."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    cases = [
        ("Python", "s.py",
         'def run():\n    m = f"total {fmt(1)}"\n    r = "call_me(2)"\n',
         {"fmt"}, {"call_me"}),
        ("TypeScript", "t.ts",
         "function run() {\n  const m = `v=${touch(1)}`;\n  const r = 'noop(2)';\n}\n",
         {"touch"}, {"noop"}),
        ("Ruby", "r.rb",
         'def run\n  m = "v=#{touch(1)}"\n  r = "noop(2)"\nend\n',
         {"touch"}, {"noop"}),
        ("CSharp", "c.cs",
         'public class A {\n    public void Run() {\n'
         '        var m = $"v={Touch(1)} and {{esc}}";\n'
         '        var r = "Noop(2)";\n    }\n}\n',
         {"Touch"}, {"Noop"}),
    ]
    for lang, path, src, want, dont in cases:
        calls = {r[3] for r in _extract_one(path, lang, src) if r[2] == "call"}
        assert want <= calls, (lang, sorted(calls))
        assert not (dont & calls), (lang, sorted(calls))
    # Kotlin: ${...} receiver expressions resolve like plain code — a
    # typed local's method call inside a template string yields the edge
    kt = list(_extract_one(
        "k.kt", "Kotlin",
        "package p\n"
        "class User {\n"
        "    fun touch(): Int = 1\n"
        "}\n"
        "fun run() {\n"
        "    val u = User()\n"
        "    val m = \"v=${u.touch()} plain $name\"\n"
        "    val r = \"noop(1)\"\n"
        "}\n",
    ))
    recv = {(r[3], r[14]) for r in kt if r[2] == "call"}
    assert ("touch", "User") in recv, recv
    assert all(n != "noop" for n, _t in recv)


def test_rust_struct_union_fields_are_definitions(spark, tmp_path_factory):
    """Rust Fields ARE indexed (unlike Java/C# fields): Struct→Field and
    Union→Field reuse CLASS_TO_METHOD (rust.rs:287-292,317-322). fn-body
    typed lets, match arms, tuple/unit structs contribute nothing."""
    corpus = {
        "src/conn.rs": (
            "pub struct Conn {\n"
            "    pub host: String,\n"
            "    port: u16,\n"
            "}\n"
            "pub union Raw { a: u32, b: f32 }\n"
            "pub struct Tup(u32, u32);\n"
            "impl Conn {\n"
            "    pub fn open(&self) -> bool {\n"
            "        let ok: bool = true;\n"
            "        ok\n"
            "    }\n"
            "}\n"
        ),
    }
    kg = _index_corpus(spark, tmp_path_factory, corpus, "rs-fields")
    kinds = {
        r.fqn.split("conn.", 1)[-1]: r.definition_type
        for r in kg.definitions.select("fqn", "definition_type").collect()
    }
    assert kinds["Conn.host"] == "Field" and kinds["Conn.port"] == "Field"
    assert kinds["Raw.a"] == "Field" and kinds["Raw.b"] == "Field"
    assert "Conn.open.ok" not in kinds and not any(k.endswith(".ok") for k in kinds)
    de = kg.edges["definition_relationships"]
    d = kg.definitions.select("id", "fqn")
    edges = {
        (r.src.split("conn.", 1)[-1], r.tgt.split("conn.", 1)[-1], r.type)
        for r in de.join(d.withColumnsRenamed({"id": "source_id", "fqn": "src"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "tgt"}), "target_id")
        .select("src", "tgt", "type").collect()
    }
    assert ("Conn", "Conn.host", "CLASS_TO_METHOD") in edges, sorted(edges)
    assert ("Raw", "Raw.a", "CLASS_TO_METHOD") in edges
    assert not any(t == "CLASS_TO_FIELD" for _s, _t2, t in edges)


def test_rust_module_children_edge_is_module_to_singleton_method(spark, tmp_path_factory):
    """rust.rs:283-285 — the `(Module, _)` match arm is a wildcard: EVERY
    child of a Rust module (free fn, struct, trait, nested mod) rides
    MODULE_TO_SINGLETON_METHOD."""
    corpus = {
        "src/api.rs": (
            "pub mod api {\n"
            "    pub fn ping() {}\n"
            "    pub struct Req;\n"
            "    pub trait Call {\n"
            "        fn go(&self);\n"
            "    }\n"
            "    pub mod inner {\n"
            "        pub fn deep() {}\n"
            "    }\n"
            "}\n"
        ),
    }
    kg = _index_corpus(spark, tmp_path_factory, corpus, "rs-mod-edges")
    de = kg.edges["definition_relationships"]
    d = kg.definitions.select("id", "fqn")
    edges = {
        (r.src.split("api.", 1)[-1] or "api", r.tgt.rsplit(".", 1)[-1], r.type)
        for r in de.join(d.withColumnsRenamed({"id": "source_id", "fqn": "src"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "tgt"}), "target_id")
        .filter(F.col("type").startswith("MODULE"))
        .select("src", "tgt", "type").collect()
    }
    assert ("api", "ping", "MODULE_TO_SINGLETON_METHOD") in edges, sorted(edges)
    assert ("api", "Req", "MODULE_TO_SINGLETON_METHOD") in edges
    assert ("api", "Call", "MODULE_TO_SINGLETON_METHOD") in edges
    assert ("api", "inner", "MODULE_TO_SINGLETON_METHOD") in edges
    assert any(
        s.endswith("inner") and t == "deep" and ty == "MODULE_TO_SINGLETON_METHOD"
        for s, t, ty in edges
    ), sorted(edges)
    assert not any(t in ("MODULE_TO_FUNCTION", "MODULE_TO_CLASS") for _s, _t2, t in edges)


def test_python_function_vs_method_kind_split():
    """python/analyzer.rs:1051-1060: class-hosted defs are Method;
    module-level AND function-nested defs are Function (the reference's
    edge table has FunctionToFunction/FunctionToLambda arms only for the
    Function kind — (Class, Function) and (Method, Method) pairs cannot
    occur)."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    kinds = {
        (r[3], r[5])
        for r in _extract_one("a.py", "Python",
            "def top():\n"
            "    def inner():\n"
            "        pass\n"
            "class C:\n"
            "    def m(self):\n"
            "        def helper():\n"
            "            pass\n"
            "    @staticmethod\n"
            "    def sm():\n"
            "        pass\n"
            "async def afetch():\n"
            "    pass\n")
        if r[2] == "definition"
    }
    assert ("top", "Function") in kinds and ("afetch", "Function") in kinds
    assert ("inner", "Function") in kinds     # fn-nested → Function
    assert ("helper", "Function") in kinds    # method-nested → Function
    assert ("m", "Method") in kinds and ("sm", "Method") in kinds
    assert ("C", "Class") in kinds


def test_csharp_constructor_kind_and_edge(spark, tmp_path_factory):
    """csharp.rs:196-199: C# constructors are a distinct kind whose
    hierarchy edge is CLASS_TO_CONSTRUCTOR (unlike Java, where ctors stay
    Method/ClassToMethod); a method named like a DIFFERENT class stays
    Method."""
    corpus = {
        "App/H.cs": (
            "namespace App;\n"
            "public class Handler {\n"
            "    public Handler(int n) { }\n"
            "    public void Process() { }\n"
            "}\n"
            "public class Wrap {\n"
            "    public void Handler() { }\n"
            "}\n"
        ),
    }
    kg = _index_corpus(spark, tmp_path_factory, corpus, "cs-ctor")
    kinds = {
        r.fqn.split(".App.", 1)[-1]: r.definition_type
        for r in kg.definitions.select("fqn", "definition_type").collect()
    }
    assert kinds["Handler.Handler"] == "Constructor"
    assert kinds["Handler.Process"] == "Method"
    assert kinds["Wrap.Handler"] == "Method"  # not ITS host's name
    de = kg.edges["definition_relationships"]
    d = kg.definitions.select("id", "fqn")
    edges = {
        (r.src.split(".App.", 1)[-1], r.tgt.split(".App.", 1)[-1], r.type)
        for r in de.join(d.withColumnsRenamed({"id": "source_id", "fqn": "src"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "tgt"}), "target_id")
        .select("src", "tgt", "type").collect()
    }
    assert ("Handler", "Handler.Handler", "CLASS_TO_CONSTRUCTOR") in edges, sorted(edges)
    assert ("Handler", "Handler.Process", "CLASS_TO_METHOD") in edges


def test_kotlin_function_parent_edges_use_method_names(spark, tmp_path_factory):
    """kotlin/analyzer.rs:246-266: a Function PARENT names edges as a
    Method — a local class inside a fun is METHOD_TO_CLASS, a nested fun
    METHOD_TO_METHOD (never FUNCTION_TO_*)."""
    corpus = {
        "p/L.kt": (
            "package p\n"
            "fun outer() {\n"
            "    fun inner() {\n"
            "        return\n"
            "    }\n"
            "    class Local {\n"
            "        val z: Int = 1\n"
            "    }\n"
            "}\n"
        ),
    }
    kg = _index_corpus(spark, tmp_path_factory, corpus, "kt-fn-parent")
    de = kg.edges["definition_relationships"]
    d = kg.definitions.select("id", "fqn")
    edges = {
        (r.src.split("p.", 1)[-1], r.tgt.split("p.", 1)[-1], r.type)
        for r in de.join(d.withColumnsRenamed({"id": "source_id", "fqn": "src"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "tgt"}), "target_id")
        .select("src", "tgt", "type").collect()
    }
    assert ("outer", "outer.inner", "METHOD_TO_METHOD") in edges, sorted(edges)
    assert ("outer", "outer.Local", "METHOD_TO_CLASS") in edges
    assert not any(t.startswith("FUNCTION_TO") for _s, _t2, t in edges)


def test_ruby_method_nested_defs_have_no_hierarchy_edge(spark, tmp_path_factory):
    """ruby/analyzer.rs:214-233 — the Ruby edge table has no Method→X
    arms: a def (or class) nested inside a method body is a definition but
    gets NO hierarchy edge; class/module-hosted siblings keep theirs."""
    corpus = {
        "app/j.rb": (
            "class Jobs\n"
            "  def run\n"
            "    def late_bound\n"
            "      1\n"
            "    end\n"
            "  end\n"
            "  def normal\n"
            "    2\n"
            "  end\n"
            "end\n"
        ),
    }
    kg = _index_corpus(spark, tmp_path_factory, corpus, "rb-nested")
    fqns = {r.fqn for r in kg.definitions.select("fqn").collect()}
    assert any(f.endswith("run#late_bound") for f in fqns), fqns  # still a def
    de = kg.edges["definition_relationships"]
    d = kg.definitions.select("id", "fqn")
    edges = {
        (r.src.split("#")[-1].split(".")[-1],
         r.tgt.split("#")[-1].split(".")[-1], r.type)
        for r in de.join(d.withColumnsRenamed({"id": "source_id", "fqn": "src"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "tgt"}), "target_id")
        .select("src", "tgt", "type").collect()
    }
    assert ("Jobs", "run", "CLASS_TO_METHOD") in edges
    assert ("Jobs", "normal", "CLASS_TO_METHOD") in edges
    assert not any(t == "late_bound" for _s, t, _ty in edges), sorted(edges)


def test_kotlin_value_class_extracts():
    """`value class` is KotlinDefinitionType::ValueClass — indexed like a
    class (kotlin_file.rs:119-124), primary-ctor val included; a local
    named `value` stays a LocalVariable."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    defs = {
        (r[3], r[4], r[5])
        for r in _extract_one("v.kt", "Kotlin",
            "package p\n"
            "@JvmInline\n"
            "value class UserId(val raw: Long)\n"
            "fun use() {\n"
            "    val value = 1\n"
            "}\n")
        if r[2] == "definition"
    }
    assert ("UserId", "p", "Class") in defs
    assert ("raw", "p.UserId", "Property") in defs
    assert all(n != "value" for n, _p, _k in defs)


# ---- r8 kind-inventory audit (verdict task #5): per-language DefinitionType
# arms reconciled against the reference's simplify/index tables; each gap
# found is pinned positive, each deliberate non-kind negative. Full table in
# COVERAGE.md.


def test_csharp_member_kind_inventory():
    """csharp.rs:245-297 arm-by-arm: Indexer→Property, Finalizer→
    InstanceMethod, Operator→StaticMethod (incl. conversion operators);
    Event and Field simplify to None. parser-core's exact name strings for
    these members are unpinned by any reference fixture — source tokens
    used (`this`, `~Type`, `operator<sym>`), documented in COVERAGE.md."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    cs = list(_extract_one(
        "K.cs", "CSharp",
        "namespace App;\n"
        "public class C {\n"
        "    private int _f;\n"
        "    public event EventHandler Changed;\n"
        "    public int this[int i] => _f + i;\n"
        "    ~C() { }\n"
        "    public static C operator +(C a, C b) => a;\n"
        "    public static bool operator ==(C a, C b) => true;\n"
        "    public static implicit operator Celsius(C c) => default;\n"
        "}\n",
    ))
    defs = {(r[3], r[4], r[5]) for r in cs if r[2] == "definition"}
    assert ("this", "App.C", "Property") in defs          # indexer
    assert ("~C", "App.C", "Method") in defs              # finalizer
    assert ("operator+", "App.C", "Method") in defs       # symbol operator
    assert ("operator==", "App.C", "Method") in defs
    assert ("operator Celsius", "App.C", "Method") in defs  # conversion
    names = {n for n, _p, _k in defs}
    assert "_f" not in names and "Changed" not in names   # Field/Event → None
    # operator param lists must not mint phantom lambdas (the operator's own
    # trailing `=` satisfies the lambda delimiter guard otherwise)
    assert not any(k == "Lambda" for _n, _p, k in defs), defs


def test_typescript_class_field_arrows_and_call_expr_negative():
    """NamedArrowFunction covers class FIELDS initialized with arrows
    (typescript.rs:294 → Function), scoped to the class; method-body
    assignments (`x = y => ...`) are expressions, not definitions; and
    NamedCallExpression (`const x = factory(...)`) stays unextracted — the
    reference's own 84-definition fixture count excludes the method-local
    const-call bindings its fixture is full of (tests.rs:415-419)."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    ts = list(_extract_one(
        "a.ts", "TypeScript",
        "export class App {\n"
        "  private go = () => { return 1; }\n"
        "  static fire = async (n: number): Promise<void> => {}\n"
        "  plain = 5;\n"
        "  run(): void {\n"
        "    outer = (y) => y;\n"
        "    const made = factory(1);\n"
        "  }\n"
        "}\n",
    ))
    defs = {(r[3], r[4], r[5]) for r in ts if r[2] == "definition"}
    assert ("go", "App", "Function") in defs
    assert ("fire", "App", "Function") in defs
    assert ("run", "App", "Method") in defs
    names = {n for n, _p, _k in defs}
    assert "plain" not in names            # plain field: not a definition
    assert "outer" not in names            # method-body assignment
    assert "made" not in names             # NamedCallExpression negative


def test_lambda_parent_is_enclosing_frame_not_sibling():
    """A module-level lambda AFTER a finished def must not inherit that def
    as parent (stale same-indent frame); one-liner defs still own their
    same-line lambdas, and a Java FIELD initializer lambda belongs to the
    class, not the previous method."""
    from knowledge_graph_spark.pipeline.extract import _extract_one

    py = list(_extract_one(
        "m.py", "Python",
        "async def afn(): pass\n\nf = lambda x: x + 1\n\n"
        "def g(): return lambda y: y\n",
    ))
    lam = {(r[3], r[4]) for r in py if r[2] == "definition" and r[5] == "Lambda"}
    assert ("lambda_2_4", None) in lam     # module-level: no parent
    assert ("lambda_4_16", "g") in lam     # one-liner def owns its lambda

    jv = list(_extract_one(
        "C.java", "Java",
        "package com.ex;\n"
        "class C {\n"
        "    void m() { Runnable r = () -> {}; }\n"
        "    Runnable field = () -> {};\n"
        "}\n",
    ))
    lam = {(r[3], r[4]) for r in jv if r[2] == "definition" and r[5] == "Lambda"}
    assert ("lambda_2_28", "com.ex.C.m") in lam   # method-body lambda
    assert ("lambda_3_21", "com.ex.C") in lam     # field lambda → class
