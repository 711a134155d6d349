"""Indexing pipeline stage 2: graph construction from extracted entities.

Reference mapping (SURVEY §2.9): D3 language grouping is implicit in the
entity rows; D4 directory synthesis = prefix explode + distinct; D5/D6
definition maps + hierarchy self-join; D7 reference resolution with
CALLS/AMBIGUOUSLY_CALLS multiplicity semantics (python/analyzer.rs:899-943:
exactly one target → CALLS, several → one AMBIGUOUSLY_CALLS edge per
candidate, none → drop); J9 import→candidate-file join with priority; D9
dense ID assignment + endpoint resolution.

Every step is a DataFrame op: the definition map (D5) is a broadcast join
build side, hierarchy (D6) a self-join on parent fqn, directory synthesis a
posexplode+distinct — no driver-side loops, no Python past the extractor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knowledge_graph_spark import schema as S
from knowledge_graph_spark.graph.model import KnowledgeGraph
from knowledge_graph_spark.io import assign_dense_ids

_EDGE_COLS = [
    "source_id",
    "target_id",
    "source_table",
    "target_table",
    "type",
    "source_start_byte",
    "source_end_byte",
    "source_start_line",
    "source_end_line",
    "source_start_col",
    "source_end_col",
]


# Lambda/Proc hierarchy-edge typing, per the reference's per-language
# analyzer tables (each analyzer's get_definition_relationship_type maps
# only SOME parent kinds for anonymous-function children; unmapped pairs
# produce no edge):
#   Python  python/analyzer.rs:1084-1112 (Class/Method/Function→Lambda,
#           Lambda→Lambda/Class/Function)
#   Ruby    ruby/analyzer.rs:214-218 (Class→Lambda, Class→Proc ONLY —
#           Method→Lambda deliberately unmapped)
#   Kotlin  kotlin/analyzer.rs:224-280 (`fun` children of lambdas map to
#           LAMBDA_TO_METHOD; `fun` parents to METHOD_TO_LAMBDA)
#   Java    java/analyzer.rs:222-252
#   C#      csharp.rs:206-239
# Keys are (language, parent definition_type, child definition_type) in this
# repo's type vocabulary (Python defs are all "Method"; Kotlin `fun` is
# "Function"; Kotlin `object` is "Module").
_LAMBDA_EDGE_TYPES = {
    ("Python", "Class", "Lambda"): "CLASS_TO_LAMBDA",
    ("Python", "Method", "Lambda"): "METHOD_TO_LAMBDA",
    ("Python", "Function", "Lambda"): "FUNCTION_TO_LAMBDA",
    ("Python", "Lambda", "Function"): "LAMBDA_TO_FUNCTION",
    ("Python", "Lambda", "Lambda"): "LAMBDA_TO_LAMBDA",
    ("Python", "Lambda", "Class"): "LAMBDA_TO_CLASS",
    ("Python", "Lambda", "Method"): "LAMBDA_TO_FUNCTION",
    ("Ruby", "Class", "Lambda"): "CLASS_TO_LAMBDA",
    ("Ruby", "Class", "Proc"): "CLASS_TO_PROC",
    ("Kotlin", "Class", "Lambda"): "CLASS_TO_LAMBDA",
    ("Kotlin", "Interface", "Lambda"): "INTERFACE_TO_LAMBDA",
    ("Kotlin", "Function", "Lambda"): "METHOD_TO_LAMBDA",
    ("Kotlin", "Lambda", "Lambda"): "LAMBDA_TO_LAMBDA",
    ("Kotlin", "Lambda", "Class"): "LAMBDA_TO_CLASS",
    ("Kotlin", "Lambda", "Function"): "LAMBDA_TO_METHOD",
    ("Java", "Class", "Lambda"): "CLASS_TO_LAMBDA",
    ("Java", "Interface", "Lambda"): "INTERFACE_TO_LAMBDA",
    ("Java", "Method", "Lambda"): "METHOD_TO_LAMBDA",
    ("Java", "Lambda", "Lambda"): "LAMBDA_TO_LAMBDA",
    ("CSharp", "Class", "Lambda"): "CLASS_TO_LAMBDA",
    ("CSharp", "Method", "Lambda"): "METHOD_TO_LAMBDA",
    # rust.rs:291-301 — enum→variant REUSES ClassToMethod rather than
    # minting a VARIANT edge type; routed through the same override map
    ("Rust", "Class", "Variant"): "CLASS_TO_METHOD",
    # java/analyzer.rs:216-217 — Class→EnumConstant maps to
    # ClassToEnumEntry (Kotlin's EnumEntry snakes to the same name
    # naturally and needs no entry here)
    ("Java", "Class", "EnumConstant"): "CLASS_TO_ENUM_ENTRY",
    # kotlin/analyzer.rs:218-219,240-241 — a Function hosted in a type is a
    # METHOD edge-wise (Kotlin has one Function kind; the reference's edge
    # table names the pair ClassToMethod / InterfaceToMethod)
    ("Kotlin", "Class", "Function"): "CLASS_TO_METHOD",
    ("Kotlin", "Interface", "Function"): "INTERFACE_TO_METHOD",
    # kotlin/analyzer.rs:246-266 — a FUNCTION parent names its edges as a
    # METHOD (one Kotlin Function kind; the table's Function→X arms are
    # MethodToMethod / MethodToClass / MethodToInterface / MethodToProperty)
    ("Kotlin", "Function", "Function"): "METHOD_TO_METHOD",
    ("Kotlin", "Function", "Class"): "METHOD_TO_CLASS",
    ("Kotlin", "Function", "Interface"): "METHOD_TO_INTERFACE",
    ("Kotlin", "Function", "Property"): "METHOD_TO_PROPERTY",
    # rust.rs:299-304 — Trait→Method (a trait default method) reuses
    # ClassToMethod, not InterfaceToMethod; Rust traits extract as
    # Interface here, so the pair needs an explicit override
    ("Rust", "Interface", "Method"): "CLASS_TO_METHOD",
    # rust.rs:287-292,317-322 — Struct→Field / Union→Field reuse
    # ClassToMethod (both simplify to Class here)
    ("Rust", "Class", "Field"): "CLASS_TO_METHOD",
    # rust.rs:283-285 — `(Module, _)` is a WILDCARD arm: every child of a
    # Rust module rides ModuleToSingletonMethod, whatever its kind
    ("Rust", "Module", "Function"): "MODULE_TO_SINGLETON_METHOD",
    ("Rust", "Module", "Class"): "MODULE_TO_SINGLETON_METHOD",
    ("Rust", "Module", "Interface"): "MODULE_TO_SINGLETON_METHOD",
    ("Rust", "Module", "Module"): "MODULE_TO_SINGLETON_METHOD",
    ("Rust", "Module", "Method"): "MODULE_TO_SINGLETON_METHOD",
    # ruby/analyzer.rs:214-233 — the Ruby table has NO Method→X or
    # SingletonMethod→X arms: a def/class nested inside a method body gets
    # no hierarchy edge in the reference. "" = suppressed (filtered out).
    ("Ruby", "Method", "Method"): "",
    ("Ruby", "Method", "SingletonMethod"): "",
    ("Ruby", "Method", "Class"): "",
    ("Ruby", "Method", "Module"): "",
    ("Ruby", "SingletonMethod", "Method"): "",
    ("Ruby", "SingletonMethod", "SingletonMethod"): "",
    ("Ruby", "SingletonMethod", "Class"): "",
    ("Ruby", "SingletonMethod", "Module"): "",
}


def _null_loc(df: DataFrame) -> DataFrame:
    for c, t in [
        ("source_start_byte", "long"),
        ("source_end_byte", "long"),
        ("source_start_line", "int"),
        ("source_end_line", "int"),
        ("source_start_col", "int"),
        ("source_end_col", "int"),
    ]:
        df = df.withColumn(c, F.lit(None).cast(t))
    return df


def _module_fqn():
    return F.regexp_replace(
        F.regexp_replace(F.col("path"), r"\.[A-Za-z0-9]+$", ""), "/", "."
    )


def build_graph_from_entities(
    spark: SparkSession,
    files: DataFrame,
    entities: DataFrame,
    repository_name: str = "repo",
) -> KnowledgeGraph:
    files = files.withColumnRenamed("relative_path", "path").cache()
    entities = entities.cache()

    # ---- directory synthesis (D4: analysis/mod.rs:201-236) ----------------
    dir_of = F.regexp_replace(F.col("path"), r"/[^/]+$", "")
    file_dirs = files.select(
        F.when(F.col("path").contains("/"), dir_of).otherwise(F.lit("")).alias("dirpath"),
        "path",
    )
    parts = file_dirs.filter(F.col("dirpath") != "").select(
        F.split("dirpath", "/").alias("segs")
    )
    prefixes = parts.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("segs")),
                lambda i: F.concat_ws("/", F.slice("segs", 1, i)),
            )
        ).alias("path")
    ).distinct()
    directories = prefixes.select(
        "path",
        F.concat(F.lit("/"), F.lit(repository_name), F.lit("/"), F.col("path")).alias(
            "absolute_path"
        ),
        F.lit(repository_name).alias("repository_name"),
        F.element_at(F.split("path", "/"), -1).alias("name"),
    )
    # (dense ids for directories are assigned in the parallel batch below)

    # ---- file nodes -------------------------------------------------------
    file_nodes = files.select(
        "path",
        F.concat(F.lit("/"), F.lit(repository_name), F.lit("/"), F.col("path")).alias(
            "absolute_path"
        ),
        "language",
        F.lit(repository_name).alias("repository_name"),
        "extension",
        F.element_at(F.split("path", "/"), -1).alias("name"),
    )
    # (dense ids for file_nodes are assigned in the parallel batch below)

    # ---- definition nodes (D5) -------------------------------------------
    # FQN conventions follow the reference's per-language analyzers:
    # - Ruby: scope-based, no file prefix — `Outer::Inner` nesting,
    #   `Class#method` instance, `Class::method` singleton
    #   (ruby tests assert e.g. "UsersController#destroy",
    #   "NotificationService::notify")
    # - Java: package-based — the extractor embeds the `package` declaration
    #   in parent_chain, so fqn = parent_chain.name ("com.example.app.Foo.bar")
    # - Python/TS/others: module path prefix + dotted scope (python/analyzer.rs)
    defs = entities.filter(F.col("kind") == "definition")
    _ruby_prefix = F.regexp_replace(F.col("parent_chain"), r"\.", "::")
    _ruby_sep = F.when(F.col("definition_type") == "Method", F.lit("#")).otherwise(
        F.lit("::")
    )
    _fqn = (
        F.when(
            F.col("language") == "Ruby",
            F.when(F.col("parent_chain").isNull(), F.col("name")).otherwise(
                F.concat(_ruby_prefix, _ruby_sep, F.col("name"))
            ),
        )
        .when(
            # Java AND Kotlin: package-based FQNs — the extractor embeds the
            # `package` declaration in parent_chain (kotlin tests assert
            # e.g. "com.example.foo.Foo.Companion.companionFoo")
            F.col("language").isin("Java", "Kotlin"),
            F.concat_ws(".", F.col("parent_chain"), F.col("name")),
        )
        .when(
            # TypeScript: scope-based `::` joins with NO file prefix —
            # the reference asserts e.g. 'Application::run'
            # (indexer tests.rs:493-496, typescript_fqn_to_string)
            F.col("language") == "TypeScript",
            F.concat_ws(
                "::",
                F.regexp_replace(F.col("parent_chain"), r"\.", "::"),
                F.col("name"),
            ),
        )
        .otherwise(F.concat_ws(".", _module_fqn(), F.col("parent_chain"), F.col("name")))
    )
    definitions = defs.select(
        _fqn.alias("fqn"),
        "name",
        "definition_type",
        F.col("path").alias("primary_file_path"),
        F.col("start_byte").alias("primary_start_byte"),
        F.col("end_byte").alias("primary_end_byte"),
        "start_line",
        "end_line",
        "start_col",
        "end_col",
        F.lit(1).alias("total_locations"),
        # resolution-only columns (not part of the node schema, dropped at
        # the final node select): same-file scope key for caller lookup and
        # the immediately-enclosing scope name for receiver-typed matching
        F.concat_ws(".", F.col("parent_chain"), F.col("name")).alias("_scope_key"),
        F.col("parent_chain").alias("_parent_chain"),
        F.col("language").alias("_language"),
        F.element_at(F.split(F.col("parent_chain"), r"\."), -1).alias("_container"),
        # Kotlin extension-function receiver (`fun ExtendMe.f()` → ExtendMe):
        # receiver-typed calls resolve into the extension as if it were a
        # member of the receiver type (kotlin/tests.rs:482-516)
        F.col("receiver_type").alias("_ext_receiver"),
    )
    # (dense ids for definitions are assigned in the parallel batch below)

    # ---- imported symbol nodes -------------------------------------------
    imps = entities.filter(F.col("kind") == "import")
    imported = imps.select(
        F.lit("import").alias("import_type"),
        F.col("import_path"),
        "name",
        "alias",
        F.col("path").alias("file_path"),
        "start_byte",
        "end_byte",
        "start_line",
        "end_line",
        "start_col",
        "end_col",
    )
    # ---- dense ids for the four node tables (D9) ---------------------------
    # assign_dense_ids pays an EAGER localCheckpoint (the lineage cut that
    # pins one range-partition layout — io.py:114); run the four independent
    # materializations CONCURRENTLY instead of sequentially, with files /
    # entities force-cached first so the racing jobs don't each recompute
    # the extract pass (cache fill is per-partition, not deduped across
    # simultaneous jobs). On a small corpus the four sequential checkpoints
    # were the single largest slice of index wall time (r7 verdict task #2);
    # at scale the wall clock becomes the slowest table instead of the sum.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        n_files, n_entities = list(ex.map(lambda d: d.count(), (files, entities)))
    # the freshly-computed counts double as size hints so each dense-id
    # range partitioning is scale-adaptive (guide §2): a tiny corpus numbers
    # in 1 partition (no range-sampler pass, no 32-near-empty-task stages),
    # a 100 TB one keeps the full parallel two-phase path. Directories and
    # file nodes are bounded by n_files; definitions/imports by n_entities.
    with ThreadPoolExecutor(4) as ex:
        f_dir = ex.submit(
            lambda: assign_dense_ids(directories, ["path"], size_hint=n_files).cache()
        )
        f_fil = ex.submit(
            lambda: assign_dense_ids(file_nodes, ["path"], size_hint=n_files).cache()
        )
        f_def = ex.submit(
            lambda: assign_dense_ids(
                definitions,
                ["primary_file_path", "primary_start_byte", "primary_end_byte"],
                size_hint=n_entities,
            ).cache()
        )
        f_imp = ex.submit(
            lambda: assign_dense_ids(
                imported,
                ["file_path", "start_byte", "end_byte", "name"],
                size_hint=n_entities,
            ).cache()
        )
        directories = f_dir.result()
        file_nodes = f_fil.result()
        definitions = f_def.result()
        imported = f_imp.result()

    # ---- directory edges --------------------------------------------------
    parent_of = F.regexp_replace(F.col("path"), r"/[^/]+$", "")
    d_child = directories.withColumn(
        "parent", F.when(F.col("path").contains("/"), parent_of)
    )
    dd = (
        d_child.filter(F.col("parent").isNotNull())
        .alias("c")
        .join(directories.alias("p"), F.col("c.parent") == F.col("p.path"))
        .select(
            F.col("p.id").alias("source_id"),
            F.col("c.id").alias("target_id"),
            F.lit("directory_nodes").alias("source_table"),
            F.lit("directory_nodes").alias("target_table"),
            F.lit(S.DIR_CONTAINS_DIR).alias("type"),
        )
    )
    f_dir = file_nodes.withColumn(
        "dirpath", F.when(F.col("path").contains("/"), parent_of)
    )
    df_edge = (
        f_dir.filter(F.col("dirpath").isNotNull())
        .alias("f")
        .join(directories.alias("d"), F.col("f.dirpath") == F.col("d.path"))
        .select(
            F.col("d.id").alias("source_id"),
            F.col("f.id").alias("target_id"),
            F.lit("directory_nodes").alias("source_table"),
            F.lit("file_nodes").alias("target_table"),
            F.lit(S.DIR_CONTAINS_FILE).alias("type"),
        )
    )
    directory_relationships = _null_loc(dd.unionByName(df_edge)).select(*_EDGE_COLS)

    # ---- file edges -------------------------------------------------------
    fd = (
        file_nodes.alias("f")
        .join(definitions.alias("d"), F.col("d.primary_file_path") == F.col("f.path"))
        .select(
            F.col("f.id").alias("source_id"),
            F.col("d.id").alias("target_id"),
            F.lit("file_nodes").alias("source_table"),
            F.lit("definition_nodes").alias("target_table"),
            F.lit(S.FILE_DEFINES).alias("type"),
        )
    )
    fi = (
        file_nodes.alias("f")
        .join(imported.alias("i"), F.col("i.file_path") == F.col("f.path"))
        .select(
            F.col("f.id").alias("source_id"),
            F.col("i.id").alias("target_id"),
            F.lit("file_nodes").alias("source_table"),
            F.lit("imported_symbol_nodes").alias("target_table"),
            F.lit(S.FILE_IMPORTS).alias("type"),
        )
    )
    file_relationships = _null_loc(fd.unionByName(fi)).select(*_EDGE_COLS)

    # ---- definition hierarchy (D6: parent scope → child self-join) --------
    # joined on the extractor's scope chain (child.parent_chain == the
    # parent's full chain key, same file) rather than on FQN-string surgery —
    # separator-agnostic, so Ruby `::`/`#`, lambda position-names, and any
    # future FQN convention all type correctly. The edge type is the
    # reference's UPPER_SNAKE pair name — camel types split first so
    # SingletonMethod becomes CLASS_TO_SINGLETON_METHOD
    # (relationship.rs:20-40, ruby/analyzer.rs:195-235). Lambda/Proc pairs
    # are gated by the per-language analyzer tables: each reference analyzer
    # maps only some parent kinds for lambda children (Ruby only Class —
    # ruby/analyzer.rs:214-218; Kotlin's `fun` maps to METHOD_TO_LAMBDA, not
    # FUNCTION_TO_* — kotlin/analyzer.rs:256-258), and unmapped pairs emit
    # no edge at all.
    child = definitions.filter(F.col("_parent_chain").isNotNull())

    def _snake(col):
        return F.upper(F.regexp_replace(col, r"([a-z])([A-Z])", r"$1_$2"))

    _lam_map = F.create_map(
        *[
            F.lit(x)
            for pair, etype in _LAMBDA_EDGE_TYPES.items()
            for x in ("|".join(pair), etype)
        ]
    )
    # lambda pairs are GATED by the map (unmapped pair → no edge, matching
    # the per-language analyzer tables); all other overridden pairs fall
    # back to the generic name when unmapped, so they ride the coalesce
    _is_lam = (
        F.col("p.definition_type").isin("Lambda", "Proc")
        | F.col("c.definition_type").isin("Lambda", "Proc")
    )
    hier = (
        child.alias("c")
        .join(
            definitions.alias("p"),
            (F.col("c._parent_chain") == F.col("p._scope_key"))
            & (F.col("c.primary_file_path") == F.col("p.primary_file_path")),
        )
        .select(
            F.col("p.id").alias("source_id"),
            F.col("c.id").alias("target_id"),
            F.lit("definition_nodes").alias("source_table"),
            F.lit("definition_nodes").alias("target_table"),
            (
                lambda _ov: F.when(_is_lam, _ov).otherwise(
                    # non-lambda pairs: the override map wins when present
                    # (reference edge-name reuse — Variant/EnumConstant/
                    # Kotlin Function), else the generic UPPER_SNAKE pair
                    F.coalesce(
                        _ov,
                        F.concat(
                            _snake(F.col("p.definition_type")),
                            F.lit("_TO_"),
                            _snake(F.col("c.definition_type")),
                        ),
                    )
                )
            )(
                _lam_map[
                    F.concat_ws(
                        "|",
                        F.col("c._language"),
                        F.col("p.definition_type"),
                        F.col("c.definition_type"),
                    )
                ]
            ).alias("type"),
        )
        .filter(F.col("type").isNotNull() & (F.col("type") != ""))
    )
    hier = _null_loc(hier).select(*_EDGE_COLS)

    # ---- reference resolution (D7) ---------------------------------------
    # caller lookup by same-file scope key (path, enclosing-chain) rather
    # than by fqn string — identical for dotted languages, and required for
    # Ruby/Java whose fqn separators differ from the extractor's chain
    calls = entities.filter(
        (F.col("kind") == "call") & F.col("parent_chain").isNotNull()
    ).select(
        F.col("path").alias("call_file"),
        F.col("parent_chain").alias("_scope_key"),
        F.col("name").alias("callee"),
        "language",
        "receiver_type",
        "call_flavor",
        "start_line",
        "end_line",
        "start_col",
        "end_col",
        "start_byte",
        "end_byte",
    )
    caller = definitions.select(
        F.col("id").alias("caller_id"),
        F.col("primary_file_path").alias("call_file"),
        "_scope_key",
    )
    calls = calls.join(caller, ["call_file", "_scope_key"]).drop("_scope_key")
    bare_calls = calls.filter(F.col("receiver_type").isNull())
    recv_calls = calls.filter(F.col("receiver_type").isNotNull())

    def _ref_edges(matched):
        mult = Window.partitionBy("caller_id", "start_byte")
        matched = matched.withColumn("n_candidates", F.count(F.lit(1)).over(mult))
        return matched.select(
            F.col("caller_id").alias("source_id"),
            "target_id",
            F.lit("definition_nodes").alias("source_table"),
            F.lit("definition_nodes").alias("target_table"),
            F.when(F.col("n_candidates") == 1, F.lit(S.CALLS))
            .otherwise(F.lit(S.AMBIGUOUSLY_CALLS))
            .alias("type"),
            F.col("start_byte").alias("source_start_byte"),
            F.col("end_byte").alias("source_end_byte"),
            F.col("start_line").alias("source_start_line"),
            F.col("end_line").alias("source_end_line"),
            F.col("start_col").alias("source_start_col"),
            F.col("end_col").alias("source_end_col"),
        )

    # candidate definitions by name (broadcast definition map, J7).
    # Pinned to one partition (r9, guide §1.2): this frame is the broadcast
    # build side at several join sites across the edge-table plans, and every
    # downstream action (each table write, each splice materialization)
    # re-ran its derivation per site — ~0.4-0.7 s per broadcast build on a
    # 32-thread local session, the single largest slice of the ~150
    # broadcast jobs one index run dispatched. A broadcastable frame is by
    # definition small enough to serialize through one task, so coalesce(1)
    # + localCheckpoint costs one pass and makes every later broadcast build
    # a single-task scan of the pinned rows.
    from knowledge_graph_spark.persist import pin_small

    target_defs = pin_small(
        definitions.select(
            F.col("id").alias("target_id"),
            F.col("name").alias("callee"),
            F.col("fqn").alias("_tfqn"),
        ).coalesce(1)
    )
    # constructor preference (expression_resolver.rs:741-749,1459-1468): a
    # bare call naming a class resolves to `{class}.<init>` when an explicit
    # secondary constructor exists — the class row is only the fallback.
    # `<init>` names exist only for Kotlin, so no language gate is needed;
    # overloaded ctors fan out and land as AMBIGUOUSLY_CALLS, mirroring the
    # reference's duplicated-definitions path.
    ctors = definitions.filter(F.col("name") == "<init>").select(
        F.expr("substring(fqn, 1, length(fqn) - 7)").alias("_ctor_of"),
        F.col("id").alias("_ctor_id"),
    )
    matched = (
        bare_calls.join(F.broadcast(target_defs), "callee")
        .join(F.broadcast(ctors), F.col("_tfqn") == F.col("_ctor_of"), "left")
        .withColumn("target_id", F.coalesce("_ctor_id", "target_id"))
        .drop("_tfqn", "_ctor_of", "_ctor_id")
    )
    def_refs = _ref_edges(matched)

    # receiver-typed calls (Ruby/Java): resolve within the receiver's type —
    # singleton calls to SingletonMethod defs, instance calls to Methods —
    # walking the inheritance chain when the type itself lacks the method
    # (the reference's find_method_in_hierarchy, scope_resolver.rs:155-185;
    # Java has no singleton def type, so flavor matching is Ruby-only)
    typed_targets = definitions.select(
        F.col("id").alias("target_id"),
        F.col("name").alias("tcallee"),
        F.col("_container").alias("tcontainer"),
        F.when(F.col("definition_type") == "SingletonMethod", F.lit("singleton"))
        .otherwise(F.lit("instance"))
        .alias("tflavor"),
    ).filter(F.col("tcontainer").isNotNull())
    # extension functions join the receiver type's member set (the FQN stays
    # receiver-free): `extendMe.printValue()` with extendMe : ExtendMe hits
    # `fun ExtendMe.printValue()` wherever it is defined
    typed_targets = typed_targets.unionByName(
        definitions.filter(F.col("_ext_receiver").isNotNull()).select(
            F.col("id").alias("target_id"),
            F.col("name").alias("tcallee"),
            F.col("_ext_receiver").alias("tcontainer"),
            F.lit("instance").alias("tflavor"),
        )
    )
    inherits = (
        entities.filter(F.col("kind") == "inherits")
        .select(
            F.element_at(F.split(F.col("parent_chain"), r"\."), -1).alias("child"),
            F.col("name").alias("parent"),
        )
        .distinct()
    )
    # short-circuit: corpora without receiver-typed calls (pure Python/TS)
    # skip the 4-round chase entirely — it would add ~8 joins of empties to
    # every downstream plan otherwise. ONE aggregation over the cached
    # pre-join entity rows decides all three branches — receiver_type is an
    # extraction-time column, so probing it must not pull the
    # definitions/dense-id lineage the post-join `calls` frame carries
    # (three separate isEmpty() probes here cost ~5x on the build-heavy
    # pipeline queries)
    _rt = F.col("receiver_type")
    _flags = (
        entities.filter((F.col("kind") == "call") & _rt.isNotNull())
        .agg(
            F.count(F.lit(1)).alias("nr"),
            F.count(F.when(_rt.contains("#"), 1)).alias("nh"),
            F.count(F.when(_rt.contains("|"), 1)).alias("nm"),
        )
        .first()
    )
    has_recv = _flags["nr"] > 0

    # The whole receiver-resolution decision — property hop, LCA
    # unification, and the 4-round inheritance chase — is a pure function of
    # (callee, receiver_type, language, call_flavor), never of the call
    # site. r9 (guide §1.2/§8, verdict task #1): run each decision ONCE over
    # the DISTINCT keys and pin the resulting key→answer maps; call rows
    # re-attach with one broadcast join each. Before, the per-row chase
    # embedded the typed_targets/inherits subtrees ~12× in the
    # definition_relationships plan AND re-embedded the whole resolved
    # subtree in the unresolved anti-join, so every downstream action
    # (each table write, each splice pass) re-built dozens of broadcast
    # relations (~0.4-0.7 s per build); the key-level maps also retire the
    # O(call-rows) mid-build checkpoint the hop/LCA rewrites used to need.
    if has_recv or _flags["nh"] > 0 or _flags["nm"] > 0:
        # pinned like target_defs: these are the build sides the decision
        # passes below join repeatedly
        typed_targets = pin_small(typed_targets.coalesce(1))
        inherits = pin_small(inherits.coalesce(1))

    # property-hop receivers ("ExtendMe#reversed" from `x.prop.method()`
    # with x typed): resolve prop through the global extension/member map —
    # the property's result type becomes the receiver
    # (kotlin/tests.rs:517-538: extendMe.reversed.printValue() via the
    # cross-file extension property typed ExtendMe)
    has_hop = _flags["nh"] > 0
    if has_hop:
        plain = recv_calls.filter(~F.col("receiver_type").contains("#"))
        hop = recv_calls.filter(F.col("receiver_type").contains("#"))
        ext_members = (
            entities.filter(F.col("kind") == "ext_member")
            .select(
                F.col("receiver_type").alias("_mcont"),
                F.col("name").alias("_mname"),
                F.col("member_type").alias("_mtype"),
            )
            .distinct()
        )
        # key-level: receiver_type → hopped receiver(s); fan-out per map row
        # matches the old per-row join exactly
        hop_map = pin_small(
            hop.select("receiver_type")
            .distinct()
            .withColumn("_hcont", F.split("receiver_type", "#")[0])
            .withColumn("_hattr", F.split("receiver_type", "#")[1])
            .join(
                F.broadcast(ext_members),
                (F.col("_hcont") == F.col("_mcont"))
                & (F.col("_hattr") == F.col("_mname")),
            )
            .select(
                F.col("receiver_type").alias("_hop_rt"),
                F.col("_mtype").alias("_hop_to"),
            )
            .coalesce(1)
        )
        hop = (
            hop.join(F.broadcast(hop_map), F.col("receiver_type") == F.col("_hop_rt"))
            .drop("receiver_type", "_hop_rt")
            .withColumnRenamed("_hop_to", "receiver_type")
        )
        recv_calls = plain.unionByName(hop.select(*plain.columns))

    # branch-typed receivers ("Admin|User", pipe-joined by the extractor's
    # when/if/try expression scan) resolve to the set's LEAST COMMON
    # ANCESTOR through the inherits closure — the reference's
    # resolve_common_ancestor_type (kotlin/expression_resolver.rs:325-384,
    # 1560-1640): walk the FIRST branch's ancestor chain in BFS order and
    # pick the first type that every other branch also reaches and that
    # names a known definition. All set algebra — explode branches, join a
    # bounded-depth ancestor closure, count distinct branches per candidate.
    # The LCA is a function of the receiver_type STRING alone, so it is
    # computed per distinct string and attached by broadcast join.
    has_multi = _flags["nm"] > 0
    if has_multi:
        single = recv_calls.filter(~F.col("receiver_type").contains("|"))
        multi = recv_calls.filter(F.col("receiver_type").contains("|"))
        rts = multi.select("receiver_type").distinct()
        br = rts.select(
            "receiver_type",
            F.posexplode(F.split("receiver_type", r"\|")).alias("_bi", "_btype"),
        )
        k_of = br.groupBy("receiver_type").agg(F.countDistinct("_bi").alias("_k"))
        # ancestor closure, identity at depth 0, superclass hops ≤ 4 (the
        # same bound as the per-receiver chase below)
        anc = br.select(
            "receiver_type", "_bi", F.col("_btype").alias("_anc"), F.lit(0).alias("_depth")
        )
        cur_anc = anc
        for _d in range(1, 5):
            cur_anc = (
                cur_anc.join(F.broadcast(inherits), cur_anc["_anc"] == inherits["child"])
                .drop("_anc", "child")
                .withColumnsRenamed({"parent": "_anc"})
                .withColumn("_depth", F.lit(_d))
            )
            anc = anc.unionByName(cur_anc.select(*anc.columns))
        # candidate must name a definition that HAS members (the reference
        # additionally requires definition_nodes contains the fqn —
        # containers-with-members is the subset resolution can succeed on)
        containers = typed_targets.select(F.col("tcontainer").alias("_anc")).distinct()
        common = (
            anc.join(F.broadcast(containers), "_anc")
            .groupBy("receiver_type", "_anc")
            .agg(
                F.countDistinct("_bi").alias("_nb"),
                F.min(F.when(F.col("_bi") == 0, F.col("_depth"))).alias("_d0"),
            )
            .join(k_of, ["receiver_type"])
            .filter((F.col("_nb") == F.col("_k")) & F.col("_d0").isNotNull())
        )
        _w = Window.partitionBy("receiver_type").orderBy("_d0", "_anc")
        lca_map = pin_small(
            common.withColumn("_rn", F.row_number().over(_w))
            .filter(F.col("_rn") == 1)
            .select(F.col("receiver_type").alias("_lca_rt"), F.col("_anc").alias("_lca"))
            .coalesce(1)
        )
        recv_calls = single.unionByName(
            multi.join(F.broadcast(lca_map), F.col("receiver_type") == F.col("_lca_rt"))
            .drop("receiver_type", "_lca_rt")
            .withColumnRenamed("_lca", "receiver_type")
            .select(*multi.columns)
        )
    # the chase, over DISTINCT keys: rows with equal keys follow identical
    # match/climb paths, so looping over keys and re-attaching is row-for-row
    # identical to looping over call rows (multi-parent fan-outs included —
    # the climb join fans keys out exactly as it fanned rows out). _rt0
    # remembers the pre-climb receiver so resolved targets re-attach to the
    # original rows.
    recv_resolved = None
    resolved_map = None
    if has_recv:
        recv_keys = pin_small(
            recv_calls.select("callee", "receiver_type", "language", "call_flavor")
            .distinct()
            .withColumn("_rt0", F.col("receiver_type"))
            .coalesce(1)
        )
        cur = recv_keys
        key_matches = None
        for _depth in range(4):  # type itself + 3 superclass hops
            m = cur.join(
                F.broadcast(typed_targets),
                (F.col("callee") == F.col("tcallee"))
                & (F.col("receiver_type") == F.col("tcontainer"))
                & ((F.col("call_flavor") == F.col("tflavor")) | (F.col("language") != "Ruby")),
            ).drop("tcallee", "tcontainer", "tflavor")
            key_matches = m if key_matches is None else key_matches.unionByName(m)
            # unmatched keys climb to the superclass; types without a
            # recorded parent drop out (unresolvable, like the reference)
            survivors = cur.join(
                typed_targets,
                (F.col("callee") == F.col("tcallee"))
                & (F.col("receiver_type") == F.col("tcontainer")),
                "left_anti",
            )
            cur = (
                survivors.join(
                    F.broadcast(inherits),
                    survivors.receiver_type == inherits.child,
                )
                .drop("receiver_type", "child")
                .withColumnRenamed("parent", "receiver_type")
            )
        resolved_map = pin_small(
            key_matches.select(
                F.col("callee").alias("_rk_callee"),
                F.col("_rt0").alias("_rk_rt"),
                F.col("language").alias("_rk_lang"),
                F.col("call_flavor").alias("_rk_flavor"),
                "target_id",
            ).coalesce(1)
        )
        # null-safe on every key: a null-language (or null-flavor) key can
        # still match in the chase via the flavor/Ruby OR, and the distinct
        # keeps it as a key row — plain equality here would drop rows the
        # old per-row loop kept
        _attach = (
            F.col("callee").eqNullSafe(F.col("_rk_callee"))
            & F.col("receiver_type").eqNullSafe(F.col("_rk_rt"))
            & F.col("language").eqNullSafe(F.col("_rk_lang"))
            & F.col("call_flavor").eqNullSafe(F.col("_rk_flavor"))
        )
        recv_resolved = recv_calls.join(F.broadcast(resolved_map), _attach).drop(
            "_rk_callee", "_rk_rt", "_rk_lang", "_rk_flavor"
        )
        def_refs = def_refs.unionByName(_ref_edges(recv_resolved))

    # unresolved-by-defs calls matching an import in the same file → def→imp
    unmatched = bare_calls.join(target_defs, "callee", "left_anti")
    imp_targets = imported.select(
        F.col("id").alias("target_id"),
        F.col("name").alias("callee"),
        F.col("file_path").alias("call_file"),
    )
    def _imp_edges(joined):
        return joined.select(
            F.col("caller_id").alias("source_id"),
            "target_id",
            F.lit("definition_nodes").alias("source_table"),
            F.lit("imported_symbol_nodes").alias("target_table"),
            F.lit(S.CALLS).alias("type"),
            F.col("start_byte").alias("source_start_byte"),
            F.col("end_byte").alias("source_end_byte"),
            F.col("start_line").alias("source_start_line"),
            F.col("end_line").alias("source_end_line"),
            F.col("start_col").alias("source_start_col"),
            F.col("end_col").alias("source_end_col"),
        )

    imp_refs = _imp_edges(unmatched.join(imp_targets, ["callee", "call_file"]))
    if has_recv:
        # receiver-typed calls whose receiver is an IMPORTED type
        # (`List.of(...)` with `import java.util.List`) → call to the
        # imported symbol, the reference's find_calls_to_imported_symbol
        # surface
        recv_unresolved = recv_calls.join(
            recv_resolved.select("call_file", "caller_id", "start_byte").distinct(),
            ["call_file", "caller_id", "start_byte"],
            "left_anti",
        )
        recv_imp = recv_unresolved.drop("callee").withColumnRenamed(
            "receiver_type", "callee"
        )
        imp_refs = imp_refs.unionByName(
            _imp_edges(recv_imp.join(imp_targets, ["callee", "call_file"]))
        )
    definition_relationships = hier.unionByName(def_refs.select(*_EDGE_COLS)).unionByName(
        imp_refs.select(*_EDGE_COLS)
    )

    # ---- import resolution (J9: candidate paths → files, priority order) --
    # Python interfile semantics (interfile.rs:18-162):
    #   - relative imports (`from .foo import x`, `from .. import y`) climb
    #     `level` = dot-count segments from the importing FILE — one climb
    #     drops the filename (same package); `__init__.py` needs no special
    #     case because its package dir IS its parent (interfile.rs:63-83);
    #   - a dots-only clause targets the package's `__init__.py`
    #     (interfile.rs:89-94);
    #   - absolute imports resolve against get_root_dirs() — the repo root
    #     plus every package's parent directory (compute_root_dirs,
    #     types.rs:659-682) — and the importing file's own directory
    #     (interfile.rs:108-121); candidate priority here is repo root,
    #     importing dir, then package-parent roots;
    #   - per search path the module file precedes the package __init__
    #     (interfile.rs:144-150), and lookups are case-insensitive over the
    #     denormalized tree (interfile.rs:26-27,42).
    # TS relative imports resolve against the importing file's directory
    # ('./base_model' in app/models/user_model.ts → app/models/base_model.ts;
    # one '../' level supported); bare module specifiers ('crypto') get no
    # file candidate — they are external, like the reference's unresolved
    # node_modules imports. NULL array entries are dropped by the join.
    _dir = F.when(
        F.col("file_path").contains("/"),
        F.regexp_replace("file_path", r"/[^/]*$", ""),
    ).otherwise(F.lit(""))
    _ts_rel = F.when(
        F.col("import_path").startswith("./"),
        F.concat_ws(
            "/",
            F.when(_dir != "", _dir),
            F.regexp_replace("import_path", r"^\./", ""),
        ),
    ).when(
        F.col("import_path").startswith("../"),
        F.concat_ws(
            "/",
            F.when(
                _dir.contains("/"), F.regexp_replace(_dir, r"/[^/]*$", "")
            ),
            F.regexp_replace("import_path", r"^\.\./", ""),
        ),
    )

    def _under(base, tail):
        # base + "/" + tail, collapsing the empty-base (repo root) case
        return F.when(base != "", F.concat(base, F.lit("/"), tail)).otherwise(tail)

    _segs = F.split("file_path", "/")
    _dots = F.length(F.regexp_extract("import_path", r"^(\.+)", 1))
    _is_py = F.col("file_path").endswith(".py")
    _is_rel = _is_py & (_dots > 0)
    _is_abs = _is_py & (_dots == 0)
    _rel_mod = F.regexp_replace(F.regexp_replace("import_path", r"^\.+", ""), r"\.", "/")
    _rel_base = F.array_join(
        F.slice(_segs, 1, F.greatest(F.size(_segs) - _dots, F.lit(0))), "/"
    )
    _abs_mod = F.regexp_replace("import_path", r"\.", "/")
    cand = imported.select(
        F.col("id").alias("imp_id"),
        F.col("name").alias("imp_name"),
        F.posexplode(
            F.array(
                # absolute, repo root (module file > package __init__)
                F.when(_is_abs, F.concat(_abs_mod, F.lit(".py"))),
                F.when(_is_abs, F.concat(_abs_mod, F.lit("/__init__.py"))),
                # absolute, importing file's directory
                F.when(_is_abs, _under(_dir, F.concat(_abs_mod, F.lit(".py")))),
                F.when(_is_abs, _under(_dir, F.concat(_abs_mod, F.lit("/__init__.py")))),
                # relative, climbed base
                F.when(
                    _is_rel & (_rel_mod != ""),
                    _under(_rel_base, F.concat(_rel_mod, F.lit(".py"))),
                ),
                F.when(
                    _is_rel,
                    F.when(
                        _rel_mod != "",
                        _under(_rel_base, F.concat(_rel_mod, F.lit("/__init__.py"))),
                    ).otherwise(_under(_rel_base, F.lit("__init__.py"))),
                ),
                F.concat(F.col("import_path"), F.lit(".rb")),
                F.concat(_ts_rel, F.lit(".ts")),
                F.concat(_ts_rel, F.lit("/index.ts")),
            )
        ).alias("priority", "cand_path"),
    )
    # additional absolute-import search roots: the parent dir of every
    # package (grandparent of each __init__.py) — the reference's
    # compute_root_dirs (types.rs:659-682) so `from package.module import X`
    # resolves when the package lives under src/. Root-first priority is
    # preserved: these rank AFTER the repo-root and importing-dir candidates
    # (priorities 10/11 vs 0-5).
    pkg_roots = (
        file_nodes.filter(F.col("path").rlike(r".+/[^/]+/__init__\.py$"))
        .select(
            F.regexp_replace(F.col("path"), r"/[^/]+/__init__\.py$", "").alias(
                "pkg_root"
            )
        )
        .distinct()
    )
    cand_roots = (
        imported.filter(_is_abs)
        .select(
            F.col("id").alias("imp_id"),
            F.col("name").alias("imp_name"),
            _abs_mod.alias("_mod"),
        )
        .join(F.broadcast(pkg_roots))
        .select(
            "imp_id",
            "imp_name",
            F.posexplode(
                F.array(
                    F.concat(F.col("pkg_root"), F.lit("/"), F.col("_mod"), F.lit(".py")),
                    F.concat(
                        F.col("pkg_root"), F.lit("/"), F.col("_mod"), F.lit("/__init__.py")
                    ),
                )
            ).alias("p0", "cand_path"),
        )
        .select("imp_id", "imp_name", (F.col("p0") + F.lit(10)).alias("priority"), "cand_path")
    )
    cand = cand.unionByName(cand_roots)
    # case-insensitivity is a PYTHON resolver property (the reference's
    # denormalized tree, interfile.rs:26-27,42); .rb/.ts candidates match
    # exactly. The window adds the matched path for a deterministic winner
    # when two files differ only by case.
    _cand_is_py = cand.cand_path.endswith(".py")
    resolved_file = (
        cand.join(
            file_nodes.select(F.col("id").alias("file_id"), "path"),
            (_cand_is_py & (F.lower(cand.cand_path) == F.lower(F.col("path"))))
            | (~_cand_is_py & (cand.cand_path == F.col("path"))),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("imp_id").orderBy("priority", "cand_path", "path")
            ),
        )
        .filter(F.col("rk") == 1)
        .cache()
    )
    # imp → {definition | re-exporting import} in the resolved file: both
    # same-effective-name bindings compete and the LATEST binding wins
    # (Python shadowing — python/analyzer.rs:851-900 picks max start_byte,
    # ties prefer the definition). A re-export win yields an
    # IMPORTED_SYMBOL_TO_IMPORTED_SYMBOL edge, the link resolve_import_chains
    # (J8) follows to the terminal definition/file.
    def_cand = resolved_file.join(
        definitions.select(
            F.col("id").alias("target_id"),
            F.col("name").alias("imp_name"),
            F.col("primary_file_path").alias("path"),
            F.col("primary_start_byte").alias("bound_at"),
        ),
        ["imp_name", "path"],
    ).withColumn("target_table", F.lit("definition_nodes"))
    reexp_cand = (
        resolved_file.join(
            imported.select(
                F.col("id").alias("target_id"),
                F.coalesce("alias", "name").alias("imp_name"),
                F.col("file_path").alias("path"),
                F.col("start_byte").alias("bound_at"),
            ),
            ["imp_name", "path"],
        )
        .filter(F.col("target_id") != F.col("imp_id"))
        .withColumn("target_table", F.lit("imported_symbol_nodes"))
    )
    winners = (
        def_cand.unionByName(reexp_cand)
        .withColumn(
            "rk2",
            F.row_number().over(
                Window.partitionBy("imp_id").orderBy(
                    F.desc("bound_at"), "target_table", "target_id"
                )
            ),
        )
        .filter(F.col("rk2") == 1)
    )
    # every resolved import keeps its imp→file edge (the navigational "which
    # file does this import land in" link — interfile.rs candidate semantics,
    # e.g. `from .. import x` → parent package __init__.py), even when a
    # re-export also wins an imp→imp edge: chain resolution (J8) follows
    # imp→imp preferentially (deepest resolution wins, graph/algorithms.py
    # resolve_import_chains), so the depth-0 file edge cannot short-circuit
    # the chain the way a min-depth settle rule would.
    imp_file = resolved_file.select(
        F.col("imp_id").alias("source_id"),
        F.col("file_id").alias("target_id"),
        F.lit("imported_symbol_nodes").alias("source_table"),
        F.lit("file_nodes").alias("target_table"),
        F.lit(S.IMPORTED_SYMBOL_TO_FILE).alias("type"),
    )
    imp_resolved = winners.select(
        F.col("imp_id").alias("source_id"),
        "target_id",
        F.lit("imported_symbol_nodes").alias("source_table"),
        "target_table",
        F.when(
            F.col("target_table") == "definition_nodes",
            F.lit(S.IMPORTED_SYMBOL_TO_DEFINITION),
        )
        .otherwise(F.lit(S.IMPORTED_SYMBOL_TO_IMPORTED_SYMBOL))
        .alias("type"),
    )
    imported_symbol_relationships = _null_loc(imp_file.unionByName(imp_resolved)).select(
        *_EDGE_COLS
    )

    nodes = {
        "directory_nodes": directories.select(*[f.name for f in S.DIRECTORY_NODE]),
        "file_nodes": file_nodes.select(*[f.name for f in S.FILE_NODE]),
        "definition_nodes": definitions.select(*[f.name for f in S.DEFINITION_NODE]),
        "imported_symbol_nodes": imported.select(*[f.name for f in S.IMPORTED_SYMBOL_NODE]),
    }
    edges = {
        "directory_relationships": directory_relationships,
        "file_relationships": file_relationships,
        "definition_relationships": definition_relationships,
        "imported_symbol_relationships": imported_symbol_relationships,
    }
    # per-file line inventory — REAL source text, so context-snippet queries
    # (search_with_context / search_xml) join actual ±N lines instead of a
    # definition-derived rendering (file_reader_utils.rs:1-252); line_no is
    # 0-based, matching the extractor's start_line
    file_lines = files.select(
        "path",
        F.posexplode(
            F.split(F.decode(F.col("content"), "UTF-8"), "\n")
        ).alias("line_no", "line_text"),
    ).select("path", F.col("line_no").cast("int").alias("line_no"), "line_text")
    kg = KnowledgeGraph(spark, nodes, edges, repository_name, file_lines=file_lines)
    # Spark's cache manager substitutes cached data by logical-plan equality:
    # a second index run over the same path would silently reuse THIS run's
    # cached content. The orchestrator must unpersist these after the graph
    # is materialized (indexer.index_repository does).
    kg._cached_intermediates = [
        files, entities, directories, file_nodes, definitions, imported, resolved_file
    ]
    return kg
