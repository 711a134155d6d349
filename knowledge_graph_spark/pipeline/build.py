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
    directories = assign_dense_ids(directories, ["path"]).cache()

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
    file_nodes = assign_dense_ids(file_nodes, ["path"]).cache()

    # ---- definition nodes (D5) -------------------------------------------
    defs = entities.filter(F.col("kind") == "definition")
    definitions = defs.select(
        F.concat_ws(
            ".",
            _module_fqn(),
            F.col("parent_chain"),
            F.col("name"),
        ).alias("fqn"),
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
    )
    definitions = assign_dense_ids(
        definitions, ["primary_file_path", "primary_start_byte", "primary_end_byte"]
    ).cache()

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
    imported = assign_dense_ids(imported, ["file_path", "start_byte", "end_byte", "name"]).cache()

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

    # ---- definition hierarchy (D6: parent fqn → child fqn self-join) ------
    child = definitions.filter(F.col("fqn").contains("."))
    parent_fqn = F.regexp_replace(F.col("fqn"), r"\.[^.]+$", "")
    hier = (
        child.withColumn("parent_fqn", parent_fqn)
        .alias("c")
        .join(
            definitions.alias("p"),
            (F.col("c.parent_fqn") == F.col("p.fqn"))
            & (F.col("c.primary_file_path") == F.col("p.primary_file_path")),
        )
        .select(
            F.col("p.id").alias("source_id"),
            F.col("c.id").alias("target_id"),
            F.lit("definition_nodes").alias("source_table"),
            F.lit("definition_nodes").alias("target_table"),
            F.concat(
                F.upper(F.col("p.definition_type")),
                F.lit("_TO_"),
                F.upper(F.col("c.definition_type")),
            ).alias("type"),
        )
    )
    hier = _null_loc(hier).select(*_EDGE_COLS)

    # ---- reference resolution (D7) ---------------------------------------
    calls = entities.filter(
        (F.col("kind") == "call") & F.col("parent_chain").isNotNull()
    ).select(
        F.col("path").alias("call_file"),
        F.concat_ws(".", _module_fqn(), F.col("parent_chain")).alias("caller_fqn"),
        F.col("name").alias("callee"),
        "start_line",
        "end_line",
        "start_col",
        "end_col",
        "start_byte",
        "end_byte",
    )
    caller = definitions.select(F.col("id").alias("caller_id"), F.col("fqn").alias("caller_fqn"))
    calls = calls.join(caller, "caller_fqn")

    # candidate definitions by name (broadcast definition map, J7)
    target_defs = definitions.select(F.col("id").alias("target_id"), F.col("name").alias("callee"))
    matched = calls.join(F.broadcast(target_defs), "callee")
    mult = Window.partitionBy("caller_id", "start_byte")
    matched = matched.withColumn("n_candidates", F.count(F.lit(1)).over(mult))
    def_refs = matched.select(
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

    # unresolved-by-defs calls matching an import in the same file → def→imp
    unmatched = calls.join(target_defs, "callee", "left_anti")
    imp_targets = imported.select(
        F.col("id").alias("target_id"),
        F.col("name").alias("callee"),
        F.col("file_path").alias("call_file"),
    )
    imp_refs = unmatched.join(imp_targets, ["callee", "call_file"]).select(
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
    definition_relationships = hier.unionByName(def_refs.select(*_EDGE_COLS)).unionByName(
        imp_refs.select(*_EDGE_COLS)
    )

    # ---- import resolution (J9: candidate paths → files, priority order) --
    cand = imported.select(
        F.col("id").alias("imp_id"),
        F.col("name").alias("imp_name"),
        F.posexplode(
            F.array(
                F.concat(F.regexp_replace("import_path", r"\.", "/"), F.lit(".py")),
                F.concat(F.regexp_replace("import_path", r"\.", "/"), F.lit("/__init__.py")),
                F.concat(F.col("import_path"), F.lit(".rb")),
                F.concat(F.regexp_replace("import_path", r"^\./", ""), F.lit(".ts")),
            )
        ).alias("priority", "cand_path"),
    )
    resolved_file = (
        cand.join(file_nodes.select(F.col("id").alias("file_id"), "path"), cand.cand_path == F.col("path"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("imp_id").orderBy("priority", "cand_path")
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
    # a re-export win replaces the file link entirely (the reference's
    # from-import branch emits imp→imp only, never imp→file — an imp→file
    # terminal here would short-circuit chain resolution at depth 0)
    reexport_won = winners.filter(
        F.col("target_table") == "imported_symbol_nodes"
    ).select("imp_id")
    imp_file = resolved_file.join(reexport_won, "imp_id", "left_anti").select(
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
    kg = KnowledgeGraph(spark, nodes, edges, repository_name)
    # Spark's cache manager substitutes cached data by logical-plan equality:
    # a second index run over the same path would silently reuse THIS run's
    # cached content. The orchestrator must unpersist these after the graph
    # is materialized (indexer.index_repository does).
    kg._cached_intermediates = [
        files, entities, directories, file_nodes, definitions, imported, resolved_file
    ]
    return kg
