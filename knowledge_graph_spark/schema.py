"""Fixed graph schema — Spark StructTypes mirroring the reference's static DDL.

Reference: crates/database/src/schema/init.rs:4-144 (node + rel tables),
crates/database/src/schema/types.rs:272-286 (implicit source_id/target_id
columns on edge parquet), crates/database/src/graph/relationship.rs:5-115
(logical edge-type vocabulary carried in the ``type`` discriminator column).

Deviations from the reference, documented:
- ids are Spark ``long`` (the reference uses dense u32; long covers the u32
  range and is Spark's native integral join type — no boxing, codegen-friendly).
- line/col counters stay ``int`` (i32 in the reference), byte offsets ``long``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Node tables (schema/init.rs:4-67)
# ---------------------------------------------------------------------------

DIRECTORY_NODE = StructType(
    [
        StructField("id", LongType(), False),
        StructField("path", StringType(), False),
        StructField("absolute_path", StringType(), True),
        StructField("repository_name", StringType(), True),
        StructField("name", StringType(), True),
    ]
)

FILE_NODE = StructType(
    [
        StructField("id", LongType(), False),
        StructField("path", StringType(), False),
        StructField("absolute_path", StringType(), True),
        StructField("language", StringType(), True),
        StructField("repository_name", StringType(), True),
        StructField("extension", StringType(), True),
        StructField("name", StringType(), True),
    ]
)

DEFINITION_NODE = StructType(
    [
        StructField("id", LongType(), False),
        StructField("fqn", StringType(), False),
        StructField("name", StringType(), True),
        StructField("definition_type", StringType(), True),
        StructField("primary_file_path", StringType(), True),
        StructField("primary_start_byte", LongType(), True),
        StructField("primary_end_byte", LongType(), True),
        StructField("start_line", IntegerType(), True),
        StructField("end_line", IntegerType(), True),
        StructField("start_col", IntegerType(), True),
        StructField("end_col", IntegerType(), True),
        StructField("total_locations", IntegerType(), True),
    ]
)

IMPORTED_SYMBOL_NODE = StructType(
    [
        StructField("id", LongType(), False),
        StructField("import_type", StringType(), True),
        StructField("import_path", StringType(), False),
        StructField("name", StringType(), True),
        StructField("alias", StringType(), True),
        StructField("file_path", StringType(), True),
        StructField("start_byte", LongType(), True),
        StructField("end_byte", LongType(), True),
        StructField("start_line", IntegerType(), True),
        StructField("end_line", IntegerType(), True),
        StructField("start_col", IntegerType(), True),
        StructField("end_col", IntegerType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Relationship tables — one shared column layout (schema/init.rs:79-92 with the
# implicit endpoint ids of schema/types.rs:272-286 prepended)
# ---------------------------------------------------------------------------

# ``source_table``/``target_table`` make the (from, to) pair explicit per row:
# the reference stores one parquet file per pair (schema/types.rs:249-255) and
# Kuzu rel tables are pair-aware; ids are dense PER node table, so without the
# discriminator a def→imp edge could join a definition with the same id.
RELATIONSHIP = StructType(
    [
        StructField("source_id", LongType(), False),
        StructField("target_id", LongType(), False),
        StructField("source_table", StringType(), False),
        StructField("target_table", StringType(), False),
        StructField("type", StringType(), False),
        StructField("source_start_byte", LongType(), True),
        StructField("source_end_byte", LongType(), True),
        StructField("source_start_line", IntegerType(), True),
        StructField("source_end_line", IntegerType(), True),
        StructField("source_start_col", IntegerType(), True),
        StructField("source_end_col", IntegerType(), True),
    ]
)

NODE_TABLES: dict[str, StructType] = {
    "directory_nodes": DIRECTORY_NODE,
    "file_nodes": FILE_NODE,
    "definition_nodes": DEFINITION_NODE,
    "imported_symbol_nodes": IMPORTED_SYMBOL_NODE,
}

# Physical edge tables and their admissible (from, to) node-table pairs
# (schema/init.rs:96-137; query_builder.rs:62-91 declares the multi-pair DDL).
EDGE_TABLES: dict[str, list[tuple[str, str]]] = {
    "directory_relationships": [
        ("directory_nodes", "directory_nodes"),
        ("directory_nodes", "file_nodes"),
    ],
    "file_relationships": [
        ("file_nodes", "definition_nodes"),
        ("file_nodes", "imported_symbol_nodes"),
    ],
    "definition_relationships": [
        ("definition_nodes", "definition_nodes"),
        ("definition_nodes", "imported_symbol_nodes"),
    ],
    "imported_symbol_relationships": [
        ("imported_symbol_nodes", "imported_symbol_nodes"),
        ("imported_symbol_nodes", "definition_nodes"),
        ("imported_symbol_nodes", "file_nodes"),
    ],
}

# Logical edge types (graph/relationship.rs:5-115) — the subset that carries
# query semantics in the library; hierarchy kinds are generated as
# {PARENT}_TO_{CHILD} over these definition kinds.
DIR_CONTAINS_DIR = "DIR_CONTAINS_DIR"
DIR_CONTAINS_FILE = "DIR_CONTAINS_FILE"
FILE_DEFINES = "FILE_DEFINES"
FILE_IMPORTS = "FILE_IMPORTS"
CALLS = "CALLS"
AMBIGUOUSLY_CALLS = "AMBIGUOUSLY_CALLS"
PROPERTY_REFERENCE = "PROPERTY_REFERENCE"
DEFINES_IMPORTED_SYMBOL = "DEFINES_IMPORTED_SYMBOL"
IMPORTED_SYMBOL_TO_IMPORTED_SYMBOL = "IMPORTED_SYMBOL_TO_IMPORTED_SYMBOL"
IMPORTED_SYMBOL_TO_DEFINITION = "IMPORTED_SYMBOL_TO_DEFINITION"
IMPORTED_SYMBOL_TO_FILE = "IMPORTED_SYMBOL_TO_FILE"

# Reference kinds used by reference-resolution queries
# (get_references/repository.rs:36-54 filters on this set).
REFERENCE_EDGE_TYPES = (CALLS, AMBIGUOUSLY_CALLS, PROPERTY_REFERENCE)

# Closed type sets per physical edge table (definition_relationships is an
# OPEN set — hierarchy kinds are generated as {PARENT}_TO_{CHILD} — so it is
# deliberately absent). Lets typed traversals prune whole tables instead of
# scanning the full edge union.
CLOSED_EDGE_TYPES_BY_TABLE: dict[str, frozenset[str]] = {
    "directory_relationships": frozenset({DIR_CONTAINS_DIR, DIR_CONTAINS_FILE}),
    "file_relationships": frozenset({FILE_DEFINES, FILE_IMPORTS}),
    "imported_symbol_relationships": frozenset(
        {
            IMPORTED_SYMBOL_TO_IMPORTED_SYMBOL,
            IMPORTED_SYMBOL_TO_DEFINITION,
            IMPORTED_SYMBOL_TO_FILE,
        }
    ),
}


def tables_for_edge_types(edge_types) -> list[str]:
    """Edge tables that can contain any of ``edge_types`` (all when None).

    A table with a closed type set is included iff it intersects the request;
    the open-set definition_relationships table is included unless every
    requested type is claimed by some closed set."""
    if not edge_types:
        return list(EDGE_TABLES)
    wanted = set(edge_types)
    claimed = frozenset().union(*CLOSED_EDGE_TYPES_BY_TABLE.values())
    out = []
    for table in EDGE_TABLES:
        closed = CLOSED_EDGE_TYPES_BY_TABLE.get(table)
        if closed is None:
            if not wanted <= claimed:
                out.append(table)
        elif closed & wanted:
            out.append(table)
    return out

DEFINITION_KINDS = (
    "Module",
    "Class",
    "Interface",
    "Function",
    "Method",
    "SingletonMethod",
    "Constructor",
    "Property",
    "Constant",
    "Lambda",
    "Proc",
    "EnumEntry",
)

LANGUAGES = ("Ruby", "Python", "Kotlin", "Java", "CSharp", "TypeScript", "Rust")
