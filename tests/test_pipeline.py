"""End-to-end indexing pipeline tests, mirroring the reference's backbone
strategy (crates/indexer/src/tests.rs: index fixture repo → assert exact
node/edge counts, specific FQNs, relationship types, parquet structure)."""

from __future__ import annotations

import textwrap

import pytest
from pyspark.sql import functions as F

FIXTURE = {
    "app/models/user.py": '''
import os
from app.utils.helpers import format_name

class User:
    def save(self):
        format_name(self.name)
        validate()

    def validate(self):
        return True

def validate():
    return False
''',
    "app/utils/helpers.py": '''
def format_name(name):
    return name.strip()
''',
    "app/facade.py": '''
from app.models.user import format_name

def use_format():
    format_name("x")
''',
    "app/services/user_service.rb": '''
require 'json'

module UserService
  class Syncer
    def sync_users
      fetch_all()
    end
  end
end
''',
    "web/main.ts": '''
import { formatName } from "./util"

export function main() {
  formatName("x")
}

class App {
}
''',
    "web/util.ts": '''
export function formatName(n) {
  return n
}

export const toUpper = (s: string): string => s.toUpperCase()

const handler = async (req) => {
  return formatName(req)
}
''',
    "jvm/Service.java": '''
import java.util.List;

public class Service {
    private final List<String> names;

    public Service() {
        helper();
    }

    public void syncAll() {
        helper();
    }

    public static int helper() {
        return 1;
    }
}
''',
    "jvm/Model.kt": '''
import kotlin.collections.Map

data class Model(val id: Int)

object Registry {
    fun register() {
    }
}
''',
    "dotnet/Handler.cs": '''
using System.Text;

public sealed class Handler {
    public interface IRunner {
    }

    public int Retries { get; set; }

    public Handler() {
    }

    public async Task<int> Process() {
        return 1;
    }
}
''',
    "native/lib.rs": '''
use std::collections::HashMap;

pub struct Engine;

impl Engine {
    pub fn start(&self) {
    }
}

pub trait Runner {
}

pub fn run_engine() {
}
''',
}


@pytest.fixture(scope="module")
def repo_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("fixture-repo")
    for rel, content in FIXTURE.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(textwrap.dedent(content).lstrip("\n"))
    return str(root)


@pytest.fixture(scope="module")
def indexed(spark, repo_dir, tmp_path_factory):
    from knowledge_graph_spark.pipeline.indexer import index_repository

    out = str(tmp_path_factory.mktemp("graph-out"))
    kg, stats = index_repository(spark, repo_dir, out_dir=out, repository_name="fixture")
    return kg, stats


def test_file_and_directory_counts(indexed):
    kg, stats = indexed
    assert stats.total_files == 10
    dirs = {r.path for r in kg.directories.collect()}
    assert dirs == {"app", "app/models", "app/utils", "app/services", "web", "jvm", "dotnet", "native"}


def test_definitions_and_fqns(indexed):
    kg, _ = indexed
    fqns = {r.fqn for r in kg.definitions.collect()}
    assert "app.models.user.User" in fqns
    assert "app.models.user.User.save" in fqns
    assert "app.models.user.User.validate" in fqns
    assert "app.models.user.validate" in fqns  # top-level shadow
    # Ruby FQNs are scope-based with reference separators (Outer::Inner,
    # Class#instance_method) — no file-path prefix
    assert "UserService::Syncer#sync_users" in fqns
    assert "main" in fqns  # TS: scope-based fqn, no file prefix
    # TS arrow-function bindings extract as Function definitions
    assert "toUpper" in fqns and "handler" in fqns
    assert "jvm.Service.Service.syncAll" in fqns
    assert "jvm.Service.Service.helper" in fqns
    assert "jvm.Model.Registry.register" in fqns
    assert "dotnet.Handler.Handler.IRunner" in fqns
    # C# methods, constructors and auto-properties attribute to their class
    assert "dotnet.Handler.Handler.Process" in fqns
    assert "dotnet.Handler.Handler.Handler" in fqns  # constructor
    assert "dotnet.Handler.Handler.Retries" in fqns  # auto-property
    # Java constructor; fields are NOT indexed (java/analyzer.rs:64-69)
    assert "jvm.Service.Service.Service" in fqns
    assert "jvm.Service.Service.names" not in fqns
    assert "native.lib.Engine" in fqns and "native.lib.run_engine" in fqns
    # Rust fns inside `impl Engine` attribute to Engine; the impl block
    # itself emits no definition row
    assert "native.lib.Engine.start" in fqns
    assert not any(".impl" in f or f.endswith("impl") for f in fqns)
    types = dict(
        kg.definitions.groupBy("definition_type").count().collect()
    )
    assert types["Class"] >= 3 and types["Method"] >= 4


def test_hierarchy_edges(indexed):
    kg, _ = indexed
    hier = (
        kg.edges["definition_relationships"]
        .filter(F.col("type") == "CLASS_TO_METHOD")
        .count()
    )
    assert hier >= 3  # User.save, User.validate, Syncer.sync_users
    mod_cls = (
        kg.edges["definition_relationships"]
        .filter(F.col("type") == "MODULE_TO_CLASS")
        .count()
    )
    assert mod_cls == 1  # UserService → Syncer


def test_call_resolution_semantics(indexed):
    """validate() resolves ambiguously (2 defs with that name); format_name
    resolves via defs (2 sites: import + call)."""
    kg, _ = indexed
    refs = (
        kg.edges["definition_relationships"]
        .filter(F.col("type").isin(["CALLS", "AMBIGUOUSLY_CALLS"]))
        .join(
            kg.definitions.select(F.col("id").alias("source_id"), F.col("fqn").alias("src")),
            "source_id",
        )
    )
    rows = {(r.src, r.type) for r in refs.collect()}
    assert ("app.models.user.User.save", "AMBIGUOUSLY_CALLS") in rows  # validate() x2 defs
    # call-site locations present on reference edges (FIXTURES invariant 4)
    assert (
        refs.filter(F.col("source_start_line").isNull()).count() == 0
    )


def test_import_resolution(indexed):
    kg, _ = indexed
    imp_file = kg.edges["imported_symbol_relationships"].filter(
        F.col("type") == "IMPORTED_SYMBOL_TO_FILE"
    )
    resolved = (
        imp_file.join(kg.imports.select(F.col("id").alias("source_id"), "import_path"), "source_id")
        .join(kg.files.select(F.col("id").alias("target_id"), F.col("path").alias("file")), "target_id")
    )
    pairs = {(r.import_path, r.file) for r in resolved.collect()}
    assert ("app.utils.helpers", "app/utils/helpers.py") in pairs
    imp_def = kg.edges["imported_symbol_relationships"].filter(
        F.col("type") == "IMPORTED_SYMBOL_TO_DEFINITION"
    )
    assert imp_def.count() >= 1  # format_name → def in helpers.py


def test_reexport_chain_resolution(indexed, spark):
    """facade.py re-imports format_name THROUGH user.py's import: the builder
    must emit imp→imp (user.py has no def named format_name, only the import
    binding), and resolve_import_chains must walk it to the helpers.py def."""
    from knowledge_graph_spark.graph.algorithms import resolve_import_chains

    kg, _ = indexed
    imp_imp = kg.edges["imported_symbol_relationships"].filter(
        F.col("type") == "IMPORTED_SYMBOL_TO_IMPORTED_SYMBOL"
    )
    pairs = (
        imp_imp.join(
            kg.imports.select(F.col("id").alias("source_id"), F.col("file_path").alias("src_file")),
            "source_id",
        )
        .join(
            kg.imports.select(F.col("id").alias("target_id"), F.col("file_path").alias("dst_file")),
            "target_id",
        )
    )
    assert ("app/facade.py", "app/models/user.py") in {
        (r.src_file, r.dst_file) for r in pairs.collect()
    }

    chains = resolve_import_chains(kg).join(
        kg.imports.select(F.col("id").alias("import_id"), "file_path"), "import_id"
    )
    facade = [r for r in chains.collect() if r.file_path == "app/facade.py"]
    assert facade, "facade import did not resolve"
    row = facade[0]
    assert row.resolved_table == "definition_nodes" and row.depth == 1
    helper_def = kg.definitions.filter(F.col("fqn") == "app.utils.helpers.format_name")
    assert row.resolved_id == helper_def.collect()[0].id


def test_repo_map_walk_depth(indexed):
    """Depth semantics per repo_map/repository.rs: files are included up to
    depth+1 levels below the listed path (depth=1 at root keeps web/main.ts
    but excludes app/models/user.py at level 3)."""
    from knowledge_graph_spark.queries.library import repo_map_walk

    kg, _ = indexed
    d1 = {r.file_path for r in repo_map_walk(kg, paths=("",), depth=1, page_size=200).collect()}
    assert "web/main.ts" in d1 and "app/facade.py" in d1
    assert not any(p.startswith("app/models/") for p in d1)
    d2 = {r.file_path for r in repo_map_walk(kg, paths=("",), depth=2, page_size=200).collect()}
    assert "app/models/user.py" in d2
    scoped = {
        r.file_path
        for r in repo_map_walk(kg, paths=("app",), depth=1, page_size=200).collect()
    }
    assert scoped == {p for p in d2 if p.startswith("app/")}


def test_dense_ids_and_referential_integrity(indexed):
    kg, _ = indexed
    for key in ("directory_nodes", "file_nodes", "definition_nodes", "imported_symbol_nodes"):
        df = kg.nodes[key]
        n = df.count()
        ids = df.agg(F.min("id"), F.max("id"), F.countDistinct("id")).collect()[0]
        assert ids[0] == 1 and ids[1] == n and ids[2] == n, (key, ids)
    # every file-edge endpoint exists (FIXTURES invariant 1)
    fr = kg.edges["file_relationships"]
    bad = fr.join(kg.files.select(F.col("id").alias("source_id")), "source_id", "left_anti")
    assert bad.count() == 0


def test_stats(indexed):
    _, stats = indexed
    assert stats.total_definitions >= 9
    assert stats.files_per_second > 0
    assert set(stats.per_language) == {"Python", "Ruby", "TypeScript", "Java", "Kotlin", "CSharp", "Rust"}


def test_gitignore_filtering(spark, tmp_path):
    """S1 parity: list_files honors .gitignore — dir patterns, globs,
    anchoring, and `!` re-includes with last-match-wins order."""
    from knowledge_graph_spark.pipeline.extract import list_files

    files = {
        "src/keep.py": "x = 1\n",
        "src/tmp_cache.py": "x = 2\n",
        "build/gen.py": "x = 3\n",
        "docs/example.py": "x = 4\n",
        "docs/keep_me.py": "x = 5\n",
        ".gitignore": "build/\ntmp_*.py\n/docs/*.py\n!/docs/keep_me.py\n",
    }
    root = tmp_path / "gi-repo"
    for rel, content in files.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    got = {r.relative_path for r in list_files(spark, str(root)).collect()}
    assert got == {"src/keep.py", "docs/keep_me.py"}


def test_repo_map_fs_walk(indexed, repo_dir):
    """FS-walk repo map: depth semantics (files one level below the deepest
    listed dir included), real definition counts, no content reads."""
    from knowledge_graph_spark.queries.library import repo_map_fs

    kg, _ = indexed
    rows = {r.path: r for r in repo_map_fs(kg, repo_dir, depth=1).collect()}
    dirs = {p for p, r in rows.items() if r.entry_type == "dir"}
    assert dirs == {"app", "web", "jvm", "dotnet", "native"}
    files = {p for p, r in rows.items() if r.entry_type == "file"}
    assert "web/main.ts" in files and "app/facade.py" in files
    assert "app/models/user.py" not in files  # depth 3 > cap
    # Service, ctor, syncAll, helper (the `names` field is NOT a
    # definition — java/analyzer.rs:64-69 skips fields)
    assert rows["jvm/Service.java"].n_definitions == 4
    assert rows["app"].n_definitions == 0  # dirs carry no defs


def test_gitignore_negation_cannot_reinclude_under_excluded_dir(spark, tmp_path):
    """git semantics: `build/` then `!build/keep.py` keeps keep.py ignored —
    re-inclusion under an excluded directory is impossible."""
    from knowledge_graph_spark.pipeline.extract import list_files

    files = {
        "src/main.py": "x = 1\n",
        "build/keep.py": "x = 2\n",
        "build/gen.py": "x = 3\n",
        ".gitignore": "build/\n!build/keep.py\n",
    }
    root = tmp_path / "gi-neg-repo"
    for rel, content in files.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    got = {r.relative_path for r in list_files(spark, str(root)).collect()}
    assert got == {"src/main.py"}


def test_search_with_context_real_source_lines(spark, tmp_path):
    """file_lines carries REAL source text: the context snippet around a hit
    contains the actual neighboring lines of the file, not a rendering
    (file_reader_utils.rs:1-252 parity)."""
    from knowledge_graph_spark.pipeline.indexer import index_repository
    from knowledge_graph_spark.queries.library import search_with_context

    src = (
        "# leading comment\n"
        "import os\n"
        "\n"
        "def target_fn():\n"
        "    return 42\n"
    )
    p = tmp_path / "repo" / "m.py"
    p.parent.mkdir(parents=True)
    p.write_text(src)
    kg, _ = index_repository(spark, str(tmp_path / "repo"))
    row = search_with_context(kg, ["target_fn"], context_lines=1).collect()[0]
    assert row.snippet == "\ndef target_fn():\n    return 42"


def test_file_lines_write_read_roundtrip(spark, tmp_path):
    from knowledge_graph_spark.pipeline.indexer import index_repository

    p = tmp_path / "repo" / "m.py"
    p.parent.mkdir(parents=True)
    p.write_text("def f():\n    return 1\n")
    out = str(tmp_path / "out")
    kg, _ = index_repository(spark, str(tmp_path / "repo"), out_dir=out)
    assert kg.file_lines is not None
    texts = [r.line_text for r in kg.file_lines.orderBy("line_no").collect()]
    assert texts[0] == "def f():" and texts[1] == "    return 1"
