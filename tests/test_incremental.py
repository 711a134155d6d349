"""Incremental re-index semantics, mirroring the reference's reindex tests
(test_full_reindexing_pipeline_git_status_*, crates/indexer/src/tests.rs):
index → mutate fixture (change a file, add a file, delete a file) → apply the
diff → the merged graph must match a from-scratch re-index on content
(ids may differ — the reference renumbers too; M3 resumes from max(id)+1)."""

from __future__ import annotations

import textwrap

import pytest
from pyspark.sql import functions as F

from tests.test_pipeline import FIXTURE


def _write_fixture(root, files):
    for rel, content in files.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(textwrap.dedent(content).lstrip("\n"))


@pytest.fixture(scope="module")
def incremental_case(spark, tmp_path_factory):
    from knowledge_graph_spark.incremental import apply_file_changes, diff_definitions
    from knowledge_graph_spark.pipeline.indexer import index_repository

    root = tmp_path_factory.mktemp("inc-repo")
    _write_fixture(root, FIXTURE)
    base_out = str(tmp_path_factory.mktemp("g-base"))
    base_kg, _ = index_repository(spark, str(root), out_dir=base_out, repository_name="inc")

    # mutate: change user.py (add a method), add new file, delete util.ts
    changed = {
        "app/models/user.py": FIXTURE["app/models/user.py"].rstrip()
        + "\n\ndef archive():\n    return None\n",
        "app/models/account.py": "class Account:\n    def close(self):\n        return 1\n",
    }
    deleted = ["web/util.ts"]
    (root / "web/util.ts").unlink()
    _write_fixture(root, changed)

    fresh_out = str(tmp_path_factory.mktemp("g-fresh"))
    fresh_kg, _ = index_repository(spark, str(root), out_dir=fresh_out, repository_name="inc")
    merged = apply_file_changes(
        spark, base_kg, fresh_kg, list(changed), deleted
    )
    full_kg = fresh_kg  # from-scratch truth (root already mutated)
    return base_kg, merged, full_kg, diff_definitions(base_kg, full_kg)


def test_diff_detects_added_and_deleted(incremental_case):
    _, _, _, diff = incremental_case
    added = {r.fqn for r in diff["added"].collect()}
    deleted = {r.fqn for r in diff["deleted"].collect()}
    assert "app.models.user.archive" in added
    assert "app.models.account.Account" in added
    assert "formatName" in deleted
    assert not {r.fqn for r in diff["retained"].collect()} & added


def test_merged_nodes_match_full_reindex(incremental_case):
    _, merged, full, _ = incremental_case
    for key in ("file_nodes", "definition_nodes", "imported_symbol_nodes"):
        m = merged.nodes[key]
        f = full.nodes[key]
        keycols = {
            "file_nodes": ["path"],
            "definition_nodes": ["fqn", "primary_file_path", "primary_start_byte"],
            "imported_symbol_nodes": ["file_path", "import_path", "name", "start_byte"],
        }[key]
        m_set = {tuple(r) for r in m.select(*keycols).collect()}
        f_set = {tuple(r) for r in f.select(*keycols).collect()}
        assert m_set == f_set, (key, m_set ^ f_set)


def test_merged_ids_resume_not_reused(incremental_case):
    base, merged, _, _ = incremental_case
    base_max = base.definitions.agg(F.max("id")).collect()[0][0]
    new_defs = merged.definitions.filter(
        F.col("primary_file_path").isin(
            ["app/models/user.py", "app/models/account.py"]
        )
    )
    assert new_defs.agg(F.min("id")).collect()[0][0] == base_max + 1
    n = merged.definitions.count()
    assert merged.definitions.select("id").distinct().count() == n


def test_merged_edges_consistent(incremental_case):
    _, merged, full, _ = incremental_case
    # FILE_DEFINES edges resolve to the same (file path, def fqn) pairs
    def edge_pairs(kg):
        e = kg.edges["file_relationships"].filter(F.col("type") == "FILE_DEFINES")
        return {
            (r.path, r.fqn)
            for r in e.join(
                kg.files.select(F.col("id").alias("source_id"), "path"), "source_id"
            )
            .join(
                kg.definitions.select(F.col("id").alias("target_id"), "fqn"),
                "target_id",
            )
            .collect()
        }

    assert edge_pairs(merged) == edge_pairs(full)
    # no dangling endpoints after splice
    fr = merged.edges["file_relationships"]
    dangling = fr.join(
        merged.files.select(F.col("id").alias("source_id")), "source_id", "left_anti"
    )
    assert dangling.count() == 0


def test_cross_file_edges_rekeyed_to_surviving_targets(incremental_case):
    """Beyond-reference: facade.py (unchanged) re-imports format_name through
    user.py (changed). user.py's import node is renumbered by the re-index;
    the imp→imp edge from the unchanged file must FOLLOW it via the natural
    key instead of being cascade-dropped (the reference loses such edges —
    indexer.rs:507-535 re-analyzes only changed files)."""
    _, merged, _, _ = incremental_case

    e = merged.edges["imported_symbol_relationships"].filter(
        F.col("type") == "IMPORTED_SYMBOL_TO_IMPORTED_SYMBOL"
    )
    pairs = (
        e.join(
            merged.imports.select(
                F.col("id").alias("source_id"), F.col("file_path").alias("src_file")
            ),
            "source_id",
        )
        .join(
            merged.imports.select(
                F.col("id").alias("target_id"), F.col("file_path").alias("dst_file")
            ),
            "target_id",
        )
    )
    assert ("app/facade.py", "app/models/user.py") in {
        (r.src_file, r.dst_file) for r in pairs.collect()
    }
    # every re-keyed target resolves — no dangling imp→imp endpoints
    dangling = e.join(
        merged.imports.select(F.col("id").alias("target_id")), "target_id", "left_anti"
    )
    assert dangling.count() == 0


def test_cross_file_edge_into_unchanged_file_survives(incremental_case):
    """r9 regression (ADVICE r8): user.py (CHANGED) imports format_name from
    helpers.py (UNCHANGED). The import node is renumbered; the target
    definition keeps its base id. The base edge is anti-joined away with its
    dropped source, so the splice is its only restore path — and it must
    re-key the target against the KEPT definition row. r8's splice joined
    the renumbered frames only and silently dropped this edge whenever
    ``fresh`` is a full reindex (every production path)."""
    _, merged, full, _ = incremental_case

    def imp_to_def_count(kg):
        imp = kg.imports.filter(
            (F.col("file_path") == "app/models/user.py")
            & (F.col("name") == "format_name")
        ).select(F.col("id").alias("source_id"))
        dfn = kg.definitions.filter(
            (F.col("primary_file_path") == "app/utils/helpers.py")
            & (F.col("name") == "format_name")
        ).select(F.col("id").alias("target_id"))
        return (
            kg.edges["imported_symbol_relationships"]
            .filter(F.col("type") == "IMPORTED_SYMBOL_TO_DEFINITION")
            .join(imp, "source_id", "left_semi")
            .join(dfn, "target_id", "left_semi")
            .count()
        )

    # sanity: the extractor produces this edge in a from-scratch index
    assert imp_to_def_count(full) >= 1
    assert imp_to_def_count(merged) >= 1


def test_splice_plan_is_broadcast_anti_join_not_except(incremental_case):
    """Doomed-edge removal must stay a broadcast anti-join on the dropped-id
    set: an Except(All) here shuffles the FULL edge table per target-table
    pass, which does not survive a 100x corpus."""
    _, merged, _, _ = incremental_case
    plan = merged.edges["definition_relationships"]._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Except" not in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_reference_mutation_set_over_test_repo(spark, tmp_path_factory):
    """The reference's reindex scenario verbatim (tests.rs:48-110,
    modify_test_repo_ruby over fixtures/test-repo): modify base_model.rb
    (new self.find_by_attributes + leading whitespace), add
    app/utils/string_utils.rb with a require, prepend a require_relative +
    append a format_name method to user_model.rb, and delete to_h. The
    merged graph must equal a from-scratch index on content, and the new
    cross-file call UserModel#format_name → StringUtils::titleize must
    resolve through the merge."""
    import os
    import shutil

    from knowledge_graph_spark.incremental import apply_file_changes
    from knowledge_graph_spark.pipeline.indexer import index_repository

    src = "/root/reference/fixtures/test-repo"
    if not os.path.isdir(src):
        pytest.skip("reference fixtures not present")
    root = tmp_path_factory.mktemp("reidx") / "test-repo"
    shutil.copytree(src, root)

    base_out = str(tmp_path_factory.mktemp("reidx-base"))
    base_kg, _ = index_repository(spark, str(root), out_dir=base_out, repository_name="tr")

    # 1. base_model.rb: new class method after self.create + leading blank lines
    bm = root / "app/models/base_model.rb"
    content = bm.read_text().replace(
        "  def self.create(attributes)\n    instance = new(attributes)\n"
        "    instance.save\n    instance\n  end",
        "  def self.create(attributes)\n    instance = new(attributes)\n"
        "    instance.save\n    instance\n  end\n\n"
        "  def self.find_by_attributes(attrs)\n    where(attrs)\n  end",
    )
    bm.write_text("\n\n" + content)
    # 2. new utility file with a require
    su = root / "app/utils/string_utils.rb"
    su.parent.mkdir(parents=True, exist_ok=True)
    su.write_text(
        "require 'string_toolkit'\n"
        "module StringUtils\n"
        "  def self.sanitize(str)\n    str.strip.downcase\n  end\n\n"
        "  def self.titleize(str)\n    str.split(' ').map(&:capitalize).join(' ')\n  end\n"
        "end\n"
    )
    # 3. user_model.rb uses the new utils
    um = root / "app/models/user_model.rb"
    um.write_text(
        "require_relative '../utils/string_utils'\n\n"
        + um.read_text()
        + "\n  # Add name formatting\n  def format_name\n"
        "    StringUtils.titleize(name)\n  end\n"
    )
    # 4. delete the to_h method from base_model.rb
    bm.write_text(bm.read_text().replace(
        "  def to_h\n    instance_variables.each_with_object({}) do |var, hash|\n"
        "      key = var.to_s.delete('@').to_sym\n"
        "      hash[key] = instance_variable_get(var)\n    end\n  end\n\n",
        "",
    ))

    changed = [
        "app/models/base_model.rb",
        "app/utils/string_utils.rb",
        "app/models/user_model.rb",
    ]
    fresh_out = str(tmp_path_factory.mktemp("reidx-fresh"))
    fresh_kg, _ = index_repository(spark, str(root), out_dir=fresh_out, repository_name="tr")
    merged = apply_file_changes(spark, base_kg, fresh_kg, changed, [])

    # merged == from-scratch on content (the reference asserts count parity
    # post-reindex; content-set equality is the stronger invariant)
    for which in ("definitions",):
        m = {
            (r.fqn, r.primary_file_path)
            for r in merged.definitions.select("fqn", "primary_file_path").collect()
        }
        f = {
            (r.fqn, r.primary_file_path)
            for r in fresh_kg.definitions.select("fqn", "primary_file_path").collect()
        }
        assert m == f, (sorted(m - f)[:5], sorted(f - m)[:5])
    assert "BaseModel::find_by_attributes" in {r[0] for r in m}
    assert "BaseModel#to_h" not in {r[0] for r in m}

    # the new cross-file call resolves through the merge
    de = merged.edges["definition_relationships"]
    d = merged.definitions.select("id", "fqn")
    pairs = {
        (r.caller, r.callee)
        for r in de.filter(
            F.col("type").isin(["CALLS", "AMBIGUOUSLY_CALLS"])
            & (F.col("target_table") == "definition_nodes")
        )
        .join(d.withColumnsRenamed({"id": "source_id", "fqn": "caller"}), "source_id")
        .join(d.withColumnsRenamed({"id": "target_id", "fqn": "callee"}), "target_id")
        .select("caller", "callee")
        .collect()
    }
    assert ("UserModel#format_name", "StringUtils::titleize") in pairs, sorted(
        p for p in pairs if "format_name" in p[0]
    )
