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
