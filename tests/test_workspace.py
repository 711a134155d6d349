"""Workspace-manager analog tests — manifest persistence, hashed data dirs,
status transitions, multi-project orchestration with lifecycle events
(crates/workspace-manager/*, event-bus/src/lib.rs:44-115)."""

from __future__ import annotations

import json
import os

import pytest

from knowledge_graph_spark.workspace import (
    ERROR,
    INDEXED,
    PENDING,
    WorkspaceManager,
    index_workspace,
    path_hash,
)


def _mk_project(base, name: str, files: dict[str, str]) -> str:
    root = os.path.join(base, name)
    for rel, text in files.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w", encoding="utf-8") as f:
            f.write(text)
    return root


@pytest.fixture()
def workspace(tmp_path):
    ws = str(tmp_path / "ws")
    a = _mk_project(
        ws, "proj_a",
        {"lib/core.py": "class Core:\n    def run(self):\n        helper()\n\ndef helper():\n    return 1\n"},
    )
    b = _mk_project(ws, "proj_b", {"src/main.ts": "export function main() {\n  return 0\n}\n"})
    return ws, a, b


def test_register_persists_manifest_and_dirs(tmp_path, workspace):
    ws, a, b = workspace
    data = str(tmp_path / "data")
    mgr = WorkspaceManager(data)
    mgr.register_project(ws, a)
    mgr.register_project(ws, b)

    # hashed layout on disk (data_directory.rs:65-90)
    ws_dir = os.path.join(data, "workspace_folders", path_hash(ws))
    assert os.path.isdir(os.path.join(ws_dir, path_hash(a)))
    assert os.path.isdir(os.path.join(ws_dir, path_hash(b)))

    # manifest is valid JSON and a NEW manager instance reloads identical state
    with open(os.path.join(data, "manifest.json"), encoding="utf-8") as f:
        raw = json.load(f)
    assert set(raw["workspace_folders"][ws]["projects"]) == {a, b}

    again = WorkspaceManager(data)
    infos = again.list_all_projects()
    assert [i.project_path for i in infos] == sorted([a, b])
    assert all(i.status == PENDING for i in infos)


def test_get_project_for_file_longest_prefix(tmp_path, workspace):
    ws, a, b = workspace
    nested = _mk_project(ws, "proj_a/vendor_sub", {"x.py": "def x():\n    pass\n"})
    mgr = WorkspaceManager(str(tmp_path / "data"))
    for p in (a, b, nested):
        mgr.register_project(ws, p)

    hit = mgr.get_project_for_file(os.path.join(nested, "x.py"))
    assert hit is not None and hit.project_path == nested  # longest prefix wins
    hit_a = mgr.get_project_for_file(os.path.join(a, "lib/core.py"))
    assert hit_a is not None and hit_a.project_path == a
    assert mgr.get_project_for_file("/nowhere/else.py") is None


def test_index_workspace_end_to_end(spark, tmp_path, workspace):
    ws, a, b = workspace
    mgr = WorkspaceManager(str(tmp_path / "data"))
    mgr.register_project(ws, a)
    mgr.register_project(ws, b)

    events, stats = index_workspace(spark, mgr, ws)

    # statuses: both projects indexed, workspace indexed, timestamps set
    infos = {i.project_path: i for i in mgr.list_all_projects()}
    assert all(i.status == INDEXED for i in infos.values())
    assert mgr.workspaces[ws].status == INDEXED
    assert all(m.last_indexed_at for m in mgr.workspaces[ws].projects.values())

    # per-project graph parquet exists and is queryable (one DB per project)
    from knowledge_graph_spark.graph.model import KnowledgeGraph

    kg_a = KnowledgeGraph.read(spark, infos[a].graph_dir, "proj_a")
    names = {r["name"] for r in kg_a.definitions.select("name").collect()}
    assert {"Core", "run", "helper"} <= names
    kg_b = KnowledgeGraph.read(spark, infos[b].graph_dir, "proj_b")
    assert {r["name"] for r in kg_b.definitions.select("name").collect()} == {"main"}

    # stats per project, not global (executor.rs per-project loop)
    assert stats[a].total_files == 1 and stats[b].total_files == 1

    # lifecycle event sequence (event-bus vocabulary)
    seq = [(e["type"], e["status"]) for e in events]
    assert seq[0] == ("WorkspaceIndexing", "Started")
    assert seq[-1] == ("WorkspaceIndexing", "Completed")
    assert seq.count(("ProjectIndexing", "Started")) == 2
    assert seq.count(("ProjectIndexing", "Completed")) == 2


def test_index_workspace_error_isolation(spark, tmp_path, workspace):
    """A failing project marks Error with a message but does not abort the
    loop (executor.rs error handling); workspace ends Error."""
    ws, a, _ = workspace
    mgr = WorkspaceManager(str(tmp_path / "data"))
    mgr.register_project(ws, a)
    mgr.register_project(ws, os.path.join(ws, "does_not_exist"))

    events, stats = index_workspace(spark, mgr, ws)

    infos = {i.project_path: i for i in mgr.list_all_projects()}
    assert infos[a].status == INDEXED and a in stats
    bad = infos[os.path.join(ws, "does_not_exist")]
    assert bad.status == ERROR and bad.error_message
    assert mgr.workspaces[ws].status == ERROR
    assert ("ProjectIndexing", "Failed") in [(e["type"], e["status"]) for e in events]


def test_remove_and_clean(tmp_path, workspace):
    ws, a, b = workspace
    data = str(tmp_path / "data")
    mgr = WorkspaceManager(data)
    mgr.register_project(ws, a)
    mgr.register_project(ws, b)

    a_dir = os.path.join(data, "workspace_folders", path_hash(ws), path_hash(a))
    assert mgr.remove_project(ws, a) and not os.path.exists(a_dir)
    assert not mgr.remove_project(ws, a)  # already gone
    assert [i.project_path for i in mgr.list_all_projects()] == [b]

    mgr.clean()
    assert mgr.list_workspace_folders() == []
    assert WorkspaceManager(data).list_all_projects() == []
