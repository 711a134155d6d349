"""Workspace/multi-project management — manifest, hashed data dirs, status
tracking, and the multi-project indexing orchestration loop (D11).

Reference mapping (crates/workspace-manager + event-bus):
- ``generate_path_hash`` (manifest.rs:291-303: sha256 of canonicalized path)
  → :func:`path_hash`.
- Manifest of workspace folders → projects with per-entity status
  (manifest.rs:10-16 Status enum; 37-47 ProjectMetadata; 83-93
  WorkspaceFolderMetadata) → dataclasses serialized to JSON.
- Atomic manifest persistence (state_service.rs:55-69: write tmp + rename)
  → :meth:`WorkspaceManager._save`.
- Data-dir layout ``.gkg/gkg_workspace_folders/{ws_hash}/{project_hash}/``
  holding database + parquet (data_directory.rs:8-29,65-90) → here each
  project dir holds the graph parquet tables directly (the parquet IS the
  store; no separate bulk-load target — SURVEY S4/S5).
- WorkspaceManager API: register/get/list/remove/status/clean
  (workspace_manager.rs:138-673).
- Lifecycle events {Workspace,Project} × {Indexing,Reindexing} ×
  {Started,Completed,Failed} (event-bus/src/lib.rs:44-115) → plain dict
  events collected by :func:`index_workspace`; feed them to any sink
  (the streaming twin lives in streaming/watcher.py ST6).

Spark-first note: manifest state is driver-side metadata (kilobytes), so it
is plain JSON — the 100 TB-scale data lives in the per-project parquet dirs
this module merely points at, exactly as the reference keeps a tiny manifest
next to per-project Kuzu files.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field
from typing import Callable

# Status vocabulary — manifest.rs:10-16 (serde lowercase).
PENDING = "pending"
INDEXING = "indexing"
REINDEXING = "reindexing"
INDEXED = "indexed"
ERROR = "error"

MANIFEST_FILE = "manifest.json"
WORKSPACE_FOLDERS_DIR = "workspace_folders"


def path_hash(path: str) -> str:
    """Stable hash naming a data directory (manifest.rs:291-303)."""
    canonical = os.path.realpath(path)
    return hashlib.sha256(canonical.encode("utf-8")).hexdigest()[:16]


@dataclass
class ProjectMetadata:
    """manifest.rs:37-47."""

    project_hash: str
    status: str = PENDING
    last_indexed_at: float | None = None
    error_message: str | None = None

    def mark(self, status: str, error_message: str | None = None) -> None:
        self.status = status
        self.error_message = error_message
        self.last_indexed_at = time.time() if status == INDEXED else None


@dataclass
class WorkspaceFolderMetadata:
    """manifest.rs:83-93."""

    data_directory_name: str
    status: str = PENDING
    last_indexed_at: float | None = None
    projects: dict[str, ProjectMetadata] = field(default_factory=dict)


@dataclass
class ProjectInfo:
    """workspace_manager.rs:57-71 — resolved view handed to callers."""

    workspace_folder_path: str
    project_path: str
    project_hash: str
    status: str
    graph_dir: str
    error_message: str | None = None
    last_indexed_at: float | None = None


class WorkspaceManager:
    """Manifest-backed registry of workspace folders and their projects.

    One instance per data directory; all mutation goes through the manifest
    and is persisted atomically (tmp + rename, state_service.rs:55-69), so a
    crashed run never leaves a torn manifest.
    """

    def __init__(self, data_dir: str) -> None:
        self.data_dir = data_dir
        self.manifest_path = os.path.join(data_dir, MANIFEST_FILE)
        self.workspaces: dict[str, WorkspaceFolderMetadata] = {}
        os.makedirs(os.path.join(data_dir, WORKSPACE_FOLDERS_DIR), exist_ok=True)
        if os.path.exists(self.manifest_path):
            self._load()

    # -- persistence -------------------------------------------------------
    def _load(self) -> None:
        with open(self.manifest_path, encoding="utf-8") as f:
            raw = json.load(f)
        self.workspaces = {
            ws_path: WorkspaceFolderMetadata(
                data_directory_name=ws["data_directory_name"],
                status=ws["status"],
                last_indexed_at=ws.get("last_indexed_at"),
                projects={
                    p_path: ProjectMetadata(**p) for p_path, p in ws["projects"].items()
                },
            )
            for ws_path, ws in raw["workspace_folders"].items()
        }

    def _save(self) -> None:
        payload = {
            "workspace_folders": {
                ws_path: asdict(ws) for ws_path, ws in self.workspaces.items()
            }
        }
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    # -- registration (workspace_manager.rs:138-318) -----------------------
    def register_workspace_folder(self, workspace_path: str) -> WorkspaceFolderMetadata:
        if workspace_path not in self.workspaces:
            ws = WorkspaceFolderMetadata(data_directory_name=path_hash(workspace_path))
            self.workspaces[workspace_path] = ws
            os.makedirs(self._ws_dir(ws), exist_ok=True)
            self._save()
        return self.workspaces[workspace_path]

    def register_project(self, workspace_path: str, project_path: str) -> ProjectInfo:
        ws = self.register_workspace_folder(workspace_path)
        if project_path not in ws.projects:
            ws.projects[project_path] = ProjectMetadata(project_hash=path_hash(project_path))
            os.makedirs(self._project_dir(ws, ws.projects[project_path]), exist_ok=True)
            self._save()
        return self._info(workspace_path, project_path)

    # -- lookups (workspace_manager.rs:320-488) ----------------------------
    def _ws_dir(self, ws: WorkspaceFolderMetadata) -> str:
        return os.path.join(self.data_dir, WORKSPACE_FOLDERS_DIR, ws.data_directory_name)

    def _project_dir(self, ws: WorkspaceFolderMetadata, p: ProjectMetadata) -> str:
        return os.path.join(self._ws_dir(ws), p.project_hash)

    def _info(self, workspace_path: str, project_path: str) -> ProjectInfo:
        ws = self.workspaces[workspace_path]
        p = ws.projects[project_path]
        return ProjectInfo(
            workspace_folder_path=workspace_path,
            project_path=project_path,
            project_hash=p.project_hash,
            status=p.status,
            graph_dir=os.path.join(self._project_dir(ws, p), "graph"),
            error_message=p.error_message,
            last_indexed_at=p.last_indexed_at,
        )

    def get_project_info(self, workspace_path: str, project_path: str) -> ProjectInfo | None:
        ws = self.workspaces.get(workspace_path)
        if ws is None or project_path not in ws.projects:
            return None
        return self._info(workspace_path, project_path)

    def get_project_for_file(self, file_path: str) -> ProjectInfo | None:
        """Longest registered project-path prefix containing ``file_path``
        (workspace_manager.rs:384-405)."""
        best: ProjectInfo | None = None
        for ws_path, ws in self.workspaces.items():
            for p_path in ws.projects:
                if file_path == p_path or file_path.startswith(p_path.rstrip("/") + "/"):
                    if best is None or len(p_path) > len(best.project_path):
                        best = self._info(ws_path, p_path)
        return best

    def list_workspace_folders(self) -> list[str]:
        return sorted(self.workspaces)

    def list_all_projects(self) -> list[ProjectInfo]:
        return [
            self._info(ws_path, p_path)
            for ws_path in sorted(self.workspaces)
            for p_path in sorted(self.workspaces[ws_path].projects)
        ]

    # -- status + removal (workspace_manager.rs:490-673) -------------------
    def update_project_status(
        self,
        workspace_path: str,
        project_path: str,
        status: str,
        error_message: str | None = None,
    ) -> None:
        self.workspaces[workspace_path].projects[project_path].mark(status, error_message)
        self._save()

    def update_workspace_status(self, workspace_path: str, status: str) -> None:
        ws = self.workspaces[workspace_path]
        ws.status = status
        ws.last_indexed_at = time.time() if status == INDEXED else ws.last_indexed_at
        self._save()

    def remove_project(self, workspace_path: str, project_path: str) -> bool:
        ws = self.workspaces.get(workspace_path)
        if ws is None or project_path not in ws.projects:
            return False
        shutil.rmtree(self._project_dir(ws, ws.projects[project_path]), ignore_errors=True)
        del ws.projects[project_path]
        self._save()
        return True

    def remove_workspace_folder(self, workspace_path: str) -> bool:
        ws = self.workspaces.pop(workspace_path, None)
        if ws is None:
            return False
        shutil.rmtree(self._ws_dir(ws), ignore_errors=True)
        self._save()
        return True

    def clean(self) -> None:
        """Drop every workspace + data dir (workspace_manager.rs:665-673)."""
        for ws_path in list(self.workspaces):
            self.remove_workspace_folder(ws_path)


def index_workspace(
    spark,
    manager: WorkspaceManager,
    workspace_path: str,
    reindex: bool = False,
    on_event: Callable[[dict], None] | None = None,
):
    """Index every registered project of a workspace folder, with status
    transitions and lifecycle events — the executor loop of
    execution/executor.rs:46-145 plus the event-bus vocabulary of
    event-bus/src/lib.rs:44-115.

    Returns ``(events, stats_by_project)``. Each project writes its graph to
    its hashed data dir (parquet at rest, directly queryable).
    """
    from knowledge_graph_spark.pipeline.indexer import index_repository

    events: list[dict] = []

    def emit(etype: str, status: str, **payload) -> None:
        ev = {"type": etype, "status": status, "ts": time.time(), **payload}
        events.append(ev)
        if on_event is not None:
            on_event(ev)

    verb = "WorkspaceReindexing" if reindex else "WorkspaceIndexing"
    p_verb = "ProjectReindexing" if reindex else "ProjectIndexing"
    busy = REINDEXING if reindex else INDEXING

    ws = manager.workspaces[workspace_path]
    projects = sorted(ws.projects)
    manager.update_workspace_status(workspace_path, busy)
    emit(verb, "Started", workspace_folder=workspace_path, projects_to_process=projects)

    stats_by_project: dict[str, object] = {}
    failed = False
    for p_path in projects:
        info = manager._info(workspace_path, p_path)
        manager.update_project_status(workspace_path, p_path, busy)
        emit(p_verb, "Started", project=p_path)
        try:
            _, stats = index_repository(
                spark, p_path, out_dir=info.graph_dir,
                repository_name=os.path.basename(p_path.rstrip("/")),
            )
            stats_by_project[p_path] = stats
            manager.update_project_status(workspace_path, p_path, INDEXED)
            emit(p_verb, "Completed", project=p_path,
                 total_files=stats.total_files, duration=stats.duration_seconds)
        except Exception as exc:  # noqa: BLE001 — executor.rs marks Error and continues
            failed = True
            manager.update_project_status(workspace_path, p_path, ERROR, str(exc))
            emit(p_verb, "Failed", project=p_path, error=str(exc))

    manager.update_workspace_status(workspace_path, ERROR if failed else INDEXED)
    emit(verb, "Failed" if failed else "Completed",
         workspace_folder=workspace_path, projects_indexed=sorted(stats_by_project))
    return events, stats_by_project
