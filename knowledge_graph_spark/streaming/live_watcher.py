"""Live filesystem watcher behind ``kgs server start --enable-reindexing``.

Reference mapping: the reference threads ``enable_reindexing`` from the CLI
(cli.rs:106) into the desktop server (http-server-desktop/src/lib.rs:72,104)
where it spawns the real filesystem watcher (watcher.rs) whose debounced
change batches feed the job queue → incremental reindex. This module is that
loop, Spark-first:

- an mtime/scandir **poller thread** (the portable stand-in for the notify
  crate's OS event backends — no inotify binding ships in this container;
  the swap point is :meth:`FsPoller.poll_once`) diffs per-project file
  snapshots and spools change events as JSON lines;
- the existing Structured Streaming chain consumes the spool:
  ``watch_event_stream`` → ``debounced_jobs`` (3 s windows, watcher.rs:25)
  → ``foreachBatch``, where same-batch jobs for one project coalesce into a
  single reindex — the declarative twin of the queue's CancelJobsOfType
  supersede collapsing redundant queued reindexes (dispatch.rs:88-91,
  worker.rs:122-138);
- each job re-runs the incremental cycle: ``FileChanges.from_watched_files``
  → fresh ``index_repository`` → ``apply_file_changes`` → lineage-truncated
  materialize → overwrite of the project's graph dir → server-cache
  invalidation, so ``/api/graph/stats`` reflects the edit (the done-state
  the reference's watcher integration is tested on).
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import time
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from knowledge_graph_spark.streaming.watcher import (
    DEBOUNCE_WINDOW,
    EXCLUDED_DIR_SEGMENTS,
    debounced_jobs,
    watch_event_stream,
)


def snapshot_tree(root: str) -> dict[str, tuple[int, int]]:
    """rel_path → (mtime_ns, size) for every file under ``root``, skipping
    the watcher's excluded dir segments (watcher.rs:27). The diff of two
    snapshots is the event set an OS watcher would have delivered."""
    snap: dict[str, tuple[int, int]] = {}
    root = os.path.abspath(root)
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in EXCLUDED_DIR_SEGMENTS]
        for fn in filenames:
            p = os.path.join(dirpath, fn)
            try:
                st = os.stat(p)
            except OSError:
                continue  # raced with a delete — the next poll sees it
            snap[os.path.relpath(p, root)] = (st.st_mtime_ns, st.st_size)
    return snap


def diff_snapshots(
    old: dict[str, tuple[int, int]], new: dict[str, tuple[int, int]]
) -> list[tuple[str, str]]:
    """(rel_path, change_type) events between two snapshots — the
    created/modified/deleted vocabulary of FILE_EVENT_SCHEMA."""
    events: list[tuple[str, str]] = []
    for rel, sig in new.items():
        if rel not in old:
            events.append((rel, "created"))
        elif old[rel] != sig:
            events.append((rel, "modified"))
    for rel in old:
        if rel not in new:
            events.append((rel, "deleted"))
    return events


class FsPoller:
    """Scandir/mtime poller: per-project snapshots diffed every
    ``interval`` seconds; events spooled as complete JSON-line files
    (tmp-write + rename, so the Spark file-stream source never reads a
    partial file)."""

    def __init__(
        self,
        projects: dict[str, str],
        spool_dir: str,
        interval: float = 0.5,
        refresh_projects=None,
    ):
        self.projects = dict(projects)  # project key → root dir
        self.spool_dir = spool_dir
        self.interval = interval
        self.refresh_projects = refresh_projects  # () -> {key: root}, optional
        self._snaps = {k: snapshot_tree(root) for k, root in projects.items()}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def poll_once(self) -> int:
        """One diff pass over every project; returns events emitted."""
        if self.refresh_projects is not None:
            # pick up projects indexed AFTER the watcher started — the
            # reference adds watch paths as workspaces register
            try:
                for key, root in self.refresh_projects().items():
                    self.watch(key, root)
            except Exception:  # noqa: BLE001 — a manifest read race is not fatal
                pass
        lines = []
        now = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%fZ")
        for key, root in self.projects.items():
            new = snapshot_tree(root)
            for rel, change in diff_snapshots(self._snaps[key], new):
                lines.append(
                    json.dumps(
                        {
                            "project": key,
                            "path": rel,
                            "change_type": change,
                            "event_time": now,
                        }
                    )
                )
            self._snaps[key] = new
        if lines:
            tmp = os.path.join(self.spool_dir, f".{uuid.uuid4().hex}.tmp")
            with open(tmp, "w") as fh:
                fh.write("\n".join(lines) + "\n")
            os.rename(tmp, os.path.join(self.spool_dir, f"ev-{uuid.uuid4().hex}.json"))
        return len(lines)

    def watch(self, key: str, root: str) -> None:
        """Add a project to the watch set mid-flight (the reference's
        watcher gains projects as workspaces index, watcher.rs watch paths).
        The initial snapshot is taken NOW, so pre-existing files don't fire."""
        if key not in self.projects:
            self._snaps[key] = snapshot_tree(root)
            self.projects[key] = root

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                self.poll_once()
            except Exception:  # noqa: BLE001 — a poll failure must not kill the loop
                pass
            self._stop.wait(self.interval)

    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, name="kgs-fs-poller", daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)


class LiveReindexer:
    """The full ``--enable-reindexing`` loop: poller → debounced stream →
    per-project incremental reindex, with server-cache invalidation.

    ``invalidate(graph_dir)`` and ``on_event(dict)`` hook the serving layer
    (GraphService.invalidate / .on_event); both optional so the loop also
    runs headless in tests.
    """

    def __init__(
        self,
        spark: SparkSession,
        manager,
        on_event=None,
        invalidate=None,
        poll_interval: float = 0.5,
        window: str = DEBOUNCE_WINDOW,
        trigger_seconds: int = 1,
    ):
        self.spark = spark
        self.manager = manager
        self.on_event = on_event or (lambda ev: None)
        self.invalidate = invalidate or (lambda graph_dir: None)
        self.poll_interval = poll_interval
        self.window = window
        self.trigger_seconds = trigger_seconds
        self._dir = tempfile.mkdtemp(prefix="kgs-live-watch-")
        self.spool_dir = os.path.join(self._dir, "events")
        self.checkpoint_dir = os.path.join(self._dir, "checkpoint")
        os.makedirs(self.spool_dir, exist_ok=True)
        self.poller: FsPoller | None = None
        self.query = None
        self.reindexes_done = 0  # observability for tests/metrics
        self._lock = threading.Lock()

    # -- the reindex job -----------------------------------------------------
    def _watched_projects(self) -> dict[str, str]:
        """project_path → root for every project with an on-disk graph."""
        out = {}
        for info in self.manager.list_all_projects():
            if os.path.isdir(info.graph_dir) and os.path.isdir(info.project_path):
                out[info.project_path] = info.project_path
        return out

    def reindex_project(self, project_path: str, paths: list[str]) -> bool:
        """One incremental cycle for one project: bucket the watched paths by
        on-disk existence (changes.rs:78-107), splice, persist, invalidate.
        Returns False when the project vanished or nothing changed."""
        from knowledge_graph_spark.graph.model import KnowledgeGraph
        from knowledge_graph_spark.incremental import apply_file_changes
        from knowledge_graph_spark.pipeline.changes import FileChanges
        from knowledge_graph_spark.pipeline.indexer import index_repository

        info = None
        for p in self.manager.list_all_projects():
            if p.project_path == project_path:
                info = p
                break
        if info is None or not os.path.isdir(info.graph_dir):
            return False
        changes = FileChanges.from_watched_files(project_path, paths)
        if not changes.has_changes():
            return False
        # ST6 event vocabulary, same shape workspace.index_workspace emits
        self.on_event(
            {
                "type": "ProjectReindexing",
                "status": "Started",
                "project": project_path,
                "n_paths": len(paths),
            }
        )
        base = KnowledgeGraph.read(self.spark, info.graph_dir, "live")
        fresh, _ = index_repository(self.spark, project_path, repository_name="live")
        merged = apply_file_changes(
            self.spark,
            base,
            fresh,
            sorted(changes.changed_files),
            sorted(changes.deleted_files),
        )
        # truncate lineage BEFORE overwriting the dir the plan reads from —
        # after localCheckpoint the merged tables no longer reference the
        # base parquet, so the in-place overwrite (M4) is safe
        merged.materialize(truncate=True, coalesce_to=4)
        merged.write(info.graph_dir)
        for df in (*merged.nodes.values(), *merged.edges.values()):
            df.unpersist()
        self.invalidate(info.graph_dir)
        with self._lock:
            self.reindexes_done += 1
        self.on_event(
            {
                "type": "ProjectReindexing",
                "status": "Completed",
                "project": project_path,
                "changed": sorted(changes.changed_files),
                "deleted": sorted(changes.deleted_files),
            }
        )
        return True

    # -- stream plumbing -------------------------------------------------------
    def _handle_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # same-batch supersede: multiple debounce windows for one project
        # collapse into one job over the UNION of their paths — the newest
        # disk state wins exactly as the queue's CancelJobsOfType does
        by_project: dict[str, set] = {}
        for row in batch_df.collect():  # bounded: ≤ jobs per trigger
            s = by_project.setdefault(row["project"], set())
            s.update(row["changed_paths"])
            s.update(row["deleted_paths"])
        for project, paths in by_project.items():
            try:
                self.reindex_project(project, sorted(paths))
            except Exception as exc:  # noqa: BLE001 — error isolation per project
                self.on_event(
                    {
                        "type": "ProjectReindexing",
                        "status": "Failed",
                        "project": project,
                        "error": str(exc),
                    }
                )

    def start(self) -> "LiveReindexer":
        projects = self._watched_projects()
        self.poller = FsPoller(
            projects,
            self.spool_dir,
            self.poll_interval,
            refresh_projects=self._watched_projects,
        )
        jobs = debounced_jobs(
            # delete consumed spool files: a server watching for days must
            # not grow its spool dir (or the per-trigger listing) unboundedly
            watch_event_stream(self.spark, self.spool_dir, clean_source="delete"),
            window=self.window,
        )
        self.query = (
            jobs.writeStream.outputMode("update")
            .foreachBatch(self._handle_batch)
            .queryName("kgs-live-reindex")
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=f"{self.trigger_seconds} seconds")
            .start()
        )
        self.poller.start()
        return self

    def stop(self) -> None:
        if self.poller is not None:
            self.poller.stop()
        if self.query is not None:
            self.query.stop()
