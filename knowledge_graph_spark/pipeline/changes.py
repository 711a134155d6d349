"""Git-status-driven change source — FileChanges derived from real git state.

Reference mapping:
- ``FileChanges`` {changed,deleted} × {files,dirs} + ``from_git_status`` /
  ``from_watched_files`` / ``has_changes`` —
  crates/indexer/src/parsing/changes.rs:5-115 (StatusCode::Deleted → deleted,
  Added/Modified → changed; the trailing-segment-has-no-dot dir heuristic is
  changes.rs:33-39 verbatim).
- ``GitStatusFileSource`` analog: derive the change set from
  ``git status --porcelain`` against the repository's HEAD, so a branch
  checkout (thousands of files changed with no FS events captured) still
  produces a correct incremental work-list —
  crates/indexer/src/project/source.rs:104-151 (GitaliskFileSource /
  ChangesFileSource; ChangesFileSource enumerates changed FILES only).
- The consumer is :func:`knowledge_graph_spark.incremental.apply_file_changes`
  (indexer.rs reindex_repository path), which re-extracts the changed files
  and splices them into the at-rest graph with anti-joins.

Spark-first note: git interrogation is driver-side metadata work (one
subprocess, kilobytes of paths) — the distributed part is what happens NEXT:
the changed-file list feeds the mapInPandas extraction and broadcast
anti-join splice, which is where the 100 TB of graph data lives.
"""

from __future__ import annotations

import os
import subprocess
from dataclasses import dataclass, field


def is_dir_path(path: str) -> bool:
    """changes.rs:33-39 — trailing slash, or last segment without a dot."""
    if path.endswith("/"):
        return True
    last = path.rsplit("/", 1)[-1]
    return "." not in last


@dataclass
class FileChanges:
    """changes.rs:5-11 — the four change buckets."""

    changed_files: set[str] = field(default_factory=set)
    deleted_files: set[str] = field(default_factory=set)
    changed_dirs: set[str] = field(default_factory=set)
    deleted_dirs: set[str] = field(default_factory=set)

    def has_changes(self) -> bool:
        return bool(
            self.changed_files
            or self.deleted_files
            or self.changed_dirs
            or self.deleted_dirs
        )

    @classmethod
    def from_git_status(cls, porcelain_lines: list[str]) -> "FileChanges":
        """Parse ``git status --porcelain`` output (changes.rs:41-76).

        Status mapping follows the reference: a Deleted code in EITHER the
        index or the worktree column buckets the path as deleted; Added /
        Modified (and untracked ``??``, git's Added analog) bucket it as
        changed. Other codes (unmerged, typechange) are ignored exactly as
        the reference's match arms fall through.
        """
        out = cls()
        for line in porcelain_lines:
            if len(line) < 4:
                continue
            x, y, path = line[0], line[1], line[3:]
            # quoted paths (spaces/unicode) arrive C-escaped from git
            if path.startswith('"') and path.endswith('"'):
                path = path[1:-1].encode().decode("unicode_escape")
            is_dir = is_dir_path(path)
            if x == "D" or y == "D":
                (out.deleted_dirs if is_dir else out.deleted_files).add(path)
            elif x in "AM" or y in "AM" or (x == "?" and y == "?"):
                (out.changed_dirs if is_dir else out.changed_files).add(path)
        return out

    @classmethod
    def from_watched_files(cls, repo_path: str, paths: list[str]) -> "FileChanges":
        """changes.rs:78-107 — bucket watched paths by on-disk existence."""
        out = cls()
        for rel in paths:
            p = os.path.join(repo_path, rel)
            if os.path.exists(p):
                if os.path.isfile(p):
                    out.changed_files.add(rel)
                elif os.path.isdir(p):
                    out.changed_dirs.add(rel)
            elif is_dir_path(rel):
                out.deleted_dirs.add(rel)
            else:
                out.deleted_files.add(rel)
        return out


def git_status_changes(repo_path: str) -> FileChanges:
    """The GitStatusFileSource: FileChanges from the repository's real git
    state (source.rs:104-151). ``--no-renames`` makes a rename surface as a
    Deleted + Added pair — the reference's StatusCode match has no Renamed
    arm, so split pairs are the faithful (and more useful) representation.
    ``--untracked-files=all`` lists files inside untracked directories
    individually, since ChangesFileSource enumerates changed FILES only.
    """
    proc = subprocess.run(
        [
            "git",
            "status",
            "--porcelain",
            "--no-renames",
            "--untracked-files=all",
        ],
        cwd=repo_path,
        capture_output=True,
        text=True,
        check=True,
    )
    return FileChanges.from_git_status(proc.stdout.splitlines())


def git_changes_since(repo_path: str, base_ref: str) -> FileChanges:
    """FileChanges between an indexed ref and the CURRENT worktree — the
    branch-checkout case the plain status source cannot see (after
    ``git checkout branch`` the status vs the new HEAD is clean, but
    thousands of files differ from what was indexed at ``base_ref``).

    Committed drift comes from ``git diff --name-status base_ref HEAD``;
    uncommitted drift from the porcelain status; the union is the exact
    work-list for :func:`knowledge_graph_spark.incremental.apply_file_changes`.
    """
    proc = subprocess.run(
        ["git", "diff", "--name-status", "--no-renames", base_ref, "HEAD"],
        cwd=repo_path,
        capture_output=True,
        text=True,
        check=True,
    )
    out = FileChanges()
    for line in proc.stdout.splitlines():
        if "\t" not in line:
            continue
        code, path = line.split("\t", 1)
        is_dir = is_dir_path(path)
        if code.startswith("D"):
            (out.deleted_dirs if is_dir else out.deleted_files).add(path)
        elif code[0] in "AM":
            (out.changed_dirs if is_dir else out.changed_files).add(path)
    # reconcile with uncommitted drift — the worktree wins both ways: a path
    # deleted at HEAD but re-created uncommitted is changed (it will be
    # re-extracted); a path changed at HEAD but deleted uncommitted is deleted
    wt = git_status_changes(repo_path)
    out.changed_files = (out.changed_files | wt.changed_files) - wt.deleted_files
    out.changed_dirs = (out.changed_dirs | wt.changed_dirs) - wt.deleted_dirs
    out.deleted_files = (out.deleted_files - wt.changed_files) | wt.deleted_files
    out.deleted_dirs = (out.deleted_dirs - wt.changed_dirs) | wt.deleted_dirs
    return out


def reindex_from_git_status(spark, base, repo_path: str, repository_name: str = "repo"):
    """Full git-driven incremental cycle: git status → FileChanges →
    re-extract → anti-join splice (the reindex_repository path of
    crates/indexer/src/indexer.rs driven by ChangesFileSource).

    Returns ``(merged_graph, changes)``; with no changes, returns
    ``(base, changes)`` untouched (the reference's has_changes() early-out).
    """
    from knowledge_graph_spark.incremental import apply_file_changes
    from knowledge_graph_spark.pipeline.indexer import index_repository
    from knowledge_graph_spark.persist import release_ids, track_pins

    changes = git_status_changes(repo_path)
    if not changes.has_changes():
        return base, changes
    # fresh extraction of current content; apply_file_changes selects only
    # the touched files' rows out of it (left-semi on the change set).
    # Pin hygiene (r9, ADVICE r8): the splice pins its build sides eagerly;
    # repeated git-driven reindexes in a long-lived session must not accrete
    # those blocks. The merged graph is materialized (lineage truncated) so
    # the intermediate pins can be released before returning — the returned
    # tables read their own checkpoints; callers unpersist them when done.
    with track_pins() as pins:
        fresh, _ = index_repository(spark, repo_path, repository_name=repository_name)
        merged = apply_file_changes(
            spark,
            base,
            fresh,
            sorted(changes.changed_files),
            sorted(changes.deleted_files),
        )
    # materialize OUTSIDE the tracked scope: the merged tables' own
    # checkpoint blocks must survive the release below (the returned graph
    # reads them); it must run BEFORE the release, while the splice's pinned
    # build sides its plan references still exist
    merged.materialize(truncate=True, coalesce_to=4)
    for df in getattr(fresh, "_cached_intermediates", []):
        df.unpersist()
    release_ids(spark, pins)
    return merged, changes
