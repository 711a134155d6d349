"""Git-status change source tests — FileChanges parity with
crates/indexer/src/parsing/changes.rs plus the reference's own reindex
scenario (tests.rs:292-341 test_full_reindexing_pipeline_git_status_ruby)
replayed through ACTUAL git state: init → commit → mutate (modify/add/delete)
→ git status → apply_file_changes, and the branch-checkout case via
git_changes_since."""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

from knowledge_graph_spark.pipeline.changes import (
    FileChanges,
    git_changes_since,
    git_status_changes,
    is_dir_path,
    reindex_from_git_status,
)

GIT_ENV = {
    **os.environ,
    "GIT_AUTHOR_NAME": "t",
    "GIT_AUTHOR_EMAIL": "t@t",
    "GIT_COMMITTER_NAME": "t",
    "GIT_COMMITTER_EMAIL": "t@t",
    "HOME": os.environ.get("HOME", "/root"),
}


def git(repo, *args) -> str:
    return subprocess.run(
        ["git", *args], cwd=repo, capture_output=True, text=True, check=True,
        env=GIT_ENV,
    ).stdout


# -- pure parsing (changes.rs:41-76) ------------------------------------------
def test_is_dir_heuristic():
    # changes.rs:33-39 verbatim: trailing slash, or last segment with no dot
    assert is_dir_path("app/models/")
    assert is_dir_path("app/models")
    assert not is_dir_path("app/models/user.rb")
    assert not is_dir_path("setup.py")


def test_from_git_status_buckets():
    fc = FileChanges.from_git_status(
        [
            " M app/models/base_model.rb",   # worktree modified
            "M  app/config.rb",              # index modified
            "A  app/new_file.rb",            # index added
            "?? app/utils/string_utils.rb",  # untracked → Added analog
            " D app/old.rb",                 # worktree deleted
            "D  app/gone.rb",                # index deleted
            " D app/legacy",                 # deleted dir (no dot)
            "?? app/newdir",                 # changed dir
            "UU app/conflict.rb",            # unmerged → ignored (no match arm)
        ]
    )
    assert fc.changed_files == {
        "app/models/base_model.rb",
        "app/config.rb",
        "app/new_file.rb",
        "app/utils/string_utils.rb",
    }
    assert fc.deleted_files == {"app/old.rb", "app/gone.rb"}
    assert fc.deleted_dirs == {"app/legacy"}
    assert fc.changed_dirs == {"app/newdir"}
    assert fc.has_changes()
    assert not FileChanges().has_changes()


def test_from_watched_files(tmp_path):
    (tmp_path / "live.py").write_text("x = 1\n")
    (tmp_path / "adir").mkdir()
    fc = FileChanges.from_watched_files(
        str(tmp_path), ["live.py", "adir", "gone.py", "gonedir"]
    )
    assert fc.changed_files == {"live.py"}
    assert fc.changed_dirs == {"adir"}
    assert fc.deleted_files == {"gone.py"}
    assert fc.deleted_dirs == {"gonedir"}


# -- real git repos -----------------------------------------------------------
@pytest.fixture()
def git_repo(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    git(repo, "init", "-q")
    return repo


def test_git_status_changes_real_repo(git_repo):
    (git_repo / "a.py").write_text("def f():\n    return 1\n")
    (git_repo / "b.py").write_text("def g():\n    return 2\n")
    git(git_repo, "add", "-A")
    git(git_repo, "commit", "-qm", "base")
    # clean tree → no changes (the has_changes() early-out path)
    assert not git_status_changes(str(git_repo)).has_changes()
    # mutate: modify, add untracked (inside an untracked dir), delete
    (git_repo / "a.py").write_text("def f():\n    return 10\n")
    (git_repo / "pkg").mkdir()
    (git_repo / "pkg" / "c.py").write_text("def h():\n    return 3\n")
    os.remove(git_repo / "b.py")
    fc = git_status_changes(str(git_repo))
    assert fc.changed_files == {"a.py", "pkg/c.py"}
    assert fc.deleted_files == {"b.py"}


def test_git_changes_since_branch_checkout(git_repo):
    """The case the FS watcher never sees: a branch checkout swaps thousands
    of files with no events mid-flight. Diffing the indexed ref against the
    new HEAD recovers the exact work-list."""
    (git_repo / "keep.py").write_text("K = 1\n")
    (git_repo / "mod.py").write_text("M = 1\n")
    (git_repo / "drop.py").write_text("D = 1\n")
    git(git_repo, "add", "-A")
    git(git_repo, "commit", "-qm", "base")
    base_ref = git(git_repo, "rev-parse", "HEAD").strip()

    git(git_repo, "checkout", "-qb", "feature")
    (git_repo / "mod.py").write_text("M = 2\n")
    (git_repo / "new.py").write_text("N = 1\n")
    git(git_repo, "rm", "-q", "drop.py")
    git(git_repo, "add", "-A")
    git(git_repo, "commit", "-qm", "feature work")

    # plain status is CLEAN after the commit — checkout drift is invisible
    assert not git_status_changes(str(git_repo)).has_changes()
    fc = git_changes_since(str(git_repo), base_ref)
    assert fc.changed_files == {"mod.py", "new.py"}
    assert fc.deleted_files == {"drop.py"}

    # uncommitted drift on top reconciles worktree-wins
    (git_repo / "new.py").unlink()
    (git_repo / "drop.py").write_text("D = 2\n")  # resurrected untracked
    fc = git_changes_since(str(git_repo), base_ref)
    assert "new.py" in fc.deleted_files and "new.py" not in fc.changed_files
    assert "drop.py" in fc.changed_files and "drop.py" not in fc.deleted_files


def test_reference_git_scenario_end_to_end(spark, tmp_path_factory):
    """tests.rs:292-341 through actual git state: copy the reference's ruby
    fixture, commit it, index, apply modify_test_repo_ruby's four mutations
    (tests.rs:47-110) UNCOMMITTED, then reindex_from_git_status. The merged
    graph must equal a from-scratch index on content keys — the same
    equality the mutation-level twin (test_incremental.py) pins with a
    hand-built change list; here the list comes from git itself."""
    from knowledge_graph_spark.pipeline.indexer import index_repository

    src = "/root/reference/fixtures/test-repo"
    if not os.path.isdir(src):
        pytest.skip("reference fixtures not present")
    root = tmp_path_factory.mktemp("git-reidx") / "test-repo"
    shutil.copytree(src, root)
    shutil.rmtree(root / ".git", ignore_errors=True)
    git(root, "init", "-q")
    git(root, "add", "-A")
    git(root, "commit", "-qm", "baseline")

    base_out = str(tmp_path_factory.mktemp("git-reidx-base"))
    base_kg, _ = index_repository(spark, str(root), out_dir=base_out, repository_name="tr")

    # modify_test_repo_ruby verbatim (tests.rs:47-110)
    bm = root / "app/models/base_model.rb"
    bm.write_text(
        "\n\n"
        + bm.read_text().replace(
            "  def self.create(attributes)\n    instance = new(attributes)\n"
            "    instance.save\n    instance\n  end",
            "  def self.create(attributes)\n    instance = new(attributes)\n"
            "    instance.save\n    instance\n  end\n\n"
            "  def self.find_by_attributes(attrs)\n    where(attrs)\n  end",
        )
    )
    su = root / "app/utils/string_utils.rb"
    su.parent.mkdir(parents=True, exist_ok=True)
    su.write_text(
        "require 'string_toolkit'\n"
        "module StringUtils\n"
        "  def self.sanitize(str)\n    str.strip.downcase\n  end\n\n"
        "  def self.titleize(str)\n    str.split(' ').map(&:capitalize).join(' ')\n  end\n"
        "end\n"
    )
    um = root / "app/models/user_model.rb"
    um.write_text(
        "require_relative '../utils/string_utils'\n\n"
        + um.read_text()
        + "\n  # Add name formatting\n  def format_name\n"
        "    StringUtils.titleize(name)\n  end\n"
    )
    bm.write_text(
        bm.read_text().replace(
            "  def to_h\n    instance_variables.each_with_object({}) do |var, hash|\n"
            "      key = var.to_s.delete('@').to_sym\n"
            "      hash[key] = instance_variable_get(var)\n    end\n  end\n\n",
            "",
        )
    )

    # the change list now comes from git, not a hand-built vector
    merged, changes = reindex_from_git_status(spark, base_kg, str(root), "tr")
    assert changes.changed_files == {
        "app/models/base_model.rb",
        "app/models/user_model.rb",
        "app/utils/string_utils.rb",
    }
    assert not changes.deleted_files

    fresh_out = str(tmp_path_factory.mktemp("git-reidx-fresh"))
    fresh_kg, _ = index_repository(spark, str(root), out_dir=fresh_out, repository_name="tr")
    m = {
        (r.fqn, r.primary_file_path)
        for r in merged.definitions.select("fqn", "primary_file_path").collect()
    }
    f = {
        (r.fqn, r.primary_file_path)
        for r in fresh_kg.definitions.select("fqn", "primary_file_path").collect()
    }
    assert m == f, (sorted(m - f)[:5], sorted(f - m)[:5])
    fqns = {x[0] for x in m}
    assert "BaseModel::find_by_attributes" in fqns
    assert "StringUtils::titleize" in fqns
    assert "BaseModel#to_h" not in fqns
