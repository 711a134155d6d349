"""CLI contract tests — the ``kgs`` front door driven end-to-end as real
subprocesses (index → server start → HTTP query → stop → clean), mirroring
the reference's own e2e server test (crates/gkg/tests/server.rs) and the
command semantics of crates/gkg/src/commands/{index,server,clean,query,list}.rs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CORPUS = {
    "svc/app/models/user.py": (
        "class User:\n"
        "    def activate(self):\n"
        "        return notify_user()\n"
        "\n"
        "def notify_user():\n"
        "    return 1\n"
    ),
    "svc/app/main.py": (
        "from app.models.user import User\n"
        "def run():\n"
        "    u = User()\n"
        "    u.activate()\n"
    ),
}


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    home = tmp_path_factory.mktemp("kgs-home")
    ws = tmp_path_factory.mktemp("kgs-ws")
    # a git-marked project inside the workspace → discover_projects finds it
    proj = ws / "svc"
    (proj / ".git").mkdir(parents=True)
    for rel, content in CORPUS.items():
        p = ws / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    env = os.environ.copy()
    env["KGS_HOME"] = str(home)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_GRAFT_CPUS"] = "4"
    env["SPARK_GRAFT_DRIVER_MEM"] = "2g"
    return {"env": env, "home": str(home), "ws": str(ws), "proj": str(proj)}


def run_cli(cli_env, *args, timeout=300):
    return subprocess.run(
        [sys.executable, "-m", "knowledge_graph_spark.cli", *args],
        env=cli_env["env"],
        capture_output=True,
        text=True,
        timeout=timeout,
    )


# -- in-process unit checks (no JVM) -----------------------------------------
def test_discover_projects(tmp_path):
    from knowledge_graph_spark.cli import discover_projects

    ws = tmp_path / "ws"
    (ws / "a" / ".git").mkdir(parents=True)
    (ws / "b" / ".git").mkdir(parents=True)
    (ws / "plain").mkdir()
    found = discover_projects(str(ws))
    assert [os.path.basename(p) for p in found] == ["a", "b"]
    # no git repos at all → the workspace itself is the single project
    lone = tmp_path / "lone"
    lone.mkdir()
    assert discover_projects(str(lone)) == [os.path.realpath(str(lone))]
    # the workspace IS a repo → itself
    (ws / "a" / "nested").mkdir()
    assert discover_projects(str(ws / "a")) == [os.path.realpath(str(ws / "a"))]


def test_lock_roundtrip(tmp_path, monkeypatch):
    from knowledge_graph_spark import cli

    monkeypatch.setenv("KGS_HOME", str(tmp_path))
    assert cli.read_lock() is None
    assert cli.is_server_running() is None
    cli.write_lock(4321, os.getpid())
    assert cli.is_server_running() == 4321  # our own live pid
    cli.write_lock(4321, 2**22 + 12345)  # almost surely dead pid
    assert cli.is_server_running() is None  # stale lock reaped
    assert cli.read_lock() is None
    # corrupt lock is removed, not fatal (utils.rs:57-59)
    with open(cli.lock_path(), "w") as f:
        f.write("{not json")
    assert cli.read_lock() is None
    assert not os.path.exists(cli.lock_path())


def test_register_mcp_config(tmp_path):
    """--register-mcp upsert semantics (mcp/src/duo_configuration.rs:85-126):
    creates the file, is idempotent for a matching URL with extras present,
    fills missing extras, overwrites a stale URL, and preserves other
    registered servers."""
    import json as _json

    from knowledge_graph_spark import cli

    cfg = tmp_path / "duo" / "mcp.json"
    cli.register_mcp_config(str(cfg), 4321)
    data = _json.loads(cfg.read_text())
    entry = data["mcpServers"][cli.MCP_NAME]
    assert entry == {
        "type": "sse",
        "url": "http://localhost:4321/mcp/sse",
        "approvedTools": True,
    }
    # idempotent: mtime-stable no-op on a matching, complete entry
    before = cfg.read_text()
    cli.register_mcp_config(str(cfg), 4321)
    assert cfg.read_text() == before
    # missing extras get filled for a matching URL
    data["mcpServers"][cli.MCP_NAME] = {"url": "http://localhost:4321/mcp/sse"}
    data["mcpServers"]["other"] = {"command": "x", "args": []}
    cfg.write_text(_json.dumps(data))
    cli.register_mcp_config(str(cfg), 4321)
    data = _json.loads(cfg.read_text())
    assert data["mcpServers"][cli.MCP_NAME]["approvedTools"] is True
    assert data["mcpServers"]["other"] == {"command": "x", "args": []}
    # port change overwrites the URL
    cli.register_mcp_config(str(cfg), 9999)
    data = _json.loads(cfg.read_text())
    assert data["mcpServers"][cli.MCP_NAME]["url"] == "http://localhost:9999/mcp/sse"


def test_workspace_statistics_shape():
    from knowledge_graph_spark.cli import workspace_statistics
    from knowledge_graph_spark.pipeline.indexer import IndexingStats

    s = IndexingStats(
        repository_name="svc",
        duration_seconds=1.5,
        total_files=2,
        total_definitions=4,
        total_imported_symbols=1,
        total_relationships=6,
        files_per_second=1.3,
        per_language={
            "python": {
                "files": 2,
                "definitions_count": 4,
                "definition_type_counts": {"Class": 1, "Method": 1, "Function": 2},
            }
        },
        total_definition_relationships=5,
        total_imported_symbol_relationships=1,
    )
    stats = workspace_statistics("/ws", {"/ws/svc": s}, 2.0)
    # field names match stats.rs:96-139 (WorkspaceStatistics / ProjectStatistics)
    assert stats["total_projects"] == 1
    assert stats["total_files"] == 2
    assert stats["total_definitions"] == 4
    assert stats["total_imported_symbols"] == 1
    assert stats["total_definition_relationships"] == 5
    assert stats["total_imported_symbol_relationships"] == 1
    assert stats["metadata"]["workspace_path"] == "/ws"
    (proj,) = stats["projects"]
    assert proj["project_name"] == "svc"
    assert proj["languages"][0]["language"] == "python"
    assert proj["languages"][0]["definition_type_counts"]["Class"] == 1
    assert stats["total_languages"]["python"]["file_count"] == 2


# -- subprocess e2e (one JVM per step, like gkg's own binary test) ------------
def test_cli_index_with_stats(cli_env):
    stats_file = os.path.join(cli_env["home"], "stats.json")
    r = run_cli(cli_env, "index", cli_env["ws"], f"--stats={stats_file}")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Indexing Summary:" in r.stdout
    assert "Total Projects: 1" in r.stdout
    with open(stats_file) as f:
        stats = json.load(f)
    assert stats["total_projects"] == 1
    assert stats["total_files"] == 2
    assert stats["total_definitions"] >= 4  # User, activate, notify_user, run
    assert stats["projects"][0]["project_name"] == "svc"
    langs = {l["language"] for l in stats["projects"][0]["languages"]}
    assert "Python" in langs


def test_cli_devtools_list_and_query(cli_env):
    r = run_cli(cli_env, "devtools", "list", "--workspace-folders", "--header")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Projects:" in r.stdout
    assert cli_env["proj"] in r.stdout
    assert os.path.realpath(cli_env["ws"]) in r.stdout

    r = run_cli(
        cli_env,
        "devtools",
        "query",
        "--project",
        cli_env["proj"],
        "SELECT name, definition_type FROM definition_nodes ORDER BY name",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(line) for line in r.stdout.strip().splitlines()]
    names = {row["name"] for row in rows}
    assert {"User", "activate", "notify_user", "run"} <= names

    # unknown project → error exit (query.rs "Project not found")
    r = run_cli(cli_env, "devtools", "query", "--project", "/nope", "SELECT 1")
    assert r.returncode == 1
    assert "Project not found" in r.stderr


def test_cli_server_lifecycle_and_clean(cli_env):
    # start detached: prints {"port": N} immediately, child boots in background
    r = run_cli(cli_env, "server", "start", "--detached", timeout=60)
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[0])
    port = info["port"]
    base = f"http://127.0.0.1:{port}"

    try:
        # poll health until the child's JVM is up
        deadline = time.time() + 240
        last_err = None
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(base + "/api/health", timeout=5) as resp:
                    if json.loads(resp.read())["status"] == "ok":
                        break
            except Exception as exc:  # noqa: BLE001
                last_err = exc
                time.sleep(1.0)
        else:
            pytest.fail(f"server never came up: {last_err}")

        # the indexed workspace is visible through the running server
        with urllib.request.urlopen(base + "/api/workspace/list", timeout=30) as resp:
            listing = json.loads(resp.read())
        assert any(
            p["project_path"] == cli_env["proj"]
            for ws in listing["workspace_folders"]
            for p in ws["projects"]
        ), listing

        # index + clean both refuse while the server runs (index.rs/clean.rs)
        r = run_cli(cli_env, "index", cli_env["ws"], timeout=60)
        assert r.returncode == 1 and "server is running" in r.stderr
        r = run_cli(cli_env, "clean", timeout=60)
        assert r.returncode == 1 and "server is running" in r.stderr

        # second start while running just reports the existing port
        r = run_cli(cli_env, "server", "start", "--detached", timeout=60)
        assert r.returncode == 0
        assert json.loads(r.stdout.strip().splitlines()[0])["port"] == port
    finally:
        r = run_cli(cli_env, "server", "stop", timeout=120)
    assert r.returncode == 0
    assert "stopped" in r.stdout
    lock = os.path.join(cli_env["home"], "kgs.lock")
    assert not os.path.exists(lock)

    # clean now succeeds and empties the data dir
    r = run_cli(cli_env, "clean", timeout=60)
    assert r.returncode == 0 and "Clean completed" in r.stdout
    r = run_cli(cli_env, "devtools", "list", timeout=60)
    assert r.returncode == 0
    assert cli_env["proj"] not in r.stdout


def test_detached_child_cmd_forwards_gating_flags():
    """The detached parent's child argv carries --enable-reindexing AND
    every --disable-tool — dropping the latter silently served all MCP
    tools (ADVICE r7)."""
    from types import SimpleNamespace

    from knowledge_graph_spark.cli import _detached_child_cmd

    args = SimpleNamespace(
        enable_reindexing=True, disable_tool=["index_project", "search"]
    )
    cmd = _detached_child_cmd(args, 4242)
    assert cmd[-7:] == [
        "--port", "4242", "--enable-reindexing",
        "--disable-tool", "index_project", "--disable-tool", "search",
    ]
    bare = _detached_child_cmd(SimpleNamespace(), 1)
    assert "--enable-reindexing" not in bare and "--disable-tool" not in bare
