"""kgs — the command-line front door, mirroring the reference's ``gkg`` CLI.

Reference mapping (crates/gkg/src):
- Subcommand surface — ``cli.rs:31-63``: ``index <workspace> [--threads]
  [--verbose] [--stats[=FILE]]``, ``server start/stop``, ``clean``,
  ``devtools query|list``.
- ``index`` refuses to run while the server is up and prints/exports a
  WorkspaceStatistics summary — ``commands/index.rs:16-121``; the exported
  JSON shape mirrors ``indexer/src/stats.rs:96-139`` (metadata + totals +
  per-project ProjectStatistics + total_languages).
- ``server start`` preselects a port, writes a lock file with {port, pid},
  prints one-line JSON ``{"port": N}`` to stdout, and serves until SIGTERM;
  ``--detached`` forks a setsid child exactly like ``commands/server.rs``
  (print_server_info + provisional lock + child --port).
- ``server stop`` reads the lock and SIGTERMs the recorded pid
  (``commands/server.rs`` stop path); ``clean`` refuses while the server
  runs then drops every workspace data dir (``commands/clean.rs:10-19``).
- ``devtools query --project P <query-or-file>`` resolves the project's
  at-rest graph through the manifest and executes the query read-only
  (``commands/query.rs:13-66`` — Cypher against Kuzu there, Spark SQL over
  the registered parquet views here); ``devtools list`` prints projects /
  workspace folders (``commands/list.rs:12-33``).

Spark-first notes: the CLI is driver-side plumbing around the distributed
engine — indexing work happens in ``workspace.index_workspace`` (mapInPandas
extraction over a distributed file frame), queries run through Catalyst on
the parquet-at-rest graph. Nothing here touches data by the row except
result printing, which is LIMIT-bounded.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import socket
import subprocess
import sys
import time

__version__ = "0.1.0"

LOCK_FILE = "kgs.lock"


# -- home / lock-file plumbing (gkg/src/utils.rs:20-100) ---------------------
def kgs_home() -> str:
    """Root for the manifest + per-project graph data (reference: ~/.gkg)."""
    return os.environ.get("KGS_HOME", os.path.join(os.path.expanduser("~"), ".kgs"))


def data_dir() -> str:
    return os.path.join(kgs_home(), "data")


def lock_path() -> str:
    return os.path.join(kgs_home(), LOCK_FILE)


def read_lock() -> dict | None:
    """utils.rs:44-59 — corrupt lock files are removed and treated as absent."""
    path = lock_path()
    if not os.path.exists(path):
        return None
    try:
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        try:
            os.remove(path)
        except OSError:
            pass
        return None


def write_lock(port: int, pid: int | None) -> None:
    os.makedirs(kgs_home(), exist_ok=True)
    tmp = lock_path() + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"port": port, "pid": pid}, f)
    os.replace(tmp, lock_path())


def remove_lock() -> None:
    try:
        os.remove(lock_path())
    except OSError:
        pass


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def is_server_running() -> int | None:
    """Return the live server's port, else None (utils.rs:77-100: pid check
    first, then a port connect for pid-less provisional locks)."""
    lock = read_lock()
    if lock is None:
        return None
    port = lock.get("port")
    pid = lock.get("pid")
    if pid is not None:
        if _pid_alive(int(pid)):
            return int(port)
        remove_lock()  # stale lock from a dead server
        return None
    # provisional lock (detached parent wrote it before the child booted):
    # consider it live — the child is coming up
    return int(port) if port is not None else None


def find_unused_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def print_server_info(port: int) -> None:
    """One-line JSON on stdout — commands/server.rs print_server_info."""
    sys.stdout.write(json.dumps({"port": port}) + "\n")
    sys.stdout.flush()


# -- project discovery --------------------------------------------------------
def discover_projects(workspace_path: str, max_depth: int = 2) -> list[str]:
    """Find git repositories under a workspace folder (the reference's
    gitalisk workspace scan). A directory containing ``.git`` is a project;
    if none exist the workspace itself is the single project."""
    ws = os.path.realpath(workspace_path)
    if os.path.isdir(os.path.join(ws, ".git")):
        return [ws]
    found: list[str] = []

    def walk(d: str, depth: int) -> None:
        if depth > max_depth:
            return
        try:
            entries = sorted(os.scandir(d), key=lambda e: e.name)
        except OSError:
            return
        for e in entries:
            if not e.is_dir(follow_symlinks=False) or e.name.startswith("."):
                continue
            if os.path.isdir(os.path.join(e.path, ".git")):
                found.append(e.path)
            else:
                walk(e.path, depth + 1)

    walk(ws, 1)
    return found or [ws]


# -- stats export (indexer/src/stats.rs:96-139) -------------------------------
def workspace_statistics(
    workspace_path: str, stats_by_project: dict, duration: float
) -> dict:
    """Fold per-project IndexingStats into the reference's
    WorkspaceStatistics JSON shape (metadata / totals / total_languages /
    projects), field names matching stats.rs:96-139."""
    projects = []
    total_languages: dict[str, dict] = {}
    totals = {
        "total_files": 0,
        "total_definitions": 0,
        "total_imported_symbols": 0,
        "total_definition_relationships": 0,
        "total_imported_symbol_relationships": 0,
    }
    for p_path in sorted(stats_by_project):
        s = stats_by_project[p_path]
        languages = []
        for lang in sorted(s.per_language):
            entry = s.per_language[lang]
            lang_stats = {
                "language": lang,
                "file_count": entry.get("files", 0),
                "definitions_count": entry.get("definitions_count", 0),
                "definition_type_counts": entry.get("definition_type_counts", {}),
            }
            languages.append(lang_stats)
            agg = total_languages.setdefault(
                lang,
                {"file_count": 0, "definitions_count": 0, "definition_type_counts": {}},
            )
            agg["file_count"] += lang_stats["file_count"]
            agg["definitions_count"] += lang_stats["definitions_count"]
            for t, n in lang_stats["definition_type_counts"].items():
                agg["definition_type_counts"][t] = (
                    agg["definition_type_counts"].get(t, 0) + n
                )
        projects.append(
            {
                "project_name": s.repository_name,
                "project_path": p_path,
                "total_files": s.total_files,
                "total_definitions": s.total_definitions,
                "total_imported_symbols": s.total_imported_symbols,
                "total_definition_relationships": s.total_definition_relationships,
                "total_imported_symbol_relationships": s.total_imported_symbol_relationships,
                "languages": languages,
                "indexing_duration_seconds": s.duration_seconds,
            }
        )
        totals["total_files"] += s.total_files
        totals["total_definitions"] += s.total_definitions
        totals["total_imported_symbols"] += s.total_imported_symbols
        totals["total_definition_relationships"] += s.total_definition_relationships
        totals["total_imported_symbol_relationships"] += (
            s.total_imported_symbol_relationships
        )
    return {
        "metadata": {
            "kgs_version": __version__,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "workspace_path": workspace_path,
            "indexing_duration_seconds": round(duration, 3),
        },
        "total_projects": len(projects),
        **totals,
        "total_languages": total_languages,
        "projects": projects,
    }


def _print_stats_summary(stats: dict) -> None:
    """The stdout summary of commands/index.rs handle_statistics_output."""
    print("Indexing Summary:")
    print(f"  - Total Projects: {stats['total_projects']}")
    print(f"  - Total Files: {stats['total_files']}")
    print(f"  - Total Definitions: {stats['total_definitions']}")
    print(f"  - Total Imported Symbols: {stats['total_imported_symbols']}")
    print(
        "  - Total Definition Relationships: "
        f"{stats['total_definition_relationships']}"
    )
    print(
        "  - Total Imported Symbol Relationships: "
        f"{stats['total_imported_symbol_relationships']}"
    )
    if stats["projects"]:
        print("Project Timing:")
        for p in stats["projects"]:
            print(
                f"  - {p['project_name']}: {p['indexing_duration_seconds']:.2f}s "
                f"({p['total_files']} files, {p['total_definitions']} definitions, "
                f"{p['total_imported_symbols']} imported symbols)"
            )
    if stats["total_languages"]:
        print("Language Breakdown:")
        ranked = sorted(
            stats["total_languages"].items(),
            key=lambda kv: -kv[1]["file_count"],
        )
        for lang, summary in ranked[:10]:
            print(
                f"  - {lang}: {summary['file_count']} files, "
                f"{summary['definitions_count']} definitions"
            )
        if len(ranked) > 10:
            print(f"  ... and {len(ranked) - 10} more languages")


# -- spark bootstrap -----------------------------------------------------------
def _get_spark(threads: int):
    if threads and threads > 0:
        os.environ["SPARK_GRAFT_CPUS"] = str(threads)
    from knowledge_graph_spark.session import get_spark

    return get_spark(app_name="kgs-cli")


def _manager():
    from knowledge_graph_spark.workspace import WorkspaceManager

    os.makedirs(data_dir(), exist_ok=True)
    return WorkspaceManager(data_dir())


# -- subcommands ----------------------------------------------------------------
def cmd_index(args) -> int:
    port = is_server_running()
    if port is not None:
        print(
            f"Error: kgs server is running on port {port}. "
            "Please stop it to run indexing from the CLI.",
            file=sys.stderr,
        )
        return 1
    workspace = os.path.realpath(args.workspace_path)
    if not os.path.isdir(workspace):
        print(f"Error: workspace path not found: {workspace}", file=sys.stderr)
        return 1
    from knowledge_graph_spark.workspace import index_workspace

    manager = _manager()
    manager.register_workspace_folder(workspace)
    for proj in discover_projects(workspace):
        manager.register_project(workspace, proj)
    spark = _get_spark(args.threads)
    t0 = time.time()
    _, stats_by_project = index_workspace(spark, manager, workspace)
    duration = time.time() - t0
    stats = workspace_statistics(workspace, stats_by_project, duration)
    if args.stats is not None:
        if args.stats:  # --stats=FILE
            with open(args.stats, "w", encoding="utf-8") as f:
                json.dump(stats, f, indent=2)
            print(f"Statistics saved to: {args.stats}")
        _print_stats_summary(stats)
    print(
        f"Indexed {stats['total_projects']} project(s), "
        f"{stats['total_files']} files in {duration:.2f}s"
    )
    return 0


# MCP registration name — the reference's MCP_NAME (mcp/src/lib.rs:10).
MCP_NAME = "knowledge-graph"


def register_mcp_config(config_path: str, port: int) -> None:
    """Add/refresh this server's SSE entry in an MCP client config file —
    add_local_http_server_to_mcp_config (mcp/src/duo_configuration.rs:85-126):
    get-or-create the JSON, then idempotently upsert
    mcpServers[MCP_NAME] = {"type": "sse", "url": ..., "approvedTools": true}
    (matching URL with both extras present → no-op; matching URL missing
    extras → fill; anything else → overwrite). ``~`` expands."""
    path = os.path.expanduser(config_path)
    cfg: dict = {"mcpServers": {}}
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            cfg = json.load(f)
        cfg.setdefault("mcpServers", {})
    else:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    url = f"http://localhost:{port}/mcp/sse"
    cur = cfg["mcpServers"].get(MCP_NAME)
    if (
        isinstance(cur, dict)
        and cur.get("url") == url
        and cur.get("approvedTools") is not None
        and cur.get("type") is not None
    ):
        return
    cfg["mcpServers"][MCP_NAME] = {
        "type": "sse",
        "url": url,
        "approvedTools": True,
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(cfg, f, indent=2)


def _detached_child_cmd(args, port: int) -> list:
    """argv for the detached serving child — every serving-relevant flag
    must be forwarded (--disable-tool was silently dropped; ADVICE r7)."""
    cmd = [
        sys.executable,
        "-m",
        "knowledge_graph_spark.cli",
        "server",
        "start",
        "--port",
        str(port),
    ]
    if getattr(args, "enable_reindexing", False):
        cmd.append("--enable-reindexing")  # the child serves; it watches
    for t in getattr(args, "disable_tool", None) or []:
        cmd += ["--disable-tool", t]
    return cmd


def cmd_server_start(args) -> int:
    lock = read_lock()
    adopting = (
        lock is not None
        and lock.get("pid") is None
        and args.port is not None
        and lock.get("port") == args.port
    )  # we ARE the detached child the provisional lock was written for
    if not adopting:
        existing = is_server_running()
        if existing is not None:
            # already up: just report where (server.rs detached re-entry
            # path) — and still honor --register-mcp with the live port
            # (server.rs:52-53)
            if getattr(args, "register_mcp", None):
                register_mcp_config(args.register_mcp, existing)
            print_server_info(existing)
            return 0
    if args.detached:
        port = args.port or find_unused_port()
        write_lock(port, None)  # provisional — child fills in its pid
        if getattr(args, "register_mcp", None):
            register_mcp_config(args.register_mcp, port)
        print_server_info(port)
        cmd = _detached_child_cmd(args, port)
        subprocess.Popen(
            cmd,
            stdin=subprocess.DEVNULL,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            start_new_session=True,  # setsid — detach from the terminal
            env=os.environ.copy(),
        )
        return 0

    # foreground serve
    from knowledge_graph_spark.serving.http_server import make_server

    spark = _get_spark(0)
    manager = _manager()
    port = args.port or find_unused_port()
    tools_enabled = None
    if getattr(args, "disable_tool", None):
        from knowledge_graph_spark.serving.http_server import MCP_TOOLS

        tools_enabled = set(MCP_TOOLS) - set(args.disable_tool)
    srv = make_server(
        spark,
        manager,
        port=port,
        jwt_secret=os.environ.get("KGS_JWT_SECRET"),
        tools_enabled=tools_enabled,
    )
    # --enable-reindexing: spawn the live FS-watch loop feeding the
    # debounce → queue-coalesce → incremental-splice pipeline, exactly the
    # reference's watcher spawn (http-server-desktop/src/lib.rs:104)
    live = None
    if getattr(args, "enable_reindexing", False):
        live = start_live_reindexer(spark, manager, srv.service)
    write_lock(port, os.getpid())
    if getattr(args, "register_mcp", None):
        register_mcp_config(args.register_mcp, port)
    print_server_info(port)

    def _term(signum, frame):  # noqa: ARG001
        raise SystemExit(0)

    signal.signal(signal.SIGTERM, _term)
    try:
        srv.serve_forever()
    except (KeyboardInterrupt, SystemExit):
        pass
    finally:
        if live is not None:
            live.stop()
        srv.shutdown()
        remove_lock()
    return 0


def start_live_reindexer(spark, manager, service, backend: str | None = None):
    """Build + start the --enable-reindexing watcher wired to the serving
    layer (cache invalidation + event bus). Split out so tests drive the
    same wiring the CLI uses without a subprocess. ``backend`` selects the
    change source: None = auto (inotify on Linux, scandir poller
    elsewhere), or force 'poll' / 'inotify'."""
    from knowledge_graph_spark.streaming.live_watcher import LiveReindexer

    return LiveReindexer(
        spark,
        manager,
        on_event=service.on_event,
        invalidate=service.invalidate,
        backend=backend,
    ).start()


def cmd_server_stop(_args) -> int:
    lock = read_lock()
    if lock is None:
        print("kgs server is not running")
        return 0
    pid = lock.get("pid")
    if pid is not None and _pid_alive(int(pid)):
        os.kill(int(pid), signal.SIGTERM)
        # wait for the lock to disappear (the server removes it on shutdown)
        for _ in range(100):
            if read_lock() is None:
                break
            time.sleep(0.1)
    remove_lock()
    print("kgs server stopped")
    return 0


def cmd_clean(_args) -> int:
    port = is_server_running()
    if port is not None:
        print(
            f"Error: kgs server is running on port {port}. "
            "Stop it before running clean.",
            file=sys.stderr,
        )
        return 1
    manager = _manager()
    manager.clean()
    print("Clean completed")
    return 0


def cmd_devtools_query(args) -> int:
    manager = _manager()
    target = os.path.realpath(args.project)
    info = next(
        (
            p
            for p in manager.list_all_projects()
            if os.path.realpath(p.project_path) == target
        ),
        None,
    )
    if info is None:
        print("Project not found", file=sys.stderr)
        return 1
    query = args.query_or_file
    if os.path.exists(query):
        with open(query, encoding="utf-8") as f:
            query = f.read()
    if not query.strip():
        print("Empty query provided", file=sys.stderr)
        return 1
    from knowledge_graph_spark.graph.model import KnowledgeGraph

    spark = _get_spark(0)
    kg = KnowledgeGraph.read(
        spark, info.graph_dir, os.path.basename(info.project_path.rstrip("/"))
    )
    rows = kg.sql(query).limit(args.limit).collect()
    for row in rows:
        print(json.dumps(row.asDict(recursive=True), default=str))
    return 0


def cmd_devtools_list(args) -> int:
    manager = _manager()
    if args.workspace_folders:
        if args.header:
            print("Workspace folders:")
        for ws in manager.list_workspace_folders():
            print(ws)
    if args.projects:
        if args.header:
            print("Projects:")
        for p in manager.list_all_projects():
            print(p.project_path)
    return 0


# -- parser -----------------------------------------------------------------
def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="kgs",
        description=(
            "Knowledge Graph on Spark CLI — creates a structured, queryable "
            "representation of code repositories."
        ),
    )
    parser.add_argument("--version", action="version", version=f"kgs {__version__}")
    sub = parser.add_subparsers(dest="command", required=True)

    p_index = sub.add_parser("index", help="Index repositories in a workspace")
    p_index.add_argument("workspace_path", nargs="?", default=".")
    p_index.add_argument(
        "-t", "--threads", type=int, default=0, help="0 = auto-detect"
    )
    p_index.add_argument("-v", "--verbose", action="store_true")
    p_index.add_argument(
        "--stats",
        nargs="?",
        const="",
        default=None,
        metavar="FILE",
        help="Output statistics; optionally save JSON to FILE",
    )
    p_index.set_defaults(func=cmd_index)

    p_server = sub.add_parser("server", help="Manage the kgs server")
    server_sub = p_server.add_subparsers(dest="action", required=True)
    p_start = server_sub.add_parser("start", help="Start the kgs server")
    p_start.add_argument("--port", type=int, default=None)
    p_start.add_argument("--detached", action="store_true")
    p_start.add_argument("--enable-reindexing", action="store_true")
    p_start.add_argument(
        "--disable-tool",
        action="append",
        default=None,
        metavar="TOOL",
        dest="disable_tool",
        help=(
            "Disable an MCP tool for this deployment (repeatable); disabled "
            "tools are omitted from tools/list and tools/call answers "
            "method-not-found"
        ),
    )
    p_start.add_argument(
        "--register-mcp",
        metavar="FILE",
        default=None,
        help="Register this server's SSE endpoint in an MCP client config file",
    )
    p_start.set_defaults(func=cmd_server_start)
    p_stop = server_sub.add_parser("stop", help="Stop the running kgs server")
    p_stop.set_defaults(func=cmd_server_stop)

    p_clean = sub.add_parser("clean", help="Remove all indexed data")
    p_clean.set_defaults(func=cmd_clean)

    p_dev = sub.add_parser("devtools", help="Developer tools")
    dev_sub = p_dev.add_subparsers(dest="devcommand", required=True)
    p_query = dev_sub.add_parser("query", help="Run a SQL query against a project graph")
    p_query.add_argument("--project", required=True)
    p_query.add_argument("query_or_file", metavar="QUERY_OR_FILE")
    p_query.add_argument("--limit", type=int, default=1000)
    p_query.set_defaults(func=cmd_devtools_query)
    p_list = dev_sub.add_parser("list", help="List indexed repositories")
    p_list.add_argument("--projects", action="store_true", default=True)
    p_list.add_argument("--workspace-folders", action="store_true", default=False)
    p_list.add_argument("--header", action="store_true", default=False)
    p_list.set_defaults(func=cmd_devtools_list)

    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
