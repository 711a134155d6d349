"""HTTP serving shell — the reference's desktop server surface on stdlib.

Reference mapping (crates/http-server-desktop + crates/mcp):
- Graph endpoints (endpoints/graph/*.rs):
    GET /api/graph/stats/{ws}/{proj}            → graph_stats.rs:71-150
    GET /api/graph/initial/{ws}/{proj}          → graph_initial.rs:99-153
    GET /api/graph/search/{ws}/{proj}?search_term=&limit= → graph_search.rs
    GET /api/graph/neighbors/{ws}/{proj}/{node_type}/{node_id}?limit=
                                                → graph_neighbors.rs:96-170
  Path params are URL-encoded workspace/project paths (decode_url_param!).
- Workspace CRUD (workspace_list.rs / workspace_index.rs /
  workspace_delete.rs): GET /api/workspace/list, POST /api/workspace/index,
  POST /api/workspace/delete.
- /api/health, /api/info (health.rs, info.rs).
- GET /api/events → SSE replay of lifecycle events (events.rs; event-bus
  vocabulary) — each event one ``data:`` frame, stream closes after replay
  (the reference holds it open; a finite replay keeps the shell testable
  without a background reactor).
- MCP tools (mcp/src/tools/available_tools_service.rs:41-121, all 8):
  POST /api/mcp/{tool} with a JSON argument object; the response mirrors
  each tool's output shape (search_codebase_definitions returns the full
  XML + pagination + system-message contract from queries/shaping.py).
- MCP protocol framing (mcp/src/http.rs:5 streamable HTTP; sse.rs:6-19):
  POST /mcp speaks JSON-RPC 2.0 (initialize / tools/list / tools/call with
  CallToolResult content frames); GET /mcp/sse opens the SSE handshake
  whose first frame is the ``endpoint`` event naming the session's POST
  URI (/mcp/message?session=...); responses are returned on the POST body
  AND pushed live down the open stream (per-session queue; the stream
  closes after ?idle_ms without traffic so clients/tests terminate).
- Optional JWT gate (http-server-deployed jwt_authentication.rs): pass
  ``jwt_secret`` to make_server and every endpoint except /api/health and
  /api/info requires a valid HS256 Bearer token (exp enforced) — 401
  otherwise.

Architecture: the server is a thin driver-side shell — every request maps
to the SAME query-library DataFrame functions the batch surface uses, so
"serving" adds no second query engine. Collects are bounded by the
endpoints' own LIMIT contracts (50-500 rows, graph_initial.rs per-category
caps). A production deployment would put this behind Spark Connect with a
shared SparkSession exactly like this shell holds one.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from pyspark.sql import functions as F

from knowledge_graph_spark import schema as S
from knowledge_graph_spark.graph.model import KnowledgeGraph
from knowledge_graph_spark.queries import library as L
from knowledge_graph_spark.queries import shaping as SHAPE
from knowledge_graph_spark.workspace import WorkspaceManager, index_workspace

SERVER_NAME = "knowledge-graph-spark"
SERVER_VERSION = "0.3.0"

MCP_TOOLS = (
    "list_projects",
    "search_codebase_definitions",
    "index_project",
    "get_references",
    "import_usage",
    "get_definition",
    "read_definitions",
    "repo_map",
)

_NODE_TABLE_BY_TYPE = {
    "DirectoryNode": "directory_nodes",
    "FileNode": "file_nodes",
    "DefinitionNode": "definition_nodes",
    "ImportedSymbolNode": "imported_symbol_nodes",
}
_TYPE_BY_NODE_TABLE = {v: k for k, v in _NODE_TABLE_BY_TYPE.items()}

# Per-section limits of the initial graph query, keyed by the reference's
# priority groups (library.rs:454-529: directory sections use
# $directory_limit, file sections $file_limit, definition→imported_symbol
# sections $imported_symbol_limit, other definition sections
# $definition_limit, import sections $imported_symbol_limit).
_INITIAL_LIMIT_KEYS = {
    "directory_relationships": "directory_limit",
    "file_relationships": "file_limit",
    "definition_relationships": "definition_limit",
    "imported_symbol_relationships": "imported_symbol_limit",
}
_INITIAL_DEFAULTS = {
    "directory_limit": 100,
    "file_limit": 200,
    "definition_limit": 500,
    "imported_symbol_limit": 50,
}


def _s(v) -> str:
    """Null-safe string, matching the reference's get_string_value over
    nullable Kuzu columns (graph/shared.rs:108-137)."""
    return "" if v is None else str(v)


def _typed_node(node_type: str, r) -> dict:
    """One TypedGraphNode JSON object — exact field names and nesting of
    endpoints/graph/shared.rs:50-75 (serde tag ``node_type``, ``id`` =
    ``{node_type}_{node_id}``, ``label`` = name, per-type ``properties``)."""
    base = {
        "node_type": node_type,
        "id": f"{node_type}_{r.id}",
        "node_id": str(r.id),
        "label": _s(r.name),
    }
    if node_type == "DirectoryNode":
        props = {
            "path": _s(r.path),
            "absolute_path": _s(r.absolute_path),
            "repository_name": _s(r.repository_name),
        }
    elif node_type == "FileNode":
        props = {
            "path": _s(r.path),
            "absolute_path": _s(r.absolute_path),
            "repository_name": _s(r.repository_name),
            "language": _s(r.language),
            "extension": _s(r.extension),
        }
    elif node_type == "DefinitionNode":
        props = {
            "path": _s(r.primary_file_path),
            "fqn": _s(r.fqn),
            "definition_type": _s(r.definition_type),
            "start_line": int(r.start_line or 0),
            "primary_start_byte": int(r.primary_start_byte or 0),
            "primary_end_byte": int(r.primary_end_byte or 0),
            "total_locations": int(r.total_locations or 0),
        }
    else:  # ImportedSymbolNode
        props = {
            "path": _s(r.file_path),
            "start_line": int(r.start_line or 0),
            "primary_start_byte": int(r.start_byte or 0),
            "primary_end_byte": int(r.end_byte or 0),
            "import_type": _s(r.import_type),
            "import_path": _s(r.import_path),
            "import_alias": _s(r.alias),
        }
    base["properties"] = props
    return base


def _relationship(edge_table: str, src_type: str, src_id, tgt_type: str, tgt_id, rel_type: str) -> dict:
    """One GraphRelationship JSON object (graph/shared.rs:78-86):
    ``relationship_name`` is the physical table section constant,
    ``relationship_type`` the row's ``r.type``; the reference's opaque
    internal id is synthesized deterministically from the endpoints."""
    source = f"{src_type}_{src_id}"
    target = f"{tgt_type}_{tgt_id}"
    return {
        "id": f"{edge_table}:{source}->{target}:{rel_type}",
        "source": source,
        "target": target,
        "relationship_name": edge_table.upper(),
        "relationship_type": rel_type,
    }


class GraphService:
    """Driver-side state: one SparkSession + workspace manager + a cached
    KnowledgeGraph per project (the reference's Arc<Database> per path,
    kuzu/database.rs:34-74)."""

    def __init__(
        self, spark, manager: WorkspaceManager, tools_enabled: set[str] | None = None
    ) -> None:
        self.spark = spark
        self.manager = manager
        # per-deployment tool registry gating: each tool is exposed only if
        # enabled (available_tools_service.rs:41-121 registers each of the 8
        # tools behind configuration.is_tool_enabled). None = all enabled.
        self.tools_enabled = set(tools_enabled) if tools_enabled is not None else None
        self._graphs: dict[str, KnowledgeGraph] = {}
        self.events: list[dict] = []  # ST6 bus replay buffer
        # per-session SSE channels: responses POSTed to /mcp/message are
        # queued here and PUSHED down any open /mcp/sse stream
        import queue as _queue

        self.mcp_sessions: dict[str, "_queue.Queue[dict]"] = {}
        self._queue_mod = _queue
        self._lock = threading.Lock()
        self.metrics = RequestMetrics()
        # bound on live session channels — unauthenticated callers must not
        # grow this unboundedly; oldest session is evicted at the cap
        self.max_mcp_sessions = 256

    def mcp_channel(self, sid: str):
        """Get-or-create the session's push queue, evicting the oldest
        session past the cap (dict preserves insertion order)."""
        with self._lock:
            chan = self.mcp_sessions.get(sid)
            if chan is None:
                while len(self.mcp_sessions) >= self.max_mcp_sessions:
                    self.mcp_sessions.pop(next(iter(self.mcp_sessions)))
                chan = self._queue_mod.Queue()
                self.mcp_sessions[sid] = chan
            return chan

    def mcp_close(self, sid: str) -> None:
        """Drop the session channel (and any undelivered responses) when its
        SSE stream closes, so long-running servers don't leak one Queue per
        session id."""
        with self._lock:
            self.mcp_sessions.pop(sid, None)

    def is_tool_enabled(self, tool: str) -> bool:
        """is_tool_enabled (available_tools_service.rs) — gates tools/list,
        tools/call, and the REST /api/mcp/{tool} dispatch alike."""
        return self.tools_enabled is None or tool in self.tools_enabled

    # -- project graph resolution ------------------------------------------
    def project_info(self, ws: str, proj: str):
        return self.manager.get_project_info(ws, proj)

    def kg(self, ws: str, proj: str) -> KnowledgeGraph | None:
        info = self.project_info(ws, proj)
        if info is None:
            return None
        with self._lock:
            cached = self._graphs.get(info.graph_dir)
            if cached is not None:
                return cached
        try:
            g = KnowledgeGraph.read(self.spark, info.graph_dir, "served")
        except Exception:
            return None  # not indexed yet
        with self._lock:
            self._graphs[info.graph_dir] = g
        return g

    def invalidate(self, graph_dir: str) -> None:
        with self._lock:
            self._graphs.pop(graph_dir, None)

    def on_event(self, ev: dict) -> None:
        self.events.append(ev)

    # -- endpoint bodies -----------------------------------------------------
    def _hydrate_nodes(self, kg: KnowledgeGraph, keys) -> dict:
        """(node_type, id) → TypedGraphNode JSON, via ≤4 bounded id-filtered
        collects (every caller caps the key set by its LIMIT contract)."""
        by_type: dict[str, set] = {}
        for node_type, nid in keys:
            by_type.setdefault(node_type, set()).add(int(nid))
        out: dict[tuple, dict] = {}
        for node_type, ids in by_type.items():
            table = _NODE_TABLE_BY_TYPE[node_type]
            rows = kg.nodes[table].filter(F.col("id").isin(sorted(ids))).collect()
            for r in rows:
                out[(node_type, int(r.id))] = _typed_node(node_type, r)
        return out

    def stats(self, ws: str, proj: str) -> dict | None:
        kg = self.kg(ws, proj)
        if kg is None:
            return None
        rows = {
            (r.table_name, r["type"]): r.n
            for r in L.graph_stats(kg).collect()
        }
        node_counts = {
            "directory_count": rows.get(("directory_nodes", ""), 0),
            "file_count": rows.get(("file_nodes", ""), 0),
            "definition_count": rows.get(("definition_nodes", ""), 0),
            "imported_symbol_count": rows.get(("imported_symbol_nodes", ""), 0),
        }
        # GraphRelationshipCountsResponse (graph_stats.rs:33-38) carries
        # exactly three buckets; imported-symbol relationships are counted by
        # the query but excluded from the response AND the total
        # (graph_stats.rs:203-206 sums dir+file+def only).
        rel_counts = {
            "directory_relationships": 0,
            "file_relationships": 0,
            "definition_relationships": 0,
        }
        for (tab, typ), n in rows.items():
            if typ and tab in rel_counts:
                rel_counts[tab] += n
        info = self.project_info(ws, proj)
        return {
            "total_nodes": sum(node_counts.values()),
            "total_relationships": sum(rel_counts.values()),
            "node_counts": node_counts,
            "relationship_counts": rel_counts,
            "project_info": _project_json(info),
        }

    def initial(self, ws: str, proj: str, limits: dict | None = None) -> dict | None:
        """GraphInitialSuccessResponse (graph_initial.rs:41-45): edge-driven
        sections per relationship config, nodes deduped from the endpoints,
        relationships deduped by id — process_graph_row parity."""
        kg = self.kg(ws, proj)
        if kg is None:
            return None
        lims = dict(_INITIAL_DEFAULTS, **(limits or {}))
        edge_rows: list[tuple] = []  # (edge_table, row), priority-ordered
        for edge_table, pairs in S.EDGE_TABLES.items():
            for from_table, to_table in pairs:
                key = _INITIAL_LIMIT_KEYS[edge_table]
                if edge_table == "definition_relationships" and to_table == "imported_symbol_nodes":
                    key = "imported_symbol_limit"
                rows = (
                    kg.edges[edge_table]
                    .filter(
                        (F.col("source_table") == from_table)
                        & (F.col("target_table") == to_table)
                    )
                    .orderBy("source_id", "target_id", "type")
                    .limit(int(lims[key]))
                    .select("source_id", "target_id", "type")
                    .collect()
                )
                edge_rows.extend(
                    (edge_table, from_table, to_table, r) for r in rows
                )
        keys = set()
        for _, from_table, to_table, r in edge_rows:
            keys.add((_TYPE_BY_NODE_TABLE[from_table], r.source_id))
            keys.add((_TYPE_BY_NODE_TABLE[to_table], r.target_id))
        hydrated = self._hydrate_nodes(kg, keys)
        nodes, rels, seen_nodes, seen_rels = [], [], set(), set()
        for edge_table, from_table, to_table, r in edge_rows:
            sk = (_TYPE_BY_NODE_TABLE[from_table], r.source_id)
            tk = (_TYPE_BY_NODE_TABLE[to_table], r.target_id)
            for k in (sk, tk):
                if k not in seen_nodes and k in hydrated:
                    seen_nodes.add(k)
                    nodes.append(hydrated[k])
            rel = _relationship(edge_table, sk[0], sk[1], tk[0], tk[1], r["type"])
            if rel["id"] not in seen_rels:
                seen_rels.add(rel["id"])
                rels.append(rel)
        return {
            "nodes": nodes,
            "relationships": rels,
            "project_info": _project_json(self.project_info(ws, proj)),
        }

    def search(self, ws: str, proj: str, term: str, limit: int) -> dict | None:
        """GraphSearchSuccessResponse (graph_search.rs:36-40): typed nodes +
        project_info, no relationships."""
        kg = self.kg(ws, proj)
        if kg is None:
            return None
        hits = L.search_nodes(kg, term, limit=limit).collect()
        hydrated = self._hydrate_nodes(
            kg, {(r.node_type, r.id) for r in hits}
        )
        nodes = [
            hydrated[(r.node_type, r.id)]
            for r in hits
            if (r.node_type, r.id) in hydrated
        ]
        return {"nodes": nodes, "project_info": _project_json(self.project_info(ws, proj))}

    def neighbors(
        self, ws: str, proj: str, node_type: str, node_id: int, limit: int
    ) -> dict | None:
        """GraphNeighborsSuccessResponse (graph_neighbors.rs:40-44): the
        anchor + its 1-hop neighborhood as typed nodes, one relationship per
        matched edge (both endpoints always in ``nodes``)."""
        kg = self.kg(ws, proj)
        table = _NODE_TABLE_BY_TYPE.get(node_type)
        if kg is None or table is None:
            return None
        rows = L.neighbors(
            kg, table, node_id, limit=limit, include_edge_table=True
        ).collect()
        keys = {(node_type, node_id)} | {
            (_TYPE_BY_NODE_TABLE[r.neighbor_type], r.neighbor_id) for r in rows
        }
        hydrated = self._hydrate_nodes(kg, keys)
        nodes, seen = [], set()
        for k in [(node_type, node_id)] + [
            (_TYPE_BY_NODE_TABLE[r.neighbor_type], int(r.neighbor_id)) for r in rows
        ]:
            if k not in seen and k in hydrated:
                seen.add(k)
                nodes.append(hydrated[k])
        rels = []
        for r in rows:
            ntype = _TYPE_BY_NODE_TABLE[r.neighbor_type]
            if r.direction == "out":
                rels.append(
                    _relationship(r.edge_table, node_type, node_id, ntype, r.neighbor_id, r.rel_type)
                )
            else:
                rels.append(
                    _relationship(r.edge_table, ntype, r.neighbor_id, node_type, node_id, r.rel_type)
                )
        return {
            "nodes": nodes,
            "relationships": rels,
            "project_info": _project_json(self.project_info(ws, proj)),
        }

    def workspace_list(self) -> dict:
        out = []
        for ws in self.manager.list_workspace_folders():
            projects = [
                _project_json(p)
                for p in self.manager.list_all_projects()
                if p.workspace_folder_path == ws
            ]
            out.append({"workspace_folder_path": ws, "projects": projects})
        return {"workspace_folders": out}

    def workspace_index(self, ws: str) -> dict:
        if ws not in self.manager.workspaces:
            self.manager.register_workspace_folder(ws)
        events, stats = index_workspace(
            self.spark, self.manager, ws, on_event=self.on_event
        )
        for p in self.manager.list_all_projects():
            if p.workspace_folder_path == ws:
                self.invalidate(p.graph_dir)
        return {
            "status": "completed",
            "projects_indexed": sorted(stats),
            "n_events": len(events),
        }

    def workspace_delete(self, ws: str) -> dict:
        ok = self.manager.remove_workspace_folder(ws)
        return {"status": "deleted" if ok else "not_found"}

    # -- MCP tool dispatch ---------------------------------------------------
    def mcp(self, tool: str, args: dict) -> dict:
        if tool == "list_projects":
            return {
                "projects": [_project_json(p) for p in self.manager.list_all_projects()]
            }
        if tool == "index_project":
            proj = args["project_path"]
            info = self.manager.get_project_for_file(proj)
            ws = info.workspace_folder_path if info else args.get(
                "workspace_folder_path", proj
            )
            self.manager.register_project(ws, proj)
            return self.workspace_index(ws)
        # every remaining tool needs a resolved project graph
        ws, proj = args["workspace_folder_path"], args["project_path"]
        kg = self.kg(ws, proj)
        if kg is None:
            return {"error": "project not indexed"}
        if tool == "search_codebase_definitions":
            row = SHAPE.search_definitions_xml(
                kg,
                args["search_terms"],
                page=int(args.get("page", 1)),
                project_path=proj,
            ).collect()[0]
            return {
                "xml": row.xml,
                "next_page": row.next_page,
                "n_results": row.n_results,
                "system_message": row.system_message,
            }
        if tool == "get_references":
            if "relative_file_path" in args:
                # the MCP tool contract: (definition_name, relative_file_path)
                # → grouped XML render (get_references/output.rs:44-78)
                row = SHAPE.get_references_xml(
                    kg,
                    args.get("definition_name") or args["symbol_name"],
                    args["relative_file_path"],
                    page=int(args.get("page", 1)),
                ).collect()[0]
                return {
                    "xml": row.xml,
                    "next_page": row.next_page,
                    "n_results": row.n_results,
                    "system_message": row.system_message,
                }
            rows = L.get_references(
                kg, args["symbol_name"], page=int(args.get("page", 1))
            ).collect()
            return {"references": [r.asDict() for r in rows]}
        if tool == "import_usage":
            # the MCP tool's contract is the rendered XML document
            # (import_usage/output.rs:18-49); the raw rows stay available
            # for API consumers
            row = SHAPE.import_usage_xml(
                kg,
                args["import_paths"],
                page=int(args.get("page", 1)),
                page_size=int(args.get("page_size", 50)),
            ).collect()[0]
            rows = L.import_usage(kg, args["import_paths"]).collect()
            return {
                "xml": row.xml,
                "next_page": row.next_page,
                "system_message": row.system_message,
                "usages": [r.asDict() for r in rows],
            }
        if tool == "get_definition":
            if "line_content" in args and "symbol_name" in args:
                # the MCP tool contract: (file, line CONTENT, symbol) →
                # resolved hits with code spans (get_definition/service.rs)
                row = SHAPE.get_definition_xml(
                    kg,
                    args["file_path"],
                    args["line_content"],
                    args["symbol_name"],
                    project_path=proj,
                ).collect()[0]
                return {
                    "xml": row.xml,
                    "n_results": row.n_results,
                    "system_message": row.system_message,
                }
            rows = L.definition_at(
                kg, args["file_path"], int(args["line"]), int(args["column"])
            ).collect()
            return {"definitions": [r.asDict() for r in rows]}
        if tool == "read_definitions":
            reqs = [(d["name"], d["file_path"]) for d in args["definitions"]]
            row = SHAPE.read_definitions_xml(kg, reqs).collect()[0]
            rows = L.read_definitions(kg, reqs).collect()
            return {
                "xml": row.xml,
                "n_results": row.n_results,
                "system_message": row.system_message,
                "definitions": [r.asDict() for r in rows],
            }
        if tool == "repo_map":
            if args.get("depth") is not None:
                # the MCP tool contract: ASCII tree + per-file definition
                # blocks (repo_map/output.rs:103-148)
                row = SHAPE.repo_map_xml(
                    kg,
                    depth=int(args["depth"]),
                    page=int(args.get("page", 1)),
                    page_size=int(args.get("page_size", 200)),
                    show_directories=bool(args.get("show_directories", True)),
                    show_definitions=bool(args.get("show_definitions", True)),
                ).collect()[0]
                return {
                    "xml": row.xml,
                    "next_page": row.next_page,
                    "n_results": row.n_results,
                    "system_message": row.system_message,
                }
            rows = L.repo_map(kg, args.get("path_prefix", "")).collect()
            return {"entries": [r.asDict() for r in rows]}
        return {"error": f"unknown tool '{tool}'", "available": list(MCP_TOOLS)}


def _project_json(info) -> dict | None:
    """TSProjectInfo (event-bus/src/types/project_info.rs:7-16) — exact field
    set; ``last_indexed_at`` is an Option<String> (ISO-8601 here); the parquet
    directory IS the database in this engine, so both path fields name it."""
    if info is None:
        return None
    from datetime import datetime, timezone

    indexed_at = (
        datetime.fromtimestamp(info.last_indexed_at, tz=timezone.utc).isoformat()
        if info.last_indexed_at
        else None
    )
    return {
        "project_path": info.project_path,
        "workspace_folder_path": info.workspace_folder_path,
        "project_hash": info.project_hash,
        "status": info.status,
        "last_indexed_at": indexed_at,
        "error_message": info.error_message,
        "database_path": info.graph_dir,
        "parquet_directory": info.graph_dir,
    }


# Prometheus-contract latency buckets — the deployed server's histogram
# boundaries (http-server-deployed/src/metrics.rs:8-16).
_METRIC_BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0)


class RequestMetrics:
    """In-process request metrics with Prometheus text exposition — the
    deployed server's request_metrics_middleware (metrics.rs:18-35): one
    total-requests counter + a (method, path)-labelled latency histogram."""

    def __init__(self) -> None:
        self.total = 0
        # (method, path) -> [per-bucket cumulative-style raw counts, sum, n]
        self.hist: dict[tuple[str, str], list] = {}
        self._lock = threading.Lock()

    def observe(self, method: str, path: str, seconds: float) -> None:
        with self._lock:
            self.total += 1
            h = self.hist.setdefault(
                (method, path), [[0] * (len(_METRIC_BUCKETS) + 1), 0.0, 0]
            )
            idx = next(
                (i for i, b in enumerate(_METRIC_BUCKETS) if seconds <= b),
                len(_METRIC_BUCKETS),
            )
            h[0][idx] += 1
            h[1] += seconds
            h[2] += 1

    def render(self) -> str:
        """Prometheus text exposition format, version 0.0.4."""
        out = [
            "# HELP gkg_http_requests_total Total number of HTTP requests",
            "# TYPE gkg_http_requests_total counter",
            f"gkg_http_requests_total {self.total}",
            "# HELP gkg_http_request_duration_seconds HTTP request latencies in seconds",
            "# TYPE gkg_http_request_duration_seconds histogram",
        ]
        with self._lock:
            for (method, path), (counts, total_s, n) in sorted(self.hist.items()):
                labels = f'method="{method}",path="{path}"'
                cum = 0
                for b, c in zip(_METRIC_BUCKETS, counts):
                    cum += c
                    out.append(
                        f'gkg_http_request_duration_seconds_bucket{{{labels},le="{b}"}} {cum}'
                    )
                cum += counts[-1]
                out.append(
                    f'gkg_http_request_duration_seconds_bucket{{{labels},le="+Inf"}} {cum}'
                )
                out.append(
                    f"gkg_http_request_duration_seconds_sum{{{labels}}} {total_s:.6f}"
                )
                out.append(f"gkg_http_request_duration_seconds_count{{{labels}}} {n}")
        return "\n".join(out) + "\n"


class _Handler(BaseHTTPRequestHandler):
    service: GraphService  # injected by make_server
    jwt_secret: str | None = None  # injected by make_server (None = open)

    def log_message(self, fmt, *a):  # silence default stderr chatter
        pass

    def _json(self, code: int, payload) -> None:
        body = json.dumps(payload).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _not_found(self) -> None:
        self._json(404, {"status": "not found"})

    def _authorized(self, parts: list[str]) -> bool:
        """JWT gate (jwt_authentication.rs:20-90): health/info/metrics
        public (the deployed server's PUBLIC_ENDPOINTS, endpoints.rs:10),
        everything else needs a valid HS256 Bearer token when a secret is
        configured."""
        if self.jwt_secret is None or parts[:2] in (
            ["api", "health"],
            ["api", "info"],
        ) or parts[:1] == ["metrics"]:
            return True
        from knowledge_graph_spark.serving.mcp_protocol import verify_jwt

        auth = self.headers.get("Authorization", "")
        return auth.startswith("Bearer ") and verify_jwt(self.jwt_secret, auth[7:])

    def do_GET(self) -> None:  # noqa: N802 (stdlib casing)
        # request_metrics_middleware parity (metrics.rs:18-35): count + time
        # every request, labelled (method, path)
        import time as _time

        t0 = _time.time()
        try:
            self._route_GET()
        finally:
            self.service.metrics.observe(
                "GET", urlparse(self.path).path, _time.time() - t0
            )

    def do_POST(self) -> None:  # noqa: N802
        import time as _time

        t0 = _time.time()
        try:
            self._route_POST()
        finally:
            self.service.metrics.observe(
                "POST", urlparse(self.path).path, _time.time() - t0
            )

    def _route_GET(self) -> None:
        try:
            url = urlparse(self.path)
            parts = [unquote(p) for p in url.path.strip("/").split("/")]
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            if not self._authorized(parts):
                return self._json(401, {"status": "unauthorized"})
            if parts[:2] == ["api", "health"]:
                return self._json(200, {"status": "ok"})
            if parts[:2] == ["api", "info"]:
                return self._json(
                    200, {"name": SERVER_NAME, "version": SERVER_VERSION}
                )
            if parts == ["metrics"]:
                # Prometheus scrape endpoint (http-server-deployed
                # metrics.rs; PUBLIC_ENDPOINTS endpoints.rs:10)
                body = self.service.metrics.render().encode("utf-8")
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return None
            if parts[:2] == ["mcp", "sse"]:
                # SSE transport handshake (sse.rs:6-19): the first frame is
                # the `endpoint` event carrying the session POST URI; any
                # buffered responses for the session are replayed as
                # `message` events (finite replay, like /api/events)
                from knowledge_graph_spark.serving.mcp_protocol import new_session_id

                sid = q.get("session") or new_session_id()
                # LIVE push channel: the stream stays open and messages
                # queued by /mcp/message POSTs are flushed to it as they
                # arrive (each handler runs in its own thread under
                # ThreadingHTTPServer). Like the reference's SseServer, the
                # channel lives for the session: on idle we emit an SSE
                # keepalive comment and only stop when the client
                # disconnects. Tests pass an explicit ?idle_ms= to make the
                # stream finite (close on first quiet window).
                explicit_idle = "idle_ms" in q
                idle_s = int(q.get("idle_ms", "15000")) / 1000.0
                chan = self.service.mcp_channel(sid)
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.end_headers()
                try:
                    self.wfile.write(
                        f"event: endpoint\ndata: /mcp/message?session={sid}\n\n".encode()
                    )
                    self.wfile.flush()
                    while True:
                        try:
                            msg = chan.get(timeout=idle_s)
                        except self.service._queue_mod.Empty:
                            if explicit_idle:
                                break
                            # keepalive comment; a dead client raises here
                            # and ends the stream
                            self.wfile.write(b": keepalive\n\n")
                            self.wfile.flush()
                            continue
                        self.wfile.write(
                            f"event: message\ndata: {json.dumps(msg)}\n\n".encode()
                        )
                        self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError, OSError):
                    pass
                finally:
                    # session lifetime == SSE stream lifetime: reclaim the
                    # queue so servers don't leak one per session id
                    self.service.mcp_close(sid)
                return None
            if parts[:3] == ["api", "workspace", "list"]:
                return self._json(200, self.service.workspace_list())
            if parts[:2] == ["api", "events"]:
                # SSE replay (finite): one data frame per lifecycle event
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.end_headers()
                for ev in list(self.service.events):
                    self.wfile.write(f"data: {json.dumps(ev)}\n\n".encode())
                return None
            if parts[:2] == ["api", "graph"] and len(parts) >= 5:
                # error-shape contract (graph_*.rs handlers): 400
                # empty_*/invalid_node_type, 404 project_not_found, 500
                # database_not_found — all StatusResponse bodies.
                kind, ws, proj = parts[2], parts[3], parts[4]
                if not proj.strip():
                    return self._json(400, {"status": "empty_project_path"})
                if self.service.project_info(ws, proj) is None:
                    return self._json(404, {"status": "project_not_found"})
                if kind == "stats":
                    out = self.service.stats(ws, proj)
                elif kind == "initial":
                    out = self.service.initial(
                        ws,
                        proj,
                        limits={
                            k: int(q[k])
                            for k in _INITIAL_DEFAULTS
                            if k in q
                        },
                    )
                elif kind == "search":
                    out = self.service.search(
                        ws, proj, q.get("search_term", ""), int(q.get("limit", 100))
                    )
                elif kind == "neighbors" and len(parts) >= 7:
                    if not parts[5].strip():
                        return self._json(400, {"status": "empty_node_type"})
                    if not parts[6].strip():
                        return self._json(400, {"status": "empty_node_id"})
                    if parts[5] not in _NODE_TABLE_BY_TYPE:
                        return self._json(400, {"status": "invalid_node_type"})
                    out = self.service.neighbors(
                        ws, proj, parts[5], int(parts[6]), int(q.get("limit", 100))
                    )
                else:
                    return self._not_found()
                return (
                    self._json(200, out)
                    if out is not None
                    else self._json(500, {"status": "database_not_found"})
                )
            return self._not_found()
        except Exception as exc:  # noqa: BLE001 — endpoint error contract (500)
            return self._json(500, {"status": f"error: {exc}"})

    def _route_POST(self) -> None:
        try:
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n) or b"{}"
            url = urlparse(self.path)
            parts = [unquote(p) for p in url.path.strip("/").split("/")]
            if not self._authorized(parts):
                return self._json(401, {"status": "unauthorized"})
            if parts == ["mcp"] or parts[:2] == ["mcp", "message"]:
                # JSON-RPC 2.0 envelope (http.rs:5 streamable HTTP;
                # /mcp/message is the SSE transport's post_path, sse.rs:24)
                from knowledge_graph_spark.serving.mcp_protocol import (
                    PARSE_ERROR,
                    handle_jsonrpc,
                )

                try:
                    payload = json.loads(raw)
                except ValueError:
                    return self._json(
                        200,
                        {
                            "jsonrpc": "2.0",
                            "id": None,
                            "error": {"code": PARSE_ERROR, "message": "parse error"},
                        },
                    )
                resp = handle_jsonrpc(self.service, payload)
                # streamable-HTTP session contract (rmcp LocalSessionManager,
                # http.rs:27): initialize mints an Mcp-Session-Id; later
                # requests carry it and the server echoes it back
                sess_hdr = self.headers.get("Mcp-Session-Id")
                if (
                    sess_hdr is None
                    and isinstance(payload, dict)
                    and payload.get("method") == "initialize"
                ):
                    from knowledge_graph_spark.serving.mcp_protocol import (
                        new_session_id,
                    )

                    sess_hdr = new_session_id()
                if resp is None:  # notification
                    self.send_response(202)
                    if sess_hdr:
                        self.send_header("Mcp-Session-Id", sess_hdr)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return None
                if parts[:2] == ["mcp", "message"]:
                    sid = {
                        k: v[0] for k, v in parse_qs(url.query).items()
                    }.get("session")
                    if sid:
                        self.service.mcp_channel(sid).put(resp)
                body = json.dumps(resp).encode("utf-8")
                self.send_response(200)
                if sess_hdr:
                    self.send_header("Mcp-Session-Id", sess_hdr)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return None
            if parts in (["indexer", "v1", "index"], ["webserver", "v1", "tool"]):
                # the deployed server ships these routes as explicit 501
                # stubs (endpoints/indexer.rs:10-12, webserver.rs:10-12)
                body = b"Not implemented"
                self.send_response(501)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return None
            args = json.loads(raw)
            if parts[:3] == ["api", "workspace", "index"]:
                return self._json(
                    200, self.service.workspace_index(args["workspace_folder_path"])
                )
            if parts[:3] == ["api", "workspace", "delete"]:
                return self._json(
                    200, self.service.workspace_delete(args["workspace_folder_path"])
                )
            if parts[:2] == ["api", "mcp"] and len(parts) == 3:
                if not self.service.is_tool_enabled(parts[2]):
                    # a disabled tool is NOT REGISTERED in this deployment —
                    # indistinguishable from absent (the reference's gated
                    # registry never mounts it)
                    return self._json(
                        404, {"status": f"tool '{parts[2]}' is not enabled"}
                    )
                return self._json(200, self.service.mcp(parts[2], args))
            return self._not_found()
        except KeyError as exc:
            return self._json(400, {"status": f"missing parameter: {exc}"})
        except Exception as exc:  # noqa: BLE001
            return self._json(500, {"status": f"error: {exc}"})


def make_server(
    spark,
    manager: WorkspaceManager,
    port: int = 0,
    jwt_secret: str | None = None,
    tools_enabled: set[str] | None = None,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; port 0 binds an ephemeral port.

    Start with ``threading.Thread(target=srv.serve_forever).start()`` and
    stop with ``srv.shutdown()`` — the test suite drives it exactly so.
    ``tools_enabled`` gates the MCP tool registry per deployment (None =
    every tool; available_tools_service.rs:41-121).
    """
    service = GraphService(spark, manager, tools_enabled=tools_enabled)
    handler = type(
        "BoundHandler", (_Handler,), {"service": service, "jwt_secret": jwt_secret}
    )
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    srv.service = service  # type: ignore[attr-defined]
    return srv
