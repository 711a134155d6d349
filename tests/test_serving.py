"""HTTP serving shell tests — the reference's endpoint + MCP tool surface
(http-server-desktop endpoints/, mcp/tools/available_tools_service.rs)
driven end-to-end over a real indexed workspace."""

from __future__ import annotations

import json
import threading
import urllib.request
from urllib.parse import quote

import pytest

CORPUS = {
    "app/models/user.py": (
        "class User:\n"
        "    def activate(self):\n"
        "        return notify_user()\n"
        "\n"
        "def notify_user():\n"
        "    return 1\n"
    ),
    "app/main.py": (
        "from app.models.user import User\n"
        "def run():\n"
        "    u = User()\n"
        "    u.activate()\n"
    ),
}


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    from knowledge_graph_spark.serving.http_server import make_server
    from knowledge_graph_spark.workspace import WorkspaceManager

    ws_root = tmp_path_factory.mktemp("served-ws")
    proj = ws_root / "proj"
    for rel, content in CORPUS.items():
        p = proj / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    mgr = WorkspaceManager(str(tmp_path_factory.mktemp("served-data")))
    mgr.register_project(str(ws_root), str(proj))
    srv = make_server(spark, mgr, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=120) as r:
            return r.status, json.loads(r.read())

    def post(path, payload):
        req = urllib.request.Request(
            base + path,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())

    # index through the endpoint itself (workspace_index.rs analog)
    status, out = post("/api/workspace/index", {"workspace_folder_path": str(ws_root)})
    assert status == 200 and out["status"] == "completed", out
    yield {
        "get": get,
        "post": post,
        "ws": str(ws_root),
        "proj": str(proj),
        "base": base,
        "service": srv.service,
    }
    srv.shutdown()


def _pp(served):
    return f"/{quote(served['ws'], safe='')}/{quote(served['proj'], safe='')}"


def test_health_and_info(served):
    assert served["get"]("/api/health")[1] == {"status": "ok"}
    assert served["get"]("/api/info")[1]["name"] == "knowledge-graph-spark"


def test_workspace_list(served):
    _, out = served["get"]("/api/workspace/list")
    ws = out["workspace_folders"][0]
    assert ws["workspace_folder_path"] == served["ws"]
    assert ws["projects"][0]["status"] == "indexed"


def test_graph_stats_endpoint(served):
    _, out = served["get"]("/api/graph/stats" + _pp(served))
    nc = out["node_counts"]
    assert nc["file_count"] == 2
    # User, activate, notify_user, run = 4 definitions
    assert nc["definition_count"] == 4
    assert nc["imported_symbol_count"] == 1
    assert out["total_nodes"] == sum(nc.values())
    assert out["total_relationships"] > 0
    assert out["project_info"]["status"] == "indexed"


def test_graph_initial_and_search(served):
    _, out = served["get"]("/api/graph/initial" + _pp(served))
    types = {n["node_type"] for n in out["nodes"]}
    assert {"DirectoryNode", "FileNode", "DefinitionNode", "ImportedSymbolNode"} <= types
    _, s = served["get"]("/api/graph/search" + _pp(served) + "?search_term=user")
    labels = {n["label"] for n in s["nodes"]}
    assert "notify_user" in labels, labels


def test_graph_neighbors_endpoint(served):
    # find the User class node id via search, then expand
    _, s = served["get"]("/api/graph/search" + _pp(served) + "?search_term=User")
    node = next(n for n in s["nodes"] if n["node_type"] == "DefinitionNode"
                and n["label"] == "User")
    _, out = served["get"](
        "/api/graph/neighbors" + _pp(served) + f"/DefinitionNode/{node['node_id']}"
    )
    labels = {n["label"] for n in out["nodes"]}
    # CLASS_TO_METHOD edge to activate, FILE_DEFINES from the file
    assert any("activate" in l for l in labels), labels
    # both endpoints of every relationship are in the node list (the anchor
    # node is included), so rels == nodes - 1 when every neighbor is distinct
    assert len(out["relationships"]) == len(out["nodes"]) - 1


# ---------------------------------------------------------------------------
# HTTP contract-shape tests — exact JSON field names/nesting mirrored from
# the reference's endpoint structs (endpoints/graph/*.rs + graph/shared.rs)
# and its own endpoint tests (graph_stats.rs / graph_initial.rs `mod tests`).
# ---------------------------------------------------------------------------

_PROJECT_INFO_FIELDS = {
    # TSProjectInfo, event-bus/src/types/project_info.rs:7-16
    "project_path", "workspace_folder_path", "project_hash", "status",
    "last_indexed_at", "error_message", "database_path", "parquet_directory",
}
_RELATIONSHIP_FIELDS = {
    # GraphRelationship, endpoints/graph/shared.rs:78-86
    "id", "source", "target", "relationship_name", "relationship_type",
}
_NODE_PROP_FIELDS = {
    # endpoints/graph/shared.rs:8-46 per-kind property structs
    "DirectoryNode": {"path", "absolute_path", "repository_name"},
    "FileNode": {"path", "absolute_path", "repository_name", "language", "extension"},
    "DefinitionNode": {"path", "fqn", "definition_type", "start_line",
                       "primary_start_byte", "primary_end_byte", "total_locations"},
    "ImportedSymbolNode": {"path", "start_line", "primary_start_byte",
                           "primary_end_byte", "import_type", "import_path",
                           "import_alias"},
}


def _assert_typed_node(n):
    # TypedGraphNode serde shape: tag `node_type`, id = "{type}_{node_id}"
    assert set(n) == {"node_type", "id", "node_id", "label", "properties"}, n
    assert n["id"] == f"{n['node_type']}_{n['node_id']}"
    assert set(n["properties"]) == _NODE_PROP_FIELDS[n["node_type"]], n


def test_contract_graph_stats_shape(served):
    """GraphStatsSuccessResponse (graph_stats.rs:41-47): fixed node_counts +
    relationship_counts structs; total_relationships sums dir+file+def only
    (graph_stats.rs:203-206 — imported-symbol rels excluded)."""
    _, out = served["get"]("/api/graph/stats" + _pp(served))
    assert set(out) == {"total_nodes", "total_relationships", "node_counts",
                        "relationship_counts", "project_info"}
    assert set(out["node_counts"]) == {
        "directory_count", "file_count", "definition_count",
        "imported_symbol_count"}
    assert set(out["relationship_counts"]) == {
        "directory_relationships", "file_relationships",
        "definition_relationships"}
    assert out["total_relationships"] == sum(out["relationship_counts"].values())
    assert set(out["project_info"]) == _PROJECT_INFO_FIELDS
    assert out["project_info"]["last_indexed_at"] is not None  # indexed


def test_contract_graph_initial_shape(served):
    """GraphInitialSuccessResponse (graph_initial.rs:41-45): typed nodes with
    per-kind properties, GraphRelationship rows whose source/target point at
    node ids in the same payload (process_graph_row parity)."""
    _, out = served["get"]("/api/graph/initial" + _pp(served))
    assert set(out) == {"nodes", "relationships", "project_info"}
    assert out["nodes"] and out["relationships"]
    for n in out["nodes"]:
        _assert_typed_node(n)
    ids = {n["id"] for n in out["nodes"]}
    for r in out["relationships"]:
        assert set(r) == _RELATIONSHIP_FIELDS, r
        assert r["source"] in ids and r["target"] in ids
        assert r["relationship_name"] in {
            "DIRECTORY_RELATIONSHIPS", "FILE_RELATIONSHIPS",
            "DEFINITION_RELATIONSHIPS", "IMPORTED_SYMBOL_RELATIONSHIPS"}
    # per-section limits honored (limit params of graph_initial.rs:32-37)
    _, small = served["get"](
        "/api/graph/initial" + _pp(served) + "?definition_limit=1&file_limit=1"
    )
    n_defrels = sum(
        1 for r in small["relationships"]
        if r["relationship_name"] == "DEFINITION_RELATIONSHIPS")
    assert n_defrels <= 2  # def→def and def→imp sections, 1 row each


def test_contract_graph_search_shape(served):
    """GraphSearchSuccessResponse (graph_search.rs:36-40): nodes +
    project_info only — search returns no relationships."""
    _, out = served["get"](
        "/api/graph/search" + _pp(served) + "?search_term=user&limit=10")
    assert set(out) == {"nodes", "project_info"}
    assert out["nodes"]
    for n in out["nodes"]:
        _assert_typed_node(n)
    defn = next(n for n in out["nodes"] if n["node_type"] == "DefinitionNode")
    assert defn["properties"]["fqn"]
    assert isinstance(defn["properties"]["start_line"], int)


def test_contract_graph_neighbors_shape(served):
    """GraphNeighborsSuccessResponse (graph_neighbors.rs:40-44) + the
    error-string contract of its handler (empty/invalid node type)."""
    _, s = served["get"]("/api/graph/search" + _pp(served) + "?search_term=User")
    anchor = next(n for n in s["nodes"]
                  if n["node_type"] == "DefinitionNode" and n["label"] == "User")
    _, out = served["get"](
        "/api/graph/neighbors" + _pp(served)
        + f"/DefinitionNode/{anchor['node_id']}")
    assert set(out) == {"nodes", "relationships", "project_info"}
    for n in out["nodes"]:
        _assert_typed_node(n)
    ids = {n["id"] for n in out["nodes"]}
    assert anchor["id"] in ids  # the anchor itself is in the payload
    for r in out["relationships"]:
        assert set(r) == _RELATIONSHIP_FIELDS
        assert anchor["id"] in (r["source"], r["target"])


def test_contract_graph_error_shapes(served):
    """StatusResponse error contract (endpoints/shared.rs:4-8 + the handlers'
    literal status strings, mirrored from graph_stats.rs mod tests)."""
    import urllib.error

    def get_err(path):
        try:
            served["get"](path)
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())
        raise AssertionError(f"expected error for {path}")

    ws_enc = quote(served["ws"], safe="")
    # project_not_found (graph_stats.rs:144-153)
    code, body = get_err(f"/api/graph/stats/{ws_enc}/{quote('/nope', safe='')}")
    assert (code, body) == (404, {"status": "project_not_found"})
    # empty_project_path (graph_stats.rs:122-130) — %20 survives the split
    code, body = get_err(f"/api/graph/stats/{ws_enc}/%20")
    assert (code, body) == (400, {"status": "empty_project_path"})
    # invalid_node_type (graph_neighbors.rs:170-177)
    proj_enc = quote(served["proj"], safe="")
    code, body = get_err(
        f"/api/graph/neighbors/{ws_enc}/{proj_enc}/BogusNode/1")
    assert (code, body) == (400, {"status": "invalid_node_type"})


def test_metrics_endpoint_prometheus_exposition(served):
    """/metrics (http-server-deployed metrics.rs + PUBLIC_ENDPOINTS
    endpoints.rs:10): Prometheus text format with the reference's metric
    names and histogram buckets, labelled by (method, path)."""
    served["get"]("/api/health")  # ensure at least one observed request
    with urllib.request.urlopen(served["base"] + "/metrics", timeout=60) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert "# TYPE gkg_http_requests_total counter" in text
    assert "# TYPE gkg_http_request_duration_seconds histogram" in text
    total = int(next(
        l.split()[1] for l in text.splitlines()
        if l.startswith("gkg_http_requests_total ")))
    assert total >= 1
    # health was hit: its histogram series exists with the reference buckets
    assert 'method="GET",path="/api/health",le="0.005"' in text
    assert 'method="GET",path="/api/health",le="+Inf"' in text
    assert 'gkg_http_request_duration_seconds_count{method="GET",path="/api/health"}' in text
    # cumulative bucket counts are monotonic for one series
    hb = [int(l.rsplit(" ", 1)[1]) for l in text.splitlines()
          if l.startswith('gkg_http_request_duration_seconds_bucket{method="GET",path="/api/health"')]
    assert hb == sorted(hb) and hb[-1] >= 1


def test_deployed_stub_routes_return_501(served):
    """/indexer/v1/index and /webserver/v1/tool ship as explicit 501 stubs
    in the deployed server (endpoints/indexer.rs:10-12, webserver.rs)."""
    import urllib.error

    for path in ("/indexer/v1/index", "/webserver/v1/tool"):
        req = urllib.request.Request(
            served["base"] + path, data=b"{}", method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected 501")
        except urllib.error.HTTPError as e:
            assert e.code == 501
            assert e.read() == b"Not implemented"


def test_events_sse_replay(served):
    """Lifecycle events captured during indexing replay as SSE data frames
    (events.rs SSE endpoint; event-bus vocabulary)."""
    with urllib.request.urlopen(served["base"] + "/api/events", timeout=60) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        frames = [
            json.loads(line[len("data: "):])
            for line in r.read().decode().split("\n")
            if line.startswith("data: ")
        ]
    types = {(e["type"], e["status"]) for e in frames}
    assert ("WorkspaceIndexing", "Started") in types, types
    assert ("ProjectIndexing", "Completed") in types, types
    assert ("WorkspaceIndexing", "Completed") in types, types


def test_mcp_list_projects_and_search(served):
    _, out = served["post"]("/api/mcp/list_projects", {})
    assert out["projects"][0]["project_path"] == served["proj"]
    _, s = served["post"](
        "/api/mcp/search_codebase_definitions",
        {
            "workspace_folder_path": served["ws"],
            "project_path": served["proj"],
            "search_terms": ["notify"],
        },
    )
    assert s["n_results"] == 1
    assert "<ToolResponse>" in s["xml"] and "notify_user" in s["xml"]
    assert "Decision Framework" in s["system_message"]


def test_mcp_get_definition_and_read_definitions(served):
    _, d = served["post"](
        "/api/mcp/get_definition",
        {
            "workspace_folder_path": served["ws"],
            "project_path": served["proj"],
            "file_path": "app/models/user.py",
            "line": 1,
            "column": 8,
        },
    )
    assert isinstance(d["definitions"], list)
    _, rd = served["post"](
        "/api/mcp/read_definitions",
        {
            "workspace_folder_path": served["ws"],
            "project_path": served["proj"],
            "definitions": [{"name": "notify_user", "file_path": "app/models/user.py"}],
        },
    )
    assert [r["name"] for r in rd["definitions"]] == ["notify_user"]


def test_mcp_repo_map_and_references(served):
    _, rm = served["post"](
        "/api/mcp/repo_map",
        {
            "workspace_folder_path": served["ws"],
            "project_path": served["proj"],
        },
    )
    assert any("user.py" in e.get("primary_file_path", "") for e in rm["entries"])
    _, refs = served["post"](
        "/api/mcp/get_references",
        {
            "workspace_folder_path": served["ws"],
            "project_path": served["proj"],
            "symbol_name": "User",
        },
    )
    assert isinstance(refs["references"], list)


def test_unknown_routes(served):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        served["get"]("/api/nope")
    assert e.value.code == 404
    _, out = served["post"](
        "/api/mcp/unknown_tool",
        {"workspace_folder_path": served["ws"], "project_path": served["proj"]},
    )
    assert "unknown tool" in out.get("error", "")


def test_mcp_xml_tool_contracts(served):
    """The four tool dispatches return the rendered XML documents
    (import_usage/output.rs, get_references/output.rs,
    read_definitions/output.rs, get_definition/output.rs)."""
    _, iu = served["post"](
        "/api/mcp/import_usage",
        {
            "workspace_folder_path": served["ws"],
            "project_path": served["proj"],
            "import_paths": ["app.models.user"],
        },
    )
    assert "<ToolResponse>" in iu["xml"] and "<imports>" in iu["xml"]
    assert "import" in iu["xml"] and "app/main.py" in iu["xml"]

    _, gr = served["post"](
        "/api/mcp/get_references",
        {
            "workspace_folder_path": served["ws"],
            "project_path": served["proj"],
            "definition_name": "notify_user",
            "relative_file_path": "app/models/user.py",
        },
    )
    assert "User.activate</fqn>" in gr["xml"], gr["xml"][:800]
    assert "Decision Framework" in gr["system_message"]

    _, rd = served["post"](
        "/api/mcp/read_definitions",
        {
            "workspace_folder_path": served["ws"],
            "project_path": served["proj"],
            "definitions": [{"name": "notify_user", "file_path": "app/models/user.py"}],
        },
    )
    assert "<definition-body>" in rd["xml"] and "return 1" in rd["xml"]

    _, gd = served["post"](
        "/api/mcp/get_definition",
        {
            "workspace_folder_path": served["ws"],
            "project_path": served["proj"],
            "file_path": "app/models/user.py",
            "line_content": "        return notify_user()",
            "symbol_name": "notify_user",
        },
    )
    assert gd["n_results"] >= 1, gd
    assert "<type>Definition</type>" in gd["xml"]
    assert "def notify_user():" in gd["xml"]


def test_mcp_repo_map_xml_contract(served):
    """depth-parameterized repo_map returns the rendered tree + file
    blocks (repo_map/output.rs:103-148)."""
    _, rm = served["post"](
        "/api/mcp/repo_map",
        {
            "workspace_folder_path": served["ws"],
            "project_path": served["proj"],
            "depth": 2,
        },
    )
    assert "<repo-map>" in rm["xml"] and "<directories>" in rm["xml"]
    assert "app" in rm["xml"]
    assert "class User" in rm["xml"] or "def notify_user" in rm["xml"]
    assert "Returned" in rm["system_message"]


# ---------------------------------------------------------------------------
# MCP protocol framing: JSON-RPC 2.0 envelope + SSE handshake
# (mcp/src/http.rs:5 streamable HTTP; sse.rs:6-19; the 8-tool registry of
#  available_tools_service.rs:41-121)
# ---------------------------------------------------------------------------


def _rpc(served, method, params=None, req_id=1, path="/mcp"):
    payload = {"jsonrpc": "2.0", "id": req_id, "method": method}
    if params is not None:
        payload["params"] = params
    return served["post"](path, payload)[1]


def test_mcp_initialize_handshake(served):
    out = _rpc(served, "initialize", {"protocolVersion": "2024-11-05"})
    assert out["jsonrpc"] == "2.0" and out["id"] == 1
    res = out["result"]
    assert res["serverInfo"]["name"] == "knowledge-graph-spark"
    assert "tools" in res["capabilities"]


def test_mcp_tools_list_names_and_schemas(served):
    """tools/list publishes all 8 reference tool names with object input
    schemas (available_tools_service.rs:41-121; to_mcp_tool per tool)."""
    out = _rpc(served, "tools/list")
    tools = {t["name"]: t for t in out["result"]["tools"]}
    assert set(tools) == {
        "list_projects",
        "search_codebase_definitions",
        "index_project",
        "get_references",
        "import_usage",
        "get_definition",
        "read_definitions",
        "repo_map",
    }
    for t in tools.values():
        assert t["inputSchema"]["type"] == "object"
        assert t["description"]


def test_mcp_tools_call_all_eight(served):
    """Every tool dispatches through the JSON-RPC envelope and returns a
    CallToolResult-shaped content frame."""
    ws, proj = served["ws"], served["proj"]
    base = {"workspace_folder_path": ws, "project_path": proj}
    calls = {
        "list_projects": {},
        "index_project": {"project_path": proj},
        "search_codebase_definitions": {**base, "search_terms": ["User"]},
        "get_references": {
            **base,
            "definition_name": "notify_user",
            "relative_file_path": "app/models/user.py",
        },
        "import_usage": {**base, "import_paths": ["app.models.user"]},
        "get_definition": {
            **base,
            "file_path": "app/main.py",
            "line_content": "    u.activate()",
            "symbol_name": "activate",
        },
        "read_definitions": {
            **base,
            "definitions": [{"name": "User", "file_path": "app/models/user.py"}],
        },
        "repo_map": {**base, "depth": 2},
    }
    for name, args in calls.items():
        out = _rpc(served, "tools/call", {"name": name, "arguments": args})
        res = out["result"]
        assert res["isError"] is False, (name, res)
        assert res["content"][0]["type"] == "text" and res["content"][0]["text"], name
    # XML-contract tools carry the rendered document as the text content
    out = _rpc(
        served,
        "tools/call",
        {
            "name": "search_codebase_definitions",
            "arguments": {**base, "search_terms": ["User"]},
        },
    )
    assert out["result"]["content"][0]["text"].startswith("<ToolResponse>")


def test_mcp_jsonrpc_error_paths(served):
    assert _rpc(served, "no/such/method")["error"]["code"] == -32601
    out = _rpc(served, "tools/call", {"name": "not_a_tool", "arguments": {}})
    assert out["error"]["code"] == -32602
    # malformed JSON → -32700
    import urllib.request as _ur

    req = _ur.Request(
        served["base"] + "/mcp",
        data=b"{not json",
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with _ur.urlopen(req, timeout=60) as r:
        out = json.loads(r.read())
    assert out["error"]["code"] == -32700
    # tool-level failure (unindexed project) is an isError result, not a
    # protocol error (CallToolResult::error contract)
    out = _rpc(
        served,
        "tools/call",
        {
            "name": "import_usage",
            "arguments": {
                "workspace_folder_path": served["ws"],
                "project_path": "/nope",
                "import_paths": ["x"],
            },
        },
    )
    assert out["result"]["isError"] is True


def test_mcp_notification_gets_no_body(served):
    import urllib.request as _ur

    req = _ur.Request(
        served["base"] + "/mcp",
        data=json.dumps(
            {"jsonrpc": "2.0", "method": "notifications/initialized"}
        ).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with _ur.urlopen(req, timeout=60) as r:
        assert r.status == 202 and r.read() == b""


def test_mcp_sse_handshake_and_replay(served):
    """GET /mcp/sse opens with the `endpoint` event naming the session POST
    URI (sse.rs sse_path/post_path contract); a JSON-RPC POST while no
    stream is open is queued and delivered on the next stream."""
    import urllib.request as _ur

    with _ur.urlopen(served["base"] + "/mcp/sse?session=s1&idle_ms=200", timeout=60) as r:
        frames = r.read().decode()
    assert "event: endpoint" in frames
    assert "data: /mcp/message?session=s1" in frames
    out = _rpc(served, "tools/list", path="/mcp/message?session=s1")
    assert "tools" in out["result"]
    with _ur.urlopen(served["base"] + "/mcp/sse?session=s1&idle_ms=200", timeout=60) as r:
        frames = r.read().decode()
    assert "event: message" in frames and '"tools"' in frames


def test_mcp_sse_live_push(served):
    """The SSE channel is a real push stream: a response POSTed while the
    stream is OPEN arrives on it without reconnecting."""
    import threading as _th
    import urllib.request as _ur

    got: dict = {}

    def reader():
        with _ur.urlopen(
            served["base"] + "/mcp/sse?session=live1&idle_ms=8000", timeout=60
        ) as r:
            buf = b""
            while b"event: message" not in buf:
                chunk = r.read1(65536)
                if not chunk:
                    break
                buf += chunk
            got["frames"] = buf.decode()

    t = _th.Thread(target=reader, daemon=True)
    t.start()
    import time as _time

    _time.sleep(0.5)  # stream open, endpoint frame sent
    out = _rpc(served, "ping", path="/mcp/message?session=live1")
    assert out["result"] == {}
    t.join(timeout=30)
    assert "event: message" in got.get("frames", ""), got
    assert '"jsonrpc"' in got["frames"]


# ---------------------------------------------------------------------------
# JWT auth gate (http-server-deployed/tests/jwt_authentication.rs:20-120)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def jwt_served(spark, tmp_path_factory):
    from knowledge_graph_spark.serving.http_server import make_server
    from knowledge_graph_spark.workspace import WorkspaceManager

    mgr = WorkspaceManager(str(tmp_path_factory.mktemp("jwt-data")))
    srv = make_server(spark, mgr, port=0, jwt_secret="test-secret-for-jwt-tests")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _status(url, token=None, method="GET", payload=None):
    import urllib.error
    import urllib.request as _ur

    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    req = _ur.Request(
        url,
        data=json.dumps(payload).encode() if payload is not None else None,
        headers=headers,
        method=method,
    )
    try:
        with _ur.urlopen(req, timeout=60) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def test_jwt_public_endpoints_open(jwt_served):
    """health/info stay public (jwt_authentication.rs:20-40)."""
    assert _status(jwt_served + "/api/health") == 200
    assert _status(jwt_served + "/api/info") == 200


def test_jwt_protected_endpoints_401_without_token(jwt_served):
    assert _status(jwt_served + "/api/workspace/list") == 401
    assert (
        _status(
            jwt_served + "/mcp",
            method="POST",
            payload={"jsonrpc": "2.0", "id": 1, "method": "tools/list"},
        )
        == 401
    )


def test_jwt_valid_token_admits(jwt_served):
    from knowledge_graph_spark.serving.mcp_protocol import generate_jwt

    tok = generate_jwt("test-secret-for-jwt-tests", expires_in_s=3600)
    assert _status(jwt_served + "/api/workspace/list", token=tok) == 200


def test_jwt_invalid_and_expired_rejected(jwt_served):
    from knowledge_graph_spark.serving.mcp_protocol import generate_jwt

    wrong = generate_jwt("some-other-secret", expires_in_s=3600)
    assert _status(jwt_served + "/api/workspace/list", token=wrong) == 401
    expired = generate_jwt("test-secret-for-jwt-tests", expires_in_s=-10)
    assert _status(jwt_served + "/api/workspace/list", token=expired) == 401
    assert _status(jwt_served + "/api/workspace/list", token="not.a.jwt") == 401


def test_mcp_session_id_header(served):
    """Streamable-HTTP session contract: initialize mints an Mcp-Session-Id
    response header; subsequent requests carrying it get it echoed back."""
    import urllib.request as _ur

    req = _ur.Request(
        served["base"] + "/mcp",
        data=json.dumps(
            {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}}
        ).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with _ur.urlopen(req, timeout=60) as r:
        sid = r.headers.get("Mcp-Session-Id")
        assert sid and json.loads(r.read())["result"]["serverInfo"]
    req2 = _ur.Request(
        served["base"] + "/mcp",
        data=json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}).encode(),
        headers={"Content-Type": "application/json", "Mcp-Session-Id": sid},
        method="POST",
    )
    with _ur.urlopen(req2, timeout=60) as r:
        assert r.headers.get("Mcp-Session-Id") == sid
        assert json.loads(r.read())["result"]["tools"]


def test_jwt_missing_exp_rejected(jwt_served):
    """exp is a REQUIRED claim (jsonwebtoken Validation::default() lists it
    in required_spec_claims) — a signed token with no exp must be a 401,
    not valid forever."""
    import hashlib as _hl
    import hmac as _hm

    from knowledge_graph_spark.serving.mcp_protocol import _b64url, verify_jwt

    header = _b64url(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
    payload = _b64url(json.dumps({"sub": "u1"}).encode())  # no exp
    sig = _b64url(
        _hm.new(
            b"test-secret-for-jwt-tests",
            f"{header}.{payload}".encode("ascii"),
            _hl.sha256,
        ).digest()
    )
    tok = f"{header}.{payload}.{sig}"
    assert verify_jwt("test-secret-for-jwt-tests", tok) is False
    assert _status(jwt_served + "/api/workspace/list", token=tok) == 401


def test_mcp_session_queue_reclaimed_on_sse_close(served):
    """Session lifetime == SSE stream lifetime: when the stream closes the
    channel is dropped, so a long-running server doesn't leak one Queue per
    session id; the cap evicts the oldest session when exceeded."""
    import urllib.request as _ur

    with _ur.urlopen(
        served["base"] + "/mcp/sse?session=reclaim1&idle_ms=200", timeout=60
    ) as r:
        r.read()
    assert "reclaim1" not in served["service"].mcp_sessions
    # cap eviction: oldest session goes first
    svc = served["service"]
    old_cap = svc.max_mcp_sessions
    try:
        svc.max_mcp_sessions = 2
        svc.mcp_channel("a")
        svc.mcp_channel("b")
        svc.mcp_channel("c")
        assert set(svc.mcp_sessions) == {"b", "c"}
    finally:
        svc.max_mcp_sessions = old_cap
        for sid in ("a", "b", "c"):
            svc.mcp_close(sid)


# -- MCP tool config gating (available_tools_service.rs:41-121) ---------------
@pytest.fixture(scope="module")
def gated_served(spark, tmp_path_factory):
    """Server with get_references + repo_map disabled: the reference
    registers each tool only if configuration.is_tool_enabled(...)."""
    import urllib.error

    from knowledge_graph_spark.serving.http_server import MCP_TOOLS, make_server
    from knowledge_graph_spark.workspace import WorkspaceManager

    mgr = WorkspaceManager(str(tmp_path_factory.mktemp("gated-data")))
    enabled = set(MCP_TOOLS) - {"get_references", "repo_map"}
    srv = make_server(spark, mgr, port=0, tools_enabled=enabled)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    def post(path, payload):
        req = urllib.request.Request(
            base + path,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    yield {"post": post, "service": srv.service}
    srv.shutdown()


def test_gated_tools_list_omits_disabled(gated_served):
    out = gated_served["post"](
        "/mcp", {"jsonrpc": "2.0", "id": 1, "method": "tools/list"}
    )[1]
    names = {t["name"] for t in out["result"]["tools"]}
    assert "get_references" not in names and "repo_map" not in names
    assert "list_projects" in names and len(names) == 6


def test_gated_tools_call_method_not_found(gated_served):
    from knowledge_graph_spark.serving.mcp_protocol import METHOD_NOT_FOUND

    out = gated_served["post"](
        "/mcp",
        {
            "jsonrpc": "2.0",
            "id": 2,
            "method": "tools/call",
            "params": {"name": "repo_map", "arguments": {}},
        },
    )[1]
    assert out["error"]["code"] == METHOD_NOT_FOUND
    # an ENABLED tool still dispatches normally on the same deployment
    ok = gated_served["post"](
        "/mcp",
        {
            "jsonrpc": "2.0",
            "id": 3,
            "method": "tools/call",
            "params": {"name": "list_projects", "arguments": {}},
        },
    )[1]
    assert "result" in ok and ok["result"]["isError"] is False


def test_gated_rest_dispatch_404(gated_served):
    status, body = gated_served["post"]("/api/mcp/get_references", {})
    assert status == 404
    assert "not enabled" in body["status"]
    status, body = gated_served["post"]("/api/mcp/list_projects", {})
    assert status == 200 and "projects" in body


def test_ungated_service_exposes_all_tools(served):
    """Default deployment (tools_enabled=None): all 8 tools listed — the
    gating must not change the pre-existing contract."""
    out = _rpc(served, "tools/list")
    assert len(out["result"]["tools"]) == 8
