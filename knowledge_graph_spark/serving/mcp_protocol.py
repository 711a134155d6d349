"""MCP protocol framing: JSON-RPC 2.0 envelope + SSE handshake + JWT auth.

Reference mapping:
- JSON-RPC over streamable HTTP (crates/mcp/src/http.rs:5 —
  ``StreamableHttpService`` from the rmcp SDK): ``initialize`` /
  ``tools/list`` / ``tools/call`` methods with the MCP result shapes; tool
  results are ``content: [{type: "text", text: <xml>}]`` exactly like the
  reference's ``CallToolResult::success(vec![Content::text(xml)])``
  (list_projects.rs:68, every tool's call()).
- SSE transport handshake (crates/mcp/src/sse.rs:6-19 — ``SseServer`` with
  sse_path "/" and post_path "/message"): the GET stream's first frame is an
  ``endpoint`` event carrying the session's POST URI; clients POST JSON-RPC
  there. This shell replays responses on the POST body AND buffers them for
  the (finite) SSE replay — the long-lived push channel is approximated the
  same way the lifecycle /api/events stream is.
- Tool names/schemas (tools/available_tools_service.rs:41-121 registers the
  8 tools; each tool's ``to_mcp_tool()`` publishes name + description +
  input_schema). Parameter names follow THIS repo's dispatch contract
  (documented divergence: the reference's import_usage takes
  ``project_absolute_path``+``packages``; this engine's REST surface
  standardizes on workspace_folder_path/project_path since round 2).
- JWT auth shell (crates/http-server-deployed/tests/jwt_authentication.rs:
  20-90): health/info stay public, everything else 401s without a valid
  HS256 ``Authorization: Bearer`` token; ``exp`` is enforced. Pure stdlib
  (hmac + hashlib + base64) — same wire format as jsonwebtoken's HS256.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
import uuid

JSONRPC_VERSION = "2.0"
MCP_PROTOCOL_VERSION = "2024-11-05"

PARSE_ERROR = -32700
INVALID_REQUEST = -32600
METHOD_NOT_FOUND = -32601
INVALID_PARAMS = -32602
INTERNAL_ERROR = -32603

#: name → (description, input JSON Schema); one entry per reference tool
#: (available_tools_service.rs:41-121). Descriptions are one-liners — the
#: LLM-facing long descriptions live with each tool's XML render contract.
TOOL_SCHEMAS: dict[str, tuple[str, dict]] = {
    "list_projects": (
        "List all projects registered in the workspace manager.",
        {"type": "object", "properties": {}, "required": []},
    ),
    "index_project": (
        "Index (or reindex) a project into the knowledge graph.",
        {
            "type": "object",
            "properties": {
                "project_path": {"type": "string"},
                "workspace_folder_path": {"type": "string"},
            },
            "required": ["project_path"],
        },
    ),
    "search_codebase_definitions": (
        "Search definitions by name parts; returns the paged XML document.",
        {
            "type": "object",
            "properties": {
                "workspace_folder_path": {"type": "string"},
                "project_path": {"type": "string"},
                "search_terms": {"type": "array", "items": {"type": "string"}},
                "page": {"type": "integer", "default": 1},
            },
            "required": ["workspace_folder_path", "project_path", "search_terms"],
        },
    ),
    "get_references": (
        "Find reference sites of a definition; returns the grouped XML.",
        {
            "type": "object",
            "properties": {
                "workspace_folder_path": {"type": "string"},
                "project_path": {"type": "string"},
                "definition_name": {"type": "string"},
                "symbol_name": {"type": "string"},
                "relative_file_path": {"type": "string"},
                "page": {"type": "integer", "default": 1},
            },
            "required": ["workspace_folder_path", "project_path"],
        },
    ),
    "import_usage": (
        "Show import statements and usage sites for package paths.",
        {
            "type": "object",
            "properties": {
                "workspace_folder_path": {"type": "string"},
                "project_path": {"type": "string"},
                "import_paths": {"type": "array", "items": {"type": "string"}},
                "page": {"type": "integer", "default": 1},
                "page_size": {"type": "integer", "default": 50},
            },
            "required": ["workspace_folder_path", "project_path", "import_paths"],
        },
    ),
    "get_definition": (
        "Resolve a symbol at a file/line to its definition(s) with code.",
        {
            "type": "object",
            "properties": {
                "workspace_folder_path": {"type": "string"},
                "project_path": {"type": "string"},
                "file_path": {"type": "string"},
                "line_content": {"type": "string"},
                "symbol_name": {"type": "string"},
                "line": {"type": "integer"},
                "column": {"type": "integer"},
            },
            "required": ["workspace_folder_path", "project_path", "file_path"],
        },
    ),
    "read_definitions": (
        "Read the full source of named definitions.",
        {
            "type": "object",
            "properties": {
                "workspace_folder_path": {"type": "string"},
                "project_path": {"type": "string"},
                "definitions": {
                    "type": "array",
                    "items": {
                        "type": "object",
                        "properties": {
                            "name": {"type": "string"},
                            "file_path": {"type": "string"},
                        },
                        "required": ["name", "file_path"],
                    },
                },
            },
            "required": ["workspace_folder_path", "project_path", "definitions"],
        },
    ),
    "repo_map": (
        "Render the repository map (directory tree + definition outlines).",
        {
            "type": "object",
            "properties": {
                "workspace_folder_path": {"type": "string"},
                "project_path": {"type": "string"},
                "depth": {"type": "integer"},
                "page": {"type": "integer", "default": 1},
                "page_size": {"type": "integer", "default": 200},
                "show_directories": {"type": "boolean", "default": True},
                "show_definitions": {"type": "boolean", "default": True},
                "path_prefix": {"type": "string"},
            },
            "required": ["workspace_folder_path", "project_path"],
        },
    ),
}


def _result(req_id, result: dict) -> dict:
    return {"jsonrpc": JSONRPC_VERSION, "id": req_id, "result": result}


def _error(req_id, code: int, message: str) -> dict:
    return {
        "jsonrpc": JSONRPC_VERSION,
        "id": req_id,
        "error": {"code": code, "message": message},
    }


def handle_jsonrpc(service, payload) -> dict | None:
    """One JSON-RPC 2.0 request → response dict (None for notifications).

    ``service`` is the GraphService whose ``mcp(tool, args)`` dispatch the
    REST surface already uses — the envelope adds no second engine.
    """
    if not isinstance(payload, dict):
        return _error(None, INVALID_REQUEST, "request must be an object")
    req_id = payload.get("id")
    method = payload.get("method")
    if payload.get("jsonrpc") != JSONRPC_VERSION or not isinstance(method, str):
        return _error(req_id, INVALID_REQUEST, "not a JSON-RPC 2.0 request")
    params = payload.get("params") or {}

    if method.startswith("notifications/"):
        return None  # notifications get no response (e.g. initialized)
    if method == "initialize":
        from knowledge_graph_spark.serving.http_server import (
            SERVER_NAME,
            SERVER_VERSION,
        )

        return _result(
            req_id,
            {
                "protocolVersion": MCP_PROTOCOL_VERSION,
                "capabilities": {"tools": {"listChanged": False}},
                "serverInfo": {"name": SERVER_NAME, "version": SERVER_VERSION},
            },
        )
    if method == "ping":
        return _result(req_id, {})
    if method == "tools/list":
        # per-deployment gating: a disabled tool is never listed — the
        # reference registers each tool only when
        # configuration.is_tool_enabled(...) (available_tools_service.rs)
        enabled = getattr(service, "is_tool_enabled", lambda _t: True)
        return _result(
            req_id,
            {
                "tools": [
                    {"name": name, "description": desc, "inputSchema": schema}
                    for name, (desc, schema) in TOOL_SCHEMAS.items()
                    if enabled(name)
                ]
            },
        )
    if method == "tools/call":
        name = params.get("name")
        if name not in TOOL_SCHEMAS:
            return _error(req_id, INVALID_PARAMS, f"unknown tool '{name}'")
        if not getattr(service, "is_tool_enabled", lambda _t: True)(name):
            # unregistered in this deployment → JSON-RPC method-not-found,
            # what an rmcp router answers for a route it never mounted
            return _error(req_id, METHOD_NOT_FOUND, f"tool '{name}' is not enabled")
        args = params.get("arguments") or {}
        try:
            out = service.mcp(name, args)
        except KeyError as exc:
            return _error(req_id, INVALID_PARAMS, f"missing parameter: {exc}")
        except Exception as exc:  # noqa: BLE001 — tool-level failure contract
            return _result(
                req_id,
                {
                    "content": [{"type": "text", "text": f"error: {exc}"}],
                    "isError": True,
                },
            )
        if isinstance(out, dict) and "error" in out:
            return _result(
                req_id,
                {
                    "content": [{"type": "text", "text": out["error"]}],
                    "isError": True,
                },
            )
        # tools whose contract is an XML document return its text content,
        # like CallToolResult::success(vec![Content::text(xml)]); the others
        # serialize their JSON body
        text = out.get("xml") if isinstance(out, dict) else None
        if text is None:
            text = json.dumps(out)
        result: dict = {"content": [{"type": "text", "text": text}], "isError": False}
        if isinstance(out, dict):
            meta = {
                k: out[k]
                for k in ("next_page", "n_results", "n_files", "system_message")
                if k in out and out[k] is not None
            }
            if meta:
                result["_meta"] = meta
        return _result(req_id, result)
    return _error(req_id, METHOD_NOT_FOUND, f"unknown method '{method}'")


def new_session_id() -> str:
    return uuid.uuid4().hex


# ---------------------------------------------------------------------------
# JWT (HS256) — stdlib twin of the deployed server's auth middleware
# ---------------------------------------------------------------------------


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def generate_jwt(secret: str, expires_in_s: int = 3600, claims: dict | None = None) -> str:
    """HS256 JWT with an ``exp`` claim (test_helpers' generate_jwt)."""
    header = _b64url(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
    body = dict(claims or {})
    body.setdefault("exp", int(time.time()) + expires_in_s)
    payload = _b64url(json.dumps(body).encode())
    signing_input = f"{header}.{payload}".encode("ascii")
    sig = _b64url(hmac.new(secret.encode(), signing_input, hashlib.sha256).digest())
    return f"{header}.{payload}.{sig}"


def verify_jwt(secret: str, token: str) -> bool:
    """Constant-time HS256 verify + exp enforcement; False on ANY defect
    (malformed, bad signature, expired, alg != HS256) — the middleware's
    single 401 path (jwt_authentication.rs:88-120 invalid/expired cases)."""
    try:
        header_s, payload_s, sig_s = token.split(".")
        header = json.loads(_b64url_decode(header_s))
        if header.get("alg") != "HS256":
            return False
        signing_input = f"{header_s}.{payload_s}".encode("ascii")
        expect = hmac.new(secret.encode(), signing_input, hashlib.sha256).digest()
        if not hmac.compare_digest(expect, _b64url_decode(sig_s)):
            return False
        payload = json.loads(_b64url_decode(payload_s))
        # exp is a REQUIRED claim (jsonwebtoken Validation::default() puts
        # "exp" in required_spec_claims) — a token without one is rejected,
        # not valid forever.
        exp = payload.get("exp")
        return exp is not None and int(time.time()) < int(exp)
    except Exception:  # noqa: BLE001 — any parse failure is a 401
        return False
