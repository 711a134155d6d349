"""Serving surface — HTTP graph endpoints + MCP-shaped tool dispatch."""
