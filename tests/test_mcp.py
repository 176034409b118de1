"""MCP server tests: the JSON-RPC method table and all six tools,
driven in-process (`src/mcp/server.ts:41-390` surface; tool behaviors per
`src/mcp/tools/*.test.ts`). Transport framing is exercised via the
newline-delimited `serve` loop over StringIO pipes."""

from __future__ import annotations

import io
import json

import pytest

from gistdex_spark.mcp_server import MCPServer, serve


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    from gistdex_spark.api import GistdexSpark

    base = tmp_path_factory.mktemp("mcp")
    db = str(base / "chunks")
    eng = GistdexSpark(spark, db)
    texts = spark.createDataFrame(
        [
            (f"doc-{i}.md", f"document {i} about shuffle partitioning " * 10,
             "file", f"Doc {i}")
            for i in range(6)
        ],
        schema="source_id STRING, content STRING, source_type STRING, title STRING",
    )
    eng.index_text(texts, size=300, overlap=50)
    return MCPServer(spark, db=db, cache_dir=str(base / "cache"))


def call(server, name, args, msg_id=1):
    resp = server.handle(
        {
            "jsonrpc": "2.0",
            "id": msg_id,
            "method": "tools/call",
            "params": {"name": name, "arguments": args},
        }
    )
    assert resp["id"] == msg_id
    result = resp["result"]
    payload = json.loads(result["content"][0]["text"])
    return result, payload


def test_initialize_and_tools_list(server):
    resp = server.handle({"jsonrpc": "2.0", "id": 0, "method": "initialize"})
    info = resp["result"]["serverInfo"]
    assert info["name"] == "gistdex-mcp-spark"
    assert "tools" in resp["result"]["capabilities"]

    resp = server.handle({"jsonrpc": "2.0", "id": 1, "method": "tools/list"})
    names = {t["name"] for t in resp["result"]["tools"]}
    assert names == {
        "gistdex_search",
        "gistdex_read_cached",
        "gistdex_query_simple",
        "gistdex_index",
        "gistdex_list",
        "gistdex_write_structured_result",
    }
    for t in resp["result"]["tools"]:
        assert t["inputSchema"]["type"] == "object"


def test_notification_returns_none(server):
    assert server.handle({"jsonrpc": "2.0", "method": "notifications/initialized"}) is None


def test_unknown_method_error(server):
    resp = server.handle({"jsonrpc": "2.0", "id": 9, "method": "bogus/x"})
    assert resp["error"]["code"] == -32601


def test_query_simple(server):
    _, payload = call(
        server, "gistdex_query_simple", {"query": "shuffle partitioning", "k": 3}
    )
    assert len(payload["results"]) == 3
    assert payload["metadata"]["count"] == 3
    r = payload["results"][0]
    assert "embedding" not in r
    assert len(r["content"]) <= 203  # truncated to 200 (+ "...") in summary form


def test_query_simple_full(server):
    _, payload = call(
        server,
        "gistdex_query_simple",
        {"query": "shuffle partitioning", "k": 1, "full": True},
    )
    c = payload["results"][0]["content"]
    assert not c.endswith("...") and len(c) > 200


def test_search_pagination_cursor(server):
    _, p1 = call(
        server,
        "gistdex_search",
        {
            "goal": "understand shuffles",
            "query": "shuffle partitioning",
            "options": {"pageSize": 2},
        },
    )
    assert len(p1["results"]) == 2
    assert p1["cursor"] is not None
    assert p1["stats"]["count"] == 2

    _, p2 = call(
        server,
        "gistdex_search",
        {
            "goal": "understand shuffles",
            "query": "shuffle partitioning",
            "cursor": p1["cursor"],
            "options": {"pageSize": 2},
        },
    )
    ids1 = {r["id"] for r in p1["results"]}
    ids2 = {r["id"] for r in p2["results"]}
    assert ids1.isdisjoint(ids2)


def test_search_excludes(server):
    _, p1 = call(
        server,
        "gistdex_search",
        {"goal": "g", "query": "shuffle", "options": {"pageSize": 2}},
    )
    seen = [r["id"] for r in p1["results"]]
    _, p2 = call(
        server,
        "gistdex_search",
        {
            "goal": "g",
            "query": "shuffle",
            "context": {"excludeResults": seen},
            "options": {"pageSize": 2},
        },
    )
    assert set(seen).isdisjoint({r["id"] for r in p2["results"]})


def test_search_logs_query_cache(server):
    _, cached = call(server, "gistdex_read_cached", {"type": "queries"})
    assert len(cached["queries"]) >= 1
    assert any(q["query"] == "shuffle" for q in cached["queries"])


def test_write_and_read_knowledge(server):
    _, w = call(
        server,
        "gistdex_write_structured_result",
        {
            "topic": "shuffle findings",
            "content": "# Findings\n\nPartitioning controls shuffle width.",
            "metadata": {"tags": ["spark"], "summary": "short"},
        },
    )
    assert w["saved"] is True
    _, r = call(
        server, "gistdex_read_cached", {"type": "knowledge", "topic": "shuffle_findings"}
    )
    assert len(r["knowledge"]) == 1
    assert "Partitioning controls" in r["knowledge"][0]["content"]


def test_knowledge_latest_wins(server):
    for v in ("v1", "v2"):
        call(
            server,
            "gistdex_write_structured_result",
            {"topic": "dup topic", "content": f"content {v}"},
        )
    _, r = call(
        server, "gistdex_read_cached", {"type": "knowledge", "topic": "dup_topic"}
    )
    assert len(r["knowledge"]) == 1
    assert r["knowledge"][0]["content"] == "content v2"


def test_list_tool(server):
    _, payload = call(server, "gistdex_list", {"byExtension": True})
    assert payload["totalChunks"] > 0
    assert payload["uniqueSources"] == 6
    assert payload["bySourceType"].get("file")
    assert payload["byExtension"].get(".md")
    assert len(payload["sources"]) <= 10


def test_index_tool_text(spark, tmp_path):
    srv = MCPServer(spark, db=str(tmp_path / "c"), cache_dir=str(tmp_path / "k"))
    _, payload = call(
        srv,
        "gistdex_index",
        {"type": "text", "text": {"content": "alpha beta " * 100, "title": "t"}},
    )
    assert payload["indexed"] is True and payload["chunksCreated"] >= 1


def test_index_tool_files(spark, tmp_path):
    d = tmp_path / "files"
    d.mkdir()
    (d / "x.txt").write_text("gamma delta " * 80)
    srv = MCPServer(spark, db=str(tmp_path / "c2"), cache_dir=str(tmp_path / "k2"))
    _, payload = call(
        srv,
        "gistdex_index",
        {"type": "files", "files": {"pattern": f"{d}/*.txt", "baseDir": str(d)}},
    )
    assert payload["chunksCreated"] >= 1


def test_tool_error_in_band(server):
    result, payload = call(server, "gistdex_index", {"type": "github"})
    assert result.get("isError") is True
    assert "error" in payload


def test_unknown_tool(server):
    result, payload = call(server, "nope", {})
    assert result.get("isError") is True


def test_serve_loop_framing(spark, tmp_path):
    messages = [
        {"jsonrpc": "2.0", "id": 1, "method": "initialize"},
        {"jsonrpc": "2.0", "method": "notifications/initialized"},
        {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
        {"jsonrpc": "2.0", "id": 3, "method": "ping"},
    ]
    stdin = io.StringIO("".join(json.dumps(m) + "\n" for m in messages) + "\nnot json\n")
    stdout = io.StringIO()
    rc = serve(spark, stdin, stdout, db=str(tmp_path / "c"))
    assert rc == 0
    lines = [json.loads(line) for line in stdout.getvalue().splitlines()]
    # 3 responses: the notification and the junk line produce none.
    assert [r["id"] for r in lines] == [1, 2, 3]
