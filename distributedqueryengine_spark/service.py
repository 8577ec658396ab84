"""HTTP query service: the reference's user-facing surface, restored.

The reference is an ASP.NET web service whose one real endpoint takes a
SQL string and returns the pre/post-optimization plan JSONs plus a
placeholder statistics string (Sql2AlgTree, QueryService.asmx.cs:51-89;
rendered by the jointjs UI in index.js:1-122). This wrapper exposes the
same contract over stdlib http.server — no framework dependencies —
backed by `api.query`, which additionally returns the result rows the
reference discarded and real statistics.

Endpoints:
- POST /query   body {"sql": "...", "limit": N?} → full api.query dict
- GET  /query?sql=...                            → same
- GET  /health                                   → {"status": "ok"}

The server is a ThreadingHTTPServer on a caller-chosen (or ephemeral)
port; Spark drives all actual execution, so the HTTP layer stays a thin
adapter — exactly the reference's architecture with Spark in place of
the .NET Remoting site servers.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from distributedqueryengine_spark import api


def _make_handler(spark: SparkSession):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _run(self, sql: str, limit: int) -> None:
            if not sql:
                self._send(400, {"error": "missing sql"})
                return
            try:
                self._send(200, api.query(spark, sql, collect_limit=limit))
            except Exception as e:  # surface analysis errors as 400s
                self._send(400, {"error": str(e)})

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            if url.path == "/health":
                self._send(200, {"status": "ok"})
                return
            if url.path == "/query":
                q = parse_qs(url.query)
                sql = (q.get("sql") or [""])[0]
                limit = int((q.get("limit") or ["10000"])[0])
                self._run(sql, limit)
                return
            self._send(404, {"error": "unknown path"})

        def do_POST(self) -> None:  # noqa: N802
            if urlparse(self.path).path != "/query":
                self._send(404, {"error": "unknown path"})
                return
            n = int(self.headers.get("Content-Length", "0"))
            try:
                payload = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid JSON body"})
                return
            self._run(payload.get("sql", ""), int(payload.get("limit", 10_000)))

        def log_message(self, fmt: str, *args) -> None:  # quiet test runs
            pass

    return Handler


def serve(spark: SparkSession, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Start the query service on a daemon thread; returns the server
    (its bound port is `server.server_address[1]`). Call
    `server.shutdown()` to stop."""
    server = ThreadingHTTPServer((host, port), _make_handler(spark))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
