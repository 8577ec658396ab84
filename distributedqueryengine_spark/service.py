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
- GET  /                                         → plan-tree UI (HTML)

The / page is the index.js parity surface: it submits SQL, renders the
original vs optimized plan trees side by side (nested lists instead of
jointjs boxes), and tabulates the first rows — everything the reference
UI showed, without a vendored JS framework.

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


_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>distributedqueryengine-spark</title>
<style>
 body{font-family:monospace;margin:1.5em;background:#fafafa}
 textarea{width:100%;height:6em;font-family:inherit}
 .plans{display:flex;gap:2em}.plans>div{flex:1;overflow:auto}
 ul{list-style:none;padding-left:1.2em;border-left:1px solid #bbb;margin:.2em 0}
 li>span{background:#eef;padding:0 .3em;border-radius:3px}
 li>small{color:#666}
 table{border-collapse:collapse;margin-top:1em}
 td,th{border:1px solid #ccc;padding:.15em .5em}
 .stats{color:#060;margin:.5em 0}
</style></head><body>
<h2>distributedqueryengine_spark — query service</h2>
<textarea id="sql">SELECT n_name, count(*) AS n FROM nation GROUP BY n_name ORDER BY n LIMIT 10</textarea>
<br><button onclick="run()">Run</button>
<div class="stats" id="stats"></div>
<div class="plans">
 <div><h3>original plan</h3><div id="orig"></div></div>
 <div><h3>optimized plan</h3><div id="opt"></div></div>
</div>
<div id="rows"></div>
<script>
function tree(n){
  if(!n) return document.createTextNode('(unavailable)');
  const ul=document.createElement('ul'), li=document.createElement('li');
  li.innerHTML='<span>'+n.op+'</span> <small>'+(n.detail||'')+'</small>';
  ul.appendChild(li);
  const kids=document.createElement('ul');
  (n.children||[]).forEach(c=>kids.appendChild(tree(c)));
  if((n.children||[]).length) li.appendChild(kids);
  return ul;
}
async function run(){
  const r=await fetch('/query',{method:'POST',headers:{'Content-Type':'application/json'},
    body:JSON.stringify({sql:document.getElementById('sql').value,limit:100})});
  const d=await r.json();
  if(d.error){document.getElementById('stats').textContent='ERROR: '+d.error;return}
  document.getElementById('stats').textContent=
    d.statistics.row_count+' rows in '+d.statistics.wall_seconds+'s';
  const o=document.getElementById('orig');o.innerHTML='';o.appendChild(tree(d.plan_tree&&d.plan_tree.original));
  const p=document.getElementById('opt');p.innerHTML='';p.appendChild(tree(d.plan_tree&&d.plan_tree.optimized));
  const rows=document.getElementById('rows');rows.innerHTML='';
  if(d.rows.length){
    const t=document.createElement('table'),h=t.insertRow();
    d.columns.forEach(c=>{const th=document.createElement('th');th.textContent=c;h.appendChild(th)});
    d.rows.forEach(row=>{const tr=t.insertRow();d.columns.forEach(c=>tr.insertCell().textContent=row[c])});
    rows.appendChild(t);
  }
}
</script></body></html>
"""


def _make_handler(spark: SparkSession):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _run(self, sql: str, limit: int, args=None) -> None:
            if not sql:
                self._send(400, {"error": "missing sql"})
                return
            try:
                self._send(200, api.query(spark, sql, collect_limit=limit, args=args))
            except Exception as e:  # surface analysis errors as 400s
                self._send(400, {"error": str(e)})

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            if url.path in ("/", "/index.html"):
                body = _INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
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
            self._run(
                payload.get("sql", ""),
                int(payload.get("limit", 10_000)),
                args=payload.get("args"),
            )

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
