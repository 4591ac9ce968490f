"""HTTP façade over the engine, mirroring the reference server's API
surface (reference src/server/mod.rs:51-465):

    POST /query             {"query": sql} -> {colnames, rows, stats}
    POST /query_cols        {"query": sql} -> {colnames, cols, stats}
    POST /multi_query_cols  {"queries": [sql, ...]} -> [above, ...]
    POST /columns           {"tables": [...], "pattern"?, "limit"?,
                             "offset"?} -> {columns, offset, len}
    POST /insert_bin        packed-capnp EventBuffer (reference wire
                            format) OR JSON event buffer -> {"status": "ok"}
    POST /echo              body echoed back
    GET  /tables            plain-text table stats
    GET  /table/<name>      minimal HTML page listing the table's columns
    GET  /metrics           Prometheus text format

/insert_bin speaks the reference's binary wire format: a packed-capnp
EventBuffer (locustdb-serialization/src/event_buffer.rs:92-101,
decoded by sources/event_buffer.py — a pure-Python implementation of
the public Cap'n Proto encoding), so existing LocustDB logging clients
ingest unchanged. A columnar JSON body
    {"tables": {name: {"columns": {col: [v, ...], ...}}}}
is still accepted as a fallback for r1-era Python clients.
/multi_query_cols accepts the reference's EncodingOpts
({"xor_float_compression", "mantissa", "full_precision_cols"} —
server/mod.rs:252-287); when present the response is the reference's
packed-capnp binary MultiQueryResponse (sources/api_messages.py):
xor-float compressed float columns (compression.py, the reference's
Gorilla-style double codec) and delta/double-delta/range-compressed
int columns — the wire existing LocustDB clients already decode.

Error mapping follows map_err_response (server/mod.rs:321-331):
NotImplemented -> 501, other query errors -> 400, crashes -> 500.

Scale note: the façade is a thin control plane — every query still
executes distributed in Spark; the server only shapes results. For
many concurrent clients run several façades over one SparkSession
(scheduler pools), or front with Spark Connect.
"""

from __future__ import annotations

import json
import re
import threading
import time
from collections import Counter, defaultdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .dialect.parser import NotImplementedQueryError
from .engine import LocustDB, QueryError

# /plot dev surface (reference server/mod.rs:110-117 renders
# templates/plot.html: a uPlot page over a columnar query payload).
# Ours fetches the GET /query_data dev series — the reference
# template fetches its POST-only /query_cols route, which a browser
# GET can't reach, so we point at the route that actually serves a
# columnar payload — and renders cols[0] as x vs cols[1] as y.
PLOT_TEMPLATE = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<title>LocustDB plot</title>
<link rel="stylesheet"
 href="https://leeoniya.github.io/uPlot/dist/uPlot.min.css">
<style>body { margin: 0; }</style></head>
<body>
<script src="https://leeoniya.github.io/uPlot/dist/uPlot.iife.min.js">
</script>
<h2 id="wait">Fetching query_data...</h2>
<script>
function makeChart(packed) {
    const data = packed.series;
    const yname = packed.cols[1];
    const opts = {
        title: "Server Events",
        width: 1000,
        height: 750,
        series: [
            {},
            { label: yname, stroke: "red",
              width: 1 / devicePixelRatio },
        ],
    };
    new uPlot(opts, data, document.body);
    document.getElementById("wait").textContent = "Done!";
}
fetch("query_data").then(r => r.json()).then(packed => {
    document.getElementById("wait").textContent = "Rendering...";
    setTimeout(() => makeChart(packed), 0);
});
</script>
</body></html>
"""


class Metrics:
    """Minimal Prometheus-text metrics registry (reference /metrics,
    server/mod.rs:367-394, backed by the prometheus crate)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.counters: Counter = Counter()
        self.histograms: dict[str, list[float]] = defaultdict(list)

    def inc(self, name: str, by: float = 1.0) -> None:
        with self._lock:
            self.counters[name] += by

    def observe(self, name: str, value: float) -> None:
        with self._lock:
            self.histograms[name].append(value)

    def render(self) -> str:
        out = []
        with self._lock:
            for name, v in sorted(self.counters.items()):
                out.append(f"# TYPE {name} counter")
                out.append(f"{name} {v}")
            for name, vals in sorted(self.histograms.items()):
                out.append(f"# TYPE {name} summary")
                out.append(f"{name}_count {len(vals)}")
                out.append(f"{name}_sum {sum(vals)}")
        return "\n".join(out) + "\n"


def _to_json_val(v):
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
    return v


def _rows_output(result: dict) -> dict:
    return {
        "colnames": result["colnames"],
        "rows": [[_to_json_val(v) for v in row] for row in result["rows"]],
        "stats": result["stats"],
    }


def _cols_output(result: dict) -> dict:
    """Column-major JSON shaping (reference query_output_to_json_cols,
    server/mod.rs:400-425); binary responses with EncodingOpts go
    through sources/api_messages.py instead."""
    cols: dict[str, object] = {}
    names = result["colnames"]
    rows = result["rows"]
    for i, name in enumerate(names):
        cols[name] = [_to_json_val(r[i]) for r in rows]
    return {"colnames": names, "cols": cols, "stats": result["stats"]}


class _Handler(BaseHTTPRequestHandler):
    server_version = "locustdb-spark"
    db: LocustDB  # set on the server class
    metrics: Metrics

    # ----------------------------------------------------------- helpers
    def _send(self, code: int, body, content_type="application/json"):
        if isinstance(body, bytes):
            data = body
        elif content_type == "application/json":
            data = json.dumps(body).encode()
        else:
            data = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n)

    def _run_query(self, sql: str) -> dict:
        t0 = time.time()
        result = self.db.run_query(sql)
        self.metrics.observe("query_seconds", time.time() - t0)
        self.metrics.inc("queries_total")
        return result

    def log_message(self, fmt, *args):  # silence default stderr spam
        pass

    # ------------------------------------------------------------- GET
    def do_GET(self):
        try:
            if self.path == "/":
                self._index()
            elif self.path == "/tables":
                self._tables()
            elif self.path.startswith("/table/"):
                self._table_page(self.path[len("/table/"):])
            elif self.path == "/metrics":
                self._send(200, self.metrics.render(),
                           "text/plain; version=0.0.4")
            elif self.path == "/plot":
                self._send(200, PLOT_TEMPLATE, "text/html; charset=utf8")
            elif self.path == "/query_data":
                # reference server/mod.rs:180-190 returns this exact
                # hardcoded dev-stub series; kept verbatim for parity
                self._send(200, {
                    "cols": ["time", "cpu"],
                    "series": [
                        [1640025197013.0, 1640025198013.0,
                         1640025199013.0, 1640025200013.0,
                         1640025201013.0, 1640025202113.0,
                         1640025203113.0, 1640025204113.0,
                         1640025205113.0],
                        [0.3, 0.4, 0.5, 0.2, 0.1, 0.3, 0.4, 0.5, 0.2],
                    ],
                })
            else:
                self._send(404, {"error": "not found"})
        except Exception as e:  # noqa: BLE001
            self._send(500, {"error": str(e)})

    def _index(self):
        """HTML index: sorted table list linking to /table/{name},
        plus engine counters (reference server/mod.rs:51-109 renders
        templates/index.html with table_stats() names and the
        PerfCounter fields; our counter surface is the /metrics
        registry plus per-table stats, so those are what render)."""
        import html
        from urllib.parse import quote

        stats = self.db.table_stats()
        names = sorted(t["name"] for t in stats)
        # table names arrive via the ingest API unrestricted — escape
        # for both the href attribute and the text node
        items = "".join(
            f'<li><a href="table/{quote(n, safe="")}">'
            f"{html.escape(n)}</a></li>" for n in names)
        with self.metrics._lock:
            counters = dict(self.metrics.counters)
        perf = "<br>".join(
            f"{k}: {v:g}" for k, v in sorted(counters.items())) or "none"
        rows = sum(t["rows"] for t in stats)
        body = (
            "<!doctype html><html lang=\"en\"><head>"
            "<meta charset=\"utf-8\"><title>LocustDB</title></head>"
            "<body><h1>LocustDB</h1>"
            f"<h2>Tables</h2><ul>{items}</ul>"
            f"<h2>Perf stats</h2>total_rows: {rows}<br>{perf}"
            "</body></html>"
        )
        self._send(200, body, "text/html; charset=utf8")

    def _tables(self):
        stats = self.db.table_stats()
        total_rows = sum(t["rows"] for t in stats)
        total_bytes = sum(t["batches_bytes"] + t["buffer_bytes"]
                          for t in stats)
        total_buffer = sum(t["buffer_bytes"] for t in stats)
        lines = [
            f"Total rows: {total_rows}",
            f"Total bytes: {total_bytes}",
            f"Total buffer bytes: {total_buffer}",
        ]
        for t in stats:
            lines.append(t["name"])
            lines.append(f"  Rows: {t['rows']}")
            lines.append(f"  Batches: {t['batches']}")
            lines.append(f"  Batches bytes: {t['batches_bytes']}")
            lines.append(f"  Buffer length: {t['buffer_length']}")
            lines.append(f"  Buffer bytes: {t['buffer_bytes']}")
        self._send(200, "\n".join(lines) + "\n", "text/plain")

    def _table_page(self, name: str):
        if not re.fullmatch(r"[A-Za-z0-9_.]+", name):
            self._send(400, {"error": "invalid table name"})
            return
        cols = self.db.search_column_names(name, "")
        body = (
            f"<html><body><h1>{name}</h1><p>columns: "
            f"{', '.join(sorted(cols))}</p></body></html>"
        )
        self._send(200, body, "text/html; charset=utf8")

    # ------------------------------------------------------------- POST
    def do_POST(self):
        body = self._read_body()
        try:
            if self.path == "/echo":
                self._send(200, body.decode(), "text/plain")
                return
            if self.path == "/insert_bin":
                self._insert_bin(body)
                return
            req = json.loads(body or b"{}")
            if self.path == "/query":
                self._send(200, _rows_output(self._run_query(req["query"])))
            elif self.path == "/query_cols":
                self._send(200, _cols_output(self._run_query(req["query"])))
            elif self.path == "/multi_query_cols":
                results = [self._run_query(q) for q in req["queries"]]
                opts = req.get("encoding_opts")
                if opts is not None:
                    # reference behavior (server/mod.rs:252-290):
                    # EncodingOpts present -> packed-capnp binary
                    # MultiQueryResponse (xor-float + delta-compressed
                    # int columns), the wire existing clients decode
                    from .sources.api_messages import (
                        serialize_multi_query_response)

                    responses = [
                        {name: [r[i] for r in res["rows"]]
                         for i, name in enumerate(res["colnames"])}
                        for res in results
                    ]
                    self._send(
                        200,
                        serialize_multi_query_response(responses, opts),
                        "application/octet-stream")
                else:
                    self._send(200, [_cols_output(res)
                                     for res in results])
            elif self.path == "/columns":
                self._columns(req)
            else:
                self._send(404, {"error": "not found"})
        except NotImplementedQueryError as e:
            self._send(501, str(e))
        except (QueryError, KeyError, json.JSONDecodeError) as e:
            self._send(400, str(e))
        except Exception as e:  # noqa: BLE001 — FatalError analog
            self._send(500, str(e))

    def _columns(self, req: dict):
        pattern = req.get("pattern") or ""
        cols: set[str] = set()
        for table in req["tables"]:
            cols.update(self.db.search_column_names(table, pattern))
        n = len(cols)
        limit = req.get("limit", n)
        offset = min(req.get("offset", 0), max(n - limit, 0))
        self._send(200, {
            "columns": sorted(cols)[offset:offset + limit],
            "offset": offset,
            "len": n,
        })

    def _insert_bin(self, body: bytes):
        """Binary-first ingestion, matching the reference handler
        (server/mod.rs:335-365): the body is tried as a packed-capnp
        `EventBuffer` (wal_segment.capnp TableSegmentList — any
        existing LocustDB logging client's wire format) and, for
        backward compatibility with r1 clients, falls back to the
        columnar JSON body on decode failure."""
        from .sources.event_buffer import EventBuffer

        try:
            per_table = EventBuffer.deserialize(body).to_rows()
        except Exception:  # noqa: BLE001 — not capnp; try the JSON shape
            try:
                req = json.loads(body or b"{}")
                per_table = {}
                for table, tbuf in req["tables"].items():
                    columns: dict[str, list] = tbuf["columns"]
                    if not columns:
                        continue
                    length = max(len(v) for v in columns.values())
                    per_table[table] = [
                        {c: (vals[i] if i < len(vals) else None)
                         for c, vals in columns.items()}
                        for i in range(length)
                    ]
            except Exception as e:  # noqa: BLE001
                self._send(
                    400, f"Failed to deserialize request: {e}")
                return
        n_rows = 0
        for table, rows in per_table.items():
            if not rows:
                continue
            self.db.ingest(table, rows)
            n_rows += len(rows)
        self.metrics.inc("ingested_rows_total", n_rows)
        self._send(200, {"status": "ok"})


class LocustServer:
    """Threaded HTTP server wrapper; `start()` returns the bound port."""

    def __init__(self, db: LocustDB, host: str = "127.0.0.1", port: int = 0):
        self.metrics = Metrics()
        handler = type("Handler", (_Handler,),
                       {"db": db, "metrics": self.metrics})
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self) -> int:
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)
