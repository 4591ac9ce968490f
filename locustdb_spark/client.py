"""HTTP logging/query client (reference src/logging_client/mod.rs).

`LoggingClient.log(table, row)` appends to an in-memory event buffer; a
background thread flushes the buffer to the server's /insert_bin every
`flush_interval` seconds (reference BackgroundWorker, mod.rs:32-41,
run-loop mod.rs:130+). When the buffer exceeds `max_buffer_size_bytes`:
`BufferFullPolicy.BLOCK` makes `log()` wait for the next flush,
`BufferFullPolicy.DROP` discards the event (mod.rs:50-53 / the
reference's Block/Drop enum). `query`/`multi_query`/`columns` are thin
wrappers over the corresponding endpoints (JSON responses only — no
xor-float binary encoding)."""

from __future__ import annotations

import json
import threading
import time
import urllib.request
from enum import Enum
from typing import Any


class BufferFullPolicy(Enum):
    BLOCK = "block"
    DROP = "drop"


class RequestError(Exception):
    def __init__(self, status_code: int, msg: str):
        super().__init__(f"HTTP {status_code}: {msg}")
        self.status_code = status_code
        self.msg = msg


def _post(url: str, payload: Any, timeout: float = 60.0,
          bearer_token: str | None = None) -> Any:
    data = json.dumps(payload).encode()
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": "application/json"}
    )
    if bearer_token:
        req.add_header("Authorization", f"Bearer {bearer_token}")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read() or b"null")
    except urllib.error.HTTPError as e:
        raise RequestError(e.code, e.read().decode(errors="replace")) from e


def _post_bytes(url: str, data: bytes, timeout: float = 60.0,
                bearer_token: str | None = None) -> Any:
    req = urllib.request.Request(
        url, data=data,
        headers={"Content-Type": "application/octet-stream"},
    )
    if bearer_token:
        req.add_header("Authorization", f"Bearer {bearer_token}")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read() or b"null")
    except urllib.error.HTTPError as e:
        raise RequestError(e.code, e.read().decode(errors="replace")) from e


class LoggingClient:
    def __init__(
        self,
        url: str,
        flush_interval: float = 1.0,
        max_buffer_size_bytes: int = 64 * (1 << 20),
        buffer_full_policy: BufferFullPolicy = BufferFullPolicy.BLOCK,
        bearer_token: str | None = None,
        binary: bool = True,
    ):
        """``binary=True`` (default) flushes as the reference's
        packed-capnp EventBuffer wire format (logging_client/mod.rs:70,
        encoded by sources/event_buffer.py); ``binary=False`` keeps the
        columnar JSON body for servers predating the binary path."""
        self.url = url.rstrip("/")
        self.flush_interval = flush_interval
        self.max_buffer_size_bytes = max_buffer_size_bytes
        self.buffer_full_policy = buffer_full_policy
        self.bearer_token = bearer_token
        self.binary = binary
        self.total_events = 0
        self.dropped_events = 0
        self._buffer: dict[str, dict[str, list]] = {}
        self._buffer_bytes = 0
        self._lock = threading.Lock()
        self._flushed = threading.Condition(self._lock)
        self._shutdown = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------ logging
    def log(self, table: str, row: dict[str, Any]) -> None:
        """Buffer one event; sets a `timestamp` column if absent
        (the reference stamps events server-side on ingest)."""
        row = dict(row)
        row.setdefault("timestamp", time.time())
        approx = sum(len(str(k)) + len(str(v)) + 16 for k, v in row.items())
        with self._lock:
            while (
                self._buffer_bytes + approx > self.max_buffer_size_bytes
                and not self._shutdown.is_set()
            ):
                if self.buffer_full_policy is BufferFullPolicy.DROP:
                    self.dropped_events += 1
                    return
                self._flushed.wait(timeout=self.flush_interval)
            cols = self._buffer.setdefault(table, {})
            n = max((len(v) for v in cols.values()), default=0)
            for k in row:
                cols.setdefault(k, [None] * n)
            for k, vals in cols.items():
                vals.append(row.get(k))
            self._buffer_bytes += approx
            self.total_events += 1

    def log_batch(self, table: str, rows: list[dict[str, Any]]) -> None:
        """Batch variant (reference python.rs `log_batch`)."""
        for row in rows:
            self.log(table, row)

    def flush(self, timeout: float = 30.0) -> None:
        """Block until the current buffer has been sent."""
        deadline = time.time() + timeout
        with self._lock:
            while self._buffer and time.time() < deadline:
                self._flushed.wait(timeout=0.1)

    def close(self) -> None:
        self.flush()
        self._shutdown.set()
        self._worker.join(timeout=10)

    def _run(self) -> None:
        while not self._shutdown.is_set():
            time.sleep(self.flush_interval)
            self._flush_once()
        self._flush_once()

    def _flush_once(self) -> None:
        with self._lock:
            if not self._buffer:
                return
            payload = {"tables": {
                t: {"columns": cols} for t, cols in self._buffer.items()
            }}
            self._buffer = {}
            self._buffer_bytes = 0
        blob: bytes | None = None
        if self.binary:
            try:
                blob = self._encode_binary(payload)
            except Exception:  # noqa: BLE001 — deterministic encode
                # failure: retrying binary would loop forever, but the
                # server also accepts the columnar JSON body
                blob = None
        try:
            if blob is not None:
                _post_bytes(f"{self.url}/insert_bin", blob,
                            bearer_token=self.bearer_token)
            else:
                _post(f"{self.url}/insert_bin", payload,
                      bearer_token=self.bearer_token)
        except Exception:  # noqa: BLE001 — reference logs & retains
            # put events back so they are retried on the next tick
            with self._lock:
                for t, tbuf in payload["tables"].items():
                    cols = self._buffer.setdefault(t, {})
                    for c, vals in tbuf["columns"].items():
                        cols.setdefault(c, []).extend(vals)
                self._buffer_bytes = self.max_buffer_size_bytes // 2
            return
        with self._lock:
            self._flushed.notify_all()

    @staticmethod
    def _encode_binary(payload: dict) -> bytes:
        """Columnar buffer -> packed-capnp EventBuffer bytes. Column
        value lists are replayed through ColumnData.push so dense /
        sparse / promotion semantics match the reference ColumnBuffer
        (event_buffer.rs:131-209): None entries become gaps, making
        the column sparse on the wire."""
        from .sources.event_buffer import ColumnData, EventBuffer, TableBuffer

        buf = EventBuffer()
        for table, tbuf in payload["tables"].items():
            columns: dict[str, ColumnData] = {}
            length = max((len(v) for v in tbuf["columns"].values()),
                         default=0)
            for cname, vals in tbuf["columns"].items():
                col = ColumnData()
                try:
                    for i, v in enumerate(vals):
                        col.push(v, i)
                except (TypeError, ValueError):
                    # shapes the dense/sparse variants cannot express —
                    # a string column with gaps (the reference's
                    # ColumnBuffer::push panics on those), or a column
                    # mixing strings with numbers — travel as the
                    # `mixed` AnyVal variant, which carries nulls.
                    col = ColumnData(
                        "mixed", [v if v is None or
                                  isinstance(v, (int, float, str))
                                  else str(v) for v in vals])
                columns[cname] = col
            buf.tables[table] = TableBuffer(len=length, columns=columns)
        return buf.serialize()

    # ------------------------------------------------------------ queries
    def query(self, sql: str) -> dict:
        return _post(f"{self.url}/query", {"query": sql},
                     bearer_token=self.bearer_token)

    def multi_query(
        self,
        queries: list[str],
        encoding_opts: dict | None = None,
    ) -> list[dict]:
        """Run several queries in one round trip. With ``encoding_opts``
        ({"xor_float_compression": True, "mantissa": int?,
        "full_precision_cols": [..]}) the server replies with the
        reference's packed-capnp binary MultiQueryResponse (xor-float
        + delta-compressed int columns, api.capnp); it is transparently
        decoded back to {"cols": {name: values}} dicts (xor NULL
        sentinel -> None). Without opts the response is JSON and
        includes colnames/stats."""
        req: dict[str, Any] = {"queries": queries}
        if encoding_opts is not None:
            req["encoding_opts"] = encoding_opts
            data = json.dumps(req).encode()
            hreq = urllib.request.Request(
                f"{self.url}/multi_query_cols", data=data,
                headers={"Content-Type": "application/json"})
            if self.bearer_token:
                hreq.add_header("Authorization",
                                f"Bearer {self.bearer_token}")
            try:
                with urllib.request.urlopen(hreq, timeout=60.0) as resp:
                    blob = resp.read()
            except urllib.error.HTTPError as e:
                raise RequestError(
                    e.code, e.read().decode(errors="replace")) from e
            from .sources.api_messages import (
                deserialize_multi_query_response)

            return [{"cols": cols}
                    for cols in deserialize_multi_query_response(blob)]
        return _post(f"{self.url}/multi_query_cols", req,
                     bearer_token=self.bearer_token)

    def columns(self, tables: list[str], pattern: str | None = None,
                limit: int | None = None, offset: int | None = None) -> dict:
        req: dict[str, Any] = {"tables": tables}
        if pattern is not None:
            req["pattern"] = pattern
        if limit is not None:
            req["limit"] = limit
        if offset is not None:
            req["offset"] = offset
        return _post(f"{self.url}/columns", req,
                     bearer_token=self.bearer_token)


# The reference's Python package exposes one `Client` type that both
# queries and logs (locustdb-python); LoggingClient already carries
# the full surface, so Client is the parity alias.
Client = LoggingClient
