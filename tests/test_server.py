"""HTTP façade + logging client tests (reference src/server/mod.rs
endpoints, src/logging_client/mod.rs client), driven over a real
socket."""

import json
import urllib.request

import pytest

from locustdb_spark.client import (
    BufferFullPolicy, LoggingClient, RequestError, _post)
from locustdb_spark.engine import LocustDB
from locustdb_spark.server import LocustServer


@pytest.fixture(scope="module")
def served_db(spark, tmp_path_factory):
    db = LocustDB(spark=spark,
                  db_path=str(tmp_path_factory.mktemp("served")))
    db.ingest("metrics", [
        {"host": "a", "cpu": 0.5}, {"host": "b", "cpu": 0.75},
        {"host": "a", "cpu": 0.25},
    ])
    server = LocustServer(db)
    port = server.start()
    yield db, f"http://127.0.0.1:{port}"
    server.stop()


def test_query_rows(served_db):
    _, url = served_db
    out = _post(f"{url}/query", {"query": "SELECT host, count(0) FROM metrics"})
    assert out["colnames"] == ["host", "count(0)"]
    assert sorted(map(tuple, out["rows"])) == [("a", 2), ("b", 1)]
    assert "stats" in out


def test_query_cols(served_db):
    _, url = served_db
    out = _post(f"{url}/query_cols",
                {"query": "SELECT host, cpu FROM metrics"})
    assert set(out["cols"]) == {"host", "cpu"}
    assert sorted(out["cols"]["host"]) == ["a", "a", "b"]


def test_multi_query_cols(served_db):
    _, url = served_db
    out = _post(f"{url}/multi_query_cols", {"queries": [
        "SELECT count(0) FROM metrics",
        "SELECT host FROM metrics WHERE cpu > 0.6",
    ]})
    assert out[0]["cols"]["count(0)"] == [3]
    assert out[1]["cols"]["host"] == ["b"]


def test_columns_endpoint(served_db):
    _, url = served_db
    out = _post(f"{url}/columns", {"tables": ["metrics"]})
    assert out["columns"] == ["cpu", "host"]
    out = _post(f"{url}/columns",
                {"tables": ["metrics"], "pattern": "^c", "limit": 1})
    assert out["columns"] == ["cpu"]


def test_insert_bin_json_event_buffer(served_db):
    _, url = served_db
    out = _post(f"{url}/insert_bin", {"tables": {
        "ev": {"columns": {"x": [1, 2, 3], "y": ["a", "b", "c"]}},
    }})
    assert out == {"status": "ok"}
    got = _post(f"{url}/query", {"query": "SELECT x, y FROM ev"})
    assert sorted(map(tuple, got["rows"])) == [(1, "a"), (2, "b"), (3, "c")]


def test_error_mapping(served_db):
    _, url = served_db
    with pytest.raises(RequestError) as e:
        _post(f"{url}/query", {"query": "SELECT a FROM metrics GROUP BY a"})
    assert e.value.status_code == 501
    with pytest.raises(RequestError) as e:
        _post(f"{url}/query", {"query": "SELECT a FROM no_such_table"})
    assert e.value.status_code == 400


def test_tables_and_metrics_text(served_db):
    _, url = served_db
    body = urllib.request.urlopen(f"{url}/tables").read().decode()
    assert "Total rows:" in body and "metrics" in body
    prom = urllib.request.urlopen(f"{url}/metrics").read().decode()
    assert "queries_total" in prom
    page = urllib.request.urlopen(f"{url}/table/metrics").read().decode()
    assert "cpu" in page and "host" in page


def test_echo(served_db):
    _, url = served_db
    req = urllib.request.Request(f"{url}/echo", data=b"hello")
    assert urllib.request.urlopen(req).read() == b"hello"


def test_logging_client_end_to_end(served_db):
    _, url = served_db
    client = LoggingClient(url, flush_interval=0.2)
    for i in range(10):
        client.log("applog", {"seq": i, "msg": f"m{i}"})
    client.close()
    assert client.total_events == 10
    out = _post(f"{url}/query", {"query": "SELECT seq FROM applog"})
    assert sorted(r[0] for r in out["rows"]) == list(range(10))
    # timestamp column was stamped automatically
    cols = _post(f"{url}/columns", {"tables": ["applog"]})
    assert "timestamp" in cols["columns"]


def test_logging_client_drop_policy(served_db):
    _, url = served_db
    client = LoggingClient(url, flush_interval=30.0,
                           max_buffer_size_bytes=80,
                           buffer_full_policy=BufferFullPolicy.DROP)
    for i in range(50):
        client.log("droplog", {"seq": i})
    assert client.dropped_events > 0
    assert client.total_events + client.dropped_events == 50
    client._shutdown.set()


def test_multi_query_via_client(served_db):
    _, url = served_db
    client = LoggingClient(url, flush_interval=30.0)
    res = client.multi_query(["SELECT count(0) FROM metrics"])
    assert res[0]["cols"]["count(0)"] == [3]
    assert client.columns(["metrics"])["columns"] == ["cpu", "host"]
    client._shutdown.set()


def test_insert_bin_capnp_wire_format(served_db):
    """POST the reference's packed-capnp EventBuffer bytes (the wire
    format every existing LocustDB logging client speaks,
    event_buffer.rs:212-221) and query the rows back — including a
    sparse column (gap -> NULL) and a mixed column."""
    from locustdb_spark.sources.event_buffer import (
        ColumnData, EventBuffer, TableBuffer)

    buf = EventBuffer(tables={
        "bin_events": TableBuffer(len=3, columns={
            "seq": ColumnData("i64", [0, 1, 2]),
            "lat": ColumnData("f64", [0.5, 1.5, 2.5]),
            "tag": ColumnData("string", ["a", "b", "c"]),
            "opt": ColumnData("sparse_f64", [9.0], [1]),
            "anyv": ColumnData("mixed", [1, "x", None]),
        }),
    })
    _, url = served_db
    req = urllib.request.Request(
        f"{url}/insert_bin", data=buf.serialize(),
        headers={"Content-Type": "application/octet-stream"})
    out = json.loads(urllib.request.urlopen(req).read())
    assert out == {"status": "ok"}
    rows = _post(f"{url}/query", {
        "query": "SELECT seq, lat, tag FROM bin_events"})["rows"]
    assert sorted(map(tuple, rows)) == [
        (0, 0.5, "a"), (1, 1.5, "b"), (2, 2.5, "c")]
    opt = _post(f"{url}/query", {
        "query": "SELECT seq, opt FROM bin_events"})["rows"]
    assert sorted((r[0], r[1]) for r in opt) == [
        (0, None), (1, 9.0), (2, None)]


def test_insert_bin_rejects_garbage(served_db):
    _, url = served_db
    req = urllib.request.Request(
        f"{url}/insert_bin", data=b"\x07garbage-not-capnp-not-json")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_logging_client_json_fallback_path(served_db):
    """binary=False keeps the r1 columnar-JSON body working."""
    _, url = served_db
    client = LoggingClient(url, flush_interval=0.2, binary=False)
    for i in range(5):
        client.log("jsonlog", {"seq": i})
    client.close()
    out = _post(f"{url}/query", {"query": "SELECT seq FROM jsonlog"})
    assert sorted(r[0] for r in out["rows"]) == list(range(5))


def test_logging_client_binary_sparse_and_mixed(served_db):
    """The default binary client handles rows with missing fields
    (sparse on the wire) and the server fills NULLs."""
    _, url = served_db
    client = LoggingClient(url, flush_interval=0.2)
    client.log("sparselog", {"seq": 0, "extra": 1.5})
    client.log("sparselog", {"seq": 1})
    client.log("sparselog", {"seq": 2, "extra": 3.5})
    client.close()
    out = _post(f"{url}/query",
                {"query": "SELECT seq, extra FROM sparselog"})
    assert sorted((r[0], r[1]) for r in out["rows"]) == [
        (0, 1.5), (1, None), (2, 3.5)]


def test_logging_client_binary_sparse_string_column(served_db):
    """A string column first seen after row 0 cannot be expressed as
    the dense/sparse wire variants (the reference panics there); the
    client must transparently ship it as `mixed` and the rows land."""
    _, url = served_db
    client = LoggingClient(url, flush_interval=0.2)
    client.log("strlog", {"seq": 0})
    client.log("strlog", {"seq": 1, "msg": "late"})
    client.close()
    out = _post(f"{url}/query", {"query": "SELECT seq, msg FROM strlog"})
    assert sorted((r[0], r[1]) for r in out["rows"]) == [
        (0, None), (1, "late")]


def test_plot_and_query_data_dev_surfaces(served_db):
    """GET /plot (static page) and /query_data (the reference's
    hardcoded dev-stub series, server/mod.rs:110-190) — route parity."""
    _, url = served_db
    resp = urllib.request.urlopen(f"{url}/plot")
    assert resp.headers["Content-Type"].startswith("text/html")
    page = resp.read().decode()
    assert "<html" in page
    # the template is a real uPlot page wired to the columnar payload
    # it renders (reference templates/plot.html does the same over its
    # query_cols route)
    assert "uPlot" in page and 'fetch("query_data")' in page
    assert "packed.series" in page and "packed.cols" in page
    data = json.loads(urllib.request.urlopen(f"{url}/query_data").read())
    assert data["cols"] == ["time", "cpu"]
    assert len(data["series"]) == 2 and len(data["series"][0]) == 9
    # the payload shape matches what the template consumes: series[0]
    # is the x axis, series[1] the named y series, equal lengths
    assert len(data["series"][0]) == len(data["series"][1])


def test_root_index_html(served_db):
    """GET / renders the HTML index: sorted table links + perf
    counters (reference server/mod.rs:51-109, templates/index.html)."""
    _, url = served_db
    resp = urllib.request.urlopen(f"{url}/")
    assert resp.status == 200
    assert resp.headers["Content-Type"].startswith("text/html")
    page = resp.read().decode()
    assert "<h1>LocustDB</h1>" in page
    assert '<a href="table/metrics">metrics</a>' in page
    assert "total_rows:" in page


def test_export_and_import_scripts(served_db, tmp_path):
    """scripts/export_column.py + scripts/metrics_import.py (analogs
    of the reference repo's export.py / wandb_data_import.py) against
    a live server."""
    import json
    import subprocess
    import sys

    db, url = served_db
    runs = tmp_path / "runs"
    runs.mkdir()
    with open(runs / "sweep1.jsonl", "w") as fh:
        for i in range(5):
            fh.write(json.dumps({"step": i, "loss": 1.0 / (i + 1),
                                 "note": "skipme"}) + "\n")
    out = subprocess.run(
        [sys.executable, "scripts/metrics_import.py", "--jsonl",
         str(runs), "--url", url, "--prefix", "imp-"],
        capture_output=True, text=True, cwd=".")
    assert "done — 5 rows" in out.stdout, out.stdout + out.stderr
    res = db.run_query("SELECT step, loss FROM \"imp-sweep1\"")
    assert len(res["rows"]) == 5
    assert all(len(r) == 2 for r in res["rows"])

    exp = subprocess.run(
        [sys.executable, "scripts/export_column.py", "step",
         "--table", "imp-sweep1", "--url", url,
         "--out", str(tmp_path / "step.txt")],
        capture_output=True, text=True, cwd=".")
    assert "wrote 5 values" in exp.stdout, exp.stdout + exp.stderr
    vals = sorted(float(x) for x in
                  open(tmp_path / "step.txt").read().split())
    assert vals == [0.0, 1.0, 2.0, 3.0, 4.0]
