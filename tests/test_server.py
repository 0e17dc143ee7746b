"""SQL-over-TCP server tests (reference entry point #3: query_handler.hpp:36).

Connect / run / rows round-trips over a real socket, multi-statement routing,
error surfacing, concurrent clients, and the max_rows cap.
"""
from __future__ import annotations

import json
import socket
import threading

import pytest

from hyrise_spark.server import SqlClient, SqlServer

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def server(spark):
    srv = SqlServer(spark, port=0, max_rows=50)
    srv.start_background()
    yield srv
    srv.shutdown()
    srv.server_close()


@pytest.fixture()
def client(server):
    c = SqlClient("127.0.0.1", server.port)
    yield c
    c.close()


def test_select_roundtrip(client):
    resp = client.execute("SELECT 1 AS x, 'hi' AS y")
    assert resp == {"status": "ok", "columns": ["x", "y"], "rows": [[1, "hi"]]}


def test_query_parquet_table(client, spark):
    spark.read.parquet(f"{SF_DIR}/nation.parquet").createOrReplaceTempView("srv_nation")
    resp = client.execute(
        "SELECT n_name FROM srv_nation WHERE n_nationkey < 3 ORDER BY n_name"
    )
    assert resp["status"] == "ok"
    assert resp["columns"] == ["n_name"]
    assert [r[0] for r in resp["rows"]] == ["NATION_0", "NATION_1", "NATION_2"]


def test_multi_statement_returns_last(client):
    resp = client.execute("SELECT 1 AS a; SELECT 2 AS b")
    assert resp["columns"] == ["b"] and resp["rows"] == [[2]]


def test_ddl_returns_empty_result(client):
    resp = client.execute("CREATE VIEW srv_v AS SELECT 42 AS v; SELECT * FROM srv_v")
    assert resp["rows"] == [[42]]


def test_error_is_reported_not_fatal(client):
    resp = client.execute("SELECT * FROM definitely_not_a_table_xyz")
    assert resp["status"] == "error"
    assert "definitely_not_a_table_xyz" in resp["error"]
    # the connection survives an error
    assert client.execute("SELECT 7 AS ok")["rows"] == [[7]]


def test_malformed_request_is_error(server):
    with socket.create_connection(("127.0.0.1", server.port), timeout=30) as s:
        f = s.makefile("rwb")
        f.write(b"this is not json\n")
        f.flush()
        resp = json.loads(f.readline())
        assert resp["status"] == "error"


def test_oversized_request_errors_and_closes(server):
    """A request longer than the 10 MiB line cap must get an error response
    and a closed connection — NOT have its tail parsed as the next request
    (protocol desync)."""
    from hyrise_spark.server import _MAX_LINE

    with socket.create_connection(("127.0.0.1", server.port), timeout=60) as s:
        f = s.makefile("rwb")
        payload = b'{"sql": "SELECT \'' + b"x" * (_MAX_LINE + 1024) + b"' AS v\"}\n"
        f.write(payload)
        f.flush()
        resp = json.loads(f.readline())
        assert resp["status"] == "error"
        assert "RequestTooLarge" in resp["error"]
        # server closed the connection instead of parsing the oversized tail
        assert f.readline() == b""


def test_max_rows_cap(client, spark):
    spark.range(1000).createOrReplaceTempView("srv_big")
    resp = client.execute("SELECT * FROM srv_big")
    assert resp["status"] == "ok"
    assert len(resp["rows"]) == 50  # server fixture max_rows


def test_parameterized_query_extended_protocol(client):
    """args in the request = the extended (prepared) protocol analog
    (postgres_protocol_handler.hpp extended mode)."""
    resp = client.execute(
        "SELECT :a + :b AS s, :name AS n", args={"a": 2, "b": 40, "name": "bind"}
    )
    assert resp["status"] == "ok"
    assert resp["rows"] == [[42, "bind"]]


def test_concurrent_clients(server):
    results: dict[int, list] = {}

    def worker(i: int) -> None:
        c = SqlClient("127.0.0.1", server.port)
        try:
            results[i] = c.execute(f"SELECT {i} * 10 AS v")["rows"]
        finally:
            c.close()

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {i: [[i * 10]] for i in range(4)}
