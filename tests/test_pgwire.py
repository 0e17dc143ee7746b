"""pg-wire front end tests — a REAL `psql` binary connects and queries
(reference parity target: src/lib/server/postgres_protocol_handler.hpp).
"""
from __future__ import annotations

import shutil
import socket
import struct
import subprocess

import pytest

from hyrise_spark.pgwire import PgWireServer

SF_DIR = "/root/testdata/sf0.001"
PSQL = shutil.which("psql")


@pytest.fixture(scope="module")
def server(spark):
    srv = PgWireServer(spark, port=0, max_rows=50)
    srv.start_background()
    yield srv
    srv.shutdown()
    srv.server_close()


def _psql(server, sql, *extra):
    return subprocess.run(
        [PSQL, "-h", "127.0.0.1", "-p", str(server.port), "-U", "any", "-d", "any",
         "-X", "-A", "-t", *extra, "-c", sql],
        capture_output=True, text=True, timeout=120,
    )


@pytest.mark.skipif(PSQL is None, reason="psql not installed")
def test_psql_select_one(server):
    out = _psql(server, "SELECT 1 AS x")
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "1"


@pytest.mark.skipif(PSQL is None, reason="psql not installed")
def test_psql_typed_row(server):
    out = _psql(server, "SELECT 1 AS i, 2.5 AS d, 'hi' AS s, CAST(NULL AS INT) AS n")
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "1|2.5|hi|"


@pytest.mark.skipif(PSQL is None, reason="psql not installed")
def test_psql_parquet_table(server, spark):
    spark.read.parquet(f"{SF_DIR}/nation.parquet").createOrReplaceTempView("pg_nation")
    out = _psql(
        server, "SELECT n_name FROM pg_nation WHERE n_nationkey < 3 ORDER BY n_name"
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.split() == ["NATION_0", "NATION_1", "NATION_2"]


@pytest.mark.skipif(PSQL is None, reason="psql not installed")
def test_psql_multi_statement_and_ddl(server):
    out = _psql(server, "CREATE VIEW pg_v AS SELECT 42 AS v; SELECT * FROM pg_v")
    assert out.returncode == 0, out.stderr
    assert "42" in out.stdout


@pytest.mark.skipif(PSQL is None, reason="psql not installed")
def test_psql_error_reported(server):
    out = _psql(server, "SELECT * FROM no_such_table_pgw")
    assert out.returncode != 0
    assert "no_such_table_pgw" in out.stderr


@pytest.mark.skipif(PSQL is None, reason="psql not installed")
def test_psql_connection_survives_error(server):
    bad = _psql(server, "SELECT * FROM no_such_table_pgw2")
    assert bad.returncode != 0
    ok = _psql(server, "SELECT 7 AS ok")
    assert ok.returncode == 0 and ok.stdout.strip() == "7"


class _RawPg:
    """Minimal extended-protocol client for testing (libpq message framing)."""

    def __init__(self, port):
        self.s = socket.create_connection(("127.0.0.1", port), timeout=60)
        body = struct.pack("!I", 196608) + b"user\x00t\x00database\x00t\x00\x00"
        self.s.sendall(struct.pack("!I", len(body) + 4) + body)
        self.drain_until(b"Z")

    def close(self):
        self.s.close()

    def send(self, mtype: bytes, payload: bytes):
        self.s.sendall(mtype + struct.pack("!I", len(payload) + 4) + payload)

    def drain_until(self, stop: bytes):
        msgs, buf = [], b""
        while True:
            buf += self.s.recv(65536)
            while len(buf) >= 5:
                t = buf[:1]
                (ln,) = struct.unpack("!I", buf[1:5])
                if len(buf) < 1 + ln:
                    break
                msgs.append((t, buf[5:1 + ln]))
                buf = buf[1 + ln:]
            if msgs and msgs[-1][0] == stop:
                return msgs

    def parse(self, name: str, sql: str, oids=()):
        payload = (name.encode() + b"\x00" + sql.encode() + b"\x00"
                   + struct.pack("!h", len(oids))
                   + b"".join(struct.pack("!I", o) for o in oids))
        self.send(b"P", payload)

    def bind(self, portal: str, stmt: str, params=()):
        payload = (portal.encode() + b"\x00" + stmt.encode() + b"\x00"
                   + struct.pack("!h", 0)  # no param format codes (all text)
                   + struct.pack("!h", len(params)))
        for p in params:
            if p is None:
                payload += struct.pack("!i", -1)
            else:
                b = str(p).encode()
                payload += struct.pack("!i", len(b)) + b
        payload += struct.pack("!h", 0)  # no result format codes
        self.send(b"B", payload)

    def describe_portal(self, portal: str):
        self.send(b"D", b"P" + portal.encode() + b"\x00")

    def execute(self, portal: str, max_rows: int = 0):
        self.send(b"E", portal.encode() + b"\x00" + struct.pack("!i", max_rows))

    def sync(self):
        self.send(b"S", b"")


def test_extended_protocol_prepared_roundtrip(server):
    """Parse/Bind/Describe/Execute/Sync: a $N-parameterized statement runs
    with typed int parameters and returns typed rows."""
    c = _RawPg(server.port)
    try:
        c.parse("s1", "SELECT $1 + 1 AS x, $2 AS s", oids=(23, 25))
        c.bind("", "s1", params=(41, "hi"))
        c.describe_portal("")
        c.execute("")
        c.sync()
        msgs = c.drain_until(b"Z")
        kinds = [t for t, _ in msgs]
        assert kinds == [b"1", b"2", b"T", b"D", b"C", b"Z"], kinds
        datarow = dict(msgs)[b"D"]
        assert datarow == (struct.pack("!h", 2)
                           + struct.pack("!i", 2) + b"42"
                           + struct.pack("!i", 2) + b"hi")
        assert dict(msgs)[b"C"] == b"SELECT 1\x00"
    finally:
        c.close()


def test_extended_protocol_rebind_and_repeated_param(server):
    """One Parse, two Binds with different values; $1 used twice in the SQL."""
    c = _RawPg(server.port)
    try:
        c.parse("s2", "SELECT $1 * $1 AS sq", oids=(23,))
        for v, want in ((3, b"9"), (5, b"25")):
            c.bind("", "s2", params=(v,))
            c.execute("")
            c.sync()
            msgs = c.drain_until(b"Z")
            row = dict(msgs)[b"D"]
            assert row.endswith(want), (v, row)
    finally:
        c.close()


def test_extended_protocol_null_param_and_error_recovery(server):
    c = _RawPg(server.port)
    try:
        c.parse("s3", "SELECT $1 AS v", oids=(23,))
        c.bind("", "s3", params=(None,))
        c.execute("")
        c.sync()
        msgs = c.drain_until(b"Z")
        assert dict(msgs)[b"D"] == struct.pack("!h", 1) + struct.pack("!i", -1)
        # error inside extended mode: messages skipped until Sync, then usable
        c.parse("bad", "SELECT * FROM missing_tbl_xyz", oids=())
        c.bind("", "bad")
        c.execute("")
        c.sync()
        msgs = c.drain_until(b"Z")
        kinds = [t for t, _ in msgs]
        assert b"E" in kinds and kinds[-1] == b"Z"
        c.parse("ok", "SELECT 1 AS one", oids=())
        c.bind("", "ok")
        c.execute("")
        c.sync()
        msgs = c.drain_until(b"Z")
        assert dict(msgs)[b"D"].endswith(b"1")
    finally:
        c.close()


def test_raw_protocol_ssl_refusal_and_query(server):
    """Socket-level check of the framing psql depends on: SSLRequest gets 'N',
    startup gets AuthenticationOk..ReadyForQuery, Query gets T/D/C/Z."""
    with socket.create_connection(("127.0.0.1", server.port), timeout=60) as s:
        s.sendall(struct.pack("!II", 8, 80877103))  # SSLRequest
        assert s.recv(1) == b"N"
        params = b"user\x00t\x00database\x00t\x00\x00"
        body = struct.pack("!I", 196608) + params
        s.sendall(struct.pack("!I", len(body) + 4) + body)

        msgs = []
        buf = b""
        while True:
            buf += s.recv(65536)
            while len(buf) >= 5:
                t = buf[:1]
                (ln,) = struct.unpack("!I", buf[1:5])
                if len(buf) < 1 + ln:
                    break
                msgs.append((t, buf[5:1 + ln]))
                buf = buf[1 + ln:]
            if msgs and msgs[-1][0] == b"Z":
                break
        assert msgs[0][0] == b"R" and msgs[0][1] == struct.pack("!I", 0)
        assert msgs[-1] == (b"Z", b"I")

        s.sendall(b"Q" + struct.pack("!I", 4 + len(b"SELECT 5 AS v\x00")) + b"SELECT 5 AS v\x00")
        msgs = []
        buf = b""
        while True:
            buf += s.recv(65536)
            while len(buf) >= 5:
                t = buf[:1]
                (ln,) = struct.unpack("!I", buf[1:5])
                if len(buf) < 1 + ln:
                    break
                msgs.append((t, buf[5:1 + ln]))
                buf = buf[1 + ln:]
            if msgs and msgs[-1][0] == b"Z":
                break
        kinds = [t for t, _ in msgs]
        assert kinds == [b"T", b"D", b"C", b"Z"]
        # DataRow: one column, text "5"
        assert msgs[1][1] == struct.pack("!h", 1) + struct.pack("!i", 1) + b"5"
        assert msgs[2][1] == b"SELECT 1\x00"


def test_extended_protocol_dollar_in_string_literal(server):
    """$N inside a quoted literal is text, not a parameter."""
    c = _RawPg(server.port)
    try:
        c.parse("lit", "SELECT '$1 coupon' AS s, $1 AS v", oids=(23,))
        c.bind("", "lit", params=(9,))
        c.execute("")
        c.sync()
        msgs = c.drain_until(b"Z")
        row = dict(msgs)[b"D"]
        assert b"$1 coupon" in row and row.endswith(b"9")
    finally:
        c.close()


def test_extended_protocol_portal_suspension(server):
    """Execute with a row limit returns PortalSuspended and the NEXT Execute
    resumes from the cursor position — never re-sends the same rows."""
    c = _RawPg(server.port)
    try:
        c.parse("cur", "SELECT id FROM RANGE(5) ORDER BY id", oids=())
        c.bind("", "cur")
        c.execute("", max_rows=2)
        c.sync()
        msgs = c.drain_until(b"Z")
        kinds = [t for t, _ in msgs]
        assert kinds == [b"1", b"2", b"D", b"D", b"s", b"Z"], kinds
        first = [p for t, p in msgs if t == b"D"]
        c.execute("", max_rows=2)
        c.sync()
        msgs = c.drain_until(b"Z")
        second = [p for t, p in msgs if t == b"D"]
        assert [t for t, _ in msgs][-2:] == [b"s", b"Z"]
        assert first != second  # resumed, not repeated
        c.execute("")  # drain the rest
        c.sync()
        msgs = c.drain_until(b"Z")
        assert [t for t, _ in msgs] == [b"D", b"C", b"Z"]
        assert dict(msgs)[b"C"] == b"SELECT 5\x00"
    finally:
        c.close()


def test_extended_protocol_parameterized_insert(server, spark):
    """Parameterized DML through Bind must reach the Engine's Insert handler."""
    server.engine.execute(
        "DROP TABLE IF EXISTS pgw_dml; CREATE TABLE pgw_dml AS SELECT CAST(1 AS INT) AS k"
    )
    c = _RawPg(server.port)
    try:
        c.parse("ins", "INSERT INTO pgw_dml VALUES ($1)", oids=(23,))
        c.bind("", "ins", params=(42,))
        c.execute("")
        c.sync()
        msgs = c.drain_until(b"Z")
        assert dict(msgs)[b"C"] == b"INSERT\x00"
        rows = {r.k for r in server.engine.execute("SELECT * FROM pgw_dml").collect()}
        assert rows == {1, 42}
    finally:
        c.close()
        server.engine.execute("DROP TABLE IF EXISTS pgw_dml")
