"""PostgreSQL wire-protocol (v3) front end for the Engine.

The reference serves real psql/BI clients through its server component
(src/lib/server/postgres_protocol_handler.hpp, query_handler.hpp:36). This
module is the analog: the SIMPLE QUERY subset of the v3 protocol — startup
(incl. SSLRequest/GSSENC refusal), AuthenticationOk trust auth,
ParameterStatus, Query -> RowDescription/DataRow*/CommandComplete,
ErrorResponse with transaction-idle recovery, Terminate — enough for
`psql -c`, interactive psql sessions, and any driver that falls back to
simple mode. The extended protocol (Parse/Bind/Execute) is answered with a
clear ErrorResponse; `server.py` (line-JSON) remains the richer
programmatic surface (parameterized statements there).

All result values travel in text format (format code 0), which every
client accepts. Rows are capped at `max_rows` like the JSON server — this
is an interactive entry point, not a bulk-export path (use the writers in
`sources/` for that).
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
from typing import Any

from pyspark.sql import SparkSession

from .engine import Engine

_SSL_REQUEST = 80877103
_GSSENC_REQUEST = 80877104
_CANCEL_REQUEST = 80877102
_PROTOCOL_V3 = 196608

# Spark type name -> (pg type oid, typlen); text format throughout.
_PG_OIDS = {
    "boolean": (16, 1),
    "int": (23, 4),
    "bigint": (20, 8),
    "smallint": (21, 2),
    "tinyint": (21, 2),
    "float": (700, 4),
    "double": (701, 8),
    "date": (1082, 4),
    "timestamp": (1114, 8),
    "timestamp_ntz": (1114, 8),
    "string": (25, -1),
}
_TEXT_OID = 25


def _oid_for(spark_type: str) -> tuple[int, int]:
    base = spark_type.split("(")[0]
    if base.startswith("decimal"):
        return 1700, -1
    return _PG_OIDS.get(base, (_TEXT_OID, -1))


def _render(v: Any) -> bytes | None:
    """Text-format rendering of one value (None -> SQL NULL)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return b"t" if v else b"f"
    if isinstance(v, bytes):
        return b"\\x" + v.hex().encode()
    if hasattr(v, "isoformat"):  # date / datetime -> pg text form
        return v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
    if isinstance(v, (list, tuple)):  # pg array literal, shallow
        return (
            "{" + ",".join("NULL" if x is None else str(x) for x in v) + "}"
        ).encode()
    return str(v).encode()


def _msg(type_byte: bytes, payload: bytes) -> bytes:
    return type_byte + struct.pack("!I", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


class _PgHandler(socketserver.BaseRequestHandler):
    def handle(self) -> None:
        server: PgWireServer = self.server  # type: ignore[assignment]
        sock: socket.socket = self.request
        try:
            if not self._startup(sock):
                return
            self._send(sock, _msg(b"R", struct.pack("!I", 0)))  # AuthenticationOk
            for k, v in (
                ("server_version", "15.0 (hyrise_spark)"),
                ("server_encoding", "UTF8"),
                ("client_encoding", "UTF8"),
                ("DateStyle", "ISO, MDY"),
                ("integer_datetimes", "on"),
            ):
                self._send(sock, _msg(b"S", _cstr(k) + _cstr(v)))
            self._send(sock, _msg(b"K", struct.pack("!II", 1, 0)))  # BackendKeyData
            self._ready(sock)
            self._query_loop(sock, server)
        except (ConnectionResetError, BrokenPipeError, OSError):
            pass

    # -- startup ------------------------------------------------------------
    def _startup(self, sock: socket.socket) -> bool:
        while True:
            head = self._recv_exact(sock, 4)
            if head is None:
                return False
            (length,) = struct.unpack("!I", head)
            body = self._recv_exact(sock, length - 4)
            if body is None or len(body) < 4:
                return False
            (code,) = struct.unpack("!I", body[:4])
            if code in (_SSL_REQUEST, _GSSENC_REQUEST):
                sock.sendall(b"N")  # no TLS; client retries in cleartext
                continue
            if code == _CANCEL_REQUEST:
                return False  # no out-of-band cancel; close quietly
            if code != _PROTOCOL_V3:
                self._error(sock, f"unsupported protocol version {code}")
                return False
            return True

    # -- main loop ----------------------------------------------------------
    def _query_loop(self, sock: socket.socket, server: "PgWireServer") -> None:
        while True:
            head = self._recv_exact(sock, 5)
            if head is None:
                return
            mtype = head[:1]
            (length,) = struct.unpack("!I", head[1:])
            body = self._recv_exact(sock, length - 4)
            if body is None:
                return
            if mtype == b"X":  # Terminate
                return
            if mtype == b"Q":
                sql = body.rstrip(b"\x00").decode("utf-8", "replace")
                if not sql.strip():
                    self._send(sock, _msg(b"I", b""))  # EmptyQueryResponse
                    self._ready(sock)
                    continue
                try:
                    self._run_query(sock, server, sql)
                except Exception as exc:  # noqa: BLE001 — surfaced to client
                    self._error(sock, f"{type(exc).__name__}: {exc}")
                self._ready(sock)
                continue
            # extended protocol (Parse/Bind/Describe/Execute/Sync/...)
            self._error(
                sock,
                "extended query protocol not supported — use simple queries "
                "(psql works) or the line-JSON server for parameterized SQL",
            )
            if mtype == b"S":  # a stray Sync still deserves ReadyForQuery
                self._ready(sock)

    def _run_query(self, sock: socket.socket, server: "PgWireServer", sql: str) -> None:
        df = server.engine.execute(sql)
        if df is None:
            tag = sql.strip().split()[0].upper() if sql.strip() else "OK"
            self._send(sock, _msg(b"C", _cstr(tag)))
            return
        rows = df.limit(server.max_rows).collect()
        desc = b"".join(
            _cstr(name)
            + struct.pack(
                "!IhIhih",
                0,  # table oid
                0,  # attnum
                _oid_for(dtype)[0],
                _oid_for(dtype)[1],
                -1,  # typmod
                0,  # text format
            )
            for name, dtype in df.dtypes
        )
        self._send(sock, _msg(b"T", struct.pack("!h", len(df.dtypes)) + desc))
        for r in rows:
            cells = []
            for v in r:
                t = _render(v)
                cells.append(
                    struct.pack("!i", -1) if t is None else struct.pack("!i", len(t)) + t
                )
            self._send(sock, _msg(b"D", struct.pack("!h", len(r)) + b"".join(cells)))
        self._send(sock, _msg(b"C", _cstr(f"SELECT {len(rows)}")))

    # -- plumbing -----------------------------------------------------------
    @staticmethod
    def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    @staticmethod
    def _send(sock: socket.socket, data: bytes) -> None:
        sock.sendall(data)

    def _ready(self, sock: socket.socket) -> None:
        self._send(sock, _msg(b"Z", b"I"))  # idle (autocommit engine)

    def _error(self, sock: socket.socket, message: str) -> None:
        payload = (
            b"S" + _cstr("ERROR")
            + b"V" + _cstr("ERROR")
            + b"C" + _cstr("XX000")
            + b"M" + _cstr(message)
            + b"\x00"
        )
        self._send(sock, _msg(b"E", payload))


class PgWireServer(socketserver.ThreadingTCPServer):
    """Serve the Engine over the PostgreSQL v3 simple-query protocol."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, spark: SparkSession, host: str = "127.0.0.1", port: int = 0,
                 max_rows: int = 10_000, engine: Engine | None = None):
        super().__init__((host, port), _PgHandler)
        self.engine = engine if engine is not None else Engine(spark)
        self.max_rows = max_rows
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self.server_address[1]

    def start_background(self) -> None:
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()


def main() -> None:  # pragma: no cover — manual entry point
    import argparse

    from .session import get_spark

    ap = argparse.ArgumentParser(description="hyrise_spark pg-wire server")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5432)
    ap.add_argument("--max-rows", type=int, default=10_000)
    args = ap.parse_args()
    srv = PgWireServer(get_spark("hyrise_spark_pgwire"), args.host, args.port,
                       args.max_rows)
    print(f"pg-wire server listening on {args.host}:{srv.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
