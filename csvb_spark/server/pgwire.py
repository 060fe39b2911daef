"""PostgreSQL wire-protocol (v3) front-end over ``spark.sql``.

Parity target: the reference's ``serve`` — a TCP listener whose
per-connection handler speaks pgwire and dispatches SQL to the
session (reference csvb_engine/src/lib.rs:91-132; it gets the
protocol from the pgwire + datafusion-postgres crates, we implement
the subset that real clients use):

- startup: SSLRequest → 'N'; StartupMessage → AuthenticationOk,
  ParameterStatus, BackendKeyData, ReadyForQuery
- simple query ('Q'): RowDescription / DataRow* / CommandComplete
- extended protocol: Parse/Bind/Describe/Execute/Sync handled
  parameter-less (enough for many drivers' simple statements)
- errors → ErrorResponse + ReadyForQuery (connection survives)

Each connection runs on its own thread; ``spark.sql`` is thread-safe
and queries from concurrent connections share the session the same
way the reference's per-connection tokio tasks share one
SessionContext (lib.rs:102-106).

Protocol reference: PostgreSQL docs "Frontend/Backend Protocol"
(public documentation, protocol version 3.0).
"""

from __future__ import annotations

import datetime as _dt
import logging
import socket
import socketserver
import struct
import threading

from pyspark.sql import SparkSession

log = logging.getLogger("csvb.pgwire")

_SSL_REQUEST = 80877103
_CANCEL_REQUEST = 80877102
_GSSENC_REQUEST = 80877104

# Spark simpleString -> (type oid, type size)
_PG_OIDS = {
    "boolean": (16, 1),
    "tinyint": (21, 2),
    "smallint": (21, 2),
    "int": (23, 4),
    "bigint": (20, 8),
    "float": (700, 4),
    "double": (701, 8),
    "date": (1082, 4),
    "timestamp": (1114, 8),
    "timestamp_ntz": (1114, 8),
    "string": (25, -1),
    "binary": (17, -1),
}


def _oid_for(dtype: str) -> tuple[int, int]:
    base = dtype.split("(")[0]
    if base.startswith("decimal"):
        return (1700, -1)
    return _PG_OIDS.get(base, (25, -1))


def _pg_text(v) -> bytes | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return b"t" if v else b"f"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f").encode()
    if isinstance(v, _dt.date):
        return v.isoformat().encode()
    if isinstance(v, (bytes, bytearray)):
        return b"\\x" + v.hex().encode()
    if isinstance(v, (list, tuple)):
        return ("{" + ",".join("NULL" if x is None else str(x) for x in v) + "}").encode()
    if isinstance(v, dict):
        return str(v).encode()
    return str(v).encode()


def _msg(tag: bytes, payload: bytes = b"") -> bytes:
    return tag + struct.pack("!I", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


class _Conn:
    def __init__(self, sock: socket.socket, spark: SparkSession):
        self.sock = sock
        self.spark = spark
        self.buf = b""

    # --- low-level framing -------------------------------------------------
    def _recv_exact(self, n: int) -> bytes:
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("client closed")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def _send(self, data: bytes) -> None:
        self.sock.sendall(data)

    # --- startup -----------------------------------------------------------
    def handshake(self) -> bool:
        while True:
            (length,) = struct.unpack("!I", self._recv_exact(4))
            body = self._recv_exact(length - 4)
            (code,) = struct.unpack("!I", body[:4])
            if code == _SSL_REQUEST or code == _GSSENC_REQUEST:
                self._send(b"N")  # no TLS; client retries plaintext
                continue
            if code == _CANCEL_REQUEST:
                return False
            if code != 196608:  # protocol 3.0
                self._send_error("08P01", f"unsupported protocol code {code}")
                return False
            break
        out = _msg(b"R", struct.pack("!I", 0))  # AuthenticationOk (trust)
        for k, v in (
            ("server_version", "15.0 (csvb_spark)"),
            ("server_encoding", "UTF8"),
            ("client_encoding", "UTF8"),
            ("DateStyle", "ISO, MDY"),
            ("integer_datetimes", "on"),
        ):
            out += _msg(b"S", _cstr(k) + _cstr(v))
        out += _msg(b"K", struct.pack("!II", threading.get_ident() & 0x7FFFFFFF, 0))
        out += self._ready()
        self._send(out)
        return True

    def _ready(self) -> bytes:
        return _msg(b"Z", b"I")

    def _send_error(self, code: str, message: str) -> None:
        payload = (
            b"S" + _cstr("ERROR") + b"C" + _cstr(code) + b"M" + _cstr(message) + b"\x00"
        )
        self._send(_msg(b"E", payload))

    # --- query execution ----------------------------------------------------
    def _row_description(self, df) -> bytes:
        fields = b""
        for name, dtype in df.dtypes:
            oid, size = _oid_for(dtype)
            fields += (
                _cstr(name)
                + struct.pack("!IhIhih", 0, 0, oid, size, -1, 0)
            )
        return _msg(b"T", struct.pack("!h", len(df.dtypes)) + fields)

    def _run_sql(self, sql: str, max_rows: int | None = None) -> None:
        from csvb_spark.sql import execute_sql

        sql = sql.strip().rstrip(";").strip()
        if not sql:
            self._send(_msg(b"I"))  # EmptyQueryResponse
            self._send(self._ready())
            return
        try:
            df = execute_sql(self.spark, sql)
            cols = df.columns
            out = self._row_description(df)
            n = 0
            it = df.toLocalIterator()
            for row in it:
                vals = b""
                for v in tuple(row):
                    t = _pg_text(v)
                    if t is None:
                        vals += struct.pack("!i", -1)
                    else:
                        vals += struct.pack("!i", len(t)) + t
                out += _msg(b"D", struct.pack("!h", len(cols)) + vals)
                n += 1
                if len(out) > 1 << 20:
                    self._send(out)
                    out = b""
                if max_rows and n >= max_rows:
                    break
            out += _msg(b"C", _cstr(f"SELECT {n}"))
            self._send(out)
        except Exception as e:  # noqa: BLE001 — every engine error → client
            log.warning("query failed: %s", e)
            self._send_error("42601", str(e).split("\n")[0][:500])
        self._send(self._ready())

    # --- main loop ------------------------------------------------------------
    def serve(self) -> None:
        if not self.handshake():
            return
        stmt_sql: dict[str, str] = {}
        portal_sql: dict[str, str] = {}
        while True:
            tag = self._recv_exact(1)
            (length,) = struct.unpack("!I", self._recv_exact(4))
            body = self._recv_exact(length - 4)
            if tag == b"X":
                return
            if tag == b"Q":
                self._run_sql(body.rstrip(b"\x00").decode())
            elif tag == b"P":  # Parse: name, query, n param types
                name, rest = body.split(b"\x00", 1)
                query, _ = rest.split(b"\x00", 1)
                stmt_sql[name.decode()] = query.decode()
                self._send(_msg(b"1"))  # ParseComplete
            elif tag == b"B":  # Bind: portal, stmt, (params ignored)
                portal, rest = body.split(b"\x00", 1)
                stmt, _ = rest.split(b"\x00", 1)
                portal_sql[portal.decode()] = stmt_sql.get(stmt.decode(), "")
                self._send(_msg(b"2"))  # BindComplete
            elif tag == b"D":  # Describe — defer row description to Execute
                self._send(_msg(b"n"))  # NoData (clients re-read desc on Execute)
            elif tag == b"E":  # Execute: portal, max rows
                portal, rest = body.split(b"\x00", 1)
                (max_rows,) = struct.unpack("!I", rest[:4])
                sql = portal_sql.get(portal.decode(), "")
                self._run_sql(sql, max_rows or None)
            elif tag == b"S":  # Sync
                self._send(self._ready())
            elif tag == b"H":  # Flush
                pass
            else:
                self._send_error("0A000", f"unsupported message {tag!r}")
                self._send(self._ready())


class PgWireServer:
    """TCP accept loop (reference lib.rs:108-127) on a thread pool."""

    def __init__(self, spark: SparkSession, address: str = "127.0.0.1:5432"):
        host, _, port = address.rpartition(":")
        self.spark = spark
        self.host, self.port = host or "127.0.0.1", int(port)
        spark_ref = spark

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:  # noqa: D401
                try:
                    _Conn(self.request, spark_ref).serve()
                except ConnectionError:
                    pass
                except Exception as e:  # noqa: BLE001
                    log.warning("connection error: %s", e)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((self.host, self.port), Handler)
        self.port = self._server.server_address[1]

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        log.info("pgwire listening on %s:%d", self.host, self.port)
        return t

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()


def serve_forever(spark: SparkSession, address: str = "127.0.0.1:5432") -> None:
    server = PgWireServer(spark, address)
    server.start_background()
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()
