"""Minimal PostgreSQL simple-protocol client (stdlib sockets only).

Client counterpart of ``csvb_spark.server.pgwire`` — used by the
federation layer when no JDBC driver jar is available: the schema
probe runs ``SELECT * FROM t LIMIT 1`` exactly like the reference
(reference third_party/postgres_provider/src/postgres_connection.rs:113-154,
query at :120), and each shard scan ships a pushed-down SQL string to
the shard (reference scan-to-SQL compilation,
third_party/postgres_provider/src/lib.rs:45-52).

Protocol reference: PostgreSQL docs "Frontend/Backend Protocol" v3
(public documentation). Text result format only.
"""

from __future__ import annotations

import socket
import struct

# pg type OID → (spark type name, python caster); mirrors the subset
# the pgwire server emits (csvb_spark/server/pgwire.py:_PG_OIDS).
OID_SPARK = {
    16: "boolean",
    20: "bigint",
    21: "smallint",
    23: "int",
    25: "string",
    17: "binary",
    700: "float",
    701: "double",
    1082: "date",
    1114: "timestamp",
    1700: "double",  # decimal w/o typmod: read as double
}


def pg_simple_query(
    host: str,
    port: int,
    sql: str,
    user: str = "csvb",
    database: str = "csvb",
    timeout: float = 120.0,
) -> tuple[list[tuple[str, int]], list[list[str | None]]]:
    """Run one simple-protocol query; return (columns, text rows).

    columns = [(name, type_oid)]; row values are pg text format
    (None for SQL NULL). Raises RuntimeError on ErrorResponse.
    """
    sock = socket.create_connection((host, port), timeout=timeout)
    buf = b""

    def recv_exact(n: int) -> bytes:
        nonlocal buf
        while len(buf) < n:
            chunk = sock.recv(65536)
            if not chunk:
                raise ConnectionError("server closed")
            buf += chunk
        out, rest = buf[:n], buf[n:]
        buf = rest
        return out

    def read_msg() -> tuple[bytes, bytes]:
        tag = recv_exact(1)
        (length,) = struct.unpack("!I", recv_exact(4))
        return tag, recv_exact(length - 4)

    try:
        params = (
            b"user\x00" + user.encode() + b"\x00"
            b"database\x00" + database.encode() + b"\x00\x00"
        )
        sock.sendall(struct.pack("!II", 8 + len(params), 196608) + params)
        while True:  # drain startup: R/S/K then Z
            tag, body = read_msg()
            if tag == b"E":
                raise RuntimeError(_error_text(body))
            if tag == b"Z":
                break

        q = sql.encode() + b"\x00"
        sock.sendall(b"Q" + struct.pack("!I", 4 + len(q)) + q)
        cols: list[tuple[str, int]] = []
        rows: list[list[str | None]] = []
        err: str | None = None
        while True:
            tag, body = read_msg()
            if tag == b"T":
                (n,) = struct.unpack("!h", body[:2])
                off = 2
                cols = []
                for _ in range(n):
                    end = body.index(b"\x00", off)
                    name = body[off:end].decode()
                    (oid,) = struct.unpack("!I", body[end + 7 : end + 11])
                    cols.append((name, oid))
                    off = end + 1 + 18
            elif tag == b"D":
                (n,) = struct.unpack("!h", body[:2])
                off = 2
                row: list[str | None] = []
                for _ in range(n):
                    (vlen,) = struct.unpack("!i", body[off : off + 4])
                    off += 4
                    if vlen == -1:
                        row.append(None)
                    else:
                        row.append(body[off : off + vlen].decode())
                        off += vlen
                rows.append(row)
            elif tag == b"E":
                err = _error_text(body)
            elif tag == b"Z":
                break
        if err is not None:
            raise RuntimeError(err)
        return cols, rows
    finally:
        try:
            sock.sendall(b"X" + struct.pack("!I", 4))
        except OSError:
            pass
        sock.close()


def _error_text(body: bytes) -> str:
    parts = {}
    for field in body.split(b"\x00"):
        if field:
            parts[chr(field[0])] = field[1:].decode(errors="replace")
    return parts.get("M", "unknown server error")


def cast_text(value: str | None, oid: int):
    """pg text format → python value for the supported OID set."""
    if value is None:
        return None
    if oid == 16:
        return value == "t"
    if oid in (20, 21, 23):
        return int(value)
    if oid in (700, 701, 1700):
        return float(value)
    if oid == 17:
        return bytes.fromhex(value[2:]) if value.startswith("\\x") else value.encode()
    if oid == 1082:
        import datetime as _dt

        return _dt.date.fromisoformat(value)
    if oid == 1114:
        import datetime as _dt

        return _dt.datetime.fromisoformat(value)
    return value
