"""A SQL-EXECUTING ClickHouse stand-in for hermetic live-path testing.

The sandbox has a docker CLI but no daemon (LIVE_SMOKE.md captures the
probe), so the @live tests against a real server cannot run here. This
module closes most of that gap honestly: an in-process HTTP server that
speaks the subset of the ClickHouse HTTP protocol the repo's client uses
(POST body or ?query= statement, X-ClickHouse-User/Key auth headers,
``FORMAT TSV`` / ``FORMAT JSONEachRow``) and — unlike the recording stub in
test_connectors.py — actually EXECUTES every statement against DuckDB after
a small dialect translation. CREATE really creates, INSERT really inserts,
count/last-n/exists/truncate/drop really read and mutate state, and wrong
SQL really errors with an HTTP 400 like a server would.

Dialect translation (the full S7–S14 surface, nothing more):
- ``ENGINE = MergeTree/ReplacingMergeTree(...) ORDER BY ...`` is stripped
  (DuckDB has no storage engines; ReplacingMergeTree's replay collapse is
  what the ``count(DISTINCT key)`` verification mode exists for)
- ClickHouse column types map to DuckDB types
- ``db.table`` name qualifiers become quoted DuckDB schemas
- ``EXISTS TABLE`` / ``system.tables`` map to information_schema lookups
- ``INSERT ... FORMAT JSONEachRow`` bodies are parsed and bulk-inserted
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import duckdb

_CH_TO_DUCK = {
    "UUID": "UUID",
    "String": "VARCHAR",
    "DateTime": "TIMESTAMP",
    "Int32": "INTEGER",
    "Int64": "BIGINT",
    "Float64": "DOUBLE",
    "Bool": "BOOLEAN",
}

_QUALIFIED = re.compile(r"(?<![\w.\"])([A-Za-z_][\w]*)\.(`?)([A-Za-z_][\w]*)\2")


def _quote_qualified(sql: str) -> str:
    """``db.table`` -> ``"db"."table"`` (DuckDB schema-qualified; survives
    reserved schema names like ``default``)."""
    return _QUALIFIED.sub(lambda m: f'"{m.group(1)}"."{m.group(3)}"', sql)


class ClickHouseStandin:
    """In-process ClickHouse-over-HTTP stand-in backed by DuckDB."""

    def __init__(self, username: str = "default", password: str = "secret"):
        self.username, self.password = username, password
        self.con = duckdb.connect()
        self.lock = threading.Lock()
        self.requests: list[dict] = []  # (sql, data) log, like the recording stub

    # --- statement execution -------------------------------------------------

    def execute(self, sql: str, body: str | None) -> str:
        sql = sql.strip().rstrip(";").strip()
        fmt = None
        m = re.search(r"\s+FORMAT\s+(\w+)\s*$", sql, re.IGNORECASE)
        if m:
            fmt, sql = m.group(1), sql[: m.start()]

        if sql.upper().startswith("CREATE TABLE"):
            return self._create(sql)
        if sql.upper().startswith("INSERT INTO"):
            return self._insert(sql, fmt, body or "")
        if sql.upper().startswith("EXISTS TABLE"):
            return self._exists(sql)
        if sql.upper().startswith("TRUNCATE TABLE"):
            tbl = _quote_qualified(sql[len("TRUNCATE TABLE") :].strip())
            self._run(f"DELETE FROM {tbl}")
            return ""
        if sql.upper().startswith("DROP TABLE"):
            self._run(_quote_qualified(sql))
            return ""
        if "system.tables" in sql:
            m = re.search(r"database\s*=\s*'([^']+)'", sql)
            rows = self._fetch(
                "SELECT table_name FROM information_schema.tables WHERE table_schema = ?",
                [m.group(1) if m else "default"],
            )
            return "".join(f"{r[0]}\n" for r in rows)
        return self._select(sql, fmt)

    def _run(self, sql: str, params: list | None = None) -> None:
        with self.lock:
            self.con.execute(sql, params or [])

    def _fetch(self, sql: str, params: list | None = None):
        with self.lock:
            return self.con.execute(sql, params or []).fetchall()

    def _create(self, sql: str) -> str:
        m = re.match(
            r"CREATE TABLE (IF NOT EXISTS )?(\S+)\s*\((.*)\)\s*ENGINE\s*=.*?(ORDER BY .*)?$",
            sql,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"unparseable CREATE TABLE: {sql!r}")
        ifne, name, cols = m.group(1) or "", m.group(2), m.group(3)
        schema = name.split(".")[0] if "." in name else "default"
        col_defs = []
        for part in cols.split(","):
            cm = re.match(r"\s*`?(\w+)`?\s+(\w+)\s*$", part)
            if not cm:
                raise ValueError(f"unparseable column def {part!r} in {sql!r}")
            col_defs.append(f'"{cm.group(1)}" {_CH_TO_DUCK.get(cm.group(2), cm.group(2))}')
        self._run(f'CREATE SCHEMA IF NOT EXISTS "{schema}"')
        self._run(
            f"CREATE TABLE {ifne}{_quote_qualified(name)} ({', '.join(col_defs)})"
        )
        return ""

    def _insert(self, sql: str, fmt: str | None, body: str) -> str:
        if (fmt or "").upper() != "JSONEACHROW":
            raise ValueError(f"stand-in only speaks INSERT ... FORMAT JSONEachRow, got {sql!r}")
        tbl = _quote_qualified(re.match(r"INSERT INTO (\S+)", sql, re.IGNORECASE).group(1))
        rows = [json.loads(ln) for ln in body.splitlines() if ln.strip()]
        if not rows:
            return ""
        cols = list(rows[0].keys())
        placeholders = ", ".join("?" for _ in cols)
        collist = ", ".join(f'"{c}"' for c in cols)
        with self.lock:
            self.con.executemany(
                f"INSERT INTO {tbl} ({collist}) VALUES ({placeholders})",
                [[r.get(c) for c in cols] for r in rows],
            )
        return ""

    def _exists(self, sql: str) -> str:
        name = sql[len("EXISTS TABLE") :].strip()
        schema, _, table = name.rpartition(".")
        rows = self._fetch(
            "SELECT count(*) FROM information_schema.tables WHERE table_schema = ? AND table_name = ?",
            [schema or "default", table.strip("`")],
        )
        return f"{rows[0][0]}\n"

    def _select(self, sql: str, fmt: str | None) -> str:
        # ClickHouse backtick identifier quoting -> SQL-standard double quotes
        duck = _quote_qualified(sql.replace("count()", "count(*)").replace("`", '"'))
        with self.lock:
            cur = self.con.execute(duck)
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
        if (fmt or "").upper() == "JSONEACHROW":
            return "".join(
                json.dumps({c: _json_val(v) for c, v in zip(cols, row)}) + "\n" for row in rows
            )
        return "".join("\t".join(str(v) for v in row) + "\n" for row in rows)

    # --- HTTP server ----------------------------------------------------------

    def __enter__(self) -> "ClickHouseStandin":
        standin = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                try:
                    q = parse_qs(urlparse(self.path).query)
                    body = self.rfile.read(int(self.headers.get("Content-Length", 0))).decode()
                    if self.headers.get("X-ClickHouse-User") != standin.username or self.headers.get(
                        "X-ClickHouse-Key"
                    ) != standin.password:
                        self.send_response(403)
                        self.end_headers()
                        self.wfile.write(b"DB::Exception: Authentication failed")
                        return
                    if "query" in q:
                        sql, data = q["query"][0], body
                    else:
                        sql, data = body, None
                    standin.requests.append({"sql": sql.strip(), "data": data})
                    out = standin.execute(sql, data).encode()
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(out)
                except Exception as e:  # noqa: BLE001 — surface as CH-style 400
                    self.send_response(400)
                    self.end_headers()
                    self.wfile.write(f"DB::Exception: {e}".encode())

            def log_message(self, *a):  # quiet
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_port
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.server.shutdown()
        self.server.server_close()


def _json_val(v):
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if hasattr(v, "hex") and not isinstance(v, (int, float)):  # uuid.UUID
        return str(v)
    return v
