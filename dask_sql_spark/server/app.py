"""Presto wire-protocol HTTP server.

Parity target: the reference's FastAPI app (server/app.py:19-280,
server/responses.py:1-149): ``POST /v1/statement`` executes SQL and
returns Presto-format JSON; async queries poll ``GET /v1/status/{uuid}``
and cancel via ``DELETE /v1/cancel/{uuid}``; a JDBC shim answers the
``system.jdbc`` metadata queries.

FastAPI is not available in this environment, so the app is built on the
stdlib ``ThreadingHTTPServer`` — same endpoints, same response shapes, no
third-party dependency. Queries execute on a thread pool; results are
collected once and buffered (the Presto protocol is a paging protocol; we
return a single page, which is what the reference does for computed
results too).
"""

from __future__ import annotations

import json
import threading
import uuid as uuidlib
from concurrent.futures import Future, ThreadPoolExecutor
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import TYPE_CHECKING, Any

from pyspark.sql import types as T

if TYPE_CHECKING:
    from dask_sql_spark.context import Context

# Spark type → Presto type name (reference responses.py type mapping)
_PRESTO_TYPES = {
    T.StringType(): "varchar",
    T.LongType(): "bigint",
    T.IntegerType(): "integer",
    T.ShortType(): "smallint",
    T.ByteType(): "tinyint",
    T.DoubleType(): "double",
    T.FloatType(): "real",
    T.BooleanType(): "boolean",
    T.DateType(): "date",
    T.TimestampType(): "timestamp",
    T.BinaryType(): "varbinary",
}


def presto_type(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    return _PRESTO_TYPES.get(dt, "varchar")


def _columns_payload(schema: T.StructType) -> list[dict[str, Any]]:
    return [
        {
            "name": f.name,
            "type": presto_type(f.dataType),
            "typeSignature": {
                "rawType": presto_type(f.dataType).split("(")[0],
                "arguments": [],
            },
        }
        for f in schema.fields
    ]


def _json_value(v: Any) -> Any:
    import datetime
    import decimal

    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, bytearray):
        return bytes(v).hex()
    if isinstance(v, bytes):
        return v.hex()
    return v


class _QueryState:
    def __init__(self, future: Future):
        self.future = future
        self.cancelled = False


class SQLServer:
    """HTTP server speaking the Presto protocol over a Context."""

    def __init__(self, context: "Context", host: str = "localhost", port: int = 8080):
        self.context = context
        self.host = host
        self.port = port
        self.pool = ThreadPoolExecutor(max_workers=8)
        self.queries: dict[str, _QueryState] = {}
        self._httpd: ThreadingHTTPServer | None = None

    # ------------------------------------------------------------ #
    def _execute(self, sql: str) -> dict[str, Any]:
        from dask_sql_spark.server.presto_jdbc import maybe_jdbc_query

        jdbc = maybe_jdbc_query(self.context, sql)
        df = jdbc if jdbc is not None else self.context.sql(sql)
        rows = df.collect()
        return {
            "columns": _columns_payload(df.schema),
            "data": [[_json_value(v) for v in row] for row in rows],
        }

    def submit(self, sql: str) -> str:
        qid = str(uuidlib.uuid4())
        self.queries[qid] = _QueryState(self.pool.submit(self._execute, sql))
        return qid

    def status_payload(self, qid: str, base_url: str) -> tuple[int, dict]:
        state = self.queries.get(qid)
        if state is None:
            return 404, {"error": {"message": f"unknown query {qid}"}}
        payload: dict[str, Any] = {
            "id": qid,
            "infoUri": f"{base_url}/v1/status/{qid}",
        }
        if state.cancelled:
            payload["stats"] = {"state": "CANCELED"}
            return 200, payload
        if not state.future.done():
            payload["nextUri"] = f"{base_url}/v1/status/{qid}"
            payload["stats"] = {"state": "RUNNING"}
            return 200, payload
        exc = state.future.exception()
        if exc is not None:
            payload["error"] = {
                "message": str(exc),
                "errorType": type(exc).__name__,
            }
            payload["stats"] = {"state": "FAILED"}
            return 200, payload
        result = state.future.result()
        payload.update(result)
        payload["stats"] = {"state": "FINISHED"}
        return 200, payload

    def cancel(self, qid: str) -> bool:
        state = self.queries.get(qid)
        if state is None:
            return False
        state.cancelled = True
        state.future.cancel()
        return True

    # ------------------------------------------------------------ #
    def _make_handler(server: "SQLServer"):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            @property
            def _base(self) -> str:
                return f"http://{self.headers.get('Host', f'{server.host}:{server.port}')}"

            def do_POST(self):
                if self.path.rstrip("/") != "/v1/statement":
                    return self._reply(404, {"error": {"message": "not found"}})
                length = int(self.headers.get("Content-Length", 0))
                sql = self.rfile.read(length).decode("utf-8")
                if not sql.strip():
                    return self._reply(
                        400, {"error": {"message": "empty statement"}}
                    )
                qid = server.submit(sql)
                # mirror the reference: return a pollable handle immediately
                self._reply(
                    200,
                    {
                        "id": qid,
                        "infoUri": f"{self._base}/v1/status/{qid}",
                        "nextUri": f"{self._base}/v1/status/{qid}",
                        "stats": {"state": "QUEUED"},
                    },
                )

            def do_GET(self):
                if self.path.startswith("/v1/status/"):
                    qid = self.path.rsplit("/", 1)[-1]
                    code, payload = server.status_payload(qid, self._base)
                    return self._reply(code, payload)
                if self.path.rstrip("/") == "/v1/empty":
                    return self._reply(200, {})
                self._reply(404, {"error": {"message": "not found"}})

            def do_DELETE(self):
                if self.path.startswith("/v1/cancel/"):
                    ok = server.cancel(self.path.rsplit("/", 1)[-1])
                    return self._reply(200 if ok else 404, {})
                self._reply(404, {"error": {"message": "not found"}})

        return Handler

    # ------------------------------------------------------------ #
    def start(self) -> None:
        self._httpd = ThreadingHTTPServer(
            (self.host, self.port), self._make_handler()
        )
        self.port = self._httpd.server_address[1]
        thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        thread.start()

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
        self.pool.shutdown(wait=False)


def run_server(
    context: "Context | None" = None,
    host: str = "localhost",
    port: int = 8080,
    blocking: bool = True,
) -> SQLServer:
    """Start the Presto-protocol server (reference run_server,
    server/app.py). With ``blocking=False`` returns the running server."""
    if context is None:
        from dask_sql_spark.context import Context

        context = Context()
    server = SQLServer(context, host, port)
    server.start()
    if blocking:  # pragma: no cover
        try:
            threading.Event().wait()
        except KeyboardInterrupt:
            server.stop()
    return server
