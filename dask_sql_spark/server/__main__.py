"""``python -m dask_sql_spark.server [host] [port]`` → Presto-protocol
server over a fresh Context (parity with the reference's
``dask-sql-server`` entry point)."""

import sys

from dask_sql_spark.server.app import run_server

if __name__ == "__main__":
    host = sys.argv[1] if len(sys.argv) > 1 else "localhost"
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8080
    print(f"dask_sql_spark server on http://{host}:{port}/v1/statement")
    run_server(host=host, port=port, blocking=True)
