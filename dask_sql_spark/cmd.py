"""Interactive SQL REPL (reference dask_sql/cmd.py:1-276: ``dask-sql``
console with \\l \\dt \\df meta-commands).

Usage::

    python -m dask_sql_spark.cmd          # fresh Context
    from dask_sql_spark.cmd import cmd_loop
    cmd_loop(context)
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from dask_sql_spark.context import Context

_HELP = """\
Meta commands:
  \\l            list schemas
  \\dt           list tables in the current schema
  \\df           list registered functions
  \\dm           list registered models
  \\d <table>    describe a table
  \\conninfo     show session info
  \\q | quit     exit
Anything else is executed as SQL."""


def run_command(context: "Context", line: str) -> str:
    """Execute one REPL line (meta command or SQL); return printable output.
    Split out from the loop for testability."""
    line = line.strip()
    if not line:
        return ""
    if line in ("\\q", "quit", "exit"):
        raise EOFError
    if line in ("\\h", "help", "\\?"):
        return _HELP
    if line == "\\l":
        return "\n".join(sorted(context.schemas))
    if line == "\\dt":
        return "\n".join(sorted(context.schemas[context.schema_name].tables))
    if line == "\\df":
        return "\n".join(sorted(context.schemas[context.schema_name].functions))
    if line == "\\dm":
        return "\n".join(sorted(context.schemas[context.schema_name].models))
    if line == "\\conninfo":
        sc = context.spark.sparkContext
        return (
            f"spark {sc.version} | master {sc.master} | "
            f"schema {context.schema_name}"
        )
    if line.startswith("\\d "):
        name = line[3:].strip()
        df = context._get_table(name)
        return "\n".join(
            f"{f.name}\t{f.dataType.simpleString()}" for f in df.schema.fields
        )
    result = context.sql(line)
    pdf = result.toPandas()
    return pdf.to_string(index=False, max_rows=50)


def cmd_loop(context: "Context | None" = None) -> None:  # pragma: no cover
    """Blocking REPL loop (reference cmd_loop, cmd.py)."""
    if context is None:
        from dask_sql_spark.context import Context

        context = Context()
    print("dask_sql_spark REPL — \\h for help")
    while True:
        try:
            line = input("(dask-sql-spark) > ")
        except (EOFError, KeyboardInterrupt):
            print()
            break
        try:
            out = run_command(context, line)
            if out:
                print(out)
        except EOFError:
            break
        except Exception as e:  # noqa: BLE001 — REPL survives bad SQL
            print(f"ERROR: {e}")


if __name__ == "__main__":  # pragma: no cover
    cmd_loop()
