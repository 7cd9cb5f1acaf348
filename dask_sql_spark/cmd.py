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
Meta commands (reference cmd.py:84-96):
  \\l            list schemas
  \\dt [schema]  list tables
  \\df [schema]  list registered functions
  \\dm [schema]  list registered models
  \\de [schema]  list experiments
  \\dss <schema> switch schema
  \\d <table>    describe a table
  \\d?, help, ?  show this help
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
    if line in ("\\h", "help", "\\?", "\\d?", "?"):
        return _HELP
    cmd, _, arg = line.partition(" ")
    arg = arg.strip()

    def _schema(name: str):
        sname = name or context.schema_name
        if sname not in context.schemas:
            raise RuntimeError(f"Schema {sname} does not exist")
        return context.schemas[sname]

    if cmd == "\\l":
        return "\n".join(sorted(context.schemas))
    if cmd == "\\dt":
        return "\n".join(sorted(_schema(arg).tables))
    if cmd == "\\df":
        return "\n".join(sorted(_schema(arg).functions))
    if cmd == "\\dm":
        return "\n".join(sorted(_schema(arg).models))
    if cmd == "\\de":
        return "\n".join(sorted(getattr(_schema(arg), "experiments", {})))
    if cmd == "\\dss":
        if arg not in context.schemas:
            return f"Schema {arg} not available"
        context.schema_name = arg
        return f"schema: {arg}"
    if cmd == "\\dsc":
        # reference switches the Dask cluster here; a Spark master is
        # fixed at session build, so surface that instead of silently
        # accepting the switch
        return (
            "Spark's master is fixed when the session is built; start a "
            "new Context(spark=...) against the desired cluster instead"
        )
    if cmd == "\\conninfo":
        sc = context.spark.sparkContext
        return (
            f"spark {sc.version} | master {sc.master} | "
            f"schema {context.schema_name}"
        )
    if cmd == "\\d" and arg:
        df = context._get_table(arg)
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
