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


# display cap: the REPL renders at most this many rows, so it never
# collects more than cap+1 to the driver — `SELECT * FROM` a 100 TB
# table in the console must not OOM the driver just to print 50 rows
_MAX_DISPLAY = 200


def run_command(context: "Context", line: str) -> str:
    """Execute one REPL line (meta command or SQL); return printable output.
    Split out from the loop for testability."""
    # trailing semicolons are stripped BEFORE meta detection (reference
    # cmd.py:205 rstrip(";") — round-10 audit: "\\dt;" and "quit;" used
    # to fall through to the SQL parser)
    line = line.strip().rstrip(";").strip()
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
        # bare \dss means the current schema — a no-op switch
        # (reference cmd.py:102 `schema_name or context.schema_name`)
        target = arg or context.schema_name
        if target not in context.schemas:
            return f"Schema {target} not available"
        context.schema_name = target
        return f"schema: {target}"
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
    if cmd.startswith("\\"):
        # unknown meta command: show the command list instead of handing
        # "\foo" to the SQL parser for a cryptic syntax error (reference
        # cmd.py:139-142 — round-10 audit)
        return f"The meta command {cmd} is not available.\n{_HELP}"
    result = context.sql(line)
    pdf = result.limit(_MAX_DISPLAY + 1).toPandas()
    truncated = len(pdf) > _MAX_DISPLAY
    out = pdf.head(_MAX_DISPLAY).to_string(index=False, max_rows=50)
    if truncated:
        out += f"\n(output truncated at {_MAX_DISPLAY} rows)"
    return out


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
