"""Interactive SQL console — the CLI twin of the reference's
``openmldb`` shell (src/cmd/sql_cmd.h::Shell, :130-200):

- prompt ``<endpoint>/<db>> `` with an aligned ``-> `` continuation
  prompt; a statement runs when the accumulated input ends with ';'
- ``quit`` / ``exit`` (case-insensitive, with or without ';') prints
  "Bye" and leaves
- query results render as the hybridse TextTable('-', ' ', ' ') frame
  (ruler, header, ruler, rows, ruler) followed by "N rows in set"
  (sql_cmd.h:102-117); non-query statements print "SUCCEED"
  (:120-122); failures print "Error: <msg>" (:126)
- ``--cmd`` runs one statement non-interactively (FLAGS_cmd path,
  :155-161), with ``--database`` selecting the db first

Run: ``python -m openmldb_spark.cli [--database db] [--cmd SQL]
[--table name=path.parquet ...]``
"""

from __future__ import annotations

import argparse
import datetime
import sys

ENDPOINT = "spark"


def _cell(v) -> str:
    """GetAsString rendering: NULL, true/false, epoch-ms timestamps,
    ISO dates."""
    from openmldb_spark.dbapi import epoch_ms
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime.datetime):
        return str(epoch_ms(v))
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def render_result(df) -> str:
    """TextTable('-', ' ', ' ') frame + "N rows in set"."""
    names = list(df.columns)
    rows = [[_cell(v) for v in r] for r in df.collect()]
    widths = [max([len(n)] + [len(r[i]) for r in rows])
              for i, n in enumerate(names)]
    ruler = " " + " ".join("-" * (w + 2) for w in widths) + " "
    def line(cells):
        return " " + " ".join(f" {c} ".ljust(w + 2)
                              for c, w in zip(cells, widths)) + " "
    out = [ruler, line(names), ruler]
    out += [line(r) for r in rows]
    out.append(ruler)
    out.append("")
    out.append(f"{len(rows)} rows in set")
    return "\n".join(out)


def handle_sql(session, sql: str) -> str:
    """One statement -> the CLI's printed text (sql_cmd.h:90-127)."""
    try:
        df = session.execute(sql)
    except Exception as e:  # every engine error surfaces as Error:
        return f"Error: {e}"
    if df is None:
        return "SUCCEED"
    return render_result(df)


def repl(session, stdin=None, stdout=None, interactive: bool = True,
         one_cmd: str | None = None) -> None:
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    prefix = f"{ENDPOINT}/{session.db or ''}> "
    cont = " " * (len(prefix) - 3) + "-> "
    buf = ""
    while True:
        if one_cmd is not None:
            buf = one_cmd
        else:
            stdout.write(cont if buf else prefix)
            stdout.flush()
            line = stdin.readline()
            if not line:           # EOF
                return
            line = line.rstrip("\n")
            if not line.strip():
                continue
            buf = (buf + "\n" + line) if buf else line
        sql = buf.strip()
        if sql.rstrip(";").lower() in ("quit", "exit"):
            stdout.write("Bye\n")
            return
        if sql.endswith(";") or one_cmd is not None:
            # a pasted line may carry several ';'-separated statements
            # (and --cmd may too) — run each through the session
            from openmldb_spark.sources.session import split_statements
            for stmt in split_statements(sql) or [sql]:
                stdout.write(handle_sql(session, stmt) + "\n")
            buf = ""
            prefix = f"{ENDPOINT}/{session.db or ''}> "
            cont = " " * (len(prefix) - 3) + "-> "
            if one_cmd is not None or not interactive:
                return
        # else: keep accumulating (multi-line statement)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--database", default="")
    ap.add_argument("--cmd", default=None)
    ap.add_argument("--table", action="append", default=[],
                    metavar="NAME=PARQUET_PATH")
    args = ap.parse_args()

    from openmldb_spark.session import get_spark
    from openmldb_spark.sources.session import Session
    spark = get_spark(app_name="openmldb-cli")
    session = Session(spark, db=args.database or None)
    for spec in args.table:
        name, _, path = spec.partition("=")
        session.register(name, spark.read.parquet(path))
    repl(session, one_cmd=args.cmd)


if __name__ == "__main__":
    main()
