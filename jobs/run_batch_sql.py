#!/usr/bin/env python
"""Offline SQL-script job for spark-submit — the Python twin of the
reference task manager's batchjob mains
(java/openmldb-batchjob/.../RunBatchSql.scala, ImportOfflineData.scala,
ExportOfflineData.scala: each reads one SQL file into an
OpenmldbSession, runs it, and `.show()`s the result). One main covers
all three job kinds because imports (LOAD DATA INFILE) and exports
(SELECT INTO OUTFILE) are statements of the same script language.

    zip -r /tmp/engine.zip openmldb_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        jobs/run_batch_sql.py --sql-file script.sql \
        [--db main] [--table name=path.parquet ...] [--show-rows 20]

Pre-registers each --table parquet as a table of --db (how offline
data reaches a cluster job), executes every ';'-separated statement,
`.show()`s the final query result, and emits ONE machine-readable JSON
line: {"rows": N, "columns": [...]} (rows = -1 when the script ends on
a command).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmldb_spark.session import get_spark  # noqa: E402
from openmldb_spark.sources.session import (Session,  # noqa: E402
                                            execute_script)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sql-file", required=True)
    ap.add_argument("--db", default="main")
    ap.add_argument("--table", action="append", default=[],
                    metavar="NAME=PARQUET_PATH")
    ap.add_argument("--show-rows", type=int, default=20)
    args = ap.parse_args()

    spark = get_spark(app_name="openmldb-run-batch-sql")
    sess = Session(spark, db=args.db)
    for spec in args.table:
        name, _, path = spec.partition("=")
        sess.register(name, spark.read.parquet(path))

    with open(args.sql_file) as f:
        text = f.read()
    out = execute_script(sess, text)
    if out is not None:
        # cache before the two actions — without it the script's final
        # (usually heaviest) query would execute twice, once for the
        # preview and again for the count
        out = out.persist()
        out.show(args.show_rows, truncate=False)
        print(json.dumps({"rows": out.count(),
                          "columns": list(out.columns)}))
    else:
        print(json.dumps({"rows": -1, "columns": []}))


if __name__ == "__main__":
    main()
