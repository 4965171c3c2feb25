"""Stateful multi-database statement session — the surface a reference
CLI/SDK user drives day-to-day, over the batch engine.

Mirrors the reference SDK's command dispatch
(src/sdk/sql_cluster_router.cc:1528-1830 HandleSQLCmd: kCmdCreateDatabase /
kCmdUseDatabase / kCmdDropDatabase / kCmdShowDatabases / kCmdShowTables /
kCmdDropTable / kCmdDropIndex) with the nameserver's catalog semantics
(src/nameserver/name_server_impl.cc:9596 "database already exists",
:9659-9674 "database not found" / "database not empty" on drop):

- databases are namespaces of tables; ``USE`` selects the session
  default; bare table names resolve there, ``db.table`` anywhere.
- ``DROP DATABASE`` refuses a non-empty database (the reference never
  cascades).
- everything that isn't a session/catalog command delegates to the
  statement front end (sources/io.py run_statement) scoped to the
  current database, or — for queries — to run_sql over the full dotted
  ``db.table`` catalog with ``default_db`` = the current database, so
  cross-database SELECT / LAST JOIN works exactly like
  cases/function/multiple_databases.

State is driver-side dict-of-DataFrames bookkeeping only — table data
stays lazy/distributed; nothing here adds a Spark action.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from openmldb_spark.sources.ddl import DdlError


class Session:
    """One interactive session: ``execute()`` any statement string."""

    def __init__(self, spark, db: str | None = None):
        self.spark = spark
        self._dbs: dict[str, dict[str, DataFrame]] = {}
        self._catalogs: dict[str, dict[str, list]] = {}
        self.deployments: dict = {}
        self.procedures: dict = {}
        self.db: str | None = None
        if db:
            self.create_database(db)
            self.db = db

    # ------------------------------------------------------------------
    # catalog primitives (also the Python-API surface)
    def create_database(self, name: str, if_not_exists: bool = False):
        if name in self._dbs:
            if if_not_exists:
                return
            raise DdlError("database already exists")
        self._dbs[name] = {}
        self._catalogs[name] = {}

    def use(self, name: str):
        if name not in self._dbs:
            raise DdlError("database not found")
        self.db = name

    def drop_database(self, name: str, if_exists: bool = False):
        if name not in self._dbs:
            if if_exists:
                return
            raise DdlError("database not found")
        if self._dbs[name]:
            raise DdlError("database not empty")
        del self._dbs[name]
        del self._catalogs[name]
        if self.db == name:
            self.db = None

    def register(self, name: str, df: DataFrame, db: str | None = None):
        """Bind an existing DataFrame as a table (the programmatic
        analog of LOAD DATA — how parquet-backed tables enter)."""
        self._dbs[self._db_of(db)][name] = df

    def table(self, name: str, db: str | None = None) -> DataFrame:
        tabs = self._dbs[self._db_of(db)]
        if name not in tabs:
            raise DdlError(f"table {name!r} does not exist")
        return tabs[name]

    def _db_of(self, db: str | None) -> str:
        db = db or self.db
        if db is None:
            raise DdlError("no database selected (USE a database first)")
        if db not in self._dbs:
            raise DdlError("database not found")
        return db

    def _dotted(self) -> dict[str, DataFrame]:
        return {f"{db}.{name}": df
                for db, tabs in self._dbs.items()
                for name, df in tabs.items()}

    # ------------------------------------------------------------------
    def execute(self, stmt: str, params=None, path_resolver=None):
        """Run one statement; returns a DataFrame for queries/SHOWs,
        None for commands (reference CLI contract)."""
        s = stmt.strip().rstrip(";").strip()

        m = re.match(r"(?is)^create\s+database\s+(?:(if\s+not\s+exists)"
                     r"\s+)?([`\w]+)$", s)
        if m:
            self.create_database(m.group(2).strip("`"), bool(m.group(1)))
            return None
        m = re.match(r"(?is)^use\s+([`\w]+)$", s)
        if m:
            self.use(m.group(1).strip("`"))
            return None
        m = re.match(r"(?is)^drop\s+database\s+(?:(if\s+exists)\s+)?"
                     r"([`\w]+)$", s)
        if m:
            self.drop_database(m.group(2).strip("`"), bool(m.group(1)))
            return None
        if re.match(r"(?is)^show\s+databases$", s):
            names = sorted(self._dbs)
            return self.spark.createDataFrame(
                [(n,) for n in names], "Databases string")
        if re.match(r"(?is)^show\s+tables$", s):
            names = sorted(self._dbs[self._db_of(None)])
            return self.spark.createDataFrame(
                [(n,) for n in names], "Tables string")
        m = re.match(r"(?is)^drop\s+table\s+(?:(if\s+exists)\s+)?"
                     r"(?:([`\w]+)\s*\.\s*)?([`\w]+)$", s)
        if m:
            if_exists, db, name = (bool(m.group(1)),
                                   m.group(2) and m.group(2).strip("`"),
                                   m.group(3).strip("`"))
            tabs = self._dbs[self._db_of(db)]
            if name not in tabs:
                if if_exists:
                    return None
                raise DdlError(f"table {name!r} does not exist")
            del tabs[name]
            self._catalogs[self._db_of(db)].pop(name, None)
            return None
        m = re.match(r"(?is)^drop\s+index\s+(?:([`\w]+)\s*\.\s*)?"
                     r"([`\w]+)\s*\.\s*([`\w]+)$", s)
        if m:
            db, tname, iname = (m.group(1) and m.group(1).strip("`"),
                                m.group(2).strip("`"),
                                m.group(3).strip("`"))
            cat = self._catalogs[self._db_of(db)]
            entries = cat.get(tname, [])
            kept = [e for e in entries if e.get("name") != iname]
            if len(kept) == len(entries):
                raise DdlError(f"index {iname!r} on {tname!r} "
                               f"does not exist")
            cat[tname] = kept
            return None

        m = re.match(r"(?is)^explain\s+(.*)$", s, re.DOTALL)
        if m:
            # reference EXPLAIN (cases/plan/cmd.yaml id 7) prints the
            # engine's physical plan; ours is Catalyst's formatted plan
            # (documented divergence in rendering, same contract)
            from openmldb_spark.sqlfe import run_sql
            df = run_sql(self.spark, m.group(1), self._dotted(),
                         params=params, default_db=self.db)
            plan = df._jdf.queryExecution().explainString(
                self.spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            return self.spark.createDataFrame(
                [(plan,)], "plan string")

        # everything else: the statement front end, scoped to the
        # current database; pure queries see the whole dotted catalog
        from openmldb_spark.sources.io import run_statement
        from openmldb_spark.sqlfe import run_sql
        head = s[:24].lower()
        is_stmt = head.startswith((
            "create", "insert", "desc", "deploy", "show", "drop",
            "load")) or re.match(r"(?is)^select\b.*\binto\s+outfile\b",
                                 s) is not None
        if is_stmt:
            db = self._db_of(None)
            return run_statement(
                self.spark, stmt, self._dbs[db],
                path_resolver=path_resolver, params=params,
                catalog=self._catalogs[db],
                deployments=self.deployments,
                procedures=self.procedures, db=db)
        return run_sql(self.spark, stmt, self._dotted(), params=params,
                       default_db=self.db)
