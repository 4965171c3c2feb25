"""SQLAlchemy dialect twin over the PEP-249 driver (``dbapi.py``).

Reference surface: ``python/openmldb/sqlalchemy_openmldb/
openmldb_dialect.py`` (127 lines: a DefaultDialect over the reference
DBAPI with a backtick IdentifierPreparer, ``has_table`` via the
cursor's ``get_all_tables()``, and ``create_connect_args`` that maps
``openmldb:///db?zk=..&zkPath=..`` onto the DBAPI ``connect`` kwargs).
Our twin keeps that shape with the Spark-backed driver underneath:
URLs look like ``openmldb_spark:///my_db``; the Spark session cannot
ride in a URL string, so it is supplied process-wide via
``set_default_spark`` (or a session is created on demand by
``openmldb_spark.session.get_spark``).

sqlalchemy is OPTIONAL — this container does not ship it, so every
sqlalchemy-touching definition is gated behind an import-try (the
build-brief rule for absent libraries) and the glue that does not need
the library (URL → connect-kwargs mapping, the default-session
registry) is plain Python, tested ungated. ``pandas.read_sql`` does not
need the dialect at all: it accepts the raw DBAPI connection, which is
the tested no-sqlalchemy path.
"""

from __future__ import annotations

_DEFAULT_SPARK = []     # 0 or 1 live SparkSession, set_default_spark


def set_default_spark(spark) -> None:
    """Register the SparkSession the dialect's connections will use.

    SQLAlchemy drives ``connect()`` purely from URL-derived kwargs, and
    a live session can't be encoded in a URL — so the engine-level hook
    is a module registry (mirrors how the reference dialect reaches its
    cluster through module state rather than per-call wiring)."""
    _DEFAULT_SPARK.clear()
    _DEFAULT_SPARK.append(spark)


def _resolve_spark():
    if _DEFAULT_SPARK:
        return _DEFAULT_SPARK[0]
    from openmldb_spark.session import get_spark
    return get_spark()


_CONNECT_URL_KEYS = {"zk", "zkPath", "host", "port"}


def connect_args_from_url(database: str | None,
                          query: dict | None) -> tuple[tuple, dict]:
    """URL pieces → DBAPI connect args; the reference's
    create_connect_args body (openmldb_dialect.py:119-127) minus the
    sqlalchemy URL object, so it is testable without the library.
    zk/zkPath/host/port survive pass-through (accepted and unused by
    our driver, same as the reference signature contract); any other
    query key is rejected HERE with a clear message — forwarding it
    would surface as a raw TypeError from connect()'s fixed signature
    at first engine use."""
    qargs: dict = {"db": database or "default_db"}
    extra = sorted(set(query or ()) - _CONNECT_URL_KEYS)
    if extra:
        raise ValueError(
            f"unsupported connection URL parameter(s) {extra}; "
            f"this dialect accepts {sorted(_CONNECT_URL_KEYS)}")
    qargs.update(query or {})
    return (), qargs


def _dbapi_module():
    from openmldb_spark import dbapi as module

    class _Bound:
        """dbapi module facade that injects the registered Spark
        session into connect() — everything else passes through."""
        Error = module.Error
        DatabaseError = module.DatabaseError
        paramstyle = getattr(module, "paramstyle", "qmark")
        apilevel = getattr(module, "apilevel", "2.0")
        threadsafety = getattr(module, "threadsafety", 1)

        @staticmethod
        def connect(*args, **kwargs):
            kwargs.setdefault("spark", _resolve_spark())
            return module.connect(*args, **kwargs)

    return _Bound


try:
    from sqlalchemy import pool
    from sqlalchemy.engine import default
    from sqlalchemy.sql import compiler
    HAVE_SQLALCHEMY = True
except ImportError:                       # pragma: no cover - env-dependent
    HAVE_SQLALCHEMY = False


if HAVE_SQLALCHEMY:

    class OpenmldbSparkIdentifierPreparer(compiler.IdentifierPreparer):
        # backtick quoting, like the reference preparer
        # (openmldb_dialect.py:100-102)
        def __init__(self, dialect):
            super().__init__(dialect, initial_quote="`", final_quote="`")

    class OpenmldbSparkDialect(default.DefaultDialect):
        name = "openmldb_spark"
        driver = "spark"
        paramstyle = "qmark"
        preparer = OpenmldbSparkIdentifierPreparer
        poolclass = pool.SingletonThreadPool
        supports_statement_cache = False
        supports_sane_rowcount = False
        supports_native_boolean = True

        @classmethod
        def import_dbapi(cls):            # SQLAlchemy >= 2.0 hook
            return _dbapi_module()

        @classmethod
        def dbapi(cls):                   # SQLAlchemy 1.x hook
            return _dbapi_module()

        def create_connect_args(self, url, **kwargs):
            return connect_args_from_url(url.database, dict(url.query))

        def has_table(self, connection, table_name, schema=None, **kw):
            if schema is not None:
                # reference: "schema unsupported in OpenMLDB"
                raise NotImplementedError("schema unsupported in OpenMLDB")
            return table_name in \
                connection.connection.cursor().get_all_tables()

        def get_table_names(self, connection, schema=None, **kw):
            cur = connection.connection.cursor()
            if schema is not None:
                return cur.get_tables(schema)
            return cur.get_all_tables()

        def get_schema_names(self, connection, **kw):
            return connection.connection.cursor().get_databases()

        def get_columns(self, connection, table_name, schema=None, **kw):
            import sqlalchemy.types as sqltypes
            rows = connection.connection.cursor().execute(
                f"desc {table_name}").fetchall()
            typemap = {
                "int": sqltypes.Integer, "bigint": sqltypes.BigInteger,
                "smallint": sqltypes.SmallInteger,
                "float": sqltypes.Float, "double": sqltypes.Float,
                "string": sqltypes.String, "boolean": sqltypes.Boolean,
                "timestamp": sqltypes.TIMESTAMP, "date": sqltypes.Date,
            }
            return [
                {"name": r[0],
                 "type": typemap.get(str(r[1]).lower(), sqltypes.String)(),
                 "nullable": str(r[2]).upper() == "YES",
                 "default": None}
                for r in rows
            ]

        def do_rollback(self, dbapi_connection):
            # the engine is autocommit (reference Connection.rollback
            # is a no-op too)
            pass

    def register_dialect() -> None:
        """Make ``create_engine("openmldb_spark:///db")`` resolve."""
        from sqlalchemy.dialects import registry
        registry.register("openmldb_spark",
                          "openmldb_spark.sqlalchemy_openmldb",
                          "OpenmldbSparkDialect")

else:                                     # pragma: no cover - env-dependent

    def register_dialect() -> None:
        raise ImportError(
            "sqlalchemy is not installed; the openmldb_spark dialect "
            "needs it. pandas.read_sql works without it by passing the "
            "DBAPI connection from openmldb_spark.dbapi.connect().")
