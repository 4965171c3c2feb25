"""Sources & sinks — the LOAD DATA / SELECT INTO surface.

Reference semantics (/root/reference/java/openmldb-batch/src/main/scala/
com/_4paradigm/openmldb/batch/nodes/LoadDataPlan.scala:30-127,
SelectIntoPlan.scala:27-46; format whitelist HybridseUtil.scala:193-194):

- LOAD DATA INFILE '<path>' INTO TABLE t OPTIONS(format, header, delim,
  null_value, mode, deep_copy):
  * deep copy → read source, rewrite as parquet under the offline
    prefix, register that path (the table owns its data);
  * soft copy → register the source path + format directly (no rewrite).
- SELECT INTO OUTFILE: write a query result with format/options/mode.
- Formats restricted to csv & parquet (we add iceberg-style partitioned
  parquet since the target deployment is an Iceberg lakehouse).

The catalog here is a plain dict {name: (path, format, options)} —
cluster deployments swap in a real metastore/Iceberg catalog; operators
only ever see DataFrames.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.types as T

FORMATS = ("csv", "parquet")


@dataclass
class OfflineTableInfo:
    """Analog of the reference's OfflineTableInfo (LoadDataPlan.scala:66-117)."""
    name: str
    path: str
    fmt: str = "parquet"
    options: dict = field(default_factory=dict)
    deep_copy: bool = True


class Catalog:
    def __init__(self, spark: SparkSession, offline_prefix: str):
        self.spark = spark
        self.offline_prefix = offline_prefix
        self.tables: dict[str, OfflineTableInfo] = {}

    def load_data(
        self,
        name: str,
        path: str,
        fmt: str = "csv",
        schema: T.StructType | str | None = None,
        options: dict | None = None,
        mode: str = "overwrite",
        deep_copy: bool = True,
        partition_by: list[str] | None = None,
    ) -> OfflineTableInfo:
        """LOAD DATA INFILE → registered offline table."""
        fmt = fmt.lower()
        if fmt not in FORMATS:
            raise ValueError(f"format {fmt!r} not in {FORMATS} "
                             "(HybridseUtil.scala:193-194)")
        opts = dict(options or {})
        if fmt == "csv":
            opts.setdefault("header", "true")
            opts.setdefault("nullValue", "null")
        reader = self.spark.read.format(fmt).options(**opts)
        if schema is not None:
            reader = reader.schema(schema)
        elif fmt == "csv":
            reader = reader.option("inferSchema", "true")
        df = reader.load(path)

        if deep_copy:
            dest = os.path.join(self.offline_prefix, name)
            w = df.write.mode(mode)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(dest)
            info = OfflineTableInfo(name, dest, "parquet", {}, True)
        else:
            info = OfflineTableInfo(name, path, fmt, opts, False)
        self.tables[name] = info
        return info

    def table(self, name: str) -> DataFrame:
        """DataProvider: resolve a registered table to a DataFrame
        (DataProviderPlan.scala:27-38)."""
        info = self.tables[name]
        return (
            self.spark.read.format(info.fmt).options(**info.options)
            .load(info.path)
        )

    def register_df(self, name: str, df: DataFrame,
                    partition_by: list[str] | None = None) -> OfflineTableInfo:
        dest = os.path.join(self.offline_prefix, name)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(dest)
        info = OfflineTableInfo(name, dest, "parquet", {}, True)
        self.tables[name] = info
        return info


def select_into(
    df: DataFrame,
    path: str,
    fmt: str = "csv",
    options: dict | None = None,
    mode: str = "error",
    partition_by: list[str] | None = None,
) -> None:
    """SELECT ... INTO OUTFILE (SelectIntoPlan.scala:27-46)."""
    fmt = fmt.lower()
    if fmt not in FORMATS:
        raise ValueError(f"format {fmt!r} not in {FORMATS}")
    opts = dict(options or {})
    if fmt == "csv":
        opts.setdefault("header", "true")
    w = df.write.format(fmt).options(**opts).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
