"""Plan inspection utilities — the engine's analog of the reference's
debug hooks (SparkPlanner per-node df.show / graphviz plans,
SparkPlanner.scala:279-282,95-98), built on Catalyst explain output.

`plan_stats` gives the numbers that matter at 100 TB: how many
exchanges (shuffles), whether Python stages appear, whether filters
reached the scan — the quantities the plan-audit tests assert.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


@dataclass
class PlanStats:
    exchanges: int
    broadcast_exchanges: int
    pandas_stages: int
    scans: int
    pushed_filters: list[str]
    wholestage_codegen: bool

    def summary(self) -> str:
        return (
            f"shuffles={self.exchanges} broadcasts={self.broadcast_exchanges} "
            f"python_stages={self.pandas_stages} scans={self.scans} "
            f"codegen={self.wholestage_codegen} "
            f"pushed={len(self.pushed_filters)}"
        )


def plan_stats(df: DataFrame) -> PlanStats:
    simple = explain_str(df, "simple")
    formatted = explain_str(df, "formatted")
    return PlanStats(
        exchanges=simple.count("Exchange hashpartitioning")
        + simple.count("Exchange rangepartitioning"),
        broadcast_exchanges=simple.count("BroadcastExchange"),
        pandas_stages=sum(simple.count(s) for s in
                          ("FlatMapGroupsInPandas", "MapInPandas",
                           "FlatMapCoGroupsInPandas", "ArrowEvalPython")),
        scans=simple.count("FileScan") + simple.count("Scan parquet"),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", formatted),
        wholestage_codegen="WholeStageCodegen" in explain_str(df, "simple")
        or "*(" in simple,
    )
