"""Request-mode analog — point-in-time features for specific anchor rows.

OpenMLDB's online path answers "give me the feature vector for THIS row
now": kRunnerRequestUnion merges the request row with index-scanned
history and runs the same window logic over the merged buffer, emitting
only the request row (/root/reference/hybridse/src/vm/runner.h:326-351,
engine.h:239-272). Batch/online consistency holds because both modes
derive from one logical plan.

Our engine gets the same guarantee from the same mechanism: request rows
are the PRIMARY table of a WINDOW UNION whose union side is the history
table — primary rows emit, history only buffers (WindowAggPlanUtil.
windowUnionTables, SURVEY.md §2.5). No new kernel semantics: request
mode IS window-union backfill with a tiny primary side.

At scale this is the backfill-vs-serve trade: a small request batch
broadcasts nothing, shuffles only (request ∪ relevant-history) on the
key, and history can be pre-pruned by ``history_horizon_ms`` (the frame
depth) before the shuffle — Catalyst pushes that filter to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from openmldb_spark.plans.specs import Agg, WindowSpec
from openmldb_spark.operators.window import _order_col, window_agg


def request_features(
    requests: DataFrame,
    history: DataFrame,
    spec: WindowSpec,
    aggs: list[Agg],
    keep_cols: list[str] | None = None,
    prune_history: bool = True,
) -> DataFrame:
    """One output row per request row; frames read only history rows with
    order key ≤ the request's (plus the request row itself).

    ``requests`` and ``history`` share the schema columns referenced by
    the spec/aggs. Each request sees ONLY history plus itself — other
    request rows in the same batch never enter its frame (OpenMLDB
    request semantics: each RequestRunSession reads stored state, not
    fellow requests). That is precisely INSTANCE_NOT_IN_WINDOW: primary
    rows don't buffer, the anchor still joins its own frame — so the
    flag is forced here.
    """
    import dataclasses
    spec = dataclasses.replace(spec, instance_not_in_window=True)
    hist = history
    if prune_history and spec.frame != "rows":
        # history older than (max request ts - frame depth) can never
        # enter any frame: push the bound to the scan
        ordc = _order_col(requests, spec.order_by)
        bounds = requests.agg(
            F.max(ordc).alias("mx"), F.min(ordc).alias("mn")).first()
        if bounds.mx is not None:
            lo = bounds.mn - spec.start_delta
            h_ord = _order_col(history, spec.order_by)
            hist = history.where((h_ord >= lo) & (h_ord <= bounds.mx))

    return window_agg(requests, spec, aggs, keep_cols=keep_cols,
                      union=[hist], tier="kernel")
