"""LAST JOIN — OpenMLDB's point-in-time as-of join.

Semantics (reference: JoinPlan.scala:151-196; docs JOIN_CLAUSE.md):
for each left row, among right rows matching the equi keys and optional
residual condition, keep the single row with the extreme ``order_by`` value
(max when ascending, min when descending); unordered LAST JOIN keeps one
deterministic match. Left rows with no match survive with nulls (left
outer cardinality is always preserved).

Two physical strategies:

- ``last_join`` — join + ranked-dedup. The left gets a unique row id
  (monotonically_increasing_id — same role as the reference's
  zipWithUniqueId, SparkUtil.scala:57-90), joins left-outer, and a
  row_number window over the row id keeps the extreme match. Catalyst
  freely picks broadcast-hash when the right side is small; at 100 TB the
  join shuffles on the equi keys once and the dedup window re-uses that
  partitioning (row id is a salt-free key: no skew because it's unique).
- ``asof_join_kernel`` — range-co-partitioned sort-merge as-of for the
  time-travel case (condition ``right.ts <= left.ts``): cogroup both sides
  on the keys and run ``pandas.merge_asof`` per group. This is the
  shuffle-minimal plan when both sides are huge: one exchange per side,
  no row explosion for hot keys (the joined+dedup plan materializes every
  candidate match; the merge pass is O(n+m) per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from openmldb_spark.plans.specs import LastJoinSpec

_RID = "__l_rid"


def last_join(
    left: DataFrame,
    right: DataFrame,
    spec: LastJoinSpec,
    right_cols: list[str] | None = None,
    broadcast: bool | None = None,
) -> DataFrame:
    """LEFT-cardinality as-of join; right columns appended (prefixed names
    must be pre-aliased by the caller if they collide)."""
    left_on = list(spec.left_on)
    right_on = list(spec.right_on or spec.left_on)
    if not left_on:
        raise ValueError(
            "last_join: left_on must name at least one equi key (for a "
            "pure-residual join, add a constant key column to both sides)")
    if len(left_on) != len(right_on):
        raise ValueError(
            f"last_join: left_on has {len(left_on)} keys but right_on "
            f"has {len(right_on)} — a silent zip would join on fewer "
            f"keys than specified")
    if right_cols is None:
        # default excludes the order column like asof_join_kernel
        # excludes right_ts — it is already carried as __r_ord, and the
        # raw name next to it makes residual conditions ambiguous
        right_cols = [c for c in right.columns
                      if c not in right_on and c != spec.order_by]

    if spec.order_by:
        # the reference rejects float/double/date/smallint LAST JOIN
        # order keys (test_lastjoin_simple.yaml ids 7-9, 28); int32,
        # int64 and timestamp are the sortable key domain
        import pyspark.sql.types as T
        odt = right.schema[spec.order_by].dataType
        if isinstance(odt, (T.FloatType, T.DoubleType, T.DateType,
                            T.StringType, T.BooleanType, T.ShortType,
                            T.ByteType)):
            raise ValueError(
                f"last_join: ORDER BY {spec.order_by!r} has type "
                f"{odt.simpleString()}; the reference requires an "
                f"int/bigint/timestamp order key")

    l = left.withColumn(_RID, F.monotonically_increasing_id())
    r = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in right_on],
        *[F.col(c) for c in right_cols],
        *([F.col(spec.order_by).alias("__r_ord")] if spec.order_by else []),
        *[F.col(c).alias(f"__rt_{c}") for c in spec.tiebreak],
    )
    if broadcast:
        r = F.broadcast(r)

    cond: Column | None = None
    for lc, rc in zip(left_on, right_on):
        # null-safe: a NULL key matches NULL right keys (reference:
        # cases/function/join/test_lastjoin_simple.yaml id 19 expects the
        # null-keyed left row to pick up the null-keyed right row)
        c = l[lc].eqNullSafe(r[f"__r_{rc}"])
        cond = c if cond is None else (cond & c)
    if spec.condition:
        cond = cond & F.expr(spec.condition)

    joined = l.join(r, cond, "left")

    if spec.order_by:
        # null order keys sort as +infinity: an ascending LAST JOIN
        # picks a null-ts right row over real timestamps. Provenance is
        # weak: the pinning case (cases/function/window/test_maxsize.yaml
        # id 23-2) is tagged ["TODO"] (skipped by the reference harness),
        # and the reference's offline JoinPlan reduceByKey would NPE
        # unboxing a null time value — so this is our deliberate choice
        # of a total order, not reference-exercised behavior.
        order = [
            F.col("__r_ord").desc_nulls_first()
            if spec.ascending
            else F.col("__r_ord").asc_nulls_last()
        ]
    else:
        order = []
    # deterministic tie-break (the reference's reduceByKey tie is
    # nondeterministic, JoinPlan.scala:166-188; we pin it)
    order += [F.col(f"__rt_{c}").desc_nulls_last() for c in spec.tiebreak]
    if not order:
        # unordered join with no declared tiebreak: pin determinism on
        # the right VALUE columns (an orderBy(lit(1)) row_number keeps
        # partition-arrival order — different per retry/partitioning).
        # Only ORDERABLE types can participate: a map<..> column in the
        # orderBy raises AnalysisException, so filter those out and fall
        # back to lit(1) if nothing orderable remains (documented
        # residual nondeterminism, same as pre-pinning behavior).
        import pyspark.sql.types as T

        def _orderable(dt) -> bool:
            if isinstance(dt, T.MapType):
                return False
            if isinstance(dt, T.ArrayType):
                return _orderable(dt.elementType)
            if isinstance(dt, T.StructType):
                return all(_orderable(f.dataType) for f in dt.fields)
            return True

        # exact-name lookup first, case-insensitive fallback second —
        # Spark resolves r[c] case-insensitively, so a caller-supplied
        # right_cols=['CFG'] against a 'cfg' column must not KeyError
        # here; a name resolving to nothing is skipped (the select
        # above would already have raised for a truly missing column)
        rschema = {f.name: f.dataType for f in right.schema.fields}
        rschema_ci = {f.name.lower(): f.dataType
                      for f in right.schema.fields}

        def _dt(c):
            return rschema.get(c, rschema_ci.get(c.lower()))

        order = [r[c].desc_nulls_last() for c in right_cols
                 if _dt(c) is not None and _orderable(_dt(c))] \
            or [F.lit(1)]

    w = Window.partitionBy(_RID).orderBy(*order)
    out = (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", _RID, "__r_ord", *[f"__r_{c}" for c in right_on],
              *[f"__rt_{c}" for c in spec.tiebreak])
    )
    return out


def asof_join_kernel(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts_ms",
    right_ts: str = "ts_ms",
    right_cols: list[str] | None = None,
    allow_exact_matches: bool = True,
    num_partitions: int | None = None,
    pre_partitioned: bool = False,
) -> DataFrame:
    """Point-in-time as-of join: newest right row with ts <= left ts per key.

    Implemented as a cogrouped sort-merge pass (applyInPandas over cogroup),
    equivalent to LAST JOIN with condition ``r.ts <= l.ts ORDER BY r.ts``.

    ``pre_partitioned=True``: both sides are already hash-clustered on
    ``on`` with the SAME bucket count (bucketed tables from
    sources/layout.py) — skip the explicit repartitions so the cogroup
    merge runs shuffle-free; Catalyst still inserts exchanges itself if
    the assertion does not hold.
    """
    import pandas as pd
    import pyspark.sql.types as T

    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in on and c != right_ts
        ]
    missing_l = [c for c in [*on, left_ts] if c not in left.columns]
    missing_r = [c for c in [*on, right_ts, *right_cols]
                 if c not in right.columns]
    if missing_l or missing_r:
        raise ValueError(
            f"asof_join_kernel: missing columns left={missing_l} "
            f"right={missing_r}")
    clash = [c for c in right_cols if c in left.columns]
    if clash:
        # merge_asof would suffix the right column and the final select
        # would silently re-pick the LEFT column into the right slot
        raise ValueError(
            f"asof_join_kernel: right_cols {clash} collide with left "
            f"columns — alias them on the right side first")
    # every field nullable: unmatched left rows carry null right columns
    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in left.schema.fields]
        + [T.StructField(c, right.schema[c].dataType, True) for c in right_cols]
    )
    left_cols = list(left.columns)

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(l_pdf) == 0:
            return pd.DataFrame(columns=left_cols + right_cols)
        # null timestamps: merge_asof raises on null merge keys — a
        # null-ts left row is UNMATCHED (like last_join / the SQL
        # lowering), a null-ts right row can never match
        l_null = l_pdf[l_pdf[left_ts].isna()]
        l_pdf = l_pdf[l_pdf[left_ts].notna()]
        r_pdf = r_pdf[r_pdf[right_ts].notna()]

        def unmatched(rows: pd.DataFrame) -> pd.DataFrame:
            res = rows.copy()
            for c in right_cols:
                res[c] = None
            return res

        if len(l_pdf) == 0:
            return unmatched(l_null)
        l_sorted = l_pdf.sort_values(left_ts, kind="stable")
        if len(r_pdf) == 0:
            out = unmatched(l_sorted)
        else:
            # sort equal-ts right rows by their value columns too: with
            # duplicate timestamps merge_asof keeps the LAST sorted row,
            # so the pick is the max value tuple — deterministic across
            # retries/partitionings instead of cogroup arrival order
            try:
                r_sorted = r_pdf.sort_values(
                    [right_ts, *right_cols],
                    kind="stable")[[right_ts] + right_cols]
            except TypeError:   # unsortable value type (array/binary)
                r_sorted = r_pdf.sort_values(
                    right_ts, kind="stable")[[right_ts] + right_cols]
            merged = pd.merge_asof(
                l_sorted,
                r_sorted,
                left_on=left_ts,
                right_on=right_ts,
                direction="backward",
                allow_exact_matches=allow_exact_matches,
                suffixes=("", "__r"),
            )
            out = merged[left_cols + right_cols]
        if len(l_null):
            out = pd.concat([out, unmatched(l_null)], ignore_index=True)
        return out

    # explicit partition count: AQE size-based coalescing would serialize
    # the per-group Python merge (see window.py kernel note)
    if pre_partitioned:
        lg, rg = left, right
    else:
        if num_partitions is None:
            num_partitions = \
                left.sparkSession.sparkContext.defaultParallelism
        lg = left.repartition(num_partitions, *on)
        rg = right.repartition(num_partitions, *on)
    return lg.groupBy(*on).cogroup(rg.groupBy(*on)).applyInPandas(
        merge, schema=out_schema
    )
