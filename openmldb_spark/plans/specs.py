"""Feature-spec dataclasses — the logical plan surface of the engine.

These mirror OpenMLDB's SQL WINDOW / LAST JOIN clauses (reference grammar:
/root/reference/docs/zh/reference/sql/dql/WINDOW_CLAUSE.md,
JOIN_CLAUSE.md; physical nodes /root/reference/hybridse/include/vm/physical_op.h)
but are plain Python objects; the planner lowers them to DataFrame transforms
and Arrow kernels.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_TIME_RE = re.compile(r"^\s*(-?\d+)\s*(ms|s|m|h|d)?\s*$", re.IGNORECASE)
_UNIT_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000, None: 1}


def parse_time_ms(v) -> int:
    """'10s' / '5m' / '2h' / '1d' / '1500ms' / bare int (= ms) → milliseconds.

    Matches OpenMLDB interval literals (WINDOW_CLAUSE.md:118-139); a bare
    number in a ROWS_RANGE bound is in the order-key unit (ms).
    """
    if isinstance(v, (int, float)):
        # reject lossy fractions instead of truncating (0.5 -> 0 would
        # silently change the frame width; the string form '0.5s'
        # already raises)
        if int(v) != v:
            raise ValueError(f"fractional time value {v!r} (pass whole "
                             f"milliseconds or a unit literal)")
        return int(v)
    m = _TIME_RE.match(str(v))
    if not m:
        raise ValueError(f"bad time literal: {v!r}")
    return int(m.group(1)) * _UNIT_MS[(m.group(2) or "").lower() or None]


# Aggregate functions the window kernel understands.
KERNEL_AGG_FUNCS = {
    "sum", "count", "avg", "min", "max", "distinct_count",
    "sum_where", "count_where", "avg_where", "min_where", "max_where",
    "lag", "at", "first_value",
    "top", "top_n_frequency", "top1_ratio",
    "sum_cate", "count_cate", "avg_cate", "min_cate", "max_cate",
    "sum_cate_where", "count_cate_where", "avg_cate_where",
    "min_cate_where", "max_cate_where",
    "top_n_key_sum_cate_where", "top_n_key_count_cate_where",
    "top_n_key_avg_cate_where", "top_n_key_min_cate_where",
    "top_n_key_max_cate_where",
    "window_split", "window_split_by_key", "window_split_by_value",
}

# Subset expressible directly with pyspark.sql.Window (the built-in tier).
BUILTIN_AGG_FUNCS = {"sum", "count", "avg", "min", "max", "lag", "first_value",
                     "distinct_count", "sum_where", "count_where", "avg_where",
                     "min_where", "max_where"}


@dataclass(frozen=True)
class Agg:
    """One window aggregate: func(col) AS alias.

    - ``lag``/``at``: ``param`` = offset k; frame-scoped, newest-first
      (window_functions_def.cc:96-157; lag is an alias of at).
    - ``first_value``: value of the *newest* frame row (= at(col, 0);
      verified against cases/function/window/test_window.yaml:1027-1140).
    - ``top`` / ``top_n_frequency``: ``param`` = k, emits csv string
      (default_udf_library.cc:2389-2414, feature_zero_def.cc:659-665).
    - ``*_where``: ``cond`` = name of a boolean column (pre-computed with
      ordinary Spark expressions before the kernel runs).
    - ``*_cate`` : ``cate`` = name of the categorical key column; emits
      "k1:v1,k2:v2" sorted by key (udaf_def *_by_category_def.cc).
    """

    func: str
    col: str
    alias: str
    # int k for lag/at/top/top_n_frequency; for window_split* it carries
    # the composite mode: None = fz_join csv, "count"/"distinct_count"
    param: int | str | None = None
    cond: str | None = None
    cate: str | None = None
    # anchor-relative *_where condition (cases/function/function/
    # test_udaf_function.yaml ids 47-49: ``count_where(id, c1 =
    # lag(c1, 0))``): the condition is ``cond == cond_anchor-at-the-
    # anchor-row`` — frame rows whose ``cond`` value equals the anchor
    # row's ``cond_anchor`` value. lag(x, 0)/at(x, 0) always denote the
    # anchor row; first_value(x) does only when the frame ends at
    # CURRENT ROW (cond_anchor_fv marks that requirement).
    cond_anchor: str | None = None
    cond_anchor_fv: bool = False
    delim: str | None = None      # window_split*: row delimiter
    kv_delim: str | None = None   # window_split_by_{key,value}
    sep: str = ","                # output join separator (fz_join)
    # logical input types for csv-emitting UDAFs (top / *_cate /
    # top_n_frequency): the reference formats by the column's LOGICAL
    # type (ints %lld, float/double %f, timestamp "%Y-%m-%d %H:%M:%S"
    # at UTC+8 — udf.cc format_string specializations), which the kernel
    # cannot recover from pandas dtypes alone. window_agg fills these
    # from the Spark schema; None keeps the generic repr formatting.
    val_type: str | None = None   # logical type of `col`
    cate_type: str | None = None  # logical type of `cate`

    def __post_init__(self):
        if self.func not in KERNEL_AGG_FUNCS:
            raise ValueError(f"unknown window agg func: {self.func}")


@dataclass(frozen=True)
class WindowSpec:
    """OpenMLDB window clause.

    frame: 'rows' | 'rows_range' | 'rows_merge_rows_range'
    preceding/end_offset: row counts for 'rows'; time literals (ms) for
    'rows_range'. For the merged frame both rows_preceding and preceding
    (time) apply: the frame expires by time but always keeps at least
    rows_preceding+1 rows (mem_catalog.h:328-354, BufferEffectiveWindow).
    Frames are history-only (FOLLOWING unsupported, sql_node.h:1242-1288).
    """

    partition_by: tuple[str, ...] | list[str]
    order_by: str = "ts_ms"          # int64 ms order key column
    frame: str = "rows_range"
    preceding: object = 0            # rows count or time literal
    end_offset: object = 0           # 0 = CURRENT ROW
    rows_preceding: int = 0          # only for rows_merge_rows_range
    start_open: bool = False         # OPEN modifier on start bound
    end_open: bool = False           # OPEN modifier on end bound
    max_size: int = 0                # MAXSIZE (0 = unlimited)
    exclude_current_time: bool = False
    instance_not_in_window: bool = False
    tiebreak: tuple[str, ...] = ()   # stable intra-ts ordering (e.g. turn_idx)

    def __post_init__(self):
        if self.frame not in ("rows", "rows_range", "rows_merge_rows_range"):
            raise ValueError(f"bad frame type: {self.frame}")

    @property
    def start_delta(self) -> int:
        """Frame start offset: row count (rows) or ms (range frames).

        Negative offsets (FOLLOWING-ish bounds) clamp to 0 — frames are
        history-only (sql_node.h:1242-1288)."""
        if self.frame == "rows":
            return max(0, int(self.preceding))
        return max(0, parse_time_ms(self.preceding))

    @property
    def end_delta(self) -> int:
        if self.frame == "rows":
            return max(0, int(self.end_offset))
        return max(0, parse_time_ms(self.end_offset))


@dataclass(frozen=True)
class LastJoinSpec:
    """LAST JOIN (JoinPlan.scala:151-196; docs JOIN_CLAUSE.md).

    For each left row, among right rows satisfying the equi keys + optional
    residual condition, keep the one with the extreme ``order_by`` value
    (max when ascending — the 'last'); unordered keeps one deterministic
    match. Ties broken by ``tiebreak`` columns descending (the reference's
    reduceByKey tie is nondeterministic; we pin it).
    """

    left_on: tuple[str, ...] | list[str]
    right_on: tuple[str, ...] | list[str] | None = None
    order_by: str | None = None      # right-side column; None = unordered
    ascending: bool = True
    condition: str | None = None     # residual SQL expression (l./r. prefixes resolved by caller)
    tiebreak: tuple[str, ...] = ()


@dataclass(frozen=True)
class SessionizeSpec:
    """ts-gap sessionization (our extension; reference has no session op)."""

    partition_by: tuple[str, ...] | list[str]
    order_by: str = "ts_ms"
    gap_ms: object = "30m"
    session_col: str = "session_id"

    @property
    def gap(self) -> int:
        return parse_time_ms(self.gap_ms)
