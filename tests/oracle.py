"""Slow, obviously-correct pure-Python window oracle for property tests.

Implements the OpenMLDB HistoryWindow semantics row-at-a-time, exactly as
described in SURVEY.md §2.5, independent of the vectorized kernel.
"""

from __future__ import annotations

import math


def frame_rows(rows, i, spec):
    """rows: list of dicts sorted in buffer order; returns list of indices in
    frame for emit row i (newest last)."""
    ts_i = rows[i]["__ord"]
    # eligible buffer = rows before i (+ i itself) that may buffer
    def elig(j):
        if spec.instance_not_in_window and rows[j]["__primary"] == 1:
            return False
        return True

    end_delta = spec.end_delta
    at_current = end_delta == 0 and not spec.end_open
    buf = [j for j in range(i) if elig(j)]

    anchor = None
    if at_current:
        if spec.exclude_current_time:
            buf = [j for j in buf if rows[j]["__ord"] < ts_i]
            anchor = i
        else:
            if elig(i):
                buf = buf + [i]
            else:
                anchor = i
    else:
        if elig(i):
            buf = buf + [i]

    # apply end bound (OPEN on a rows bound excludes that end's row)
    if not at_current:
        if spec.frame == "rows":
            end_delta = end_delta + (1 if spec.end_open else 0)
            buf = buf[: len(buf) - end_delta] if end_delta <= len(buf) else []
        else:
            if spec.end_open:
                buf = [j for j in buf if rows[j]["__ord"] < ts_i - end_delta]
            else:
                buf = [j for j in buf if rows[j]["__ord"] <= ts_i - end_delta]
        anchor = None

    # apply start bound
    if spec.frame == "rows":
        total = spec.start_delta + 1 - (1 if anchor is not None else 0) - (
            (spec.end_delta + (1 if spec.end_open else 0))
            if not at_current else 0
        ) - (1 if spec.start_open else 0)
        buf = buf[-total:] if total > 0 else []
    else:
        if spec.start_open:
            buf = [j for j in buf if rows[j]["__ord"] > ts_i - spec.start_delta]
        else:
            buf = [j for j in buf if rows[j]["__ord"] >= ts_i - spec.start_delta]
        if spec.frame == "rows_merge_rows_range":
            min_keep = spec.rows_preceding + 1 - (1 if anchor is not None else 0)
            full = [j for j in ([jj for jj in range(i) if elig(jj)] +
                                ([i] if (at_current and elig(i)) else []))
                    if True]
            if at_current and spec.exclude_current_time:
                full = [j for j in full if rows[j]["__ord"] < ts_i or j == i]
            if len(buf) < min_keep:
                buf = full[-min_keep:]

    if spec.max_size and spec.max_size > 0:
        keep = spec.max_size - (1 if anchor is not None else 0)
        buf = buf[-keep:] if keep > 0 else []

    if anchor is not None:
        buf = buf + [anchor]
    return buf


def oracle_agg(rows, i, spec, func, col, param=None, cond=None, cate=None):
    fr = frame_rows(rows, i, spec)
    vals = [rows[j][col] for j in fr]

    if func == "first_value":
        # newest FRAME row (frame-bound — OpenMLDB#1587,
        # test_window.yaml id 33)
        return rows[fr[-1]][col] if fr else None

    if func in ("lag", "at"):
        # k-th row back from the CURRENT row's position in the
        # partition-ordered buffer, bounded by the partition start and
        # MAXSIZE only — the declared frame does NOT bound it
        # (test_udaf_function.yaml ids 57-60, issue #1554), and
        # end-bound exclusions do not shift the anchor
        # (test_window.yaml ids 36-37, test_window_union.yaml id 19)
        k = int(param or 0)

        def elig(j):
            return not (spec.instance_not_in_window
                        and rows[j]["__primary"] == 1)

        if k == 0:
            return rows[i][col]
        if getattr(spec, "exclude_current_time", False):
            # same-ts rows are not buffered: count back from the first
            # row with ts strictly below the anchor's (ids 18-4/18-5)
            elig_idx = [j for j in range(i + 1)
                        if elig(j) and rows[j]["__ord"] < rows[i]["__ord"]]
            buf_end = len(elig_idx) + 1       # + the current row
            pos = len(elig_idx) - k
        else:
            selfe = 1 if elig(i) else 0
            elig_idx = [j for j in range(i + 1) if elig(j)]
            pe = len(elig_idx) - selfe
            buf_end = pe + selfe
            pos = pe - k
        if pos < 0 or pos >= buf_end or pos >= len(elig_idx):
            return None
        if spec.max_size and spec.max_size > 0 \
                and pos < buf_end - spec.max_size:
            return None
        return rows[elig_idx[pos]][col]

    if cond is not None:
        vals = [v for v, j in zip(vals, fr) if rows[j][cond]]
    nn = [v for v in vals if v is not None and not (
        isinstance(v, float) and math.isnan(v))]
    if func in ("sum", "sum_where"):
        # OpenMLDB sum: const_init(0), empty/all-null frame -> 0
        return sum(nn) if nn else 0
    if func in ("count", "count_where"):
        return len(nn)
    if func in ("avg", "avg_where"):
        return sum(nn) / len(nn) if nn else None
    if func in ("min", "min_where"):
        return min(nn) if nn else None
    if func in ("max", "max_where"):
        return max(nn) if nn else None
    if func == "distinct_count":
        # NULL folds into the type default (DistinctCountDef takes a
        # non-nullable T): nulls count as one default-valued entry.
        # Pick the default by the column's logical type (mirrors the
        # engine's per-dtype fillna): '' for strings, epoch-0 for
        # timestamps, 0 otherwise — folding every type to int 0 would
        # over-count a frame containing both NULL and '' by one.
        import datetime as _dt
        proto = next((v for v in vals if v is not None and not (
            isinstance(v, float) and math.isnan(v))), None)
        if isinstance(proto, str):
            default = ""
        elif isinstance(proto, _dt.datetime) or \
                type(proto).__name__ == "Timestamp":
            import pandas as _pd
            default = _pd.Timestamp(0)
        elif isinstance(proto, bool):
            default = False
        else:
            default = 0
        return len({default if v is None or (isinstance(v, float)
                                             and math.isnan(v)) else v
                    for v in vals})
    raise ValueError(func)
