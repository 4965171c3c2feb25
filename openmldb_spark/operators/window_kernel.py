"""Vectorized sliding-frame kernel — the engine core.

Reproduces the exact frame semantics of OpenMLDB's ``HistoryWindow`` buffer
(/root/reference/hybridse/include/vm/mem_catalog.h:368-471: BufferData /
BufferEffectiveWindow / BufferCurrentTimeBuffer / BufferCurrentHistoryBuffer)
and the batch-engine emit rules
(/root/reference/java/openmldb-batch/.../nodes/WindowAggPlan.scala:540-611),
re-expressed as numpy prefix sums + searchsorted over one sorted group —
no per-row Python in the hot path for sum/count/avg/min/max/lag/first_value.

Semantics cheat-sheet (derived from the reference, validated by its yaml
cases):

- Buffer order: rows sorted by (order_key, is_primary, *tiebreak); at equal
  order keys union (secondary) rows sort BEFORE primary rows
  (WindowAggPlan.windowPartition:322-343 — union flag appended to sort keys).
- Rows with NULL or negative order key are dropped entirely — neither
  buffered nor emitted (WindowAggPlan.isValidOrder:783-790).
- ROWS frame [s PRECEDING, e PRECEDING]: positions e..s counting back from
  the current row within the buffer.
- ROWS_RANGE frame: order_key in [cur-s, cur-e]; OPEN makes a bound
  exclusive. Only rows already buffered (sort position < current) qualify.
- EXCLUDE CURRENT_TIME (only applies when the frame end is CURRENT ROW):
  frame = {current row} ∪ rows with order_key strictly < current key
  (BufferCurrentTimeBuffer trace).
- MAXSIZE k: keep only the newest k frame rows, current row included
  (BufferEffectiveWindow pop loop, mem_catalog.h:430-438).
- WINDOW UNION: secondary rows buffer but never emit
  (WindowAggPlan.scala:598-601).
- INSTANCE_NOT_IN_WINDOW: primary rows never buffer; the anchor row itself
  still joins its own frame (cases/function/window/test_window_union.yaml
  id 13: anchor + union rows).
- rows_merge_rows_range: expires by time but always retains at least
  rows_preceding+1 newest rows (mem_catalog.h:439-452).
- at/lag(col,k): k-th frame row counting back from the newest; first_value =
  at(col,0) (window_functions_def.cc:96-157).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from openmldb_spark.plans.specs import Agg, WindowSpec

ORD = "__ord"          # int64 order key (ms for range frames)
PRIMARY = "__primary"  # 1 = row of the primary (emitting) table
EXPANDED = "__expanded"  # 1 = skew-replica row: buffers, never emits


def _searchsorted(a: np.ndarray, v: np.ndarray, side: str) -> np.ndarray:
    return np.searchsorted(a, v, side=side).astype(np.int64)


def compute_frame_bounds(
    ts_e: np.ndarray,      # order keys of eligible (bufferable) rows, sorted
    tsE: np.ndarray,       # order keys of emit rows
    PE: np.ndarray,        # # eligible rows strictly before each emit row
    selfE: np.ndarray,     # 1 if the emit row itself is eligible
    spec: WindowSpec,
):
    """Return (lo, hi, extra): frame = ts_e[lo:hi] ∪ ({self} if extra).

    lo/hi are int64 arrays over emit rows; extra is a boolean array (the
    anchor participates without being part of the contiguous slice).
    """
    end_delta = spec.end_delta
    at_current = end_delta == 0 and not spec.end_open

    if at_current:
        if spec.exclude_current_time:
            hi = _searchsorted(ts_e, tsE, "left")
            extra = np.ones(len(tsE), dtype=bool)
        else:
            hi = PE + selfE
            extra = selfE == 0
    else:
        extra = np.zeros(len(tsE), dtype=bool)
        if spec.frame == "rows":
            hi = np.maximum(PE + selfE - end_delta, 0)
        else:
            side = "left" if spec.end_open else "right"
            hi = _searchsorted(ts_e, tsE - end_delta, side)
            hi = np.minimum(hi, PE + selfE)

    extra_i = extra.astype(np.int64)
    if spec.frame == "rows":
        lo = hi - (spec.start_delta + 1 - end_delta - extra_i)
    else:
        side = "right" if spec.start_open else "left"
        lo = _searchsorted(ts_e, tsE - spec.start_delta, side)
        if spec.frame == "rows_merge_rows_range":
            lo_rows = hi - (spec.rows_preceding + 1 - extra_i)
            lo = np.minimum(lo, lo_rows)

    if spec.max_size and spec.max_size > 0:
        lo = np.maximum(lo, hi - (spec.max_size - extra_i))

    lo = np.clip(lo, 0, hi)
    return lo, hi, extra


def _prefix(arr: np.ndarray) -> np.ndarray:
    out = np.empty(len(arr) + 1, dtype=np.float64)
    out[0] = 0.0
    np.cumsum(arr, out=out[1:])
    return out


class _SparseTable:
    """O(m log m) range-min/max over the eligible value array."""

    def __init__(self, x: np.ndarray, op):
        self.op = op
        m = len(x)
        levels = max(1, m.bit_length())
        self.tab = [x]
        k = 1
        while (1 << k) <= m:
            prev = self.tab[-1]
            half = 1 << (k - 1)
            self.tab.append(op(prev[: m - (1 << k) + 1], prev[half : m - half + 1]))
            k += 1

    def query(self, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        """Reduce over [lo, hi); empty ranges yield the op identity (inf)."""
        out = np.full(len(lo), np.inf if self.op is np.minimum else -np.inf)
        w = hi - lo
        valid = w > 0
        if not valid.any():
            return out
        k = np.zeros(len(lo), dtype=np.int64)
        wv = w[valid]
        k_v = np.floor(np.log2(wv)).astype(np.int64)
        k[valid] = k_v
        for kk in np.unique(k_v):
            mask = valid & (k == kk)
            t = self.tab[kk]
            a = t[lo[mask]]
            b = t[hi[mask] - (1 << kk)]
            out[mask] = self.op(a, b)
        return out


def _fmt_num(v) -> str:
    """Format a value for csv-emitting UDAFs (top, *_cate)."""
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return f"{f:.6f}".rstrip("0").rstrip(".") if "." in f"{f:.6f}" else str(f)
        return repr(f)
    return str(v)


def group_window_features(
    pdf: pd.DataFrame,
    spec: WindowSpec,
    aggs: list[Agg],
    keep_cols: list[str],
    out_dtypes: dict | None = None,
) -> pd.DataFrame:
    """Compute all window aggregates of one group in one pass.

    ``pdf`` must contain ORD (int64), PRIMARY, EXPANDED plus every column an
    agg references. Returns emit rows (primary & not expanded) with
    keep_cols + one column per agg alias.
    """
    sort_cols = [ORD, PRIMARY, *spec.tiebreak]
    pdf = pdf.sort_values(sort_cols, kind="stable").reset_index(drop=True)
    n = len(pdf)
    ts = pdf[ORD].to_numpy(np.int64, copy=False)
    primary = pdf[PRIMARY].to_numpy(np.int64, copy=False)
    expanded = (
        pdf[EXPANDED].to_numpy(np.int64, copy=False)
        if EXPANDED in pdf.columns
        else np.zeros(n, dtype=np.int64)
    )

    elig = np.ones(n, dtype=bool)
    if spec.instance_not_in_window:
        elig = primary == 0
    cum = np.cumsum(elig)
    P = cum - elig  # eligible strictly before each row

    emit_mask = (primary == 1) & (expanded == 0)
    E = np.flatnonzero(emit_mask)
    idx_e = np.flatnonzero(elig)
    ts_e = ts[idx_e]

    tsE = ts[E]
    PE = P[E]
    selfE = elig[E].astype(np.int64)
    lo, hi, extra = compute_frame_bounds(ts_e, tsE, PE, selfE, spec)
    anchored = extra  # anchor participates beyond the slice

    out = pdf.loc[E, keep_cols].reset_index(drop=True)

    num_cache: dict[str, tuple] = {}

    def numeric(col: str):
        if col not in num_cache:
            x = pd.to_numeric(pdf[col], errors="coerce").to_numpy(np.float64)
            x_e = x[idx_e]
            nn = ~np.isnan(x_e)
            num_cache[col] = (x, x_e, nn)
        return num_cache[col]

    def masked_prefix(col: str, cond: str | None):
        x, x_e, nn = numeric(col)
        if cond is None:
            m = nn
        else:
            c = pdf[cond].fillna(False).to_numpy(bool)[idx_e]
            m = nn & c
        ps = _prefix(np.where(m, x_e, 0.0))
        pc = _prefix(m.astype(np.float64))
        return x, x_e, m, ps, pc

    def self_vals(col: str, cond: str | None):
        """(value, in-frame-and-valid) for the anchor rows."""
        x, _, _ = numeric(col)
        sv = x[E]
        ok = anchored & ~np.isnan(sv)
        if cond is not None:
            c = pdf[cond].fillna(False).to_numpy(bool)[E]
            ok = ok & c
        return sv, ok

    def agg_sum_count(col, cond):
        _, _, _, ps, pc = masked_prefix(col, cond)
        sv, ok = self_vals(col, cond)
        s = ps[hi] - ps[lo] + np.where(ok, sv, 0.0)
        c = pc[hi] - pc[lo] + ok.astype(np.float64)
        return s, c

    def frame_indices(i_emit: int):
        """Eligible pdf row indices of one frame (for looped UDAFs)."""
        sl = idx_e[lo[i_emit] : hi[i_emit]]
        if anchored[i_emit]:
            sl = np.concatenate([sl, [E[i_emit]]])
        return sl

    for agg in aggs:
        f, col, alias = agg.func, agg.col, agg.alias
        if f in ("sum", "avg", "count", "sum_where", "avg_where", "count_where"):
            cond = agg.cond if f.endswith("_where") else None
            s, c = agg_sum_count(col, cond)
            if f.startswith("sum"):
                vals = np.where(c > 0, s, np.nan)
            elif f.startswith("avg"):
                vals = np.where(c > 0, s / np.maximum(c, 1), np.nan)
            else:
                vals = c
            out[alias] = vals
        elif f in ("min", "max", "min_where", "max_where"):
            cond = agg.cond if f.endswith("_where") else None
            x, x_e, nn = numeric(col)
            if cond is not None:
                cm = pdf[cond].fillna(False).to_numpy(bool)[idx_e]
                m = nn & cm
            else:
                m = nn
            op = np.minimum if f.startswith("min") else np.maximum
            fill = np.inf if f.startswith("min") else -np.inf
            st = _SparseTable(np.where(m, x_e, fill), op)
            vals = st.query(lo, hi)
            sv, ok = self_vals(col, cond)
            vals = np.where(ok, op(vals, np.where(np.isnan(sv), fill, sv)), vals)
            vals = np.where(np.isinf(vals), np.nan, vals)
            out[alias] = vals
        elif f in ("lag", "at", "first_value"):
            k = 0 if f == "first_value" else int(agg.param or 0)
            raw = pdf[col].to_numpy()
            at_current = spec.end_delta == 0 and not spec.end_open
            res = pd.Series([None] * len(E), dtype=object)
            if at_current:
                # position 0 = the anchor row itself
                if k == 0:
                    res[:] = raw[E]
                else:
                    # anchor occupies position 0: k≥1 → slice index
                    # hi-k (anchored) or hi-1-k+1 = hi-k ... self sits at
                    # hi-1 when in-slice, so k steps back = hi-1-k+... :
                    pos = hi - k - 1 + anchored.astype(np.int64)
                    valid = (pos >= lo) & (pos < hi)
                    res[valid] = raw[idx_e[pos[valid]]]
            else:
                pos = hi - 1 - k
                valid = (pos >= lo) & (pos < hi)
                res[valid] = raw[idx_e[pos[valid]]]
            out[alias] = res
        elif f == "distinct_count":
            raw = pdf[col]
            vals = np.zeros(len(E), dtype=np.float64)
            for j in range(len(E)):
                fi = frame_indices(j)
                s = raw.iloc[fi].dropna()
                vals[j] = s.nunique()
            out[alias] = vals
        elif f == "top":
            k = int(agg.param or 1)
            raw = pdf[col]
            res = []
            for j in range(len(E)):
                fi = frame_indices(j)
                s = pd.to_numeric(raw.iloc[fi], errors="coerce").dropna()
                topk = np.sort(s.to_numpy())[::-1][:k]
                res.append(",".join(_fmt_num(v) for v in topk))
            out[alias] = res
        elif f == "top_n_frequency":
            k = int(agg.param or 1)
            raw = pdf[col]
            res = []
            for j in range(len(E)):
                fi = frame_indices(j)
                s = raw.iloc[fi].dropna().astype(str)
                if len(s) == 0:
                    res.append("")
                    continue
                vc = s.value_counts()
                # ties: higher count first, then key ascending (deterministic)
                items = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
                res.append(",".join(key for key, _ in items))
            out[alias] = res
        elif f == "top1_ratio":
            raw = pdf[col]
            vals = np.full(len(E), np.nan)
            for j in range(len(E)):
                fi = frame_indices(j)
                s = raw.iloc[fi].dropna()
                if len(s):
                    vals[j] = s.value_counts().iloc[0] / len(s)
            out[alias] = vals
        elif f.endswith("_cate") or f.endswith("_cate_where"):
            base = f.split("_cate")[0]
            cond = agg.cond if f.endswith("_where") else None
            raw_v = pd.to_numeric(pdf[col], errors="coerce")
            raw_c = pdf[agg.cate]
            cond_v = pdf[cond].fillna(False) if cond else None
            res = []
            for j in range(len(E)):
                fi = frame_indices(j)
                v = raw_v.iloc[fi]
                c = raw_c.iloc[fi]
                m = v.notna() & c.notna()
                if cond is not None:
                    m &= cond_v.iloc[fi].astype(bool)
                if not m.any():
                    res.append("")
                    continue
                g = v[m].groupby(c[m].astype(str))
                agged = {
                    "sum": g.sum,
                    "count": g.count,
                    "avg": g.mean,
                    "min": g.min,
                    "max": g.max,
                }[base]()
                res.append(
                    ",".join(f"{key}:{_fmt_num(val)}" for key, val in sorted(agged.items()))
                )
            out[alias] = res
        else:  # pragma: no cover
            raise ValueError(f"unhandled agg func {f}")

    if out_dtypes:
        for c, dt in out_dtypes.items():
            if c in out.columns:
                try:
                    out[c] = out[c].astype(dt)
                except (TypeError, ValueError):
                    pass
    return out
