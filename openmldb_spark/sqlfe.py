"""SQL front end — compile OpenMLDB window/LAST JOIN SQL to engine ops.

Covers the offline feature-SQL surface the reference's case corpus uses
(the same subset the YAML harnesses exercise):

    SELECT <col | agg(args) OVER wN [AS alias]>... FROM {0}
    WINDOW wN AS ([UNION {i},{j}] PARTITION BY <cols> ORDER BY <col>
                  ROWS|ROWS_RANGE BETWEEN <bound> AND <bound>
                  [MAXSIZE n] [EXCLUDE CURRENT_TIME]
                  [INSTANCE_NOT_IN_WINDOW]) [, w2 AS (...)]

    SELECT <{t}.col [AS alias]>... FROM {0} LAST JOIN {1}
    [ORDER BY {1}.col] ON <equi/residual conds>

Tables are positional: ``{0}`` is the primary DataFrame, ``{1}``… are
union/join tables. ``run_sql(spark, sql, [df0, df1, ...])`` executes on
Spark via window_agg / last_join; grammar sources:
/root/reference/docs/zh/reference/sql/dql/WINDOW_CLAUSE.md, JOIN_CLAUSE.md.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from openmldb_spark.plans.specs import (Agg, KERNEL_AGG_FUNCS, WindowSpec,
                                        parse_time_ms)


class SqlUnsupported(Exception):
    """SQL outside the supported subset (with the offending fragment)."""


_SQL_RE = re.compile(
    r"^\s*SELECT\s+(?P<proj>.*?)\s+FROM\s+\{0\}\s+WINDOW\s+(?P<wins>.*?)\s*"
    r";?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_WINDEF_RE = re.compile(r"(\w+)\s+AS\s*\(([^()]*)\)", re.DOTALL)
_WIN_RE = re.compile(
    r"^\s*(?:UNION\s+(?P<union>[^P]*?)\s+)?"
    r"PARTITION\s+BY\s+(?P<part>.*?)\s+"
    r"ORDER\s+BY\s+(?P<order>.*?)\s+"
    r"(?P<frame>ROWS_RANGE|ROWS)\s+BETWEEN\s+"
    r"(?P<start>.*?)\s+AND\s+(?P<end>CURRENT\s+ROW|.*?PRECEDING)"
    r"(?P<tail>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_AGG_RE = re.compile(
    r"^(?P<fn>\w+)\s*\(\s*(?P<args>[^)]*)\)\s+OVER\s+(?P<win>\w+)\s+"
    r"(?:AS\s+)?(?P<alias>\w+)$",
    re.IGNORECASE,
)
_LASTJOIN_RE = re.compile(
    r"^\s*select\s+(?P<proj>.*?)\s+from\s+\{0\}\s+last\s+join\s+\{1\}\s*"
    r"(?:ORDER\s+BY\s+\{1\}\.(?P<ord>\w+)\s+)?on\s+(?P<cond>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _strip_t(expr: str) -> str:
    return re.sub(r"\{\d+\}\.", "", expr).strip()


def _parse_bound(txt: str, frame: str):
    txt = txt.strip()
    if re.fullmatch(r"CURRENT\s+ROW", txt, re.IGNORECASE):
        return 0, False
    m = re.fullmatch(r"(?P<v>\S+)\s+(?P<open>OPEN\s+)?PRECEDING", txt,
                     re.IGNORECASE)
    if not m:
        raise SqlUnsupported(f"frame bound {txt!r}")
    v = m.group("v")
    is_open = bool(m.group("open"))
    if v.upper() == "UNBOUNDED":
        return (10**15, False)
    if frame == "rows":
        return int(v), is_open
    return parse_time_ms(v), is_open


def split_projection(proj: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in proj:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def compile_window_clause(body: str) -> tuple[WindowSpec, list[int]]:
    """One window definition body → (WindowSpec, union table indices)."""
    wm = _WIN_RE.match(body.strip())
    if not wm:
        raise SqlUnsupported(f"window clause {body!r}")
    if wm.group("union") and "(" in (wm.group("union") or ""):
        raise SqlUnsupported("sub-select in WINDOW UNION")

    frame = "rows_range" if wm.group("frame").lower() == "rows_range" else "rows"
    start, start_open = _parse_bound(wm.group("start"), frame)
    end, end_open = _parse_bound(wm.group("end"), frame)

    tail = wm.group("tail") or ""
    max_size = 0
    mm = re.search(r"MAXSIZE\s+(\d+)", tail, re.IGNORECASE)
    if mm:
        max_size = int(mm.group(1))
        tail = tail.replace(mm.group(0), "")
    exclude_ct = bool(re.search(r"EXCLUDE\s+CURRENT_TIME", tail, re.IGNORECASE))
    iniw = bool(re.search(r"INSTANCE_NOT_IN_WINDOW", tail, re.IGNORECASE))
    tail = re.sub(r"EXCLUDE\s+CURRENT_TIME|INSTANCE_NOT_IN_WINDOW", "", tail,
                  flags=re.IGNORECASE)
    if re.sub(r"[\s,]+", "", tail):
        raise SqlUnsupported(f"window options {tail!r}")

    part_cols = [_strip_t(p) for p in wm.group("part").split(",")]
    order_cols = [_strip_t(o) for o in wm.group("order").split(",")]
    if len(order_cols) != 1:
        # the reference batch engine rejects multiple order keys too
        # (WindowAggPlanUtil.scala:146-149)
        raise SqlUnsupported("multiple ORDER BY keys")

    spec = WindowSpec(
        partition_by=part_cols, order_by=order_cols[0], frame=frame,
        preceding=start, end_offset=end, start_open=start_open,
        end_open=end_open, max_size=max_size,
        exclude_current_time=exclude_ct, instance_not_in_window=iniw,
        tiebreak=(),
    )
    union_idx = []
    if wm.group("union"):
        for tok in wm.group("union").split(","):
            um = re.fullmatch(r"\{(\d+)\}", tok.strip())
            if not um:
                raise SqlUnsupported(f"UNION target {tok.strip()!r}")
            union_idx.append(int(um.group(1)))
    return spec, union_idx


@dataclass
class WindowQuery:
    # output order: ("col", src, alias) | ("agg", window_name, Agg)
    projection: list[tuple] = field(default_factory=list)
    # window name → (spec, union_idx, aggs)
    windows: dict = field(default_factory=dict)


def _lift_anonymous_windows(sql: str) -> str:
    """Rewrite inline `agg() OVER (PARTITION BY ...)` windows into named
    definitions appended to the WINDOW clause (creating one if absent) —
    window bodies never contain parentheses in this dialect."""
    bodies: list[str] = []

    def repl(m):
        bodies.append(m.group(1))
        return f" OVER __anon{len(bodies) - 1} "

    new = re.sub(r"OVER\s*\(([^()]*)\)", repl, sql, flags=re.IGNORECASE)
    if not bodies:
        return sql
    defs = ", ".join(f"__anon{i} AS ({b})" for i, b in enumerate(bodies))
    if re.search(r"\bWINDOW\b", new, re.IGNORECASE):
        new = re.sub(r"\bWINDOW\b", f"WINDOW {defs}, ", new, count=1,
                     flags=re.IGNORECASE)
    else:
        new = re.sub(r";?\s*$", "", new) + f" WINDOW {defs}"
    return new


def compile_window_sql(sql: str) -> WindowQuery:
    sql = sql.strip().replace("\n", " ")
    sql = _lift_anonymous_windows(sql)
    m = _SQL_RE.match(sql)
    if not m:
        raise SqlUnsupported("not a SELECT ... FROM {0} WINDOW ... query")
    q = WindowQuery()
    wins_txt = m.group("wins")
    consumed = wins_txt
    for name, body in _WINDEF_RE.findall(wins_txt):
        spec, union_idx = compile_window_clause(body)
        q.windows[name] = (spec, union_idx, [])
        consumed = consumed.replace(f"({body})", "", 1).replace(name, "", 1)
    if re.sub(r"[\sASas,]+", "", consumed):
        raise SqlUnsupported(f"unparsed window definitions: {consumed!r}")
    if not q.windows:
        raise SqlUnsupported("no window definitions")

    for item in split_projection(m.group("proj")):
        item = item.strip()
        am = _AGG_RE.match(item)
        if am:
            fn = am.group("fn").lower()
            wname = am.group("win")
            if wname not in q.windows:
                raise SqlUnsupported(f"unknown window {wname!r}")
            args = [a.strip() for a in am.group("args").split(",")]
            col = _strip_t(args[0])
            param = None
            if fn in ("lag", "at") and len(args) > 1:
                param = int(args[1])
            elif fn in ("top", "top_n_frequency", "fz_topn_frequency") \
                    and len(args) > 1:
                param = int(args[1])
                fn = "top_n_frequency" if fn == "fz_topn_frequency" else fn
            elif len(args) > 1:
                raise SqlUnsupported(f"aggregate arguments {item!r}")
            if fn not in KERNEL_AGG_FUNCS:
                raise SqlUnsupported(f"aggregate {fn!r}")
            agg = Agg(fn, col, am.group("alias"), param=param)
            q.windows[wname][2].append(agg)
            q.projection.append(("agg", wname, agg))
        else:
            cm = re.fullmatch(
                r"(?P<src>\S+?)(?:\s+as\s+(?P<alias>\w+))?", item,
                re.IGNORECASE)
            src = _strip_t(cm.group("src")) if cm else ""
            if not re.fullmatch(r"\w+", src):
                raise SqlUnsupported(f"projection item {item!r}")
            q.projection.append(("col", src, cm.group("alias") or src))
    if not any(w[2] for w in q.windows.values()):
        raise SqlUnsupported("no window aggregates in projection")
    return q


# -- Spark execution -------------------------------------------------------

def canonicalize_tables(sql: str, tables) -> tuple[str, list]:
    """Accept either positional DataFrames (``{0}`` refs) or a
    {name: DataFrame} dict (``FROM t1 ... t1.col`` refs, like the
    reference's named tables); returns ({i}-canonical sql, ordered dfs)."""
    if not isinstance(tables, dict):
        return sql, list(tables)
    ordered = list(tables.items())
    for i, (name, _) in enumerate(ordered):
        sql = re.sub(rf"\b{re.escape(name)}\s*\.", f"{{{i}}}.", sql)
        sql = re.sub(rf"(\bFROM\s+){re.escape(name)}\b", rf"\g<1>{{{i}}}",
                     sql, flags=re.IGNORECASE)
        sql = re.sub(rf"(\bjoin\s+){re.escape(name)}\b", rf"\g<1>{{{i}}}",
                     sql, flags=re.IGNORECASE)
        sql = re.sub(rf"(\bUNION\s+(?:\{{\d+\}}\s*,\s*)*){re.escape(name)}\b",
                     rf"\g<1>{{{i}}}", sql, flags=re.IGNORECASE)
    return sql, [df for _, df in ordered]


def run_sql(spark, sql: str, tables):
    """Execute a supported OpenMLDB SQL query over DataFrames — either a
    positional list (``{0}`` refs) or a {name: df} dict (named tables).

    Window queries lower to window_agg (one kernel pass per window spec,
    stitched on a synthetic row id — the ConcatJoin role); LAST JOIN
    queries lower to last_join."""
    sql, tables = canonicalize_tables(sql, tables)
    limit = None
    lm = re.search(r"\blimit\s+(\d+)\s*;?\s*$", sql, re.IGNORECASE)
    if lm:
        limit = int(lm.group(1))
        sql = sql[:lm.start()] + ";"
    has_lj = bool(re.search(r"last\s+join", sql, re.IGNORECASE))
    has_win = bool(re.search(r"\bWINDOW\b|\bOVER\b", sql, re.IGNORECASE))
    if has_lj and has_win:
        out = _run_lastjoin_window_sql(sql, tables, limit=limit)
        limit = None
    elif has_lj:
        out = _run_lastjoin_sql(sql, tables)
    else:
        out = _run_window_sql(sql, tables, limit=limit)
        limit = None  # applied in input-row order inside
    return out.limit(limit) if limit is not None else out


def _run_lastjoin_window_sql(sql: str, tables: list, limit: int | None = None):
    """LAST JOIN feeding windows in one statement (the reference's
    canonical join-then-window shape, last_join_window_query.yaml):
    rewrite into (1) a LAST JOIN keeping every column, (2) a window query
    over the joined table with {1}.col refs mapped to the joined r__cols."""
    import pyspark.sql.functions as F

    if len(re.findall(r"last\s+join", sql, re.IGNORECASE)) > 1:
        raise SqlUnsupported("multi-table LAST JOIN chain")
    m = re.match(
        r"^\s*select\s+(?P<proj>.*?)\s+from\s+\{0\}\s+last\s+join\s+\{1\}\s*"
        r"(?:order\s+by\s+\{1\}\.(?P<ord>\w+)\s+)?on\s+(?P<cond>.*?)"
        r"\s+(?P<windows>WINDOW\s+.*?)\s*;?\s*$",
        sql, re.IGNORECASE | re.DOTALL)
    if not m:
        raise SqlUnsupported("combined LAST JOIN + WINDOW shape")

    left, right = tables[0], tables[1]
    ord_txt = f" ORDER BY {{1}}.{m.group('ord')}" if m.group("ord") else ""
    # run the join keeping all columns: project every left col + every
    # right col (prefixed) through the existing path
    lcols = ", ".join(f"{{0}}.{c}" for c in left.columns)
    rcols = ", ".join(f"{{1}}.{c} as __r2_{c}" for c in right.columns)
    join_sql = (f"select {lcols}, {rcols} from {{0}} last join {{1}}"
                f"{ord_txt} on {m.group('cond')} ;")
    joined = _run_lastjoin_sql(join_sql, tables)
    for c in right.columns:
        joined = joined.withColumnRenamed(f"__r2_{c}", f"r__{c}")
    # bare references resolve left-first; expose non-colliding right
    # columns under their bare names too (e.g. `str1 as t2_str1`)
    for c in right.columns:
        if c not in left.columns:
            joined = joined.withColumn(c, F.col(f"r__{c}"))

    # window part over the joined table: {1}.col → r__col, {0}.col → col
    win_sql = "SELECT " + m.group("proj") + " FROM {0} " + m.group("windows")
    win_sql = re.sub(r"\{1\}\.(\w+)", r"{0}.r__\1", win_sql)
    return _run_window_sql(win_sql, [joined], limit=limit)


_RID = "__sql_rid"


def _run_window_sql(sql: str, tables: list, limit: int | None = None):
    import pyspark.sql.functions as F
    from openmldb_spark.operators.window import window_agg

    q = compile_window_sql(sql)
    primary = tables[0].withColumn(_RID, F.monotonically_increasing_id())
    # cache: every window spec re-reads the primary, and the row id must
    # be stable across those branches (monotonically_increasing_id is
    # plan-dependent)
    primary = primary.persist()
    primary.count()

    keep = [_RID] + [e[1] for e in q.projection if e[0] == "col"]
    merged = primary.select(*dict.fromkeys(keep))
    final_cols = [
        F.col(e[1]).alias(e[2]) if e[0] == "col" else F.col(e[2].alias)
        for e in q.projection
    ]
    for wname, (spec, union_idx, aggs) in q.windows.items():
        if not aggs:
            continue
        union = [tables[i] for i in union_idx]
        out = window_agg(primary, spec, aggs, keep_cols=[_RID],
                         union=union or None, tier="kernel")
        merged = merged.join(out, _RID, "inner")

    if limit is not None:
        # LIMIT after a window query: deterministic first-N in input-row
        # order (the reference iterates storage order)
        merged = merged.orderBy(F.col(_RID)).limit(limit)
    return merged.select(*final_cols)


def _run_lastjoin_sql(sql: str, tables: list):
    import pyspark.sql.functions as F
    from openmldb_spark.plans.specs import LastJoinSpec
    from openmldb_spark.operators.lastjoin import last_join

    sql = sql.strip().replace("\n", " ")
    if len(re.findall(r"last\s+join", sql, re.IGNORECASE)) > 1:
        raise SqlUnsupported("multi-table LAST JOIN chain")
    m = _LASTJOIN_RE.match(sql)
    if not m:
        raise SqlUnsupported("not a supported LAST JOIN query")
    left, right = tables[0], tables[1]

    # projection: {t}.col refs, bare cols (resolved left-first), or
    # arbitrary scalar expressions over both sides (lowered to F.expr)
    proj = []
    for item in split_projection(m.group("proj")):
        item = item.strip()
        pm = re.fullmatch(
            r"\{(?P<t>\d)\}\.(?P<col>\w+)(?:\s+as\s+(?P<alias>\w+))?",
            item, re.IGNORECASE)
        if pm:
            proj.append((int(pm.group("t")), pm.group("col"),
                         pm.group("alias") or pm.group("col")))
            continue
        bm = re.fullmatch(r"(?P<col>\w+)(?:\s+as\s+(?P<alias>\w+))?", item,
                          re.IGNORECASE)
        if bm:
            proj.append(("bare", bm.group("col"),
                         bm.group("alias") or bm.group("col")))
            continue
        em = re.fullmatch(r"(?P<expr>.+?)\s+as\s+(?P<alias>\w+)", item,
                          re.IGNORECASE | re.DOTALL)
        if not em:
            raise SqlUnsupported(f"projection item {item!r}")
        expr = re.sub(r"\{1\}\.(\w+)", r"r__\1", em.group("expr"))
        expr = re.sub(r"\{0\}\.(\w+)", r"\1", expr)
        proj.append(("expr", expr, em.group("alias")))

    right = right.select(*[F.col(c).alias(f"r__{c}") for c in right.columns])
    equi, residual = [], []
    for tok in re.split(r"\s+and\s+", m.group("cond"), flags=re.IGNORECASE):
        tok = tok.strip()
        em = re.fullmatch(r"\{0\}\.(\w+)\s*=\s*\{1\}\.(\w+)", tok) or \
            re.fullmatch(r"\{1\}\.(?P<r>\w+)\s*=\s*\{0\}\.(?P<l>\w+)", tok)
        if em and em.groupdict().get("r"):
            equi.append((em.group("l"), em.group("r")))
            continue
        if em:
            equi.append((em.group(1), em.group(2)))
            continue
        rm = re.fullmatch(r"\{(\d)\}\.(\w+)\s*(>=|<=|!=|=|>|<)\s*(.+)", tok)
        if rm:
            t, col, op, rhs = rm.groups()
            lhs = f"r__{col}" if t == "1" else col
            rhs = re.sub(r"\{1\}\.(\w+)", r"r__\1", rhs)
            rhs = re.sub(r"\{0\}\.(\w+)", r"\1", rhs)
            residual.append(f"{lhs} {op} {rhs}")
            continue
        raise SqlUnsupported(f"join condition {tok!r}")

    # right key/order columns are aliased away by last_join: duplicate
    # any the projection or residual needs
    order = m.group("ord")
    right_on = [f"r__{r}" for _, r in equi]
    hidden = set(right_on) | ({f"r__{order}"} if order else set())
    need = {c for t, c, _ in proj if t == 1 and f"r__{c}" in hidden}
    # hidden right cols referenced inside projection expressions
    for t, body, _ in proj:
        if t == "expr":
            for rc in re.findall(r"\br__(\w+)\b", body):
                if f"r__{rc}" in hidden:
                    need.add(rc)
    cond_txt = " AND ".join(residual) if residual else None
    if cond_txt:
        # equi keys AND the order column are aliased away inside
        # last_join — residual refs to either need the rk__ duplicate
        for rc in re.findall(r"\br__(\w+)", cond_txt):
            if f"r__{rc}" in hidden:
                need.add(rc)
                cond_txt = re.sub(rf"\br__{rc}\b", f"rk__{rc}", cond_txt)
    for c in need:
        right = right.withColumn(f"rk__{c}", F.col(f"r__{c}"))

    spec = LastJoinSpec(
        left_on=[l for l, _ in equi] or ["__k"],
        right_on=right_on or ["r____k"],
        order_by=f"r__{order}" if order else None,
        condition=cond_txt,
    )
    if not equi:
        left = left.withColumn("__k", F.lit(1))
        right = right.withColumn("r____k", F.lit(1))
    right_cols = [c for c in right.columns
                  if c not in spec.right_on and c != spec.order_by]
    out = last_join(left, right, spec, right_cols=right_cols)

    def _resolve(t, col):
        if t == 0:
            return col
        if t == 1:
            return f"r__{col}" if f"r__{col}" in out.columns else f"rk__{col}"
        # bare: left column first, then right (the reference resolves
        # unqualified names left-first)
        if col in out.columns:
            return col
        return f"r__{col}" if f"r__{col}" in out.columns else f"rk__{col}"

    sel = []
    for t, col, alias in proj:
        if t == "expr":
            body = re.sub(
                r"\br__(\w+)\b",
                lambda mm: mm.group(0) if f"r__{mm.group(1)}" in out.columns
                else f"rk__{mm.group(1)}", col)
            sel.append(F.expr(body).alias(alias))
            continue
        name = _resolve(t, col)
        if name not in out.columns:
            raise SqlUnsupported(f"projected column {col!r} unavailable")
        sel.append(F.col(name).alias(alias))
    return out.select(*sel)
