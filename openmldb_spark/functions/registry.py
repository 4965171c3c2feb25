"""OpenMLDB scalar-function surface → PySpark Column builders.

Covers the reference's 112-builtin library (SURVEY.md §2.8; authoritative
list /root/reference/docs/zh/reference/sql/functions_and_operators/Files/
udfs_8h.md; registrations /root/reference/hybridse/src/udf/
default_udf_library.cc). Every function here compiles to built-in Catalyst
expressions — JVM-side, whole-stage codegen, no Python in the hot path.

Use ``fn("name")(args...)`` or the module-level REGISTRY dict. Functions
whose OpenMLDB name differs from Spark's are explicitly bridged; 1:1 names
are registered from _PASSTHROUGH.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
import pyspark.sql.functions as F


def _col(c) -> Column:
    return c if isinstance(c, Column) else (F.lit(c) if not isinstance(c, str) else F.col(c))


# ---- names identical in Spark (default_udf_library.cc citations in SURVEY) --
_PASSTHROUGH = [
    # string (:466-972)
    "concat", "concat_ws", "substring", "substr", "upper", "lower",
    "reverse", "like",
    # math (:974-1344)
    "log", "ln", "log2", "log10", "abs", "ceil", "ceiling", "exp", "floor",
    "pow", "power", "round", "sqrt",
    # trig (:1346-1583)
    "degrees", "radians", "acos", "asin", "atan", "atan2", "cos", "sin",
    "tan",
    # null/logic (:1585-1659)
    "coalesce", "greatest", "least",
]


def _ts_of(x) -> Column:
    """Operand → timestamp with OpenMLDB semantics: INTEGER operands
    are epoch MILLISECONDS (int64 timestamps), not the seconds Spark's
    long→timestamp cast assumes; everything else casts plainly."""
    c = _col(x)
    return F.when(
        F.typeof(c).isin("bigint", "int", "smallint", "tinyint"),
        F.timestamp_millis(c.cast("long")),
    ).otherwise(c.cast("timestamp"))


def _local8(x) -> Column:
    """Render a timestamp operand as OpenMLDB wall time — the reference
    pins all timestamp→calendar conversion to fixed UTC+8
    (constexpr TZ = 8, hybridse/src/udf/udf.cc:54-67)."""
    return F.from_utc_timestamp(_ts_of(x), "+08:00")


_STRFTIME_MAP = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd",
    "H": "HH", "M": "mm", "S": "ss", "j": "DDD", "W": "ww", "u": "e",
}


def strftime_to_java(fmt: str) -> str:
    """OpenMLDB date_format patterns are C strftime (%Y-%m-%d %H:%M:%S,
    udf.cc:193-216); Spark's are Java time patterns. Literal runs with
    letters are single-quoted so they don't parse as pattern chars."""
    import re as _re

    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%":
            sp = fmt[i + 1] if i + 1 < len(fmt) else ""
            if sp == "%":
                out.append("'%'")
            elif sp in _STRFTIME_MAP:
                out.append(_STRFTIME_MAP[sp])
            else:
                raise ValueError(f"unsupported strftime specifier %{sp}")
            i += 2
        else:
            j = i
            while j < len(fmt) and fmt[j] != "%":
                j += 1
            lit = fmt[i:j]
            out.append("'" + lit.replace("'", "''") + "'"
                       if _re.search(r"[A-Za-z']", lit) else lit)
            i = j
    return "".join(out)


def _date_format(x, fmt) -> Column:
    if not isinstance(fmt, str):
        raise ValueError("date_format pattern must be a literal string")
    return F.date_format(_local8(x), strftime_to_java(fmt))


def lone_trailing_escape(pat: str, esc: str) -> bool:
    """True if the pattern ends on an unpaired escape character — the
    reference's like_internal returns false for every non-null input in
    that case (udf.cc:339-342), while Spark raises ESC_AT_THE_END."""
    i, n = 0, len(pat)
    while i < n:
        if pat[i] == esc:
            if i + 1 >= n:
                return True
            i += 2
        else:
            i += 1
    return False


def normalize_like_pattern(pat: str, esc: str) -> str:
    """The reference's like_internal treats ``esc`` + ANY char as an
    exact match of that char (udf.cc:336-348); Spark only allows the
    escape before ``%``/``_``/the escape itself and raises
    INVALID_FORMAT.ESC_IN_THE_MIDDLE otherwise. Drop the escape where
    the following char isn't special — the patterns are equivalent."""
    out, i, n = [], 0, len(pat)
    while i < n:
        c = pat[i]
        if c == esc and i + 1 < n:
            nxt = pat[i + 1]
            if nxt in ("%", "_", esc):
                out.append(c)
                out.append(nxt)
            else:
                out.append(nxt)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _like_const_false(s: Column) -> Column:
    """like_internal's constant-false tail, NULL-propagating the target."""
    return F.when(s.isNull(), F.lit(None).cast("boolean")).otherwise(
        F.lit(False))


def _norm_lit_like(s: Column, pat, esc: str):
    """For a literal pattern, pre-handle the two reference edges Spark
    rejects: a lone trailing escape (constant false, udf.cc:339-342) and
    an escape before an ordinary char (match that char exactly). Returns
    (pattern, early_result)."""
    if not isinstance(pat, str):
        return pat, None
    if lone_trailing_escape(pat, esc):
        return pat, _like_const_false(s)
    return normalize_like_pattern(pat, esc), None


def _like_match(s, pat, esc: str | None = None) -> Column:
    """like_match 2/3-arg (escape char; '' disables escaping entirely —
    EscapeLikeMatch, default_udf_library.cc:699-857)."""
    s = _col(s)
    if esc is None or (isinstance(esc, str) and len(esc) == 1):
        pat, early = _norm_lit_like(s, pat, esc or "\\")
        if early is not None:
            return early
    p = F.lit(pat) if isinstance(pat, str) else pat
    if esc is None:
        return s.like(pat) if isinstance(pat, str) else F.like(s, p)
    if esc == "":
        # no escape char: \x00 cannot occur in the pattern
        return F.like(s, p, F.lit("\x00"))
    return F.like(s, p, F.lit(esc))


def _ilike_match(s, pat, esc: str | None = None) -> Column:
    s = _col(s)
    if esc is None or (isinstance(esc, str) and len(esc) == 1):
        pat, early = _norm_lit_like(s, pat, esc or "\\")
        if early is not None:
            return early
    p = F.lit(pat) if isinstance(pat, str) else pat
    if esc is None:
        return F.ilike(s, p)
    if esc == "":
        return F.ilike(s, p, F.lit("\x00"))
    return F.ilike(s, p, F.lit(esc))


def _strcmp(a, b) -> Column:
    """strcmp (:648): 0 if equal, -1 if a<b, 1 if a>b; NULL input
    propagates NULL (the otherwise(0) fallback used to declare NULL
    'equal' to every string)."""
    a, b = _col(a), _col(b)
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("int")) \
        .when(a < b, F.lit(-1)).when(a > b, F.lit(1)).otherwise(F.lit(0))


def _cot(x) -> Column:
    return F.lit(1.0) / F.tan(_col(x))


def _truncate(x) -> Column:
    """truncate toward zero (:1315-1344)."""
    x = _col(x)
    return F.when(x < 0, F.ceil(x)).otherwise(F.floor(x)).cast("double")


def _nvl2(x, a, b) -> Column:
    return F.when(_col(x).isNotNull(), _col(a)).otherwise(_col(b))


def _empty_str_array() -> Column:
    """Typed empty list — a bare F.array() is array<void>, which can
    fail analysis or mistype downstream consumers (fz_join expects
    array<string>). Built lazily: Column construction needs the JVM."""
    return F.array().cast("array<string>")


def _fz_split(s, delim) -> Column:
    """fz_split (feature_zero_def.cc:181-226): string → list by
    delimiter; NULL input or empty delimiter → EMPTY list. A SINGLE-char
    delimiter is a LITERAL char scan in the reference (:187-202) — only
    multi-char delimiters take the boost::split_regex fallback — so '|'
    or '.' must be escaped before Spark's regex-based split."""
    if not delim:
        return _empty_str_array()
    if len(delim) == 1:
        import re as _re
        delim = _re.escape(delim)
    return F.when(_col(s).isNull(), _empty_str_array()) \
            .otherwise(F.split(_col(s), delim))


def _fz_kv_entries(s, delim1: str, kv_delim: str) -> Column:
    """Entries of the split that contain the kv delimiter — the others
    contribute neither key nor value (feature_zero_def.cc:227-330)."""
    return F.filter(_fz_split(s, delim1),
                    lambda x: F.locate(kv_delim, x) > 0)


def fz_split_by_key(s, delim1: str, kv_delim: str) -> Column:
    """fz_split_by_key: 'k1:v1,???,k2:v2' → [k1, k2]."""
    if not kv_delim:
        return _empty_str_array()
    return F.transform(_fz_kv_entries(s, delim1, kv_delim),
                       lambda x: F.substring_index(x, kv_delim, 1))


def fz_split_by_value(s, delim1: str, kv_delim: str) -> Column:
    """fz_split_by_value: the segment between the 1st and 2nd kv
    delimiter of each kv entry ('k1:v1:w,???' → [v1])."""
    if not kv_delim:
        return _empty_str_array()
    return F.transform(_fz_kv_entries(s, delim1, kv_delim),
                       lambda x: F.element_at(F.split(x, kv_delim), 2))


def fz_join(arr, delim: str) -> Column:
    """fz_join (:636-650): list → delimited string."""
    return F.array_join(_col(arr), delim)


REGISTRY: dict[str, Callable[..., Column]] = {}
for _name in _PASSTHROUGH:
    REGISTRY[_name] = getattr(F, _name)

REGISTRY.update({
    # string
    "lcase": F.lower,
    "ucase": F.upper,
    # replace (:934-973): search/replace are literals in OpenMLDB SQL
    "replace": lambda s, search, repl="": F.replace(
        _col(s),
        F.lit(search) if isinstance(search, str) else search,
        F.lit(repl) if isinstance(repl, str) else repl,
    ),
    "char_length": F.length,
    "character_length": F.length,
    "char": F.chr,
    "strcmp": _strcmp,
    "ilike_match": _ilike_match,
    "like_match": _like_match,
    "date_format": _date_format,
    "string": lambda x: _col(x).cast("string"),
    # math
    "mod": lambda a, b: _col(a) % _col(b),
    "truncate": _truncate,
    "cot": _cot,
    "pi": lambda: F.lit(3.141592653589793),
    # casts (:1661-1821)
    "bool": lambda x: _col(x).cast("boolean"),
    "int16": lambda x: _col(x).cast("short"),
    "int32": lambda x: _col(x).cast("int"),
    "int64": lambda x: _col(x).cast("long"),
    "float": lambda x: _col(x).cast("float"),
    "double": lambda x: _col(x).cast("double"),
    "date": lambda x: _col(x).cast("date"),
    "timestamp": lambda x: _ts_of(x),
    # date/time: calendar parts render at fixed UTC+8 (udf.cc:54-67)
    "year": lambda x: F.year(_local8(x)),
    "month": lambda x: F.month(_local8(x)),
    "day": lambda x: F.dayofmonth(_local8(x)),
    "dayofmonth": lambda x: F.dayofmonth(_local8(x)),
    "dayofweek": lambda x: F.dayofweek(_local8(x)),
    "dayofyear": lambda x: F.dayofyear(_local8(x)),
    "week": lambda x: F.weekofyear(_local8(x)),
    "weekofyear": lambda x: F.weekofyear(_local8(x)),
    "hour": lambda x: F.hour(_local8(x)),
    "minute": lambda x: F.minute(_local8(x)),
    "second": lambda x: F.second(_local8(x)),
    # null / logic (:1585-1659)
    "is_null": lambda x: _col(x).isNull(),
    "isnull": lambda x: _col(x).isNull(),
    "if_null": lambda x, d: F.coalesce(_col(x), _col(d)),
    "ifnull": lambda x, d: F.coalesce(_col(x), _col(d)),
    "nvl": lambda x, d: F.coalesce(_col(x), _col(d)),
    "nvl2": _nvl2,
    # row-wise min/max (minimum/maximum :2123-2146)
    "minimum": F.least,
    "maximum": F.greatest,
    "inc": lambda x: _col(x) + F.lit(1),
    "identity": _col,
    "add": lambda a, b: _col(a) + _col(b),
    # tuple constructor (udfs_8h.md make_tuple; used for multi-arg UDAFs)
    "make_tuple": lambda *args: F.struct(*[_col(a) for a in args]),
    # feature-zero split family (feature_zero_def.cc:555-661)
    "fz_split": _fz_split,
    "fz_split_by_key": fz_split_by_key,
    "fz_split_by_value": fz_split_by_value,
    "fz_join": fz_join,
})


def fn(name: str) -> Callable[..., Column]:
    """Look up an OpenMLDB function by name."""
    try:
        return REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"function {name!r} not in the OpenMLDB surface "
            f"({len(REGISTRY)} registered)"
        ) from None
