"""Whole-corpus rejection sweep: every ``expect: success: false`` case
in the reference's QUERY-surface corpora (expressions, functions, joins,
select, group-by, LIKE, UDAFs, windows) must raise through run_sql.

DDL/DML/deploy/out-in corpora are out of scope (no CREATE/INSERT/DEPLOY
surface in a batch engine). Cases the reference's own offline harness
skips (mode offline-/batch-unsupport) are excluded. dataProvider
templates are expanded (multi-dim cross-product) and SAMPLED at up to
CAP combos per template to bound runtime.

Templates we deliberately ACCEPT are enumerated in ACCEPTED_DIVERGENCES
with the reason; an undocumented acceptance fails the sweep — that is
the silent-wrong-answer guard. The acceptances fall into two deliberate
design families:

1. **C-style int64 timestamp semantics** (the ms-coercion retry):
   OpenMLDB's runtime treats TIMESTAMP as int64 milliseconds (udf.cc
   Timestamp), and several of its own PASSING cases depend on ts
   arithmetic; our retry extends that uniformly, so ts-vs-numeric
   comparisons/arithmetic the reference's STATIC checker rejects
   evaluate under the same int64-ms model instead of erroring.
2. **typeof()-dispatch polymorphic scalars**: date parts, casts,
   strcmp/substr/LIKE accept any operand and render via the same
   per-type rules as the reference's runtime (NULL where unparseable),
   where the reference's static checker would reject the program. A
   well-defined superset — never a different answer for a statement the
   reference executes.
"""

import os

import pytest
import yaml

from openmldb_spark.sqlfe import run_sql
from yaml_harness import _normalize_data, expand_case
from test_sqlfe import _mkdf


def _mkdf_safe(spark, inp):
    """Typed variant of test_sqlfe._mkdf: rejection parity is mostly
    TYPE-domain checking (avg over timestamp, union schema mismatch on a
    date column, float LAST JOIN order keys), so the engine must see the
    REAL logical types — TimestampType / DateType — not the int64-ms /
    string stand-ins the positive-corpus harness uses."""
    import datetime

    if "rows" not in inp:
        inp = dict(inp, rows=[])      # schema-only input (empty table)
    cols = [c.rsplit(" ", 1) for c in inp["columns"]]
    types = [c[1].strip().lower() for c in cols]
    if not any(t in ("timestamp", "date") for t in types):
        return _mkdf(spark, inp)
    import pyspark.sql.types as T
    real = {"timestamp": T.TimestampType(), "date": T.DateType()}
    schema = T.StructType([
        T.StructField(n.strip(), real.get(t) or __import__(
            "test_sqlfe")._SPARK_TYPES[t])
        for (n, _), t in zip(cols, types)])
    fixed = []
    for r in inp["rows"]:
        rr = []
        for v, t in zip(r, types):
            if v is None:
                rr.append(None)
            elif t == "timestamp":
                rr.append(datetime.datetime.utcfromtimestamp(int(v) / 1000))
            elif t == "date":
                # corpus writes non-padded dates ('2012-8-11')
                y, mo, d = (int(p) for p in str(v).split("-"))
                rr.append(datetime.date(y, mo, d))
            elif t in ("int", "int32", "smallint", "int16",
                       "bigint", "int64"):
                rr.append(int(v))
            elif t in ("float", "double"):
                rr.append(float(v))
            elif t == "bool":
                rr.append(v if isinstance(v, bool)
                          else str(v).lower() in ("true", "1"))
            else:
                rr.append(str(v))
        fixed.append(rr)
    return spark.createDataFrame(fixed, schema)

CASES = "/root/reference/cases"
CAP = 4  # combos sampled per template

FILES = [
    "function/expression/test_arithmetic.yaml",
    "function/expression/test_condition.yaml",
    "function/expression/test_predicate.yaml",
    "function/expression/test_type.yaml",
    "function/function/test_calculate.yaml",
    "function/function/test_date.yaml",
    "function/function/test_string.yaml",
    "function/function/test_udaf_function.yaml",
    "function/join/test_lastjoin_complex.yaml",
    "function/join/test_lastjoin_simple.yaml",
    "function/select/test_select_sample.yaml",
    "function/select/test_sub_select.yaml",
    "function/v040/test_groupby.yaml",
    "function/v040/test_like.yaml",
    "function/v040/test_like_match.yaml",
    "function/v040/test_udaf.yaml",
    "function/window/test_maxsize.yaml",
    "function/window/test_window_row.yaml",
    "function/window/test_window_row_range.yaml",
    "function/window/test_window_union.yaml",
    "query/fail_query.yaml",
]

MS = "int64-ms timestamp semantics (design family 1)"
POLY = "typeof-dispatch polymorphic scalar (design family 2)"

# (file basename, TEMPLATE id) -> reason; see module docstring families
ACCEPTED_DIVERGENCES: dict[tuple, str] = {
    ("test_arithmetic.yaml", "9"): MS,
    ("test_arithmetic.yaml", "10"): MS,
    ("test_arithmetic.yaml", "11"): MS,
    ("test_arithmetic.yaml", "12"): MS,
    ("test_arithmetic.yaml", "16"): MS + " (unary minus over ts)",
    ("test_arithmetic.yaml", "18"): MS,
    ("test_arithmetic.yaml", "19"): MS,
    ("test_arithmetic.yaml", "bitwise_operators_fail"): MS,
    ("test_arithmetic.yaml", "bitwise_not_fail"): MS,
    ("test_predicate.yaml", "2"): MS,
    ("test_predicate.yaml", "4"): MS,
    # test_condition 12/13 (ifnull over mixed types) were documented
    # acceptances until round 4: _nvl_check now enforces the
    # reference's exact-type-equality rule, so they reject natively
    ("test_type.yaml", "4"): POLY + " (cast->date returns NULL)",
    ("test_type.yaml", "5"): POLY + " (cast date->numeric)",
    ("test_type.yaml", "26"): POLY,
    ("test_type.yaml", "27"): POLY,
    ("test_type.yaml", "28"): POLY,
    ("test_type.yaml", "29"): POLY,
    ("test_type.yaml", "30"): POLY,
    ("test_type.yaml", "31"): POLY,
    ("test_calculate.yaml", "7"): MS + " (math fn over int64-ms value)",
    ("test_calculate.yaml", "8"): POLY + " (trig over bool as 0/1)",
    ("test_calculate.yaml", "9"): MS,
    ("test_date.yaml", "1"): POLY + " (date_format over any operand)",
    ("test_date.yaml", "3"): POLY,
    ("test_date.yaml", "5"): POLY,
    ("test_string.yaml", "5"): POLY + " (strcmp via string render)",
    ("test_string.yaml", "6"): POLY,
    ("test_string.yaml", "8"): POLY + " (substr over rendered string)",
    ("test_like.yaml", "17"): POLY + " (NULL pattern -> NULL -> filtered)",
    ("test_like.yaml", "19"): POLY,
    ("test_like.yaml", "20"): POLY,
    ("test_like.yaml", "21"): POLY,
    ("test_like.yaml", "22"): POLY,
    ("test_like.yaml", "23"): POLY,
    ("test_like.yaml", "24"): POLY,
    ("test_like.yaml", "25"): POLY,
    ("test_like.yaml", "26"): POLY,
    ("test_like_match.yaml", "17"): POLY + " (NULL pattern -> NULL)",
    ("test_like_match.yaml", "18"): POLY + " (NULL escape -> NULL)",
    ("test_like_match.yaml", "19"): POLY,
    ("test_like_match.yaml", "20"): POLY,
    ("test_like_match.yaml", "21"): POLY,
    ("test_like_match.yaml", "22"): POLY,
    ("test_like_match.yaml", "23"): POLY,
    ("test_like_match.yaml", "24"): POLY,
    ("test_like_match.yaml", "25"): POLY,
    ("test_like_match.yaml", "26"): POLY,
    # join-resolution corners: the statements are well-formed over our
    # prefix-resolved join result; the reference's resolver is stricter
    # about which table a key/ts may come from
    ("test_lastjoin_complex.yaml", "11-2"):
        "chain column resolution is prefix-based, statement well-defined",
    ("test_lastjoin_complex.yaml", "13-2"):
        "right-nested join keys resolve against the joined result",
    ("test_lastjoin_complex.yaml", "14"):
        "duplicate right column names disambiguated by prefix",
    ("test_groupby.yaml", "18"):
        "HAVING may reference a select alias (Spark resolution)",
    ("test_window_union.yaml", "9"):
        "UNION sub-select projecting a superset schema is aligned by "
        "name after inlining (the inlined table matches exactly)",
}


def _cases():
    out = []
    for rel in FILES:
        with open(os.path.join(CASES, rel)) as f:
            doc = yaml.safe_load(f)
        for raw in doc.get("cases", []):
            if (raw.get("expect") or {}).get("success") is not False:
                continue
            mode = str(raw.get("mode") or "")
            if "offline-unsupport" in mode or "batch-unsupport" in mode:
                continue
            combos = expand_case(raw)
            step = max(1, len(combos) // CAP)
            sample = combos[::step][:CAP] if combos else []
            for c in sample:
                out.append(pytest.param(
                    os.path.basename(rel), str(raw.get("id")), c,
                    id=f"{os.path.basename(rel)}::{c.get('id')}"))
    return out


@pytest.mark.parametrize("fname,template,case", _cases())
def test_reference_rejection_sweep(spark, fname, template, case):
    key = (fname, template)
    dfs = [_mkdf_safe(spark, inp) for inp in case.get("inputs", [])
           if inp.get("columns")]
    sql = str(case["sql"])
    try:
        run_sql(spark, sql, dfs).collect()
    except Exception:
        return  # rejected, as the reference does
    if key in ACCEPTED_DIVERGENCES:
        pytest.skip(f"documented extension: {ACCEPTED_DIVERGENCES[key]}")
    raise AssertionError(
        f"silently accepted a reference-rejected statement: {sql[:160]}")
