"""Replay the ENTIRE reference window corpus through the full Spark
stack (run_sql → window_agg → Arrow kernel). ~5 min, so opt-in:

    SPARK_GRAFT_FULL_CORPUS=1 python -m pytest tests/test_full_corpus_spark.py

Last recorded run (2026-08-17): 165 ok / 0 fail / 39 skip
(skips = outside the SQL subset or non-literal expectations).
The always-on equivalents: kernel-level corpus in
test_reference_cases.py (fast) + the PICKS slice in test_sqlfe.py.
"""

import math
import os

import pandas as pd
import pytest

from openmldb_spark.sqlfe import SqlUnsupported, run_sql
from yaml_harness import Unsupported, load_cases

from test_sqlfe import _mkdf

FILES = ["test_window_row.yaml", "test_window_row_range.yaml",
         "test_maxsize.yaml", "test_window_exclude_current_time.yaml",
         "test_window_union.yaml", "test_window.yaml"]


@pytest.mark.skipif(not os.environ.get("SPARK_GRAFT_FULL_CORPUS"),
                    reason="slow full-corpus replay; set SPARK_GRAFT_FULL_CORPUS=1")
def test_full_window_corpus_through_spark(spark):
    ok, fail, skip = 0, [], 0
    for f in FILES:
        for case in load_cases(f):
            if case.get("mode") and "batch-unsupport" in str(case["mode"]):
                continue
            exp = case.get("expect", {})
            if exp.get("success") is False or "columns" not in exp \
                    or "rows" not in exp:
                skip += 1
                continue
            try:
                dfs = [_mkdf(spark, inp) for inp in case["inputs"]]
                got = run_sql(spark, case["sql"], dfs).toPandas()
            except (SqlUnsupported, KeyError):
                skip += 1
                continue
            try:
                _check(got, exp)
                ok += 1
            except Unsupported:
                skip += 1
            except AssertionError as e:
                fail.append((f, case.get("id"), str(e)[:100]))
    assert not fail, fail
    assert ok >= 165, f"only {ok} corpus cases passed the Spark path"


def _check(got, exp):
    cols = [c.rsplit(" ", 1)[0].strip() for c in exp["columns"]]
    typs = [c.rsplit(" ", 1)[1].strip().lower() for c in exp["columns"]]
    assert list(got.columns) == cols and len(got) == len(exp["rows"])
    order = exp.get("order")
    erows = exp["rows"]
    grows = got.where(pd.notna(got), None).values.tolist()
    if order:
        oi = cols.index(order)

        def key(r):
            return (r[oi] is None, str(r[oi]))
        erows = sorted(erows, key=key)
        grows = sorted(grows, key=key)
    for grow, erow in zip(grows, erows):
        for t, gv, ev in zip(typs, grow, erow):
            if ev is None:
                assert gv is None
            elif t in ("float", "double"):
                assert math.isclose(float(gv), float(ev),
                                    rel_tol=1e-5, abs_tol=1e-5)
            elif t in ("int", "bigint", "smallint", "timestamp"):
                gi = int(gv)
                if gi != int(ev) and t in ("int", "smallint"):
                    bits = 32 if t == "int" else 16
                    if ((gi + (1 << (bits - 1))) % (1 << bits)) - (
                            1 << (bits - 1)) == int(ev):
                        raise Unsupported("int overflow wrap (we widen)")
                assert gi == int(ev)
            else:
                assert str(gv) == str(ev)
