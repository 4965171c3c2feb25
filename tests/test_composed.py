"""Composed-pipeline integration: LAST JOIN feeding a window — ported
verbatim from /root/reference/cases/query/last_join_window_query.yaml
id 2 (the offline engine's canonical join-then-window shape)."""

import pyspark.sql.functions as F

from openmldb_spark.plans.specs import Agg, LastJoinSpec, WindowSpec
from openmldb_spark.operators.lastjoin import last_join
from openmldb_spark.operators.window import window_agg


def test_last_join_then_window(spark):
    t1 = spark.createDataFrame(
        [("0", 1, 5, 1.1, 11.1, 1, "1"),
         ("0", 2, 5, 2.2, 22.2, 2, "22"),
         ("1", 3, 55, 3.3, 33.3, 1, "333"),
         ("1", 4, 55, 4.4, 44.4, 2, "4444"),
         ("2", 5, 55, 5.5, 55.5, 3, "a" * 66)],
        ["col0", "col1", "col2", "col3", "col4", "col5", "col6"],
    )
    t2 = spark.createDataFrame(
        [("2", "EEEEE", 5.5, 550.5, 550, 5, 3),
         ("1", "DDDD", 4.4, 440.4, 550, 4, 2),
         ("1", "CCC", 3.3, 330.3, 550, 3, 1),
         ("0", "BB", 2.2, 220.2, 50, 2, 2),
         ("0", "A", 1.1, 110.1, 50, 1, 1)],
        ["str0", "str1", "r_col3", "r_col4", "r_col2", "r_col1", "r_col5"],
    )

    # LAST JOIN t2 ORDER BY t2.col5 ON t1.col1=t2.col1 AND t1.col5=t2.col5
    joined = last_join(
        t1, t2,
        LastJoinSpec(left_on=["col1", "col5"],
                     right_on=["r_col1", "r_col5"], order_by="r_col5"),
        right_cols=["str1", "r_col4"],
    )

    # WINDOW w1 AS (PARTITION BY t1.col2 ORDER BY t1.col5
    #               ROWS_RANGE BETWEEN 3 PRECEDING AND CURRENT ROW)
    spec = WindowSpec(partition_by=["col2"], order_by="col5",
                      frame="rows_range", preceding=3, tiebreak=("col1",))
    out = window_agg(
        joined, spec,
        [Agg("sum", "col5", "w1_col5_sum"),
         Agg("sum", "r_col4", "w1_t2_col4_sum")],
        keep_cols=["col1", "col2", "col5", "str1"], tier="kernel",
    )
    got = {r.col1: r for r in out.collect()}

    # expected rows from the yaml case (id, col2, col5, w1_col5_sum)
    exp_sum = {1: 1, 2: 3, 3: 1, 4: 3, 5: 6}
    for cid, s in exp_sum.items():
        assert got[cid].w1_col5_sum == s, (cid, got[cid])
    # joined right columns flow into the window correctly:
    # t1 row col1=2,col5=2 matches t2 (col1=2,col5=2) → BB/220.2;
    # frame of col1=2 (col2=5, ts<=2) = rows {1,2} → 110.1+220.2
    assert got[1].str1 == "A" and got[2].str1 == "BB"
    assert abs(got[2].w1_t2_col4_sum - (110.1 + 220.2)) < 1e-9
    assert abs(got[5].w1_t2_col4_sum - (330.3 + 440.4 + 550.5)) < 1e-9
