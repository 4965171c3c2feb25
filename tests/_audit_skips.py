"""One-off audit: bucket function-corpus engine-divergence skips by family.

Run:  cd /root/repo && python tests/_audit_skips.py
"""
import sys
import traceback
from collections import Counter, defaultdict

sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from openmldb_spark.sqlfe import SqlUnsupported
from test_function_corpus import FILES, _excluded, _load
from test_plain_query_cases import check_case
from test_window_query_cases import Unsupported

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())

buckets = defaultdict(list)
counts = Counter()
for f in FILES:
    for case in _load(f):
        cid = str(case.get("id"))
        if _excluded(case, f):
            counts["excluded"] += 1
            continue
        try:
            check_case(spark, case)
            counts["ok"] += 1
        except (Unsupported, SqlUnsupported) as e:
            counts["unsupported"] += 1
            buckets["UNSUPPORTED: " + str(e)[:60]].append(f"{f}::{cid}")
        except AssertionError as e:
            counts["FAIL"] += 1
            buckets["ASSERT: " + str(e)[:90]].append(f"{f}::{cid}")
        except Exception as e:
            counts["divergence"] += 1
            key = type(e).__name__ + ": " + str(e)[:110].replace("\n", " ")
            buckets[key].append(f"{f}::{cid} | {str(case['sql'])[:90]}")

print(dict(counts))
for k in sorted(buckets):
    print("\n###", k, f"({len(buckets[k])})")
    for item in buckets[k][:12]:
        print("   ", item)
