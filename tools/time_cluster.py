"""Ad-hoc: time + oracle-check dedup_cluster_labels at a given SF."""
import sys
import time

sys.path.insert(0, "/root/repo")

from tests.oracle import compare  # noqa: E402  (registers duckdb views)
from fdblog2clickhouse_spark.session import get_spark  # noqa: E402
from fdblog2clickhouse_spark.operators import dedup  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark()

# warm the JVM/scan path once
dedup.dedup_simhash(spark, sf).count()

t0 = time.time()
df = dedup.dedup_cluster_labels(spark, sf)
n = df.count()
t1 = time.time()
print(f"rows={n} wall={t1 - t0:.2f}s sf={sf}", flush=True)

if "0.01" in sf or "0.001" in sf:
    compare(df, dedup.ORACLE["dedup_cluster_labels"], sf)
    print("oracle MATCH", flush=True)
