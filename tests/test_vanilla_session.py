"""Driver-environment simulation: the correctness driver imports
`__spark_entry__` and runs our builders inside ITS OWN SparkSession —
not our `session.get_spark` factory. Round 2 went red on exactly this
class of mismatch (encoding/conf assumptions the engine only satisfied
in its own sessions).

This test spawns a subprocess that builds a VANILLA session (no custom
conf beyond master) and runs one representative query from each
environment-sensitive family: event-time (NTZ normalization + UTC
parity), higher-order-function dedup, mapInPandas (Arrow), regex, and
a TPC-H agg. Pass = analyzes, executes, and returns sane row counts
with no conf help from our factory.
"""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as e

qs = e.queries()
expect_min_rows = {
    "asof_join_events": 1,
    "sessionize": 1,
    "window_agg_hourly": 1,
    "minhash_lsh_dedup_md5": 0,
    "pii_audit": 1,
    "q1_pricing_summary": 1,
    "cosine_topk_vectorized": 1,
}
for name, at_least in expect_min_rows.items():
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    assert n >= at_least, (name, n)
    print("VANILLA-OK", name, n)
df = e.entry(spark)
assert df.count() >= 0
print("VANILLA-OK entry")
"""


def test_queries_run_in_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert proc.stdout.count("VANILLA-OK") == 8, proc.stdout
