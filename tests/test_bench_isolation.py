"""bench.py fault isolation: one sick query must never zero the
round's perf signal (BENCH_r02 crashed with rc=1 and no metrics line
because a single builder threw at analysis time). This injects a
poisoned headline query and asserts the JSON line still appears, with
the failure reported per-query."""

from __future__ import annotations

import json
import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
import bench
from small_etl_spark.queries import REGISTRY, QuerySpec

def boom(spark, sf_dir):
    raise RuntimeError("injected failure")

# poison one headline query, keep two real ones, drop the rest to keep
# the subprocess fast
keep = [n for n, s in REGISTRY.items() if s.headline][:2]
slim = {n: REGISTRY[n] for n in keep}
slim["poisoned"] = QuerySpec(boom, None, headline=True)
REGISTRY.clear()
REGISTRY.update(slim)
bench.main()
"""


def test_bench_emits_json_despite_failing_query(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env={
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
            "SPARK_GRAFT_BENCH_REPS": "1",
            "SPARK_GRAFT_CPUS": "4",
            # never let the slimmed-registry subprocess clobber the
            # repo's real perf ledger or spend minutes on stress dirs
            "SPARK_GRAFT_BENCH_SELF": str(tmp_path / "bench_self.json"),
            "SPARK_GRAFT_STRESS_FACTOR": "0",
        },
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    assert payload["queries"]["poisoned"] == "error"
    assert "poisoned" in payload["errors"]
    assert "injected failure" in payload["errors"]["poisoned"]
    # the healthy queries still report numeric timings summed in value
    healthy = [v for k, v in payload["queries"].items() if k != "poisoned"]
    assert healthy and all(isinstance(v, float) for v in healthy)
    assert payload["value"] > 0
