"""Driver-session drift guard.

The correctness/bench driver builds its OWN bare SparkSession — none of
our session.py configs apply there. Round 2's bench died because
events.ts surfaced as TIMESTAMP_NTZ on that bare session while our
queries assumed the LTZ path. This test re-runs the event-family queries
(every query that touches the `ts` column) in a SUBPROCESS on a
zero-config `SparkSession.builder.getOrCreate()`, exactly like the
driver, so a testdata/physical-type change breaks HERE first.

A subprocess is required: one JVM per process means an in-process
"vanilla" session would silently inherit the test fixture's configs.
"""

from __future__ import annotations

import subprocess
import sys

from tests.conftest import REPO_ROOT, SF_SMOKE

EVENT_QUERIES = [
    "events_hourly",
    "events_hourly_dense",
    "events_dedup_count",
    "events_sessionize",
    "session_window_native",
    "events_sliding_windows",
    "event_type_pivot",
    "list_recent_slice",
    "upsert_latest_wins",
    "asof_purchase_view",
    "range_join_session_errors",
    "user_interarrival_stats",
    "user_moving_avg",
    "event_transitions",
    "funnel_conversion",
    "zorder_cell_stats",
    "cumulative_active_users",
    "cohort_retention",
    "user_value_quartiles",
    "salted_user_totals",
    "event_trigram_paths",
    "user_value_range_frame",
    "user_value_ewma",
    "event_value_unpivot",
]

_SCRIPT = f"""
import sys
sys.path.insert(0, {REPO_ROOT!r})
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
from gistdex_spark.queries import REGISTRY

failed = []
for name in {EVENT_QUERIES!r}:
    if name not in REGISTRY:
        continue
    try:
        REGISTRY[name](spark, {SF_SMOKE!r}).write.format("noop").mode(
            "overwrite").save()
    except Exception as exc:
        failed.append((name, str(exc).split(chr(10))[0][:200]))
if failed:
    for name, err in failed:
        print(f"VANILLA-FAIL {{name}}: {{err}}")
    sys.exit(1)
print("VANILLA-OK")
"""


def test_event_queries_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"vanilla-session event queries failed:\n{proc.stdout}\n{proc.stderr[-2000:]}"
    )
    assert "VANILLA-OK" in proc.stdout
