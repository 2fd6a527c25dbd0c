"""Per-entry profiler: wall time + Spark JOB COUNT for registry entries.

The bench (bench.py) gives wall-clock medians; this tool answers the
*why* at local scale: how many Spark jobs (driver round-trips) an entry
schedules. On local[N] with sf0.1-sized inputs the per-job scheduler
floor (~0.1-0.3 s) dominates many fixture-building entries, so job
count is the first number to look at before touching any plan
(optimization guide section 1: measure first).

Usage:
    python tools/profile_entry.py s40_hudi_export s86_hudi_delete ...
    python tools/profile_entry.py --top 15        # slowest rows of the
                                                  # latest BENCH_full_*
Output: one line per entry
    <name>  wall=<s>  jobs=<n>  (jobs from the status tracker, scoped
    by job group so concurrent sessions don't pollute the count)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from predicting_hospital_readmission_using_mimic_database_spark.registry import (
        load_all,
    )
    from predicting_hospital_readmission_using_mimic_database_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="profile-entry")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    args = [a for a in sys.argv[1:]]
    names: list[str] = []
    if args and args[0] == "--top":
        k = int(args[1]) if len(args) > 1 else 15
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        full = sorted(
            f for f in os.listdir(here) if re.match(r"BENCH_full_r\d+\.json$", f)
        )
        with open(os.path.join(here, full[-1])) as f:
            q = json.load(f)["queries"]
        names = [n for n, _ in sorted(q.items(), key=lambda kv: -kv[1])[:k]
                 if n in registry]
    else:
        for a in args:
            hits = [n for n in registry if a in n]
            if not hits:
                raise SystemExit(f"no entry matches {a!r}")
            names.extend(sorted(hits) if a not in registry else [a])

    sc = spark.sparkContext
    # warm-up: pay session/codegen/python-worker startup outside timings
    from predicting_hospital_readmission_using_mimic_database_spark.sources.io import (
        read_table,
    )

    for t in ("events", "lineitem", "documents", "embeddings"):
        read_table(spark, sf_dir, t).limit(1).count()
    # ...and the Structured Streaming machinery (bench.py's warmup
    # rule): the first streaming entry profiled would otherwise absorb
    # ~4.5 s of one-time microbatch-engine init into its wall
    from predicting_hospital_readmission_using_mimic_database_spark.session import (
        warm_streaming,
    )

    warm_streaming(spark)

    tracker = sc.statusTracker()
    for name in names:
        spark.catalog.clearCache()
        group = f"profile-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        try:
            df = registry[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            jobs = len(tracker.getJobIdsForGroup(group))
            print(f"{name:36s} wall={wall:7.3f}s jobs={jobs}")
        except Exception as e:
            print(f"{name:36s} FAILED: {e}")
        finally:
            sc.setJobGroup(None, None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
