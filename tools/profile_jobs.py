"""Job-count + wall profile for declared queries: how many Spark jobs a
query submits (AQE query stages, checkpoint materializations, convergence
probes all count) and its wall seconds, steady state (2nd run).

Usage: python tools/profile_jobs.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]

    from bigdatamigratecloud_spark import queries as q
    from bigdatamigratecloud_spark.catalog import register_views
    from bigdatamigratecloud_spark.session import get_spark

    spark = get_spark("job-profile", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    register_views(spark, SF_DIR)
    for t in ("lineitem", "orders", "customer", "supplier", "events", "part",
              "nation", "region", "documents"):
        spark.table(t).cache().count()

    sc = spark.sparkContext

    def job_count() -> int:
        # total jobs submitted so far (private[spark] is public in
        # bytecode, so py4j reaches it) — counts grouped jobs too,
        # unlike StatusTracker.getJobIdsForGroup
        return sc._jsc.sc().dagScheduler().nextJobId()

    for name in names:
        for run in (1, 2):
            j0 = job_count()
            t0 = time.perf_counter()
            q.QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            j1 = job_count()
            print(f"{name} run{run}: {dt:.3f}s jobs={j1 - j0}")
    spark.stop()


if __name__ == "__main__":
    main()
