"""Spark-job-count evidence for the driver-round-trip queries.

Usage:
    python tools/job_counts.py <out_file> <query> [query ...]

Runs each named registry query at $SPARK_GRAFT_SF_DIR (default
sf0.001 — job COUNTS are scale-invariant for the fixed-overhead
verbs this measures) through the noop sink and records how many Spark
jobs the whole invocation scheduled. This is the r15 before/after
evidence for the job-folding work (guide §5): the r14 scaling block
showed the index verbs and iterative loops are DRIVER-JOB-bound
(8 cores beat 32 on every one), so the job count — not the local
seconds — is the number that predicts 100 TB behavior, where each
sequential job is a cluster-wide barrier plus a driver round-trip.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_file = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    import __spark_entry__ as entrymod
    from sentiment_analysis_data_engineering_spark.operators.dedup import (
        release_pinned,
    )
    from sentiment_analysis_data_engineering_spark.session import get_spark

    spark = get_spark("job_counts")
    qs = entrymod.queries()

    def n_jobs() -> int:
        # the DAGScheduler's monotone job-id counter — the UI status
        # store evicts old jobs (spark.ui.retainedJobs), which made
        # size deltas go NEGATIVE over a long session
        from sentiment_analysis_data_engineering_spark.operators.observe import (
            spark_job_count,
        )

        return spark_job_count(spark)

    lines = [f"# Spark jobs per query invocation at {sf_dir}", ""]
    for name in names:
        fn = qs[name]
        # one throwaway pass first: warms model caches / codegen so the
        # counted pass reflects steady-state verb job counts
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_pinned()
        before = n_jobs()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        jobs = n_jobs() - before
        release_pinned()
        spark.catalog.clearCache()
        lines.append(f"{name}: {jobs} jobs ({dt:.2f}s)")
        print(lines[-1])
    with open(out_file, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_file}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
