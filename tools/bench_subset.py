"""Paired-subset bench: time NAMED queries with the exact bench.py
methodology (sf0.1, min-of-3, noop sink, release_pinned between runs,
clearCache+GC between queries) at the core count in $SPARK_GRAFT_CPUS.

The r14 verdict's standing protocol: cross-round totals sawtooth ±30%
on this host, so optimization claims must come from PAIRED runs —
same machine, same window, prev-HEAD vs HEAD — at BOTH 8 and 32
cores (the driver measures both). This script is the instrument:

    python tools/bench_subset.py q1 q2 ...   # prints one JSON line

Run it from any git checkout of the engine (the pre-change HEAD in a
scratch worktree, then the post-change HEAD) with the same env.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: bench_subset.py <query> [query ...]")

    from sentiment_analysis_data_engineering_spark.operators.dedup import (
        release_pinned,
    )
    from sentiment_analysis_data_engineering_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench-subset")
    qs = entrymod.queries()

    # same warm-up contract as bench.py: one pass at sf0.001 so the
    # timed numbers measure steady state, not codegen compilation
    for name in names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as exc:
            print(f"WARMUP-FAIL {name}: {exc}", file=sys.stderr)
        finally:
            release_pinned()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(n_runs):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            release_pinned()
        timings[name] = round(best, 3)
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": "subset",
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "sf_dir": SF_DIR,
                "queries": timings,
                "total": round(sum(timings.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
