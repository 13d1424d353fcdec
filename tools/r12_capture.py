"""r12 optimization-round measurement harness.

Captures, for each headline query (or an explicit list):
  - .explain("formatted") -> plans/r12/<name>_{before|after}.txt
  - isolated timing: min of N noop-sink executions (same methodology
    as bench.py) with per-run job/stage counts from the status tracker

Usage:
  python tools/r12_capture.py plans  [before|after] [query ...]
  python tools/r12_capture.py time   [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), R12_REPS (3).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench as bench_mod  # noqa: E402  (HEADLINE list)


def get_session_and_queries():
    import __spark_entry__ as entry
    from zef_spark import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r12_capture")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from zef_spark.graph.mapper import graph_for
    graph_for(spark, sf_dir)
    from zef_spark.pipeline.dedup import minhash_lsh_pairs
    warm = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    (minhash_lsh_pairs(warm, "text", "doc_id", num_perm=64, bands=16,
                       jaccard_threshold=0.4)
     .write.mode("overwrite").format("noop").save())
    spark.catalog.clearCache()
    return spark, entry.queries(), sf_dir


def capture_plans(names, suffix):
    spark, qs, sf_dir = get_session_and_queries()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans",
                          os.environ.get("CAPTURE_DIR", "r12"))
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        txt = buf.getvalue()
        print(f"{name}: exchanges={txt.count('Exchange')} "
              f"python={txt.count('EvalPython') + txt.count('MapInPandas') + txt.count('MapInArrow')} "
              f"-> {path}")


def time_queries(names):
    spark, qs, sf_dir = get_session_and_queries()
    reps = int(os.environ.get("R12_REPS", "3"))
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    results = {}
    for name in names:
        fn = qs[name]
        best, jobs_seen = None, 0
        for rep in range(reps):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            j0 = tracker.getJobIdsForGroup(None) or []
            n0 = max(j0) if j0 else -1
            sc.setJobDescription(f"r12:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            sc.setJobDescription(None)
            j1 = tracker.getJobIdsForGroup(None) or []
            n1 = max(j1) if j1 else -1
            jobs_seen = n1 - n0
            if best is None or dt < best:
                best = dt
        results[name] = {"sec": round(best, 3), "jobs": jobs_seen}
        print(f"{name:34s} {best:7.3f}s  jobs/run={jobs_seen}")
    print(json.dumps(results))
    total = sum(v["sec"] for v in results.values())
    print(f"TOTAL {total:.3f}s")


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    rest = sys.argv[2:]
    if cmd == "plans":
        suffix = "before"
        if rest and rest[0] in ("before", "after"):
            suffix, rest = rest[0], rest[1:]
        names = rest or bench_mod.HEADLINE
        capture_plans(names, suffix)
    elif cmd == "time":
        names = rest or bench_mod.HEADLINE
        time_queries(names)
    else:
        sys.exit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
