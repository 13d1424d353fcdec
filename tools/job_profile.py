"""Per-query job census: run one headline query with the noop sink and
print every Spark job it triggered (id, #stages, #tasks, duration) from
the status tracker — the local-mode stand-in for the UI's Jobs page
(guide §7.1) used to attribute fixed per-query overhead (AQE stage
jobs, broadcast builds, range-sampling passes) during the r12
optimization round.

Usage: python tools/job_profile.py <query> [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tools.r12_capture import get_session_and_queries  # noqa: E402


def main():
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark, qs, sf_dir = get_session_and_queries()
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    tracker = jsc.statusTracker()
    fn = qs[name]
    for rep in range(reps):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        ids0 = set(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        ids1 = sorted(set(tracker.getJobIdsForGroup(None)) - ids0)
        print(f"== rep {rep}: {dt:.3f}s total, {t_build:.3f}s plan-build, "
              f"{len(ids1)} jobs")
        for jid in ids1:
            info = tracker.getJobInfo(jid)
            if info is None or info.isEmpty():
                continue
            ji = info.get()
            sids = list(ji.stageIds())
            ntasks, t_ms = 0, 0.0
            for sid in sids:
                si = tracker.getStageInfo(sid)
                if si is not None and not si.isEmpty():
                    s = si.get()
                    ntasks += s.numTasks()
            print(f"  job {jid}: stages={len(sids)} tasks={ntasks}")


if __name__ == "__main__":
    main()
