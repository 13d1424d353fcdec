"""Exact sf5 proofs for the pagerank rows whose DuckDB replay is
intractable at 50× bench scale (the unrolled 3-iteration SQL replay
spilled >150 GB at sf5 and died on disk — see SCALE.md r11).

The engine's pagerank is EXACT INTEGER arithmetic (picorank int64
units, graph/algorithms.py:47): init/teleport = mass DIV n, per-edge
contribution = rank DIV out_deg, damping = (num·Σ) DIV den, release =
(r + shift/2) DIV shift then one exact int→double cast. That makes a
driver-side numpy replay a TRUE independent oracle: same recurrence,
different code path and execution engine, bit-equal output required.
~25M distinct edges at sf5 fit a single process (few GB).

Usage: python tools/sf5_graph_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow.dataset as ds

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

MASS = 10 ** 12
DEN, NUM = 1000, 850          # damping 0.85 as an exact thousandth
DIGITS = 6


def _edges(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    o = ds.dataset(f"{sf_dir}/orders.parquet").to_table(
        columns=["o_orderkey", "o_custkey"]).to_pandas()
    li = ds.dataset(f"{sf_dir}/lineitem.parquet").to_table(
        columns=["l_orderkey", "l_suppkey"]).to_pandas()
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    src = m["o_custkey"].to_numpy(np.int64)
    dst = m["l_suppkey"].to_numpy(np.int64) + 1_000_000
    pair = np.unique(np.stack([src, dst], axis=1), axis=0)
    return pair[:, 0], pair[:, 1]


def _picorank(src, dst, seeds_mask=None, n_iter: int = 3):
    """The exact integer recurrence from graph/algorithms.py:47."""
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    s = np.searchsorted(nodes, src)   # nodes is sorted-unique: exact
    d = np.searchsorted(nodes, dst)
    out_deg = np.bincount(s, minlength=n).astype(np.int64)
    tele_total = (DEN - NUM) * (MASS // DEN)
    if seeds_mask is None:
        teleport = np.full(n, tele_total // n, np.int64)
        rank = np.full(n, MASS // n, np.int64)
    else:
        sm = seeds_mask(nodes)
        ns = int(sm.sum())
        teleport = np.where(sm, tele_total // ns, 0).astype(np.int64)
        rank = np.where(sm, MASS // ns, 0).astype(np.int64)
    for _ in range(n_iter):
        contrib = rank[s] // out_deg[s]          # trunc div, all >= 0
        # bincount sums in float64 — EXACT here: every contrib is an
        # integer <= 1e12 and every partial sum <= total mass 1e12,
        # far below 2^53, so each addition is exact and order-free
        in_sum = np.bincount(
            d, weights=contrib.astype(np.float64),
            minlength=n).astype(np.int64)
        rank = teleport + (NUM * in_sum) // DEN
    shift = 10 ** (12 - DIGITS)
    rel = (rank + shift // 2) // shift
    return nodes, rel.astype(np.float64) / float(10 ** DIGITS)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf5"
    from zef_spark import get_spark
    import __spark_entry__ as entry
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    t0 = time.time()
    src, dst = _edges(sf_dir)
    print(f"  edges: {len(src):,} distinct ({time.time()-t0:.1f}s)",
          flush=True)
    fails = 0
    for name, seeds in [("p_pagerank", None),
                        ("p_personalized_pagerank",
                         lambda nodes: nodes < 20)]:
        t0 = time.time()
        eng = qs[name](spark, sf_dir).toPandas()
        t_eng = time.time() - t0
        t0 = time.time()
        nodes, want = _picorank(src, dst, seeds)
        t_np = time.time() - t0
        got_ids = eng["id"].to_numpy(np.int64)
        got_rank = eng["rank"].to_numpy(np.float64)
        ok = (len(got_ids) == len(nodes)
              and np.array_equal(got_ids, nodes)
              and np.array_equal(got_rank, want))   # bit-equal doubles
        status = "PASS" if ok else "FAIL"
        if not ok:
            fails += 1
            bad = np.nonzero(got_rank != want)[0][:3] \
                if len(got_ids) == len(nodes) else []
            print(f"  {name} first diffs: "
                  f"{[(int(nodes[i]), got_rank[i], want[i]) for i in bad]}")
        print(f"  {name:40s} {status} ({len(nodes):,} nodes bit-equal, "
              f"engine {t_eng:.1f}s, numpy replay {t_np:.1f}s)",
              flush=True)
    print("ALL PASS" if fails == 0 else f"{fails} FAILED")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
