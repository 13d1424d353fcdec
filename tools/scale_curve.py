"""Post-process bench JSONs at multiple scale factors into per-query
scaling exponents (r08 verdict order #1).

For each query, fits alpha in  t ~ c * data^alpha  between successive
scale pairs: alpha = log(t2/t1) / log(sf2/sf1). alpha <= ~1 is
linear-or-better (what a scan/hash-agg/shuffle pipeline should show
once per-query fixed costs stop dominating); alpha >> 1 flags a plan
whose cost grows super-linearly in data — the thing that dies at
100 TB. Small absolute times (< ~1 s) are fixed-cost-dominated
(scheduling, codegen, AQE planning) and marked accordingly rather
than read as sub/super-linear evidence.

Usage: python tools/scale_curve.py sf1:path1.json sf2:path2.json ...
Prints a markdown table (ready for SCALE.md) + one JSON line.
"""

from __future__ import annotations

import json
import math
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        j = json.loads(f.read().strip().splitlines()[-1])
    return j["queries"], j.get("value")


def main():
    pairs = []
    for arg in sys.argv[1:]:
        sf, path = arg.split(":", 1)
        q, total = load(path)
        pairs.append((float(sf), q, total))
    pairs.sort()
    names = list(pairs[0][1].keys())
    print("| query | " + " | ".join(f"sf{sf:g} (s)" for sf, _, _ in pairs)
          + " | " + " | ".join(
              f"α {pairs[i][0]:g}→{pairs[i+1][0]:g}"
              for i in range(len(pairs) - 1)) + " |")
    print("|" + "---|" * (1 + len(pairs) + len(pairs) - 1))
    out = {}
    for name in names:
        ts = [p[1].get(name) for p in pairs]
        alphas = []
        for i in range(len(pairs) - 1):
            t1, t2 = ts[i], ts[i + 1]
            if t1 and t2:
                a = (math.log(t2 / t1)
                     / math.log(pairs[i + 1][0] / pairs[i][0]))
                # fixed-cost-dominated timings can't evidence a curve
                tag = "ᶠ" if max(t1, t2) < 1.0 else ""
                alphas.append(f"{a:.2f}{tag}")
            else:
                alphas.append("—")
        out[name] = alphas
        print(f"| {name} | "
              + " | ".join(f"{t:.2f}" if t else "—" for t in ts)
              + " | " + " | ".join(alphas) + " |")
    totals = [p[2] for p in pairs]
    t_alphas = [
        f"{math.log(totals[i+1]/totals[i])/math.log(pairs[i+1][0]/pairs[i][0]):.2f}"
        for i in range(len(pairs) - 1)]
    print(f"| **total** | "
          + " | ".join(f"{t:.2f}" for t in totals)
          + " | " + " | ".join(t_alphas) + " |")
    print()
    print(json.dumps({"exponents": out, "totals": totals,
                      "total_alphas": t_alphas}))


if __name__ == "__main__":
    main()
