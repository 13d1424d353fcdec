"""Registry-wide driver-proof freshness ledger (r11 verdict order #6).

The driver oracle-checks only the FIRST 50 entries of
`__spark_entry__.queries()` each round, so with 276 registered
queries a row's *driver* proof ages even while the standing sf1/sf5
sweeps keep re-proving it locally.  This tool makes that staleness
auditable and mechanical:

  1. Scans every `CORRECTNESS_r*.json` in the repo root and computes,
     per registered query, the set of rounds with a fully-green
     driver row (`rows_match and schema_match and hash_match`, or
     rows-only green for the non-SQL rows) and the LAST such round.
  2. Writes the ledger to `LEDGER.json` — committed, so the judge can
     audit window freshness without replaying the driver.
  3. Prints the recommended next `_FRONT` window: (a) names passed
     via --changed (this round's new/changed queries — they must
     lead so no change ships driver-unproven), then (b) every
     never-proven registration, then (c) the rest of the registry
     ordered by oldest-last-green (ties alphabetical), truncated to
     the window size (default 50).

Usage:
    python tools/freshness_ledger.py [--window 50]
        [--changed name1,name2,...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def row_green(row: dict) -> bool:
    if row.get("err"):
        return False
    if "hash_match" in row and row["hash_match"] is not None:
        return bool(row.get("rows_match") and row.get("schema_match")
                    and row.get("hash_match"))
    # rows-only record (no oracle SQL registered that round)
    return bool(row.get("rows_match", row.get("spark_rows", 0) != 0))


def build_ledger() -> dict:
    ledger: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            e = ledger.setdefault(name, {"rounds_green": [],
                                         "last_green_round": None})
            if row_green(row):
                e["rounds_green"].append(rnd)
                e["last_green_round"] = max(
                    rnd, e["last_green_round"] or 0)
    return ledger


def main() -> None:
    window = 50
    changed: list[str] = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--window":
            window = int(args.pop(0))
        elif a == "--changed":
            changed = [n for n in args.pop(0).split(",") if n]
        else:
            raise SystemExit(f"unknown arg {a}")

    import __spark_entry__ as entry
    registered = list(entry.queries().keys())
    ledger = build_ledger()

    out = {n: ledger.get(n, {"rounds_green": [],
                             "last_green_round": None})
           for n in sorted(registered)}
    with open(os.path.join(REPO, "LEDGER.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    unknown = [n for n in changed if n not in out]
    if unknown:
        raise SystemExit(f"--changed names not registered: {unknown}")

    never = sorted(n for n, e in out.items()
                   if e["last_green_round"] is None and n not in changed)
    rest = sorted((n for n, e in out.items()
                   if e["last_green_round"] is not None
                   and n not in changed),
                  key=lambda n: (out[n]["last_green_round"], n))
    front = (changed + never + rest)[:window]

    by_round: dict[int | None, int] = {}
    for e in out.values():
        by_round[e["last_green_round"]] = \
            by_round.get(e["last_green_round"], 0) + 1
    print(f"# {len(out)} registered; last-green cohorts: "
          + ", ".join(f"{v}@r{k:02d}" if k else f"{v}@NEVER"
                      for k, v in sorted(by_round.items(),
                                         key=lambda kv: kv[0] or 0)))
    print(f"# LEDGER.json written ({len(out)} rows)")
    print(f"# recommended _FRONT window ({window}):")
    for n in front:
        lg = out[n]["last_green_round"]
        tag = ("CHANGED" if n in changed
               else "NEVER" if lg is None else f"r{lg:02d}")
        print(f'    "{n}",  # {tag}')


if __name__ == "__main__":
    main()
