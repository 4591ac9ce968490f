"""Assemble bench_results/CORRECTNESS_sf1_r4.json from the sf1 sweep
logs (scripts/check_oracle.py output run over scripts/make_sf1.py's
corpus). Usage:

    python scripts/merge_sf1_results.py out.json log1 [log2 ...]

Each log line `OK   <name> (<rows> rows, <sec>s spark)` or
`FAIL <name> ...` becomes one record; later logs win on duplicates.
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    out_path = sys.argv[1]
    results: dict[str, dict] = {}
    for log in sys.argv[2:]:
        text = open(log, errors="replace").read()
        for m in re.finditer(
                r"(OK|FAIL) +(\w+)(?: \((\d+) rows, ([0-9.]+)s spark\))?",
                text):
            status, name, rows, sec = m.groups()
            results[name] = {
                "ok": status == "OK",
                "rows": int(rows) if rows else None,
                "spark_sec": float(sec) if sec else None,
            }
    payload = {
        "sf": 1.0,
        "source": "scripts/make_sf1.py (10x id-shifted, word-salted "
                  "replicas of the driver's sf0.1) swept with "
                  "scripts/check_oracle.py",
        "entries": dict(sorted(results.items())),
        "n_ok": sum(1 for r in results.values() if r["ok"]),
        "n_fail": sum(1 for r in results.values() if not r["ok"]),
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(f"{payload['n_ok']} OK / {payload['n_fail']} FAIL "
          f"-> {out_path}")


if __name__ == "__main__":
    main()
