"""Assemble bench_results/CORRECTNESS_sf10_r8.json from the sf10
sweep outputs: a scripts/check_oracle.py log for the
driver-collectable entries plus scripts/check_pairs_at_scale.py JSON
lines for the entries whose results are too large to materialize on
the driver (order-independent dual-checksum verification — see that
script's docstring). Extra JSON-line logs (standalone reruns) and a
skips file (`{"entry": {"status": ..., "why": ...}}` for entries
whose verification is documented infeasible rather than silently
dropped) may follow. Usage:

    python scripts/merge_sf10_results.py out.json oracle.log \
        pairs.log [more.jsonl ...] [--skips skips.json]
"""

from __future__ import annotations

import json
import re
import sys


USAGE = ("usage: python scripts/merge_sf10_results.py out.json "
         "oracle.log pairs.log [more.jsonl ...] [--skips skips.json]")


def main() -> None:
    args = sys.argv[1:]
    skips_path = None
    if "--skips" in args:
        i = args.index("--skips")
        if i + 1 >= len(args):
            sys.exit(f"--skips needs a file argument\n{USAGE}")
        skips_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) < 3:
        sys.exit(USAGE)
    out_path, oracle_log, pairs_log = args[:3]
    extra_logs = args[3:]
    entries: dict[str, dict] = {}
    text = open(oracle_log, errors="replace").read()
    # ^-anchored per line: a FAIL line's error payload can contain
    # multi-line exception text that itself says "OK <word>" /
    # "FAIL <word>" — only check_oracle's own status lines (which
    # start the line) may create or overwrite entries
    for m in re.finditer(
            r"^(OK|FAIL) +(\w+)(?: \((\d+) rows, ([0-9.]+)s spark\))?"
            r"(?:: (.*))?", text, re.MULTILINE):
        status, name, rows, sec, err = m.groups()
        entries[name] = {
            "ok": status == "OK",
            "rows": int(rows) if rows else None,
            "spark_sec": float(sec) if sec else None,
            "method": "value-compare (check_oracle.py)",
        }
        if err:
            entries[name]["err"] = err.strip()[:300]
    for log in (pairs_log, *extra_logs):
        for lineno, line in enumerate(open(log, errors="replace"), 1):
            line = line.strip()
            if not line.startswith("{"):
                continue
            # '{'-prefixed lines are usually check_pairs_at_scale
            # records, but stray JSON (Spark log fragments, partial
            # writes) must not kill the whole merge — warn with the
            # offending file:line and keep going
            try:
                rec = json.loads(line)
                out = {
                    "ok": rec["ok"],
                    "rows": rec["rows"],
                    "spark_sec": rec["spark_sec"],
                    "duck_sec": rec.get("duck_sec"),
                    "method": rec.get(
                        "method", "value-compare (standalone rerun)"),
                }
                entry = rec["entry"]
                if "spark" in rec:
                    out["spark_triple"] = rec["spark"]
                    out["duckdb_triple"] = rec["duckdb"]
            except (json.JSONDecodeError, KeyError, TypeError) as e:
                print(f"warning: {log}:{lineno}: skipping malformed "
                      f"record ({e})", file=sys.stderr)
                continue
            if "note" in rec:
                out["note"] = rec["note"]
            entries[entry] = out
    n_skipped = 0
    if skips_path:
        for name, rec in json.load(open(skips_path)).items():
            entries[name] = {"ok": None, **rec}
            n_skipped += 1
    payload = {
        "sf": 10.0,
        "source": "scripts/make_sf1.py at replicas=100 (100x "
                  "id-shifted, word-salted replicas of the driver's "
                  "sf0.1); the 20 slowest-at-sf1 entries from "
                  "CORRECTNESS_sf1_r8.json, swept with "
                  "scripts/check_oracle.py (16 driver-collectable) + "
                  "scripts/check_pairs_at_scale.py (4 pair entries "
                  "with O(10M-row) outputs)",
        "entries": dict(sorted(entries.items())),
        "n_ok": sum(1 for r in entries.values() if r["ok"]),
        "n_fail": sum(1 for r in entries.values()
                      if r["ok"] is False),
        "n_documented_skips": n_skipped,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(f"{payload['n_ok']} OK / {payload['n_fail']} FAIL "
          f"-> {out_path}")


if __name__ == "__main__":
    main()
