"""Per-entry sf1 regression diff (r8 verdict task 2: "the per-entry
times ARE the baseline"): compare two CORRECTNESS_sf1_r*.json
artifacts' spark_sec and report entries slower than a threshold
ratio, plus entries present in only one artifact. Sub-second entries
are noise-dominated (JVM dispatch floor), so the ratio check applies
only when either side is >= min_sec. Usage:

    python scripts/diff_sf1_times.py old.json new.json [ratio] [min_sec]
        [--json out.json]

--json additionally writes the structured diff (r9 verdict task 7:
the per-round diff is a committed artifact, diffable without
re-reading prose — see bench_results/sf1_diff_r*.json).
"""

from __future__ import annotations

import json
import sys

USAGE = ("usage: python scripts/diff_sf1_times.py old.json new.json "
         "[ratio=1.5] [min_sec=2.0] [--json out.json]")


def main() -> None:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        try:
            json_out = argv[i + 1]
        except IndexError:
            sys.exit(USAGE)
        del argv[i:i + 2]
    if len(argv) < 2:
        sys.exit(USAGE)
    old = json.load(open(argv[0]))["entries"]
    new = json.load(open(argv[1]))["entries"]
    ratio = float(argv[2]) if len(argv) > 2 else 1.5
    min_sec = float(argv[3]) if len(argv) > 3 else 2.0
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    # an entry that HAS a row but lost its measurement (errored, null
    # spark_sec) is the worst regression — never skip it silently.
    # `is None`, not truthiness: a recorded 0.0 is a measurement
    # (r9 ADVICE), only a missing/null one is a regression
    unmeasured = sorted(
        k for k in set(old) & set(new)
        if old[k].get("spark_sec") is not None
        and new[k].get("spark_sec") is None)
    slower, faster = [], []
    for k in sorted(set(old) & set(new)):
        a, b = old[k].get("spark_sec"), new[k].get("spark_sec")
        if a is None or b is None or max(a, b) < min_sec:
            continue
        # a recorded 0.0 old against a slow new is the WORST ratio
        # regression, not a skip (review r10): report as infinite
        r = b / a if a else float("inf")
        if r > ratio:
            slower.append((r, k, a, b))
        elif r < 1 / ratio:
            faster.append((r, k, a, b))
    tot_old = sum(r.get("spark_sec") or 0 for r in old.values())
    tot_new = sum(r.get("spark_sec") or 0 for r in new.values())
    print(f"entries: {len(old)} -> {len(new)}; total spark "
          f"{tot_old:.0f}s -> {tot_new:.0f}s")
    if only_old:
        print("only in old:", only_old)
    if only_new:
        print("only in new:", only_new)
    if unmeasured:
        print("REGRESSED to unmeasured (row present, no spark_sec):",
              unmeasured)
    for title, rows in (("SLOWER", sorted(slower, reverse=True)),
                        ("faster", sorted(faster))):
        print(f"{title} than {ratio}x (>= {min_sec}s):"
              if rows else f"{title}: none")
        for r, k, a, b in rows:
            print(f"  {r:5.2f}x  {k}: {a:.1f}s -> {b:.1f}s")
    if json_out:
        payload = {
            "old": argv[0], "new": argv[1],
            "ratio": ratio, "min_sec": min_sec,
            "entries_old": len(old), "entries_new": len(new),
            "total_spark_sec_old": round(tot_old, 1),
            "total_spark_sec_new": round(tot_new, 1),
            "only_old": only_old, "only_new": only_new,
            "unmeasured": unmeasured,
            # infinite ratios (0.0 old) serialize as null — strict
            # JSON has no Infinity; old_sec/new_sec carry the facts
            "slower": [{"ratio": round(r, 3) if r != float("inf")
                        else None, "key": k,
                        "old_sec": a, "new_sec": b}
                       for r, k, a, b in sorted(slower, reverse=True)],
            "faster": [{"ratio": round(r, 3), "key": k,
                        "old_sec": a, "new_sec": b}
                       for r, k, a, b in sorted(faster)],
        }
        with open(json_out, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
